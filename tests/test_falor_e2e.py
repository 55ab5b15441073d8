"""Whole-model falor decomposition end-to-end (binary rank search, two-phase
replace, proportion threshold, config round-trip)."""

import jax
import jax.numpy as jnp
import numpy as np

from ptdeco_tpu import falor, nn, utils


class SmallCNN(nn.Module):
    conv1: nn.Conv2d  # 1x1, decomposeable
    conv2: nn.Conv2d  # 3x3, NOT decomposeable
    head: nn.Linear

    def __call__(self, x, ctx=None):
        x = jax.nn.relu(self.conv1(x, ctx))
        x = jax.nn.relu(self.conv2(x, ctx))
        x = jnp.mean(x, axis=(1, 2))
        return self.head(x, ctx)


def make_cnn(key=0):
    k = jax.random.split(jax.random.PRNGKey(key), 3)
    return SmallCNN(
        conv1=nn.Conv2d.create(k[0], 16, 32, kernel_size=1),
        conv2=nn.Conv2d.create(k[1], 32, 16, kernel_size=3, padding=1),
        head=nn.Linear.create(k[2], 16, 10),
    )


def lowrank_image_iter(key, bs=8, c=16, hw=6, rank=3):
    proj = jax.random.normal(jax.random.PRNGKey(7), (rank, c))
    while True:
        key, sub = jax.random.split(key)
        z = jax.random.normal(sub, (bs, hw, hw, rank))
        yield z @ proj


def test_falor_decomposes_and_roundtrips():
    model = make_cnn()
    it = lowrank_image_iter(jax.random.PRNGKey(0))
    new_model, config = falor.decompose(
        module=model,
        data_iterator=it,
        proportion_threshold=0.95,
        nsr_final_threshold=0.5,
        kl_final_threshold=10.0,
        num_data_steps=4,
        num_metric_steps=2,
        use_float64=True,
        use_mean=False,
        use_damping=True,
    )
    # only conv1 (1x1) and head (linear) are candidates; low-rank inputs
    # should let at least conv1 shrink
    assert "conv1" in config
    for name, cfg in config.items():
        meta = cfg[utils.MODCONFIG_META_KEY]
        assert set(meta.keys()) == {"proportion", "nsr_final", "kl_final"}
        assert 0 < meta["proportion"] < 0.95

    # 3x3 conv untouched
    assert isinstance(nn.get_submodule(new_model, "conv2"), nn.Conv2d)

    sd = utils.state_dict(new_model)
    model2 = utils.apply_decompose_config(make_cnn(key=5), config)
    model2 = utils.load_state_dict(model2, sd)
    x = next(it)
    np.testing.assert_allclose(
        np.asarray(new_model(x)), np.asarray(model2(x)), atol=1e-6
    )


def test_falor_blacklist_and_threshold():
    model = make_cnn()
    it = lowrank_image_iter(jax.random.PRNGKey(1))
    _, config = falor.decompose(
        module=model,
        data_iterator=it,
        proportion_threshold=0.95,
        nsr_final_threshold=0.5,
        kl_final_threshold=10.0,
        num_data_steps=2,
        num_metric_steps=1,
        use_float64=True,
        use_mean=False,
        use_damping=True,
        blacklisted_module_names=["conv1", "head"],
    )
    assert config == {}


def test_falor_use_mean_covariance():
    model = make_cnn()
    it = lowrank_image_iter(jax.random.PRNGKey(2))
    _, config = falor.decompose(
        module=model,
        data_iterator=it,
        proportion_threshold=0.95,
        nsr_final_threshold=0.5,
        kl_final_threshold=10.0,
        num_data_steps=2,
        num_metric_steps=1,
        use_float64=True,
        use_mean=True,
        use_damping=True,
    )
    assert "conv1" in config


def test_falor_resume_and_shared_step(tmp_path):
    """falor phase-1 checkpointing: a rerun with the same checkpoint_dir
    replays scored sites and produces the identical config; the shared
    metric step path yields the same decisions."""

    def run(ckpt, threshold=100):
        return falor.decompose(
            module=make_cnn(),
            data_iterator=lowrank_image_iter(jax.random.PRNGKey(0)),
            proportion_threshold=0.95,
            nsr_final_threshold=0.5,
            kl_final_threshold=10.0,
            num_data_steps=2,
            num_metric_steps=1,
            use_float64=True,
            use_mean=False,
            use_damping=True,
            checkpoint_dir=ckpt,
            shared_metric_threshold=threshold,
        )

    m1, c1 = run(str(tmp_path / "ck"))
    assert (tmp_path / "ck" / "falor_phase1.jsonl").exists()
    m2, c2 = run(str(tmp_path / "ck"))
    assert c2 == c1
    x = next(lowrank_image_iter(jax.random.PRNGKey(9)))
    np.testing.assert_allclose(np.asarray(m1(x)), np.asarray(m2(x)), atol=1e-6)

    # shared-step path equivalence (threshold 0 forces it)
    m3, c3 = run(None, threshold=0)
    assert c3.keys() == c1.keys()
    for k in c1:
        assert c1[k]["modules"] == c3[k]["modules"]
