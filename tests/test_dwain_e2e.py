"""Whole-model dwain decomposition end-to-end on a small MLP: rank search,
acceptance bookkeeping, config format, serialization round-trip, and
interleaved fine-tuning hook.  (The reference has no such integration test —
SURVEY.md §4 notes this gap; we close it.)"""

import json

import jax
import jax.numpy as jnp
import numpy as np

from ptdeco_tpu import dwain, nn, utils


class MLP(nn.Module):
    fc1: nn.Linear
    fc2: nn.Linear
    head: nn.Linear

    def __call__(self, batch, ctx=None):
        x = batch["inp"] if isinstance(batch, dict) else batch
        x = jax.nn.relu(self.fc1(x, ctx))
        x = jax.nn.relu(self.fc2(x, ctx))
        return self.head(x, ctx)


def make_mlp(d=64, key=0):
    k = jax.random.split(jax.random.PRNGKey(key), 3)
    return MLP(
        fc1=nn.Linear.create(k[0], d, d),
        fc2=nn.Linear.create(k[1], d, d),
        head=nn.Linear.create(k[2], d, 8),
    )


def lowrank_data_iter(key, bs, d, rank=4):
    """Inputs confined to a low-rank subspace => layers are decomposeable."""
    proj = jax.random.normal(jax.random.PRNGKey(123), (rank, d))
    while True:
        key, sub = jax.random.split(key)
        z = jax.random.normal(sub, (bs, rank))
        yield {"inp": z @ proj}


def loss_fn(batch, out):
    return jnp.mean(jnp.square(out)) * 0.01


def test_dwain_decomposes_lowrank_model():
    d = 64
    model = make_mlp(d)
    data_it = lowrank_data_iter(jax.random.PRNGKey(0), 16, d)
    metric_it = lowrank_data_iter(jax.random.PRNGKey(1), 16, d)

    finetune_calls = []

    def finetune_fn(module, decomposed_names):
        finetune_calls.append(list(decomposed_names))
        return module

    new_model, config = dwain.decompose(
        module=model,
        data_iterator=data_it,
        loss_fn=loss_fn,
        num_data_steps=4,
        metric_iterator=metric_it,
        num_metric_steps=2,
        nsr_final_threshold=0.1,
        finetune_fn=finetune_fn,
        blacklisted_module_names=["head"],
        min_rank=2,
        trade_off_factor=1000.0,
        max_accepted_ppl_diff=1.0,
    )

    # low-rank inputs => fc1/fc2 accepted at some reduced rank
    assert set(config.keys()) == {"fc1", "fc2"}
    assert finetune_calls  # called after each accepted layer
    for name, cfg in config.items():
        assert cfg["type"] == "Sequential"
        meta = cfg[utils.MODCONFIG_META_KEY]
        assert 0 < meta["proportion"] < 1
        assert meta["drop_in_params"] > 0
        assert {"proportion", "nsr_final", "ppl_final", "drop_in_params"} == set(
            meta.keys()
        )
        sub = nn.get_submodule(new_model, name)
        assert isinstance(sub, nn.Sequential)
        assert sub[0].bias is None and sub[1].bias is not None

    # params actually reduced
    assert utils.get_num_params(new_model) < utils.get_num_params(model)

    # blacklisted layer untouched
    assert isinstance(nn.get_submodule(new_model, "head"), nn.Linear)

    # config is valid JSON
    json.dumps(config)

    # serialization round-trip: fresh model + config + state dict
    sd = utils.state_dict(new_model)
    model2 = utils.apply_decompose_config(make_mlp(d, key=99), config)
    model2 = utils.load_state_dict(model2, sd)
    batch = next(metric_it)
    np.testing.assert_allclose(
        np.asarray(new_model(batch)), np.asarray(model2(batch)), atol=1e-6
    )


def test_dwain_rejects_fullrank_model():
    """Full-rank gaussian inputs + strict thresholds => nothing decomposed."""
    d = 16
    model = make_mlp(d)

    def it(key):
        while True:
            key, sub = jax.random.split(key)
            yield {"inp": jax.random.normal(sub, (32, d))}

    new_model, config = dwain.decompose(
        module=model,
        data_iterator=it(jax.random.PRNGKey(0)),
        loss_fn=loss_fn,
        num_data_steps=2,
        metric_iterator=it(jax.random.PRNGKey(1)),
        num_metric_steps=1,
        nsr_final_threshold=1e-9,
        min_rank=2,
        trade_off_factor=0.5,
        max_accepted_ppl_diff=1e-9,
    )
    assert config == {}
    batch = {"inp": jnp.ones((2, d))}
    np.testing.assert_allclose(
        np.asarray(new_model(batch)), np.asarray(model(batch)), atol=1e-6
    )


def test_dwain_precompute_covariance_splits():
    d = 32
    model = make_mlp(d)
    data_it = lowrank_data_iter(jax.random.PRNGKey(0), 16, d, rank=3)
    metric_it = lowrank_data_iter(jax.random.PRNGKey(1), 16, d, rank=3)
    new_model, config = dwain.decompose(
        module=model,
        data_iterator=data_it,
        loss_fn=loss_fn,
        num_data_steps=3,
        metric_iterator=metric_it,
        num_metric_steps=1,
        nsr_final_threshold=0.2,
        min_rank=2,
        trade_off_factor=1000.0,
        max_accepted_ppl_diff=1.0,
        precomputing_covariance_num_splits=2,
    )
    assert "fc1" in config and "fc2" in config


def test_dwain_rank1_head_and_uneven_splits():
    """Regression: a rank-1 site (e.g. a value head) must not crash, and
    uneven precompute splits must cover every module (reference inherits a
    floor-division gap that drops trailing modules, dwain:589-607)."""

    class WithValueHead(nn.Module):
        fc1: nn.Linear
        fc2: nn.Linear
        fc3: nn.Linear
        value: nn.Linear  # out_features=1 -> full_rank == 1

        def __call__(self, batch, ctx=None):
            x = batch["inp"] if isinstance(batch, dict) else batch
            x = jax.nn.relu(self.fc1(x, ctx))
            x = jax.nn.relu(self.fc2(x, ctx))
            x = jax.nn.relu(self.fc3(x, ctx))
            return self.value(x, ctx)

    k = jax.random.split(jax.random.PRNGKey(0), 4)
    model = WithValueHead(
        fc1=nn.Linear.create(k[0], 32, 32),
        fc2=nn.Linear.create(k[1], 32, 32),
        fc3=nn.Linear.create(k[2], 32, 32),
        value=nn.Linear.create(k[3], 32, 1),
    )
    it = lowrank_data_iter(jax.random.PRNGKey(1), 16, 32, rank=3)
    mit = lowrank_data_iter(jax.random.PRNGKey(2), 16, 32, rank=3)
    # 4 sites, 3 splits -> chunk floor-division would drop the last module
    new_model, config = dwain.decompose(
        module=model,
        data_iterator=it,
        loss_fn=loss_fn,
        num_data_steps=2,
        metric_iterator=mit,
        num_metric_steps=1,
        nsr_final_threshold=0.3,
        min_rank=2,
        trade_off_factor=1000.0,
        max_accepted_ppl_diff=1.0,
        precomputing_covariance_num_splits=3,
    )
    assert "value" not in config  # rank-1 site skipped, no crash
    batch = next(mit)
    assert new_model(batch).shape == (16, 1)


def test_dwain_rejects_nondescending_reduction_factor():
    """reduction_factor >= 1 would spin the rank ladder forever (the
    reference inherits this hang at dwain:407-421); we raise instead."""
    import pytest

    model = make_mlp(32)
    it = lowrank_data_iter(jax.random.PRNGKey(0), 8, 32)
    with pytest.raises(ValueError, match="reduction_factor"):
        dwain.decompose(
            module=model,
            data_iterator=it,
            loss_fn=loss_fn,
            num_data_steps=1,
            metric_iterator=it,
            num_metric_steps=1,
            nsr_final_threshold=0.1,
            min_rank=2,
            trade_off_factor=1000.0,
            max_accepted_ppl_diff=1.0,
            reduction_factor=1.0,
        )
