"""LOCKD wrap / losses / decompose / config round-trip tests (mirrors the
reference's test_wrap_*, test_losses_*, test_decompose_*, test_config_* on a
small CNN+MLP instead of torchvision/timm — same properties)."""

import jax
import jax.numpy as jnp
import numpy as np

from ptdeco_tpu import lockd, nn, utils


class SmallNet(nn.Module):
    """conv3x3 -> conv1x1 -> pool -> fc1 -> fc2 (NHWC)."""

    conv1: nn.Conv2d
    conv2: nn.Conv2d
    fc1: nn.Linear
    fc2: nn.Linear

    def __call__(self, x, ctx=None):
        x = jax.nn.relu(self.conv1(x, ctx))
        x = jax.nn.relu(self.conv2(x, ctx))
        x = jnp.mean(x, axis=(1, 2))
        x = jax.nn.relu(self.fc1(x, ctx))
        return self.fc2(x, ctx)


def make_net(key=0):
    k = jax.random.split(jax.random.PRNGKey(key), 4)
    return SmallNet(
        conv1=nn.Conv2d.create(k[0], 3, 16, kernel_size=3, padding=1),
        conv2=nn.Conv2d.create(k[1], 16, 32, kernel_size=1),
        fc1=nn.Linear.create(k[2], 32, 64),
        fc2=nn.Linear.create(k[3], 64, 10),
    )


def set_half_logits(root):
    """Force alternate gates open/closed (reference tests/helpers.py:24-36)."""
    for name, m in lockd.named_wrapped_modules(root):
        logits = np.full((m.logits.shape[0],), -10.0, np.float32)
        logits[::2] = 10.0
        root = nn.replace_submodule(root, f"{name}.logits", jnp.asarray(logits))
    return root


def test_wrap_preserves_output_shape():
    net = make_net()
    wrapped = lockd.wrap(net, jax.random.PRNGKey(1))
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 8, 8, 3))
    y0 = net(x)
    # teacher path: wrapped forward returns original activations exactly
    y1 = wrapped(x, ctx=nn.Ctx(key=jax.random.PRNGKey(3), train=True))
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)
    names = [n for n, _ in lockd.named_wrapped_modules(wrapped)]
    assert names == ["conv1", "conv2", "fc1", "fc2"]


def test_wrap_blacklist():
    net = make_net()
    wrapped = lockd.wrap(net, jax.random.PRNGKey(1), ["conv1", "fc2"])
    names = [n for n, _ in lockd.named_wrapped_modules(wrapped)]
    assert names == ["conv2", "fc1"]


def test_losses_shapes_and_values():
    net = make_net()
    wrapped = lockd.wrap(net, jax.random.PRNGKey(1))
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 8, 8, 3))
    y, nsr_sink = lockd.forward_collecting(wrapped, x, jax.random.PRNGKey(3))
    assert set(nsr_sink.keys()) == {"conv1", "conv2", "fc1", "fc2"}
    nsr_loss = lockd.get_nsr_loss(nsr_sink, nsr_threshold=0.01)
    assert np.isfinite(float(nsr_loss))
    ent = lockd.get_entropy_loss(wrapped)
    assert float(ent) >= 0.01  # epsilon floor
    prop = lockd.get_proportion_loss(wrapped)
    # all logits start at 3.0 -> proportion = sigmoid(3) ~ 0.9526
    np.testing.assert_allclose(float(prop), 1 / (1 + np.exp(-3.0)), atol=1e-5)
    ent_d = lockd.get_entropy_dict(wrapped)
    prop_d = lockd.get_proportion_dict(wrapped)
    assert set(ent_d) == set(prop_d) == {"conv1", "conv2", "fc1", "fc2"}


def test_decompose_half_gates():
    net = make_net()
    wrapped = lockd.wrap(net, jax.random.PRNGKey(1))
    wrapped = set_half_logits(wrapped)
    gates = {
        name: m.logits.shape[0] for name, m in lockd.named_wrapped_modules(wrapped)
    }
    deco, config = lockd.decompose(wrapped, proportion_threshold=0.9)
    assert set(config.keys()) == {"conv1", "conv2", "fc1", "fc2"}
    for name, cfg in config.items():
        assert cfg["type"] == "Sequential"
        n = gates[name]
        expected = -(-n // 2) / n  # every second gate open, starting at 0
        assert cfg[utils.MODCONFIG_META_KEY]["proportion"] == expected
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 8, 8, 3))
    y = deco(x)
    assert y.shape == (2, 10)
    # intermediate channels halved
    fc1 = nn.get_submodule(deco, "fc1")
    assert isinstance(fc1, nn.Sequential)
    assert fc1[0].kernel.shape == (32, 16)
    assert fc1[1].kernel.shape == (16, 64)


def test_decompose_reverts_when_proportion_high():
    net = make_net()
    wrapped = lockd.wrap(net, jax.random.PRNGKey(1))
    # default logits 3.0 -> proportion ~0.95 > threshold
    deco, config = lockd.decompose(wrapped, proportion_threshold=0.5)
    assert config == {}
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 8, 8, 3))
    np.testing.assert_allclose(np.asarray(deco(x)), np.asarray(net(x)), atol=1e-6)


def test_config_roundtrip():
    """The reference's contract test (tests/test_config_torchvision_timm.py):
    decompose model1, dump config+state dict, apply config to fresh model2,
    load state dict, outputs must match."""
    net1 = make_net(key=0)
    wrapped = lockd.wrap(net1, jax.random.PRNGKey(1))
    wrapped = set_half_logits(wrapped)
    model1, dc = lockd.decompose(wrapped, proportion_threshold=0.9)
    sd = utils.state_dict(model1)

    model2 = make_net(key=42)  # different weights, same architecture
    model2 = utils.apply_decompose_config(model2, dc)
    model2 = utils.load_state_dict(model2, sd)

    x = jax.random.uniform(jax.random.PRNGKey(2), (3, 8, 8, 3))
    y1 = model1(x)
    y2 = model2(x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)


def test_config_json_serializable():
    import json

    net = make_net()
    wrapped = lockd.wrap(net, jax.random.PRNGKey(1))
    wrapped = set_half_logits(wrapped)
    _, dc = lockd.decompose(wrapped, proportion_threshold=0.9)
    s = json.dumps(dc)
    dc2 = json.loads(s)
    assert dc2 == dc


def test_trainable_partition():
    net = make_net()
    wrapped = lockd.wrap(net, jax.random.PRNGKey(1))
    trainable, frozen = lockd.trainable_partition(wrapped)
    # teacher weights frozen
    assert trainable.conv1.conv_orig.kernel is None
    assert frozen.conv1.conv_orig.kernel is not None
    # student + logits trainable
    assert trainable.conv1.conv_1.kernel is not None
    assert trainable.conv1.logits is not None
    assert frozen.conv1.logits is None
    back = nn.combine(trainable, frozen)
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 8, 8, 3))
    np.testing.assert_allclose(
        np.asarray(back(x)), np.asarray(net(x)), atol=1e-6
    )


def test_gumbel_sampling_stats():
    logits = jnp.array([-5.0, 0.5, 5.0])
    keys = jax.random.split(jax.random.PRNGKey(0), 512)
    samples = jax.vmap(lambda k: lockd.sample_from_logits(logits, k))(keys)
    s = np.asarray(samples)
    assert np.all(s[:, 0] == 0.0)  # negative logits are hard-zeroed
    assert 0.9 < s[:, 2].mean() < 1.0
    assert np.all((s >= 0) & (s <= 1))


def test_decompose_all_gates_closed_keeps_strongest_channel():
    """A fully-closed gate must not produce a zero-width factor pair (the
    reference guards only its conv path, lockd:152-154; we fix Linear too)."""
    net = make_net()
    wrapped = lockd.wrap(net, jax.random.PRNGKey(1))
    for name, m in lockd.named_wrapped_modules(wrapped):
        logits = -np.abs(np.random.RandomState(0).randn(m.logits.shape[0])) - 1.0
        wrapped = nn.replace_submodule(
            wrapped, f"{name}.logits", jnp.asarray(logits, jnp.float32)
        )
    deco, config = lockd.decompose(wrapped, proportion_threshold=0.9)
    for name, cfg in config.items():
        # exactly one surviving channel everywhere, never zero
        n = cfg["modules"]["0"].get(
            "out_features", cfg["modules"]["0"].get("out_channels")
        )
        assert n == 1, (name, cfg)
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 8, 8, 3))
    y = deco(x)
    assert np.isfinite(np.asarray(y)).all()
