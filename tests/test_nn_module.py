"""Tests of the pytree module system (the substrate for all surgery)."""

import jax
import jax.numpy as jnp
import numpy as np

import ptdeco_tpu
from ptdeco_tpu import nn


class TwoLayer(nn.Module):
    fc1: nn.Linear
    fc2: nn.Linear

    def __call__(self, x, ctx=None):
        return self.fc2(jax.nn.relu(self.fc1(x, ctx)), ctx)


def make_two_layer(key=None):
    key = key if key is not None else jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    return TwoLayer(
        fc1=nn.Linear.create(k1, 8, 16),
        fc2=nn.Linear.create(k2, 16, 4),
    )


def test_module_is_pytree():
    m = make_two_layer()
    leaves = jax.tree_util.tree_leaves(m)
    assert len(leaves) == 4  # 2 kernels + 2 biases
    m2 = jax.tree_util.tree_map(lambda a: a * 2, m)
    assert isinstance(m2, TwoLayer)
    np.testing.assert_allclose(
        np.asarray(m2.fc1.kernel), 2 * np.asarray(m.fc1.kernel)
    )


def test_named_modules_and_parameters():
    m = make_two_layer()
    names = [n for n, _ in nn.named_modules(m)]
    assert names == ["", "fc1", "fc2"]
    pnames = dict(nn.named_parameters(m)).keys()
    assert set(pnames) == {"fc1.kernel", "fc1.bias", "fc2.kernel", "fc2.bias"}


def test_sequential_elision():
    key = jax.random.PRNGKey(1)
    seq = nn.Sequential(
        layers=(
            nn.Linear.create(key, 4, 8, use_bias=False),
            nn.Linear.create(key, 8, 4),
        )
    )
    names = [n for n, _ in nn.named_modules(seq)]
    assert names == ["", "0", "1"]
    pnames = set(dict(nn.named_parameters(seq)).keys())
    assert pnames == {"0.kernel", "1.kernel", "1.bias"}


def test_get_replace_submodule():
    m = make_two_layer()
    fc1 = nn.get_submodule(m, "fc1")
    assert fc1 is m.fc1
    new = nn.Linear.create(jax.random.PRNGKey(3), 8, 16)
    m2 = nn.replace_submodule(m, "fc1", new)
    assert m2.fc1 is new
    assert m.fc1 is fc1  # original untouched
    # leaf-level replacement
    k = jnp.zeros_like(m.fc2.kernel)
    m3 = nn.replace_submodule(m, "fc2.kernel", k)
    assert float(jnp.sum(jnp.abs(m3.fc2.kernel))) == 0.0


def test_nested_sequential_names():
    key = jax.random.PRNGKey(2)

    class Net(nn.Module):
        body: nn.Sequential

        def __call__(self, x, ctx=None):
            return self.body(x, ctx)

    net = Net(
        body=nn.Sequential(
            layers=(
                nn.Linear.create(key, 4, 4),
                nn.Sequential(
                    layers=(
                        nn.Linear.create(key, 4, 4, use_bias=False),
                        nn.Linear.create(key, 4, 4),
                    )
                ),
            )
        )
    )
    names = [n for n, _ in nn.named_modules(net)]
    assert names == ["", "body", "body.0", "body.1", "body.1.0", "body.1.1"]
    sub = nn.get_submodule(net, "body.1.0")
    assert isinstance(sub, nn.Linear)
    net2 = nn.replace_submodule(
        net, "body.1.0", nn.Linear.create(key, 4, 4, use_bias=False)
    )
    assert nn.get_submodule(net2, "body.1.0") is not sub


def test_partition_combine():
    m = make_two_layer()
    paths = nn.tree_paths_of(m, ["fc1"])
    sel, rest = nn.partition(
        m, lambda path, leaf: jax.tree_util.keystr(path) in paths
    )
    assert sel.fc1.kernel is not None and sel.fc2.kernel is None
    assert rest.fc1.kernel is None and rest.fc2.kernel is not None
    back = nn.combine(sel, rest)
    np.testing.assert_array_equal(
        np.asarray(back.fc2.kernel), np.asarray(m.fc2.kernel)
    )


def test_jit_through_module():
    m = make_two_layer()
    x = jnp.ones((2, 8))

    @jax.jit
    def f(mod, x):
        return mod(x)

    y = f(m, x)
    assert y.shape == (2, 4)
    # surgery inside jit
    @jax.jit
    def g(mod, x):
        mod2 = nn.replace_submodule(
            mod, "fc2.kernel", jnp.zeros_like(mod.fc2.kernel)
        )
        return mod2(x)

    y2 = g(m, x)
    np.testing.assert_allclose(
        np.asarray(y2), np.tile(np.asarray(m.fc2.bias), (2, 1)), rtol=1e-6
    )


def test_conv2d_matches_manual_1x1():
    key = jax.random.PRNGKey(4)
    conv = nn.Conv2d.create(key, 6, 3, kernel_size=1)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 5, 5, 6))
    y = conv(x)
    y_ref = jnp.einsum("bhwc,co->bhwo", x, conv.kernel[0, 0]) + conv.bias
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)


def test_conv2d_stride_padding():
    key = jax.random.PRNGKey(6)
    conv = nn.Conv2d.create(key, 3, 8, kernel_size=3, stride=2, padding=1)
    x = jnp.ones((1, 8, 8, 3))
    y = conv(x)
    assert y.shape == (1, 4, 4, 8)


def test_version():
    assert ptdeco_tpu.__version__


def test_replace_submodule_with_aliased_children():
    """Tied objects under two names must resolve POSITIONALLY: replacing
    'b' may not touch 'a' even when both fields reference the same object
    (identity-based hop recording used to hit the first field)."""
    shared = nn.Linear.create(jax.random.PRNGKey(0), 4, 4)

    class Tied(nn.Module):
        a: nn.Linear
        b: nn.Linear

        def __call__(self, x, ctx=None):
            return self.b(self.a(x, ctx), ctx)

    m = Tied(a=shared, b=shared)
    new = nn.Linear.create(jax.random.PRNGKey(1), 4, 4)
    m2 = nn.replace_submodule(m, "b", new)
    assert m2.a is shared
    assert m2.b is new


def test_replace_submodule_repeated_in_sequential():
    """The same block object repeated in a Sequential: index '1' must be
    replaced, not index '0'."""
    blk = nn.Linear.create(jax.random.PRNGKey(0), 4, 4)
    seq = nn.Sequential(layers=(blk, blk))
    new = nn.Linear.create(jax.random.PRNGKey(1), 4, 4)
    s2 = nn.replace_submodule(seq, "1", new)
    assert s2.layers[0] is blk
    assert s2.layers[1] is new


def test_tree_paths_of_positional_not_identity():
    """tree_paths_of must not mark aliased leaves at OTHER positions."""
    shared = nn.Linear.create(jax.random.PRNGKey(0), 4, 4)

    class Tied(nn.Module):
        a: nn.Linear
        b: nn.Linear

        def __call__(self, x, ctx=None):
            return self.b(self.a(x, ctx), ctx)

    m = Tied(a=shared, b=shared)
    paths = nn.tree_paths_of(m, ["b"])
    assert all(p.startswith(".b") for p in paths), paths
    assert len(paths) == 2  # kernel + bias
