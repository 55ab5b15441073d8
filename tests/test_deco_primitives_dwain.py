"""Full-rank exactness of the dwain primitives (mirrors
/root/reference/tests/test_deco_primitives_dwain.py): wrap -> accumulate
output covariance over 8 synthetic batches -> eigh -> factor at full rank ->
swapped model output equals the original within 1e-6."""

import jax
import jax.numpy as jnp
import numpy as np

from ptdeco_tpu import engine, nn


def data_iterator_lin(key, bs, fin, h, w):
    while True:
        key, sub = jax.random.split(key)
        yield jax.random.uniform(sub, (bs, h, w, fin))


def data_iterator_conv(key, bs, fin, h, w):
    while True:
        key, sub = jax.random.split(key)
        yield jax.random.uniform(sub, (bs, h, w, fin))  # NHWC


class MyNetworkLinear(nn.Module):
    mod: nn.Linear

    def __call__(self, x, ctx=None):
        y = self.mod(x, ctx)
        return y.reshape(y.shape[0], -1)


class MyNetworkConv1x1(nn.Module):
    mod: nn.Conv2d

    def __call__(self, x, ctx=None):
        y = self.mod(x, ctx)
        return y.reshape(y.shape[0], -1)


def _decompose_at_full_rank(root, site_name, data_iterator, deco_rank):
    x = next(data_iterator)
    y0 = jax.jit(lambda m, x: m(x))(root, x)

    site = engine.get_site(root, site_name)
    kernel2d = engine.get_site_kernel2d(root, site)
    grams, _ = engine.compute_output_grams(
        root, [site_name], data_iterator, num_data_steps=8
    )
    u = engine.eigenvectors_from_gram(
        grams[site_name], use_damping=True, in_float64=True
    )
    k1, k2 = engine.build_factors(kernel2d, u, deco_rank)
    new_mod = engine.build_decomposed_module(root, site, k1, k2)
    root2 = nn.replace_submodule(root, site_name, new_mod)
    y1 = jax.jit(lambda m, x: m(x))(root2, x)
    return y0, y1


def test_linear_full_rank_exact():
    dim_in, dim_out = 64, 32
    key = jax.random.PRNGKey(271828)
    net = MyNetworkLinear(mod=nn.Linear.create(key, dim_in, dim_out))
    di = data_iterator_lin(jax.random.PRNGKey(1314159), 8, dim_in, 16, 16)
    y0, y1 = _decompose_at_full_rank(net, "mod", di, min(dim_in, dim_out))
    assert float(jnp.max(jnp.abs(y0 - y1))) < 1.0e-6


def test_conv1x1_full_rank_exact():
    dim_in, dim_out = 64, 32
    key = jax.random.PRNGKey(271828)
    net = MyNetworkConv1x1(
        mod=nn.Conv2d.create(key, dim_in, dim_out, kernel_size=1)
    )
    di = data_iterator_conv(jax.random.PRNGKey(1314159), 8, dim_in, 16, 16)
    y0, y1 = _decompose_at_full_rank(net, "mod", di, min(dim_in, dim_out))
    assert float(jnp.max(jnp.abs(y0 - y1))) < 1.0e-6


def test_strided_conv1x1_full_rank_exact():
    """Strided 1x1 convs (ResNet downsamples) must keep their stride in the
    factor pair — the reference silently drops it (dwain:119-144)."""

    class Net(nn.Module):
        mod: nn.Conv2d

        def __call__(self, x, ctx=None):
            return self.mod(x, ctx)

    net = Net(
        mod=nn.Conv2d.create(
            jax.random.PRNGKey(0), 24, 48, kernel_size=1, stride=2
        )
    )
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 24))
    y0 = net(x)
    assert y0.shape == (2, 8, 8, 48)

    def it(key):
        while True:
            key, sub = jax.random.split(key)
            yield jax.random.uniform(sub, (2, 16, 16, 24))

    site = engine.get_site(net, "mod")
    grams, _ = engine.compute_output_grams(net, ["mod"], it(jax.random.PRNGKey(2)), 4)
    u = engine.eigenvectors_from_gram(grams["mod"])
    k1, k2 = engine.build_factors(engine.get_site_kernel2d(net, site), u, 24)
    net2 = nn.replace_submodule(
        net, "mod", engine.build_decomposed_module(net, site, k1, k2)
    )
    y1 = net2(x)
    assert y1.shape == y0.shape
    assert float(jnp.max(jnp.abs(y0 - y1))) < 1e-6


def test_compose_deco_kernel_full_rank_is_identity():
    key = jax.random.PRNGKey(0)
    k = jax.random.normal(key, (48, 24))
    gram = k.T @ k  # any SPD matrix
    u = engine.eigenvectors_from_gram(gram, use_damping=True)
    deco = engine.compose_deco_kernel(k, jnp.asarray(u, jnp.float32), jnp.int32(24))
    np.testing.assert_allclose(np.asarray(deco), np.asarray(k), atol=1e-5)


def test_compose_deco_kernel_matches_explicit_truncation():
    key = jax.random.PRNGKey(7)
    k = jax.random.normal(key, (32, 16))
    gram = jnp.eye(16) + 0.1 * k.T @ k
    u = engine.eigenvectors_from_gram(gram, use_damping=False)
    rank = 5
    deco_masked = engine.compose_deco_kernel(
        k, jnp.asarray(u, jnp.float32), jnp.int32(rank)
    )
    uk = jnp.asarray(u[:, -rank:], jnp.float32)
    deco_explicit = (k @ uk) @ uk.T
    np.testing.assert_allclose(
        np.asarray(deco_masked), np.asarray(deco_explicit), atol=1e-5
    )


def test_low_rank_factors_match_projected_kernel():
    key = jax.random.PRNGKey(9)
    k = jax.random.normal(key, (40, 20))
    gram = jnp.eye(20) + (k.T @ k) / 40.0
    u = engine.eigenvectors_from_gram(gram, use_damping=False)
    rank = 8
    k1, k2 = engine.build_factors(k, u, rank)
    assert k1.shape == (40, rank) and k2.shape == (rank, 20)
    np.testing.assert_allclose(
        np.asarray(k1 @ k2),
        np.asarray(
            engine.compose_deco_kernel(k, jnp.asarray(u, jnp.float32), rank)
        ),
        atol=1e-5,
    )
