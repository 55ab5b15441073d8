"""Fused low-rank forward: kernel matches XLA pair; fuse/unfuse round-trip."""

import jax
import jax.numpy as jnp
import numpy as np

from ptdeco_tpu import nn, ops


def test_lowrank_matmul_small_fallback():
    k = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(k[0], (8, 32))
    k1 = jax.random.normal(k[1], (32, 4))
    k2 = jax.random.normal(k[2], (4, 16))
    b = jnp.arange(16.0)
    y = ops.lowrank_matmul(x, k1, k2, b)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(ops.lowrank_xla(x, k1, k2, b)), atol=1e-5
    )


def test_lowrank_matmul_pallas_interpret():
    k = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(k[0], (300, 128)) * 0.1  # pads to 512 rows
    k1 = jax.random.normal(k[1], (128, 8)) * 0.1
    k2 = jax.random.normal(k[2], (8, 520)) * 0.1  # pads to 1024 cols
    y = ops.lowrank_matmul(x, k1, k2, None, interpret=True)
    ref = ops.lowrank_xla(x, k1, k2, None)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-4)
    assert y.shape == (300, 520)


def test_fuse_unfuse_roundtrip():
    keys = jax.random.split(jax.random.PRNGKey(2), 4)
    pair_lin = nn.Sequential(
        layers=(
            nn.Linear.create(keys[0], 16, 4, use_bias=False),
            nn.Linear.create(keys[1], 4, 24),
        )
    )
    pair_conv = nn.Sequential(
        layers=(
            nn.Conv2d.create(keys[2], 8, 3, 1, use_bias=False),
            nn.Conv2d.create(keys[3], 3, 8, 1),
        )
    )

    class Net(nn.Module):
        a: nn.Module
        b: nn.Module

        def __call__(self, xs, ctx=None):
            return self.a(xs[0], ctx), self.b(xs[1], ctx)

    net = Net(a=pair_lin, b=pair_conv)
    fused = nn.fuse_factor_pairs(net)
    assert isinstance(fused.a, nn.FusedLowRankLinear)
    assert isinstance(fused.b, nn.FusedLowRankLinear) and fused.b.from_conv

    x_lin = jax.random.normal(jax.random.PRNGKey(3), (5, 16))
    x_img = jax.random.normal(jax.random.PRNGKey(4), (2, 6, 6, 8))
    y0 = net((x_lin, x_img))
    y1 = fused((x_lin, x_img))
    for a, b in zip(y0, y1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    back = nn.unfuse_factor_pairs(fused)
    assert isinstance(back.a, nn.Sequential)
    y2 = back((x_lin, x_img))
    for a, b in zip(y0, y2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fuse_skips_strided_conv_pair():
    keys = jax.random.split(jax.random.PRNGKey(5), 2)
    pair = nn.Sequential(
        layers=(
            nn.Conv2d.create(keys[0], 8, 3, 1, stride=2, use_bias=False),
            nn.Conv2d.create(keys[1], 3, 8, 1),
        )
    )

    class Net(nn.Module):
        a: nn.Module

        def __call__(self, x, ctx=None):
            return self.a(x, ctx)

    fused = nn.fuse_factor_pairs(Net(a=pair))
    assert isinstance(fused.a, nn.Sequential)  # unchanged
