"""GSPMD partitioning of the flash-attention op (ops/flash_attention.py).

custom_partitioning declares attention embarrassingly parallel over
batch/heads, so the Pallas kernel runs per-device under dp/tp meshes
instead of falling back to the einsum path (the old
``device_count() == 1`` gate).  On CPU the op lowers to the einsum
reference, which lets these tests pin the PARTITIONING behavior — the
kernel itself is pinned against the einsum path on the real chip
(aux/bench_calib_mfu.py parity assertion).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ptdeco_tpu.ops.flash_attention import _reference_causal, flash_attention
from ptdeco_tpu.parallel import make_mesh

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)

B, H, S, D = 8, 4, 16, 8
SCALE = 0.37


def _qkv():
    key = jax.random.PRNGKey(0)
    return tuple(
        jax.random.normal(
            jax.random.fold_in(key, i), (B, H, S, D), jnp.float32
        )
        for i in range(3)
    )


def test_dp_tp_sharding_preserved_and_exact():
    q, k, v = _qkv()
    ref = _reference_causal(q, k, v, SCALE)
    mesh = make_mesh(dp=4, tp=2)
    sh = NamedSharding(mesh, P("dp", "tp"))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
    out = jax.jit(lambda a, b, c: flash_attention(a, b, c, SCALE))(qs, ks, vs)
    # batch stays dp-sharded, heads tp-sharded: the kernel ran per-shard
    assert out.sharding.spec == P("dp", "tp"), out.sharding.spec
    assert out.addressable_shards[0].data.shape == (B // 4, H // 2, S, D)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


def test_seq_sharded_input_is_replicated_not_wrong():
    # an sp-sharded sequence axis must be gathered (need_replication),
    # never silently attended locally
    q, k, v = _qkv()
    ref = _reference_causal(q, k, v, SCALE)
    mesh = make_mesh(dp=2, sp=4)
    sh = NamedSharding(mesh, P("dp", None, "sp"))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
    out = jax.jit(lambda a, b, c: flash_attention(a, b, c, SCALE))(qs, ks, vs)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


def test_grads_through_partitioned_op():
    q, k, v = _qkv()
    mesh = make_mesh(dp=4, tp=2)
    sh = NamedSharding(mesh, P("dp", "tp"))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))

    def loss_flash(a, b, c):
        return (flash_attention(a, b, c, SCALE) ** 2).sum()

    def loss_ref(a, b, c):
        return (_reference_causal(a, b, c, SCALE) ** 2).sum()

    gf = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(qs, ks, vs)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
        )
    assert gf[0].sharding.spec == P("dp", "tp")


def test_single_device_unchanged():
    q, k, v = _qkv()
    out = flash_attention(q, k, v, SCALE)
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(_reference_causal(q, k, v, SCALE)),
        atol=1e-6,
    )
