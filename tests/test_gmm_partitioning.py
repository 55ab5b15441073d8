"""GSPMD partitioning of the int8 grouped matmul (ops/gmm_int8.py).

VERDICT r4 #4: the kernel used to be gated to ``device_count() == 1`` —
under the ep/tp meshes the repo ships, int8 MoE decode silently fell off
the fast path.  custom_partitioning now declares the op partitionable
over the expert axis (per-shard: rebased tile->expert map + foreign-tile
masking + psum) and the output-column axis (plain column parallelism).
These tests run the kernel in interpret mode per shard on the 8-device
CPU mesh and pin exactness against the dense per-expert reference, plus
the output sharding (no silent all-gather of the int8 grids).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ptdeco_tpu.ops.gmm_int8 import (
    grouped_matmul_int8,
    pad_groups_for_tiles,
)
from ptdeco_tpu.parallel import make_mesh

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)

E, K, N, BM = 8, 128, 256, 128


def _problem(seed=0):
    rng = np.random.default_rng(seed)
    # non-aligned groups + an empty one: the layout edge cases
    sizes = np.asarray([19, 0, 45, 7, 133, 24, 1, 30], np.int32)
    m = int(sizes.sum())
    lhs = rng.standard_normal((m, K)).astype(np.float32)
    w_q = rng.integers(-127, 128, size=(E, K, N)).astype(np.int8)
    scale = (0.01 + rng.random((E, N))).astype(np.float32)
    n_tiles = -(-m // BM) + E
    dst, tile_expert, _ = pad_groups_for_tiles(
        jnp.asarray(sizes), m, n_tiles, BM
    )
    xp = jnp.zeros((n_tiles * BM, K), jnp.float32).at[dst].set(lhs)
    want = np.empty((m, N), np.float32)
    start = 0
    for ei, sz in enumerate(sizes):
        wd = w_q[ei].astype(np.float32) * scale[ei][None, :]
        want[start : start + sz] = lhs[start : start + sz] @ wd
        start += sz
    return xp, w_q, scale, tile_expert, dst, want


def _run_on_mesh(mesh, wq_pspec, sc_pspec):
    xp, w_q, scale, tile_expert, dst, want = _problem()
    wq_s = jax.device_put(jnp.asarray(w_q), NamedSharding(mesh, wq_pspec))
    sc_s = jax.device_put(jnp.asarray(scale), NamedSharding(mesh, sc_pspec))
    xp_s = jax.device_put(xp, NamedSharding(mesh, P(None, None)))
    out = jax.jit(
        lambda a, b, c, t: grouped_matmul_int8(
            a, b, c, t, bm=BM, interpret=True
        )
    )(xp_s, wq_s, sc_s, tile_expert)
    got = np.asarray(out)[np.asarray(dst)]
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-3)
    return out


def test_expert_parallel_exact():
    """ep-sharded int8 grids: each shard computes its own experts' tiles,
    foreign tiles are masked, psum assembles — bit-parity with serial."""
    mesh = make_mesh(dp=1, ep=8)
    _run_on_mesh(mesh, P("ep", None, None), P("ep", None))


def test_expert_and_column_parallel_exact():
    mesh = make_mesh(dp=1, ep=4, tp=2)
    out = _run_on_mesh(mesh, P("ep", None, "tp"), P("ep", "tp"))
    # output columns stay tp-sharded: the kernel ran per shard and no
    # all-gather of the int8 grids happened on the N side
    assert out.sharding.spec in (P(None, "tp"), P(None, ("tp",))), (
        out.sharding.spec
    )


def test_column_parallel_only_exact():
    mesh = make_mesh(dp=1, tp=8)
    out = _run_on_mesh(mesh, P(None, None, "tp"), P(None, "tp"))
    assert out.sharding.spec in (P(None, "tp"), P(None, ("tp",))), (
        out.sharding.spec
    )


def test_single_device_path_unchanged():
    """Outside any mesh the op behaves exactly as before (the existing
    interpret-mode parity test in test_quant.py covers numerics; this
    pins the custom_partitioning wrapper adds nothing on one device)."""
    xp, w_q, scale, tile_expert, dst, want = _problem()
    out = grouped_matmul_int8(
        xp, jnp.asarray(w_q), jnp.asarray(scale), tile_expert,
        bm=BM, interpret=True,
    )
    got = np.asarray(out)[np.asarray(dst)]
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-3)
