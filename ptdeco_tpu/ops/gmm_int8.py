"""Grouped matmul over int8 expert weights — the MoE decode/serving
kernel for the weight-only int8 form (VERDICT r3 #3).

``grouped_matmul_int8`` computes, for rows sorted by expert and padded so
every expert's row-group is a multiple of the m-tile,

    out[i] = (lhs[i] @ (w_q[e_i] * scale[e_i]))        e_i = row i's expert

with the int8->bf16 conversion done PER TILE inside VMEM: HBM streams the
int8 grid (half the bytes of bf16) and the MXU sees bf16 operands.  The
host-side dequantize-then-gmm alternative writes a full (E, K, N) bf16
copy back to HBM and then reads it again — 2.5x the weight traffic of
this kernel (0.5 read int8 + 1 write bf16 + 1 read bf16), which is the
whole cost at MoE serving shapes where weights dwarf activations.

Layout contract (the caller builds it — see MoEMLP._grouped_int8):
  * rows are sorted by expert and scattered into per-group slots padded
    to ``bm`` (``M`` is a multiple of ``bm``); pad rows are zero and
    their outputs are discarded by the caller's gather;
  * ``tile_expert[t]`` is the expert id owning m-tile ``t`` — because of
    the padding, every m-tile is wholly inside ONE expert, so the kernel
    needs no group-boundary masking at all: it is a block-diagonal
    matmul with a scalar-prefetched block->expert map (the map drives
    the ``w_q``/``scale`` BlockSpec index_maps, the idiom
    ops/gram_pallas.py uses for its triangle grid).

Because scale is per OUTPUT channel, ``x @ (w_q * scale) == (x @ w_q) *
scale`` — the kernel accumulates the int8-converted dot in f32 and
applies the scale once per output tile, not per weight element.

GSPMD legality (VERDICT r4 #4): the op is wrapped in
``jax.experimental.custom_partitioning`` the way ops/flash_attention.py
and ops/gram_pallas.py are, so under ep/tp meshes int8 MoE decode stays
on the kernel instead of falling off to the dequant path:

* **N axis (tp, column-parallel)** — each shard runs the kernel on its
  own output columns (``w_q``/``scale``/``out`` n-sharded); nothing else
  changes.
* **E axis (ep, expert-parallel)** — each shard holds ``E/ep`` experts'
  int8 grids.  The per-shard lowering rebases the tile->expert map to
  local expert ids, clamps non-local tiles (their outputs are masked to
  zero), runs the kernel, and ``psum``s over the ep axis: every padded
  row belongs to exactly one expert, so exactly one shard contributes
  it.  Non-local tiles burn MXU cycles on a clamped expert-0 block, but
  the quantity the kernel exists to divide — int8 WEIGHT streaming, the
  decode bound — is E/ep per device.
* ``lhs`` rows and ``tile_expert`` are need-replication: the padded row
  layout is data-dependent (sorted by expert), so no static row
  sharding can align with expert boundaries.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ["grouped_matmul_int8", "pad_groups_for_tiles"]


def pad_groups_for_tiles(
    group_sizes: jax.Array, n_rows: int, n_tiles: int, bm: int
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Per-group padded layout bookkeeping (all shapes static).

    Returns ``(dst, tile_expert, row_expert)`` where ``dst[i]`` is the
    padded-space position of sorted row ``i``, ``tile_expert[t]`` the
    expert owning m-tile ``t`` (trailing empty tiles clamp to the last
    expert; their rows are zero), and ``row_expert[j]`` the expert of
    padded-space row ``j`` (for per-row bias adds in padded space)."""
    e = group_sizes.shape[0]
    padded = ((group_sizes + bm - 1) // bm) * bm
    pad_offs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)[:-1].astype(jnp.int32)]
    )
    starts = jnp.concatenate(
        [
            jnp.zeros((1,), jnp.int32),
            jnp.cumsum(group_sizes)[:-1].astype(jnp.int32),
        ]
    )
    # sorted row i belongs to expert eid(i); rank within its group
    row_ids = jnp.arange(n_rows, dtype=jnp.int32)
    eid = jnp.searchsorted(
        jnp.cumsum(group_sizes), row_ids, side="right"
    ).astype(jnp.int32)
    dst = pad_offs[eid] + (row_ids - starts[eid])
    bounds = jnp.cumsum(padded)
    tile_expert = jnp.minimum(
        jnp.searchsorted(
            bounds, jnp.arange(n_tiles, dtype=jnp.int32) * bm, side="right"
        ),
        e - 1,
    ).astype(jnp.int32)
    row_expert = jnp.minimum(
        jnp.searchsorted(
            bounds, jnp.arange(n_tiles * bm, dtype=jnp.int32), side="right"
        ),
        e - 1,
    ).astype(jnp.int32)
    return dst, tile_expert, row_expert


def _kernel(te_ref, lhs_ref, w_ref, s_ref, out_ref, acc_ref, *, n_k: int):
    k_i = pl.program_id(2)

    @pl.when(k_i == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jnp.dot(
        lhs_ref[...],
        w_ref[0].astype(lhs_ref.dtype),  # int8 -> compute dtype, in VMEM
        preferred_element_type=jnp.float32,
    )

    @pl.when(k_i == n_k - 1)
    def _store():
        out_ref[...] = (
            acc_ref[...] * s_ref[0, 0].astype(jnp.float32)[None, :]
        ).astype(out_ref.dtype)


def _pick_tile(dim: int, candidates: tuple) -> int:
    """Largest candidate dividing ``dim``; 0 if none (caller pads)."""
    for c in candidates:
        if dim % c == 0:
            return c
    return 0


@functools.partial(
    jax.jit, static_argnames=("bm", "bk", "bn", "interpret")
)
def _gmm_int8_padded(
    lhs: jax.Array,
    w_q: jax.Array,
    scale: jax.Array,
    tile_expert: jax.Array,
    *,
    bm: int,
    bk: int,
    bn: int,
    interpret: bool,
) -> jax.Array:
    m, k = lhs.shape
    e, _, n = w_q.shape
    n_k = k // bk
    grid = (m // bm, n // bn, n_k)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda mi, ni, ki, te: (mi, ki)),
            pl.BlockSpec(
                (1, bk, bn), lambda mi, ni, ki, te: (te[mi], ki, ni)
            ),
            # scale rides as (E, 1, N): a (1, bn) block on (E, N) violates
            # the TPU tiling rule (penultimate block dim must divide 8 or
            # span the array); (1, 1, bn) on (E, 1, N) is legal
            pl.BlockSpec(
                (1, 1, bn), lambda mi, ni, ki, te: (te[mi], 0, ni)
            ),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda mi, ni, ki, te: (mi, ni)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_kernel, n_k=n_k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), lhs.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=(
                lhs.size * lhs.dtype.itemsize
                + w_q.size  # int8: 1 byte — the point of the kernel
                + m * n * lhs.dtype.itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(tile_expert, lhs, w_q, scale)


def _gmm_core(lhs, w_q, scale, tile_expert, bm: int, interpret: bool):
    """Single-shard grouped matmul: tile selection + granule padding +
    the Pallas call.  ``scale`` is (E, N) float32 here."""
    m, k = lhs.shape
    e, k2, n = w_q.shape
    assert k == k2 and m % bm == 0, (lhs.shape, w_q.shape, bm)
    bk = _pick_tile(k, (1024, 512, 256, 128))
    bn = _pick_tile(n, (1024, 512, 256, 128))
    k_pad = 0 if bk else (-k) % 128
    n_pad = 0 if bn else (-n) % 128
    if k_pad or n_pad:
        lhs = jnp.pad(lhs, ((0, 0), (0, k_pad))) if k_pad else lhs
        w_q = jnp.pad(w_q, ((0, 0), (0, k_pad), (0, n_pad)))
        scale = jnp.pad(scale, ((0, 0), (0, n_pad))) if n_pad else scale
        bk = bk or _pick_tile(k + k_pad, (1024, 512, 256, 128))
        bn = bn or _pick_tile(n + n_pad, (1024, 512, 256, 128))
    out = _gmm_int8_padded(
        lhs, w_q, scale[:, None, :], tile_expert,
        bm=bm, bk=bk, bn=bn, interpret=interpret,
    )
    return out[:, :n] if n_pad else out


def _flat_axis_index(axes):
    """axis_index over a single mesh axis name or a tuple of them."""
    if isinstance(axes, (tuple, list)):
        idx = jnp.int32(0)
        for a in axes:
            idx = idx * jax.lax.psum(1, a) + jax.lax.axis_index(a)
        return idx
    return jax.lax.axis_index(axes)


@functools.partial(custom_partitioning, static_argnums=(4, 5))
def _gmm_partitioned(lhs, w_q, scale, tile_expert, bm, interpret):
    return _gmm_core(lhs, w_q, scale, tile_expert, bm, interpret)


# callbacks run as callback(*static_args, mesh, arg_shapes, result_shape)
def _gmm_partition(bm, interpret, mesh, arg_shapes, result_shape):
    wq_spec = arg_shapes[1].sharding.spec
    e_axes = wq_spec[0] if len(wq_spec) > 0 else None
    n_axes = wq_spec[2] if len(wq_spec) > 2 else None
    arg_shardings = (
        NamedSharding(mesh, P(None, None)),       # lhs: replicated rows
        NamedSharding(mesh, P(e_axes, None, n_axes)),
        NamedSharding(mesh, P(e_axes, n_axes)),
        NamedSharding(mesh, P(None)),             # tile_expert
    )
    out_sharding = NamedSharding(mesh, P(None, n_axes))

    def lower_fn(lhs, w_q, scale, tile_expert):
        if e_axes is None:
            return _gmm_core(lhs, w_q, scale, tile_expert, bm, interpret)
        # expert-parallel shard: rebase the global tile->expert map to
        # this shard's expert range, clamp+mask foreign tiles, psum —
        # each padded row is owned by exactly one shard
        e_local = w_q.shape[0]
        offs = _flat_axis_index(e_axes) * e_local
        te = tile_expert - offs
        valid = (te >= 0) & (te < e_local)
        te_c = jnp.clip(te, 0, e_local - 1)
        out = _gmm_core(lhs, w_q, scale, te_c, bm, interpret)
        out = out * jnp.repeat(valid, bm).astype(out.dtype)[:, None]
        return jax.lax.psum(out, e_axes)

    return mesh, lower_fn, out_sharding, arg_shardings


def _gmm_infer(bm, interpret, mesh, arg_shapes, result_shape):
    wq_spec = arg_shapes[1].sharding.spec
    n_axes = wq_spec[2] if len(wq_spec) > 2 else None
    return NamedSharding(mesh, P(None, n_axes))


_gmm_partitioned.def_partition(
    partition=_gmm_partition,
    infer_sharding_from_operands=_gmm_infer,
    sharding_rule="m k, e k n, e n, t -> m n",
    need_replication_factors=("m", "k", "t"),
)


def grouped_matmul_int8(
    lhs: jax.Array,  # (M, K) activation dtype, M % bm == 0
    w_q: jax.Array,  # (E, K, N) int8
    scale: jax.Array,  # (E, N) f32 (or any float) per output channel
    tile_expert: jax.Array,  # (M // bm,) int32
    *,
    bm: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """See module docstring.  K/N tiles adapt to the dims; dims with no
    nice divisor pad to the int8 lane/sublane granule (repo convention:
    pad outside, keep the kernel divisible — ops/gram_pallas.py:144).
    GSPMD-partitionable over the expert (ep) and output-column (tp) axes
    via custom_partitioning; never differentiated (serving-only)."""
    return _gmm_partitioned(
        lhs,
        w_q,
        scale.astype(jnp.float32),
        jnp.asarray(tile_expert, jnp.int32),
        bm,
        bool(interpret),
    )
