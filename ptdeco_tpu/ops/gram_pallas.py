"""Pallas TPU kernel: symmetric Gram accumulation (SYRK).

``gram = Yᵀ Y`` for Y of shape (N, d) is the hot op of calibration
(reference accumulates it as a full einsum per batch,
/root/reference/src/ptdeco/dwain/decomposition.py:147-152).  XLA computes
the full d×d product; this kernel computes only the lower triangle of tiles
(SYRK), halving MXU work for large d, with f32 accumulation from bf16/f32
inputs held in a VMEM scratch across the k-loop.

The (i, j) tile pairs of the lower triangle are streamed in through scalar
prefetch (PrefetchScalarGridSpec) so the grid is exactly the triangle —
no wasted launches, no masked writes.

Falls back to plain XLA below the tiling threshold or on non-TPU backends.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "syrk_gram",
    "syrk_gram_sharded",
    "syrk_gram_partitioned",
    "gram_xla",
    "should_use_syrk",
]

TILE = 256  # output tile (TILE, TILE); multiple of MXU 128
KB = 512  # reduction block over N


def gram_xla(y: jax.Array) -> jax.Array:
    """Reference XLA path: full (d, d) f32 Gram."""
    return jnp.einsum("np,nq->pq", y, y, preferred_element_type=jnp.float32)


def _syrk_kernel(i_arr, j_arr, y_i_ref, y_j_ref, out_ref, acc_ref):
    k = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        y_i_ref[:],
        y_j_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),  # contract N
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == nk - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _syrk_padded(y: jax.Array, interpret: bool = False) -> jax.Array:
    """y already padded: N % KB == 0, d % TILE == 0.  Returns full (d, d)."""
    n, d = y.shape
    nt = d // TILE
    nk = n // KB
    tri = [(i, j) for i in range(nt) for j in range(i + 1)]
    i_arr = jnp.asarray(np.array([t[0] for t in tri], np.int32))
    j_arr = jnp.asarray(np.array([t[1] for t in tri], np.int32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(len(tri), nk),
        in_specs=[
            pl.BlockSpec((KB, TILE), lambda t, k, i_arr, j_arr: (k, i_arr[t])),
            pl.BlockSpec((KB, TILE), lambda t, k, i_arr, j_arr: (k, j_arr[t])),
        ],
        out_specs=pl.BlockSpec(
            (TILE, TILE), lambda t, k, i_arr, j_arr: (i_arr[t], j_arr[t])
        ),
        scratch_shapes=[pltpu.VMEM((TILE, TILE), jnp.float32)],
    )

    lower = pl.pallas_call(
        _syrk_kernel,
        out_shape=jax.ShapeDtypeStruct((d, d), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * d * d // 2,
            bytes_accessed=y.size * y.dtype.itemsize + d * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(i_arr, j_arr, y, y)

    # mirror the strict-lower tile triangle to the upper half.  Tiles above
    # the diagonal were never written; rebuild from the transpose.
    row = jax.lax.broadcasted_iota(jnp.int32, (d, d), 0) // TILE
    col = jax.lax.broadcasted_iota(jnp.int32, (d, d), 1) // TILE
    keep_lower = row >= col
    return jnp.where(keep_lower, lower, lower.T)


def should_use_syrk(dtype: Any, d: int, backend: Optional[str] = None) -> bool:
    """Auto-dispatch rule for the calibration Gram (engine passes
    ``use_pallas=None``).  ``dtype`` is the site's ACTIVATION dtype — on
    the SYRK path the engine computes y MXU-native in that dtype and the
    kernel accumulates the Gram in f32; on the einsum path y is f32 from a
    HIGHEST-precision site matmul.

    Measured on v5e against the engine's real alternative (f32-HIGHEST
    einsum) at d=2048 n=8192: **23x**, with max relative Gram error 2e-4 —
    the precision trade is bounded by the bf16 numerics the user already
    chose for the model.  f32 activations keep the einsum (kernel-vs-kernel
    was a 0.94-1.13x wash, and f32 y is exact there).

    Mesh-legal: the engine routes this path through
    ``syrk_gram_partitioned`` (custom_partitioning), whose per-shard
    lowering runs the kernel on each device's LOCAL rows and psums the
    partial Grams over the row-sharding axes — the same communication
    pattern XLA derives for the einsum path, with the kernel's 2x triangle
    saving on every shard.  A bare ``syrk_gram`` pallas_call would instead
    all-gather sharded activations (GSPMD-opaque), which is why earlier
    revisions gated this on ``device_count() == 1``."""
    if backend is None:
        backend = jax.default_backend()
    return (
        backend == "tpu"
        and jnp.dtype(dtype) == jnp.bfloat16
        and d >= 2 * TILE
    )


def syrk_gram(y: jax.Array, interpret: bool = False) -> jax.Array:
    """Symmetric Gram ``Yᵀ Y`` in f32.  Pads N to KB and d to TILE (zero
    rows/cols are exact no-ops for a Gram matrix)."""
    n, d = y.shape
    if d < 2 * TILE:  # no triangle advantage below 2 tiles
        return gram_xla(y)
    n_pad = (-n) % KB
    d_pad = (-d) % TILE
    if n_pad or d_pad:
        y = jnp.pad(y, ((0, n_pad), (0, d_pad)))
    g = _syrk_padded(y, interpret=interpret)
    if d_pad:
        g = g[:d, :d]
    return g


def _row_axes_of(sharding) -> tuple[str, ...]:
    """Mesh axis names sharding a (n, d) array's ROW dimension."""
    spec = sharding.spec
    row = spec[0] if len(spec) else None
    if row is None:
        return ()
    if isinstance(row, str):
        return (row,)
    return tuple(row)


from jax.experimental.custom_partitioning import (  # noqa: E402
    custom_partitioning as _custom_partitioning,
)
from jax.sharding import NamedSharding as _NamedSharding  # noqa: E402
from jax.sharding import PartitionSpec as _P  # noqa: E402


# y is passed twice because shardy's sharding rules forbid reusing one
# factor twice in the result of a single operand ('n d -> d d' is
# rejected); 'n d, n e -> d e' with both operands the same value expresses
# the Gram exactly and XLA CSEs the duplicate.
@_custom_partitioning
def _syrk_partitioned(y, y_again):
    return syrk_gram(y)


def _syrk_partition(mesh, arg_shapes, result_shape):
    sh = arg_shapes[0].sharding
    row_axes = _row_axes_of(sh)
    in_sh = _NamedSharding(sh.mesh, _P(sh.spec[0] if row_axes else None, None))
    out_sh = _NamedSharding(sh.mesh, _P(None, None))

    def lower_fn(y, y_again):
        g = syrk_gram(y)
        if row_axes:
            g = jax.lax.psum(g, row_axes)
        return g

    return mesh, lower_fn, out_sh, (in_sh, in_sh)


def _syrk_infer(mesh, arg_shapes, result_shape):
    return _NamedSharding(arg_shapes[0].sharding.mesh, _P(None, None))


_syrk_partitioned.def_partition(
    partition=_syrk_partition,
    infer_sharding_from_operands=_syrk_infer,
    sharding_rule="n d, n e -> d e",
    reduction_factors=("n",),
    need_replication_factors=("d", "e"),
)


def syrk_gram_partitioned(y: jax.Array) -> jax.Array:
    """GSPMD-legal SYRK Gram: under a mesh with the rows of ``y`` sharded
    (dp/sp calibration batches), each device runs the Pallas kernel on its
    LOCAL rows and the partial Grams psum over the row axes — the einsum
    path's communication pattern with the kernel's 2x triangle saving per
    shard.  On a single device this is exactly ``syrk_gram``.  Forward
    only (calibration Grams are never differentiated)."""
    return _syrk_partitioned(y, y)


def syrk_gram_sharded(
    y: jax.Array,
    mesh: Any,
    row_axes: tuple[str, ...] = ("dp",),
    interpret: bool = False,
) -> jax.Array:
    """Mesh-compatible SYRK: ``Yᵀ Y`` for y whose ROWS are sharded over
    ``row_axes`` of ``mesh``.

    A bare ``pallas_call`` is opaque to GSPMD (it would all-gather the
    sharded activations); wrapping it in ``shard_map`` runs the SYRK
    per-shard on each device's LOCAL rows and ``psum``s the partial Grams
    over the row axes — the same communication pattern XLA derives for the
    einsum path, with the kernel's 2x triangle saving on every shard.
    Returns the full (d, d) f32 Gram, replicated."""
    from jax.sharding import PartitionSpec as P

    shard_map = jax.shard_map
    def local(y_local: jax.Array) -> jax.Array:
        g = syrk_gram(y_local, interpret=interpret)
        for ax in row_axes:
            g = jax.lax.psum(g, ax)
        return g

    return shard_map(
        local,
        mesh=mesh,
        in_specs=P(row_axes),
        out_specs=P(),
        check_vma=False,
    )(y)
