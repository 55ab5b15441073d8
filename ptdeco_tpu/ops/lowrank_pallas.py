"""Pallas TPU kernel: fused low-rank forward ``y = (x @ K1) @ K2 + b``.

After decomposition every site is a factor pair; XLA executes it as two
matmuls with the (N, r) intermediate round-tripping through HBM.  This
kernel keeps the intermediate in VMEM: per row-tile the rank-r hidden is
computed once into scratch and reused across all output column tiles —
serving-path fusion for decomposed models (the factor pair's whole point is
that r is small, so the hidden tile is tiny).

Use via ``nn_fuse.fuse_factor_pairs(model)`` which swaps Sequential factor
pairs for ``FusedLowRankLinear`` modules.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["lowrank_matmul", "lowrank_xla"]

TN = 256  # row tile
TO = 512  # output-column tile


def lowrank_xla(
    x: jax.Array, k1: jax.Array, k2: jax.Array, bias: Optional[jax.Array]
) -> jax.Array:
    h = jnp.dot(x, k1, preferred_element_type=jnp.float32)
    y = jnp.dot(h.astype(x.dtype), k2, preferred_element_type=jnp.float32)
    if bias is not None:
        y = y + bias
    return y.astype(x.dtype)


def _kernel(x_ref, k1_ref, k2_ref, bias_ref, out_ref, hidden_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        hidden_ref[:] = jnp.dot(
            x_ref[:], k1_ref[:], preferred_element_type=jnp.float32
        )

    y = jnp.dot(
        hidden_ref[:].astype(x_ref.dtype),
        k2_ref[:],
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = (y + bias_ref[:].astype(jnp.float32)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _lowrank_padded(x, k1, k2, bias, interpret=False):
    n, d_in = x.shape
    r = k1.shape[1]
    d_out = k2.shape[1]
    grid = (n // TN, d_out // TO)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n, d_out), x.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((TN, d_in), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d_in, r), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((r, TO), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TO), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (TN, TO), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[pltpu.VMEM((TN, r), jnp.float32)],
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * r * (d_in + d_out),
            bytes_accessed=(
                x.size * x.dtype.itemsize
                + k1.size * k1.dtype.itemsize
                + k2.size * k2.dtype.itemsize
                + n * d_out * x.dtype.itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, k1, k2, bias)


def lowrank_matmul(
    x: jax.Array,
    k1: jax.Array,
    k2: jax.Array,
    bias: Optional[jax.Array] = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused ``(x @ K1) @ K2 + b`` for 2D+ x (leading dims flattened).

    Falls back to the XLA pair below the tiling threshold or when the VMEM
    working set would not fit."""
    lead = x.shape[:-1]
    d_in = x.shape[-1]
    r = k1.shape[1]
    d_out = k2.shape[1]
    x2 = x.reshape(-1, d_in)
    n = x2.shape[0]

    itemsize = max(x.dtype.itemsize, 2)
    vmem_bytes = (
        TN * d_in * itemsize
        + d_in * r * itemsize
        + r * TO * itemsize
        + TN * TO * 4
        + TN * r * 4
    )
    # r < 128 pads the lane dimension of both the (., r) hidden tile and the
    # (r, TO) K2 tile to 128 — measured slower than the XLA pair on v5e
    # (BENCH_SERVING.json rank-32 run); wins start at r >= 128
    if n < TN or d_out < TO or r < 128 or vmem_bytes > 12 * 1024 * 1024:
        y = lowrank_xla(x2, k1, k2, bias)
        return y.reshape(*lead, d_out)

    n_pad = (-n) % TN
    o_pad = (-d_out) % TO
    xp = jnp.pad(x2, ((0, n_pad), (0, 0))) if n_pad else x2
    k2p = jnp.pad(k2, ((0, 0), (0, o_pad))) if o_pad else k2
    b = bias if bias is not None else jnp.zeros((d_out,), x.dtype)
    bp = (jnp.pad(b, (0, o_pad)) if o_pad else b).reshape(1, -1)
    y = _lowrank_padded(xp, k1, k2p, bp, interpret=interpret)
    y = y[:n, :d_out]
    return y.reshape(*lead, d_out)
