"""GSPMD-partitionable causal flash attention.

The Pallas flash kernel
(jax.experimental.pallas.ops.tpu.flash_attention) is opaque to GSPMD: XLA
cannot see inside a custom call, so under a mesh it would all-gather every
operand — which is why the attention dispatch used to gate the kernel on
``device_count() == 1`` and fall back to the einsum path on meshes,
losing the single-chip HBM win (the einsum path writes/reads an s x s f32
logits tensor per batch element per layer; 128MB at calibration shapes).

``flash_attention`` fixes this with ``jax.experimental
.custom_partitioning``: attention is embarrassingly parallel over the
batch and head dimensions, so the op declares exactly that —

* sharding rule ``b h s d, ... -> b h s d`` (shardy) with ``s`` and ``d``
  marked need-replication (causal attention needs the full sequence; the
  kernel needs the full head_dim), plus the equivalent
  infer/partition callbacks for the legacy GSPMD partitioner;
* a per-shard lowering that runs the Pallas kernel on each device's
  LOCAL (b/h-sharded) block.

Under dp-sharded calibration batches or Megatron tp-sharded heads the
kernel now runs per-device with zero resharding; a sequence-sharded (sp)
input is legally resharded to replicated-in-s first.  Inputs are
``(batch, heads, seq, head_dim)`` (the kernel's native layout).

On non-TPU backends the same op lowers to the einsum reference (used by
the CPU mesh tests — tests/test_flash_partitioning.py pins that the
batch/head sharding survives and the result is exact); the TPU kernel's
numerics are pinned against the einsum path on-device in
aux/bench_calib_mfu.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ["flash_attention"]


def _reference_causal(q, k, v, sm_scale):
    # f32-logits causal softmax attention — the einsum path's numerics
    logits = (
        jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        * sm_scale
    )
    s = q.shape[2]
    mask = jnp.tril(jnp.ones((s, s), bool))
    logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def _core(q, k, v, sm_scale):
    if jax.default_backend() == "tpu":
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention as _tpu_flash,
        )

        return _tpu_flash(q, k, v, causal=True, sm_scale=sm_scale)
    return _reference_causal(q, k, v, sm_scale)


@functools.partial(custom_partitioning, static_argnums=(3,))
def _flash_partitioned(q, k, v, sm_scale):
    return _core(q, k, v, sm_scale)


def _bh_sharded(sharding):
    """Keep whatever mesh axes sit on batch/heads; replicate seq/head_dim."""
    spec = sharding.spec
    names = tuple(spec[i] if i < len(spec) else None for i in range(2))
    return NamedSharding(sharding.mesh, P(*names, None, None))


# custom_partitioning invokes the callbacks as
# callback(*static_args, mesh, arg_shapes, result_shape)
def _partition(sm_scale, mesh, arg_shapes, result_shape):
    q_sh = _bh_sharded(arg_shapes[0].sharding)

    def lower_fn(q, k, v):
        return _core(q, k, v, sm_scale)

    return mesh, lower_fn, q_sh, (q_sh, q_sh, q_sh)


def _infer(sm_scale, mesh, arg_shapes, result_shape):
    return _bh_sharded(arg_shapes[0].sharding)


_flash_partitioned.def_partition(
    partition=_partition,
    infer_sharding_from_operands=_infer,
    sharding_rule="b h s d, b h s d, b h s d -> b h s d",
    need_replication_factors=("s", "d"),
)


# custom_partitioning has no differentiation rule, so the public op wraps
# it in a custom_vjp whose backward is the recompute VJP of the einsum
# reference: ordinary GSPMD-partitionable ops, and exactly the cost the
# einsum path's backward pays anyway (forwards that are never
# differentiated — calibration, ppl, serving — keep the pure flash path).
@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, sm_scale):
    """Causal attention on (b, h, s, d) tensors, batch/head-partitionable.

    Forward runs the Pallas flash kernel per shard (batch/head
    partitioned via custom_partitioning); backward recomputes through the
    einsum reference."""
    return _flash_partitioned(q, k, v, sm_scale)


def _fwd(q, k, v, sm_scale):
    return _flash_partitioned(q, k, v, sm_scale), (q, k, v)


def _bwd(sm_scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: _reference_causal(a, b, c, sm_scale),
                     q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)
