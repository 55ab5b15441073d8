"""Pipeline parallelism over the decoder layer stack.

``pipeline_logits`` runs a homogeneous ``CausalLM`` block stack as a
GPipe-style fill-drain pipeline over a ``pp`` mesh axis: per-layer
parameter pytrees are stacked to ``(L, ...)`` leaves sharded
``PartitionSpec("pp", ...)`` — each device STORES L/pp layers, the point
of pipeline parallelism — and a ``shard_map`` program ticks microbatched
activations through the stages with ``lax.ppermute`` over the ``pp``
axis.  Composes with ``dp`` (microbatches additionally shard their batch
dim over dp; the ppermute is per-dp-row).  The embedding and head stages
reuse the model's own ``Decoder.embed_inputs`` / ``CausalLM.head``
methods, so there is no duplicated pre/post-layer logic to drift.

Where this fits the workload: calibration forwards, perplexity/metric
evaluation and simple finetune steps of models whose layer stack exceeds
one chip's HBM even under TP.  The per-site decomposition walk itself
keeps the unstacked form (sites must stay addressable — the same
tension, and the same opt-in answer, as ``models.stack_moe_experts``).

Correctness-first GPipe: the fill/drain bubble is (S-1)/(M+S-1) of the
ticks and each stage holds one activations buffer per microbatch slot;
differentiable end to end (scan + ppermute + scatter), so
``jax.value_and_grad`` through ``pipeline_logits`` gives exact pipeline
training steps (pinned vs the unpipelined model in
tests/test_pipeline.py).

The reference is strictly single-GPU (SURVEY.md §2.7) — no analogue.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DP_AXIS, PP_AXIS

__all__ = ["pipeline_logits", "stack_block_params"]


def stack_block_params(blocks: tuple) -> tuple[Any, list[jax.Array]]:
    """(treedef, stacked leaves) for a homogeneous block tuple.

    Every block must have the same tree structure (static fields are part
    of the frozen-dataclass aux data, so this also pins per-layer statics)
    and leaf shapes; raises ValueError otherwise — hybrid stacks
    (per-layer sliding/mamba mixers) are not pipelineable this way."""
    if not blocks:
        raise ValueError("empty layer stack")
    flats = []
    treedef0 = None
    for i, b in enumerate(blocks):
        leaves, treedef = jax.tree_util.tree_flatten(b)
        if treedef0 is None:
            treedef0 = treedef
        elif treedef != treedef0:
            raise ValueError(
                f"layer {i} structure differs from layer 0 — the pipeline "
                "needs a homogeneous stack (hybrid/per-layer-typed models "
                "are not stackable)"
            )
        flats.append(leaves)
    for i, (a, b) in enumerate(zip(flats[0], flats[-1])):
        if jnp.shape(a) != jnp.shape(b):
            raise ValueError(f"leaf {i} shape differs across layers")
    stacked = [jnp.stack(ls) for ls in zip(*flats)]
    return treedef0, stacked


def pipeline_logits(
    lm: Any,
    batch: Any,
    mesh: Mesh,
    n_microbatches: int,
    ctx: Optional[Any] = None,
) -> jax.Array:
    """Forward a CausalLM batch through a pp(-x dp) mesh pipeline.

    ``batch`` is the usual dict ({"input_ids", optional
    "attention_mask"}); the global batch size must divide
    n_microbatches (x dp when the mesh has a dp axis)."""
    if PP_AXIS not in mesh.axis_names:
        raise ValueError(f"mesh has no '{PP_AXIS}' axis: {mesh.axis_names}")
    n_stages = mesh.shape[PP_AXIS]
    blocks = lm.model.layers
    n_layers = len(blocks)
    if n_layers % n_stages != 0:
        raise ValueError(
            f"{n_layers} layers do not divide into {n_stages} stages"
        )
    if isinstance(batch, dict):
        input_ids = batch["input_ids"]
        attn_mask = batch.get("attention_mask")
    else:
        input_ids, attn_mask = batch, None
    bsz = input_ids.shape[0]
    if bsz % n_microbatches != 0:
        raise ValueError(
            f"batch {bsz} does not divide into {n_microbatches} microbatches"
        )
    has_dp = DP_AXIS in mesh.axis_names
    if has_dp and (bsz // n_microbatches) % mesh.shape[DP_AXIS] != 0:
        raise ValueError(
            f"microbatch size {bsz // n_microbatches} does not divide over "
            f"dp={mesh.shape[DP_AXIS]}"
        )

    treedef, stacked = stack_block_params(blocks)
    # global layer ids ride along the stack so per-layer RNG streams
    # (dropout in LoRA/blocks) stay distinct across layers even though
    # every layer shares one treedef: the scan body folds the id into
    # ctx.key.  Sharded like the stack, so each stage carries its own
    # GLOBAL indices.
    stacked = stacked + [jnp.arange(n_layers, dtype=jnp.uint32)]
    stacked = [
        jax.device_put(w, NamedSharding(mesh, P(PP_AXIS)))
        for w in stacked
    ]

    # pre-layer stage (replicated — cheap) via the model's own method
    x, positions = lm.model.embed_inputs(input_ids, ctx)

    def to_mb(a):
        return a.reshape((n_microbatches, bsz // n_microbatches) + a.shape[1:])

    x_mb, pos_mb = to_mb(x), to_mb(positions)
    mask_mb = None if attn_mask is None else to_mb(attn_mask)

    mb_batch_spec = P(None, DP_AXIS) if has_dp else P(None)
    n_micro = n_microbatches
    n_ticks = n_micro + n_stages - 1

    def run(stacked_local, x_mb, pos_mb, mask_mb):
        stage = jax.lax.axis_index(PP_AXIS)
        is_first = stage == 0
        is_last = stage == n_stages - 1

        use_remat = bool(getattr(lm.model, "remat", False)) and not (
            ctx is not None and getattr(ctx, "no_remat", False)
        )

        def apply_stage(h, pos, mask):
            def blk_apply(blk, layer_id, carry):
                if ctx is not None and ctx.key is not None:
                    layer_ctx = type(ctx)(
                        key=jax.random.fold_in(ctx.key, layer_id),
                        train=ctx.train,
                        no_remat=ctx.no_remat,
                    )
                    layer_ctx.sink = ctx.sink
                else:
                    layer_ctx = ctx
                return blk(carry, layer_ctx, positions=pos, attn_mask=mask)

            def body(carry, xs):
                *leaves, layer_id = xs
                blk = jax.tree_util.tree_unflatten(treedef, leaves)
                if use_remat:
                    # same semantics as Decoder.__call__'s remat: the
                    # block pytree crosses the checkpoint boundary so its
                    # params are differentiable residuals
                    return jax.checkpoint(blk_apply)(blk, layer_id, carry), None
                return blk_apply(blk, layer_id, carry), None

            h, _ = jax.lax.scan(body, h, stacked_local)
            return h

        outs0 = jnp.zeros_like(x_mb)
        carry0 = (
            jnp.zeros_like(x_mb[0]),
            jnp.zeros_like(pos_mb[0]),
            None if mask_mb is None else jnp.zeros_like(mask_mb[0]),
            outs0,
        )
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def tick(carry, t):
            recv_x, recv_pos, recv_mask, outs = carry
            feed = jnp.clip(t, 0, n_micro - 1)
            inp = jnp.where(is_first, x_mb[feed], recv_x)
            pos = jnp.where(is_first, pos_mb[feed], recv_pos)
            mask = (
                None
                if mask_mb is None
                else jnp.where(is_first, mask_mb[feed], recv_mask)
            )
            out = apply_stage(inp, pos, mask)
            # the LAST stage collects finished microbatch t-(S-1)
            oidx = t - (n_stages - 1)
            safe = jnp.clip(oidx, 0, n_micro - 1)
            outs = jnp.where(
                jnp.logical_and(is_last, oidx >= 0),
                outs.at[safe].set(out),
                outs,
            )
            nxt_x = jax.lax.ppermute(out, PP_AXIS, perm)
            nxt_pos = jax.lax.ppermute(pos, PP_AXIS, perm)
            nxt_mask = (
                None if mask is None else jax.lax.ppermute(mask, PP_AXIS, perm)
            )
            return (nxt_x, nxt_pos, nxt_mask, outs), None

        (_, _, _, outs), _ = jax.lax.scan(
            tick, carry0, jnp.arange(n_ticks)
        )
        # only the last stage's buffer is meaningful; expose a leading pp
        # axis and let the caller slice it
        return outs[None]

    if mask_mb is None:
        # bind the absent mask OUTSIDE shard_map so the specs tree has no
        # None entry to puzzle over
        body = lambda w, x, p: run(w, x, p, None)  # noqa: E731
        in_specs = (P(PP_AXIS), mb_batch_spec, mb_batch_spec)
        args = (stacked, x_mb, pos_mb)
    else:
        body = run
        in_specs = (
            P(PP_AXIS),
            mb_batch_spec,
            mb_batch_spec,
            mb_batch_spec,
        )
        args = (stacked, x_mb, pos_mb, mask_mb)

    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=P(PP_AXIS, None, DP_AXIS) if has_dp else P(PP_AXIS),
        check_vma=False,
    )
    res = mapped(*args)  # (S, n_micro, mb, s, d)
    h = res[-1].reshape(x.shape)
    h = lm.model.norm(h)
    return lm.head(h, ctx)
