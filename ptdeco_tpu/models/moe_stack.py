"""Expert-parallel serving form for MoE layers.

``stack_moe_experts`` swaps every eligible ``MoEMLP`` (tuple-of-expert
form — each expert an addressable dwain site) for a ``StackedMoEMLP``
whose three projections live as single ``(E, ...)`` tensors.  That single
leading expert axis is what makes true **expert parallelism** expressible
in GSPMD: `parallel.shardings` assigns it ``PartitionSpec("ep", ...)`` so
each device *stores and computes* only ``E/ep`` experts — the memory
locality the tuple form cannot express (a pytree leaf cannot live on a
mesh subset).  ``unstack_moe_experts`` restores the tuple form
bit-identically (stack before multi-chip serving/finetune forwards,
unstack before saving or decomposing — the stacked form has no per-expert
dwain sites, mirroring the fuse/unfuse convention of nn/fuse.py).

Dispatch economics (why this is opt-in rather than the default):

* The stacked forward is the zero-masked **dense** computation in stacked
  einsum form — FLOPs ∝ ``n_experts / ep`` per device.  On a single chip
  the tuple form's grouped path (``lax.ragged_dot`` / megablox gmm,
  FLOPs ∝ ``top_k``) wins, so stacking only pays on a mesh with
  ``ep ≥ n_experts / top_k`` — or whenever the experts simply do not fit
  one chip's HBM, which is the regime expert parallelism exists for
  (mixtral-8x7B expert weights are ~85% of all parameters).
* A grouped kernel is a poor fit for this role: its expert-span layout
  (sort-by-expert + group_sizes) is data-dependent, so an ep shard must
  run the FULL padded row grid and mask foreign tiles — wasted MXU work
  that the dense einsum contraction over ``e`` avoids (XLA places one
  psum over ``ep`` and computes only local experts).  The int8 grouped
  kernel (ops/gmm_int8.py) nevertheless IS ep/tp-partitionable via
  custom_partitioning for the decode regime, where the masked tiles are
  few and the kernel's int8 weight streaming — E/ep per device — is
  the bound that matters.

The reference has no analogue (single-GPU, no MoE; SURVEY.md §2.7 names
the parallel layer as TPU-new capability).
"""

from __future__ import annotations

import logging
import types
from typing import Any, Optional

import jax
import jax.numpy as jnp

from .. import nn
from .transformer import MLP, MoEMLP, _moe_routing

__all__ = ["StackedMoEMLP", "stack_moe_experts", "unstack_moe_experts"]

logger = logging.getLogger(__name__)

# acts whose gate/up combine is act(g) * u with a unary act implemented by
# MLP._apply_act; gptoss_glu couples g and u and is special-cased
_STACKABLE_ACTS = (
    "silu",
    "gelu_tanh",
    "gelu_exact",
    "relu",
    "relu2",
    "quick_gelu",
    "gptoss_glu",
)


class StackedMoEMLP(nn.Module):
    """MoE layer over stacked expert tensors ``(E, d, h)`` / ``(E, h, d)``.

    Routing fields mirror ``MoEMLP`` exactly (the routing math is the
    shared ``_moe_routing``); only the expert application differs: every
    expert runs on the full token batch as one stacked einsum and the
    combine weights (zero where a token is not routed) contract the
    expert axis — numerically the tuple form's zero-masked dense path
    (expert projections are bias-uniform, and a zero combine weight kills
    any bias contribution), pinned equal by tests/test_moe_stack.py.

    Memory note: the hidden intermediate is ``(E/ep, B, S, h)`` per
    device — size calibration/finetune batches accordingly.
    """

    gate: nn.Linear  # router: dim -> n_experts
    w_gate: jax.Array  # (E, dim, hidden)
    w_up: jax.Array  # (E, dim, hidden)
    w_down: jax.Array  # (E, hidden, dim)
    b_gate: Optional[jax.Array]  # (E, hidden) or None
    b_up: Optional[jax.Array]
    b_down: Optional[jax.Array]  # (E, dim) or None
    # weight-only int8 (ptdeco_tpu.quant): when set, the matching w_* is
    # int8 and dequantizes per expert x output channel at use — the
    # convert+multiply fuses into the einsum operand read
    scale_gate: Optional[jax.Array] = None  # (E, hidden) f32
    scale_up: Optional[jax.Array] = None  # (E, hidden) f32
    scale_down: Optional[jax.Array] = None  # (E, dim) f32
    shared_expert: Optional[MLP] = None
    shared_expert_gate: Optional[nn.Linear] = None
    gate_correction_bias: Optional[jax.Array] = None
    output_bias: Optional[jax.Array] = None
    top_k: int = nn.static_field(default=2)
    norm_topk: bool = nn.static_field(default=True)
    score_func: str = nn.static_field(default="softmax")
    n_group: int = nn.static_field(default=0)
    topk_group: int = nn.static_field(default=0)
    group_top2_sum: bool = nn.static_field(default=False)
    routed_scaling: float = nn.static_field(default=1.0)
    softmax_after_topk: bool = nn.static_field(default=False)
    norm_min: float = nn.static_field(default=0.0)
    sparsemixer: bool = nn.static_field(default=False)
    jitter_eps: float = nn.static_field(default=0.01)
    topk_then_sigmoid: bool = nn.static_field(default=False)
    scale_expert_input: bool = nn.static_field(default=False)
    act: str = nn.static_field(default="silu")
    clamp_limit: float = nn.static_field(default=7.0)
    precision: Any = nn.static_field(default=None)

    @property
    def n_experts(self) -> int:
        return self.w_gate.shape[0]

    def _combine(self, g: jax.Array, u: jax.Array) -> jax.Array:
        if self.act == "gptoss_glu":
            lim = self.clamp_limit
            gc = jnp.minimum(g, lim)
            return (jnp.clip(u, -lim, lim) + 1.0) * (
                gc * jax.nn.sigmoid(1.702 * gc)
            )
        # reuse MLP's unary-act table on a lightweight attribute carrier
        carrier = types.SimpleNamespace(
            act=self.act, act_alpha_p=None, act_alpha_n=None
        )
        return MLP._apply_act(carrier, g) * u

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        top_vals, top_idx = _moe_routing(self, self.n_experts, x, ctx)
        onehot = jax.nn.one_hot(top_idx, self.n_experts, dtype=jnp.float32)
        w = jnp.einsum("...ke,...k->...e", onehot, top_vals).astype(x.dtype)
        dot = lambda *a: jnp.einsum(*a, precision=self.precision)  # noqa: E731
        w_gate, w_up, w_down = self.w_gate, self.w_up, self.w_down
        if self.scale_gate is not None:  # int8 serving form
            w_gate = w_gate.astype(x.dtype) * self.scale_gate.astype(
                x.dtype
            )[:, None, :]
        if self.scale_up is not None:
            w_up = w_up.astype(x.dtype) * self.scale_up.astype(x.dtype)[
                :, None, :
            ]
        if self.scale_down is not None:
            w_down = w_down.astype(x.dtype) * self.scale_down.astype(
                x.dtype
            )[:, None, :]
        if self.scale_expert_input:  # llama4: weight scales expert INPUT
            xin = x[None, ...] * jnp.moveaxis(w, -1, 0)[..., None]
            g = dot("ebsd,edh->ebsh", xin, w_gate)
            u = dot("ebsd,edh->ebsh", xin, w_up)
        else:
            g = dot("bsd,edh->ebsh", x, w_gate)
            u = dot("bsd,edh->ebsh", x, w_up)
        if self.b_gate is not None:
            g = g + self.b_gate[:, None, None, :]
        if self.b_up is not None:
            u = u + self.b_up[:, None, None, :]
        h = self._combine(g, u)
        y = dot("ebsh,ehd->ebsd", h, w_down)
        if self.b_down is not None:
            y = y + self.b_down[:, None, None, :]
        if self.scale_expert_input:
            out = jnp.sum(y, axis=0)
        else:
            # contraction over the (ep-sharded) expert axis — the one
            # collective GSPMD inserts for the whole layer
            out = dot("ebsd,bse->bsd", y, w)
        if self.shared_expert is not None:
            shared = self.shared_expert(x, ctx)
            if self.shared_expert_gate is not None:  # qwen2_moe
                sgate = jax.nn.sigmoid(
                    self.shared_expert_gate(x, ctx).astype(jnp.float32)
                ).astype(x.dtype)
                shared = shared * sgate
            out = out + shared
        if self.output_bias is not None:  # jetmoe
            out = out + self.output_bias.astype(out.dtype)
        return out


def _stackable(m: MoEMLP) -> Optional[str]:
    """None if ``m`` can be stacked; otherwise the human reason."""
    if m.n_zero_experts:
        return "zero experts (longcat) have no weight tensor to stack"
    if not m._experts_are_pristine():
        return (
            "experts carry non-Linear projections (taps / factor pairs / "
            "LoRA / int8) — unstackable; decompose or merge first "
            "(quantize AFTER stacking: quantize_for_serving handles "
            "StackedMoEMLP in place)"
        )
    e0 = m.experts[0]
    if any(e.act != e0.act or e.clamp_limit != e0.clamp_limit
           for e in m.experts):
        return "experts disagree on activation statics"
    if e0.act not in _STACKABLE_ACTS:
        return f"activation {e0.act!r} not stackable (learned act params)"
    precisions = {
        p.precision
        for e in m.experts
        for p in (e.gate_proj, e.up_proj, e.down_proj)
    }
    if len(precisions) > 1:
        return "experts disagree on matmul precision"
    return None


def _stack_bias(projs: list) -> Optional[jax.Array]:
    if projs[0].bias is None:
        return None
    return jnp.stack([p.bias for p in projs])


def stack_moe_experts(root: nn.Module) -> nn.Module:
    """Replace every eligible ``MoEMLP`` with its stacked form (pure).

    Ineligible layers (decomposed/tapped/LoRA experts, zero experts,
    non-uniform statics) are left in tuple form with a log line — mixed
    models still work, they just don't ep-shard those layers.
    """
    for name, m in list(nn.named_modules(root)):
        if type(m) is not MoEMLP:
            continue
        reason = _stackable(m)
        if reason is not None:
            logger.info("not stacking %s: %s", name or "<root>", reason)
            continue
        e0 = m.experts[0]
        stacked = StackedMoEMLP(
            gate=m.gate,
            w_gate=jnp.stack([e.gate_proj.kernel for e in m.experts]),
            w_up=jnp.stack([e.up_proj.kernel for e in m.experts]),
            w_down=jnp.stack([e.down_proj.kernel for e in m.experts]),
            b_gate=_stack_bias([e.gate_proj for e in m.experts]),
            b_up=_stack_bias([e.up_proj for e in m.experts]),
            b_down=_stack_bias([e.down_proj for e in m.experts]),
            shared_expert=m.shared_expert,
            shared_expert_gate=m.shared_expert_gate,
            gate_correction_bias=m.gate_correction_bias,
            output_bias=m.output_bias,
            top_k=m.top_k,
            norm_topk=m.norm_topk,
            score_func=m.score_func,
            n_group=m.n_group,
            topk_group=m.topk_group,
            group_top2_sum=m.group_top2_sum,
            routed_scaling=m.routed_scaling,
            softmax_after_topk=m.softmax_after_topk,
            norm_min=m.norm_min,
            sparsemixer=m.sparsemixer,
            jitter_eps=m.jitter_eps,
            topk_then_sigmoid=m.topk_then_sigmoid,
            scale_expert_input=m.scale_expert_input,
            act=e0.act,
            clamp_limit=e0.clamp_limit,
            precision=e0.up_proj.precision,
        )
        root = nn.replace_submodule(root, name, stacked) if name else stacked
    return root


def unstack_moe_experts(root: nn.Module) -> nn.Module:
    """Restore the tuple-of-expert (checkpoint/decompose) form (pure)."""
    for name, m in list(nn.named_modules(root)):
        if type(m) is not StackedMoEMLP:
            continue
        if (
            m.scale_gate is not None
            or m.scale_up is not None
            or m.scale_down is not None
        ):
            raise ValueError(
                f"{name or '<root>'} holds int8 expert tensors; run "
                "quant.dequantize_for_serving before unstack_moe_experts "
                "(unstacking int8 would silently drop the scales)"
            )

        def lin(kernel, bias):
            return nn.Linear(kernel=kernel, bias=bias, precision=m.precision)

        experts = tuple(
            MLP(
                gate_proj=lin(
                    m.w_gate[e],
                    None if m.b_gate is None else m.b_gate[e],
                ),
                up_proj=lin(
                    m.w_up[e], None if m.b_up is None else m.b_up[e]
                ),
                down_proj=lin(
                    m.w_down[e], None if m.b_down is None else m.b_down[e]
                ),
                act=m.act,
                clamp_limit=m.clamp_limit,
            )
            for e in range(m.n_experts)
        )
        moe = MoEMLP(
            gate=m.gate,
            experts=experts,
            shared_expert=m.shared_expert,
            shared_expert_gate=m.shared_expert_gate,
            gate_correction_bias=m.gate_correction_bias,
            output_bias=m.output_bias,
            top_k=m.top_k,
            norm_topk=m.norm_topk,
            score_func=m.score_func,
            n_group=m.n_group,
            topk_group=m.topk_group,
            group_top2_sum=m.group_top2_sum,
            routed_scaling=m.routed_scaling,
            softmax_after_topk=m.softmax_after_topk,
            norm_min=m.norm_min,
            sparsemixer=m.sparsemixer,
            jitter_eps=m.jitter_eps,
            topk_then_sigmoid=m.topk_then_sigmoid,
            scale_expert_input=m.scale_expert_input,
        )
        root = nn.replace_submodule(root, name, moe) if name else moe
    return root
