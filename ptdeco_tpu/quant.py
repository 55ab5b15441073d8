"""Weight-only int8 serving quantization.

Autoregressive decode at production shapes is bound by streaming weights
from HBM, not by MXU FLOPs — every decode step reads every parameter
once to produce one token per row.  Storing ``nn.Linear`` kernels as
int8 with a per-output-channel f32 scale halves the bytes per matmul vs
bf16 (quarters vs f32); XLA fuses the dequantization (convert + scale
multiply) into the matmul's operand read, so there is no materialized
full-precision copy.  This is a SERVING form, like
``nn.FusedLowRankLinear`` and ``models.StackedMoEMLP``: convert with
:func:`quantize_for_serving` after decomposition/finetuning, convert
back with :func:`dequantize_for_serving` before exporting checkpoints.

Composes with compression: factor-pair projections produced by
dwain/falor/lockd surgery are plain ``nn.Linear`` modules, so a
decomposed model quantizes site-for-site like a dense one — low-rank
(fewer weights) and int8 (fewer bytes per weight) multiply.

No reference analogue: the reference serves nothing and stores
f32/bf16 torch checkpoints only (its deployment story ends at lm_eval
loglikelihood scoring, examples/trainer_llm/metrics.py:81-107).
"""

from __future__ import annotations

import logging
from typing import Any, Collection, Optional

import jax
import jax.numpy as jnp

from . import nn

logger = logging.getLogger(__name__)

__all__ = [
    "QuantLinear",
    "QuantConv2d",
    "quantize_linear",
    "dequantize_linear",
    "quantize_conv2d",
    "dequantize_conv2d",
    "quantize_stacked_moe",
    "dequantize_stacked_moe",
    "quantize_for_serving",
    "dequantize_for_serving",
]


class QuantLinear(nn.Module):
    """``nn.Linear`` with the kernel held on a symmetric int8 grid.

    ``dequant(kernel) = w_q * scale`` per output channel; the matmul runs
    in the activation dtype (the convert+multiply fuses into the dot's
    operand read on TPU, so HBM traffic is the int8 bytes + one scale
    vector).  Behaves like ``nn.Linear`` everywhere a forward is needed
    (serving cache, MoE routing, factor pairs); it is NOT a training or
    checkpoint form — decomposition engines and TP sharding rules ignore
    it by design.
    """

    w_q: jax.Array  # (in_features, out_features) int8
    scale: jax.Array  # (out_features,) f32
    bias: Optional[jax.Array]  # (out_features,) or None
    precision: Any = nn.static_field(default=None)

    @property
    def in_features(self) -> int:
        return self.w_q.shape[0]

    @property
    def out_features(self) -> int:
        return self.w_q.shape[1]

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        w = self.w_q.astype(x.dtype) * self.scale.astype(x.dtype)[None, :]
        y = jnp.dot(x, w, precision=self.precision)
        if self.bias is not None:
            y = y + self.bias
        return y


class QuantConv2d(nn.Module):
    """``nn.Conv2d`` (NHWC/HWIO) with the kernel on a symmetric int8
    grid, per-output-channel scales — the vision-model analogue of
    :class:`QuantLinear` (convs at inference read their full kernel per
    call just like decode matmuls read their weights)."""

    w_q: jax.Array  # (kh, kw, in_ch // groups, out_ch) int8
    scale: jax.Array  # (out_ch,) f32
    bias: Optional[jax.Array]
    stride: tuple[int, int] = nn.static_field(default=(1, 1))
    padding: Any = nn.static_field(default=(0, 0))
    dilation: tuple[int, int] = nn.static_field(default=(1, 1))
    groups: int = nn.static_field(default=1)
    padding_mode: str = nn.static_field(default="zeros")
    precision: Any = nn.static_field(default=None)

    @property
    def in_channels(self) -> int:
        return self.w_q.shape[2] * self.groups

    @property
    def out_channels(self) -> int:
        return self.w_q.shape[3]

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        w = self.w_q.astype(x.dtype) * self.scale.astype(x.dtype)
        return nn.Conv2d(
            kernel=w,
            bias=self.bias,
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
            groups=self.groups,
            padding_mode=self.padding_mode,
            precision=self.precision,
        )(x, ctx)


def quantize_linear(lin: nn.Linear) -> QuantLinear:
    """Symmetric per-output-channel absmax quantization to int8.

    Each channel's scale is ``absmax / 127``, so its largest-magnitude
    weight lands exactly on ±127 — which makes the mapping IDEMPOTENT:
    quantizing a dequantized kernel reproduces ``(w_q, scale)`` exactly
    (pinned by test).  All-zero channels get scale 1.  Bias is kept in
    its original dtype (it is read once per matmul, not per weight).
    """
    w = lin.kernel.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    w_q = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    return QuantLinear(
        w_q=w_q, scale=scale, bias=lin.bias, precision=lin.precision
    )


def dequantize_linear(q: QuantLinear, dtype: Any = jnp.float32) -> nn.Linear:
    """Materialize the dequantized kernel as a plain ``nn.Linear``."""
    kernel = (q.w_q.astype(jnp.float32) * q.scale[None, :]).astype(dtype)
    return nn.Linear(kernel=kernel, bias=q.bias, precision=q.precision)


def quantize_conv2d(conv: nn.Conv2d) -> QuantConv2d:
    """Per-output-channel symmetric absmax int8, like
    :func:`quantize_linear` (idempotent on grid points)."""
    w = conv.kernel.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=(0, 1, 2))
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return QuantConv2d(
        w_q=w_q,
        scale=scale,
        bias=conv.bias,
        stride=conv.stride,
        padding=conv.padding,
        dilation=conv.dilation,
        groups=conv.groups,
        padding_mode=conv.padding_mode,
        precision=conv.precision,
    )


def dequantize_conv2d(q: QuantConv2d, dtype: Any = jnp.float32) -> nn.Conv2d:
    """Materialize the dequantized kernel as a plain ``nn.Conv2d``."""
    kernel = (q.w_q.astype(jnp.float32) * q.scale).astype(dtype)
    return nn.Conv2d(
        kernel=kernel,
        bias=q.bias,
        stride=q.stride,
        padding=q.padding,
        dilation=q.dilation,
        groups=q.groups,
        padding_mode=q.padding_mode,
        precision=q.precision,
    )


def _quantize_stacked_tensor(
    w: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """(E, in, out) float -> (int8 grid, (E, out) scales); same symmetric
    absmax/127 construction as :func:`quantize_linear`, per expert."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=1)  # (E, out)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    w_q = jnp.clip(
        jnp.round(wf / scale[:, None, :]), -127, 127
    ).astype(jnp.int8)
    return w_q, scale


def quantize_stacked_moe(m: Any) -> Any:
    """int8 form of ``models.StackedMoEMLP``: the three (E, ., .) expert
    tensors go to the int8 grid with (E, out) scales held in the module's
    own ``scale_*`` fields — the expert axis keeps ep-sharding and the
    per-expert layout keeps its TP sharding (scales follow the out dim).
    The router ``gate`` and shared expert are left untouched."""
    if (
        m.scale_gate is not None
        or m.scale_up is not None
        or m.scale_down is not None
    ):
        return m  # already (even partially) quantized
    wg, sg = _quantize_stacked_tensor(m.w_gate)
    wu, su = _quantize_stacked_tensor(m.w_up)
    wd, sd = _quantize_stacked_tensor(m.w_down)
    return m.replace(
        w_gate=wg, w_up=wu, w_down=wd,
        scale_gate=sg, scale_up=su, scale_down=sd,
    )


def dequantize_stacked_moe(m: Any, dtype: Any = jnp.float32) -> Any:
    """Materialize the dequantized expert tensors; drops the scales."""
    if m.scale_gate is None and m.scale_up is None and m.scale_down is None:
        return m

    def deq(w_q, scale):
        if scale is None:  # this tensor was never quantized
            return w_q
        return (w_q.astype(jnp.float32) * scale[:, None, :]).astype(dtype)

    return m.replace(
        w_gate=deq(m.w_gate, m.scale_gate),
        w_up=deq(m.w_up, m.scale_up),
        w_down=deq(m.w_down, m.scale_down),
        scale_gate=None, scale_up=None, scale_down=None,
    )


def _router_gate_names(root: nn.Module) -> set:
    """Dotted paths of MoE router gates (and shared-expert gates): tiny,
    routing-decision-critical matmuls that stay full precision — the
    standard weight-only-int8 practice."""
    from .models.moe_stack import StackedMoEMLP
    from .models.transformer import MoAttention, MoEMLP

    out = set()
    for name, m in nn.named_modules(root):
        if type(m) in (MoEMLP, StackedMoEMLP, MoAttention):
            out.add(f"{name}.gate" if name else "gate")
            if getattr(m, "shared_expert_gate", None) is not None:
                out.add(
                    f"{name}.shared_expert_gate"
                    if name
                    else "shared_expert_gate"
                )
    return out


def quantize_for_serving(
    root: nn.Module,
    *,
    skip_names: Collection[str] = (),
    min_features: int = 1,
) -> nn.Module:
    """Replace every plain ``nn.Linear`` / ``nn.Conv2d`` under ``root``
    with its int8 form, and stacked MoE expert tensors
    (``models.StackedMoEMLP``) with their in-place int8 grid (pure —
    returns a new pytree).

    Only EXACT types are touched: LoRA/tap wrappers, norms, embeddings,
    and already-quantized sites pass through (merge LoRA and drop taps
    before serving).  MoE router gates and shared-expert gates are
    auto-skipped (tiny, routing-decision-critical).  ``skip_names``
    excludes sites by their dotted path (e.g. a quality-sensitive
    lm_head); ``min_features`` skips matmuls too small to be
    weight-bound.
    """
    from .models.moe_stack import StackedMoEMLP

    skip = set(skip_names) | _router_gate_names(root)
    n = 0
    for name, m in list(nn.named_modules(root)):
        if name in skip:
            continue
        if type(m) is nn.Linear:
            if min(m.in_features, m.out_features) < min_features:
                continue
            q: nn.Module = quantize_linear(m)
        elif type(m) is nn.Conv2d:
            if min(m.in_channels, m.out_channels) < min_features:
                continue
            q = quantize_conv2d(m)
        elif type(m) is StackedMoEMLP and m.scale_gate is None:
            if min(m.w_gate.shape[1], m.w_gate.shape[2]) < min_features:
                continue
            q = quantize_stacked_moe(m)
        else:
            continue
        root = nn.replace_submodule(root, name, q) if name else q
        n += 1
    logger.info("quantized %d Linear/Conv2d/MoE sites to int8", n)
    return root


def dequantize_for_serving(
    root: nn.Module, dtype: Any = jnp.float32
) -> nn.Module:
    """Restore every :class:`QuantLinear` to a plain ``nn.Linear`` with
    the dequantized kernel in ``dtype`` (pure)."""
    from .models.moe_stack import StackedMoEMLP

    for name, m in list(nn.named_modules(root)):
        if type(m) is QuantLinear:
            lin: nn.Module = dequantize_linear(m, dtype)
        elif type(m) is QuantConv2d:
            lin = dequantize_conv2d(m, dtype)
        elif type(m) is StackedMoEMLP and (
            m.scale_gate is not None
            or m.scale_up is not None
            or m.scale_down is not None
        ):
            lin = dequantize_stacked_moe(m, dtype)
        else:
            continue
        root = nn.replace_submodule(root, name, lin) if name else lin
    return root
