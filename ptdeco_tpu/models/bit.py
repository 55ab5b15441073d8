"""BiT (Big Transfer, ResNet v2), TPU-native (NHWC).

Reference consumption analogue: any timm/HF BiT checkpoint through the
reference's generic builders (trainer_vision/builder.py:134-144).
Mirrors HF ``BitForImageClassification`` semantics exactly:

* weight-standardized convs — HF standardizes the raw weight per output
  channel at EVERY forward (biased variance, eps 1e-8,
  modeling_bit.WeightStandardizedConv2d).  Standardization is a pure
  function of the weight, so the translator folds it into the kernel at
  load time: plain ``nn.Conv2d`` at runtime (zero per-step cost on the
  MXU) and every 1x1 conv stays a decomposable site.  Fine-tuning then
  trains the folded weight directly instead of through the
  standardization reparametrization — same function class, different
  gradient preconditioning (documented deliberate divergence);
* GroupNorm(num_groups) + activation units, preactivation bottlenecks
  (norm1 feeds both the residual branch and the stage-entry downsample)
  or the non-preact v1b bottleneck (``layer_type="bottleneck"``, the
  ViT-hybrid backbone);
* TF-compatible padding: ``global_padding="SAME"`` uses the dynamic TF
  rule (static under jit — shapes are known at trace time), ``None``
  uses the symmetric torch rule ((stride-1) + (k-1))//2;
* the stem maxpool pads with ZEROS (HF's DynamicPad2d/ConstantPad2d
  default), not -inf — reproduced exactly;
* channel schedule: out = make_div(hidden_size * width_factor),
  mid = make_div(out / 4).

``output_stride`` != 32 (dilated stages) is refused loudly.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import nn


def make_div(value: float, divisor: int = 8) -> int:
    """HF modeling_bit.make_div verbatim."""
    min_value = divisor
    new_value = max(min_value, int(value + divisor / 2) // divisor * divisor)
    if new_value < 0.9 * value:
        new_value += divisor
    return int(new_value)


def _same_pad_amounts(size: int, k: int, s: int) -> tuple[int, int]:
    """TF-SAME: total = max((ceil(size/s)-1)*s + k - size, 0), split
    low = total//2 (HF DynamicPad2d)."""
    total = max((math.ceil(size / s) - 1) * s + k - size, 0)
    return total // 2, total - total // 2


def _maxpool_3x3_s2(x: jax.Array, same: bool) -> jax.Array:
    """3x3/2 max pool over NHWC, padding with ZEROS like HF's
    BitMaxPool2d (padding_value=0), either TF-SAME amounts (same=True)
    or the caller pre-pads and we window VALID."""
    if same:
        ph = _same_pad_amounts(x.shape[1], 3, 2)
        pw = _same_pad_amounts(x.shape[2], 3, 2)
        x = jnp.pad(x, ((0, 0), ph, pw, (0, 0)))
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )


class GroupNormAct(nn.Module):
    """GroupNorm over NHWC channels + optional relu (HF
    BitGroupNormActivation; eps 1e-5, affine)."""

    weight: jax.Array
    bias: jax.Array
    num_groups: int = nn.static_field(default=32)
    act: bool = nn.static_field(default=True)
    eps: float = nn.static_field(default=1e-5)

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        b, h, w, c = x.shape
        g = self.num_groups
        xg = x.reshape(b, h, w, g, c // g).astype(jnp.float32)
        mean = xg.mean(axis=(1, 2, 4), keepdims=True)
        var = xg.var(axis=(1, 2, 4), keepdims=True)
        xg = (xg - mean) * jax.lax.rsqrt(var + self.eps)
        y = xg.reshape(b, h, w, c).astype(x.dtype) * self.weight + self.bias
        if self.act:
            y = jax.nn.relu(y)
        return y

    @staticmethod
    def create(ch: int, num_groups: int, act: bool = True,
               dtype=jnp.float32) -> "GroupNormAct":
        return GroupNormAct(
            weight=jnp.ones((ch,), dtype),
            bias=jnp.zeros((ch,), dtype),
            num_groups=num_groups,
            act=act,
        )


def _conv(key, cin, cout, k, stride, global_padding, dtype) -> nn.Conv2d:
    if global_padding is not None and global_padding.upper() == "SAME":
        pad: Any = "same"
    else:  # torch symmetric rule
        pad = ((stride - 1) + (k - 1)) // 2
    return nn.Conv2d.create(
        key, cin, cout, (k, k), stride=stride, padding=pad, use_bias=False,
        dtype=dtype,
    )


class Downsample(nn.Module):
    """1x1 shortcut conv; carries a (non-activated) GN in the
    non-preactivation layer type."""

    conv: nn.Conv2d
    norm: Optional[GroupNormAct] = None

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        y = self.conv(x, ctx)
        return y if self.norm is None else self.norm(y, ctx)


class PreactBottleneck(nn.Module):
    """BitPreActivationBottleneckLayer: norm1 output feeds BOTH the
    residual branch and (on stage entry) the downsample shortcut."""

    norm1: GroupNormAct
    conv1: nn.Conv2d
    norm2: GroupNormAct
    conv2: nn.Conv2d
    norm3: GroupNormAct
    conv3: nn.Conv2d
    downsample: Optional[Downsample] = None

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        pre = self.norm1(x, ctx)
        shortcut = x if self.downsample is None else self.downsample(pre, ctx)
        h = self.conv1(pre, ctx)
        h = self.conv2(self.norm2(h, ctx), ctx)
        h = self.conv3(self.norm3(h, ctx), ctx)
        return h + shortcut


class BottleneckV1(nn.Module):
    """BitBottleneckLayer (v1b, ViT-hybrid backbone): conv-norm x3 with
    the last norm unactivated, relu after the residual add."""

    conv1: nn.Conv2d
    norm1: GroupNormAct
    conv2: nn.Conv2d
    norm2: GroupNormAct
    conv3: nn.Conv2d
    norm3: GroupNormAct
    downsample: Optional[Downsample] = None

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        shortcut = x if self.downsample is None else self.downsample(x, ctx)
        h = self.norm1(self.conv1(x, ctx), ctx)
        h = self.norm2(self.conv2(h, ctx), ctx)
        h = self.norm3(self.conv3(h, ctx), ctx)
        return jax.nn.relu(h + shortcut)


class Stage(nn.Module):
    layers: tuple

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        for layer in self.layers:
            x = layer(x, ctx)
        return x


class Embedder(nn.Module):
    """Stem: WS conv 7x7/2 (+ GN-act for the non-preact type) + zero-pad
    + 3x3/2 zero-padded max pool."""

    convolution: nn.Conv2d
    norm: Optional[GroupNormAct] = None
    same_padding: bool = nn.static_field(default=True)
    dynamic_pool_pad: bool = nn.static_field(default=True)

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        x = self.convolution(x, ctx)
        if not self.same_padding:
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        if self.norm is not None:
            x = self.norm(x, ctx)
        return _maxpool_3x3_s2(x, same=self.dynamic_pool_pad)


class BiT(nn.Module):
    """NHWC BiT classifier; input (b, h, w, 3), output logits."""

    embedder: Embedder
    stages: tuple
    classifier: nn.Linear
    norm: Optional[GroupNormAct] = None  # preactivation only

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        x = self.embedder(x, ctx)
        for stage in self.stages:
            x = stage(x, ctx)
        if self.norm is not None:
            x = self.norm(x, ctx)
        return self.classifier(jnp.mean(x, axis=(1, 2)), ctx)

    @staticmethod
    def create(
        key: jax.Array,
        num_classes: int = 1000,
        embedding_size: int = 64,
        hidden_sizes: tuple = (256, 512, 1024, 2048),
        depths: tuple = (3, 4, 6, 3),
        layer_type: str = "preactivation",
        width_factor: int = 1,
        num_groups: int = 32,
        global_padding: Optional[str] = None,
        embedding_dynamic_padding: bool = False,
        dtype: Any = jnp.float32,
    ) -> "BiT":
        if layer_type not in ("preactivation", "bottleneck"):
            raise ValueError(f"layer_type={layer_type!r}")
        preact = layer_type == "preactivation"
        same = global_padding is not None and global_padding.upper() == "SAME"
        keys = iter(jax.random.split(key, 4 + 4 * sum(depths) + 4))

        def gn(ch: int, act: bool = True) -> GroupNormAct:
            return GroupNormAct.create(ch, num_groups, act=act, dtype=dtype)

        embedder = Embedder(
            convolution=_conv(next(keys), 3, embedding_size, 7, 2,
                              global_padding, dtype),
            norm=None if preact else gn(embedding_size),
            same_padding=same,
            dynamic_pool_pad=embedding_dynamic_padding,
        )
        stages = []
        prev = embedding_size
        for si, (depth, hidden) in enumerate(zip(depths, hidden_sizes)):
            out = make_div(hidden * width_factor)
            mid = make_div(out * 0.25)
            layers = []
            for li in range(depth):
                stride = 2 if (si > 0 and li == 0) else 1
                down = None
                if li == 0:
                    down = Downsample(
                        conv=_conv(next(keys), prev, out, 1, stride,
                                   global_padding, dtype),
                        norm=None if preact else gn(out, act=False),
                    )
                if preact:
                    layers.append(PreactBottleneck(
                        norm1=gn(prev),
                        conv1=_conv(next(keys), prev, mid, 1, 1,
                                    global_padding, dtype),
                        norm2=gn(mid),
                        conv2=_conv(next(keys), mid, mid, 3, stride,
                                    global_padding, dtype),
                        norm3=gn(mid),
                        conv3=_conv(next(keys), mid, out, 1, 1,
                                    global_padding, dtype),
                        downsample=down,
                    ))
                else:
                    layers.append(BottleneckV1(
                        conv1=_conv(next(keys), prev, mid, 1, 1,
                                    global_padding, dtype),
                        norm1=gn(mid),
                        conv2=_conv(next(keys), mid, mid, 3, stride,
                                    global_padding, dtype),
                        norm2=gn(mid),
                        conv3=_conv(next(keys), mid, out, 1, 1,
                                    global_padding, dtype),
                        norm3=gn(out, act=False),
                        downsample=down,
                    ))
                prev = out
            stages.append(Stage(layers=tuple(layers)))
        return BiT(
            embedder=embedder,
            stages=tuple(stages),
            norm=gn(prev) if preact else None,
            classifier=nn.Linear.create(next(keys), prev, num_classes, True,
                                        dtype),
        )


def standardize_conv_weight(w: np.ndarray, eps: float = 1e-8) -> np.ndarray:
    """Fold HF's per-forward weight standardization into the kernel:
    (w - mean) / sqrt(var + eps) per OUTPUT channel over (in, kh, kw),
    biased variance (F.batch_norm training=True), eps 1e-8 — OIHW
    layout (torch checkpoint layout; the exporters transpose later)."""
    w64 = w.astype(np.float64).reshape(w.shape[0], -1)
    mean = w64.mean(axis=1, keepdims=True)
    var = w64.var(axis=1, keepdims=True)  # biased, matching batch_norm
    out = (w64 - mean) / np.sqrt(var + eps)
    return out.reshape(w.shape).astype(w.dtype)


def translate_hf_bit_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF BitForImageClassification -> native torch-layout keys.  Every
    conv kernel passes through :func:`standardize_conv_weight` (the
    runtime fold); ``classifier.1`` (Sequential[Flatten, Linear]) maps
    onto the plain Linear."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.startswith("bit."):
            k = k[len("bit."):]
        k = k.replace(".layers.layers.", ".layers.")
        if k.startswith("encoder.stages."):
            k = k[len("encoder."):]
        if k.startswith("classifier.1."):
            k = "classifier." + k[len("classifier.1."):]
        if k.endswith(".weight") and v.ndim == 4:
            v = standardize_conv_weight(v)
        out[k] = v
    return out
