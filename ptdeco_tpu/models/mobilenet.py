"""MobileNetV2, TPU-native (NHWC).

Reference consumption analogue: any timm/HF mobilenet checkpoint through
the reference's generic builders (trainer_vision/builder.py:134-144).
Mirrors HF ``MobileNetV2ForImageClassification`` semantics exactly:

* TF-style "SAME" padding (config.tf_padding — jax's ``padding="SAME"``
  IS the TF rule, including the asymmetric odd-pad placement HF
  reproduces with F.pad);
* inverted residual blocks: expand 1x1 + BN + relu6, depthwise 3x3
  (stride 1|2) + BN + relu6, project 1x1 + BN (linear), residual iff
  stride 1 and in == out channels;
* the channel schedule [16, 24, ..., 320] scaled by depth_multiplier
  through make_divisible (divisor depth_divisible_by, floor min_depth);
* stem: full 3x3 s2 conv to make_divisible(32*mult) channels, then a
  depthwise+project pair (first_layer_is_expansion=True has no expand);
* head: 1x1 conv to 1280 (kept unscaled when finegrained_output and
  multiplier < 1), global average pool, Linear classifier.

Every 1x1 conv is an ``nn.Conv2d`` site the decomposition engines
already handle (conv1x1 factor pairs), so mobilenet compresses the same
way the reference's timm models do."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import nn

_CHANNELS = (16, 24, 24, 32, 32, 32, 64, 64, 64, 64, 96, 96, 96, 160, 160, 160, 320)
_STRIDES = (2, 1, 2, 1, 1, 2, 1, 1, 1, 1, 1, 1, 2, 1, 1, 1)


def make_divisible(value: int, divisor: int = 8, min_value: Optional[int] = None) -> int:
    """The TF-slim channel rounding rule (HF make_divisible verbatim)."""
    if min_value is None:
        min_value = divisor
    new_value = max(min_value, int(value + divisor / 2) // divisor * divisor)
    if new_value < 0.9 * value:
        new_value += divisor
    return int(new_value)


class ConvBNAct(nn.Module):
    """conv (no bias) + BN + optional relu6 (HF MobileNetV2ConvLayer)."""

    conv: nn.Conv2d
    bn: nn.BatchNorm2d
    act: bool = nn.static_field(default=True)

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        x = self.bn(self.conv(x, ctx), ctx)
        if self.act:
            x = jnp.clip(x, 0.0, 6.0)  # relu6
        return x

    @staticmethod
    def create(key, cin, cout, k, stride=1, groups=1, act=True, eps=1e-3,
               dtype=jnp.float32) -> "ConvBNAct":
        return ConvBNAct(
            conv=nn.Conv2d.create(
                key, cin, cout, (k, k), stride=stride, padding="same",
                groups=groups, use_bias=False, dtype=dtype,
            ),
            bn=nn.BatchNorm2d.create(cout, eps=eps),
            act=act,
        )


class InvertedResidual(nn.Module):
    expand_1x1: ConvBNAct
    conv_3x3: ConvBNAct
    reduce_1x1: ConvBNAct
    use_residual: bool = nn.static_field(default=False)

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        h = self.reduce_1x1(
            self.conv_3x3(self.expand_1x1(x, ctx), ctx), ctx
        )
        return x + h if self.use_residual else h


class Stem(nn.Module):
    first_conv: ConvBNAct
    conv_3x3: ConvBNAct
    reduce_1x1: ConvBNAct
    expand_1x1: Optional[ConvBNAct] = None

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        x = self.first_conv(x, ctx)
        if self.expand_1x1 is not None:
            x = self.expand_1x1(x, ctx)
        return self.reduce_1x1(self.conv_3x3(x, ctx), ctx)


class MobileNetV2(nn.Module):
    """NHWC MobileNetV2 classifier; input (b, h, w, 3), output logits."""

    conv_stem: Stem
    layer: tuple
    conv_1x1: ConvBNAct
    classifier: nn.Linear

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        x = self.conv_stem(x, ctx)
        for blk in self.layer:
            x = blk(x, ctx)
        x = self.conv_1x1(x, ctx)
        x = jnp.mean(x, axis=(1, 2))
        return self.classifier(x, ctx)

    @staticmethod
    def create(
        key: jax.Array,
        num_classes: int = 1000,
        depth_multiplier: float = 1.0,
        depth_divisible_by: int = 8,
        min_depth: int = 8,
        expand_ratio: float = 6.0,
        first_layer_is_expansion: bool = True,
        finegrained_output: bool = True,
        bn_eps: float = 1e-3,
        dtype: Any = jnp.float32,
    ) -> "MobileNetV2":
        def depth(ch: int) -> int:
            return make_divisible(
                int(round(ch * depth_multiplier)), depth_divisible_by,
                min_depth,
            )

        channels = [depth(c) for c in _CHANNELS]
        keys = jax.random.split(key, 64)
        ki = iter(range(64))
        stem_exp = depth(32)
        conv_stem = Stem(
            first_conv=ConvBNAct.create(
                keys[next(ki)], 3, stem_exp, 3, stride=2, eps=bn_eps,
                dtype=dtype,
            ),
            expand_1x1=(
                None
                if first_layer_is_expansion
                else ConvBNAct.create(
                    keys[next(ki)], stem_exp, stem_exp, 1, eps=bn_eps,
                    dtype=dtype,
                )
            ),
            conv_3x3=ConvBNAct.create(
                keys[next(ki)], stem_exp, stem_exp, 3, groups=stem_exp,
                eps=bn_eps, dtype=dtype,
            ),
            reduce_1x1=ConvBNAct.create(
                keys[next(ki)], stem_exp, channels[0], 1, act=False,
                eps=bn_eps, dtype=dtype,
            ),
        )
        blocks = []
        for i in range(16):
            cin, cout, stride = channels[i], channels[i + 1], _STRIDES[i]
            exp = make_divisible(
                int(round(cin * expand_ratio)), depth_divisible_by,
                min_depth,
            )
            blocks.append(
                InvertedResidual(
                    expand_1x1=ConvBNAct.create(
                        keys[next(ki)], cin, exp, 1, eps=bn_eps, dtype=dtype
                    ),
                    conv_3x3=ConvBNAct.create(
                        keys[next(ki)], exp, exp, 3, stride=stride,
                        groups=exp, eps=bn_eps, dtype=dtype,
                    ),
                    reduce_1x1=ConvBNAct.create(
                        keys[next(ki)], exp, cout, 1, act=False, eps=bn_eps,
                        dtype=dtype,
                    ),
                    use_residual=stride == 1 and cin == cout,
                )
            )
        out_ch = (
            1280
            if finegrained_output and depth_multiplier < 1.0
            else depth(1280)
        )
        return MobileNetV2(
            conv_stem=conv_stem,
            layer=tuple(blocks),
            conv_1x1=ConvBNAct.create(
                keys[next(ki)], channels[-1], out_ch, 1, eps=bn_eps,
                dtype=dtype,
            ),
            classifier=nn.Linear.create(
                keys[next(ki)], out_ch, num_classes, True, dtype
            ),
        )


def translate_hf_mobilenet_v2_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF MobileNetV2ForImageClassification -> native torch-layout keys
    (the statedict exporters handle OIHW->HWIO): strip the
    ``mobilenet_v2.`` prefix and rename convolution/normalization onto
    the conv/bn fields."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        if k.startswith("mobilenet_v2."):
            k = k[len("mobilenet_v2."):]
        k = k.replace(".convolution.", ".conv.")
        k = k.replace(".normalization.", ".bn.")
        out[k] = v
    return out


def mobilenet_v2_tiny(key, num_classes=10):
    """Test-scale zoo entry (depth multiplier 0.25)."""
    return MobileNetV2.create(
        key, num_classes=num_classes, depth_multiplier=0.25
    )


_V1_STRIDES = (1, 2, 1, 2, 1, 2, 1, 1, 1, 1, 1, 2, 1)


class MobileNetV1(nn.Module):
    """NHWC MobileNetV1 (HF ``MobileNetV1ForImageClassification``): stem
    3x3 s2 conv + 13 depthwise-separable pairs (dw 3x3 + BN + relu6,
    pw 1x1 + BN + relu6), channel depth doubling at every stride-2 (and
    the first) block via max(int(depth*multiplier), min_depth), global
    avg pool + Linear.  TF-SAME padding (jax "same" IS the TF rule).
    Every pointwise 1x1 conv is a decomposable ``nn.Conv2d`` site."""

    conv_stem: ConvBNAct
    layer: tuple
    classifier: nn.Linear

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        x = self.conv_stem(x, ctx)
        for blk in self.layer:
            x = blk(x, ctx)
        return self.classifier(jnp.mean(x, axis=(1, 2)), ctx)

    @staticmethod
    def create(
        key: jax.Array,
        num_classes: int = 1000,
        depth_multiplier: float = 1.0,
        min_depth: int = 8,
        bn_eps: float = 1e-3,
        dtype: Any = jnp.float32,
    ) -> "MobileNetV1":
        keys = jax.random.split(key, 32)
        ki = iter(range(32))
        depth = 32
        out_ch = max(int(depth * depth_multiplier), min_depth)
        conv_stem = ConvBNAct.create(
            keys[next(ki)], 3, out_ch, 3, stride=2, eps=bn_eps, dtype=dtype
        )
        layers = []
        for i in range(13):
            cin = out_ch
            if _V1_STRIDES[i] == 2 or i == 0:
                depth *= 2
                out_ch = max(int(depth * depth_multiplier), min_depth)
            layers.append(
                ConvBNAct.create(
                    keys[next(ki)], cin, cin, 3, stride=_V1_STRIDES[i],
                    groups=cin, eps=bn_eps, dtype=dtype,
                )
            )
            layers.append(
                ConvBNAct.create(
                    keys[next(ki)], cin, out_ch, 1, eps=bn_eps, dtype=dtype
                )
            )
        return MobileNetV1(
            conv_stem=conv_stem,
            layer=tuple(layers),
            classifier=nn.Linear.create(
                keys[next(ki)], out_ch, num_classes, True, dtype
            ),
        )


def translate_hf_mobilenet_v1_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF MobileNetV1ForImageClassification -> native keys: strip the
    ``mobilenet_v1.`` prefix, convolution/normalization -> conv/bn."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        if k.startswith("mobilenet_v1."):
            k = k[len("mobilenet_v1."):]
        k = k.replace(".convolution.", ".conv.")
        k = k.replace(".normalization.", ".bn.")
        out[k] = v
    return out
