"""EfficientNet (B0-B7 family), TPU-native NHWC.

Reference consumption analogue: timm/HF efficientnet checkpoints through
the reference's generic vision builder (trainer_vision/builder.py:
134-144).  Mirrors HF ``EfficientNetForImageClassification``:

* stem: explicit (0,1,0,1) zero pad + 3x3 stride-2 VALID conv + BN +
  swish (the TF reference's fixed asymmetric padding);
* MBConv blocks: 1x1 expand + BN + swish (skipped at ratio 1),
  depthwise conv (stride-2 uses correct_pad + VALID, the per-block
  ``depthwise_padding`` list selecting the non-adjusted variant;
  stride-1 uses "same") + BN + swish, squeeze-excite (reduce width
  max(1, int(in_dim * 0.25)) computed on the UNEXPANDED input), 1x1
  project + BN, residual iff stride 1 and not the stage's first block;
* channels via round_filters(width_coefficient), repeats via
  ceil(depth_coefficient * n);
* top: 1x1 conv to round_filters(1280) + BN + swish, mean pool, Linear.

Note the upstream quirk: HF's top_bn/classifier read config.hidden_dim
while top_conv emits round_filters(config, 1280) — consistent only when
the checkpoint sets hidden_dim accordingly (all google/efficientnet-bX
snapshots do); the builder validates this loudly.

Every 1x1 conv (expand/project/SE/top) is an ``nn.Conv2d`` site the
decomposition engines factor like any conv1x1."""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import nn


def round_filters(width: float, divisor: int, channels: int) -> int:
    channels *= width
    new_dim = max(divisor, int(channels + divisor / 2) // divisor * divisor)
    if new_dim < 0.9 * channels:
        new_dim += divisor
    return int(new_dim)


class ConvBNSwish(nn.Module):
    """conv + BN + optional swish with HF's padding flavors: "same",
    explicit ((t,b),(l,r)) zero pad + VALID, or none."""

    conv: nn.Conv2d
    bn: nn.BatchNorm2d
    act: bool = nn.static_field(default=True)
    explicit_pad: Optional[tuple] = nn.static_field(default=None)

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        if self.explicit_pad is not None:
            (t, b), (left, r) = self.explicit_pad
            x = jnp.pad(x, ((0, 0), (t, b), (left, r), (0, 0)))
        x = self.bn(self.conv(x, ctx), ctx)
        return jax.nn.silu(x) if self.act else x


class SqueezeExcite(nn.Module):
    reduce: nn.Conv2d
    expand: nn.Conv2d

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = jax.nn.silu(self.reduce(s, ctx))
        return x * jax.nn.sigmoid(self.expand(s, ctx))


class MBConvBlock(nn.Module):
    depthwise: ConvBNSwish
    squeeze_excite: SqueezeExcite
    project: ConvBNSwish
    expansion: Optional[ConvBNSwish] = None
    residual: bool = nn.static_field(default=False)

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        h = x
        if self.expansion is not None:
            h = self.expansion(h, ctx)
        h = self.squeeze_excite(self.depthwise(h, ctx), ctx)
        h = self.project(h, ctx)
        return x + h if self.residual else h


class EfficientNet(nn.Module):
    """NHWC EfficientNet classifier; input (b, h, w, 3), logits out."""

    embeddings: ConvBNSwish
    blocks: tuple
    top: ConvBNSwish
    classifier: nn.Linear

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        x = self.embeddings(x, ctx)
        for blk in self.blocks:
            x = blk(x, ctx)
        x = self.top(x, ctx)
        return self.classifier(jnp.mean(x, axis=(1, 2)), ctx)

    @staticmethod
    def create(
        key: jax.Array,
        width_coefficient: float = 1.0,
        depth_coefficient: float = 1.0,
        depth_divisor: int = 8,
        kernel_sizes: tuple = (3, 3, 5, 3, 5, 5, 3),
        in_channels: tuple = (32, 16, 24, 40, 80, 112, 192),
        out_channels: tuple = (16, 24, 40, 80, 112, 192, 320),
        strides: tuple = (1, 2, 2, 2, 1, 2, 1),
        num_block_repeats: tuple = (1, 2, 2, 3, 3, 4, 1),
        expand_ratios: tuple = (1, 6, 6, 6, 6, 6, 6),
        squeeze_expansion_ratio: float = 0.25,
        depthwise_padding: tuple = (),
        bn_eps: float = 1e-3,
        num_classes: int = 1000,
        dtype: Any = jnp.float32,
    ) -> "EfficientNet":
        def rf(c: int) -> int:
            return round_filters(width_coefficient, depth_divisor, c)

        def rr(n: int) -> int:
            return int(math.ceil(depth_coefficient * n))

        def conv_bn(k, cin, cout, ksz, stride=1, groups=1, act=True,
                    pad="same", explicit=None):
            return ConvBNSwish(
                conv=nn.Conv2d.create(
                    k, cin, cout, ksz, stride=stride,
                    padding=pad if explicit is None else 0,
                    groups=groups, use_bias=False, dtype=dtype,
                ),
                bn=nn.BatchNorm2d.create(cout, eps=bn_eps),
                act=act,
                explicit_pad=explicit,
            )

        keys = jax.random.split(key, 8 + 4 * sum(rr(n) for n in num_block_repeats))
        ki = iter(range(len(keys)))
        stem_out = rf(32)
        embeddings = conv_bn(
            keys[next(ki)], 3, stem_out, 3, stride=2,
            explicit=((0, 1), (0, 1)),
        )
        blocks = []
        num_blocks = sum(rr(n) for n in num_block_repeats)
        cur = 0
        for i in range(len(in_channels)):
            cin, cout = rf(in_channels[i]), rf(out_channels[i])
            for j in range(rr(num_block_repeats[i])):
                stride = 1 if j > 0 else strides[i]
                bin_ = cout if j > 0 else cin
                ratio = expand_ratios[i]
                ksz = kernel_sizes[i]
                adjust = cur not in set(depthwise_padding)
                exp_dim = bin_ * ratio
                half = ksz // 2
                dw_pad = (
                    None
                    if stride == 1
                    else (
                        ((half - 1, half), (half - 1, half))
                        if adjust
                        else ((half, half), (half, half))
                    )
                )
                se_dim = max(
                    1, int(bin_ * squeeze_expansion_ratio)
                )
                dim = exp_dim if ratio != 1 else bin_
                blocks.append(
                    MBConvBlock(
                        expansion=(
                            conv_bn(keys[next(ki)], bin_, exp_dim, 1)
                            if ratio != 1
                            else None
                        ),
                        depthwise=conv_bn(
                            keys[next(ki)], dim, dim, ksz, stride=stride,
                            groups=dim,
                            pad="same" if stride == 1 else "valid",
                            explicit=dw_pad,
                        ),
                        squeeze_excite=SqueezeExcite(
                            reduce=nn.Conv2d.create(
                                keys[next(ki)], dim, se_dim, 1,
                                padding="same", dtype=dtype,
                            ),
                            expand=nn.Conv2d.create(
                                jax.random.fold_in(keys[next(ki)], 1),
                                se_dim, dim, 1, padding="same", dtype=dtype,
                            ),
                        ),
                        project=conv_bn(
                            jax.random.fold_in(keys[0], 100 + cur),
                            dim, cout, 1, act=False,
                        ),
                        residual=stride == 1 and j > 0,
                    )
                )
                cur += 1
        assert cur == num_blocks
        top_out = rf(1280)
        return EfficientNet(
            embeddings=embeddings,
            blocks=tuple(blocks),
            top=conv_bn(keys[next(ki)], rf(out_channels[-1]), top_out, 1),
            classifier=nn.Linear.create(
                jax.random.fold_in(keys[0], 7), top_out, num_classes, True,
                dtype,
            ),
        )


def efficientnet_b0(key, num_classes=1000):
    return EfficientNet.create(key, 1.0, 1.0, num_classes=num_classes)


def translate_hf_efficientnet_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF EfficientNetForImageClassification -> native torch-layout keys:
    embeddings.convolution/batchnorm -> embeddings.conv/bn, per-block
    expansion/depthwise_conv/squeeze_excite/projection sublayers onto
    the flat MBConv fields, encoder.top_conv/top_bn -> top.conv/bn."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        if k.startswith("efficientnet."):
            k = k[len("efficientnet."):]
        k = k.replace("embeddings.convolution.", "embeddings.conv.")
        k = k.replace("embeddings.batchnorm.", "embeddings.bn.")
        k = k.replace("encoder.blocks.", "blocks.")
        k = k.replace("encoder.top_conv.", "top.conv.")
        k = k.replace("encoder.top_bn.", "top.bn.")
        k = k.replace(".expansion.expand_conv.", ".expansion.conv.")
        k = k.replace(".expansion.expand_bn.", ".expansion.bn.")
        k = k.replace(
            ".depthwise_conv.depthwise_conv.", ".depthwise.conv."
        )
        k = k.replace(
            ".depthwise_conv.depthwise_norm.", ".depthwise.bn."
        )
        k = k.replace(".projection.project_conv.", ".project.conv.")
        k = k.replace(".projection.project_bn.", ".project.bn.")
        out[k] = v
    return out
