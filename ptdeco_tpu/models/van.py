"""VAN (Visual Attention Network, large-kernel attention), TPU-native NHWC.

Reference consumption analogue: HF van checkpoints through the
reference's generic vision builder (trainer_vision/builder.py:134-144).
Mirrors HF ``VanForImageClassification`` (models/deprecated/van):

* stages: overlapping patch embed (k, s, k//2 pad conv + BN), then
  layers of [BN -> spatial attention -> layer scale -> +res,
  BN -> conv-MLP -> layer scale -> +res], then a LayerNorm over
  channels;
* spatial attention: 1x1 conv + gelu, LKA (dw 5x5, dw 7x7 dilation 3
  pad 9, pointwise 1x1) multiplied onto its input, 1x1 conv, +res;
* conv-MLP: 1x1 -> dw 3x3 -> gelu -> 1x1;
* head: global average pool + Linear.  (HF's ``van.layernorm`` exists
  in checkpoints but is NEVER applied on the classification path — the
  translator drops it, documented upstream quirk.)

All 1x1 convs (pre/post projection, pointwise LKA, MLP in/out) are
decomposable ``nn.Conv2d`` sites."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import nn


class VanPatchEmbed(nn.Module):
    convolution: nn.Conv2d
    normalization: nn.BatchNorm2d

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        return self.normalization(self.convolution(x, ctx), ctx)


class VanLKA(nn.Module):
    depth_wise: nn.Conv2d
    depth_wise_dilated: nn.Conv2d
    point_wise: nn.Conv2d

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        return self.point_wise(
            self.depth_wise_dilated(self.depth_wise(x, ctx), ctx), ctx
        )


class VanSpatialAttention(nn.Module):
    pre_conv: nn.Conv2d
    attention: VanLKA
    post_projection: nn.Conv2d

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        h = jax.nn.gelu(self.pre_conv(x, ctx), approximate=False)
        h = h * self.attention(h, ctx)
        return x + self.post_projection(h, ctx)


class VanMlp(nn.Module):
    in_dense: nn.Conv2d
    depth_wise: nn.Conv2d
    out_dense: nn.Conv2d

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        h = self.depth_wise(self.in_dense(x, ctx), ctx)
        return self.out_dense(jax.nn.gelu(h, approximate=False), ctx)


class VanLayer(nn.Module):
    pre_norm: nn.BatchNorm2d
    attention: VanSpatialAttention
    attention_scaling: jax.Array  # (c,)
    post_normalization: nn.BatchNorm2d
    mlp: VanMlp
    mlp_scaling: jax.Array  # (c,)

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        x = x + self.attention_scaling * self.attention(
            self.pre_norm(x, ctx), ctx
        )
        return x + self.mlp_scaling * self.mlp(
            self.post_normalization(x, ctx), ctx
        )


class VanStage(nn.Module):
    embeddings: VanPatchEmbed
    layers: tuple
    normalization: nn.LayerNorm

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        x = self.embeddings(x, ctx)
        for layer in self.layers:
            x = layer(x, ctx)
        return self.normalization(x, ctx)  # channel-last: direct


class VAN(nn.Module):
    """NHWC VAN classifier; input (b, h, w, 3), logits out."""

    stages: tuple
    classifier: nn.Linear

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        for st in self.stages:
            x = st(x, ctx)
        return self.classifier(jnp.mean(x, axis=(1, 2)), ctx)

    @staticmethod
    def create(
        key: jax.Array,
        patch_sizes: tuple = (7, 3, 3, 3),
        strides: tuple = (4, 2, 2, 2),
        hidden_sizes: tuple = (64, 128, 320, 512),
        depths: tuple = (3, 3, 12, 3),
        mlp_ratios: tuple = (8, 8, 4, 4),
        layer_scale_init_value: float = 1e-2,
        layer_norm_eps: float = 1e-6,
        num_classes: int = 1000,
        dtype: Any = jnp.float32,
    ) -> "VAN":
        keys = jax.random.split(key, 2 + 8 * sum(depths) + 2 * len(depths))
        ki = iter(range(len(keys)))
        conv = lambda cin, cout, k, stride=1, groups=1, dil=1, pad=None: (  # noqa: E731
            nn.Conv2d.create(
                keys[next(ki)], cin, cout, k, stride=stride,
                padding=k // 2 if pad is None else pad, dilation=dil,
                groups=groups, dtype=dtype,
            )
        )
        stages = []
        cin = 3
        for si in range(len(depths)):
            c = hidden_sizes[si]
            embed = VanPatchEmbed(
                convolution=conv(cin, c, patch_sizes[si], stride=strides[si]),
                normalization=nn.BatchNorm2d.create(c, eps=1e-5),
            )
            layers = []
            for _ in range(depths[si]):
                layers.append(VanLayer(
                    pre_norm=nn.BatchNorm2d.create(c, eps=1e-5),
                    attention=VanSpatialAttention(
                        pre_conv=conv(c, c, 1),
                        attention=VanLKA(
                            depth_wise=conv(c, c, 5, groups=c),
                            depth_wise_dilated=conv(
                                c, c, 7, groups=c, dil=3, pad=9
                            ),
                            point_wise=conv(c, c, 1),
                        ),
                        post_projection=conv(c, c, 1),
                    ),
                    attention_scaling=layer_scale_init_value
                    * jnp.ones((c,), jnp.float32),
                    post_normalization=nn.BatchNorm2d.create(c, eps=1e-5),
                    mlp=VanMlp(
                        in_dense=conv(c, c * mlp_ratios[si], 1),
                        depth_wise=conv(
                            c * mlp_ratios[si], c * mlp_ratios[si], 3,
                            groups=c * mlp_ratios[si],
                        ),
                        out_dense=conv(c * mlp_ratios[si], c, 1),
                    ),
                    mlp_scaling=layer_scale_init_value
                    * jnp.ones((c,), jnp.float32),
                ))
            stages.append(VanStage(
                embeddings=embed,
                layers=tuple(layers),
                normalization=nn.LayerNorm.create(c, eps=layer_norm_eps),
            ))
            cin = c
        return VAN(
            stages=tuple(stages),
            classifier=nn.Linear.create(
                keys[next(ki)], hidden_sizes[-1], num_classes, True, dtype
            ),
        )


def translate_hf_van_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF VanForImageClassification -> native keys.  ``van.layernorm``
    (never applied on the classification path upstream) and BN counters
    are dropped; the ``pre_normomalization`` upstream typo and the
    nested pre_projection/attention_layer names map onto the flat native
    fields; layer-scale ``.weight`` leaves collapse to array leaves."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked") or k.startswith("van.layernorm."):
            continue
        if k.startswith("van.encoder."):
            k = k[len("van.encoder."):]
        k = k.replace(".pre_normomalization.", ".pre_norm.")
        k = k.replace(".attention.pre_projection.conv.", ".attention.pre_conv.")
        k = k.replace(".attention.attention_layer.attention.", ".attention.attention.")
        k = k.replace(".attention_scaling.weight", ".attention_scaling")
        k = k.replace(".mlp_scaling.weight", ".mlp_scaling")
        out[k] = v
    return out
