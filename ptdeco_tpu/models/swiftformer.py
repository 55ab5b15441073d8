"""SwiftFormer, TPU-native (NHWC).

Reference consumption analogue: any timm/HF swiftformer checkpoint
through the reference's generic builders
(trainer_vision/builder.py:134-144).  Mirrors HF
``SwiftFormerForImageClassification`` exactly:

* stem: two conv3x3/2 + BN + relu;
* per stage, depth-1 ConvEncoder blocks (dw3x3 + BN + 1x1 expand gelu
  1x1 project, layer-scaled residual) then ONE encoder block: local
  representation (same conv shape, 1x1-squared) + efficient additive
  attention + conv MLP, each layer-scaled;
* the attention reproduces HF's quirk faithfully: the query-weight
  softmax runs over the SINGLETON last axis (constant 1.0), so the
  global query is the plain sum of normalized queries over tokens
  (upstream computes softmax(dim=-1) on a (b, n, 1) tensor,
  modeling_swiftformer.SwiftFormerEfficientAdditiveAttention);
* downsample embeddings between stages (conv + BN), head: BN + mean
  pool + (head + dist_head) / 2.

The attention's to_query/to_key/proj/final are decomposable
``nn.Linear`` sites and every pointwise conv a 1x1 ``nn.Conv2d`` site.
"""

from __future__ import annotations

import re
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import nn


class Stem(nn.Module):
    """HF SwiftFormerPatchEmbedding (Sequential 0/1/3/4)."""

    conv1: nn.Conv2d
    bn1: nn.BatchNorm2d
    conv2: nn.Conv2d
    bn2: nn.BatchNorm2d

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        x = jax.nn.relu(self.bn1(self.conv1(x, ctx), ctx))
        return jax.nn.relu(self.bn2(self.conv2(x, ctx), ctx))


class Downsample(nn.Module):
    proj: nn.Conv2d
    norm: nn.BatchNorm2d

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        return self.norm(self.proj(x, ctx), ctx)


class ConvEncoder(nn.Module):
    """dw3x3 + BN + pw expand + gelu + pw project, layer-scaled residual
    (SwiftFormerConvEncoder; LocalRepresentation shares the shape with
    hidden_dim == dim)."""

    depth_wise_conv: nn.Conv2d
    norm: nn.BatchNorm2d
    point_wise_conv1: nn.Conv2d
    point_wise_conv2: nn.Conv2d
    layer_scale: jax.Array

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        h = self.norm(self.depth_wise_conv(x, ctx), ctx)
        h = jax.nn.gelu(self.point_wise_conv1(h, ctx), approximate=False)
        h = self.point_wise_conv2(h, ctx)
        return x + self.layer_scale * h


class AdditiveAttention(nn.Module):
    to_query: nn.Linear
    to_key: nn.Linear
    w_g: jax.Array  # (dim, 1)
    proj: nn.Linear
    final: nn.Linear

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        # x: (b, n, c)
        dim = x.shape[-1]
        q = self.to_query(x, ctx)
        k = self.to_key(x, ctx)
        q = q / jnp.maximum(
            jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12
        )
        k = k / jnp.maximum(
            jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12
        )
        qw = (q @ self.w_g) * (dim ** -0.5)  # (b, n, 1)
        # HF quirk: softmax over the singleton axis == 1.0 exactly
        attn = jax.nn.softmax(qw, axis=-1)
        global_q = jnp.sum(attn * q, axis=1, keepdims=True)  # (b, 1, c)
        out = self.proj(global_q * k, ctx) + q
        return self.final(out, ctx)


class ConvMlp(nn.Module):
    """BN + 1x1 expand + act + 1x1 project (SwiftFormerMlp)."""

    norm1: nn.BatchNorm2d
    fc1: nn.Conv2d
    fc2: nn.Conv2d

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        h = jax.nn.gelu(self.fc1(self.norm1(x, ctx), ctx), approximate=False)
        return self.fc2(h, ctx)


class EncoderBlock(nn.Module):
    local_representation: ConvEncoder
    attn: AdditiveAttention
    linear: ConvMlp
    layer_scale_1: Optional[jax.Array] = None
    layer_scale_2: Optional[jax.Array] = None

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        x = self.local_representation(x, ctx)
        b, h, w, c = x.shape
        res = self.attn(x.reshape(b, h * w, c), ctx).reshape(b, h, w, c)
        if self.layer_scale_1 is not None:
            x = x + self.layer_scale_1 * res
            return x + self.layer_scale_2 * self.linear(x, ctx)
        x = x + res
        return x + self.linear(x, ctx)


class SwiftStage(nn.Module):
    blocks: tuple

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        for blk in self.blocks:
            x = blk(x, ctx)
        return x


class SwiftFormer(nn.Module):
    """NHWC SwiftFormer classifier; input (b, h, w, 3), output logits."""

    patch_embed: Stem
    network: tuple  # interleaved SwiftStage / Downsample, HF layout
    norm: nn.BatchNorm2d
    head: nn.Linear
    dist_head: nn.Linear

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        x = self.patch_embed(x, ctx)
        for block in self.network:
            x = block(x, ctx)
        x = self.norm(x, ctx).mean(axis=(1, 2))
        return (self.head(x, ctx) + self.dist_head(x, ctx)) / 2

    @staticmethod
    def create(
        key: jax.Array,
        num_classes: int = 1000,
        embed_dims: tuple = (48, 56, 112, 220),
        depths: tuple = (3, 3, 6, 4),
        downsamples: tuple = (True, True, True, True),
        mlp_ratio: float = 4.0,
        down_patch_size: int = 3,
        down_stride: int = 2,
        down_pad: int = 1,
        use_layer_scale: bool = True,
        layer_scale_init_value: float = 1e-5,
        bn_eps: float = 1e-5,
        dtype: Any = jnp.float32,
    ) -> "SwiftFormer":
        keys = iter(jax.random.split(key, 16 * sum(depths) + 16))

        def conv(cin, cout, k, stride=1, pad=0, groups=1) -> nn.Conv2d:
            return nn.Conv2d.create(
                next(keys), cin, cout, (k, k), stride=stride, padding=pad,
                groups=groups, dtype=dtype,
            )

        def conv_encoder(dim: int, hidden: int) -> ConvEncoder:
            return ConvEncoder(
                depth_wise_conv=conv(dim, dim, 3, pad=1, groups=dim),
                norm=nn.BatchNorm2d.create(dim, eps=bn_eps),
                point_wise_conv1=conv(dim, hidden, 1),
                point_wise_conv2=conv(hidden, dim, 1),
                layer_scale=jnp.ones((dim,), dtype),
            )

        network = []
        for si, (dim, depth) in enumerate(zip(embed_dims, depths)):
            blocks = []
            for bi in range(depth):
                if depth - bi <= 1:
                    blocks.append(EncoderBlock(
                        local_representation=conv_encoder(dim, dim),
                        attn=AdditiveAttention(
                            to_query=nn.Linear.create(
                                next(keys), dim, dim, True, dtype
                            ),
                            to_key=nn.Linear.create(
                                next(keys), dim, dim, True, dtype
                            ),
                            w_g=jax.random.normal(
                                next(keys), (dim, 1), dtype
                            ),
                            proj=nn.Linear.create(
                                next(keys), dim, dim, True, dtype
                            ),
                            final=nn.Linear.create(
                                next(keys), dim, dim, True, dtype
                            ),
                        ),
                        linear=ConvMlp(
                            norm1=nn.BatchNorm2d.create(dim, eps=bn_eps),
                            fc1=conv(dim, int(dim * mlp_ratio), 1),
                            fc2=conv(int(dim * mlp_ratio), dim, 1),
                        ),
                        layer_scale_1=(
                            layer_scale_init_value * jnp.ones((dim,), dtype)
                            if use_layer_scale else None
                        ),
                        layer_scale_2=(
                            layer_scale_init_value * jnp.ones((dim,), dtype)
                            if use_layer_scale else None
                        ),
                    ))
                else:
                    blocks.append(conv_encoder(dim, int(dim * mlp_ratio)))
            network.append(SwiftStage(blocks=tuple(blocks)))
            if si < len(depths) - 1 and (
                downsamples[si] or embed_dims[si] != embed_dims[si + 1]
            ):
                network.append(Downsample(
                    proj=conv(dim, embed_dims[si + 1], down_patch_size,
                              stride=down_stride, pad=down_pad),
                    norm=nn.BatchNorm2d.create(embed_dims[si + 1], eps=bn_eps),
                ))
        stem_mid = embed_dims[0] // 2
        return SwiftFormer(
            patch_embed=Stem(
                conv1=conv(3, stem_mid, 3, stride=2, pad=1),
                bn1=nn.BatchNorm2d.create(stem_mid, eps=bn_eps),
                conv2=conv(stem_mid, embed_dims[0], 3, stride=2, pad=1),
                bn2=nn.BatchNorm2d.create(embed_dims[0], eps=bn_eps),
            ),
            network=tuple(network),
            norm=nn.BatchNorm2d.create(embed_dims[-1], eps=bn_eps),
            head=nn.Linear.create(
                next(keys), embed_dims[-1], num_classes, True, dtype
            ),
            dist_head=nn.Linear.create(
                next(keys), embed_dims[-1], num_classes, True, dtype
            ),
        )


def translate_hf_swiftformer_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF SwiftFormerForImageClassification -> native torch-layout keys:
    strip ``swiftformer.``/``encoder.``, stem Sequential indices
    0/1/3/4 -> conv1/bn1/conv2/bn2, (dim,1,1) layer scales -> (dim,)."""
    out: dict[str, np.ndarray] = {}
    stem_map = {"0": "conv1", "1": "bn1", "3": "conv2", "4": "bn2"}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        if k.startswith("swiftformer."):
            k = k[len("swiftformer."):]
        if k.startswith("encoder.network."):
            k = k[len("encoder."):]
        m = re.match(r"patch_embed\.patch_embedding\.(\d)\.(.*)", k)
        if m:
            k = f"patch_embed.{stem_map[m.group(1)]}.{m.group(2)}"
        if "layer_scale" in k and v.ndim == 3:
            v = v.reshape(-1)
        out[k] = v
    return out
