"""CvT (Convolutional vision Transformer), TPU-native (NHWC).

Reference consumption analogue: any timm/HF cvt checkpoint through the
reference's generic builders (trainer_vision/builder.py:134-144).
Mirrors HF ``CvtForImageClassification`` exactly:

* per-stage conv embeddings (k/s/p from config) + LayerNorm on tokens;
* convolutional q/k/v projections: depthwise k3 conv + BatchNorm per
  head of the attention (``dw_bn``; stride_kv=2 shrinks keys/values),
  the cls token (last stage only) bypasses the conv and is re-attached
  before the linear projections;
* two upstream quirks kept verbatim: the attention scale is
  ``embed_dim**-0.5`` (the FULL embedding dim, not head_dim), and
  every LayerNorm uses the torch DEFAULT eps 1e-5 —
  ``config.layer_norm_eps`` (1e-12) is never threaded through;
* classifier: LN over the cls token (or mean of tokens when the last
  stage has no cls), linear head.

The ``avg`` qkv_projection_method (pool instead of conv, unused by the
published checkpoints) is refused loudly.  All six projections per
block are decomposable ``nn.Linear`` sites.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import nn


class ConvProjection(nn.Module):
    """dw conv + BN (CvtSelfAttentionConvProjection); returns tokens."""

    convolution: nn.Conv2d
    normalization: nn.BatchNorm2d

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        y = self.normalization(self.convolution(x, ctx), ctx)
        return y.reshape(y.shape[0], -1, y.shape[-1])


class _Proj(nn.Module):
    """CvtSelfAttentionProjection wrapper (keeps the HF key nesting)."""

    convolution_projection: ConvProjection

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        return self.convolution_projection(x, ctx)


class CvtSelfAttention(nn.Module):
    convolution_projection_query: _Proj
    convolution_projection_key: _Proj
    convolution_projection_value: _Proj
    projection_query: nn.Linear
    projection_key: nn.Linear
    projection_value: nn.Linear
    n_heads: int = nn.static_field(default=1)
    with_cls_token: bool = nn.static_field(default=False)

    def __call__(
        self, x: jax.Array, hw: tuple[int, int],
        ctx: Optional[nn.Ctx] = None,
    ) -> jax.Array:
        b, n, c = x.shape
        h, w = hw
        cls = None
        if self.with_cls_token:
            cls, x = x[:, :1], x[:, 1:]
        fmap = x.reshape(b, h, w, c)
        q = self.convolution_projection_query(fmap, ctx)
        k = self.convolution_projection_key(fmap, ctx)
        v = self.convolution_projection_value(fmap, ctx)
        if cls is not None:
            q = jnp.concatenate([cls, q], axis=1)
            k = jnp.concatenate([cls, k], axis=1)
            v = jnp.concatenate([cls, v], axis=1)
        dh = c // self.n_heads

        def split(t):
            return t.reshape(b, -1, self.n_heads, dh).transpose(0, 2, 1, 3)

        q = split(self.projection_query(q, ctx))
        k = split(self.projection_key(k, ctx))
        v = split(self.projection_value(v, ctx))
        # upstream quirk: scale by the FULL embed dim, not head_dim
        attn = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q, k) * (c ** -0.5), axis=-1
        )
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        return out.transpose(0, 2, 1, 3).reshape(b, n, c)


class _Dense(nn.Module):
    dense: nn.Linear

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        return self.dense(x, ctx)


class _Attn(nn.Module):
    attention: CvtSelfAttention
    output: _Dense

    def __call__(self, x, hw, ctx=None):
        return self.output(self.attention(x, hw, ctx), ctx)


class CvtBlock(nn.Module):
    attention: _Attn
    intermediate: _Dense
    output: _Dense
    layernorm_before: nn.LayerNorm
    layernorm_after: nn.LayerNorm

    def __call__(
        self, x: jax.Array, hw: tuple[int, int],
        ctx: Optional[nn.Ctx] = None,
    ) -> jax.Array:
        x = x + self.attention(self.layernorm_before(x, ctx), hw, ctx)
        h = jax.nn.gelu(
            self.intermediate(self.layernorm_after(x, ctx), ctx),
            approximate=False,
        )
        return x + self.output.dense(h, ctx)


class ConvEmbed(nn.Module):
    projection: nn.Conv2d
    normalization: nn.LayerNorm

    def __call__(
        self, x: jax.Array, ctx: Optional[nn.Ctx] = None
    ) -> jax.Array:
        y = self.projection(x, ctx)
        b, h, w, c = y.shape
        return self.normalization(y.reshape(b, h * w, c), ctx).reshape(
            b, h, w, c
        )


class _Embedding(nn.Module):
    convolution_embeddings: ConvEmbed

    def __call__(self, x, ctx=None):
        return self.convolution_embeddings(x, ctx)


class CvtStage(nn.Module):
    embedding: _Embedding
    layers: tuple
    cls_token: Optional[jax.Array] = None

    def __call__(
        self, x: jax.Array, ctx: Optional[nn.Ctx] = None
    ) -> tuple[jax.Array, Optional[jax.Array]]:
        y = self.embedding(x, ctx)
        b, h, w, c = y.shape
        t = y.reshape(b, h * w, c)
        if self.cls_token is not None:
            t = jnp.concatenate(
                [jnp.broadcast_to(self.cls_token, (b, 1, c)), t], axis=1
            )
        for blk in self.layers:
            t = blk(t, (h, w), ctx)
        cls = None
        if self.cls_token is not None:
            cls, t = t[:, :1], t[:, 1:]
        return t.reshape(b, h, w, c), cls


class CvT(nn.Module):
    """NHWC CvT classifier; input (b, h, w, 3), output logits."""

    stages: tuple
    layernorm: nn.LayerNorm
    classifier: nn.Linear

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        cls = None
        for stage in self.stages:
            x, cls = stage(x, ctx)
        if cls is not None:
            t = self.layernorm(cls, ctx)
        else:
            b, h, w, c = x.shape
            t = self.layernorm(x.reshape(b, h * w, c), ctx)
        return self.classifier(t.mean(axis=1), ctx)

    @staticmethod
    def create(
        key: jax.Array,
        num_classes: int = 1000,
        embed_dim: tuple = (64, 192, 384),
        depth: tuple = (1, 2, 10),
        num_heads: tuple = (1, 3, 6),
        patch_sizes: tuple = (7, 3, 3),
        patch_stride: tuple = (4, 2, 2),
        patch_padding: tuple = (2, 1, 1),
        mlp_ratio: tuple = (4.0, 4.0, 4.0),
        qkv_bias: tuple = (True, True, True),
        cls_token: tuple = (False, False, True),
        qkv_projection_method: tuple = ("dw_bn", "dw_bn", "dw_bn"),
        kernel_qkv: tuple = (3, 3, 3),
        padding_q: tuple = (1, 1, 1),
        padding_kv: tuple = (1, 1, 1),
        stride_q: tuple = (1, 1, 1),
        stride_kv: tuple = (2, 2, 2),
        dtype: Any = jnp.float32,
    ) -> "CvT":
        keys = iter(jax.random.split(key, 16 * sum(depth) + 4 * len(depth) + 4))
        stages = []
        for s in range(len(depth)):
            if qkv_projection_method[s] != "dw_bn":
                raise ValueError(
                    f"qkv_projection_method={qkv_projection_method[s]!r} "
                    "unsupported (only dw_bn, the published checkpoints')"
                )
            cin = 3 if s == 0 else embed_dim[s - 1]
            dim = embed_dim[s]

            def conv_proj(pad, stride) -> _Proj:
                return _Proj(convolution_projection=ConvProjection(
                    convolution=nn.Conv2d.create(
                        next(keys), dim, dim, (kernel_qkv[s], kernel_qkv[s]),
                        stride=stride, padding=pad, groups=dim,
                        use_bias=False, dtype=dtype,
                    ),
                    normalization=nn.BatchNorm2d.create(dim, eps=1e-5),
                ))

            blocks = []
            for _ in range(depth[s]):
                inter = int(dim * mlp_ratio[s])
                blocks.append(CvtBlock(
                    attention=_Attn(
                        attention=CvtSelfAttention(
                            convolution_projection_query=conv_proj(
                                padding_q[s], stride_q[s]
                            ),
                            convolution_projection_key=conv_proj(
                                padding_kv[s], stride_kv[s]
                            ),
                            convolution_projection_value=conv_proj(
                                padding_kv[s], stride_kv[s]
                            ),
                            projection_query=nn.Linear.create(
                                next(keys), dim, dim, qkv_bias[s], dtype
                            ),
                            projection_key=nn.Linear.create(
                                next(keys), dim, dim, qkv_bias[s], dtype
                            ),
                            projection_value=nn.Linear.create(
                                next(keys), dim, dim, qkv_bias[s], dtype
                            ),
                            n_heads=num_heads[s],
                            with_cls_token=bool(cls_token[s]),
                        ),
                        output=_Dense(dense=nn.Linear.create(
                            next(keys), dim, dim, True, dtype
                        )),
                    ),
                    intermediate=_Dense(dense=nn.Linear.create(
                        next(keys), dim, inter, True, dtype
                    )),
                    output=_Dense(dense=nn.Linear.create(
                        next(keys), inter, dim, True, dtype
                    )),
                    # upstream quirk: default eps, layer_norm_eps ignored
                    layernorm_before=nn.LayerNorm.create(dim, eps=1e-5,
                                                         dtype=dtype),
                    layernorm_after=nn.LayerNorm.create(dim, eps=1e-5,
                                                        dtype=dtype),
                ))
            stages.append(CvtStage(
                embedding=_Embedding(
                    convolution_embeddings=ConvEmbed(
                        projection=nn.Conv2d.create(
                            next(keys), cin, dim,
                            (patch_sizes[s], patch_sizes[s]),
                            stride=patch_stride[s], padding=patch_padding[s],
                            dtype=dtype,
                        ),
                        normalization=nn.LayerNorm.create(dim, eps=1e-5,
                                                          dtype=dtype),
                    ),
                ),
                layers=tuple(blocks),
                cls_token=(
                    jax.random.normal(next(keys), (1, 1, embed_dim[-1]),
                                      dtype)
                    if cls_token[s] else None
                ),
            ))
        return CvT(
            stages=tuple(stages),
            layernorm=nn.LayerNorm.create(embed_dim[-1], eps=1e-5,
                                          dtype=dtype),
            classifier=nn.Linear.create(
                next(keys), embed_dim[-1], num_classes, True, dtype
            ),
        )


def translate_hf_cvt_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF CvtForImageClassification -> native torch-layout keys: strip
    ``cvt.encoder.``."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        if k.startswith("cvt."):
            k = k[len("cvt."):]
        if k.startswith("encoder.stages."):
            k = k[len("encoder."):]
        out[k] = v
    return out
