"""PVT / PVTv2 / SegFormer — the spatial-reduction-attention family,
TPU-native (NHWC).

Reference consumption analogue: any timm/HF pvt/pvt_v2/segformer
checkpoint through the reference's generic builders
(trainer_vision/builder.py:134-144).  One shared machinery serves the
three HF families (modeling_pvt / modeling_pvt_v2 /
modeling_segformer):

* SRA: queries over all tokens; keys/values over a spatially reduced
  map (conv k=R/s=R + LayerNorm), or PVTv2's ``linear_attention``
  (adaptive 7x7 average pool -> 1x1 conv -> LN -> GELU, and a ReLU
  after dense1 in the FFN);
* mix-FFN with a 3x3 depthwise positional conv (v2/segformer), plain
  FFN for v1;
* v1 quirks kept verbatim: the stage patch embed builds
  ``Conv2d(kernel_size=stride_cfg, stride=patch_cfg)`` (swapped args
  upstream; the defaults coincide), learned per-stage position
  embeddings whose bilinear "interpolation" is an exact identity when
  the runtime grid matches (we require the match and skip it), cls
  token on the last stage only, classifier reads token 0;
* segformer quirks kept verbatim: every LayerNorm uses the torch
  DEFAULT eps 1e-5 — ``config.layer_norm_eps`` is ignored upstream;
  mean-pool classifier; per-stage trailing LayerNorms in a bare list;
* v2: overlap patch embeds (k=p, s=s, pad p//2), per-stage trailing
  LN, mean-pool classifier.

All q/k/v/proj/dense1/dense2 are decomposable ``nn.Linear`` sites.
The attention map materializes per stage at the reduced width
(n x n/R^2) — the hot matmuls stay MXU-shaped.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import nn


def _adaptive_avg_pool(x: jax.Array, out: int) -> jax.Array:
    """torch AdaptiveAvgPool2d on NHWC: cell [i] averages rows
    [floor(i*s/out), ceil((i+1)*s/out)) — built as two small averaging
    matrices so the pool is a pair of MXU matmuls."""

    def mat(size: int) -> jax.Array:
        m = np.zeros((out, size), np.float32)
        for i in range(out):
            s = (i * size) // out
            e = -((-(i + 1) * size) // out)
            m[i, s:e] = 1.0 / (e - s)
        return jnp.asarray(m, x.dtype)

    return jnp.einsum("ph,bhwc,qw->bpqc", mat(x.shape[1]), x, mat(x.shape[2]))


class SRAttention(nn.Module):
    """Efficient (spatially reduced) self-attention shared by the three
    families; ``proj`` is v1/segformer's ``attention.output.dense``
    (renamed by the translators)."""

    query: nn.Linear
    key: nn.Linear
    value: nn.Linear
    proj: nn.Linear
    spatial_reduction: Optional[nn.Conv2d] = None
    layer_norm: Optional[nn.LayerNorm] = None
    n_heads: int = nn.static_field(default=1)
    linear_attention: bool = nn.static_field(default=False)

    def __call__(
        self, x: jax.Array, hw: tuple[int, int],
        ctx: Optional[nn.Ctx] = None,
    ) -> jax.Array:
        b, n, c = x.shape
        h, w = hw
        dh = c // self.n_heads

        def split(t: jax.Array) -> jax.Array:
            return t.reshape(b, -1, self.n_heads, dh).transpose(0, 2, 1, 3)

        q = split(self.query(x, ctx))
        if self.linear_attention:
            s = _adaptive_avg_pool(x.reshape(b, h, w, c), 7)
            s = self.spatial_reduction(s, ctx).reshape(b, -1, c)
            s = jax.nn.gelu(self.layer_norm(s, ctx), approximate=False)
        elif self.spatial_reduction is not None:
            s = self.spatial_reduction(x.reshape(b, h, w, c), ctx)
            s = self.layer_norm(s.reshape(b, -1, c), ctx)
        else:
            s = x
        k = split(self.key(s, ctx))
        v = split(self.value(s, ctx))
        attn = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
                jnp.asarray(dh, x.dtype)
            ),
            axis=-1,
        )
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return self.proj(out, ctx)


class MixFFN(nn.Module):
    """dense1 (+optional relu) (+optional dw3x3 positional conv) + act +
    dense2; dwconv=None gives v1's plain FFN."""

    dense1: nn.Linear
    dense2: nn.Linear
    dwconv: Optional[nn.Conv2d] = None
    relu_first: bool = nn.static_field(default=False)

    def __call__(
        self, x: jax.Array, hw: tuple[int, int],
        ctx: Optional[nn.Ctx] = None,
    ) -> jax.Array:
        b, n, _ = x.shape
        h = self.dense1(x, ctx)
        if self.relu_first:
            h = jax.nn.relu(h)
        if self.dwconv is not None:
            hidden = h.shape[-1]
            h = self.dwconv(h.reshape(b, hw[0], hw[1], hidden), ctx)
            h = h.reshape(b, n, hidden)
        h = jax.nn.gelu(h, approximate=False)
        return self.dense2(h, ctx)


class SRABlock(nn.Module):
    layer_norm_1: nn.LayerNorm
    attention: SRAttention
    layer_norm_2: nn.LayerNorm
    mlp: MixFFN

    def __call__(
        self, x: jax.Array, hw: tuple[int, int],
        ctx: Optional[nn.Ctx] = None,
    ) -> jax.Array:
        x = x + self.attention(self.layer_norm_1(x, ctx), hw, ctx)
        return x + self.mlp(self.layer_norm_2(x, ctx), hw, ctx)


class OverlapPatchEmbed(nn.Module):
    """v2/segformer overlap patch embed (LN after flatten)."""

    proj: nn.Conv2d
    layer_norm: nn.LayerNorm

    def __call__(
        self, x: jax.Array, ctx: Optional[nn.Ctx] = None
    ) -> tuple[jax.Array, tuple[int, int]]:
        y = self.proj(x, ctx)
        b, h, w, c = y.shape
        return self.layer_norm(y.reshape(b, h * w, c), ctx), (h, w)


class PvtPatchEmbed(nn.Module):
    """v1 patch embed: conv + LN + learned positions (+ cls on the last
    stage).  The stored grid must match the runtime grid (HF's bilinear
    resample to the SAME size is an exact identity)."""

    projection: nn.Conv2d
    layer_norm: nn.LayerNorm
    position_embeddings: jax.Array  # (1, n(+1), c)
    cls_token: Optional[jax.Array] = None

    def __call__(
        self, x: jax.Array, ctx: Optional[nn.Ctx] = None
    ) -> tuple[jax.Array, tuple[int, int]]:
        y = self.projection(x, ctx)
        b, h, w, c = y.shape
        n_expected = self.position_embeddings.shape[1] - (
            1 if self.cls_token is not None else 0
        )
        if h * w != n_expected:
            raise ValueError(
                f"pvt position embeddings were built for {n_expected} "
                f"patches, got {h}x{w}; resize inputs to the config "
                "image_size"
            )
        t = self.layer_norm(y.reshape(b, h * w, c), ctx)
        if self.cls_token is not None:
            t = jnp.concatenate(
                [jnp.broadcast_to(self.cls_token, (b, 1, c)), t], axis=1
            )
        return t + self.position_embeddings, (h, w)


class PVT(nn.Module):
    """PVT v1 classifier (HF PvtForImageClassification), NHWC input."""

    patch_embeddings: tuple
    block: tuple  # tuple (stages) of tuples (layers) of SRABlock
    layer_norm: nn.LayerNorm
    classifier: nn.Linear

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        b = x.shape[0]
        t = None
        for i, (pe, blocks) in enumerate(
            zip(self.patch_embeddings, self.block)
        ):
            t, (h, w) = pe(x, ctx)
            for blk in blocks:
                t = blk(t, (h, w), ctx)
            if i != len(self.block) - 1:
                x = t.reshape(b, h, w, -1)
        t = self.layer_norm(t, ctx)
        return self.classifier(t[:, 0, :], ctx)

    @staticmethod
    def create(
        key: jax.Array,
        num_classes: int = 1000,
        image_size: int = 224,
        hidden_sizes: tuple = (64, 128, 320, 512),
        depths: tuple = (2, 2, 2, 2),
        num_attention_heads: tuple = (1, 2, 5, 8),
        sequence_reduction_ratios: tuple = (8, 4, 2, 1),
        patch_sizes: tuple = (4, 2, 2, 2),
        strides: tuple = (4, 2, 2, 2),
        mlp_ratios: tuple = (8, 8, 4, 4),
        qkv_bias: bool = True,
        layer_norm_eps: float = 1e-6,
        dtype: Any = jnp.float32,
    ) -> "PVT":
        n_stages = len(depths)
        keys = iter(jax.random.split(key, 8 * sum(depths) + 4 * n_stages + 4))
        embeds, stages = [], []
        for i in range(n_stages):
            cin = 3 if i == 0 else hidden_sizes[i - 1]
            dim = hidden_sizes[i]
            stage_image = (
                image_size if i == 0 else image_size // (2 ** (i + 1))
            )
            grid = stage_image // patch_sizes[i]
            is_last = i == n_stages - 1
            n_pos = grid * grid + (1 if is_last else 0)
            embeds.append(PvtPatchEmbed(
                # upstream swaps the args: kernel <- stride config,
                # stride <- patch config (modeling_pvt.PvtPatchEmbeddings)
                projection=nn.Conv2d.create(
                    next(keys), cin, dim, (strides[i], strides[i]),
                    stride=patch_sizes[i], dtype=dtype,
                ),
                layer_norm=nn.LayerNorm.create(
                    dim, eps=layer_norm_eps, dtype=dtype
                ),
                position_embeddings=jax.random.normal(
                    next(keys), (1, n_pos, dim), dtype
                ),
                cls_token=(
                    jnp.zeros((1, 1, dim), dtype) if is_last else None
                ),
            ))
            stages.append(tuple(
                _make_block(
                    next(keys), dim, num_attention_heads[i],
                    sequence_reduction_ratios[i], mlp_ratios[i],
                    qkv_bias=qkv_bias, eps=layer_norm_eps, dwconv=False,
                    linear_attention=False, dtype=dtype,
                )
                for _ in range(depths[i])
            ))
        return PVT(
            patch_embeddings=tuple(embeds),
            block=tuple(stages),
            layer_norm=nn.LayerNorm.create(
                hidden_sizes[-1], eps=layer_norm_eps, dtype=dtype
            ),
            classifier=nn.Linear.create(
                next(keys), hidden_sizes[-1], num_classes, True, dtype
            ),
        )


class PvtV2EncoderLayer(nn.Module):
    patch_embedding: OverlapPatchEmbed
    blocks: tuple
    layer_norm: nn.LayerNorm

    def __call__(
        self, x: jax.Array, ctx: Optional[nn.Ctx] = None
    ) -> jax.Array:
        t, (h, w) = self.patch_embedding(x, ctx)
        for blk in self.blocks:
            t = blk(t, (h, w), ctx)
        t = self.layer_norm(t, ctx)
        return t.reshape(x.shape[0], h, w, -1)


class PVTv2(nn.Module):
    """PVTv2 classifier (HF PvtV2ForImageClassification), NHWC input;
    ``linear_attention=True`` is the pvt_v2-b*-li flavor."""

    layers: tuple
    classifier: nn.Linear

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        for layer in self.layers:
            x = layer(x, ctx)
        pooled = x.reshape(x.shape[0], -1, x.shape[-1]).mean(axis=1)
        return self.classifier(pooled, ctx)

    @staticmethod
    def create(
        key: jax.Array,
        num_classes: int = 1000,
        hidden_sizes: tuple = (32, 64, 160, 256),
        depths: tuple = (2, 2, 2, 2),
        num_attention_heads: tuple = (1, 2, 5, 8),
        sr_ratios: tuple = (8, 4, 2, 1),
        patch_sizes: tuple = (7, 3, 3, 3),
        strides: tuple = (4, 2, 2, 2),
        mlp_ratios: tuple = (8, 8, 4, 4),
        qkv_bias: bool = True,
        linear_attention: bool = False,
        layer_norm_eps: float = 1e-6,
        dtype: Any = jnp.float32,
    ) -> "PVTv2":
        n_stages = len(depths)
        keys = iter(jax.random.split(key, 9 * sum(depths) + 4 * n_stages + 4))
        layers = []
        for i in range(n_stages):
            cin = 3 if i == 0 else hidden_sizes[i - 1]
            dim = hidden_sizes[i]
            layers.append(PvtV2EncoderLayer(
                patch_embedding=OverlapPatchEmbed(
                    proj=nn.Conv2d.create(
                        next(keys), cin, dim,
                        (patch_sizes[i], patch_sizes[i]),
                        stride=strides[i], padding=patch_sizes[i] // 2,
                        dtype=dtype,
                    ),
                    layer_norm=nn.LayerNorm.create(
                        dim, eps=layer_norm_eps, dtype=dtype
                    ),
                ),
                blocks=tuple(
                    _make_block(
                        next(keys), dim, num_attention_heads[i],
                        sr_ratios[i], mlp_ratios[i], qkv_bias=qkv_bias,
                        eps=layer_norm_eps, dwconv=True,
                        linear_attention=linear_attention, dtype=dtype,
                    )
                    for _ in range(depths[i])
                ),
                layer_norm=nn.LayerNorm.create(
                    dim, eps=layer_norm_eps, dtype=dtype
                ),
            ))
        return PVTv2(
            layers=tuple(layers),
            classifier=nn.Linear.create(
                next(keys), hidden_sizes[-1], num_classes, True, dtype
            ),
        )


class Segformer(nn.Module):
    """SegFormer classifier (HF SegformerForImageClassification), NHWC
    input.  All LayerNorms use eps 1e-5 (torch default) — upstream
    never threads config.layer_norm_eps through."""

    patch_embeddings: tuple
    block: tuple
    layer_norm: tuple  # trailing per-stage LNs
    classifier: nn.Linear

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        b = x.shape[0]
        for pe, blocks, ln in zip(
            self.patch_embeddings, self.block, self.layer_norm
        ):
            t, (h, w) = pe(x, ctx)
            for blk in blocks:
                t = blk(t, (h, w), ctx)
            t = ln(t, ctx)
            x = t.reshape(b, h, w, -1)
        pooled = x.reshape(b, -1, x.shape[-1]).mean(axis=1)
        return self.classifier(pooled, ctx)

    @staticmethod
    def create(
        key: jax.Array,
        num_classes: int = 1000,
        hidden_sizes: tuple = (32, 64, 160, 256),
        depths: tuple = (2, 2, 2, 2),
        num_attention_heads: tuple = (1, 2, 5, 8),
        sr_ratios: tuple = (8, 4, 2, 1),
        patch_sizes: tuple = (7, 3, 3, 3),
        strides: tuple = (4, 2, 2, 2),
        mlp_ratios: tuple = (4, 4, 4, 4),
        dtype: Any = jnp.float32,
    ) -> "Segformer":
        n_stages = len(depths)
        keys = iter(jax.random.split(key, 9 * sum(depths) + 4 * n_stages + 4))
        embeds, stages = [], []
        for i in range(n_stages):
            cin = 3 if i == 0 else hidden_sizes[i - 1]
            dim = hidden_sizes[i]
            embeds.append(OverlapPatchEmbed(
                proj=nn.Conv2d.create(
                    next(keys), cin, dim, (patch_sizes[i], patch_sizes[i]),
                    stride=strides[i], padding=patch_sizes[i] // 2,
                    dtype=dtype,
                ),
                layer_norm=nn.LayerNorm.create(dim, eps=1e-5, dtype=dtype),
            ))
            stages.append(tuple(
                _make_block(
                    next(keys), dim, num_attention_heads[i], sr_ratios[i],
                    mlp_ratios[i], qkv_bias=True, eps=1e-5, dwconv=True,
                    linear_attention=False, dtype=dtype,
                )
                for _ in range(depths[i])
            ))
        return Segformer(
            patch_embeddings=tuple(embeds),
            block=tuple(stages),
            layer_norm=tuple(
                nn.LayerNorm.create(hidden_sizes[i], eps=1e-5, dtype=dtype)
                for i in range(n_stages)
            ),
            classifier=nn.Linear.create(
                next(keys), hidden_sizes[-1], num_classes, True, dtype
            ),
        )


def _make_block(
    key: jax.Array,
    dim: int,
    n_heads: int,
    sr_ratio: int,
    mlp_ratio: float,
    *,
    qkv_bias: bool,
    eps: float,
    dwconv: bool,
    linear_attention: bool,
    dtype: Any,
) -> SRABlock:
    keys = iter(jax.random.split(key, 10))
    hidden = int(dim * mlp_ratio)
    if linear_attention:
        sr_conv: Optional[nn.Conv2d] = nn.Conv2d.create(
            next(keys), dim, dim, (1, 1), dtype=dtype
        )
        sr_ln: Optional[nn.LayerNorm] = nn.LayerNorm.create(
            dim, eps=eps, dtype=dtype
        )
    elif sr_ratio > 1:
        sr_conv = nn.Conv2d.create(
            next(keys), dim, dim, (sr_ratio, sr_ratio), stride=sr_ratio,
            dtype=dtype,
        )
        sr_ln = nn.LayerNorm.create(dim, eps=eps, dtype=dtype)
    else:
        sr_conv, sr_ln = None, None
    return SRABlock(
        layer_norm_1=nn.LayerNorm.create(dim, eps=eps, dtype=dtype),
        attention=SRAttention(
            query=nn.Linear.create(next(keys), dim, dim, qkv_bias, dtype),
            key=nn.Linear.create(next(keys), dim, dim, qkv_bias, dtype),
            value=nn.Linear.create(next(keys), dim, dim, qkv_bias, dtype),
            proj=nn.Linear.create(next(keys), dim, dim, True, dtype),
            spatial_reduction=sr_conv,
            layer_norm=sr_ln,
            n_heads=n_heads,
            linear_attention=linear_attention,
        ),
        layer_norm_2=nn.LayerNorm.create(dim, eps=eps, dtype=dtype),
        mlp=MixFFN(
            dense1=nn.Linear.create(next(keys), dim, hidden, True, dtype),
            dense2=nn.Linear.create(next(keys), hidden, dim, True, dtype),
            dwconv=(
                nn.Conv2d.create(
                    next(keys), hidden, hidden, (3, 3), padding=1,
                    groups=hidden, dtype=dtype,
                )
                if dwconv else None
            ),
            relu_first=linear_attention,
        ),
    )


def _common_renames(k: str) -> str:
    k = k.replace(".attention.self.", ".attention.")
    k = k.replace(".attention.output.dense.", ".attention.proj.")
    k = k.replace(".mlp.dwconv.dwconv.", ".mlp.dwconv.")
    return k


def translate_hf_pvt_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF PvtForImageClassification -> native torch-layout keys."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.startswith("pvt."):
            k = k[len("pvt."):]
        if k.startswith("encoder."):
            k = k[len("encoder."):]
        k = _common_renames(k)
        k = k.replace(".sequence_reduction.", ".spatial_reduction.")
        out[k] = v
    return out


def translate_hf_pvt_v2_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF PvtV2ForImageClassification -> native torch-layout keys."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.startswith("pvt_v2."):
            k = k[len("pvt_v2."):]
        if k.startswith("encoder."):
            k = k[len("encoder."):]
        k = _common_renames(k)
        out[k] = v
    return out


def translate_hf_segformer_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF SegformerForImageClassification -> native torch-layout keys."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.startswith("segformer."):
            k = k[len("segformer."):]
        if k.startswith("encoder."):
            k = k[len("encoder."):]
        k = _common_renames(k)
        k = k.replace(".sr.", ".spatial_reduction.")
        out[k] = v
    return out
