"""MobileViT v1/v2, TPU-native (NHWC).

Reference consumption analogue: any timm/HF mobilevit checkpoint through
the reference's generic builders (trainer_vision/builder.py:134-144).
Mirrors HF ``MobileViTForImageClassification`` /
``MobileViTV2ForImageClassification`` exactly:

* MobileNetV2-style inverted residual stages interleaved with MobileViT
  blocks: local conv (kxk full in v1, depthwise in v2) + 1x1, the
  feature map unfolded so pixels at the SAME within-patch offset attend
  across patches — a pure reshape/transpose in NHWC (no gather), the
  transformer runs at sequence length n_patches with batch b*patch_area;
* v1: pre-LN multi-head ViT blocks on the unfolded tokens, fold back,
  1x1 projection + kxk fusion conv over cat(residual, features), final
  1x1 expansion, mean pool;
* v2: separable linear attention — qkv is a 1x1 conv producing
  (1 + 2C) channels; the scalar query softmaxes over the PATCH axis,
  context = sum(key * scores), out = relu(value) * context — and
  GroupNorm(1) "2D layernorms" (per-sample normalization over all
  non-batch dims with per-channel affine), conv FFN, no fusion conv,
  width schedule 32/64/128/256/384/512 x width_multiplier through
  make_divisible.

The unfold path requires the feature map divisible by the patch size
(true for the stock 256/224 checkpoints); HF's bilinear-resize fallback
for odd sizes is refused loudly instead of silently resampling.
All 1x1 convs (incl. v2's qkv/out/ffn convs) are decomposable sites.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import nn


def make_divisible(value: float, divisor: int = 8,
                   min_value: Optional[int] = None) -> int:
    if min_value is None:
        min_value = divisor
    new_value = max(min_value, int(value + divisor / 2) // divisor * divisor)
    if new_value < 0.9 * value:
        new_value += divisor
    return int(new_value)


_ACTS = {
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "relu": jax.nn.relu,
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "relu6": lambda x: jnp.clip(x, 0.0, 6.0),
}


class ConvNormAct(nn.Module):
    """HF MobileViT(V2)ConvLayer: conv + optional BN + optional act."""

    convolution: nn.Conv2d
    normalization: Optional[nn.BatchNorm2d] = None
    act: Optional[str] = nn.static_field(default=None)

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        x = self.convolution(x, ctx)
        if self.normalization is not None:
            x = self.normalization(x, ctx)
        if self.act is not None:
            x = _ACTS[self.act](x)
        return x

    @staticmethod
    def create(key, cin, cout, k, stride=1, groups=1, bias=False,
               use_normalization=True, act: Optional[str] = "silu",
               dtype=jnp.float32) -> "ConvNormAct":
        return ConvNormAct(
            convolution=nn.Conv2d.create(
                key, cin, cout, (k, k), stride=stride, padding=(k - 1) // 2,
                groups=groups, use_bias=bias, dtype=dtype,
            ),
            normalization=(
                nn.BatchNorm2d.create(cout, eps=1e-5)
                if use_normalization else None
            ),
            act=act,
        )


class InvertedResidual(nn.Module):
    expand_1x1: ConvNormAct
    conv_3x3: ConvNormAct
    reduce_1x1: ConvNormAct
    use_residual: bool = nn.static_field(default=False)

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        h = self.reduce_1x1(self.conv_3x3(self.expand_1x1(x, ctx), ctx), ctx)
        return x + h if self.use_residual else h

    @staticmethod
    def create(key, cin, cout, stride, expand_ratio, act, dtype) -> "InvertedResidual":
        ks = jax.random.split(key, 3)
        exp = make_divisible(int(round(cin * expand_ratio)), 8)
        return InvertedResidual(
            expand_1x1=ConvNormAct.create(ks[0], cin, exp, 1, act=act,
                                          dtype=dtype),
            conv_3x3=ConvNormAct.create(ks[1], exp, exp, 3, stride=stride,
                                        groups=exp, act=act, dtype=dtype),
            reduce_1x1=ConvNormAct.create(ks[2], exp, cout, 1, act=None,
                                          dtype=dtype),
            use_residual=stride == 1 and cin == cout,
        )


class MobileNetStage(nn.Module):
    layer: tuple

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        for blk in self.layer:
            x = blk(x, ctx)
        return x

    @staticmethod
    def create(key, cin, cout, stride, num_stages, expand_ratio, act,
               dtype) -> "MobileNetStage":
        ks = jax.random.split(key, num_stages)
        layers = []
        for i in range(num_stages):
            layers.append(InvertedResidual.create(
                ks[i], cin if i == 0 else cout, cout,
                stride if i == 0 else 1, expand_ratio, act, dtype,
            ))
        return MobileNetStage(layer=tuple(layers))


def _unfold(x: jax.Array, p: int) -> tuple[jax.Array, tuple[int, int]]:
    """(b, H, W, c) -> (b*p*p, n_patches, c) with F.unfold's ordering:
    within-patch offset major over the batch, raster patch index."""
    b, hh, ww, c = x.shape
    if hh % p or ww % p:
        raise ValueError(
            f"feature map {hh}x{ww} not divisible by patch_size={p}; "
            "resize inputs (HF silently bilinear-resamples here)"
        )
    nh, nw = hh // p, ww // p
    x = x.reshape(b, nh, p, nw, p, c).transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(b * p * p, nh * nw, c), (nh, nw)


def _fold(t: jax.Array, p: int, grid: tuple[int, int]) -> jax.Array:
    nh, nw = grid
    bpp, _, c = t.shape
    b = bpp // (p * p)
    x = t.reshape(b, p, p, nh, nw, c).transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(b, nh * p, nw * p, c)


class ViTSelfAttention(nn.Module):
    query: nn.Linear
    key: nn.Linear
    value: nn.Linear
    n_heads: int = nn.static_field(default=4)

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        b, n, c = x.shape
        dh = c // self.n_heads

        def split(t):
            return t.reshape(b, n, self.n_heads, dh).transpose(0, 2, 1, 3)

        q, k, v = split(self.query(x, ctx)), split(self.key(x, ctx)), split(
            self.value(x, ctx)
        )
        attn = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
                jnp.asarray(dh, x.dtype)
            ),
            axis=-1,
        )
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        return out.transpose(0, 2, 1, 3).reshape(b, n, c)


class _Dense(nn.Module):
    dense: nn.Linear

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        return self.dense(x, ctx)


class _Attn(nn.Module):
    attention: ViTSelfAttention
    output: _Dense

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        return self.output(self.attention(x, ctx), ctx)


class ViTBlock(nn.Module):
    """HF MobileViTTransformerLayer (pre-LN, act from config)."""

    attention: _Attn
    intermediate: _Dense
    output: _Dense
    layernorm_before: nn.LayerNorm
    layernorm_after: nn.LayerNorm
    act: str = nn.static_field(default="silu")

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        x = x + self.attention(self.layernorm_before(x, ctx), ctx)
        h = _ACTS[self.act](self.intermediate(self.layernorm_after(x, ctx), ctx))
        return x + self.output.dense(h, ctx)


class MobileViTBlock(nn.Module):
    """HF MobileViTLayer: local convs + unfold -> transformer -> fold +
    projection + fusion."""

    conv_kxk: ConvNormAct
    conv_1x1: ConvNormAct
    transformer: MobileNetStage  # reuse: tuple under field "layer"
    layernorm: nn.LayerNorm
    conv_projection: ConvNormAct
    fusion: ConvNormAct
    downsampling_layer: Optional[InvertedResidual] = None
    patch_size: int = nn.static_field(default=2)

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        if self.downsampling_layer is not None:
            x = self.downsampling_layer(x, ctx)
        residual = x
        h = self.conv_1x1(self.conv_kxk(x, ctx), ctx)
        t, grid = _unfold(h, self.patch_size)
        for blk in self.transformer.layer:
            t = blk(t, ctx)
        t = self.layernorm(t, ctx)
        h = _fold(t, self.patch_size, grid)
        h = self.conv_projection(h, ctx)
        return self.fusion(jnp.concatenate([residual, h], axis=-1), ctx)


class MobileViT(nn.Module):
    """NHWC MobileViT v1 classifier; input (b, h, w, 3), logits out."""

    conv_stem: ConvNormAct
    layer: tuple
    conv_1x1_exp: ConvNormAct
    classifier: nn.Linear

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        x = self.conv_stem(x, ctx)
        for blk in self.layer:
            x = blk(x, ctx)
        x = self.conv_1x1_exp(x, ctx)
        return self.classifier(x.mean(axis=(1, 2)), ctx)

    @staticmethod
    def create(
        key: jax.Array,
        num_classes: int = 1000,
        neck_hidden_sizes: tuple = (16, 32, 64, 96, 128, 160, 640),
        hidden_sizes: tuple = (144, 192, 240),
        num_attention_heads: int = 4,
        mlp_ratio: float = 2.0,
        expand_ratio: float = 4.0,
        patch_size: int = 2,
        conv_kernel_size: int = 3,
        hidden_act: str = "silu",
        qkv_bias: bool = True,
        layer_norm_eps: float = 1e-5,
        dtype: Any = jnp.float32,
    ) -> "MobileViT":
        nh = neck_hidden_sizes
        keys = iter(jax.random.split(key, 128))

        def vit_stage(dim: int, depth: int) -> MobileNetStage:
            blocks = []
            for _ in range(depth):
                inter = int(dim * mlp_ratio)
                blocks.append(ViTBlock(
                    attention=_Attn(
                        attention=ViTSelfAttention(
                            query=nn.Linear.create(next(keys), dim, dim,
                                                   qkv_bias, dtype),
                            key=nn.Linear.create(next(keys), dim, dim,
                                                 qkv_bias, dtype),
                            value=nn.Linear.create(next(keys), dim, dim,
                                                   qkv_bias, dtype),
                            n_heads=num_attention_heads,
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
                    layernorm_before=nn.LayerNorm.create(
                        dim, eps=layer_norm_eps, dtype=dtype
                    ),
                    layernorm_after=nn.LayerNorm.create(
                        dim, eps=layer_norm_eps, dtype=dtype
                    ),
                    act=hidden_act,
                ))
            return MobileNetStage(layer=tuple(blocks))

        def vit_layer(cin, cout, dim, depth) -> MobileViTBlock:
            return MobileViTBlock(
                downsampling_layer=InvertedResidual.create(
                    next(keys), cin, cout, 2, expand_ratio, hidden_act, dtype
                ),
                conv_kxk=ConvNormAct.create(
                    next(keys), cout, cout, conv_kernel_size, act=hidden_act,
                    dtype=dtype,
                ),
                conv_1x1=ConvNormAct.create(
                    next(keys), cout, dim, 1, use_normalization=False,
                    act=None, dtype=dtype,
                ),
                transformer=vit_stage(dim, depth),
                layernorm=nn.LayerNorm.create(dim, eps=layer_norm_eps,
                                              dtype=dtype),
                conv_projection=ConvNormAct.create(
                    next(keys), dim, cout, 1, act=hidden_act, dtype=dtype
                ),
                fusion=ConvNormAct.create(
                    next(keys), 2 * cout, cout, conv_kernel_size,
                    act=hidden_act, dtype=dtype,
                ),
                patch_size=patch_size,
            )

        layers = (
            MobileNetStage.create(next(keys), nh[0], nh[1], 1, 1,
                                  expand_ratio, hidden_act, dtype),
            MobileNetStage.create(next(keys), nh[1], nh[2], 2, 3,
                                  expand_ratio, hidden_act, dtype),
            vit_layer(nh[2], nh[3], hidden_sizes[0], 2),
            vit_layer(nh[3], nh[4], hidden_sizes[1], 4),
            vit_layer(nh[4], nh[5], hidden_sizes[2], 3),
        )
        return MobileViT(
            conv_stem=ConvNormAct.create(next(keys), 3, nh[0], 3, stride=2,
                                         act=hidden_act, dtype=dtype),
            layer=layers,
            conv_1x1_exp=ConvNormAct.create(next(keys), nh[5], nh[6], 1,
                                            act=hidden_act, dtype=dtype),
            classifier=nn.Linear.create(next(keys), nh[6], num_classes, True,
                                        dtype),
        )


class SampleNorm(nn.Module):
    """torch GroupNorm(num_groups=1) on (b, C, pa, np): per-sample
    normalization over ALL non-batch dims with per-channel affine —
    here on the (b, pa, np, C) layout."""

    weight: jax.Array
    bias: jax.Array
    eps: float = nn.static_field(default=1e-5)

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=(1, 2, 3), keepdims=True)
        var = xf.var(axis=(1, 2, 3), keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * self.weight + self.bias).astype(x.dtype)

    @staticmethod
    def create(dim: int, eps: float = 1e-5, dtype=jnp.float32) -> "SampleNorm":
        return SampleNorm(weight=jnp.ones((dim,), dtype),
                          bias=jnp.zeros((dim,), dtype), eps=eps)


class _Conv1x1(nn.Module):
    convolution: nn.Conv2d

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        return self.convolution(x, ctx)


class LinearSelfAttention(nn.Module):
    """MobileViTV2 separable attention on the (b, pa, np, C) layout."""

    qkv_proj: _Conv1x1
    out_proj: _Conv1x1
    embed_dim: int = nn.static_field(default=64)

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        qkv = self.qkv_proj(x, ctx)
        q = qkv[..., :1]
        k = qkv[..., 1:1 + self.embed_dim]
        v = qkv[..., 1 + self.embed_dim:]
        scores = jax.nn.softmax(q, axis=2)  # over the patch axis
        context = jnp.sum(k * scores, axis=2, keepdims=True)
        return self.out_proj(jax.nn.relu(v) * context, ctx)


class _ConvFFN(nn.Module):
    conv1: _Conv1x1
    conv2: _Conv1x1
    act: str = nn.static_field(default="silu")

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        return self.conv2(_ACTS[self.act](self.conv1(x, ctx)), ctx)


class V2TransformerLayer(nn.Module):
    layernorm_before: SampleNorm
    attention: LinearSelfAttention
    layernorm_after: SampleNorm
    ffn: _ConvFFN

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        x = x + self.attention(self.layernorm_before(x, ctx), ctx)
        return x + self.ffn(self.layernorm_after(x, ctx), ctx)


class MobileViTV2Block(nn.Module):
    conv_kxk: ConvNormAct
    conv_1x1: ConvNormAct
    transformer: MobileNetStage
    layernorm: SampleNorm
    conv_projection: ConvNormAct
    downsampling_layer: Optional[InvertedResidual] = None
    patch_size: int = nn.static_field(default=2)

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        if self.downsampling_layer is not None:
            x = self.downsampling_layer(x, ctx)
        h = self.conv_1x1(self.conv_kxk(x, ctx), ctx)
        b, hh, ww, c = h.shape
        p = self.patch_size
        if hh % p or ww % p:
            raise ValueError(
                f"feature map {hh}x{ww} not divisible by patch_size={p}"
            )
        nh, nw = hh // p, ww // p
        # (b, pa, np, C) — F.unfold's (c, kh, kw) channel-major ordering
        t = h.reshape(b, nh, p, nw, p, c).transpose(0, 2, 4, 1, 3, 5)
        t = t.reshape(b, p * p, nh * nw, c)
        for blk in self.transformer.layer:
            t = blk(t, ctx)
        t = self.layernorm(t, ctx)
        h = t.reshape(b, p, p, nh, nw, c).transpose(0, 3, 1, 4, 2, 5)
        h = h.reshape(b, hh, ww, c)
        return self.conv_projection(h, ctx)


class MobileViTV2(nn.Module):
    """NHWC MobileViTV2 classifier; input (b, h, w, 3), logits out."""

    conv_stem: ConvNormAct
    layer: tuple
    classifier: nn.Linear

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        x = self.conv_stem(x, ctx)
        for blk in self.layer:
            x = blk(x, ctx)
        return self.classifier(x.mean(axis=(1, 2)), ctx)

    @staticmethod
    def create(
        key: jax.Array,
        num_classes: int = 1000,
        width_multiplier: float = 1.0,
        base_attn_unit_dims: tuple = (128, 192, 256),
        n_attn_blocks: tuple = (2, 4, 3),
        ffn_multiplier: float = 2.0,
        expand_ratio: float = 2.0,
        patch_size: int = 2,
        conv_kernel_size: int = 3,
        hidden_act: str = "swish",
        layer_norm_eps: float = 1e-5,
        dtype: Any = jnp.float32,
    ) -> "MobileViTV2":
        w = width_multiplier
        keys = iter(jax.random.split(key, 64))
        d0 = make_divisible(min(max(32 * w, 16), 64), 8, min_value=16)
        d1 = make_divisible(64 * w, 16)
        d2 = make_divisible(128 * w, 8)
        d3 = make_divisible(256 * w, 8)
        d4 = make_divisible(384 * w, 8)
        d5 = make_divisible(512 * w, 8)

        def v2_layer(cin, cout, attn_dim, depth) -> MobileViTV2Block:
            blocks = []
            ffn_dim = int((ffn_multiplier * attn_dim) // 16 * 16)
            for _ in range(depth):
                blocks.append(V2TransformerLayer(
                    layernorm_before=SampleNorm.create(
                        attn_dim, eps=layer_norm_eps, dtype=dtype
                    ),
                    attention=LinearSelfAttention(
                        qkv_proj=_Conv1x1(convolution=nn.Conv2d.create(
                            next(keys), attn_dim, 1 + 2 * attn_dim, (1, 1),
                            use_bias=True, dtype=dtype,
                        )),
                        out_proj=_Conv1x1(convolution=nn.Conv2d.create(
                            next(keys), attn_dim, attn_dim, (1, 1),
                            use_bias=True, dtype=dtype,
                        )),
                        embed_dim=attn_dim,
                    ),
                    layernorm_after=SampleNorm.create(
                        attn_dim, eps=layer_norm_eps, dtype=dtype
                    ),
                    ffn=_ConvFFN(
                        conv1=_Conv1x1(convolution=nn.Conv2d.create(
                            next(keys), attn_dim, ffn_dim, (1, 1),
                            use_bias=True, dtype=dtype,
                        )),
                        conv2=_Conv1x1(convolution=nn.Conv2d.create(
                            next(keys), ffn_dim, attn_dim, (1, 1),
                            use_bias=True, dtype=dtype,
                        )),
                        act=hidden_act,
                    ),
                ))
            return MobileViTV2Block(
                downsampling_layer=InvertedResidual.create(
                    next(keys), cin, cout, 2, expand_ratio, hidden_act, dtype
                ),
                conv_kxk=ConvNormAct.create(
                    next(keys), cout, cout, conv_kernel_size, groups=cout,
                    act=hidden_act, dtype=dtype,
                ),
                conv_1x1=ConvNormAct.create(
                    next(keys), cout, attn_dim, 1, use_normalization=False,
                    act=None, dtype=dtype,
                ),
                transformer=MobileNetStage(layer=tuple(blocks)),
                layernorm=SampleNorm.create(attn_dim, eps=layer_norm_eps,
                                            dtype=dtype),
                conv_projection=ConvNormAct.create(
                    next(keys), attn_dim, cout, 1, act=None, dtype=dtype
                ),
                patch_size=patch_size,
            )

        attn = [
            make_divisible(d * w, 8) for d in base_attn_unit_dims
        ]
        layers = (
            MobileNetStage.create(next(keys), d0, d1, 1, 1, expand_ratio,
                                  hidden_act, dtype),
            MobileNetStage.create(next(keys), d1, d2, 2, 2, expand_ratio,
                                  hidden_act, dtype),
            v2_layer(d2, d3, attn[0], n_attn_blocks[0]),
            v2_layer(d3, d4, attn[1], n_attn_blocks[1]),
            v2_layer(d4, d5, attn[2], n_attn_blocks[2]),
        )
        return MobileViTV2(
            conv_stem=ConvNormAct.create(next(keys), 3, d0, 3, stride=2,
                                         act=hidden_act, dtype=dtype),
            layer=layers,
            classifier=nn.Linear.create(next(keys), d5, num_classes, True,
                                        dtype),
        )


def _translate(sd: dict[str, np.ndarray], prefix: str) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        if k.startswith(prefix):
            k = k[len(prefix):]
        if k.startswith("encoder.layer."):
            k = k[len("encoder."):]
        out[k] = v
    return out


def translate_hf_mobilevit_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF MobileViTForImageClassification -> native torch-layout keys."""
    return _translate(sd, "mobilevit.")


def translate_hf_mobilevitv2_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF MobileViTV2ForImageClassification -> native torch-layout keys."""
    return _translate(sd, "mobilevitv2.")
