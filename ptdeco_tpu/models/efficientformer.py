"""EfficientFormerV2 family (hybrid conv/attention), NHWC, TPU-native.

The reference's lockd/wrap/decompose/config tests all run on timm's
``efficientformerv2_s0`` (/root/reference/tests/test_wrap_torchvision_timm.py:32,
test_decompose_torchvision_timm.py:25, test_losses_torchvision_timm.py:25,
test_config_torchvision_timm.py:25) — a hybrid architecture that mixes
grouped depthwise convs (lockd must skip them), 1x1 pointwise convs
(dwain/falor/lockd sites), and plain Linears.  This is the native JAX
implementation of that family:

  * stem: two 3x3 stride-2 conv+BN+GELU
  * 4 stages; every block is a conv-FFN (1x1 expand -> depthwise 3x3 ->
    1x1 project, all BN-normalized) with per-channel layer scale
  * the last ``num_vit`` blocks of the final stage prepend an Attention4D
    token mixer: LeViT-style learned attention biases over the (static)
    7x7 grid, talking-head 1x1 convs on the attention logits, a depthwise
    "local v" enhancement, and a 1x1 projection
  * conv+BN stride-2 downsample between stages
  * BN final norm, mean pool, twin classifier heads averaged (the
    distillation head is part of the architecture)

TPU-first notes: the attention bias gather is a constant-index take folded
at compile time, every shape is static (resolution fixed at create time),
and all the FLOPs are 1x1 convs == batched matmuls on the MXU.  The
simplification vs timm: inter-stage downsampling is always conv+BN (timm
optionally uses an attention-downsample into the final stage); the
decomposition surface is unaffected.

Decomposition sites: every ``fc1.conv``/``fc2.conv`` pointwise conv, the
attention ``q/k/v/proj`` 1x1 convs, and the two head Linears.  Depthwise
(grouped) convs are correctly NOT sites, which is exactly what the
reference's efficientformer tests exercise.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import nn

__all__ = ["EfficientFormerV2", "efficientformerv2_s0", "efficientformerv2_s1"]


def _gelu(x):
    # torch/timm nn.GELU is erf-exact; jax.nn.gelu defaults to the tanh
    # approximation, which would break pretrained-weight numerics parity
    return jax.nn.gelu(x, approximate=False)


class ConvNorm(nn.Module):
    """1x1/3x3 conv + BatchNorm (torch-style 'conv'/'bn' children)."""

    conv: nn.Conv2d
    bn: nn.BatchNorm2d

    def __call__(self, x, ctx=None):
        return self.bn(self.conv(x, ctx), ctx)

    @staticmethod
    def create(key, cin, cout, k, sid, stride=1, padding=0, groups=1):
        cn = ConvNorm(
            conv=nn.Conv2d.create(
                key, cin, cout, k, stride=stride, padding=padding,
                groups=groups, use_bias=False,
            ),
            bn=nn.BatchNorm2d.create(cout, stat_id=sid[0]),
        )
        sid[0] += 1
        return cn


class ConvMlp(nn.Module):
    """EfficientFormerV2 FFN: 1x1 expand -> depthwise 3x3 -> 1x1 project
    (all conv+BN, GELU between).  fc1/fc2 are pointwise == decomposable."""

    fc1: ConvNorm
    mid: ConvNorm  # depthwise, grouped -> never a decomposition site
    fc2: ConvNorm

    def __call__(self, x, ctx=None):
        x = _gelu(self.fc1(x, ctx))
        x = _gelu(self.mid(x, ctx))
        return self.fc2(x, ctx)

    @staticmethod
    def create(key, dim, hidden, sid):
        ks = jax.random.split(key, 3)
        return ConvMlp(
            fc1=ConvNorm.create(ks[0], dim, hidden, 1, sid),
            mid=ConvNorm.create(
                ks[1], hidden, hidden, 3, sid, padding=1, groups=hidden
            ),
            fc2=ConvNorm.create(ks[2], hidden, dim, 1, sid),
        )


def _attention_bias_index(res: int) -> np.ndarray:
    """LeViT-style (N, N) table of |offset| ids over a res x res grid."""
    pts = [(i, j) for i in range(res) for j in range(res)]
    idx = np.empty((len(pts), len(pts)), np.int32)
    for a, p in enumerate(pts):
        for b, q in enumerate(pts):
            off = (abs(p[0] - q[0]), abs(p[1] - q[1]))
            idx[a, b] = off[0] * res + off[1]
    return idx


class Attention4D(nn.Module):
    """Final-stage token mixer: attention over the (static) feature grid
    with learned per-head position biases, talking-head mixing, and a
    depthwise local enhancement on v."""

    q: ConvNorm
    k: ConvNorm
    v: ConvNorm
    v_local: ConvNorm
    talking_head1: nn.Conv2d  # 1x1 over the head axis, pre-softmax
    talking_head2: nn.Conv2d  # 1x1 over the head axis, post-softmax
    proj: ConvNorm
    attention_biases: jax.Array  # (heads, res*res) learned
    bias_idx: jax.Array  # (N, N) int32 constant buffer
    n_heads: int = nn.static_field(default=8)
    _buffer_fields = ("bias_idx",)
    key_dim: int = nn.static_field(default=32)

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        b, h, w, _ = x.shape
        n = h * w
        nh, kd = self.n_heads, self.key_dim
        q = self.q(x, ctx).reshape(b, n, nh, kd).transpose(0, 2, 1, 3)
        k = self.k(x, ctx).reshape(b, n, nh, kd).transpose(0, 2, 3, 1)
        vs = self.v(x, ctx)  # (b, h, w, nh*d) spatial, for the local branch
        d = vs.shape[-1] // nh
        v = vs.reshape(b, n, nh, d).transpose(0, 2, 1, 3)

        attn = (
            jnp.einsum("bhqc,bhck->bhqk", q, k, preferred_element_type=jnp.float32)
            * (kd ** -0.5)
        )
        bias = self.attention_biases.astype(jnp.float32)[:, self.bias_idx]
        attn = attn + bias[None]
        # talking heads: 1x1 convs across the head axis (NHWC: heads last).
        # The convs run in the model's compute dtype (bf16 under mixed
        # precision; x.dtype, NOT a reach into .kernel — the conv may be
        # lockd-wrapped); the softmax stays f32.
        th = x.dtype
        attn = attn.transpose(0, 2, 3, 1)  # (b, n, n, heads)
        attn = self.talking_head1(attn.astype(th), ctx)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=2)
        attn = self.talking_head2(attn.astype(th), ctx)
        attn = attn.transpose(0, 3, 1, 2).astype(x.dtype)

        out = jnp.einsum("bhqk,bhkd->bqhd", attn, v).reshape(b, h, w, nh * d)
        out = out + self.v_local(vs, ctx)
        return self.proj(_gelu(out), ctx)

    @staticmethod
    def create(key, dim, res, sid, n_heads=8, key_dim=32, attn_ratio=4):
        ks = jax.random.split(key, 7)
        d = int(attn_ratio * key_dim)
        dh = d * n_heads
        return Attention4D(
            q=ConvNorm.create(ks[0], dim, n_heads * key_dim, 1, sid),
            k=ConvNorm.create(ks[1], dim, n_heads * key_dim, 1, sid),
            v=ConvNorm.create(ks[2], dim, dh, 1, sid),
            v_local=ConvNorm.create(ks[3], dh, dh, 3, sid, padding=1, groups=dh),
            talking_head1=nn.Conv2d.create(ks[4], n_heads, n_heads, 1),
            talking_head2=nn.Conv2d.create(ks[5], n_heads, n_heads, 1),
            proj=ConvNorm.create(ks[6], dh, dim, 1, sid),
            attention_biases=jnp.zeros((n_heads, res * res), jnp.float32),
            bias_idx=jnp.asarray(_attention_bias_index(res)),
            n_heads=n_heads,
            key_dim=key_dim,
        )


class EFBlock(nn.Module):
    """FFN-only block (stages 0-1 and the non-vit tail of later stages)."""

    mlp: ConvMlp
    ls2: jax.Array  # (C,) layer scale

    def __call__(self, x, ctx=None):
        return x + self.ls2 * self.mlp(x, ctx)

    @staticmethod
    def create(key, dim, ratio, sid, ls_init=1e-5):
        return EFBlock(
            mlp=ConvMlp.create(key, dim, int(dim * ratio), sid),
            ls2=jnp.full((dim,), ls_init, jnp.float32),
        )


class EFAttnBlock(nn.Module):
    """Attention + FFN block (the last num_vit blocks of the final stage)."""

    token_mixer: Attention4D
    mlp: ConvMlp
    ls1: jax.Array
    ls2: jax.Array

    def __call__(self, x, ctx=None):
        x = x + self.ls1 * self.token_mixer(x, ctx)
        return x + self.ls2 * self.mlp(x, ctx)

    @staticmethod
    def create(key, dim, ratio, res, sid, ls_init=1e-5):
        k1, k2 = jax.random.split(key)
        return EFAttnBlock(
            token_mixer=Attention4D.create(k1, dim, res, sid),
            mlp=ConvMlp.create(k2, dim, int(dim * ratio), sid),
            ls1=jnp.full((dim,), ls_init, jnp.float32),
            ls2=jnp.full((dim,), ls_init, jnp.float32),
        )


class EFStage(nn.Module):
    downsample: Optional[ConvNorm]  # stride-2 conv+BN into this stage
    blocks: nn.Sequential

    def __call__(self, x, ctx=None):
        if self.downsample is not None:
            x = self.downsample(x, ctx)
        return self.blocks(x, ctx)


class EfficientFormerV2(nn.Module):
    stem0: ConvNorm
    stem1: ConvNorm
    stages: nn.Sequential
    norm: nn.BatchNorm2d
    head: nn.Linear
    head_dist: nn.Linear

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        x = _gelu(self.stem0(x, ctx))
        x = _gelu(self.stem1(x, ctx))
        x = self.stages(x, ctx)
        x = self.norm(x, ctx)
        x = jnp.mean(x, axis=(1, 2))
        return (self.head(x, ctx) + self.head_dist(x, ctx)) / 2.0

    @staticmethod
    def create(
        key: jax.Array,
        image_size: int = 224,
        dims: tuple = (32, 48, 96, 176),
        depths: tuple = (2, 2, 6, 4),
        ratios: tuple = ((4, 4), (4, 4), (4, 3, 3, 3, 4, 4), (4, 3, 3, 4)),
        num_vit: int = 2,
        num_classes: int = 1000,
    ) -> "EfficientFormerV2":
        if image_size % 32:
            raise ValueError(f"image_size {image_size} must be divisible by 32")
        n_stage = len(dims)
        keys = jax.random.split(key, 4 + n_stage + sum(depths))
        ki = iter(range(len(keys)))
        sid = [0]
        stem0 = ConvNorm.create(
            keys[next(ki)], 3, dims[0] // 2, 3, sid, stride=2, padding=1
        )
        stem1 = ConvNorm.create(
            keys[next(ki)], dims[0] // 2, dims[0], 3, sid, stride=2, padding=1
        )
        res = image_size // 4
        stages = []
        for s in range(n_stage):
            down = None
            if s > 0:
                down = ConvNorm.create(
                    keys[next(ki)], dims[s - 1], dims[s], 3, sid,
                    stride=2, padding=1,
                )
                res //= 2
            blocks = []
            for b in range(depths[s]):
                ratio = ratios[s][b] if b < len(ratios[s]) else 4
                if s == n_stage - 1 and b >= depths[s] - num_vit:
                    blocks.append(
                        EFAttnBlock.create(
                            keys[next(ki)], dims[s], ratio, res, sid
                        )
                    )
                else:
                    blocks.append(
                        EFBlock.create(keys[next(ki)], dims[s], ratio, sid)
                    )
            stages.append(
                EFStage(downsample=down, blocks=nn.Sequential(layers=tuple(blocks)))
            )
        norm = nn.BatchNorm2d.create(dims[-1], stat_id=sid[0])
        sid[0] += 1
        return EfficientFormerV2(
            stem0=stem0,
            stem1=stem1,
            stages=nn.Sequential(layers=tuple(stages)),
            norm=norm,
            head=nn.Linear.create(keys[next(ki)], dims[-1], num_classes),
            head_dist=nn.Linear.create(keys[next(ki)], dims[-1], num_classes),
        )


def efficientformerv2_s0(key, num_classes=1000, image_size=224):
    """efficientformerv2_s0-class model (the reference's timm test model)."""
    return EfficientFormerV2.create(
        key,
        image_size=image_size,
        dims=(32, 48, 96, 176),
        depths=(2, 2, 6, 4),
        ratios=((4, 4), (4, 4), (4, 3, 3, 3, 4, 4), (4, 3, 3, 4)),
        num_vit=2,
        num_classes=num_classes,
    )


def efficientformerv2_s1(key, num_classes=1000, image_size=224):
    return EfficientFormerV2.create(
        key,
        image_size=image_size,
        dims=(32, 48, 120, 224),
        depths=(3, 3, 9, 6),
        ratios=(
            (4, 4, 4),
            (4, 4, 4),
            (4, 4, 3, 3, 3, 3, 4, 4, 4),
            (4, 4, 3, 3, 4, 4),
        ),
        num_vit=2,
        num_classes=num_classes,
    )


# ---------------------------------------------------------------------------
# EfficientFormer V1 (HF EfficientFormerForImageClassification, deprecated
# namespace in transformers >= 4.40).  PoolFormer-style Meta4D conv stages
# followed by a single token (Meta3D) stage with LeViT-style learned
# relative attention biases; mean-pooled LN head, optionally averaged with
# the distillation head (WithTeacher).
# ---------------------------------------------------------------------------


class V1ConvStem(nn.Module):
    convolution1: nn.Conv2d
    batchnorm_before: nn.BatchNorm2d
    convolution2: nn.Conv2d
    batchnorm_after: nn.BatchNorm2d

    def __call__(self, x, ctx=None):
        x = jax.nn.relu(self.batchnorm_before(self.convolution1(x, ctx), ctx))
        return jax.nn.relu(self.batchnorm_after(self.convolution2(x, ctx), ctx))


class V1ConvMlp(nn.Module):
    convolution1: nn.Conv2d
    batchnorm_before: nn.BatchNorm2d
    convolution2: nn.Conv2d
    batchnorm_after: nn.BatchNorm2d

    def __call__(self, x, ctx=None):
        h = _gelu(self.batchnorm_before(self.convolution1(x, ctx), ctx))
        return self.batchnorm_after(self.convolution2(h, ctx), ctx)


class V1Meta4D(nn.Module):
    """avgpool-minus-identity token mixer + conv MLP, layer-scaled."""

    mlp: V1ConvMlp
    layer_scale_1: Optional[jax.Array] = None
    layer_scale_2: Optional[jax.Array] = None
    pool_size: int = nn.static_field(default=3)

    def __call__(self, x, ctx=None):
        from .poolformer import _avg_pool_nopad

        mix = _avg_pool_nopad(x, self.pool_size) - x
        if self.layer_scale_1 is not None:
            x = x + self.layer_scale_1 * mix
            return x + self.layer_scale_2 * self.mlp(x, ctx)
        x = x + mix
        return x + self.mlp(x, ctx)


class V1SelfAttention(nn.Module):
    """LeViT-style fused-qkv attention with learned relative biases
    (HF EfficientFormerSelfAttention)."""

    qkv: nn.Linear
    projection: nn.Linear
    attention_biases: jax.Array
    bias_idxs: tuple = nn.static_field(default=())
    n_heads: int = nn.static_field(default=8)
    key_dim: int = nn.static_field(default=32)
    attention_ratio: int = nn.static_field(default=4)

    def __call__(self, x, ctx=None):
        b, n, _ = x.shape
        kd, nh = self.key_dim, self.n_heads
        ekd = int(self.attention_ratio * kd)
        qkv = self.qkv(x, ctx).reshape(b, n, nh, -1)
        q = qkv[..., :kd].transpose(0, 2, 1, 3)
        k = qkv[..., kd:2 * kd].transpose(0, 2, 1, 3)
        v = qkv[..., 2 * kd:].transpose(0, 2, 1, 3)
        bias = self.attention_biases[:, jnp.asarray(np.array(self.bias_idxs))]
        attn = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q, k) * (kd ** -0.5) + bias,
            axis=-1,
        )
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, nh * ekd)
        return self.projection(out, ctx)


class V1DenseMlp(nn.Module):
    linear_in: nn.Linear
    linear_out: nn.Linear

    def __call__(self, x, ctx=None):
        return self.linear_out(_gelu(self.linear_in(x, ctx)), ctx)


class V1Meta3D(nn.Module):
    token_mixer: V1SelfAttention
    layernorm1: nn.LayerNorm
    layernorm2: nn.LayerNorm
    mlp: V1DenseMlp
    layer_scale_1: Optional[jax.Array] = None
    layer_scale_2: Optional[jax.Array] = None

    def __call__(self, x, ctx=None):
        h = self.token_mixer(self.layernorm1(x, ctx), ctx)
        if self.layer_scale_1 is not None:
            x = x + self.layer_scale_1 * h
            return x + self.layer_scale_2 * self.mlp(self.layernorm2(x, ctx), ctx)
        x = x + h
        return x + self.mlp(self.layernorm2(x, ctx), ctx)


class V1Blocks(nn.Module):
    blocks: tuple

    def __call__(self, x, ctx=None):
        for blk in self.blocks:
            x = blk(x, ctx)
        return x


class V1Downsample(nn.Module):
    projection: nn.Conv2d
    norm: nn.BatchNorm2d

    def __call__(self, x, ctx=None):
        return self.norm(self.projection(x, ctx), ctx)


class V1IntermediateStage(nn.Module):
    meta4D_layers: V1Blocks

    def __call__(self, x, ctx=None):
        return self.meta4D_layers(x, ctx)


class V1LastStage(nn.Module):
    meta4D_layers: V1Blocks
    meta3D_layers: V1Blocks

    def __call__(self, x, ctx=None):
        x = self.meta4D_layers(x, ctx)
        x = x.reshape(x.shape[0], -1, x.shape[-1])
        return self.meta3D_layers(x, ctx)


class EfficientFormerV1(nn.Module):
    """NHWC EfficientFormer v1 classifier; input (b, h, w, 3)."""

    patch_embed: V1ConvStem
    intermediate_stages: tuple
    last_stage: V1LastStage
    layernorm: nn.LayerNorm
    classifier: nn.Linear
    distillation_classifier: Optional[nn.Linear] = None

    def __call__(self, x, ctx=None):
        x = self.patch_embed(x, ctx)
        for stage in self.intermediate_stages:
            x = stage(x, ctx)
        t = self.layernorm(self.last_stage(x, ctx), ctx)
        pooled = t.mean(axis=-2)
        logits = self.classifier(pooled, ctx)
        if self.distillation_classifier is not None:
            logits = (logits + self.distillation_classifier(pooled, ctx)) / 2
        return logits

    @staticmethod
    def create(
        key: jax.Array,
        num_classes: int = 1000,
        hidden_sizes: tuple = (48, 96, 224, 448),
        depths: tuple = (3, 2, 6, 4),
        downsamples: tuple = (True, True, True, True),
        num_attention_heads: int = 8,
        key_dim: int = 32,
        attention_ratio: int = 4,
        resolution: int = 7,
        num_meta3d_blocks: int = 1,
        mlp_expansion_ratio: float = 4.0,
        pool_size: int = 3,
        use_layer_scale: bool = True,
        layer_scale_init_value: float = 1e-5,
        downsample_patch_size: int = 3,
        downsample_stride: int = 2,
        downsample_pad: int = 1,
        layer_norm_eps: float = 1e-12,
        bn_eps: float = 1e-5,
        distillation: bool = True,
        dtype=jnp.float32,
    ) -> "EfficientFormerV1":
        from .levit import _offset_table

        keys = iter(jax.random.split(key, 8 * sum(depths) + 16))

        def ls(dim):
            return (
                layer_scale_init_value * jnp.ones((dim,), dtype)
                if use_layer_scale else None
            )

        def meta4d_blocks(dim, n):
            return V1Blocks(blocks=tuple(
                V1Meta4D(
                    mlp=V1ConvMlp(
                        convolution1=nn.Conv2d.create(
                            next(keys), dim, int(dim * mlp_expansion_ratio),
                            (1, 1), dtype=dtype,
                        ),
                        batchnorm_before=nn.BatchNorm2d.create(
                            int(dim * mlp_expansion_ratio), eps=bn_eps
                        ),
                        convolution2=nn.Conv2d.create(
                            next(keys), int(dim * mlp_expansion_ratio), dim,
                            (1, 1), dtype=dtype,
                        ),
                        batchnorm_after=nn.BatchNorm2d.create(dim, eps=bn_eps),
                    ),
                    layer_scale_1=ls(dim),
                    layer_scale_2=ls(dim),
                    pool_size=pool_size,
                )
                for _ in range(n)
            ))

        n_inter = len(depths) - 1
        inter = []
        for i in range(n_inter):
            inter.append(V1IntermediateStage(
                meta4D_layers=meta4d_blocks(hidden_sizes[i], depths[i])
            ))
            if downsamples[i] or hidden_sizes[i] != hidden_sizes[i + 1]:
                inter.append(V1Downsample(
                    projection=nn.Conv2d.create(
                        next(keys), hidden_sizes[i], hidden_sizes[i + 1],
                        (downsample_patch_size, downsample_patch_size),
                        stride=downsample_stride, padding=downsample_pad,
                        dtype=dtype,
                    ),
                    norm=nn.BatchNorm2d.create(hidden_sizes[i + 1],
                                               eps=bn_eps),
                ))
        dim = hidden_sizes[-1]
        idxs = _offset_table(resolution, resolution, 1)
        ekd = int(attention_ratio * key_dim)
        meta3d = tuple(
            V1Meta3D(
                token_mixer=V1SelfAttention(
                    qkv=nn.Linear.create(
                        next(keys), dim,
                        (2 * key_dim + ekd) * num_attention_heads, True,
                        dtype,
                    ),
                    projection=nn.Linear.create(
                        next(keys), ekd * num_attention_heads, dim, True,
                        dtype,
                    ),
                    attention_biases=jnp.zeros(
                        (num_attention_heads, int(idxs.max()) + 1), dtype
                    ),
                    bias_idxs=tuple(map(tuple, idxs.tolist())),
                    n_heads=num_attention_heads,
                    key_dim=key_dim,
                    attention_ratio=attention_ratio,
                ),
                layernorm1=nn.LayerNorm.create(dim, eps=layer_norm_eps,
                                               dtype=dtype),
                layernorm2=nn.LayerNorm.create(dim, eps=layer_norm_eps,
                                               dtype=dtype),
                mlp=V1DenseMlp(
                    linear_in=nn.Linear.create(
                        next(keys), dim, int(dim * mlp_expansion_ratio),
                        True, dtype,
                    ),
                    linear_out=nn.Linear.create(
                        next(keys), int(dim * mlp_expansion_ratio), dim,
                        True, dtype,
                    ),
                ),
                layer_scale_1=ls(dim),
                layer_scale_2=ls(dim),
            )
            for _ in range(num_meta3d_blocks)
        )
        return EfficientFormerV1(
            patch_embed=V1ConvStem(
                convolution1=nn.Conv2d.create(
                    next(keys), 3, hidden_sizes[0] // 2, (3, 3), stride=2,
                    padding=1, dtype=dtype,
                ),
                batchnorm_before=nn.BatchNorm2d.create(hidden_sizes[0] // 2,
                                                       eps=bn_eps),
                convolution2=nn.Conv2d.create(
                    next(keys), hidden_sizes[0] // 2, hidden_sizes[0], (3, 3),
                    stride=2, padding=1, dtype=dtype,
                ),
                batchnorm_after=nn.BatchNorm2d.create(hidden_sizes[0],
                                                      eps=bn_eps),
            ),
            intermediate_stages=tuple(inter),
            last_stage=V1LastStage(
                meta4D_layers=meta4d_blocks(
                    dim, depths[-1] - num_meta3d_blocks
                ),
                meta3D_layers=V1Blocks(blocks=meta3d),
            ),
            layernorm=nn.LayerNorm.create(dim, eps=layer_norm_eps,
                                          dtype=dtype),
            classifier=nn.Linear.create(next(keys), dim, num_classes, True,
                                        dtype),
            distillation_classifier=(
                nn.Linear.create(next(keys), dim, num_classes, True, dtype)
                if distillation else None
            ),
        )


def translate_timm_efficientformerv2_state_dict(sd: dict) -> dict:
    """timm ``efficientformerv2_*`` checkpoint keys -> native torch-layout
    keys (VERDICT r3 #7 / reference
    examples_config/decompose_lockd_efficientformerv2_s0.yaml, whose
    builder loads any timm model via
    /root/reference/examples/trainer_vision/builder.py:134-144).

    IMPORTANT: timm is absent from this offline image, so this mapping is
    derived from the upstream naming conventions (timm
    ``efficientformer_v2.py`` and the snap-research original) rather than
    verified against a live checkpoint; ``tests/test_timm_bridge.py``
    skips without timm and pins logits parity in any timm-bearing
    environment — if a rename drifted, that test fails naming the keys.
    ``aux/timm_bridge_manifest.py`` emits the full expected-key manifest
    for offline diffing.

    Handled renames (native <- timm, with snap-research alternates):
      * ``stem0.* / stem1.*``       <- ``stem.conv1.* / stem.conv2.*``
      * ``stem0.conv|bn / stem1.conv|bn`` <- ``patch_embed.{0,1,3,4}``
        (the snap-research original's stem Sequential: conv,bn,act,conv,bn)
      * ``...downsample.conv|bn``   <- ``...downsample.conv.conv|conv.bn``
      * ``...ls1 / ls2``            <- ``...layer_scale_1/2`` ((C,1,1)
        flattened) or ``...ls1.gamma / ls2.gamma``
      * ``...token_mixer.proj.conv|bn`` <- ``...proj.1.conv|1.bn`` (the
        act layer is proj.0) or original ``...proj.1 / proj.2``
      * ``...token_mixer.{q,k,v,v_local}.conv|bn`` <- same, or original
        Sequential spellings ``{q,k,v,v_local}.0 / .1``
      * ``attention_biases`` 1:1 (the unique-|offset| id order equals the
        dense (dx*res+dy) order used natively); ``attention_bias_idxs``
        buffers dropped.

    Refused loudly: checkpoints with ``downsample.attn.*`` keys (timm's
    Attention4DDownsample transition), which the native graph does not
    implement — a silent skip would corrupt the stage boundary."""
    import re

    attn_down = sorted(
        k for k in sd if re.search(r"downsample\.attn\.", k)
    )
    if attn_down:
        raise NotImplementedError(
            "this efficientformerv2 checkpoint uses an attention "
            f"downsample ({attn_down[:3]}...); the native graph only "
            "implements the conv+BN stage transition — see "
            "models/efficientformer.py docstring"
        )
    out: dict = {}
    for k, v in sd.items():
        if k.endswith(("num_batches_tracked", "attention_bias_idxs")):
            continue
        k = k.replace("stem.conv1.", "stem0.").replace(
            "stem.conv2.", "stem1."
        )
        # snap-research original stem: Sequential(conv, bn, act, conv, bn)
        # (ADVICE r4 medium: these keys sniffed the translator but had no
        # rule, so the stem silently stayed randomly initialized)
        k = k.replace("patch_embed.0.", "stem0.conv.")
        k = k.replace("patch_embed.1.", "stem0.bn.")
        k = k.replace("patch_embed.3.", "stem1.conv.")
        k = k.replace("patch_embed.4.", "stem1.bn.")
        k = re.sub(r"downsample\.conv\.(conv|bn)\.", r"downsample.\1.", k)
        # layer scales: timm LayerScale2d (.gamma) or original parameter
        k = re.sub(r"\.ls([12])\.gamma$", r".ls\1", k)
        if re.search(r"\.layer_scale_([12])$", k):
            k = re.sub(r"\.layer_scale_([12])$", r".ls\1", k)
        if re.search(r"\.ls[12]$", k) and getattr(v, "ndim", 1) > 1:
            v = v.reshape(-1)
        # attention proj: Sequential(act, ConvNorm) / (act, conv, bn)
        k = re.sub(
            r"(token_mixer\.proj)\.1\.(conv|bn)\.", r"\1.\2.", k
        )
        k = re.sub(r"(token_mixer\.proj)\.1\.", r"\1.conv.", k)
        k = re.sub(r"(token_mixer\.proj)\.2\.", r"\1.bn.", k)
        # q/k/v/v_local as plain Sequentials (snap-research original)
        k = re.sub(
            r"(token_mixer\.(?:q|k|v|v_local))\.0\.", r"\1.conv.", k
        )
        k = re.sub(
            r"(token_mixer\.(?:q|k|v|v_local))\.1\.", r"\1.bn.", k
        )
        out[k] = v
    return out


def translate_hf_efficientformer_v1_state_dict(sd: dict) -> dict:
    """HF EfficientFormerForImageClassification(WithTeacher) -> native
    torch-layout keys: strip ``efficientformer.``/``encoder.``, drop
    buffers, (dim,1,1)/(1,1,dim) layer scales flatten to (dim,)."""
    out: dict = {}
    for k, v in sd.items():
        if k.endswith(("num_batches_tracked", "attention_bias_idxs")):
            continue
        if k.startswith("efficientformer."):
            k = k[len("efficientformer."):]
        if k.startswith("encoder."):
            k = k[len("encoder."):]
        if "layer_scale" in k and getattr(v, "ndim", 1) > 1:
            v = v.reshape(-1)
        out[k] = v
    return out
