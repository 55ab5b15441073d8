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
