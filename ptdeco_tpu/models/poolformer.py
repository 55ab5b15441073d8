"""PoolFormer (MetaFormer with average-pooling token mixers), NHWC.

Reference consumption analogue: timm/HF poolformer checkpoints through
the reference's generic vision builder (trainer_vision/builder.py:
134-144).  Mirrors HF ``PoolFormerForImageClassification``:

* per-stage overlapping conv patch embeddings (k/s/p from config lists);
* blocks: GroupNorm(1) -> [avgpool(3, s1, count_include_pad=False) - x]
  -> layer_scale_1 residual, then GroupNorm(1) -> conv1x1 -> gelu ->
  conv1x1 -> layer_scale_2 residual;
* head: GroupNorm(1) -> global mean -> Linear.

The channel MLP is a pair of 1x1 convs — both ``nn.Conv2d`` sites the
decomposition engines factor like any conv1x1."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import nn


def _group_norm1(x: jax.Array, scale, offset, eps=1e-5) -> jax.Array:
    """GroupNorm(num_groups=1) over NHWC: normalize over (H, W, C)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2, 3), keepdims=True)
    var = jnp.var(xf, axis=(1, 2, 3), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + offset).astype(x.dtype)


def _avg_pool_nopad(x: jax.Array, k: int) -> jax.Array:
    """3x3 stride-1 average pool with count_include_pad=False: the sum
    window divided by the per-position VALID-element count."""
    pad = k // 2
    summed = jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add, (1, k, k, 1), (1, 1, 1, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )
    ones = jnp.ones((1,) + x.shape[1:3] + (1,), jnp.float32)
    count = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, k, k, 1), (1, 1, 1, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )
    return (summed / count).astype(x.dtype)


class GroupNorm1(nn.Module):
    weight: jax.Array
    bias: jax.Array

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        return _group_norm1(x, self.weight, self.bias)

    @staticmethod
    def create(dim: int, dtype=jnp.float32) -> "GroupNorm1":
        return GroupNorm1(
            weight=jnp.ones((dim,), dtype), bias=jnp.zeros((dim,), dtype)
        )


class PoolFormerBlock(nn.Module):
    before_norm: GroupNorm1
    after_norm: GroupNorm1
    conv1: nn.Conv2d
    conv2: nn.Conv2d
    layer_scale_1: jax.Array
    layer_scale_2: jax.Array
    pool_size: int = nn.static_field(default=3)

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        n = self.before_norm(x, ctx)
        mix = _avg_pool_nopad(n, self.pool_size) - n
        x = x + self.layer_scale_1 * mix
        h = self.conv2(
            jax.nn.gelu(self.conv1(self.after_norm(x, ctx), ctx),
                        approximate=False),
            ctx,
        )
        return x + self.layer_scale_2 * h


class PoolFormer(nn.Module):
    """NHWC PoolFormer classifier; input (b, h, w, 3), output logits."""

    patch_embeds: tuple  # per-stage overlapping conv embeddings
    stages: tuple  # tuple of tuple-of-blocks
    norm: GroupNorm1
    classifier: nn.Linear

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        for embed, blocks in zip(self.patch_embeds, self.stages):
            x = embed(x, ctx)
            for blk in blocks:
                x = blk(x, ctx)
        x = self.norm(x, ctx)
        return self.classifier(jnp.mean(x, axis=(1, 2)), ctx)

    @staticmethod
    def create(
        key: jax.Array,
        hidden_sizes: tuple = (64, 128, 320, 512),
        depths: tuple = (2, 2, 6, 2),
        patch_sizes: tuple = (7, 3, 3, 3),
        strides: tuple = (4, 2, 2, 2),
        paddings: tuple = (2, 1, 1, 1),
        pool_size: int = 3,
        mlp_ratio: float = 4.0,
        layer_scale_init: float = 1e-5,
        num_classes: int = 1000,
        dtype: Any = jnp.float32,
    ) -> "PoolFormer":
        keys = jax.random.split(key, 2 + len(depths) + sum(depths))
        ki = iter(range(len(keys)))
        embeds, stages = [], []
        cin = 3
        for s, dim in enumerate(hidden_sizes):
            embeds.append(
                nn.Conv2d.create(
                    keys[next(ki)], cin, dim, patch_sizes[s],
                    stride=strides[s], padding=paddings[s], dtype=dtype,
                )
            )
            cin = dim
            blocks = []
            for _ in range(depths[s]):
                k = keys[next(ki)]
                inter = int(dim * mlp_ratio)
                blocks.append(
                    PoolFormerBlock(
                        before_norm=GroupNorm1.create(dim, dtype),
                        after_norm=GroupNorm1.create(dim, dtype),
                        conv1=nn.Conv2d.create(
                            jax.random.fold_in(k, 0), dim, inter, 1,
                            dtype=dtype,
                        ),
                        conv2=nn.Conv2d.create(
                            jax.random.fold_in(k, 1), inter, dim, 1,
                            dtype=dtype,
                        ),
                        layer_scale_1=jnp.full(
                            (dim,), layer_scale_init, dtype
                        ),
                        layer_scale_2=jnp.full(
                            (dim,), layer_scale_init, dtype
                        ),
                        pool_size=pool_size,
                    )
                )
            stages.append(tuple(blocks))
        return PoolFormer(
            patch_embeds=tuple(embeds),
            stages=tuple(stages),
            norm=GroupNorm1.create(hidden_sizes[-1], dtype),
            classifier=nn.Linear.create(
                keys[next(ki)], hidden_sizes[-1], num_classes, True, dtype
            ),
        )


def poolformer_s12(key, num_classes=1000):
    return PoolFormer.create(
        key, (64, 128, 320, 512), (2, 2, 6, 2), num_classes=num_classes
    )


def translate_hf_poolformer_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF PoolFormerForImageClassification -> native torch-layout keys:
    encoder.patch_embeddings.S.projection -> patch_embeds.S,
    encoder.block.S.B.{before_norm,after_norm,layer_scale_*,output.conv*}
    -> stages.S.B.*, the head norm/classifier keep their names."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.startswith("poolformer."):
            k = k[len("poolformer."):]
        k = k.replace("encoder.patch_embeddings.", "patch_embeds.")
        if k.startswith("patch_embeds."):
            k = k.replace(".projection.", ".")
        k = k.replace("encoder.block.", "stages.")
        k = k.replace(".output.conv1.", ".conv1.")
        k = k.replace(".output.conv2.", ".conv2.")
        out[k] = v
    return out
