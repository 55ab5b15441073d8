"""Hiera (hierarchical ViT with mask-unit attention), TPU-native.

Reference consumption analogue: any timm/HF hiera checkpoint through
the reference's generic builders (trainer_vision/builder.py:134-144).
Mirrors HF ``HieraForImageClassification`` exactly (classification
path; the MAE masking machinery is out of scope):

* overlapping conv patch embed (k7/s4/p3) + learned positions;
* the ``unroll`` trick: stride blocks are moved to the front of the
  sequence so mask-unit windows and 2x2 query max-pools become plain
  reshapes + ``max`` over an axis — all static under jit;
* per-stage width doubling via a linear ``proj`` on the PRE-NORM
  residual followed by the same max-pool the attention applies to its
  queries; mask-unit (windowed) attention on early stages with the
  one-layer lag into each pooling stage, global attention later;
* pooler: token mean, THEN LayerNorm, linear head.

qkv/proj/fc1/fc2/proj are decomposable ``nn.Linear`` sites.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import nn


def _unroll(x: jax.Array, grid: tuple[int, int],
            schedule: list[tuple[int, int]]) -> jax.Array:
    """HF modeling_hiera.unroll on (b, n, c) with identical reshape
    semantics (row-major throughout)."""
    b, _, c = x.shape
    cur = list(grid)
    x = x.reshape(b, *cur, c)
    batch = b
    for sh, sw in schedule:
        cur = [cur[0] // sh, cur[1] // sw]
        x = x.reshape(batch, cur[0], sh, cur[1], sw, c)
        x = x.transpose(0, 2, 4, 1, 3, 5)
        x = x.reshape(batch * sh * sw, cur[0], cur[1], c)
        batch *= sh * sw
    return x.reshape(b, -1, c)


class MaskUnitAttention(nn.Module):
    qkv: nn.Linear
    proj: nn.Linear
    n_heads: int = nn.static_field(default=1)
    out_dim: int = nn.static_field(default=96)
    query_stride: int = nn.static_field(default=1)
    window_size: int = nn.static_field(default=0)
    use_mask_unit_attn: bool = nn.static_field(default=False)

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        b, n, _ = x.shape
        hd = self.out_dim // self.n_heads
        nw = 1
        if self.use_mask_unit_attn:
            nw = n // (self.query_stride * self.window_size)
        qkv = self.qkv(x, ctx).reshape(b, -1, nw, 3, self.n_heads, hd)
        qkv = qkv.transpose(3, 0, 4, 2, 1, 5)
        q, k, v = qkv[0], qkv[1], qkv[2]
        if self.query_stride > 1:
            q = q.reshape(b, self.n_heads, nw, self.query_stride, -1, hd)
            q = q.max(axis=3)
        attn = jax.nn.softmax(
            jnp.einsum("bhwqd,bhwkd->bhwqk", q * (hd ** -0.5), k), axis=-1
        )
        out = jnp.einsum("bhwqk,bhwkd->bhwqd", attn, v)
        out = out.transpose(0, 3, 2, 1, 4).reshape(b, -1, self.out_dim)
        return self.proj(out, ctx)


class HieraMlp(nn.Module):
    fc1: nn.Linear
    fc2: nn.Linear

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        return self.fc2(jax.nn.gelu(self.fc1(x, ctx), approximate=False), ctx)


class HieraLayer(nn.Module):
    layernorm_before: nn.LayerNorm
    attn: MaskUnitAttention
    layernorm_after: nn.LayerNorm
    mlp: HieraMlp
    proj: Optional[nn.Linear] = None
    query_stride: int = nn.static_field(default=1)

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        b = x.shape[0]
        normed = self.layernorm_before(x, ctx)
        if self.proj is not None:
            x = self.proj(normed, ctx)
            # the residual takes the same max-pool the attention applies
            # to its queries (HF HieraLayer.forward)
            x = x.reshape(b, self.query_stride, -1, x.shape[-1]).max(axis=1)
        x = x + self.attn(normed, ctx)
        return x + self.mlp(self.layernorm_after(x, ctx), ctx)


class HieraStage(nn.Module):
    layers: tuple

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        for layer in self.layers:
            x = layer(x, ctx)
        return x


class _PatchEmbed(nn.Module):
    projection: nn.Conv2d

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        y = self.projection(x, ctx)
        return y.reshape(y.shape[0], -1, y.shape[-1])


class Embeddings(nn.Module):
    patch_embeddings: _PatchEmbed
    position_embeddings: jax.Array

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        t = self.patch_embeddings(x, ctx)
        if t.shape[1] != self.position_embeddings.shape[1]:
            raise ValueError(
                f"hiera position embeddings built for "
                f"{self.position_embeddings.shape[1]} tokens, got {t.shape[1]}"
            )
        return t + self.position_embeddings


class Pooler(nn.Module):
    layernorm: nn.LayerNorm

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        return self.layernorm(x.mean(axis=1), ctx)


class Hiera(nn.Module):
    """NHWC Hiera classifier; input (b, h, w, 3), output logits."""

    embeddings: Embeddings
    stages: tuple
    pooler: Pooler
    classifier: nn.Linear
    grid: tuple = nn.static_field(default=(56, 56))
    unroll_schedule: tuple = nn.static_field(default=((2, 2), (2, 2), (2, 2)))

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        t = self.embeddings(x, ctx)
        t = _unroll(t, self.grid, list(self.unroll_schedule))
        for stage in self.stages:
            t = stage(t, ctx)
        return self.classifier(self.pooler(t, ctx), ctx)

    @staticmethod
    def create(
        key: jax.Array,
        num_classes: int = 1000,
        image_size: tuple = (224, 224),
        embed_dim: int = 96,
        depths: tuple = (2, 3, 16, 3),
        num_heads: tuple = (1, 2, 4, 8),
        embed_dim_multiplier: float = 2.0,
        patch_size: tuple = (7, 7),
        patch_stride: tuple = (4, 4),
        patch_padding: tuple = (3, 3),
        num_query_pool: int = 3,
        query_stride: tuple = (2, 2),
        masked_unit_size: tuple = (8, 8),
        masked_unit_attention: tuple = (True, True, False, False),
        mlp_ratio: float = 4.0,
        layer_norm_eps: float = 1e-6,
        dtype: Any = jnp.float32,
    ) -> "Hiera":
        keys = iter(jax.random.split(key, 8 * sum(depths) + 8))
        grid = (image_size[0] // patch_stride[0],
                image_size[1] // patch_stride[1])
        total_depth = sum(depths)
        cumulative = np.cumsum(depths).tolist()
        query_pool_layers = set(cumulative[:num_query_pool])
        qs_area = int(math.prod(query_stride))
        mu_area = int(math.prod(masked_unit_size))
        query_strides = [
            qs_area if i in query_pool_layers else 1
            for i in range(total_depth)
        ]
        stages = []
        hidden = embed_dim
        layer_idx = 0
        for s, depth in enumerate(depths):
            out_dim = int(embed_dim * embed_dim_multiplier ** s)
            window = int(mu_area * qs_area ** -s)
            prev_masked = masked_unit_attention[s - 1 if s > 0 else 0]
            layers = []
            for i in range(depth):
                qs = query_strides[layer_idx]
                use_mu = masked_unit_attention[s] or (prev_masked and i == 0)
                cin = hidden if i == 0 else out_dim
                layers.append(HieraLayer(
                    layernorm_before=nn.LayerNorm.create(
                        cin, eps=layer_norm_eps, dtype=dtype
                    ),
                    attn=MaskUnitAttention(
                        qkv=nn.Linear.create(next(keys), cin, 3 * out_dim,
                                             True, dtype),
                        proj=nn.Linear.create(next(keys), out_dim, out_dim,
                                              True, dtype),
                        n_heads=num_heads[s],
                        out_dim=out_dim,
                        query_stride=qs,
                        window_size=window,
                        use_mask_unit_attn=use_mu,
                    ),
                    layernorm_after=nn.LayerNorm.create(
                        out_dim, eps=layer_norm_eps, dtype=dtype
                    ),
                    mlp=HieraMlp(
                        fc1=nn.Linear.create(next(keys), out_dim,
                                             int(out_dim * mlp_ratio), True,
                                             dtype),
                        fc2=nn.Linear.create(next(keys),
                                             int(out_dim * mlp_ratio),
                                             out_dim, True, dtype),
                    ),
                    proj=(
                        nn.Linear.create(next(keys), cin, out_dim, True,
                                         dtype)
                        if cin != out_dim else None
                    ),
                    query_stride=qs,
                ))
                layer_idx += 1
            hidden = out_dim
            stages.append(HieraStage(layers=tuple(layers)))
        return Hiera(
            embeddings=Embeddings(
                patch_embeddings=_PatchEmbed(projection=nn.Conv2d.create(
                    next(keys), 3, embed_dim, tuple(patch_size),
                    stride=tuple(patch_stride), padding=tuple(patch_padding),
                    dtype=dtype,
                )),
                position_embeddings=jnp.zeros(
                    (1, grid[0] * grid[1], embed_dim), dtype
                ),
            ),
            stages=tuple(stages),
            pooler=Pooler(layernorm=nn.LayerNorm.create(
                hidden, eps=layer_norm_eps, dtype=dtype
            )),
            classifier=nn.Linear.create(next(keys), hidden, num_classes,
                                        True, dtype),
            grid=grid,
            unroll_schedule=tuple(
                tuple(query_stride) for _ in range(len(depths) - 1)
            ),
        )


def translate_hf_hiera_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF HieraForImageClassification -> native torch-layout keys: strip
    ``hiera.``/``encoder.``."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.startswith("hiera."):
            k = k[len("hiera."):]
        if k.startswith("encoder.stages."):
            k = k[len("encoder."):]
        out[k] = v
    return out
