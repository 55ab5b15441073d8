"""FocalNet (focal modulation networks), TPU-native (NHWC).

Reference consumption analogue: any timm/HF focalnet checkpoint through
the reference's generic builders (trainer_vision/builder.py:134-144).
Mirrors HF ``FocalNetForImageClassification`` exactly:

* patch embeddings: k=p/s=p conv, or ``use_conv_embed`` (stem k7/s4/p2,
  downsample k3/s2/p1), LayerNorm after flattening — we stay NHWC
  end-to-end, so the flatten/reshape dance is a no-op;
* focal modulation: projection_in -> (q, ctx, gates); L depthwise
  gelu'd context convs of growing kernel (2k + window), gate-weighted
  accumulation plus a gated global (mean) context, optional
  ``normalize_modulator``; 1x1 projection_context as the modulator,
  q * modulator (optionally post-LN'd) -> projection_out.  Every
  projection_in/out is a decomposable ``nn.Linear`` site;
* pre-LN blocks (or ``use_post_layernorm``) with optional layerscale;
* stage-end downsample patch embed with LN, final LN + mean pool.
"""

from __future__ import annotations

import re
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import nn


class FocalMlp(nn.Module):
    fc1: nn.Linear
    fc2: nn.Linear

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        return self.fc2(jax.nn.gelu(self.fc1(x, ctx), approximate=False), ctx)


class PatchEmbed(nn.Module):
    """Conv projection (+ optional LayerNorm, used by downsamples)."""

    projection: nn.Conv2d
    norm: Optional[nn.LayerNorm] = None

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        x = self.projection(x, ctx)
        return x if self.norm is None else self.norm(x, ctx)


class Modulation(nn.Module):
    """HF FocalNetModulation on NHWC."""

    projection_in: nn.Linear
    projection_context: nn.Conv2d
    focal_layers: tuple  # depthwise convs, gelu applied inline
    projection_out: nn.Linear
    layernorm: Optional[nn.LayerNorm] = None
    focal_level: int = nn.static_field(default=2)
    normalize_modulator: bool = nn.static_field(default=False)

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        d = x.shape[-1]
        p = self.projection_in(x, ctx)
        q, c, gates = p[..., :d], p[..., d:2 * d], p[..., 2 * d:]
        ctx_all = jnp.zeros_like(q)
        for level in range(self.focal_level):
            c = jax.nn.gelu(self.focal_layers[level](c, ctx),
                            approximate=False)
            ctx_all = ctx_all + c * gates[..., level:level + 1]
        ctx_global = jax.nn.gelu(
            c.mean(axis=(1, 2), keepdims=True), approximate=False
        )
        ctx_all = ctx_all + ctx_global * gates[..., self.focal_level:]
        if self.normalize_modulator:
            ctx_all = ctx_all / (self.focal_level + 1)
        out = q * self.projection_context(ctx_all, ctx)
        if self.layernorm is not None:
            out = self.layernorm(out, ctx)
        return self.projection_out(out, ctx)


class FocalLayer(nn.Module):
    norm1: nn.LayerNorm
    modulation: Modulation
    norm2: nn.LayerNorm
    mlp: FocalMlp
    gamma_1: Optional[jax.Array] = None
    gamma_2: Optional[jax.Array] = None
    post_ln: bool = nn.static_field(default=False)

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        if self.post_ln:
            h = self.norm1(self.modulation(x, ctx), ctx)
        else:
            h = self.modulation(self.norm1(x, ctx), ctx)
        x = x + (h if self.gamma_1 is None else self.gamma_1 * h)
        if self.post_ln:
            h = self.norm2(self.mlp(x, ctx), ctx)
        else:
            h = self.mlp(self.norm2(x, ctx), ctx)
        return x + (h if self.gamma_2 is None else self.gamma_2 * h)


class FocalStage(nn.Module):
    layers: tuple
    downsample: Optional[PatchEmbed] = None

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        for layer in self.layers:
            x = layer(x, ctx)
        return x if self.downsample is None else self.downsample(x, ctx)


class Embeddings(nn.Module):
    patch_embeddings: PatchEmbed
    norm: nn.LayerNorm

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        return self.norm(self.patch_embeddings(x, ctx), ctx)


class FocalNet(nn.Module):
    """NHWC FocalNet classifier; input (b, h, w, 3), output logits."""

    embeddings: Embeddings
    stages: tuple
    layernorm: nn.LayerNorm
    classifier: nn.Linear

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        x = self.embeddings(x, ctx)
        for stage in self.stages:
            x = stage(x, ctx)
        x = self.layernorm(x, ctx)
        return self.classifier(x.mean(axis=(1, 2)), ctx)

    @staticmethod
    def create(
        key: jax.Array,
        num_classes: int = 1000,
        embed_dim: int = 96,
        depths: tuple = (2, 2, 6, 2),
        focal_levels: tuple = (2, 2, 2, 2),
        focal_windows: tuple = (3, 3, 3, 3),
        patch_size: int = 4,
        mlp_ratio: float = 4.0,
        use_conv_embed: bool = False,
        use_layerscale: bool = False,
        layerscale_value: float = 1e-4,
        use_post_layernorm: bool = False,
        use_post_layernorm_in_modulation: bool = False,
        normalize_modulator: bool = False,
        layer_norm_eps: float = 1e-5,
        dtype: Any = jnp.float32,
    ) -> "FocalNet":
        n_stages = len(depths)
        dims = [embed_dim * (2 ** i) for i in range(n_stages)]
        keys = iter(jax.random.split(key, 8 * sum(depths) + 2 * n_stages + 4))

        def ln(ch: int) -> nn.LayerNorm:
            return nn.LayerNorm.create(ch, eps=layer_norm_eps, dtype=dtype)

        def patch_embed(cin, cout, is_stem, add_norm) -> PatchEmbed:
            if use_conv_embed:
                k, s, p = (7, 4, 2) if is_stem else (3, 2, 1)
            else:
                k = s = patch_size if is_stem else 2
                p = 0
            return PatchEmbed(
                projection=nn.Conv2d.create(
                    next(keys), cin, cout, (k, k), stride=s, padding=p,
                    dtype=dtype,
                ),
                norm=ln(cout) if add_norm else None,
            )

        stages = []
        for si in range(n_stages):
            dim = dims[si]
            layers = []
            for _ in range(depths[si]):
                level = int(focal_levels[si])
                window = int(focal_windows[si])
                focal_convs = tuple(
                    nn.Conv2d.create(
                        next(keys), dim, dim, (2 * k + window, 2 * k + window),
                        padding=(2 * k + window) // 2, groups=dim,
                        use_bias=False, dtype=dtype,
                    )
                    for k in range(level)
                )
                layers.append(FocalLayer(
                    norm1=ln(dim),
                    modulation=Modulation(
                        projection_in=nn.Linear.create(
                            next(keys), dim, 2 * dim + level + 1, True, dtype
                        ),
                        projection_context=nn.Conv2d.create(
                            next(keys), dim, dim, (1, 1), dtype=dtype
                        ),
                        focal_layers=focal_convs,
                        projection_out=nn.Linear.create(
                            next(keys), dim, dim, True, dtype
                        ),
                        layernorm=(
                            ln(dim) if use_post_layernorm_in_modulation
                            else None
                        ),
                        focal_level=level,
                        normalize_modulator=normalize_modulator,
                    ),
                    norm2=ln(dim),
                    mlp=FocalMlp(
                        fc1=nn.Linear.create(
                            next(keys), dim, int(dim * mlp_ratio), True, dtype
                        ),
                        fc2=nn.Linear.create(
                            next(keys), int(dim * mlp_ratio), dim, True, dtype
                        ),
                    ),
                    gamma_1=(
                        layerscale_value * jnp.ones((dim,), dtype)
                        if use_layerscale else None
                    ),
                    gamma_2=(
                        layerscale_value * jnp.ones((dim,), dtype)
                        if use_layerscale else None
                    ),
                    post_ln=use_post_layernorm,
                ))
            downsample = None
            if si < n_stages - 1:
                downsample = patch_embed(dim, dims[si + 1], False, True)
            stages.append(FocalStage(layers=tuple(layers),
                                     downsample=downsample))
        return FocalNet(
            embeddings=Embeddings(
                patch_embeddings=patch_embed(3, embed_dim, True, False),
                norm=ln(embed_dim),
            ),
            stages=tuple(stages),
            layernorm=ln(dims[-1]),
            classifier=nn.Linear.create(
                next(keys), dims[-1], num_classes, True, dtype
            ),
        )


def translate_hf_focalnet_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF FocalNetForImageClassification -> native torch-layout keys:
    strip the ``focalnet.``/``encoder.`` prefixes and the Sequential
    index inside each focal layer (conv at ``focal_layers.{l}.0``)."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.startswith("focalnet."):
            k = k[len("focalnet."):]
        if k.startswith("encoder.stages."):
            k = k[len("encoder."):]
        k = re.sub(r"\.focal_layers\.(\d+)\.0\.", r".focal_layers.\1.", k)
        out[k] = v
    return out
