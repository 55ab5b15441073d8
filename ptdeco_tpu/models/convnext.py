"""ConvNeXt family, NHWC TPU-native.

The reference exercises ConvNeXt through timm for lockd (BASELINE.md config
3).  Topology follows Liu et al. 2022: patchify stem, stages of blocks
(7x7 depthwise conv -> LayerNorm -> 1x1 expand -> GELU -> 1x1 project,
layer-scale, residual), LN between downsamples.

The 1x1 convs are implemented as Linears over the channel axis (NHWC makes
them the same einsum; torch/timm stores them as Linear too), so they are
dwain/falor/lockd decomposition sites.  Depthwise 7x7 convs are grouped ->
not decomposeable, matching the reference's behavior on ConvNeXt.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .. import nn

__all__ = [
    "ConvNeXt",
    "convnext_tiny",
    "convnext_small",
    "convnextv2_tiny",
]


class ConvNeXtBlock(nn.Module):
    dwconv: nn.Conv2d  # 7x7 depthwise
    norm: nn.LayerNorm
    pwconv1: nn.Linear  # expand 4x — decomposeable
    pwconv2: nn.Linear  # project — decomposeable
    gamma: Optional[jax.Array]  # layer scale (v1); None in v2
    grn_gamma: Optional[jax.Array]  # GRN weight (v2, on 4*dim); None in v1
    grn_beta: Optional[jax.Array]  # GRN bias (v2)

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        h = self.dwconv(x, ctx)
        h = self.norm(h, ctx)
        h = jax.nn.gelu(self.pwconv1(h, ctx), approximate=False)
        if self.grn_gamma is not None:
            # Global Response Normalization (ConvNeXtV2, Woo et al. 2023):
            # per-channel global L2 over (H, W), divisively normalized by
            # the channel mean; zero-init weight/bias make it identity at
            # init.  Matches HF ConvNextV2GRN (eps 1e-6 on the mean).
            g = jnp.sqrt(jnp.sum(jnp.square(h), axis=(1, 2), keepdims=True))
            n = g / (jnp.mean(g, axis=-1, keepdims=True) + 1e-6)
            h = self.grn_gamma * (h * n) + self.grn_beta + h
        h = self.pwconv2(h, ctx)
        if self.gamma is not None:
            h = h * self.gamma
        return x + h

    @staticmethod
    def create(
        key: jax.Array, dim: int, ls_init: float = 1e-6, use_grn: bool = False
    ) -> "ConvNeXtBlock":
        k1, k2, k3 = jax.random.split(key, 3)
        return ConvNeXtBlock(
            dwconv=nn.Conv2d.create(
                k1, dim, dim, 7, padding=3, groups=dim, use_bias=True
            ),
            norm=nn.LayerNorm.create(dim, eps=1e-6),
            pwconv1=nn.Linear.create(k2, dim, 4 * dim),
            pwconv2=nn.Linear.create(k3, 4 * dim, dim),
            gamma=None if use_grn else ls_init * jnp.ones((dim,), jnp.float32),
            grn_gamma=jnp.zeros((4 * dim,), jnp.float32) if use_grn else None,
            grn_beta=jnp.zeros((4 * dim,), jnp.float32) if use_grn else None,
        )


class Downsample(nn.Module):
    norm: nn.LayerNorm
    conv: nn.Conv2d

    def __call__(self, x, ctx=None):
        return self.conv(self.norm(x, ctx), ctx)


class ConvNeXt(nn.Module):
    stem: nn.Conv2d
    stem_norm: nn.LayerNorm
    stages: tuple  # tuple[nn.Sequential]
    downsamples: tuple  # tuple[Downsample]
    norm: nn.LayerNorm
    head: nn.Linear

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        x = self.stem_norm(self.stem(x, ctx), ctx)
        for i, stage in enumerate(self.stages):
            if i > 0:
                x = self.downsamples[i - 1](x, ctx)
            x = stage(x, ctx)
        x = jnp.mean(x, axis=(1, 2))
        return self.head(self.norm(x, ctx), ctx)

    @staticmethod
    def create(
        key: jax.Array,
        depths: tuple[int, ...] = (3, 3, 9, 3),
        dims: tuple[int, ...] = (96, 192, 384, 768),
        num_classes: int = 1000,
        use_grn: bool = False,
    ) -> "ConvNeXt":
        n_keys = sum(depths) + len(dims) + 2
        keys = iter(jax.random.split(key, n_keys))
        stages = []
        downsamples = []
        for i, (depth, dim) in enumerate(zip(depths, dims)):
            if i > 0:
                downsamples.append(
                    Downsample(
                        norm=nn.LayerNorm.create(dims[i - 1], eps=1e-6),
                        conv=nn.Conv2d.create(
                            next(keys), dims[i - 1], dim, 2, stride=2
                        ),
                    )
                )
            stages.append(
                nn.Sequential(
                    layers=tuple(
                        ConvNeXtBlock.create(next(keys), dim, use_grn=use_grn)
                        for _ in range(depth)
                    )
                )
            )
        return ConvNeXt(
            stem=nn.Conv2d.create(next(keys), 3, dims[0], 4, stride=4),
            stem_norm=nn.LayerNorm.create(dims[0], eps=1e-6),
            stages=tuple(stages),
            downsamples=tuple(downsamples),
            norm=nn.LayerNorm.create(dims[-1], eps=1e-6),
            head=nn.Linear.create(next(keys), dims[-1], num_classes),
        )


def convnext_tiny(key: jax.Array, num_classes: int = 1000) -> ConvNeXt:
    return ConvNeXt.create(key, (3, 3, 9, 3), (96, 192, 384, 768), num_classes)


def convnext_small(key: jax.Array, num_classes: int = 1000) -> ConvNeXt:
    return ConvNeXt.create(key, (3, 3, 27, 3), (96, 192, 384, 768), num_classes)


def convnextv2_tiny(key: jax.Array, num_classes: int = 1000) -> ConvNeXt:
    return ConvNeXt.create(
        key, (3, 3, 9, 3), (96, 192, 384, 768), num_classes, use_grn=True
    )


def translate_hf_convnext_state_dict(sd):
    """Translate the HF ``ConvNextForImageClassification`` layout
    (facebook/convnext-* snapshots) into this module's tree: embeddings
    patch conv + layernorm -> stem/stem_norm, encoder.stages.S.layers.B.*
    -> stages.S.B.* (layer_scale_parameter -> the bare ``gamma`` leaf),
    stages.S.downsampling_layer.{0,1} -> downsamples.{S-1}.{norm,conv},
    final layernorm/classifier -> norm/head.  Logits parity pinned in
    tests/test_vision_hf_parity.py."""
    out = {}
    for k, v in sd.items():
        if k.startswith("convnext.embeddings.patch_embeddings."):
            out[
                k.replace("convnext.embeddings.patch_embeddings.", "stem.")
            ] = v
        elif k.startswith("convnext.embeddings.layernorm."):
            out[
                k.replace("convnext.embeddings.layernorm.", "stem_norm.")
            ] = v
        elif ".downsampling_layer." in k:
            stage = int(k.split("convnext.encoder.stages.")[1].split(".")[0])
            which, leaf = k.split(".downsampling_layer.")[1].split(".")
            name = "norm" if which == "0" else "conv"
            out[f"downsamples.{stage - 1}.{name}.{leaf}"] = v
        elif ".layers." in k and k.startswith("convnext.encoder.stages."):
            stage, rest = k.split("convnext.encoder.stages.")[1].split(
                ".layers.", 1
            )
            rest = rest.replace(".layernorm.", ".norm.")
            rest = rest.replace(".layer_scale_parameter", ".gamma")
            out[f"stages.{stage}.{rest}"] = v
        elif k.startswith("convnext.layernorm."):
            out[k.replace("convnext.layernorm.", "norm.")] = v
        elif k.startswith("classifier."):
            out[k.replace("classifier.", "head.")] = v
    return out


def translate_hf_convnextv2_state_dict(sd):
    """ConvNextV2ForImageClassification layout (facebook/convnextv2-*):
    same tree as v1 with the ``convnextv2.`` prefix, ``grn.weight``/
    ``grn.bias`` (1,1,1,4*dim) -> flat ``grn_gamma``/``grn_beta`` leaves,
    and no layer_scale_parameter.  Pinned in tests/test_vision_hf_parity.py."""
    renamed = {}
    for k, v in sd.items():
        k = k.replace("convnextv2.", "convnext.", 1)
        if k.endswith(".grn.weight"):
            k, v = k[: -len(".grn.weight")] + ".grn_gamma", v.reshape(-1)
        elif k.endswith(".grn.bias"):
            k, v = k[: -len(".grn.bias")] + ".grn_beta", v.reshape(-1)
        renamed[k] = v
    return translate_hf_convnext_state_dict(renamed)
