"""HGNetV2 (PP-HGNet v2, the D-FINE/RT-DETR backbone), TPU-native NHWC.

Reference consumption analogue: HF hgnet_v2 checkpoints through the
reference's generic vision builder (trainer_vision/builder.py:134-144).
Mirrors HF ``HGNetV2ForImageClassification``:

* conv layers: conv (pad (k-1)//2, no bias) + BN(eps 1e-5) + relu +
  optional learnable affine block (scalar scale/bias, only on activated
  layers when use_learnable_affine_block);
* stem: 3x3 s2, then a 2-branch fork on the right/bottom-padded map —
  (2x2 + pad + 2x2 convs) beside a k2 s1 ceil-mode maxpool — channel-
  concatenated into 3x3 s2 + 1x1;
* stages: optional depthwise 3x3 s2 downsample (NO activation), then
  HGBlocks: layer_num sequential convs (light = 1x1 reduce + depthwise k)
  whose outputs are ALL concatenated with the input and aggregated by
  two 1x1 convs (squeeze to out/2, excite to out); residual from block 1
  on;
* head: global avg pool + Linear (``fc``).

The 1x1 aggregation/light-reduce convs are prime decomposition sites."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import nn


class LearnableAffine(nn.Module):
    scale: jax.Array  # (1,)
    bias: jax.Array  # (1,)

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        return self.scale * x + self.bias


class HGConv(nn.Module):
    """HF HGNetV2ConvLayer: conv + BN + optional relu + optional LAB."""

    convolution: nn.Conv2d
    normalization: nn.BatchNorm2d
    lab: Optional[LearnableAffine] = None
    act: bool = nn.static_field(default=True)

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        x = self.normalization(self.convolution(x, ctx), ctx)
        if self.act:
            x = jax.nn.relu(x)
        if self.lab is not None:
            x = self.lab(x, ctx)
        return x

    @staticmethod
    def create(key, cin, cout, k, stride=1, groups=1, act=True,
               use_lab=False, dtype=jnp.float32) -> "HGConv":
        return HGConv(
            convolution=nn.Conv2d.create(
                key, cin, cout, k, stride=stride, padding=(k - 1) // 2,
                groups=groups, use_bias=False, dtype=dtype,
            ),
            normalization=nn.BatchNorm2d.create(cout, eps=1e-5),
            lab=(
                LearnableAffine(
                    scale=jnp.ones((1,), jnp.float32),
                    bias=jnp.zeros((1,), jnp.float32),
                )
                if act and use_lab
                else None
            ),
            act=act,
        )


class HGConvLight(nn.Module):
    """1x1 reduce (linear) + depthwise k (relu+lab)."""

    conv1: HGConv
    conv2: HGConv

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        return self.conv2(self.conv1(x, ctx), ctx)

    @staticmethod
    def create(key, cin, cout, k, use_lab=False, dtype=jnp.float32):
        k1, k2 = jax.random.split(key)
        return HGConvLight(
            conv1=HGConv.create(
                k1, cin, cout, 1, act=False, use_lab=use_lab, dtype=dtype
            ),
            conv2=HGConv.create(
                k2, cout, cout, k, groups=cout, use_lab=use_lab, dtype=dtype
            ),
        )


def _pad_rb(x: jax.Array) -> jax.Array:
    """F.pad(x, (0,1,0,1)) in NHWC: +1 row bottom, +1 col right."""
    return jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))


class HGEmbeddings(nn.Module):
    stem1: HGConv
    stem2a: HGConv
    stem2b: HGConv
    stem3: HGConv
    stem4: HGConv

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        emb = _pad_rb(self.stem1(x, ctx))
        branch = self.stem2b(_pad_rb(self.stem2a(emb, ctx)), ctx)
        pooled = jax.lax.reduce_window(
            emb, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 1, 1, 1), "VALID"
        )
        emb = jnp.concatenate([pooled, branch], axis=-1)
        return self.stem4(self.stem3(emb, ctx), ctx)


class HGBlock(nn.Module):
    """HF HGNetV2BasicLayer: dense feature aggregation."""

    layers: tuple
    aggregation_squeeze: HGConv
    aggregation_excitation: HGConv
    residual: bool = nn.static_field(default=False)

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        outs = [x]
        h = x
        for layer in self.layers:
            h = layer(h, ctx)
            outs.append(h)
        h = jnp.concatenate(outs, axis=-1)
        h = self.aggregation_excitation(
            self.aggregation_squeeze(h, ctx), ctx
        )
        return h + x if self.residual else h


class HGStage(nn.Module):
    blocks: tuple
    downsample: Optional[HGConv] = None

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        if self.downsample is not None:
            x = self.downsample(x, ctx)
        for blk in self.blocks:
            x = blk(x, ctx)
        return x


class HGNetV2(nn.Module):
    """NHWC HGNetV2 classifier; input (b, h, w, 3), logits out."""

    embedder: HGEmbeddings
    stages: tuple
    fc: nn.Linear

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        x = self.embedder(x, ctx)
        for st in self.stages:
            x = st(x, ctx)
        return self.fc(jnp.mean(x, axis=(1, 2)), ctx)

    @staticmethod
    def create(
        key: jax.Array,
        stem_channels: tuple = (3, 32, 48),
        stage_in_channels: tuple = (48, 128, 512, 1024),
        stage_mid_channels: tuple = (48, 96, 192, 384),
        stage_out_channels: tuple = (128, 512, 1024, 2048),
        stage_num_blocks: tuple = (1, 1, 3, 1),
        stage_num_layers: tuple = (6, 6, 6, 6),
        stage_downsample: tuple = (False, True, True, True),
        stage_light_block: tuple = (False, False, True, True),
        stage_kernel_size: tuple = (3, 3, 5, 5),
        use_learnable_affine_block: bool = False,
        num_classes: int = 1000,
        dtype: Any = jnp.float32,
    ) -> "HGNetV2":
        n_keys = 8 + sum(
            b * (l + 3)
            for b, l in zip(stage_num_blocks, stage_num_layers)
        )
        keys = jax.random.split(key, n_keys)
        ki = iter(range(n_keys))
        lab = use_learnable_affine_block
        c0, c1, c2 = stem_channels
        embedder = HGEmbeddings(
            stem1=HGConv.create(keys[next(ki)], c0, c1, 3, stride=2,
                                use_lab=lab, dtype=dtype),
            stem2a=HGConv.create(keys[next(ki)], c1, c1 // 2, 2,
                                 use_lab=lab, dtype=dtype),
            stem2b=HGConv.create(keys[next(ki)], c1 // 2, c1, 2,
                                 use_lab=lab, dtype=dtype),
            stem3=HGConv.create(keys[next(ki)], c1 * 2, c1, 3, stride=2,
                                use_lab=lab, dtype=dtype),
            stem4=HGConv.create(keys[next(ki)], c1, c2, 1,
                                use_lab=lab, dtype=dtype),
        )
        stages = []
        for si in range(len(stage_in_channels)):
            cin = stage_in_channels[si]
            mid = stage_mid_channels[si]
            cout = stage_out_channels[si]
            k = stage_kernel_size[si]
            light = stage_light_block[si]
            blocks = []
            for bi in range(stage_num_blocks[si]):
                bin_ = cin if bi == 0 else cout
                layers = []
                for li in range(stage_num_layers[si]):
                    lin = bin_ if li == 0 else mid
                    if light:
                        layers.append(HGConvLight.create(
                            keys[next(ki)], lin, mid, k, use_lab=lab,
                            dtype=dtype,
                        ))
                    else:
                        layers.append(HGConv.create(
                            keys[next(ki)], lin, mid, k, use_lab=lab,
                            dtype=dtype,
                        ))
                total = bin_ + stage_num_layers[si] * mid
                blocks.append(HGBlock(
                    layers=tuple(layers),
                    aggregation_squeeze=HGConv.create(
                        keys[next(ki)], total, cout // 2, 1, use_lab=lab,
                        dtype=dtype,
                    ),
                    aggregation_excitation=HGConv.create(
                        keys[next(ki)], cout // 2, cout, 1, use_lab=lab,
                        dtype=dtype,
                    ),
                    residual=bi != 0,
                ))
            stages.append(HGStage(
                blocks=tuple(blocks),
                downsample=(
                    HGConv.create(
                        keys[next(ki)], cin, cin, 3, stride=2, groups=cin,
                        act=False, dtype=dtype,
                    )
                    if stage_downsample[si]
                    else None
                ),
            ))
        return HGNetV2(
            embedder=embedder,
            stages=tuple(stages),
            fc=nn.Linear.create(
                keys[next(ki)], stage_out_channels[-1], num_classes, True,
                dtype,
            ),
        )


def translate_hf_hgnet_v2_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF HGNetV2ForImageClassification -> native keys: embedder/fc map
    1:1, ``encoder.stages.`` -> ``stages.``, the per-block
    ``aggregation.{0,1}.`` Sequential onto the named squeeze/excitation
    fields."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        if k.startswith("encoder.stages."):
            k = k[len("encoder."):]
        k = k.replace(".aggregation.0.", ".aggregation_squeeze.")
        k = k.replace(".aggregation.1.", ".aggregation_excitation.")
        out[k] = v
    return out
