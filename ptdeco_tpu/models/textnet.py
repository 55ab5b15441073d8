"""TextNet (FAST's RepVGG-style text backbone), TPU-native NHWC.

Reference consumption analogue: HF textnet checkpoints through the
reference's generic vision builder (trainer_vision/builder.py:134-144).
Mirrors HF ``TextNetForImageClassification``:

* stem: k3 s2 conv (symmetric k//2 pad) + BN + relu;
* stages of re-parameterizable conv blocks: a main (kh,kw) conv+BN plus
  optional vertical (kh,1) and horizontal (1,kw) conv+BN branches and an
  identity BN branch (present iff in==out and stride 1), summed, relu;
* head: global avg pool + Linear (``fc``).

Branch kernels can be rectangular; padding is the exact ((kh-1)//2,
(kw-1)//2) integer rule (NOT tf-same), so stride-2 blocks stay aligned
with torch.  Every conv is an ``nn.Conv2d`` decomposition site."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import nn


class TextNetStem(nn.Module):
    conv: nn.Conv2d
    batch_norm: nn.BatchNorm2d

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        return jax.nn.relu(self.batch_norm(self.conv(x, ctx), ctx))


class TextNetRepConv(nn.Module):
    """HF TextNetRepConvLayer: main + optional vertical/horizontal conv
    branches + optional identity BN, summed before one relu."""

    main_conv: nn.Conv2d
    main_batch_norm: nn.BatchNorm2d
    vertical_conv: Optional[nn.Conv2d] = None
    vertical_batch_norm: Optional[nn.BatchNorm2d] = None
    horizontal_conv: Optional[nn.Conv2d] = None
    horizontal_batch_norm: Optional[nn.BatchNorm2d] = None
    rbr_identity: Optional[nn.BatchNorm2d] = None

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        out = self.main_batch_norm(self.main_conv(x, ctx), ctx)
        if self.vertical_conv is not None:
            out = out + self.vertical_batch_norm(
                self.vertical_conv(x, ctx), ctx
            )
        if self.horizontal_conv is not None:
            out = out + self.horizontal_batch_norm(
                self.horizontal_conv(x, ctx), ctx
            )
        if self.rbr_identity is not None:
            out = out + self.rbr_identity(x, ctx)
        return jax.nn.relu(out)

    @staticmethod
    def create(
        key, cin, cout, kernel, stride, eps, dtype=jnp.float32
    ) -> "TextNetRepConv":
        kh, kw = kernel
        ks = jax.random.split(key, 3)
        conv = lambda k, kk, pad: nn.Conv2d.create(  # noqa: E731
            k, cin, cout, kk, stride=stride, padding=pad,
            use_bias=False, dtype=dtype,
        )
        has_v = kw != 1
        has_h = kh != 1
        return TextNetRepConv(
            main_conv=conv(ks[0], (kh, kw), ((kh - 1) // 2, (kw - 1) // 2)),
            main_batch_norm=nn.BatchNorm2d.create(cout, eps=eps),
            vertical_conv=(
                conv(ks[1], (kh, 1), ((kh - 1) // 2, 0)) if has_v else None
            ),
            vertical_batch_norm=(
                nn.BatchNorm2d.create(cout, eps=eps) if has_v else None
            ),
            horizontal_conv=(
                conv(ks[2], (1, kw), (0, (kw - 1) // 2)) if has_h else None
            ),
            horizontal_batch_norm=(
                nn.BatchNorm2d.create(cout, eps=eps) if has_h else None
            ),
            rbr_identity=(
                nn.BatchNorm2d.create(cin, eps=eps)
                if cout == cin and stride == 1
                else None
            ),
        )


class TextNetStage(nn.Module):
    stage: tuple

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        for blk in self.stage:
            x = blk(x, ctx)
        return x


class TextNet(nn.Module):
    """NHWC TextNet classifier; input (b, h, w, 3), logits out."""

    stem: TextNetStem
    stages: tuple
    fc: nn.Linear

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        x = self.stem(x, ctx)
        for st in self.stages:
            x = st(x, ctx)
        return self.fc(jnp.mean(x, axis=(1, 2)), ctx)

    @staticmethod
    def create(
        key: jax.Array,
        stem_kernel_size: int = 3,
        stem_stride: int = 2,
        stem_out_channels: int = 64,
        hidden_sizes: tuple = (64, 64, 128, 256, 512),
        conv_layer_kernel_sizes: tuple = (),
        conv_layer_strides: tuple = (),
        bn_eps: float = 1e-5,
        num_classes: int = 1000,
        dtype: Any = jnp.float32,
    ) -> "TextNet":
        n_blocks = sum(len(s) for s in conv_layer_kernel_sizes)
        keys = jax.random.split(key, n_blocks + 2)
        ki = iter(range(len(keys)))
        stem = TextNetStem(
            conv=nn.Conv2d.create(
                keys[next(ki)], 3, stem_out_channels, stem_kernel_size,
                stride=stem_stride, padding=stem_kernel_size // 2,
                use_bias=False, dtype=dtype,
            ),
            batch_norm=nn.BatchNorm2d.create(stem_out_channels, eps=bn_eps),
        )
        stages = []
        for si, (kernels, strides) in enumerate(
            zip(conv_layer_kernel_sizes, conv_layer_strides)
        ):
            cin = hidden_sizes[si]
            cout = hidden_sizes[si + 1]
            blocks = []
            for bi, (kk, st) in enumerate(zip(kernels, strides)):
                blocks.append(
                    TextNetRepConv.create(
                        keys[next(ki)], cin if bi == 0 else cout, cout,
                        tuple(kk), st, bn_eps, dtype,
                    )
                )
            stages.append(TextNetStage(stage=tuple(blocks)))
        return TextNet(
            stem=stem,
            stages=tuple(stages),
            fc=nn.Linear.create(
                keys[next(ki)], hidden_sizes[-1], num_classes, True, dtype
            ),
        )


def translate_hf_textnet_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF TextNetForImageClassification -> native keys: strip the
    ``textnet.``/``encoder.`` prefixes, ``stem.conv/batch_norm`` and the
    per-block branch names map 1:1, ``fc`` is the classifier."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        if k.startswith("textnet."):
            k = k[len("textnet."):]
        if k.startswith("encoder."):
            k = k[len("encoder."):]
        out[k] = v
    return out
