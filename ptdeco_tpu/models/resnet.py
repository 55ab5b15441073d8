"""ResNet family (18/34/50/101), NHWC TPU-native.

The reference consumes torchvision/timm ResNets
(/root/reference/examples/trainer_vision/builder.py:134-144); this is the
native implementation with the same topology and torch-compatible module
naming ("layer1.0.conv1", "fc", ...) so state dicts exported by
``utils.state_dict`` interoperate with torchvision checkpoints (modulo the
NCHW->NHWC boundary handled in utils.statedict) and blacklists written for
the reference apply unchanged.

Bottleneck blocks contain 1x1 convs — dwain/falor decomposition sites; all
convs are lockd-wrappable.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .. import nn

__all__ = ["ResNet", "resnet18", "resnet34", "resnet50", "resnet101"]


class Downsample(nn.Module):
    """1x1 strided conv + BN ('downsample.0'/'downsample.1' in torch)."""

    conv: nn.Conv2d
    bn: nn.BatchNorm2d

    def _name_children(self):
        yield "0", self.conv
        yield "1", self.bn

    def __call__(self, x, ctx=None):
        return self.bn(self.conv(x, ctx), ctx)


class BasicBlock(nn.Module):
    conv1: nn.Conv2d
    bn1: nn.BatchNorm2d
    conv2: nn.Conv2d
    bn2: nn.BatchNorm2d
    downsample: Optional[Downsample]

    def __call__(self, x, ctx=None):
        identity = x
        out = jax.nn.relu(self.bn1(self.conv1(x, ctx), ctx))
        out = self.bn2(self.conv2(out, ctx), ctx)
        if self.downsample is not None:
            identity = self.downsample(x, ctx)
        return jax.nn.relu(out + identity)

    @staticmethod
    def create(key, cin, cout, stride, sid):
        ks = jax.random.split(key, 3)
        down = None
        if stride != 1 or cin != cout:
            down = Downsample(
                conv=nn.Conv2d.create(
                    ks[2], cin, cout, 1, stride=stride, use_bias=False
                ),
                bn=nn.BatchNorm2d.create(cout, stat_id=sid[0] + 2),
            )
        blk = BasicBlock(
            conv1=nn.Conv2d.create(
                ks[0], cin, cout, 3, stride=stride, padding=1, use_bias=False
            ),
            bn1=nn.BatchNorm2d.create(cout, stat_id=sid[0]),
            conv2=nn.Conv2d.create(ks[1], cout, cout, 3, padding=1, use_bias=False),
            bn2=nn.BatchNorm2d.create(cout, stat_id=sid[0] + 1),
            downsample=down,
        )
        sid[0] += 3
        return blk


class Bottleneck(nn.Module):
    conv1: nn.Conv2d  # 1x1 — decomposeable
    bn1: nn.BatchNorm2d
    conv2: nn.Conv2d  # 3x3
    bn2: nn.BatchNorm2d
    conv3: nn.Conv2d  # 1x1 — decomposeable
    bn3: nn.BatchNorm2d
    downsample: Optional[Downsample]

    def __call__(self, x, ctx=None):
        identity = x
        out = jax.nn.relu(self.bn1(self.conv1(x, ctx), ctx))
        out = jax.nn.relu(self.bn2(self.conv2(out, ctx), ctx))
        out = self.bn3(self.conv3(out, ctx), ctx)
        if self.downsample is not None:
            identity = self.downsample(x, ctx)
        return jax.nn.relu(out + identity)

    @staticmethod
    def create(key, cin, width, cout, stride, sid):
        ks = jax.random.split(key, 4)
        down = None
        if stride != 1 or cin != cout:
            down = Downsample(
                conv=nn.Conv2d.create(
                    ks[3], cin, cout, 1, stride=stride, use_bias=False
                ),
                bn=nn.BatchNorm2d.create(cout, stat_id=sid[0] + 3),
            )
        blk = Bottleneck(
            conv1=nn.Conv2d.create(ks[0], cin, width, 1, use_bias=False),
            bn1=nn.BatchNorm2d.create(width, stat_id=sid[0]),
            conv2=nn.Conv2d.create(
                ks[1], width, width, 3, stride=stride, padding=1, use_bias=False
            ),
            bn2=nn.BatchNorm2d.create(width, stat_id=sid[0] + 1),
            conv3=nn.Conv2d.create(ks[2], width, cout, 1, use_bias=False),
            bn3=nn.BatchNorm2d.create(cout, stat_id=sid[0] + 2),
            downsample=down,
        )
        sid[0] += 4
        return blk


class ResNet(nn.Module):
    conv1: nn.Conv2d
    bn1: nn.BatchNorm2d
    layer1: nn.Sequential
    layer2: nn.Sequential
    layer3: nn.Sequential
    layer4: nn.Sequential
    fc: nn.Linear

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        x = jax.nn.relu(self.bn1(self.conv1(x, ctx), ctx))
        x = nn.max_pool2d(x, 3, 2, 1)
        for stage in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = stage(x, ctx)
        x = jnp.mean(x, axis=(1, 2))
        return self.fc(x, ctx)

    @staticmethod
    def create(
        key: jax.Array,
        block: str,
        layers: tuple[int, ...],
        num_classes: int = 1000,
    ) -> "ResNet":
        keys = iter(jax.random.split(key, sum(layers) + 2))
        sid = [0]
        expansion = 4 if block == "bottleneck" else 1
        cin = 64
        stages = []
        for stage_idx, n_blocks in enumerate(layers):
            width = 64 * (2**stage_idx)
            cout = width * expansion
            blocks = []
            for b in range(n_blocks):
                stride = 2 if (stage_idx > 0 and b == 0) else 1
                if block == "bottleneck":
                    blocks.append(
                        Bottleneck.create(next(keys), cin, width, cout, stride, sid)
                    )
                else:
                    blocks.append(
                        BasicBlock.create(next(keys), cin, cout, stride, sid)
                    )
                cin = cout
            stages.append(nn.Sequential(layers=tuple(blocks)))
        stem_sid = sid[0]
        return ResNet(
            conv1=nn.Conv2d.create(
                next(keys), 3, 64, 7, stride=2, padding=3, use_bias=False
            ),
            bn1=nn.BatchNorm2d.create(64, stat_id=stem_sid),
            layer1=stages[0],
            layer2=stages[1],
            layer3=stages[2],
            layer4=stages[3],
            fc=nn.Linear.create(next(keys), cin, num_classes),
        )


def resnet18(key: jax.Array, num_classes: int = 1000) -> ResNet:
    return ResNet.create(key, "basic", (2, 2, 2, 2), num_classes)


def resnet34(key: jax.Array, num_classes: int = 1000) -> ResNet:
    return ResNet.create(key, "basic", (3, 4, 6, 3), num_classes)


def resnet50(key: jax.Array, num_classes: int = 1000) -> ResNet:
    return ResNet.create(key, "bottleneck", (3, 4, 6, 3), num_classes)


def resnet101(key: jax.Array, num_classes: int = 1000) -> ResNet:
    return ResNet.create(key, "bottleneck", (3, 4, 23, 3), num_classes)


def translate_hf_resnet_state_dict(sd: dict) -> dict:
    """Translate the HF ``ResNetForImageClassification`` layout
    (microsoft/resnet-* snapshots) into this module's torchvision-style
    naming: ``embedder.embedder.convolution/normalization`` -> conv1/bn1,
    ``encoder.stages.S.layers.B.layer.L.{convolution,normalization}`` ->
    ``layer{S+1}.B.{conv,bn}{L+1}``, ``shortcut.{convolution,
    normalization}`` -> ``downsample.{0,1}``, ``classifier.1`` (the Linear
    after Flatten) -> ``fc``.  The graphs match exactly for the
    torchvision-shaped configs (v1.5 stride in the 3x3, stem maxpool,
    stride-2 from stage 2 on); logits parity is pinned in
    tests/test_vision_hf_parity.py."""
    out: dict = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        if k.startswith("resnet.embedder.embedder.convolution."):
            out[k.replace("resnet.embedder.embedder.convolution.", "conv1.")] = v
        elif k.startswith("resnet.embedder.embedder.normalization."):
            out[k.replace("resnet.embedder.embedder.normalization.", "bn1.")] = v
        elif k.startswith("resnet.encoder.stages."):
            rest = k[len("resnet.encoder.stages."):]
            stage, rest = rest.split(".layers.", 1)
            blk, rest = rest.split(".", 1)
            if rest.startswith("layer."):
                conv_idx, what, leaf = rest[len("layer."):].split(".")
                name = ("conv" if what == "convolution" else "bn") + str(
                    int(conv_idx) + 1
                )
                out[f"layer{int(stage) + 1}.{blk}.{name}.{leaf}"] = v
            elif rest.startswith("shortcut."):
                what, leaf = rest[len("shortcut."):].split(".")
                idx = "0" if what == "convolution" else "1"
                out[f"layer{int(stage) + 1}.{blk}.downsample.{idx}.{leaf}"] = v
        elif k.startswith("classifier.1."):
            out[k.replace("classifier.1.", "fc.")] = v
    return out
