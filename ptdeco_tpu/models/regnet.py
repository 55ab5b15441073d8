"""RegNet (X/Y) family, NHWC TPU-native.

The reference consumes timm/torchvision RegNets through
``timm.create_model`` (/root/reference/examples/trainer_vision/
builder.py:134-144).  Topology follows Radosavovic et al. 2020 as
implemented by HF ``RegNetForImageClassification``: a 3x3/s2 conv-BN-relu
stem, stages of residual layers (1x1 conv -> 3x3 GROUPED conv -> optional
squeeze-excitation (Y) -> 1x1 conv, each conv BN'd; conv-BN shortcut on
shape change), global average pool, linear classifier.

The 1x1 convs (and the SE's two 1x1 convs) are dwain/falor decomposition
sites; the grouped 3x3 is not decomposeable (groups > 1), matching the
reference's behavior.  Whole-model logits parity vs the live HF torch
implementation is pinned in tests/test_vision_hf_parity.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .. import nn

__all__ = ["RegNet", "regnet_y_tiny"]


class ConvBN(nn.Module):
    conv: nn.Conv2d
    bn: nn.BatchNorm2d
    act: bool = nn.static_field(default=True)

    def __call__(self, x, ctx=None):
        h = self.bn(self.conv(x, ctx), ctx)
        return jax.nn.relu(h) if self.act else h

    @staticmethod
    def create(key, cin, cout, k, sid, stride=1, groups=1, act=True):
        blk = ConvBN(
            conv=nn.Conv2d.create(
                key, cin, cout, k, stride=stride, padding=k // 2,
                groups=groups, use_bias=False,
            ),
            bn=nn.BatchNorm2d.create(cout, stat_id=sid[0]),
            act=act,
        )
        sid[0] += 1
        return blk


class SqueezeExcite(nn.Module):
    """Global-mean pool -> 1x1 conv -> relu -> 1x1 conv -> sigmoid gate
    (HF RegNetSELayer; fc convs carry biases)."""

    fc1: nn.Conv2d
    fc2: nn.Conv2d

    def __call__(self, x, ctx=None):
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        a = jax.nn.relu(self.fc1(pooled, ctx))
        a = jax.nn.sigmoid(self.fc2(a, ctx))
        return x * a

    @staticmethod
    def create(key, channels, reduced):
        k1, k2 = jax.random.split(key)
        return SqueezeExcite(
            fc1=nn.Conv2d.create(k1, channels, reduced, 1),
            fc2=nn.Conv2d.create(k2, reduced, channels, 1),
        )


class RegNetLayer(nn.Module):
    conv1: ConvBN  # 1x1
    conv2: ConvBN  # 3x3 grouped, carries the stride
    conv3: ConvBN  # 1x1, no activation
    se: Optional[SqueezeExcite]  # Y layers only
    shortcut: Optional[ConvBN]  # conv-BN on shape change

    def __call__(self, x, ctx=None):
        h = self.conv2(self.conv1(x, ctx), ctx)
        if self.se is not None:
            h = self.se(h, ctx)
        h = self.conv3(h, ctx)
        identity = x if self.shortcut is None else self.shortcut(x, ctx)
        return jax.nn.relu(h + identity)

    @staticmethod
    def create(key, cin, cout, stride, groups_width, use_se, sid):
        ks = jax.random.split(key, 5)
        groups = max(1, cout // groups_width)
        shortcut = None
        if cin != cout or stride != 1:
            shortcut = ConvBN.create(
                ks[3], cin, cout, 1, sid, stride=stride, act=False
            )
        return RegNetLayer(
            conv1=ConvBN.create(ks[0], cin, cout, 1, sid),
            conv2=ConvBN.create(
                ks[1], cout, cout, 3, sid, stride=stride, groups=groups
            ),
            conv3=ConvBN.create(ks[2], cout, cout, 1, sid, act=False),
            se=(
                SqueezeExcite.create(ks[4], cout, int(round(cin / 4)))
                if use_se
                else None
            ),
            shortcut=shortcut,
        )


class RegNet(nn.Module):
    stem: ConvBN
    stages: tuple  # tuple[nn.Sequential]
    head: nn.Linear

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        x = self.stem(x, ctx)
        for stage in self.stages:
            x = stage(x, ctx)
        return self.head(jnp.mean(x, axis=(1, 2)), ctx)

    @staticmethod
    def create(
        key: jax.Array,
        embedding_size: int = 32,
        hidden_sizes: tuple[int, ...] = (48, 96, 192, 440),
        depths: tuple[int, ...] = (2, 4, 10, 1),
        groups_width: int = 8,
        layer_type: str = "y",
        num_classes: int = 1000,
        downsample_in_first_stage: bool = False,
    ) -> "RegNet":
        keys = iter(jax.random.split(key, sum(depths) + 2))
        sid = [0]
        use_se = layer_type == "y"
        stages = []
        cin = embedding_size
        for i, (depth, cout) in enumerate(zip(depths, hidden_sizes)):
            first_stride = (
                2 if (i > 0 or downsample_in_first_stage) else 1
            )
            layers = []
            for j in range(depth):
                layers.append(
                    RegNetLayer.create(
                        next(keys), cin, cout,
                        first_stride if j == 0 else 1,
                        groups_width, use_se, sid,
                    )
                )
                cin = cout
            stages.append(nn.Sequential(layers=tuple(layers)))
        stem_key = next(keys)
        return RegNet(
            stem=ConvBN.create(stem_key, 3, embedding_size, 3, sid, stride=2),
            stages=tuple(stages),
            head=nn.Linear.create(next(keys), hidden_sizes[-1], num_classes),
        )


def regnet_y_tiny(key, num_classes=1000):
    """regnety_004-like geometry."""
    return RegNet.create(
        key, 32, (48, 104, 208, 440), (1, 3, 6, 6), 8, "y", num_classes,
        downsample_in_first_stage=True,
    )


def translate_hf_regnet_state_dict(sd):
    """RegNetForImageClassification layout (facebook/regnet-*):
    regnet.embedder.embedder.{convolution,normalization} -> stem,
    encoder.stages.S.layers.B.layer.{0,1,3}.{convolution,normalization}
    -> conv1/conv2/conv3 (Y layers; X layers use index 2 for the last
    conv), layer.2.attention.{0,2} -> se.fc1/fc2,
    shortcut.{convolution,normalization} -> shortcut, classifier.1 ->
    head."""
    out = {}
    for k, v in sd.items():
        if k.startswith("regnet.embedder.embedder."):
            k2 = k.replace("regnet.embedder.embedder.", "stem.")
            k2 = k2.replace("convolution.", "conv.").replace(
                "normalization.", "bn."
            )
            out[k2] = v
            continue
        if k.startswith("classifier.1."):
            out[k.replace("classifier.1.", "head.")] = v
            continue
        if not k.startswith("regnet.encoder.stages."):
            continue
        rest = k[len("regnet.encoder.stages."):]
        stage, rest = rest.split(".layers.", 1)
        block, rest = rest.split(".", 1)
        prefix = f"stages.{stage}.{block}"
        if rest.startswith("shortcut."):
            leaf = rest[len("shortcut."):]
            leaf = leaf.replace("convolution.", "conv.").replace(
                "normalization.", "bn."
            )
            out[f"{prefix}.shortcut.{leaf}"] = v
            continue
        # rest: layer.<i>.<...>
        idx, leaf = rest[len("layer."):].split(".", 1)
        if leaf.startswith("attention."):
            which = "fc1" if leaf.startswith("attention.0.") else "fc2"
            out[f"{prefix}.se.{which}.{leaf.split('.', 2)[2]}"] = v
            continue
        leaf = leaf.replace("convolution.", "conv.").replace(
            "normalization.", "bn."
        )
        name = {"0": "conv1", "1": "conv2", "2": "conv3", "3": "conv3"}[idx]
        out[f"{prefix}.{name}.{leaf}"] = v
    return out
