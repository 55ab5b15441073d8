"""LeViT, TPU-native (NHWC).

Reference consumption analogue: any timm/HF levit checkpoint through
the reference's generic builders (trainer_vision/builder.py:134-144).
Mirrors HF ``LevitForImageClassification(WithTeacher)`` exactly:

* 4-conv BN hardswish stem (each conv halves the resolution);
* BN-folded linear layers everywhere (Linear without bias followed by
  BatchNorm1d over the flattened tokens — eval semantics identical to
  per-feature affine normalization, expressed with the shared
  BatchNorm2d leaves);
* attention with LEARNED per-head relative attention biases indexed by
  a static offset table (rebuilt from the resolution at create; the HF
  buffer is non-persistent), hardswish on the attention output before
  the projection;
* stage-bridging attention subsample: keys/values at full resolution,
  queries strided (::2) on the spatial grid, with its own offset table;
* mean pool + BN+linear classification head; the WithTeacher flavor
  averages ``classifier`` and ``classifier_distill`` (auto-detected by
  the builder from the checkpoint keys).

All q/k/v/projection linears are decomposable ``nn.Linear`` sites.
"""

from __future__ import annotations

import itertools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import nn


def _hardswish(x: jax.Array) -> jax.Array:
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


class ConvBN(nn.Module):
    convolution: nn.Conv2d
    batch_norm: nn.BatchNorm2d

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        return self.batch_norm(self.convolution(x, ctx), ctx)


class LinearBN(nn.Module):
    """HF MLPLayerWithBN: bias-free Linear + BatchNorm1d over tokens."""

    linear: nn.Linear
    batch_norm: nn.BatchNorm2d

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        return self.batch_norm(self.linear(x, ctx), ctx)

    @staticmethod
    def create(key, cin, cout, dtype=jnp.float32) -> "LinearBN":
        return LinearBN(
            linear=nn.Linear.create(key, cin, cout, False, dtype),
            batch_norm=nn.BatchNorm2d.create(cout),
        )


def _offset_table(res_q: int, res_kv: int, stride: int) -> np.ndarray:
    """Static relative-offset index table (HF builds it in __init__ and
    registers it as a non-persistent buffer)."""
    points_kv = list(itertools.product(range(res_kv), range(res_kv)))
    points_q = list(itertools.product(range(res_q), range(res_q)))
    offsets: dict = {}
    idx = []
    for p1 in points_q:
        for p2 in points_kv:
            off = (abs(p1[0] * stride - p2[0]), abs(p1[1] * stride - p2[1]))
            if off not in offsets:
                offsets[off] = len(offsets)
            idx.append(offsets[off])
    return np.array(idx, np.int32).reshape(len(points_q), len(points_kv))


class LevitAttention(nn.Module):
    queries_keys_values: LinearBN
    projection: LinearBN
    attention_biases: jax.Array  # (heads, n_offsets)
    bias_idxs: tuple = nn.static_field(default=())
    n_heads: int = nn.static_field(default=4)
    key_dim: int = nn.static_field(default=16)
    attention_ratio: int = nn.static_field(default=2)

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        b, n, _ = x.shape
        kd, ar, nh = self.key_dim, self.attention_ratio, self.n_heads
        qkv = self.queries_keys_values(x, ctx).reshape(b, n, nh, -1)
        q = qkv[..., :kd].transpose(0, 2, 1, 3)
        k = qkv[..., kd:2 * kd].transpose(0, 2, 1, 3)
        v = qkv[..., 2 * kd:].transpose(0, 2, 1, 3)
        bias = self.attention_biases[:, jnp.asarray(np.array(self.bias_idxs))]
        attn = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q, k) * (kd ** -0.5) + bias,
            axis=-1,
        )
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, nh * ar * kd)
        return self.projection(_hardswish(out), ctx)


class LevitAttentionSubsample(nn.Module):
    keys_values: LinearBN
    queries: LinearBN
    projection: LinearBN
    attention_biases: jax.Array
    bias_idxs: tuple = nn.static_field(default=())
    n_heads: int = nn.static_field(default=8)
    key_dim: int = nn.static_field(default=16)
    attention_ratio: int = nn.static_field(default=4)
    stride: int = nn.static_field(default=2)
    resolution_in: int = nn.static_field(default=14)

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        b, n, c = x.shape
        kd, nh = self.key_dim, self.n_heads
        kv = self.keys_values(x, ctx).reshape(b, n, nh, -1)
        k = kv[..., :kd].transpose(0, 2, 1, 3)
        v = kv[..., kd:].transpose(0, 2, 1, 3)
        r = self.resolution_in
        sub = x.reshape(b, r, r, c)[:, ::self.stride, ::self.stride]
        sub = sub.reshape(b, -1, c)
        q = self.queries(sub, ctx).reshape(b, -1, nh, kd).transpose(0, 2, 1, 3)
        bias = self.attention_biases[:, jnp.asarray(np.array(self.bias_idxs))]
        attn = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q, k) * (kd ** -0.5) + bias,
            axis=-1,
        )
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, q.shape[2], -1)
        return self.projection(_hardswish(out), ctx)


class LevitMLP(nn.Module):
    linear_up: LinearBN
    linear_down: LinearBN

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        return self.linear_down(_hardswish(self.linear_up(x, ctx)), ctx)


class Residual(nn.Module):
    module: nn.Module

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        return x + self.module(x, ctx)


class LevitStage(nn.Module):
    layers: tuple

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        for layer in self.layers:
            x = layer(x, ctx)
        return x


class PatchEmbeddings(nn.Module):
    embedding_layer_1: ConvBN
    embedding_layer_2: ConvBN
    embedding_layer_3: ConvBN
    embedding_layer_4: ConvBN

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        x = _hardswish(self.embedding_layer_1(x, ctx))
        x = _hardswish(self.embedding_layer_2(x, ctx))
        x = _hardswish(self.embedding_layer_3(x, ctx))
        x = self.embedding_layer_4(x, ctx)
        return x.reshape(x.shape[0], -1, x.shape[-1])


class ClassificationLayer(nn.Module):
    batch_norm: nn.BatchNorm2d
    linear: nn.Linear

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        return self.linear(self.batch_norm(x, ctx), ctx)


class LeViT(nn.Module):
    """NHWC LeViT classifier; input (b, h, w, 3), output logits."""

    patch_embeddings: PatchEmbeddings
    stages: tuple
    classifier: ClassificationLayer
    classifier_distill: Optional[ClassificationLayer] = None

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        t = self.patch_embeddings(x, ctx)
        for stage in self.stages:
            t = stage(t, ctx)
        pooled = t.mean(axis=1)
        logits = self.classifier(pooled, ctx)
        if self.classifier_distill is not None:
            logits = (logits + self.classifier_distill(pooled, ctx)) / 2
        return logits

    @staticmethod
    def create(
        key: jax.Array,
        num_classes: int = 1000,
        image_size: int = 224,
        patch_size: int = 16,
        hidden_sizes: tuple = (128, 256, 384),
        num_attention_heads: tuple = (4, 8, 12),
        depths: tuple = (4, 4, 4),
        key_dim: tuple = (16, 16, 16),
        attention_ratio: tuple = (2, 2, 2),
        mlp_ratio: tuple = (2, 2, 2),
        down_ops: tuple = (
            ("Subsample", 16, 8, 4, 2, 2),
            ("Subsample", 16, 16, 4, 2, 2),
        ),
        kernel_size: int = 3,
        stride: int = 2,
        padding: int = 1,
        distilled: bool = True,
        dtype: Any = jnp.float32,
    ) -> "LeViT":
        keys = iter(jax.random.split(key, 16 * sum(depths) + 32))

        def conv_bn(cin, cout) -> ConvBN:
            return ConvBN(
                convolution=nn.Conv2d.create(
                    next(keys), cin, cout, (kernel_size, kernel_size),
                    stride=stride, padding=padding, use_bias=False,
                    dtype=dtype,
                ),
                batch_norm=nn.BatchNorm2d.create(cout),
            )

        c0 = hidden_sizes[0]
        resolution = image_size // patch_size
        down = list(down_ops) + [("",)]
        stages = []
        for s in range(len(depths)):
            dim = hidden_sizes[s]
            kd, nh, ar = key_dim[s], num_attention_heads[s], attention_ratio[s]
            layers: list = []
            idxs = _offset_table(resolution, resolution, 1)
            n_off = int(idxs.max()) + 1
            for _ in range(depths[s]):
                layers.append(Residual(module=LevitAttention(
                    queries_keys_values=LinearBN.create(
                        next(keys), dim, (ar + 2) * kd * nh, dtype
                    ),
                    projection=LinearBN.create(
                        next(keys), ar * kd * nh, dim, dtype
                    ),
                    attention_biases=jnp.zeros((nh, n_off), dtype),
                    bias_idxs=tuple(map(tuple, idxs.tolist())),
                    n_heads=nh,
                    key_dim=kd,
                    attention_ratio=ar,
                )))
                if mlp_ratio[s] > 0:
                    layers.append(Residual(module=LevitMLP(
                        linear_up=LinearBN.create(
                            next(keys), dim, dim * mlp_ratio[s], dtype
                        ),
                        linear_down=LinearBN.create(
                            next(keys), dim * mlp_ratio[s], dim, dtype
                        ),
                    )))
            if down[s][0] == "Subsample":
                _, dkd, dnh, dar, dmlp, dstride = down[s]
                res_out = (resolution - 1) // dstride + 1
                didxs = _offset_table(res_out, resolution, dstride)
                layers.append(LevitAttentionSubsample(
                    keys_values=LinearBN.create(
                        next(keys), dim, (dar + 1) * dkd * dnh, dtype
                    ),
                    queries=LinearBN.create(
                        next(keys), dim, dkd * dnh, dtype
                    ),
                    projection=LinearBN.create(
                        next(keys), dar * dkd * dnh, hidden_sizes[s + 1],
                        dtype,
                    ),
                    attention_biases=jnp.zeros(
                        (dnh, int(didxs.max()) + 1), dtype
                    ),
                    bias_idxs=tuple(map(tuple, didxs.tolist())),
                    n_heads=dnh,
                    key_dim=dkd,
                    attention_ratio=dar,
                    stride=dstride,
                    resolution_in=resolution,
                ))
                resolution = res_out
                if dmlp > 0:
                    nd = hidden_sizes[s + 1]
                    layers.append(Residual(module=LevitMLP(
                        linear_up=LinearBN.create(next(keys), nd, nd * dmlp,
                                                  dtype),
                        linear_down=LinearBN.create(next(keys), nd * dmlp, nd,
                                                    dtype),
                    )))
            stages.append(LevitStage(layers=tuple(layers)))

        def head() -> ClassificationLayer:
            return ClassificationLayer(
                batch_norm=nn.BatchNorm2d.create(hidden_sizes[-1]),
                linear=nn.Linear.create(next(keys), hidden_sizes[-1],
                                        num_classes, True, dtype),
            )

        return LeViT(
            patch_embeddings=PatchEmbeddings(
                embedding_layer_1=conv_bn(3, c0 // 8),
                embedding_layer_2=conv_bn(c0 // 8, c0 // 4),
                embedding_layer_3=conv_bn(c0 // 4, c0 // 2),
                embedding_layer_4=conv_bn(c0 // 2, c0),
            ),
            stages=tuple(stages),
            classifier=head(),
            classifier_distill=head() if distilled else None,
        )


def translate_hf_levit_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF Levit(WithTeacher) -> native torch-layout keys: strip
    ``levit.``/``encoder.``/``patch_embeddings.`` nesting."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.endswith(("num_batches_tracked", "attention_bias_idxs")):
            continue
        if k.startswith("levit."):
            k = k[len("levit."):]
        if k.startswith("patch_embeddings.patch_embeddings."):
            k = k[len("patch_embeddings."):]
        if k.startswith("encoder.stages."):
            k = k[len("encoder."):]
        out[k] = v
    return out
