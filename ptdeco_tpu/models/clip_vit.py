"""CLIP-family vision towers as classifiers, TPU-native (NHWC).

Reference consumption analogue: any timm/HF clip/siglip checkpoint
through the reference's generic builders
(trainer_vision/builder.py:134-144).  One shared pre-LN ViT encoder
serves four HF families:

* ``CLIPForImageClassification`` / ``MetaClip2ForImageClassification``:
  cls token + learned positions, pre_layrnorm (upstream's typo name is
  the checkpoint key), quick_gelu MLPs; the classifier mean-pools the
  PATCH tokens of the NON-post-layernormed last hidden state (the
  post_layernorm only ever normalizes the unused cls pooled output —
  kept as a field so checkpoints load strictly);
* ``SiglipForImageClassification`` / ``Siglip2ForImageClassification``:
  no cls token, tanh-gelu MLPs, post_layernorm applied to the FULL
  sequence, mean over all tokens; the (unused) attention-pooling
  ``head`` keys are dropped by the translators;
* SigLIP2 consumes patchified pixels through a LINEAR patch embedding —
  the native forward patchifies NHWC input with the processor's
  (p_h, p_w, c) feature order; equal spatial shapes make upstream's
  per-image positional resize an exact identity (square inputs at the
  native grid are required, refused loudly otherwise).

q/k/v/out/fc1/fc2 are decomposable ``nn.Linear`` sites.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import nn


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name in ("gelu_pytorch_tanh", "gelu_new"):
        return lambda x: jax.nn.gelu(x, approximate=True)
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    raise ValueError(f"unsupported hidden_act={name!r}")


class ClipAttention(nn.Module):
    q_proj: nn.Linear
    k_proj: nn.Linear
    v_proj: nn.Linear
    out_proj: nn.Linear
    n_heads: int = nn.static_field(default=12)

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        b, n, c = x.shape
        dh = c // self.n_heads

        def split(t):
            return t.reshape(b, n, self.n_heads, dh).transpose(0, 2, 1, 3)

        q = split(self.q_proj(x, ctx)) * (dh ** -0.5)
        k = split(self.k_proj(x, ctx))
        v = split(self.v_proj(x, ctx))
        attn = jax.nn.softmax(jnp.einsum("bhqd,bhkd->bhqk", q, k), axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        return self.out_proj(out.transpose(0, 2, 1, 3).reshape(b, n, c), ctx)


class ClipMLP(nn.Module):
    fc1: nn.Linear
    fc2: nn.Linear
    act: str = nn.static_field(default="quick_gelu")

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        return self.fc2(_act(self.act)(self.fc1(x, ctx)), ctx)


class ClipEncoderLayer(nn.Module):
    self_attn: ClipAttention
    layer_norm1: nn.LayerNorm
    mlp: ClipMLP
    layer_norm2: nn.LayerNorm

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        x = x + self.self_attn(self.layer_norm1(x, ctx), ctx)
        return x + self.mlp(self.layer_norm2(x, ctx), ctx)


class _Encoder(nn.Module):
    layers: tuple

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        for layer in self.layers:
            x = layer(x, ctx)
        return x


class ClipVisionEmbeddings(nn.Module):
    """cls token + conv patch embed + learned positions (CLIP)."""

    patch_embedding: nn.Conv2d
    position_embedding: nn.Embedding
    class_embedding: jax.Array

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        y = self.patch_embedding(x, ctx)
        b, h, w, c = y.shape
        t = y.reshape(b, h * w, c)
        cls = jnp.broadcast_to(self.class_embedding, (b, 1, c))
        t = jnp.concatenate([cls, t], axis=1)
        n = t.shape[1]
        if n != self.position_embedding.table.shape[0]:
            raise ValueError(
                f"clip positions built for "
                f"{self.position_embedding.table.shape[0]} tokens, got {n}"
            )
        return t + self.position_embedding.table[None]


class SiglipVisionEmbeddings(nn.Module):
    """conv patch embed + learned positions, no cls (SigLIP)."""

    patch_embedding: nn.Conv2d
    position_embedding: nn.Embedding

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        y = self.patch_embedding(x, ctx)
        b, h, w, c = y.shape
        t = y.reshape(b, h * w, c)
        if t.shape[1] != self.position_embedding.table.shape[0]:
            raise ValueError(
                f"siglip positions built for "
                f"{self.position_embedding.table.shape[0]} tokens, got "
                f"{t.shape[1]}"
            )
        return t + self.position_embedding.table[None]


class Siglip2VisionEmbeddings(nn.Module):
    """LINEAR patch embedding over patchified pixels (SigLIP2 naflex);
    the native forward patchifies the NHWC image with the processor's
    (p_h, p_w, c) feature order."""

    patch_embedding: nn.Linear
    position_embedding: nn.Embedding
    patch_size: int = nn.static_field(default=16)

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        b, hh, ww, c = x.shape
        p = self.patch_size
        if hh % p or ww % p or hh != ww:
            raise ValueError(
                f"siglip2 needs square inputs divisible by patch_size={p}"
            )
        nh, nw = hh // p, ww // p
        t = x.reshape(b, nh, p, nw, p, c).transpose(0, 1, 3, 2, 4, 5)
        t = t.reshape(b, nh * nw, p * p * c)
        t = self.patch_embedding(t, ctx)
        n_pos = self.position_embedding.table.shape[0]
        if nh * nw != n_pos:
            raise ValueError(
                f"siglip2 positions built for {n_pos} patches, got {nh * nw};"
                " equal shapes keep upstream's per-image resize an identity"
            )
        return t + self.position_embedding.table[None]


class VisionTower(nn.Module):
    embeddings: nn.Module
    encoder: _Encoder
    post_layernorm: nn.LayerNorm
    pre_layrnorm: Optional[nn.LayerNorm] = None  # CLIP (upstream typo)

    def __call__(
        self, x: jax.Array, ctx: Optional[nn.Ctx] = None,
        post_norm_sequence: bool = False,
    ) -> jax.Array:
        t = self.embeddings(x, ctx)
        if self.pre_layrnorm is not None:
            t = self.pre_layrnorm(t, ctx)
        t = self.encoder(t, ctx)
        if post_norm_sequence:
            t = self.post_layernorm(t, ctx)
        return t


class ClipClassifier(nn.Module):
    """CLIPForImageClassification / MetaClip2ForImageClassification:
    mean of the patch tokens (cls excluded) of the last hidden state;
    post_layernorm is never applied on this path."""

    vision_model: VisionTower
    classifier: nn.Linear

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        t = self.vision_model(x, ctx, post_norm_sequence=False)
        return self.classifier(t[:, 1:, :].mean(axis=1), ctx)

    @staticmethod
    def create(
        key: jax.Array,
        num_classes: int = 1000,
        image_size: int = 224,
        patch_size: int = 32,
        hidden_size: int = 768,
        intermediate_size: int = 3072,
        num_hidden_layers: int = 12,
        num_attention_heads: int = 12,
        hidden_act: str = "quick_gelu",
        layer_norm_eps: float = 1e-5,
        dtype: Any = jnp.float32,
    ) -> "ClipClassifier":
        keys = iter(jax.random.split(key, 8 * num_hidden_layers + 8))
        n_pos = (image_size // patch_size) ** 2 + 1
        return ClipClassifier(
            vision_model=VisionTower(
                embeddings=ClipVisionEmbeddings(
                    patch_embedding=nn.Conv2d.create(
                        next(keys), 3, hidden_size, (patch_size, patch_size),
                        stride=patch_size, use_bias=False, dtype=dtype,
                    ),
                    position_embedding=nn.Embedding.create(
                        next(keys), n_pos, hidden_size, dtype
                    ),
                    class_embedding=jax.random.normal(
                        next(keys), (hidden_size,), dtype
                    ),
                ),
                encoder=_make_encoder(
                    keys, hidden_size, intermediate_size, num_hidden_layers,
                    num_attention_heads, hidden_act, layer_norm_eps, dtype,
                ),
                post_layernorm=nn.LayerNorm.create(
                    hidden_size, eps=layer_norm_eps, dtype=dtype
                ),
                pre_layrnorm=nn.LayerNorm.create(
                    hidden_size, eps=layer_norm_eps, dtype=dtype
                ),
            ),
            classifier=nn.Linear.create(
                next(keys), hidden_size, num_classes, True, dtype
            ),
        )


class SiglipClassifier(nn.Module):
    """SiglipForImageClassification / Siglip2ForImageClassification:
    post-layernormed sequence, mean over ALL tokens."""

    vision_model: VisionTower
    classifier: nn.Linear

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        t = self.vision_model(x, ctx, post_norm_sequence=True)
        return self.classifier(t.mean(axis=1), ctx)

    @staticmethod
    def create(
        key: jax.Array,
        num_classes: int = 1000,
        image_size: int = 224,
        patch_size: int = 16,
        hidden_size: int = 768,
        intermediate_size: int = 3072,
        num_hidden_layers: int = 12,
        num_attention_heads: int = 12,
        hidden_act: str = "gelu_pytorch_tanh",
        layer_norm_eps: float = 1e-6,
        linear_patches: bool = False,  # SigLIP2
        num_patches: Optional[int] = None,
        dtype: Any = jnp.float32,
    ) -> "SiglipClassifier":
        keys = iter(jax.random.split(key, 8 * num_hidden_layers + 8))
        n_pos = (
            num_patches if num_patches is not None
            else (image_size // patch_size) ** 2
        )
        if linear_patches:
            embeddings: nn.Module = Siglip2VisionEmbeddings(
                patch_embedding=nn.Linear.create(
                    next(keys), 3 * patch_size * patch_size, hidden_size,
                    True, dtype,
                ),
                position_embedding=nn.Embedding.create(
                    next(keys), n_pos, hidden_size, dtype
                ),
                patch_size=patch_size,
            )
        else:
            embeddings = SiglipVisionEmbeddings(
                patch_embedding=nn.Conv2d.create(
                    next(keys), 3, hidden_size, (patch_size, patch_size),
                    stride=patch_size, use_bias=True, dtype=dtype,
                ),
                position_embedding=nn.Embedding.create(
                    next(keys), n_pos, hidden_size, dtype
                ),
            )
        return SiglipClassifier(
            vision_model=VisionTower(
                embeddings=embeddings,
                encoder=_make_encoder(
                    keys, hidden_size, intermediate_size, num_hidden_layers,
                    num_attention_heads, hidden_act, layer_norm_eps, dtype,
                ),
                post_layernorm=nn.LayerNorm.create(
                    hidden_size, eps=layer_norm_eps, dtype=dtype
                ),
            ),
            classifier=nn.Linear.create(
                next(keys), hidden_size, num_classes, True, dtype
            ),
        )


def _make_encoder(keys, dim, inter, depth, n_heads, act, eps, dtype) -> _Encoder:
    layers = []
    for _ in range(depth):
        layers.append(ClipEncoderLayer(
            self_attn=ClipAttention(
                q_proj=nn.Linear.create(next(keys), dim, dim, True, dtype),
                k_proj=nn.Linear.create(next(keys), dim, dim, True, dtype),
                v_proj=nn.Linear.create(next(keys), dim, dim, True, dtype),
                out_proj=nn.Linear.create(next(keys), dim, dim, True, dtype),
                n_heads=n_heads,
            ),
            layer_norm1=nn.LayerNorm.create(dim, eps=eps, dtype=dtype),
            mlp=ClipMLP(
                fc1=nn.Linear.create(next(keys), dim, inter, True, dtype),
                fc2=nn.Linear.create(next(keys), inter, dim, True, dtype),
                act=act,
            ),
            layer_norm2=nn.LayerNorm.create(dim, eps=eps, dtype=dtype),
        ))
    return _Encoder(layers=tuple(layers))


def translate_hf_clip_family_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF CLIP/MetaClip2/Siglip/Siglip2 ForImageClassification -> native
    torch-layout keys: drop buffers and the unused siglip attention-
    pooling head; position embeddings stay under
    ``position_embedding.weight`` (Embedding exporter layout)."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.endswith("position_ids"):
            continue
        if k.startswith("vision_model.head."):
            continue
        out[k] = v
    return out
