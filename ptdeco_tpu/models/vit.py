"""Vision Transformer (ViT), NHWC patches, TPU-native.

The reference exercises ViT-like models through timm (swinv2/efficientformer
configs).  Standard ViT: conv patch embed, learned position embeddings, CLS
token, pre-LN encoder blocks with fused-qkv attention, MLP head.

The qkv/proj/fc1/fc2 Linears are decomposition sites; the reference's
swinv2-tiny dwain config targets exactly these module classes.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .. import nn

__all__ = ["ViT", "vit_tiny", "vit_small", "vit_base"]


class ViTAttention(nn.Module):
    qkv: nn.Linear  # fused, decomposeable
    proj: nn.Linear
    n_heads: int = nn.static_field(default=8)

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        b, s, d = x.shape
        qkv = self.qkv(x, ctx)
        inner = qkv.shape[-1] // 3
        hd = inner // self.n_heads
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, s, self.n_heads, hd)
        k = k.reshape(b, s, self.n_heads, hd)
        v = v.reshape(b, s, self.n_heads, hd)
        logits = (
            jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
            * hd**-0.5
        )
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, inner)
        return self.proj(out, ctx)


class ViTMLP(nn.Module):
    fc1: nn.Linear
    fc2: nn.Linear

    def __call__(self, x, ctx=None):
        return self.fc2(jax.nn.gelu(self.fc1(x, ctx), approximate=False), ctx)


class ViTBlock(nn.Module):
    norm1: nn.LayerNorm
    attn: ViTAttention
    norm2: nn.LayerNorm
    mlp: ViTMLP

    def __call__(self, x, ctx=None):
        x = x + self.attn(self.norm1(x, ctx), ctx)
        return x + self.mlp(self.norm2(x, ctx), ctx)

    @staticmethod
    def create(key, dim, n_heads, mlp_ratio=4.0):
        ks = jax.random.split(key, 4)
        return ViTBlock(
            norm1=nn.LayerNorm.create(dim, eps=1e-6),
            attn=ViTAttention(
                qkv=nn.Linear.create(ks[0], dim, 3 * dim),
                proj=nn.Linear.create(ks[1], dim, dim),
                n_heads=n_heads,
            ),
            norm2=nn.LayerNorm.create(dim, eps=1e-6),
            mlp=ViTMLP(
                fc1=nn.Linear.create(ks[2], dim, int(dim * mlp_ratio)),
                fc2=nn.Linear.create(ks[3], int(dim * mlp_ratio), dim),
            ),
        )


class ViT(nn.Module):
    patch_embed: nn.Conv2d
    cls_token: jax.Array  # (1, 1, dim)
    pos_embed: jax.Array  # (1, n_patches + 1, dim)
    blocks: nn.Sequential
    norm: nn.LayerNorm
    head: nn.Linear

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        b = x.shape[0]
        p = self.patch_embed(x, ctx)  # (b, h', w', d)
        p = p.reshape(b, -1, p.shape[-1])
        cls = jnp.broadcast_to(self.cls_token, (b, 1, p.shape[-1]))
        h = jnp.concatenate([cls, p], axis=1) + self.pos_embed
        h = self.blocks(h, ctx)
        h = self.norm(h, ctx)
        return self.head(h[:, 0], ctx)

    @staticmethod
    def create(
        key: jax.Array,
        image_size: int = 224,
        patch_size: int = 16,
        dim: int = 384,
        depth: int = 12,
        n_heads: int = 6,
        num_classes: int = 1000,
    ) -> "ViT":
        keys = jax.random.split(key, depth + 3)
        n_patches = (image_size // patch_size) ** 2
        return ViT(
            patch_embed=nn.Conv2d.create(
                keys[0], 3, dim, patch_size, stride=patch_size
            ),
            cls_token=jnp.zeros((1, 1, dim), jnp.float32),
            pos_embed=0.02
            * jax.random.normal(keys[1], (1, n_patches + 1, dim), jnp.float32),
            blocks=nn.Sequential(
                layers=tuple(
                    ViTBlock.create(keys[2 + i], dim, n_heads)
                    for i in range(depth)
                )
            ),
            norm=nn.LayerNorm.create(dim, eps=1e-6),
            head=nn.Linear.create(keys[-1], dim, num_classes),
        )


def vit_tiny(key, num_classes=1000, image_size=224):
    return ViT.create(key, image_size, 16, 192, 12, 3, num_classes)


def vit_small(key, num_classes=1000, image_size=224):
    return ViT.create(key, image_size, 16, 384, 12, 6, num_classes)


def vit_base(key, num_classes=1000, image_size=224):
    return ViT.create(key, image_size, 16, 768, 12, 12, num_classes)


def translate_hf_vit_state_dict(sd):
    """Translate the HF ``ViTForImageClassification`` checkpoint layout
    (google/vit-* snapshots) into this module's timm-style tree: separate
    query/key/value fuse into ``attn.qkv`` (concatenated along the output
    dim, matching the thirds split in ``ViTAttention.__call__``),
    layernorm_before/after -> norm1/norm2, intermediate/output dense ->
    mlp.fc1/fc2, attention.output.dense -> attn.proj.  Whole-model logits
    parity vs the live HF implementation is pinned in
    tests/test_vision_hf_parity.py (reference coverage analogue:
    timm.create_model, trainer_vision/builder.py:134-144)."""
    import numpy as np

    out = {}
    qkv: dict = {}
    for k, v in sd.items():
        if k.startswith("vit.embeddings.cls_token"):
            out["cls_token"] = v
        elif k.startswith("vit.embeddings.position_embeddings"):
            out["pos_embed"] = v
        elif k.startswith("vit.embeddings.patch_embeddings.projection."):
            out[
                k.replace(
                    "vit.embeddings.patch_embeddings.projection.",
                    "patch_embed.",
                )
            ] = v
        elif ".attention.attention." in k:
            stem, rest = k.split(".attention.attention.")
            n = stem.rsplit(".", 1)[1]
            which, leaf = rest.split(".")
            qkv.setdefault((n, leaf), {})[which] = v
        elif ".attention.output.dense." in k:
            n = k.split("vit.encoder.layer.")[1].split(".")[0]
            out[f"blocks.{n}.attn.proj.{k.rsplit('.', 1)[1]}"] = v
        elif ".layernorm_before." in k:
            n = k.split("vit.encoder.layer.")[1].split(".")[0]
            out[f"blocks.{n}.norm1.{k.rsplit('.', 1)[1]}"] = v
        elif ".layernorm_after." in k:
            n = k.split("vit.encoder.layer.")[1].split(".")[0]
            out[f"blocks.{n}.norm2.{k.rsplit('.', 1)[1]}"] = v
        elif ".intermediate.dense." in k:
            n = k.split("vit.encoder.layer.")[1].split(".")[0]
            out[f"blocks.{n}.mlp.fc1.{k.rsplit('.', 1)[1]}"] = v
        elif ".output.dense." in k:  # attention.output matched above
            n = k.split("vit.encoder.layer.")[1].split(".")[0]
            out[f"blocks.{n}.mlp.fc2.{k.rsplit('.', 1)[1]}"] = v
        elif k.startswith("vit.layernorm."):
            out[k.replace("vit.layernorm.", "norm.")] = v
        elif k.startswith("classifier."):
            out[k.replace("classifier.", "head.")] = v
        else:  # pooler etc: not part of the classification forward
            continue
    for (n, leaf), parts in qkv.items():
        out[f"blocks.{n}.attn.qkv.{leaf}"] = np.concatenate(
            [parts["query"], parts["key"], parts["value"]], axis=0
        )
    return out
