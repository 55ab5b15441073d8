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

__all__ = [
    "ViT",
    "vit_tiny",
    "vit_small",
    "vit_base",
    "deit_small",
    "dinov2_small",
]


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
    # dinov2 layer scale (HF Dinov2LayerScale lambda1) on each branch
    ls1: Optional[jax.Array] = None
    ls2: Optional[jax.Array] = None

    def __call__(self, x, ctx=None):
        a = self.attn(self.norm1(x, ctx), ctx)
        x = x + (a if self.ls1 is None else a * self.ls1)
        m = self.mlp(self.norm2(x, ctx), ctx)
        return x + (m if self.ls2 is None else m * self.ls2)

    @staticmethod
    def create(
        key, dim, n_heads, mlp_ratio=4.0, layerscale_init=None,
        norm_eps=1e-6,
    ):
        ks = jax.random.split(key, 4)
        ls = (
            None
            if layerscale_init is None
            else layerscale_init * jnp.ones((dim,), jnp.float32)
        )
        return ViTBlock(
            norm1=nn.LayerNorm.create(dim, eps=norm_eps),
            attn=ViTAttention(
                qkv=nn.Linear.create(ks[0], dim, 3 * dim),
                proj=nn.Linear.create(ks[1], dim, dim),
                n_heads=n_heads,
            ),
            norm2=nn.LayerNorm.create(dim, eps=norm_eps),
            mlp=ViTMLP(
                fc1=nn.Linear.create(ks[2], dim, int(dim * mlp_ratio)),
                fc2=nn.Linear.create(ks[3], int(dim * mlp_ratio), dim),
            ),
            ls1=ls,
            ls2=ls,
        )


class ViT(nn.Module):
    patch_embed: nn.Conv2d
    cls_token: jax.Array  # (1, 1, dim)
    pos_embed: jax.Array  # (1, n_prefix + n_patches, dim)
    blocks: nn.Sequential
    norm: nn.LayerNorm
    head: nn.Linear
    # deit: distillation token + second classifier; inference logits are
    # the average of the two heads (HF
    # DeiTForImageClassificationWithTeacher)
    dist_token: Optional[jax.Array] = None
    head_dist: Optional[nn.Linear] = None
    # "cls" = classify the CLS token; "cls_avg" = dinov2's
    # cat(cls, mean(patch tokens)) into a 2*dim classifier
    pool: str = nn.static_field(default="cls")

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        b = x.shape[0]
        p = self.patch_embed(x, ctx)  # (b, h', w', d)
        p = p.reshape(b, -1, p.shape[-1])
        toks = [jnp.broadcast_to(self.cls_token, (b, 1, p.shape[-1]))]
        if self.dist_token is not None:
            toks.append(jnp.broadcast_to(self.dist_token, (b, 1, p.shape[-1])))
        h = jnp.concatenate(toks + [p], axis=1) + self.pos_embed
        h = self.blocks(h, ctx)
        h = self.norm(h, ctx)
        if self.head_dist is not None:
            return (self.head(h[:, 0], ctx) + self.head_dist(h[:, 1], ctx)) / 2
        if self.pool == "cls_avg":
            feats = jnp.concatenate(
                [h[:, 0], jnp.mean(h[:, 1:], axis=1)], axis=-1
            )
            return self.head(feats, ctx)
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
        distilled: bool = False,
        layerscale_init: Optional[float] = None,
        pool: str = "cls",
        norm_eps: float = 1e-6,
    ) -> "ViT":
        keys = jax.random.split(key, depth + 4)
        n_patches = (image_size // patch_size) ** 2
        n_prefix = 2 if distilled else 1
        return ViT(
            patch_embed=nn.Conv2d.create(
                keys[0], 3, dim, patch_size, stride=patch_size
            ),
            cls_token=jnp.zeros((1, 1, dim), jnp.float32),
            dist_token=jnp.zeros((1, 1, dim), jnp.float32) if distilled else None,
            pos_embed=0.02
            * jax.random.normal(
                keys[1], (1, n_patches + n_prefix, dim), jnp.float32
            ),
            blocks=nn.Sequential(
                layers=tuple(
                    ViTBlock.create(
                        keys[2 + i], dim, n_heads,
                        layerscale_init=layerscale_init,
                        norm_eps=norm_eps,
                    )
                    for i in range(depth)
                )
            ),
            norm=nn.LayerNorm.create(dim, eps=norm_eps),
            head=nn.Linear.create(
                keys[-1],
                2 * dim if pool == "cls_avg" else dim,
                num_classes,
            ),
            head_dist=(
                nn.Linear.create(keys[-2], dim, num_classes)
                if distilled
                else None
            ),
            pool=pool,
        )


def vit_tiny(key, num_classes=1000, image_size=224):
    return ViT.create(key, image_size, 16, 192, 12, 3, num_classes)


def vit_small(key, num_classes=1000, image_size=224):
    return ViT.create(key, image_size, 16, 384, 12, 6, num_classes)


def vit_base(key, num_classes=1000, image_size=224):
    return ViT.create(key, image_size, 16, 768, 12, 12, num_classes)


def deit_small(key, num_classes=1000, image_size=224):
    return ViT.create(
        key, image_size, 16, 384, 12, 6, num_classes, distilled=True
    )


def dinov2_small(key, num_classes=1000, image_size=224):
    return ViT.create(
        key, image_size, 14, 384, 12, 6, num_classes,
        layerscale_init=1.0, pool="cls_avg",
    )


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


def translate_hf_deit_state_dict(sd):
    """DeiTForImageClassificationWithTeacher layout (facebook/deit-*):
    the ViT layout under a ``deit.`` prefix plus the distillation token
    and the two classifiers (cls_classifier -> head,
    distillation_classifier -> head_dist).  Logits parity (the averaged
    two-head inference rule) pinned in tests/test_vision_hf_parity.py."""
    renamed = {}
    for k, v in sd.items():
        if k == "deit.embeddings.distillation_token":
            renamed["__dist_token__"] = v
            continue
        k = k.replace("deit.", "vit.", 1)
        k = k.replace("cls_classifier.", "classifier.", 1)
        k = k.replace("distillation_classifier.", "__head_dist__.", 1)
        renamed[k] = v
    dist = renamed.pop("__dist_token__", None)
    head_dist = {
        k: renamed.pop(k) for k in list(renamed) if k.startswith("__head_dist__.")
    }
    out = translate_hf_vit_state_dict(renamed)
    if dist is not None:
        out["dist_token"] = dist
    for k, v in head_dist.items():
        out[k.replace("__head_dist__.", "head_dist.")] = v
    return out


def translate_hf_dinov2_state_dict(sd):
    """Dinov2ForImageClassification layout (facebook/dinov2-*): norm1/
    norm2 block norms, separate q/k/v fused on load, layer_scale{1,2}
    .lambda1 -> ls1/ls2 leaves, mlp.fc1/fc2 direct, classifier takes
    cat(cls, mean(patches)) (pool="cls_avg").  The mask_token (masked-
    image modeling only) is dropped."""
    import numpy as np

    out = {}
    qkv: dict = {}
    for k, v in sd.items():
        if k == "dinov2.embeddings.cls_token":
            out["cls_token"] = v
        elif k == "dinov2.embeddings.position_embeddings":
            out["pos_embed"] = v
        elif k == "dinov2.embeddings.mask_token":
            continue
        elif k.startswith("dinov2.embeddings.patch_embeddings.projection."):
            out[
                k.replace(
                    "dinov2.embeddings.patch_embeddings.projection.",
                    "patch_embed.",
                )
            ] = v
        elif ".attention.attention." in k:
            stem, rest = k.split(".attention.attention.")
            n = stem.rsplit(".", 1)[1]
            which, leaf = rest.split(".")
            qkv.setdefault((n, leaf), {})[which] = v
        elif ".attention.output.dense." in k:
            n = k.split("dinov2.encoder.layer.")[1].split(".")[0]
            out[f"blocks.{n}.attn.proj.{k.rsplit('.', 1)[1]}"] = v
        elif ".layer_scale1.lambda1" in k:
            n = k.split("dinov2.encoder.layer.")[1].split(".")[0]
            out[f"blocks.{n}.ls1"] = v
        elif ".layer_scale2.lambda1" in k:
            n = k.split("dinov2.encoder.layer.")[1].split(".")[0]
            out[f"blocks.{n}.ls2"] = v
        elif ".norm1." in k or ".norm2." in k or ".mlp.fc" in k:
            n, rest = k.split("dinov2.encoder.layer.")[1].split(".", 1)
            out[f"blocks.{n}.{rest}"] = v
        elif k.startswith("dinov2.layernorm."):
            out[k.replace("dinov2.layernorm.", "norm.")] = v
        elif k.startswith("classifier."):
            out[k.replace("classifier.", "head.")] = v
        else:
            continue
    for (n, leaf), parts in qkv.items():
        out[f"blocks.{n}.attn.qkv.{leaf}"] = np.concatenate(
            [parts["query"], parts["key"], parts["value"]], axis=0
        )
    return out
