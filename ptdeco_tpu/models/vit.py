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
import numpy as np

from .. import nn

__all__ = [
    "ViT",
    "vit_tiny",
    "vit_small",
    "vit_base",
    "deit_small",
    "dinov2_small",
]


def _beit_relative_index(wh: int, ww: int) -> np.ndarray:
    """BEiT's (1+wh*ww)² index into the ((2wh-1)(2ww-1)+3)-row bias table:
    pairwise patch offsets plus the 3 special cls buckets (cls->token,
    token->cls, cls->cls) — HF BeitRelativePositionBias.generate_...
    verbatim."""
    nrd = (2 * wh - 1) * (2 * ww - 1) + 3
    coords = np.stack(
        np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij")
    ).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    n = wh * ww
    idx = np.zeros((n + 1, n + 1), np.int32)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, 0:] = nrd - 3
    idx[0:, 0] = nrd - 2
    idx[0, 0] = nrd - 1
    return idx


class ViTAttention(nn.Module):
    qkv: nn.Linear  # fused, decomposeable
    proj: nn.Linear
    # beit: learned relative-position-bias table (incl. 3 cls buckets)
    # added to the logits; no absolute positions in that family
    rel_bias_table: Optional[jax.Array] = None
    rel_index: Optional[jax.Array] = None
    n_heads: int = nn.static_field(default=8)
    _buffer_fields = ("rel_index",)

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
        if self.rel_bias_table is not None:  # beit
            bias = self.rel_bias_table[self.rel_index]  # (s, s, H)
            logits = logits + bias.astype(jnp.float32).transpose(2, 0, 1)[None]
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
        norm_eps=1e-6, rel_bias_window=None,
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
                rel_bias_table=(
                    jnp.zeros(
                        (
                            (2 * rel_bias_window - 1) ** 2 + 3,
                            n_heads,
                        ),
                        jnp.float32,
                    )
                    if rel_bias_window
                    else None
                ),
                rel_index=(
                    jnp.asarray(
                        _beit_relative_index(rel_bias_window, rel_bias_window)
                    )
                    if rel_bias_window
                    else None
                ),
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
    cls_token: Optional[jax.Array]  # (1, 1, dim); None = ijepa (no CLS)
    pos_embed: jax.Array  # (1, n_prefix + n_patches, dim)
    blocks: nn.Sequential
    norm: nn.LayerNorm
    head: nn.Linear
    # deit: distillation token + second classifier; inference logits are
    # the average of the two heads (HF
    # DeiTForImageClassificationWithTeacher)
    dist_token: Optional[jax.Array] = None
    head_dist: Optional[nn.Linear] = None
    # beit use_mean_pooling: the final norm is Identity and a pooler
    # LayerNorm runs over the MEAN of the patch tokens
    pooler_norm: Optional[nn.LayerNorm] = None
    # dinov2_with_registers: (1, R, dim) register tokens inserted AFTER
    # the CLS token, AFTER positions were added (registers carry no
    # position), and EXCLUDED from the cls_avg patch mean
    reg_tokens: Optional[jax.Array] = None
    # "cls" = classify the CLS token; "cls_avg" = dinov2's
    # cat(cls, mean(patch tokens)) into a 2*dim classifier; "mean_norm"
    # = beit's pooler-LayerNorm over the patch-token mean; "mean" =
    # ijepa's plain mean over all tokens after the final norm
    pool: str = nn.static_field(default="cls")

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        b = x.shape[0]
        p = self.patch_embed(x, ctx)  # (b, h', w', d)
        p = p.reshape(b, -1, p.shape[-1])
        toks = []
        if self.cls_token is not None:
            toks.append(jnp.broadcast_to(self.cls_token, (b, 1, p.shape[-1])))
        if self.dist_token is not None:
            toks.append(jnp.broadcast_to(self.dist_token, (b, 1, p.shape[-1])))
        h = jnp.concatenate(toks + [p], axis=1) if toks else p
        if self.pos_embed is not None:
            h = h + self.pos_embed
        n_reg = 0
        if self.reg_tokens is not None:  # position-free, after pos-add
            n_reg = self.reg_tokens.shape[1]
            reg = jnp.broadcast_to(
                self.reg_tokens, (b, n_reg, h.shape[-1])
            )
            h = jnp.concatenate([h[:, :1], reg, h[:, 1:]], axis=1)
        h = self.blocks(h, ctx)
        h = self.norm(h, ctx)
        if self.head_dist is not None:
            return (self.head(h[:, 0], ctx) + self.head_dist(h[:, 1], ctx)) / 2
        if self.pool == "cls_avg":
            feats = jnp.concatenate(
                [h[:, 0], jnp.mean(h[:, 1 + n_reg:], axis=1)], axis=-1
            )
            return self.head(feats, ctx)
        if self.pool == "mean_norm":  # beit
            return self.head(
                self.pooler_norm(jnp.mean(h[:, 1:], axis=1), ctx), ctx
            )
        if self.pool == "mean":  # ijepa
            return self.head(jnp.mean(h, axis=1), ctx)
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
        use_rel_bias: bool = False,
        use_abs_pos: bool = True,
        use_cls: bool = True,
        num_registers: int = 0,
    ) -> "ViT":
        keys = jax.random.split(key, depth + 4)
        n_patches = (image_size // patch_size) ** 2
        n_prefix = (2 if distilled else 1) if use_cls else 0
        window = image_size // patch_size
        return ViT(
            patch_embed=nn.Conv2d.create(
                keys[0], 3, dim, patch_size, stride=patch_size
            ),
            cls_token=jnp.zeros((1, 1, dim), jnp.float32) if use_cls else None,
            dist_token=jnp.zeros((1, 1, dim), jnp.float32) if distilled else None,
            reg_tokens=(
                jnp.zeros((1, num_registers, dim), jnp.float32)
                if num_registers
                else None
            ),
            pos_embed=(
                0.02
                * jax.random.normal(
                    keys[1], (1, n_patches + n_prefix, dim), jnp.float32
                )
                if use_abs_pos
                else None
            ),
            blocks=nn.Sequential(
                layers=tuple(
                    ViTBlock.create(
                        keys[2 + i], dim, n_heads,
                        layerscale_init=layerscale_init,
                        norm_eps=norm_eps,
                        rel_bias_window=window if use_rel_bias else None,
                    )
                    for i in range(depth)
                )
            ),
            norm=(
                nn.Identity()
                if pool == "mean_norm"
                else nn.LayerNorm.create(dim, eps=norm_eps)
            ),
            pooler_norm=(
                nn.LayerNorm.create(dim, eps=norm_eps)
                if pool == "mean_norm"
                else None
            ),
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


def translate_hf_beit_state_dict(sd: dict) -> dict:
    """HF ``BeitForImageClassification`` -> native: fuse query/key/value
    into ``attn.qkv`` (BEiT's key carries NO bias — zeros are packed),
    relative_position_bias_table -> ``attn.rel_bias_table``, lambda_1/2
    -> ls1/ls2, pooler.layernorm -> pooler_norm; the rel-index buffers
    rebuild from static shapes."""
    out: dict = {}
    qkv: dict = {}
    for k, v in sd.items():
        if k.endswith("relative_position_index"):
            continue
        name = k
        name = name.replace(
            "beit.embeddings.patch_embeddings.projection.", "patch_embed."
        )
        name = name.replace("beit.embeddings.cls_token", "cls_token")
        name = name.replace(
            "beit.embeddings.position_embeddings", "pos_embed"
        )
        name = name.replace("beit.encoder.layer.", "blocks.")
        name = name.replace("beit.pooler.layernorm.", "pooler_norm.")
        name = name.replace("beit.layernorm.", "norm.")
        name = name.replace("classifier.", "head.")
        name = name.replace(".layernorm_before.", ".norm1.")
        name = name.replace(".layernorm_after.", ".norm2.")
        name = name.replace(".lambda_1", ".ls1")
        name = name.replace(".lambda_2", ".ls2")
        name = name.replace(
            ".attention.attention.relative_position_bias."
            "relative_position_bias_table",
            ".attn.rel_bias_table",
        )
        name = name.replace(".attention.output.dense.", ".attn.proj.")
        name = name.replace(".intermediate.dense.", ".mlp.fc1.")
        name = name.replace(".output.dense.", ".mlp.fc2.")
        if ".attention.attention." in name:
            stem, rest = name.split(".attention.attention.")
            which, leaf = rest.split(".")
            qkv.setdefault((stem, leaf), {})[which] = v
            continue
        out[name] = v
    for (stem, leaf), parts in qkv.items():
        if leaf == "bias":
            q = np.asarray(parts["query"])
            out[f"{stem}.attn.qkv.bias"] = np.concatenate(
                [q, np.zeros_like(q), np.asarray(parts["value"])]
            )
        else:
            out[f"{stem}.attn.qkv.weight"] = np.concatenate(
                [parts["query"], parts["key"], parts["value"]], axis=0
            )
    return out


def beit_base(key, num_classes=1000, image_size=224):
    return ViT.create(
        key, image_size, 16, 768, 12, 12, num_classes,
        layerscale_init=0.1, pool="mean_norm", use_rel_bias=True,
        use_abs_pos=False, norm_eps=1e-12,
    )


def translate_hf_vit_msn_state_dict(sd):
    """ViTMSNForImageClassification layout (facebook/vit-msn-*): the plain
    ViT graph under the same ``vit.`` attribute name — the standard ViT
    translator applies verbatim (MSN differs only in pretraining)."""
    return translate_hf_vit_state_dict(sd)


def translate_hf_ijepa_state_dict(sd):
    """IJepaForImageClassification layout (facebook/ijepa_*): the ViT
    layout under an ``ijepa.`` prefix, with NO cls token (positions run
    over patches only) and the classifier reading the MEAN over all
    tokens (pool="mean")."""
    return translate_hf_vit_state_dict(
        {k.replace("ijepa.", "vit.", 1): v for k, v in sd.items()}
    )


def translate_hf_data2vec_vision_state_dict(sd):
    """Data2VecVisionForImageClassification layout: a BEiT clone under a
    ``data2vec_vision.`` prefix (HF modeling is '# Copied from ...beit'
    throughout); the BEiT translator applies after the rename."""
    return translate_hf_beit_state_dict(
        {k.replace("data2vec_vision.", "beit.", 1): v for k, v in sd.items()}
    )


def translate_hf_dinov2_with_registers_state_dict(sd):
    """Dinov2WithRegistersForImageClassification layout: the dinov2
    layout under a ``dinov2_with_registers.`` prefix plus the
    ``register_tokens`` parameter -> ``reg_tokens`` (inserted after CLS,
    position-free, excluded from the cls_avg patch mean)."""
    out = {}
    reg = None
    for k, v in sd.items():
        if k.endswith("embeddings.register_tokens"):
            reg = v
            continue
        out[k.replace("dinov2_with_registers.", "dinov2.", 1)] = v
    out = translate_hf_dinov2_state_dict(out)
    if reg is not None:
        out["reg_tokens"] = reg
    return out
