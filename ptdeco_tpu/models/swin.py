"""Swin Transformer family (windowed attention), NHWC, TPU-native:
V1, official V2, and the timm ``swinv2_cr_*`` variant.

The reference's actual vision-dwain target is timm's
``swinv2_cr_tiny_ns_224`` (examples_config/decompose_dwain_swinv2_tiny.yaml)
and its lockd test model is an efficientformer — both hierarchical windowed
transformers the plain ViT cannot stand in for.  This implements the SwinV2
architecture family (``cr=True`` selects the _cr graph: meta-MLP position
bias over all-pairs log coords, V1-order patch merging, optional extra
stage norms, no model-level final norm — see ``swinv2_cr_tiny_ns``):

  * 4 stages with patch merging (2x2 concat + 4C->2C linear reduction)
  * window attention with SHIFTED windows on alternate blocks (roll +
    static attention mask)
  * SwinV2 attention: cosine similarity with a learned per-head
    temperature, and a continuous log-spaced relative-position bias MLP
    (CPB) instead of V1's bias table

TPU-first notes: window partition/reverse are pure reshapes/transposes on
static shapes, the shift is a ``jnp.roll``, and the shifted-window mask is
a constant folded into the compiled program — no dynamic shapes anywhere.
Decomposition sites: per-block qkv/proj/fc1/fc2, per-merge reduction, head
(the same Linear classes the reference's swinv2 config targets).  The tiny
CPB Linears (2->512->heads) are sites too but have rank<=2 bottlenecks; the
example config blacklists them like the reference blacklists nothing but
gains nothing there either.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import nn

__all__ = [
    "SwinV2",
    "swinv2_tiny",
    "swinv2_small",
    "swinv2_cr_tiny_ns",
    "swinv2_cr_small_ns",
]


def _window_partition(x: jax.Array, w: int) -> jax.Array:
    """(B, H, W, C) -> (B * nH * nW, w*w, C)."""
    b, h, wd, c = x.shape
    x = x.reshape(b, h // w, w, wd // w, w, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, w * w, c)


def _window_reverse(x: jax.Array, w: int, h: int, wd: int) -> jax.Array:
    """Inverse of _window_partition."""
    b = x.shape[0] // ((h // w) * (wd // w))
    x = x.reshape(b, h // w, wd // w, w, w, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, wd, -1)


def _relative_coords_log(window: int) -> np.ndarray:
    """SwinV2 continuous-position-bias input: log-spaced relative
    coordinates, ((2w-1)², 2) float32."""
    coords = np.arange(-(window - 1), window, dtype=np.float32)
    grid = np.stack(np.meshgrid(coords, coords, indexing="ij"), axis=-1)
    grid = grid.reshape(-1, 2)  # ((2w-1)², 2)
    grid = grid / (window - 1) * 8.0 if window > 1 else grid
    return np.sign(grid) * np.log2(np.abs(grid) + 1.0) / np.log2(8.0)


def _relative_coords_cr(window: int) -> np.ndarray:
    """swinv2_cr meta-MLP input: ``sign(Δ) * ln(1 + |Δ|)`` over ALL
    ``w² x w²`` position pairs, flattened row-major to (w⁴, 2) — the _cr
    family feeds the bias MLP per PAIR directly instead of indexing a
    (2w-1)² table, and uses natural log without the official /8
    normalization (timm ``swin_transformer_v2_cr.py``
    ``_make_pair_wise_relative_positions``)."""
    coords = np.stack(
        np.meshgrid(np.arange(window), np.arange(window), indexing="ij"),
        axis=0,
    ).reshape(2, -1)  # (2, w²)
    rel = (coords[:, :, None] - coords[:, None, :]).astype(np.float32)
    rel = rel.transpose(1, 2, 0).reshape(-1, 2)  # (w⁴, 2)
    return np.sign(rel) * np.log1p(np.abs(rel))


def _relative_index(window: int) -> np.ndarray:
    """(w², w²) indices into the (2w-1)² relative-coordinate table."""
    coords = np.stack(
        np.meshgrid(np.arange(window), np.arange(window), indexing="ij"),
        axis=0,
    ).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # (2, w², w²)
    rel = rel + (window - 1)
    return (rel[0] * (2 * window - 1) + rel[1]).astype(np.int32)


def _shift_attn_mask(h: int, w: int, window: int, shift: int) -> np.ndarray:
    """Static mask for shifted-window attention: -100 where a window mixes
    pixels from different pre-roll regions (standard Swin construction)."""
    img = np.zeros((1, h, w, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[:, hs, ws, :] = cnt
            cnt += 1
    win = np.asarray(_window_partition(img, window)).reshape(
        -1, window * window
    )  # _window_partition is pure reshape/transpose: works on numpy
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    """SwinV2 window attention: cosine similarity * learned per-head
    temperature + continuous relative-position bias."""

    qkv: nn.Linear
    proj: nn.Linear
    logit_scale: Optional[jax.Array]  # (n_heads, 1, 1); None for V1
    cpb_fc1: Optional[nn.Linear]  # 2 -> cpb_hidden; None for V1
    cpb_fc2: Optional[nn.Linear]  # cpb_hidden -> n_heads (no bias)
    rel_coords: Optional[jax.Array]  # ((2w-1)², 2) — or (w⁴, 2) for _cr
    rel_index: Optional[jax.Array]  # (w², w²) int32; None for _cr
    # Swin V1: a LEARNED relative-position-bias table replaces the CPB
    # MLP, and attention is plain scaled dot product (q·k / sqrt(hd))
    rel_bias_table: Optional[jax.Array] = None  # ((2w-1)², n_heads)
    n_heads: int = nn.static_field(default=3)
    # timm swinv2_cr meta-MLP bias head: the bias MLP (with an OUT bias,
    # unlike official CPB) maps all-pairs ln(1+|Δ|) coords straight to
    # (w², w², H) — no index table, no 16*sigmoid squash
    meta_bias: bool = nn.static_field(default=False)
    _buffer_fields = ("rel_coords", "rel_index")

    def __call__(
        self,
        x: jax.Array,
        mask: Optional[jax.Array] = None,
        ctx: Optional[nn.Ctx] = None,
    ) -> jax.Array:
        bw, n, d = x.shape
        qkv = self.qkv(x, ctx)
        inner = qkv.shape[-1] // 3
        hd = inner // self.n_heads
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(bw, n, self.n_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(bw, n, self.n_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(bw, n, self.n_heads, hd).transpose(0, 2, 1, 3)

        if self.rel_bias_table is not None:  # Swin V1
            attn = jnp.einsum(
                "bhqd,bhkd->bhqk", q, k,
                preferred_element_type=jnp.float32,
            ) * jnp.float32(hd) ** -0.5
            bias = self.rel_bias_table[self.rel_index]  # (w², w², H)
            attn = attn + bias.astype(jnp.float32).transpose(2, 0, 1)[None]
        else:
            q = q / jnp.maximum(
                jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-6
            )
            k = k / jnp.maximum(
                jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-6
            )
            scale = jnp.exp(
                jnp.minimum(self.logit_scale, jnp.log(jnp.float32(100.0)))
            ).astype(jnp.float32)
            attn = (
                jnp.einsum(
                    "bhqd,bhkd->bhqk", q, k,
                    preferred_element_type=jnp.float32,
                )
                * scale
            )
            bias = self.cpb_fc2(
                jax.nn.relu(self.cpb_fc1(self.rel_coords, ctx)), ctx
            )
            if self.meta_bias:  # swinv2_cr: raw per-pair bias, no squash
                bias = bias.astype(jnp.float32).reshape(n, n, -1)
            else:
                bias = 16.0 * jax.nn.sigmoid(bias.astype(jnp.float32))
                bias = bias[self.rel_index]  # (w², w², H)
            attn = attn + bias.transpose(2, 0, 1)[None]

        if mask is not None:
            n_win = mask.shape[0]
            attn = attn.reshape(-1, n_win, self.n_heads, n, n)
            attn = attn + mask[None, :, None]
            attn = attn.reshape(bw, self.n_heads, n, n)

        probs = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bqhd", probs, v).reshape(bw, n, inner)
        return self.proj(out, ctx)

    @staticmethod
    def create(key, dim, n_heads, window, cpb_hidden=512, v1=False,
               cr=False):
        ks = jax.random.split(key, 4)
        if cr:
            # timm swinv2_cr: meta-MLP hidden 384, fc2 WITH bias, logit
            # scale per head (same log-10 init and ln(100) clamp as
            # official), all-pairs ln(1+|Δ|) coordinates
            return WindowAttention(
                qkv=nn.Linear.create(ks[0], dim, 3 * dim),
                proj=nn.Linear.create(ks[1], dim, dim),
                logit_scale=jnp.full(
                    (n_heads, 1, 1), np.log(10.0), jnp.float32
                ),
                cpb_fc1=nn.Linear.create(ks[2], 2, 384),
                cpb_fc2=nn.Linear.create(ks[3], 384, n_heads),
                rel_coords=jnp.asarray(_relative_coords_cr(window)),
                rel_index=None,
                n_heads=n_heads,
                meta_bias=True,
            )
        if v1:
            return WindowAttention(
                qkv=nn.Linear.create(ks[0], dim, 3 * dim),
                proj=nn.Linear.create(ks[1], dim, dim),
                logit_scale=None,
                cpb_fc1=None,
                cpb_fc2=None,
                rel_coords=None,
                rel_index=jnp.asarray(_relative_index(window)),
                rel_bias_table=jnp.zeros(
                    ((2 * window - 1) ** 2, n_heads), jnp.float32
                ),
                n_heads=n_heads,
            )
        return WindowAttention(
            qkv=nn.Linear.create(ks[0], dim, 3 * dim),
            proj=nn.Linear.create(ks[1], dim, dim),
            logit_scale=jnp.full((n_heads, 1, 1), np.log(10.0), jnp.float32),
            cpb_fc1=nn.Linear.create(ks[2], 2, cpb_hidden),
            cpb_fc2=nn.Linear.create(ks[3], cpb_hidden, n_heads, use_bias=False),
            rel_coords=jnp.asarray(_relative_coords_log(window)),
            rel_index=jnp.asarray(_relative_index(window)),
            n_heads=n_heads,
        )


class SwinBlock(nn.Module):
    norm1: nn.LayerNorm
    attn: WindowAttention
    norm2: nn.LayerNorm
    mlp: "SwinMLP"
    attn_mask: Optional[jax.Array]  # (nW, w², w²) for shifted blocks
    # swinv2_cr "_ns" variants: an extra main-branch norm closing the
    # last block of each stage (timm extra_norm_stage=True)
    norm3: Optional[nn.LayerNorm] = None
    resolution: tuple = nn.static_field(default=(56, 56))
    _buffer_fields = ("attn_mask",)
    window: int = nn.static_field(default=7)
    shift: int = nn.static_field(default=0)
    # Swin V1 PRE-norms (x + attn(norm(x))); V2 post-norms the residual
    pre_norm: bool = nn.static_field(default=False)

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        h, w = self.resolution
        b, n, c = x.shape
        shortcut = x
        # SwinV2 residual POST-norm: x + norm(attn(x)) — the defining V2
        # change alongside cosine attention and the CPB MLP (V1 pre-norms)
        if self.pre_norm:
            x = self.norm1(x, ctx)
        x = x.reshape(b, h, w, c)
        if self.shift > 0:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
        xw = _window_partition(x, self.window)
        xw = self.attn(xw, self.attn_mask, ctx)
        x = _window_reverse(xw, self.window, h, w)
        if self.shift > 0:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        x = x.reshape(b, n, c)
        if self.pre_norm:
            x = shortcut + x
            return x + self.mlp(self.norm2(x, ctx), ctx)
        x = shortcut + self.norm1(x, ctx)
        x = x + self.norm2(self.mlp(x, ctx), ctx)
        if self.norm3 is not None:
            x = self.norm3(x, ctx)
        return x

    @staticmethod
    def create(key, dim, n_heads, resolution, window, shift, mlp_ratio=4.0,
               v1=False, cr=False, extra_norm=False):
        ks = jax.random.split(key, 3)
        window = min(window, min(resolution))
        shift = 0 if window >= min(resolution) else shift
        if resolution[0] % window or resolution[1] % window:
            raise ValueError(
                f"window {window} must divide stage resolution {resolution} "
                "(pick image_size/patch_size so every stage is divisible)"
            )
        mask = (
            jnp.asarray(_shift_attn_mask(resolution[0], resolution[1], window, shift))
            if shift > 0
            else None
        )
        return SwinBlock(
            norm1=nn.LayerNorm.create(dim, eps=1e-5),
            attn=WindowAttention.create(
                ks[0], dim, n_heads, window, v1=v1, cr=cr
            ),
            norm2=nn.LayerNorm.create(dim, eps=1e-5),
            mlp=SwinMLP(
                fc1=nn.Linear.create(ks[1], dim, int(dim * mlp_ratio)),
                fc2=nn.Linear.create(ks[2], int(dim * mlp_ratio), dim),
            ),
            attn_mask=mask,
            norm3=nn.LayerNorm.create(dim, eps=1e-5) if extra_norm else None,
            resolution=tuple(resolution),
            window=window,
            shift=shift,
            pre_norm=v1,
        )


class SwinMLP(nn.Module):
    fc1: nn.Linear
    fc2: nn.Linear

    def __call__(self, x, ctx=None):
        return self.fc2(jax.nn.gelu(self.fc1(x, ctx), approximate=False), ctx)


class PatchMerging(nn.Module):
    """2x2 neighborhood concat + linear 4C->2C (between stages)."""

    reduction: nn.Linear
    norm: nn.LayerNorm
    resolution: tuple = nn.static_field(default=(56, 56))
    # Swin V1 norms the 4C concat BEFORE the reduction; V2 norms after
    norm_first: bool = nn.static_field(default=False)

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        h, w = self.resolution
        b, n, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        # upstream 4C concat order is [x(0,0), x(1,0), x(0,1), x(1,1)] in
        # (row-offset, col-offset) terms — i.e. col-offset-major — so the
        # row/col offset axes land as (..., col, row, c) before the merge
        # (microsoft Swin-Transformer PatchMerging cat([x0,x1,x2,x3]); HF
        # Swinv2PatchMerging matches; pinned by tests/test_vision_hf_parity)
        x = x.transpose(0, 1, 3, 4, 2, 5).reshape(b, (h // 2) * (w // 2), 4 * c)
        # V2 order: linear reduction first, norm after (V1 norms first)
        if self.norm_first:
            return self.reduction(self.norm(x, ctx), ctx)
        return self.norm(self.reduction(x, ctx), ctx)

    @staticmethod
    def create(key, dim, resolution, v1=False):
        return PatchMerging(
            reduction=nn.Linear.create(key, 4 * dim, 2 * dim, use_bias=False),
            # V2: norm sits after the reduction, over its 2*dim output
            norm=nn.LayerNorm.create(4 * dim if v1 else 2 * dim, eps=1e-5),
            resolution=tuple(resolution),
            norm_first=v1,
        )


class SwinStage(nn.Module):
    blocks: nn.Sequential
    downsample: Optional[PatchMerging]

    def __call__(self, x, ctx=None):
        x = self.blocks(x, ctx)
        if self.downsample is not None:
            x = self.downsample(x, ctx)
        return x


class SwinV2(nn.Module):
    patch_embed: nn.Conv2d
    patch_norm: nn.LayerNorm
    stages: nn.Sequential
    # swinv2_cr has NO model-level final norm (its post-norm blocks — and
    # the _ns variants' extra stage norms — already normalize the trunk)
    norm: Optional[nn.LayerNorm]
    head: nn.Linear

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        p = self.patch_embed(x, ctx)  # (b, h/4, w/4, C)
        b = p.shape[0]
        p = p.reshape(b, -1, p.shape[-1])
        h = self.patch_norm(p, ctx)
        h = self.stages(h, ctx)
        if self.norm is not None:
            h = self.norm(h, ctx)
        return self.head(jnp.mean(h, axis=1), ctx)

    @staticmethod
    def create(
        key: jax.Array,
        image_size: int = 224,
        patch_size: int = 4,
        embed_dim: int = 96,
        depths: tuple = (2, 2, 6, 2),
        n_heads: tuple = (3, 6, 12, 24),
        window: int = 7,
        num_classes: int = 1000,
        v1: bool = False,
        cr: bool = False,
        extra_norm_stage: bool = False,
    ) -> "SwinV2":
        n_stage = len(depths)
        keys = jax.random.split(key, 3 + sum(depths) + n_stage)
        ki = iter(range(len(keys)))
        res = image_size // patch_size
        stages = []
        dim = embed_dim
        for s in range(n_stage):
            blocks = []
            for b in range(depths[s]):
                blocks.append(
                    SwinBlock.create(
                        keys[next(ki)],
                        dim,
                        n_heads[s],
                        (res, res),
                        window,
                        shift=0 if b % 2 == 0 else window // 2,
                        v1=v1,
                        cr=cr,
                        extra_norm=extra_norm_stage and b == depths[s] - 1,
                    )
                )
            down = None
            if s < n_stage - 1:
                down = PatchMerging.create(
                    # _cr keeps the V1 merge order (norm on 4C, then
                    # reduction) inside otherwise-post-norm blocks
                    keys[next(ki)], dim, (res, res), v1=v1 or cr
                )
                dim *= 2
                res //= 2
            stages.append(
                SwinStage(blocks=nn.Sequential(layers=tuple(blocks)), downsample=down)
            )
        return SwinV2(
            patch_embed=nn.Conv2d.create(
                keys[next(ki)], 3, embed_dim, patch_size, stride=patch_size
            ),
            patch_norm=nn.LayerNorm.create(embed_dim, eps=1e-5),
            stages=nn.Sequential(layers=tuple(stages)),
            norm=None if cr else nn.LayerNorm.create(dim, eps=1e-5),
            head=nn.Linear.create(keys[next(ki)], dim, num_classes),
        )


def swinv2_tiny(key, num_classes=1000, image_size=224):
    """swinv2-tiny class: embed 96, depths (2,2,6,2), heads (3,6,12,24)
    (the reference's decompose_dwain_swinv2_tiny.yaml target family)."""
    return SwinV2.create(
        key, image_size, 4, 96, (2, 2, 6, 2), (3, 6, 12, 24), 7, num_classes
    )


def swinv2_small(key, num_classes=1000, image_size=224):
    return SwinV2.create(
        key, image_size, 4, 96, (2, 2, 18, 2), (3, 6, 12, 24), 7, num_classes
    )


def translate_official_state_dict(sd: dict) -> dict:
    """Translate an OFFICIAL SwinV2 checkpoint layout
    (microsoft/Swin-Transformer v2; timm's swinv2_* non-cr models use the
    same names) into this module's naming, still in torch tensor layout —
    feed the result to ``utils.load_state_dict``.

    Renames: ``layers.N`` -> ``stages.N``, ``patch_embed.proj`` ->
    ``patch_embed``, ``patch_embed.norm`` -> ``patch_norm``,
    ``cpb_mlp.0/.2`` -> ``cpb_fc1/cpb_fc2``; the upstream split
    ``q_bias``/``v_bias`` pair (k-bias pinned to zero) is packed into our
    fused ``qkv.bias``; precomputed buffers
    (relative_coords_table/relative_position_index/attn_mask) are dropped —
    ours are constants rebuilt from static shapes."""
    import numpy as np

    out: dict = {}
    qv: dict = {}
    for k, v in sd.items():
        if k.endswith((
            "relative_coords_table",
            "relative_position_index",
            "attn_mask",
        )):
            continue
        name = k
        if name.startswith("layers."):
            name = "stages." + name[len("layers."):]
        name = name.replace("patch_embed.proj.", "patch_embed.")
        name = name.replace("patch_embed.norm.", "patch_norm.")
        name = name.replace(".cpb_mlp.0.", ".cpb_fc1.")
        name = name.replace(".cpb_mlp.2.", ".cpb_fc2.")
        if name.endswith((".attn.q_bias", ".attn.v_bias")):
            qv.setdefault(name.rsplit(".", 1)[0], {})[name.rsplit(".", 1)[1]] = v
            continue
        out[name] = v
    for prefix, parts in qv.items():
        q, v = np.asarray(parts["q_bias"]), np.asarray(parts["v_bias"])
        out[f"{prefix}.qkv.bias"] = np.concatenate(
            [q, np.zeros_like(q), v]
        )
    return out


def translate_hf_swinv2_state_dict(sd: dict) -> dict:
    """Translate the HF transformers ``Swinv2ForImageClassification``
    layout (microsoft/swinv2-* snapshots as served by transformers, which
    renames the official fields) into this module's naming: separate
    attention.self.query/key/value fuse into ``attn.qkv`` (the key
    carries no bias upstream — zeros are packed into the fused bias,
    matching the official q_bias/zero/v_bias convention),
    ``continuous_position_bias_mlp.0/.2`` -> ``cpb_fc1/cpb_fc2``,
    ``attention.output.dense`` -> ``attn.proj``, ``intermediate/output
    .dense`` -> ``mlp.fc1/fc2``, ``layernorm_before/after`` (HF keeps the
    v1 names for what are POST-norms in v2) -> ``norm1/norm2``.
    Precomputed buffers are dropped (ours rebuild from static shapes).
    Logits parity vs live HF: tests/test_vision_hf_parity.py."""
    import numpy as np

    out: dict = {}
    qkv: dict = {}
    for k, v in sd.items():
        if k.endswith(
            (
                "relative_coords_table",
                "relative_position_index",
                "attn_mask",
            )
        ):
            continue
        name = k
        name = name.replace(
            "swinv2.embeddings.patch_embeddings.projection.", "patch_embed."
        )
        name = name.replace("swinv2.embeddings.norm.", "patch_norm.")
        name = name.replace("swinv2.encoder.layers.", "stages.")
        name = name.replace("swinv2.layernorm.", "norm.")
        name = name.replace("classifier.", "head.")
        name = name.replace(".layernorm_before.", ".norm1.")
        name = name.replace(".layernorm_after.", ".norm2.")
        name = name.replace(
            ".attention.self.continuous_position_bias_mlp.0.", ".attn.cpb_fc1."
        )
        name = name.replace(
            ".attention.self.continuous_position_bias_mlp.2.", ".attn.cpb_fc2."
        )
        name = name.replace(".attention.self.logit_scale", ".attn.logit_scale")
        name = name.replace(".attention.output.dense.", ".attn.proj.")
        name = name.replace(".intermediate.dense.", ".mlp.fc1.")
        name = name.replace(".output.dense.", ".mlp.fc2.")
        if ".attention.self." in name:
            stem, rest = name.split(".attention.self.")
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
    # HF logit_scale is (n_heads, 1, 1) like ours; nothing else remains
    return out


def translate_hf_swin_state_dict(sd: dict) -> dict:
    """Translate the HF ``SwinForImageClassification`` (V1) layout into
    this module's naming: the learned relative_position_bias_table maps
    onto ``attn.rel_bias_table``, query/key/value fuse into ``attn.qkv``
    (V1 keys DO carry biases, unlike V2's zero-pinned k), and the
    pre-norm layernorm_before/after land on norm1/norm2 with their V1
    meaning.  Precomputed buffers are dropped (rebuilt from shapes)."""
    import numpy as np

    out: dict = {}
    qkv: dict = {}
    for k, v in sd.items():
        if k.endswith(("relative_position_index", "attn_mask")):
            continue
        name = k
        name = name.replace(
            "swin.embeddings.patch_embeddings.projection.", "patch_embed."
        )
        name = name.replace("swin.embeddings.norm.", "patch_norm.")
        name = name.replace("swin.encoder.layers.", "stages.")
        name = name.replace("swin.layernorm.", "norm.")
        name = name.replace("classifier.", "head.")
        name = name.replace(".layernorm_before.", ".norm1.")
        name = name.replace(".layernorm_after.", ".norm2.")
        name = name.replace(
            ".attention.self.relative_position_bias_table",
            ".attn.rel_bias_table",
        )
        name = name.replace(".attention.output.dense.", ".attn.proj.")
        name = name.replace(".intermediate.dense.", ".mlp.fc1.")
        name = name.replace(".output.dense.", ".mlp.fc2.")
        if ".attention.self." in name:
            stem, rest = name.split(".attention.self.")
            which, leaf = rest.split(".")
            qkv.setdefault((stem, leaf), {})[which] = v
            continue
        out[name] = v
    for (stem, leaf), parts in qkv.items():
        out[f"{stem}.attn.qkv.{leaf}"] = np.concatenate(
            [parts["query"], parts["key"], parts["value"]], axis=0
        )
    return out


def swin_tiny(key, num_classes=1000, image_size=224):
    """Swin V1 tiny (timm swin_tiny_patch4_window7_224 shape class)."""
    return SwinV2.create(
        key, image_size, 4, 96, (2, 2, 6, 2), (3, 6, 12, 24), 7,
        num_classes, v1=True,
    )


def swinv2_cr_tiny_ns(key, num_classes=1000, image_size=224):
    """timm ``swinv2_cr_tiny_ns_224`` — THE model behind the reference's
    own dwain vision example
    (/root/reference/examples/trainer_vision/examples_config/
    decompose_dwain_swinv2_tiny.yaml, built by timm through
    /root/reference/examples/trainer_vision/builder.py:134-144).
    The _cr family (timm ``swin_transformer_v2_cr.py``) differs from
    official SwinV2 in: meta-MLP position bias (2->384 ReLU -> heads
    WITH out-bias, over all-pairs ``sign·ln(1+|Δ|)`` coords, no
    16*sigmoid squash), V1-order patch merging (norm on 4C before the
    reduction), no model-level final norm, and — for the "_ns" variants
    — an extra norm closing each stage's last block.  Golden-matched
    block-level against a pure-torch upstream mirror
    (tests/test_vision_block_goldens.py) and loadable from real timm
    checkpoints via ``translate_timm_swinv2_cr_state_dict``."""
    return SwinV2.create(
        key, image_size, 4, 96, (2, 2, 6, 2), (3, 6, 12, 24), 7,
        num_classes, cr=True, extra_norm_stage=True,
    )


def swinv2_cr_small_ns(key, num_classes=1000, image_size=224):
    return SwinV2.create(
        key, image_size, 4, 96, (2, 2, 18, 2), (3, 6, 12, 24), 7,
        num_classes, cr=True, extra_norm_stage=True,
    )


def translate_timm_swinv2_cr_state_dict(sd: dict) -> dict:
    """timm ``swinv2_cr_*`` checkpoint keys -> native keys for the _cr
    graph (``swinv2_cr_tiny_ns`` etc.), still in torch tensor layout.

    Renames (native <- timm):
      * ``patch_embed.* / patch_norm.*`` <- ``patch_embed.proj/.norm``
      * ``stages.{s-1}.downsample.*`` <- ``stages.{s}.downsample.*`` —
        timm's _cr stage applies PatchMerging at its ENTRY (stage s>=1),
        the native graph at the previous stage's exit; same pipeline
        order, shifted key position
      * ``...attn.cpb_fc1/cpb_fc2`` <- ``...attn.meta_mlp.fc1/fc2``
      * ``...attn.logit_scale`` (H,) -> (H, 1, 1)
      * ``head.*`` <- ``head.fc.*``
    Buffers (``relative_coordinates_log``, ``attn_mask``) are dropped —
    native ones are constants rebuilt from static shapes.  Pre-2022
    checkpoints carrying the paper's inverse-``tau`` parametrization are
    refused loudly (converting silently risks the exact
    wrong-function-loads-fine failure this translator family exists to
    prevent; run timm's own checkpoint filter first)."""
    import re

    taus = sorted(k for k in sd if k.endswith(".attn.tau"))
    if taus:
        raise NotImplementedError(
            f"this swinv2_cr checkpoint stores the paper's inverse-tau "
            f"temperature ({taus[:2]}...); convert it with timm's "
            "checkpoint filter (tau -> logit_scale) before loading"
        )
    out: dict = {}
    for k, v in sd.items():
        if k.endswith(("relative_coordinates_log", "attn_mask",
                       "num_batches_tracked")):
            continue
        k = k.replace("patch_embed.proj.", "patch_embed.")
        k = k.replace("patch_embed.norm.", "patch_norm.")
        m = re.match(r"stages\.(\d+)\.downsample\.(.*)$", k)
        if m:
            k = f"stages.{int(m.group(1)) - 1}.downsample.{m.group(2)}"
        k = k.replace(".attn.meta_mlp.fc1.", ".attn.cpb_fc1.")
        k = k.replace(".attn.meta_mlp.fc2.", ".attn.cpb_fc2.")
        if k.startswith("head.fc."):
            k = "head." + k[len("head.fc."):]
        if k.endswith(".attn.logit_scale") and getattr(v, "ndim", 0) == 1:
            v = np.asarray(v).reshape(-1, 1, 1)
        out[k] = v
    return out
