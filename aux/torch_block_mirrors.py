"""Minimal PURE-TORCH mirrors of three vision-zoo blocks, written to the
canonical upstream semantics (VERDICT r2 item 8) — NOT translated from the
JAX modules — so tests/test_vision_block_goldens.py can catch a silent
porting bug in the native zoo that self-paired tests would miss:

  * ``TorchConvNeXtBlock``   — facebookresearch/ConvNeXt Block: 7x7
    depthwise -> permute NHWC -> LayerNorm(1e-6) -> Linear 4x -> GELU ->
    Linear -> gamma scale -> permute back -> residual.
  * ``TorchSwinV2Block``     — official SwinV2 (microsoft/Swin-Transformer
    v2 / timm swin_transformer_v2) block: shifted-window partition,
    COSINE attention with per-head clamped-log temperature, continuous
    relative-position-bias MLP (2->512 ReLU -> heads, no out bias) with
    16*sigmoid, RESIDUAL POST-NORM, GELU MLP.  Upstream stores q/v biases
    with k-bias pinned to zero; the mirror takes a full qkv Linear and the
    paired test zeroes the k segment on both sides.
  * ``TorchAttention4D``     — snap-research EfficientFormerV2 final-stage
    token mixer: 1x1 conv+BN q/k/v, learned LeViT-style position biases,
    talking-head 1x1 convs across heads pre/post softmax, depthwise local
    enhancement on v, GELU, conv+BN projection.

Module/parameter names intentionally match the native modules so a native
``utils.state_dict`` loads directly via ``load_state_dict``.
"""

import numpy as np
import torch
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# ConvNeXt
# ---------------------------------------------------------------------------


class TorchConvNeXtBlock(torch.nn.Module):
    def __init__(self, dim, ls_init=1e-6):
        super().__init__()
        self.dwconv = torch.nn.Conv2d(dim, dim, 7, padding=3, groups=dim)
        self.norm = torch.nn.LayerNorm(dim, eps=1e-6)
        self.pwconv1 = torch.nn.Linear(dim, 4 * dim)
        self.pwconv2 = torch.nn.Linear(4 * dim, dim)
        self.gamma = torch.nn.Parameter(ls_init * torch.ones(dim))

    def forward(self, x):  # NCHW
        inp = x
        x = self.dwconv(x)
        x = x.permute(0, 2, 3, 1)
        x = self.norm(x)
        x = self.pwconv2(F.gelu(self.pwconv1(x)))
        x = self.gamma * x
        return inp + x.permute(0, 3, 1, 2)


# ---------------------------------------------------------------------------
# SwinV2
# ---------------------------------------------------------------------------


def _t_window_partition(x, w):
    b, h, wd, c = x.shape
    x = x.view(b, h // w, w, wd // w, w, c)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, w * w, c)


def _t_window_reverse(x, w, h, wd):
    b = x.shape[0] // ((h // w) * (wd // w))
    x = x.view(b, h // w, wd // w, w, w, -1)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(b, h, wd, -1)


class TorchWindowAttention(torch.nn.Module):
    def __init__(self, dim, n_heads, window, cpb_hidden=512):
        super().__init__()
        self.n_heads = n_heads
        self.window = window
        self.qkv = torch.nn.Linear(dim, 3 * dim)
        self.proj = torch.nn.Linear(dim, dim)
        self.logit_scale = torch.nn.Parameter(
            torch.log(10.0 * torch.ones(n_heads, 1, 1))
        )
        self.cpb_fc1 = torch.nn.Linear(2, cpb_hidden)
        self.cpb_fc2 = torch.nn.Linear(cpb_hidden, n_heads, bias=False)

        # official SwinV2 log-spaced relative-coordinates table
        coords = torch.arange(-(window - 1), window, dtype=torch.float32)
        table = torch.stack(
            torch.meshgrid(coords, coords, indexing="ij"), dim=-1
        ).reshape(-1, 2)
        if window > 1:
            table = table / (window - 1) * 8
        table = (
            torch.sign(table)
            * torch.log2(torch.abs(table) + 1.0)
            / np.log2(8)
        )
        self.register_buffer("rel_coords", table)

        c = torch.stack(
            torch.meshgrid(
                torch.arange(window), torch.arange(window), indexing="ij"
            )
        ).flatten(1)
        rel = c[:, :, None] - c[:, None, :] + (window - 1)
        self.register_buffer(
            "rel_index", (rel[0] * (2 * window - 1) + rel[1]).long()
        )

    def forward(self, x, mask=None):
        bw, n, d = x.shape
        qkv = (
            self.qkv(x)
            .reshape(bw, n, 3, self.n_heads, -1)
            .permute(2, 0, 3, 1, 4)
        )
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = F.normalize(q, dim=-1) @ F.normalize(k, dim=-1).transpose(
            -2, -1
        )
        logit_scale = torch.clamp(
            self.logit_scale, max=np.log(100.0)
        ).exp()
        attn = attn * logit_scale

        bias = self.cpb_fc2(F.relu(self.cpb_fc1(self.rel_coords)))
        bias = 16 * torch.sigmoid(bias)
        bias = bias[self.rel_index.reshape(-1)].reshape(n, n, -1)
        attn = attn + bias.permute(2, 0, 1).unsqueeze(0)

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(bw // nw, nw, self.n_heads, n, n) + mask[
                None, :, None
            ]
            attn = attn.view(bw, self.n_heads, n, n)
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(bw, n, d)
        return self.proj(out)


class TorchSwinV2Block(torch.nn.Module):
    def __init__(self, dim, n_heads, resolution, window, shift, mlp_ratio=4.0):
        super().__init__()
        self.resolution = resolution
        self.window = window
        self.shift = shift
        self.norm1 = torch.nn.LayerNorm(dim, eps=1e-5)
        self.attn = TorchWindowAttention(dim, n_heads, window)
        self.norm2 = torch.nn.LayerNorm(dim, eps=1e-5)

        class _MLP(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.fc1 = torch.nn.Linear(dim, int(dim * mlp_ratio))
                self.fc2 = torch.nn.Linear(int(dim * mlp_ratio), dim)

            def forward(self, x):
                return self.fc2(F.gelu(self.fc1(x)))

        self.mlp = _MLP()

        if shift > 0:
            h, w = resolution
            img = torch.zeros(1, h, w, 1)
            cnt = 0
            for hs in (
                slice(0, -window),
                slice(-window, -shift),
                slice(-shift, None),
            ):
                for ws in (
                    slice(0, -window),
                    slice(-window, -shift),
                    slice(-shift, None),
                ):
                    img[:, hs, ws, :] = cnt
                    cnt += 1
            win = _t_window_partition(img, window).reshape(-1, window * window)
            diff = win.unsqueeze(1) - win.unsqueeze(2)
            mask = torch.where(
                diff != 0, torch.tensor(-100.0), torch.tensor(0.0)
            )
            self.register_buffer("attn_mask", mask)
        else:
            self.attn_mask = None

    def forward(self, x):  # (B, N, C) tokens
        h, w = self.resolution
        b, n, c = x.shape
        shortcut = x
        x = x.view(b, h, w, c)
        if self.shift > 0:
            x = torch.roll(x, (-self.shift, -self.shift), dims=(1, 2))
        xw = _t_window_partition(x, self.window)
        xw = self.attn(xw, self.attn_mask)
        x = _t_window_reverse(xw, self.window, h, w)
        if self.shift > 0:
            x = torch.roll(x, (self.shift, self.shift), dims=(1, 2))
        # SwinV2 residual post-norm
        x = shortcut + self.norm1(x.view(b, n, c))
        return x + self.norm2(self.mlp(x))


class TorchWindowAttentionCr(torch.nn.Module):
    """timm ``swin_transformer_v2_cr.WindowMultiHeadAttention`` semantics:
    cosine attention with a per-head clamped log scale (same math as
    official), but the position bias comes from a ``meta_mlp``
    (2 -> 384 ReLU -> heads WITH an output bias) applied to ALL-PAIRS
    ``sign(Δ)·ln(1+|Δ|)`` coordinates — no (2w-1)² index table and no
    16*sigmoid squash.  Field names match the native module (cpb_fc1/fc2
    carry the meta MLP) so ``utils.state_dict`` loads directly."""

    def __init__(self, dim, n_heads, window, meta_hidden=384):
        super().__init__()
        self.n_heads = n_heads
        self.window = window
        self.qkv = torch.nn.Linear(dim, 3 * dim)
        self.proj = torch.nn.Linear(dim, dim)
        self.logit_scale = torch.nn.Parameter(
            torch.log(10.0 * torch.ones(n_heads, 1, 1))
        )
        self.cpb_fc1 = torch.nn.Linear(2, meta_hidden)
        self.cpb_fc2 = torch.nn.Linear(meta_hidden, n_heads, bias=True)

        # _make_pair_wise_relative_positions: all-pairs sign*ln(1+|d|)
        c = torch.stack(
            torch.meshgrid(
                torch.arange(window), torch.arange(window), indexing="ij"
            )
        ).flatten(1)
        rel = (c[:, :, None] - c[:, None, :]).permute(1, 2, 0)
        rel = rel.reshape(-1, 2).float()
        self.register_buffer(
            "rel_coords", torch.sign(rel) * torch.log1p(rel.abs())
        )

    def forward(self, x, mask=None):
        bw, n, d = x.shape
        qkv = (
            self.qkv(x)
            .reshape(bw, n, 3, self.n_heads, -1)
            .permute(2, 0, 3, 1, 4)
        )
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = F.normalize(q, dim=-1) @ F.normalize(k, dim=-1).transpose(
            -2, -1
        )
        attn = attn * torch.clamp(
            self.logit_scale, max=np.log(100.0)
        ).exp()
        bias = self.cpb_fc2(F.relu(self.cpb_fc1(self.rel_coords)))
        bias = bias.transpose(1, 0).reshape(self.n_heads, n, n)
        attn = attn + bias.unsqueeze(0)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(bw // nw, nw, self.n_heads, n, n) + mask[
                None, :, None
            ]
            attn = attn.view(bw, self.n_heads, n, n)
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(bw, n, d)
        return self.proj(out)


class TorchSwinV2CrBlock(torch.nn.Module):
    """timm ``SwinTransformerV2CrBlock``: post-norm branches
    (x + norm(op(x))) like official V2, cr attention, and — for the
    "_ns" variants — an extra main-branch ``norm3`` on each stage's last
    block."""

    def __init__(self, dim, n_heads, resolution, window, shift,
                 mlp_ratio=4.0, extra_norm=False):
        super().__init__()
        self.resolution = resolution
        self.window = window
        self.shift = shift
        self.norm1 = torch.nn.LayerNorm(dim, eps=1e-5)
        self.attn = TorchWindowAttentionCr(dim, n_heads, window)
        self.norm2 = torch.nn.LayerNorm(dim, eps=1e-5)
        self.norm3 = (
            torch.nn.LayerNorm(dim, eps=1e-5) if extra_norm else None
        )

        class _MLP(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.fc1 = torch.nn.Linear(dim, int(dim * mlp_ratio))
                self.fc2 = torch.nn.Linear(int(dim * mlp_ratio), dim)

            def forward(self, x):
                return self.fc2(F.gelu(self.fc1(x)))

        self.mlp = _MLP()

        if shift > 0:
            h, w = resolution
            img = torch.zeros(1, h, w, 1)
            cnt = 0
            for hs in (
                slice(0, -window),
                slice(-window, -shift),
                slice(-shift, None),
            ):
                for ws in (
                    slice(0, -window),
                    slice(-window, -shift),
                    slice(-shift, None),
                ):
                    img[:, hs, ws, :] = cnt
                    cnt += 1
            win = _t_window_partition(img, window).reshape(-1, window * window)
            diff = win.unsqueeze(1) - win.unsqueeze(2)
            mask = torch.where(
                diff != 0, torch.tensor(-100.0), torch.tensor(0.0)
            )
            self.register_buffer("attn_mask", mask)
        else:
            self.attn_mask = None

    def forward(self, x):  # (B, N, C) tokens
        h, w = self.resolution
        b, n, c = x.shape
        shortcut = x
        x = x.view(b, h, w, c)
        if self.shift > 0:
            x = torch.roll(x, (-self.shift, -self.shift), dims=(1, 2))
        xw = _t_window_partition(x, self.window)
        xw = self.attn(xw, self.attn_mask)
        x = _t_window_reverse(xw, self.window, h, w)
        if self.shift > 0:
            x = torch.roll(x, (self.shift, self.shift), dims=(1, 2))
        x = shortcut + self.norm1(x.view(b, n, c))
        x = x + self.norm2(self.mlp(x))
        if self.norm3 is not None:
            x = self.norm3(x)
        return x


# ---------------------------------------------------------------------------
# EfficientFormerV2 Attention4D
# ---------------------------------------------------------------------------


class TConvNorm(torch.nn.Module):
    def __init__(self, cin, cout, k, stride=1, padding=0, groups=1):
        super().__init__()
        self.conv = torch.nn.Conv2d(
            cin, cout, k, stride=stride, padding=padding, groups=groups,
            bias=False,
        )
        self.bn = torch.nn.BatchNorm2d(cout)

    def forward(self, x):
        return self.bn(self.conv(x))


class TorchAttention4D(torch.nn.Module):
    def __init__(self, dim, res, n_heads=8, key_dim=32, attn_ratio=4):
        super().__init__()
        self.n_heads = n_heads
        self.key_dim = key_dim
        self.res = res
        d = int(attn_ratio * key_dim)
        dh = d * n_heads
        self.d = d
        self.q = TConvNorm(dim, n_heads * key_dim, 1)
        self.k = TConvNorm(dim, n_heads * key_dim, 1)
        self.v = TConvNorm(dim, dh, 1)
        self.v_local = TConvNorm(dh, dh, 3, padding=1, groups=dh)
        self.talking_head1 = torch.nn.Conv2d(n_heads, n_heads, 1)
        self.talking_head2 = torch.nn.Conv2d(n_heads, n_heads, 1)
        self.proj = TConvNorm(dh, dim, 1)
        self.attention_biases = torch.nn.Parameter(
            torch.zeros(n_heads, res * res)
        )
        pts = [(i, j) for i in range(res) for j in range(res)]
        idx = torch.empty(len(pts), len(pts), dtype=torch.long)
        for a, p in enumerate(pts):
            for bq, q in enumerate(pts):
                idx[a, bq] = abs(p[0] - q[0]) * res + abs(p[1] - q[1])
        self.register_buffer("bias_idx", idx)

    def forward(self, x):  # NCHW
        b, _, h, w = x.shape
        n = h * w
        q = (
            self.q(x)
            .flatten(2)
            .reshape(b, self.n_heads, self.key_dim, n)
            .permute(0, 1, 3, 2)
        )
        k = self.k(x).flatten(2).reshape(b, self.n_heads, self.key_dim, n)
        vs = self.v(x)
        v = (
            vs.flatten(2)
            .reshape(b, self.n_heads, self.d, n)
            .permute(0, 1, 3, 2)
        )
        attn = (q @ k) * (self.key_dim ** -0.5)
        attn = attn + self.attention_biases[:, self.bias_idx].unsqueeze(0)
        attn = self.talking_head1(attn)
        attn = attn.softmax(dim=-1)
        attn = self.talking_head2(attn)
        out = (attn @ v).transpose(2, 3).reshape(b, -1, h, w)
        out = out + self.v_local(vs)
        return self.proj(F.gelu(out))
