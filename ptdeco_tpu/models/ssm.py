"""TPU-native state-space (Mamba) language models.

Covers the HF ``mamba`` / ``falcon_mamba`` (selective-scan, S6) and
``mamba2`` (state-space duality, SSD) causal LMs — the model families the
reference compresses via ``AutoModelForCausalLM``
(/root/reference/examples/trainer_llm/builder.py:97-107) whose compute
graph is NOT a transformer.  The numerics mirror transformers'
reference implementations (``MambaMixer.slow_forward``,
``Mamba2Mixer.torch_forward``, ``FalconMambaMixer.slow_forward``) and are
pinned by logits-parity tests on shared weights.

TPU-first choices:

* **mamba1** runs the first-order recurrence h_t = dA_t h_{t-1} + dBu_t
  through ``jax.lax.associative_scan`` — log-depth over the sequence
  instead of the reference's per-step Python loop, in f32.
* **mamba2** uses the chunked SSD formulation in which every heavy
  contraction is an einsum (MXU-tileable): the intra-chunk "attention"
  C·Bᵀ with an exp-segment-sum decay mask, per-chunk state accumulation,
  a tiny inter-chunk scan materialized as one (c+1)² decay matmul, and
  the state→output conversion.  The segment sum mirrors HF's
  masked-cumsum construction (not a cumsum difference) so the two
  implementations agree bit-for-bit in f32.
* The in/x/dt/out projections are plain ``nn.Linear`` pytree leaves, so
  the dwain/falor engines see them as decomposable sites with no extra
  plumbing; the depthwise conv is a dedicated parameter-holding module.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from .. import nn

__all__ = [
    "MambaConfig",
    "Mamba1Mixer",
    "Mamba2Mixer",
    "MambaBlock",
    "MambaBackbone",
    "MambaLM",
    "ShortConvMixer",
    "GatedDeltaNet",
    "RGLRU",
    "RecurrentBlock",
]


@dataclasses.dataclass(frozen=True)
class MambaConfig:
    vocab_size: int = 256
    dim: int = 64
    n_layers: int = 2
    d_inner: int = 128
    d_state: int = 16
    d_conv: int = 4
    version: int = 1  # 1 = mamba / falcon_mamba, 2 = mamba2
    # mamba1
    dt_rank: int = 4
    # falcon_mamba: affine-free RMS over dt/B/C after x_proj
    mixer_rms_eps: Optional[float] = None
    # jamba: AFFINE RMSNorms over the dt/B/C selection streams
    # (dt_layernorm / b_layernorm / c_layernorm, eps = rms_norm_eps)
    stream_norms: bool = False
    # mamba2
    n_heads: int = 4
    head_dim: int = 32
    n_groups: int = 1
    chunk_size: int = 256
    time_step_limit: tuple = (0.0, float("inf"))
    # falcon_h1 (mamba_rms_norm=False): skip the gated RMSNorm — the
    # scan output is just y * silu(gate) before out_proj
    gated_norm: bool = True
    conv_bias: bool = True
    proj_bias: bool = False
    norm_eps: float = 1e-5
    tie_embeddings: bool = True
    remat: bool = False
    dtype: Any = jnp.float32

    @staticmethod
    def from_hf_config(
        hf: dict[str, Any], dtype: Any = jnp.bfloat16, remat: bool = False
    ) -> "MambaConfig":
        """HF MambaConfig / FalconMambaConfig / Mamba2Config -> native."""
        mt = hf.get("model_type", "mamba")
        if mt not in ("mamba", "falcon_mamba", "mamba2"):
            raise ValueError(f"not a mamba-family config: {mt!r}")
        dim = int(hf["hidden_size"])
        inner = int(hf.get("intermediate_size") or int(hf.get("expand", 2)) * dim)
        act = hf.get("hidden_act", "silu")
        if act != "silu":
            raise ValueError(f"mamba hidden_act={act!r} is not implemented")
        common = dict(
            vocab_size=int(hf["vocab_size"]),
            dim=dim,
            n_layers=int(hf["num_hidden_layers"]),
            d_inner=inner,
            d_state=int(hf.get("state_size", 16)),
            d_conv=int(hf.get("conv_kernel", 4)),
            conv_bias=bool(hf.get("use_conv_bias", True)),
            proj_bias=bool(hf.get("use_bias", False)),
            norm_eps=float(hf.get("layer_norm_epsilon", 1e-5)),
            tie_embeddings=bool(hf.get("tie_word_embeddings", True)),
            remat=remat,
            dtype=dtype,
        )
        if mt == "mamba2":
            tsl = hf.get("time_step_limit") or (0.0, float("inf"))
            return MambaConfig(
                version=2,
                n_heads=int(hf["num_heads"]),
                head_dim=int(hf.get("head_dim", 64)),
                n_groups=int(hf.get("n_groups", 1)),
                chunk_size=int(hf.get("chunk_size", 256)),
                time_step_limit=(float(tsl[0]), float(tsl[1])),
                **common,
            )
        tr = hf.get("time_step_rank", "auto")
        dt_rank = (dim + 15) // 16 if tr in (None, "auto") else int(tr)
        rms_eps = (
            float(hf.get("mixer_rms_eps", 1e-6))
            if mt == "falcon_mamba"
            else None
        )
        return MambaConfig(
            version=1, dt_rank=dt_rank, mixer_rms_eps=rms_eps, **common
        )


class DepthwiseConv1d(nn.Module):
    """Causal depthwise 1D convolution over the sequence axis (torch
    ``nn.Conv1d(ch, ch, k, groups=ch, padding=k-1)`` truncated to seq_len).
    ``weight`` keeps the torch ``(ch, k)`` layout (the singleton group dim
    squeezed by the checkpoint translator)."""

    weight: jax.Array  # (ch, k)
    bias: Optional[jax.Array] = None

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        # x: (b, s, ch).  k is tiny (4): an unrolled shift-multiply-add
        # fuses into elementwise ops instead of a grouped conv dispatch.
        k = self.weight.shape[1]
        out = x * self.weight[:, k - 1]
        for i in range(1, k):
            shifted = jnp.pad(x[:, :-i], ((0, 0), (i, 0), (0, 0)))
            out = out + shifted * self.weight[:, k - 1 - i]
        if self.bias is not None:
            out = out + self.bias
        return out

    def with_state(
        self, x: jax.Array, state: jax.Array
    ) -> tuple[jax.Array, jax.Array]:
        """Stateful form for KV-cache-style decoding (serving.py): ``state``
        is the (b, k-1, ch) tail of the true input history (zeros at
        stream start — then bit-identical to the plain causal call).
        Returns (outputs for the x positions, new state)."""
        k = self.weight.shape[1]
        full = jnp.concatenate([state.astype(x.dtype), x], axis=1)
        out = full * self.weight[:, k - 1]
        for i in range(1, k):
            shifted = jnp.pad(full[:, :-i], ((0, 0), (i, 0), (0, 0)))
            out = out + shifted * self.weight[:, k - 1 - i]
        if self.bias is not None:
            out = out + self.bias
        return out[:, k - 1 :], full[:, full.shape[1] - (k - 1) :]

    @staticmethod
    def create(
        key: jax.Array, ch: int, k: int, bias: bool, dtype: Any
    ) -> "DepthwiseConv1d":
        scale = (1.0 / k) ** 0.5
        return DepthwiseConv1d(
            weight=jax.random.uniform(
                key, (ch, k), dtype, minval=-scale, maxval=scale
            ),
            bias=jnp.zeros((ch,), dtype) if bias else None,
        )


def _rms_no_affine(x: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class Mamba1Mixer(nn.Module):
    """Selective-scan S6 mixer (HF MambaMixer.slow_forward semantics;
    FalconMambaMixer when ``mixer_rms_eps`` is set — affine-free RMS over
    the dt/B/C selection streams).  The recurrence runs as a log-depth
    ``jax.lax.associative_scan`` in f32."""

    in_proj: nn.Linear  # dim -> 2*d_inner
    conv1d: DepthwiseConv1d
    x_proj: nn.Linear  # d_inner -> dt_rank + 2*d_state
    dt_proj: nn.Linear  # dt_rank -> d_inner
    A_log: jax.Array  # (d_inner, d_state)
    D: jax.Array  # (d_inner,)
    out_proj: nn.Linear  # d_inner -> dim
    # jamba: affine RMSNorms over the selection streams
    dt_layernorm: Optional[nn.RMSNorm] = None
    b_layernorm: Optional[nn.RMSNorm] = None
    c_layernorm: Optional[nn.RMSNorm] = None
    d_inner: int = nn.static_field(default=128)
    d_state: int = nn.static_field(default=16)
    dt_rank: int = nn.static_field(default=4)
    mixer_rms_eps: Optional[float] = nn.static_field(default=None)

    def __call__(
        self,
        x: jax.Array,
        ctx: Optional[nn.Ctx] = None,
        *,
        positions: Optional[jax.Array] = None,
        attn_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        return self.forward_with_state(x, ctx, attn_mask=attn_mask)[0]

    def init_state(
        self, batch_size: int, dtype: Any
    ) -> tuple[jax.Array, jax.Array]:
        k = self.conv1d.weight.shape[1]
        return (
            jnp.zeros((batch_size, k - 1, self.d_inner), dtype),
            jnp.zeros(
                (batch_size, self.d_inner, self.d_state), jnp.float32
            ),
        )

    def forward_with_state(
        self,
        x: jax.Array,
        ctx: Optional[nn.Ctx] = None,
        conv_state: Optional[jax.Array] = None,
        ssm_state: Optional[jax.Array] = None,
        *,
        positions: Optional[jax.Array] = None,
        attn_mask: Optional[jax.Array] = None,
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """Stateful forward for KV-cache-style decoding (serving.py):
        ``conv_state`` (b, d_conv-1, d_inner) is the conv-input tail,
        ``ssm_state`` (b, d_inner, d_state) f32 the recurrence state.
        None states mean stream start (zeros) — then the output is
        bit-identical to the stateless call, which delegates here.  The
        initial recurrence state folds into the associative scan's
        cumulative decay (hs_t += (prod dA)_t * s0).  Returns
        (y, new_conv_state, new_ssm_state)."""
        b, s, _ = x.shape
        proj = self.in_proj(x, ctx)  # (b, s, 2*d_inner)
        h, gate = jnp.split(proj, 2, axis=-1)
        if attn_mask is not None:
            h = h * attn_mask[..., None].astype(h.dtype)
        k = self.conv1d.weight.shape[1]
        if conv_state is None:
            conv_state = jnp.zeros((b, k - 1, self.d_inner), h.dtype)
        h, new_conv_state = self.conv1d.with_state(h, conv_state)
        h = jax.nn.silu(h)
        if attn_mask is not None:
            h = h * attn_mask[..., None].astype(h.dtype)
        sel = self.x_proj(h, ctx)
        dt, B, C = jnp.split(
            sel, [self.dt_rank, self.dt_rank + self.d_state], axis=-1
        )
        if self.mixer_rms_eps is not None:  # falcon_mamba
            dt = _rms_no_affine(dt, self.mixer_rms_eps)
            B = _rms_no_affine(B, self.mixer_rms_eps)
            C = _rms_no_affine(C, self.mixer_rms_eps)
        if self.dt_layernorm is not None:  # jamba
            dt = self.dt_layernorm(dt, ctx)
            B = self.b_layernorm(B, ctx)
            C = self.c_layernorm(C, ctx)
        dt = jax.nn.softplus(self.dt_proj(dt, ctx))  # (b, s, d_inner)
        A = -jnp.exp(self.A_log.astype(jnp.float32))  # (d_inner, d_state)
        dtf = dt.astype(jnp.float32)
        dA = jnp.exp(dtf[..., None] * A[None, None])  # (b, s, di, n)
        dBu = (
            dtf[..., None]
            * B.astype(jnp.float32)[:, :, None, :]
            * h.astype(jnp.float32)[..., None]
        )

        def comb(left, right):
            aL, bL = left
            aR, bR = right
            return aL * aR, bL * aR + bR

        a_cum, hs = jax.lax.associative_scan(comb, (dA, dBu), axis=1)
        if ssm_state is not None:
            hs = hs + a_cum * ssm_state.astype(jnp.float32)[:, None]
        new_ssm_state = hs[:, -1]
        y = jnp.einsum(
            "bsdn,bsn->bsd", hs.astype(x.dtype), C
        ) + h * self.D[None, None]
        y = y * jax.nn.silu(gate)
        return self.out_proj(y, ctx), new_conv_state, new_ssm_state

    @staticmethod
    def create(key: jax.Array, cfg: MambaConfig) -> "Mamba1Mixer":
        ks = jax.random.split(key, 5)
        A = jnp.broadcast_to(
            jnp.arange(1, cfg.d_state + 1, dtype=jnp.float32)[None, :],
            (cfg.d_inner, cfg.d_state),
        )
        return Mamba1Mixer(
            in_proj=nn.Linear.create(
                ks[0], cfg.dim, 2 * cfg.d_inner, cfg.proj_bias, cfg.dtype
            ),
            conv1d=DepthwiseConv1d.create(
                ks[1], cfg.d_inner, cfg.d_conv, cfg.conv_bias, cfg.dtype
            ),
            x_proj=nn.Linear.create(
                ks[2],
                cfg.d_inner,
                cfg.dt_rank + 2 * cfg.d_state,
                False,
                cfg.dtype,
            ),
            dt_proj=nn.Linear.create(
                ks[3], cfg.dt_rank, cfg.d_inner, True, cfg.dtype
            ),
            A_log=jnp.log(A),
            D=jnp.ones((cfg.d_inner,), cfg.dtype),
            out_proj=nn.Linear.create(
                ks[4], cfg.d_inner, cfg.dim, cfg.proj_bias, cfg.dtype
            ),
            dt_layernorm=(
                nn.RMSNorm.create(cfg.dt_rank, cfg.norm_eps, cfg.dtype)
                if cfg.stream_norms
                else None
            ),
            b_layernorm=(
                nn.RMSNorm.create(cfg.d_state, cfg.norm_eps, cfg.dtype)
                if cfg.stream_norms
                else None
            ),
            c_layernorm=(
                nn.RMSNorm.create(cfg.d_state, cfg.norm_eps, cfg.dtype)
                if cfg.stream_norms
                else None
            ),
            d_inner=cfg.d_inner,
            d_state=cfg.d_state,
            dt_rank=cfg.dt_rank,
            mixer_rms_eps=cfg.mixer_rms_eps,
        )


def _segsum(a: jax.Array) -> jax.Array:
    """HF Mamba2 segment_sum: out[..., i, j] = sum_{k=j+1..i} a_k for
    i >= j, -inf otherwise — built by masked cumsum (NOT a difference of
    cumsums) so the f32 numerics match transformers exactly."""
    cs = a.shape[-1]
    i = jnp.arange(cs)
    keep = i[:, None] > i[None, :]
    x = jnp.where(keep, a[..., :, None], 0.0)
    s = jnp.cumsum(x, axis=-2)
    return jnp.where(i[:, None] >= i[None, :], s, -jnp.inf)


class Mamba2Mixer(nn.Module):
    """SSD mixer (HF Mamba2Mixer.torch_forward semantics): fused in_proj
    split into (gate, conv stream, dt), depthwise conv over the
    (x, B, C) stream, scalar-per-head A, chunked state-space duality in
    f32 einsums, gated RMSNorm before out_proj."""

    in_proj: nn.Linear  # dim -> 2*d_inner + 2*G*n + H
    conv1d: DepthwiseConv1d  # over d_inner + 2*G*n channels
    dt_bias: jax.Array  # (H,)
    A_log: jax.Array  # (H,)
    D: jax.Array  # (H,)
    # gated RMSNorm applied to y * silu(gate); None for falcon_h1's
    # mamba_rms_norm=False flavor
    norm: Optional[nn.RMSNorm]
    out_proj: nn.Linear
    d_inner: int = nn.static_field(default=128)
    d_state: int = nn.static_field(default=16)
    n_heads: int = nn.static_field(default=4)
    head_dim: int = nn.static_field(default=32)
    n_groups: int = nn.static_field(default=1)
    chunk_size: int = nn.static_field(default=256)
    time_step_limit: tuple = nn.static_field(default=(0.0, float("inf")))

    def __call__(
        self,
        x: jax.Array,
        ctx: Optional[nn.Ctx] = None,
        *,
        positions: Optional[jax.Array] = None,
        attn_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        return self.forward_with_state(x, ctx, attn_mask=attn_mask)[0]

    def init_state(
        self, batch_size: int, dtype: Any
    ) -> tuple[jax.Array, jax.Array]:
        k = self.conv1d.weight.shape[1]
        conv_dim = self.d_inner + 2 * self.n_groups * self.d_state
        return (
            jnp.zeros((batch_size, k - 1, conv_dim), dtype),
            jnp.zeros(
                (batch_size, self.n_heads, self.head_dim, self.d_state),
                jnp.float32,
            ),
        )

    def forward_with_state(
        self,
        x: jax.Array,
        ctx: Optional[nn.Ctx] = None,
        conv_state: Optional[jax.Array] = None,
        ssm_state: Optional[jax.Array] = None,
        *,
        positions: Optional[jax.Array] = None,
        attn_mask: Optional[jax.Array] = None,
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """Stateful forward for KV-cache-style decoding (serving.py):
        ``conv_state`` (b, d_conv-1, d_inner + 2*G*N) is the conv-input
        tail over the fused (x, B, C) stream, ``ssm_state`` (b, H, P, N)
        f32 the SSD state.  None states mean stream start (zeros) — then
        the output is bit-identical to the stateless call, which
        delegates here.  The initial state enters the chunked SSD exactly
        where the zero block sat in the inter-chunk recurrence (HF's
        cached torch_forward does the same concat).  Returns
        (y, new_conv_state, new_ssm_state); tail padding contributes
        decay exp(0)=1 and zero input, so the final state is the state
        after the last REAL token."""
        b, s, _ = x.shape
        H, P, G, N = self.n_heads, self.head_dim, self.n_groups, self.d_state
        if attn_mask is not None:
            x = x * attn_mask[..., None].astype(x.dtype)
        proj = self.in_proj(x, ctx)
        conv_dim = self.d_inner + 2 * G * N
        gate, hBC, dt = jnp.split(
            proj, [self.d_inner, self.d_inner + conv_dim], axis=-1
        )
        if conv_state is None:
            conv_state = jnp.zeros(
                (b, self.conv1d.weight.shape[1] - 1, conv_dim), hBC.dtype
            )
        hBC, new_conv_state = self.conv1d.with_state(hBC, conv_state)
        hBC = jax.nn.silu(hBC)
        if attn_mask is not None:
            hBC = hBC * attn_mask[..., None].astype(hBC.dtype)
        h, B, C = jnp.split(
            hBC, [self.d_inner, self.d_inner + G * N], axis=-1
        )
        dtf = jax.nn.softplus(
            dt.astype(jnp.float32) + self.dt_bias.astype(jnp.float32)
        )
        lo, hi = self.time_step_limit
        if lo != 0.0 or hi != float("inf"):
            dtf = jnp.clip(dtf, lo, hi)
        A = -jnp.exp(self.A_log.astype(jnp.float32))  # (H,)
        hf = h.astype(jnp.float32).reshape(b, s, H, P)
        rep = H // G
        Bf = jnp.repeat(
            B.astype(jnp.float32).reshape(b, s, G, N), rep, axis=2
        )
        Cf = jnp.repeat(
            C.astype(jnp.float32).reshape(b, s, G, N), rep, axis=2
        )
        cs = self.chunk_size
        pad = (-s) % cs
        D_residual = self.D.astype(jnp.float32)[:, None] * jnp.pad(
            hf, ((0, 0), (0, pad), (0, 0), (0, 0))
        )
        xdt = hf * dtf[..., None]  # discretized values
        a = A[None, None, :] * dtf  # (b, s, H)

        def chunks(t):
            t = jnp.pad(
                t, [(0, 0), (0, pad)] + [(0, 0)] * (t.ndim - 2)
            )
            return t.reshape(b, -1, cs, *t.shape[2:])

        xc, ac, Bc, Cc = chunks(xdt), chunks(a), chunks(Bf), chunks(Cf)
        ac = ac.transpose(0, 3, 1, 2)  # (b, H, c, l)
        a_cs = jnp.cumsum(ac, axis=-1)
        L = jnp.exp(_segsum(ac))  # (b, H, c, l, l)
        # intra-chunk: the "attention" path, all MXU einsums
        Y_diag = jnp.einsum(
            "bclhn,bcshn,bhcls,bcshp->bclhp", Cc, Bc, L, xc
        )
        decay_states = jnp.exp(a_cs[..., -1:] - a_cs)  # (b, H, c, l)
        states = jnp.einsum(
            "bclhn,bhcl,bclhp->bchpn", Bc, decay_states, xc
        )
        a_last = jnp.pad(a_cs[..., -1], ((0, 0), (0, 0), (1, 0)))
        decay_chunk = jnp.exp(_segsum(a_last))  # (b, H, c+1, c+1)
        init = (
            jnp.zeros_like(states[:, :1])
            if ssm_state is None
            else ssm_state.astype(jnp.float32)[:, None]
        )
        states = jnp.concatenate([init, states], axis=1)  # (b, c+1, H, P, N)
        new_states = jnp.einsum("bhij,bjhpn->bihpn", decay_chunk, states)
        prev_states = new_states[:, :-1]  # state entering each chunk
        new_ssm_state = new_states[:, -1]  # state after the last token
        state_decay_out = jnp.exp(a_cs)  # (b, H, c, l)
        Y_off = jnp.einsum(
            "bclhn,bchpn,bhcl->bclhp", Cc, prev_states, state_decay_out
        )
        y = (Y_diag + Y_off).reshape(b, -1, H, P) + D_residual
        if pad:
            y = y[:, :s]
        y = y.reshape(b, s, H * P).astype(x.dtype)
        y = y * jax.nn.silu(gate)
        if self.norm is not None:
            y = self.norm(y, ctx)
        return self.out_proj(y, ctx), new_conv_state, new_ssm_state

    @staticmethod
    def create(key: jax.Array, cfg: MambaConfig) -> "Mamba2Mixer":
        ks = jax.random.split(key, 3)
        conv_dim = cfg.d_inner + 2 * cfg.n_groups * cfg.d_state
        return Mamba2Mixer(
            in_proj=nn.Linear.create(
                ks[0],
                cfg.dim,
                2 * cfg.d_inner + 2 * cfg.n_groups * cfg.d_state + cfg.n_heads,
                cfg.proj_bias,
                cfg.dtype,
            ),
            conv1d=DepthwiseConv1d.create(
                ks[1], conv_dim, cfg.d_conv, cfg.conv_bias, cfg.dtype
            ),
            dt_bias=jnp.ones((cfg.n_heads,), cfg.dtype),
            A_log=jnp.log(
                jnp.arange(1, cfg.n_heads + 1, dtype=jnp.float32)
            ),
            D=jnp.ones((cfg.n_heads,), cfg.dtype),
            norm=(
                nn.RMSNorm.create(cfg.d_inner, cfg.norm_eps, cfg.dtype)
                if cfg.gated_norm
                else None
            ),
            out_proj=nn.Linear.create(
                ks[2], cfg.d_inner, cfg.dim, cfg.proj_bias, cfg.dtype
            ),
            d_inner=cfg.d_inner,
            d_state=cfg.d_state,
            n_heads=cfg.n_heads,
            head_dim=cfg.head_dim,
            n_groups=cfg.n_groups,
            chunk_size=cfg.chunk_size,
            time_step_limit=cfg.time_step_limit,
        )


def _l2norm(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    # FLA l2norm: sum (not mean) of squares
    return x * jax.lax.rsqrt(
        jnp.sum(jnp.square(x), axis=-1, keepdims=True) + eps
    )


def _gated_delta_rule(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    g: jax.Array,
    beta: jax.Array,
    chunk_size: int = 64,
    init_state: Optional[jax.Array] = None,
) -> tuple[jax.Array, jax.Array]:
    """Chunked gated delta rule (HF torch_chunk_gated_delta_rule
    semantics, qk-L2-normalized): per-chunk the strictly-lower
    "attention" system (I - T)^{-1} is solved as a unit-lower triangular
    solve instead of the reference's Python forward-substitution loop,
    and the inter-chunk matrix-state recurrence runs under lax.scan with
    chunk-level matmuls.  All math f32.

    q/k: (b, s, H, dk); v: (b, s, H, dv); g/beta: (b, s, H).
    ``init_state`` (b, H, dk, dv) f32 enters the inter-chunk scan as the
    carry's start value (HF's cached initial_state form); tail padding
    contributes decay exp(0)=1 and zero k/v, so the returned final state
    is the state after the last REAL token.  Returns (out, final_state).
    """
    b, s, H, dk = q.shape
    dv = v.shape[-1]
    q = _l2norm(q.astype(jnp.float32))
    k = _l2norm(k.astype(jnp.float32))
    v = v.astype(jnp.float32)
    g = g.astype(jnp.float32)
    beta = beta.astype(jnp.float32)
    cs = chunk_size
    pad = (-s) % cs
    nc = (s + pad) // cs

    def chunks(t):
        t = jnp.pad(t, [(0, 0), (0, pad)] + [(0, 0)] * (t.ndim - 2))
        # to (b, H, nc, cs, ...)
        t = t.reshape(b, nc, cs, *t.shape[2:])
        return jnp.moveaxis(t, 3, 1) if t.ndim == 5 else t.transpose(0, 3, 1, 2)

    q = chunks(q * (dk**-0.5))  # (b, H, nc, cs, dk)
    kc = chunks(k)
    vb = chunks(v * beta[..., None])
    kb = chunks(k * beta[..., None])
    gc = jnp.cumsum(chunks(g), axis=-1)  # (b, H, nc, cs)
    i = jnp.arange(cs)
    lower = i[:, None] >= i[None, :]
    strict = i[:, None] > i[None, :]
    decay = jnp.where(
        lower, jnp.exp(gc[..., :, None] - gc[..., None, :]), 0.0
    )  # (b, H, nc, cs, cs)
    T = jnp.where(
        strict,
        -jnp.einsum("bhnid,bhnjd->bhnij", kb, kc) * decay,
        0.0,
    )
    eye = jnp.eye(cs, dtype=jnp.float32)
    # M = (I - T)^{-1}, unit lower triangular — the reference's row loop
    # IS forward substitution for exactly this system
    M = jax.scipy.linalg.solve_triangular(
        eye - T, jnp.broadcast_to(eye, T.shape), lower=True,
        unit_diagonal=True,
    )
    v_star = jnp.einsum("bhnij,bhnjd->bhnid", M, vb)
    k_cumdecay = jnp.einsum(
        "bhnij,bhnjd->bhnid", M, kb * jnp.exp(gc)[..., None]
    )
    g_last = gc[..., -1]  # (b, H, nc)

    def step(S, xs):
        q_i, k_i, vs_i, kcd_i, gc_i, gl_i, dec_i = xs
        attn = jnp.where(
            lower, jnp.einsum("bhid,bhjd->bhij", q_i, k_i) * dec_i, 0.0
        )
        v_new = vs_i - jnp.einsum("bhid,bhde->bhie", kcd_i, S)
        out_i = (
            jnp.einsum("bhid,bhde->bhie", q_i * jnp.exp(gc_i)[..., None], S)
            + jnp.einsum("bhij,bhjd->bhid", attn, v_new)
        )
        S = S * jnp.exp(gl_i)[..., None, None] + jnp.einsum(
            "bhjd,bhje->bhde",
            k_i * jnp.exp(gl_i[..., None] - gc_i)[..., None],
            v_new,
        )
        return S, out_i

    xs = tuple(
        jnp.moveaxis(t, 2, 0)
        for t in (q, kc, v_star, k_cumdecay, gc, g_last, decay)
    )
    S0 = (
        jnp.zeros((b, H, dk, dv), jnp.float32)
        if init_state is None
        else init_state.astype(jnp.float32)
    )
    S_fin, outs = jax.lax.scan(step, S0, xs)
    out = jnp.moveaxis(outs, 0, 2)  # (b, H, nc, cs, dv)
    out = out.reshape(b, H, nc * cs, dv)[:, :, :s]
    return out.transpose(0, 2, 1, 3), S_fin  # (b, s, H, dv), (b, H, dk, dv)


class GatedDeltaNet(nn.Module):
    """Qwen3Next gated DeltaNet mixer (HF Qwen3NextGatedDeltaNet with the
    torch chunked kernel's semantics): fused qkvz projection in the
    per-key-head interleaved layout, a silu'd causal depthwise conv over
    (q, k, v), beta = sigmoid(b), per-head decay g = -exp(A_log) *
    softplus(a + dt_bias), the chunked gated delta rule, and a per-v-head
    gated RMSNorm (norm THEN weight THEN silu(z))."""

    in_proj_qkvz: nn.Linear
    in_proj_ba: nn.Linear
    conv1d: DepthwiseConv1d
    dt_bias: jax.Array  # (n_v_heads,)
    A_log: jax.Array  # (n_v_heads,)
    norm: nn.RMSNorm  # per v head (head_v_dim)
    out_proj: nn.Linear
    n_k_heads: int = nn.static_field(default=4)
    n_v_heads: int = nn.static_field(default=8)
    head_k_dim: int = nn.static_field(default=32)
    head_v_dim: int = nn.static_field(default=32)
    chunk_size: int = nn.static_field(default=64)

    def __call__(
        self,
        x: jax.Array,
        ctx: Optional[nn.Ctx] = None,
        *,
        positions: Optional[jax.Array] = None,
        attn_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        return self.forward_with_state(x, ctx, attn_mask=attn_mask)[0]

    def init_state(
        self, batch_size: int, dtype: Any
    ) -> tuple[jax.Array, jax.Array]:
        key_dim = self.n_k_heads * self.head_k_dim
        conv_dim = 2 * key_dim + self.n_v_heads * self.head_v_dim
        k = self.conv1d.weight.shape[1]
        return (
            jnp.zeros((batch_size, k - 1, conv_dim), dtype),
            jnp.zeros(
                (
                    batch_size,
                    self.n_v_heads,
                    self.head_k_dim,
                    self.head_v_dim,
                ),
                jnp.float32,
            ),
        )

    def forward_with_state(
        self,
        x: jax.Array,
        ctx: Optional[nn.Ctx] = None,
        conv_state: Optional[jax.Array] = None,
        rec_state: Optional[jax.Array] = None,
        *,
        positions: Optional[jax.Array] = None,
        attn_mask: Optional[jax.Array] = None,
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """Stateful forward for KV-cache-style decoding: conv tail over
        the fused (q, k, v) stream + the (b, nv, hk, hv) f32 delta-rule
        matrix state.  None states = stream start (the stateless call
        delegates here, bit-identical)."""
        b, s, _ = x.shape
        nk, nv = self.n_k_heads, self.n_v_heads
        hk, hv = self.head_k_dim, self.head_v_dim
        r = nv // nk
        if attn_mask is not None:
            x = x * attn_mask[..., None].astype(x.dtype)
        qkvz = self.in_proj_qkvz(x, ctx).reshape(
            b, s, nk, 2 * hk + 2 * r * hv
        )
        ba = self.in_proj_ba(x, ctx).reshape(b, s, nk, 2 * r)
        q, k, vz = (
            qkvz[..., :hk],
            qkvz[..., hk : 2 * hk],
            qkvz[..., 2 * hk :],
        )
        v = vz[..., : r * hv].reshape(b, s, nv, hv)
        z = vz[..., r * hv :].reshape(b, s, nv, hv)
        b_, a = ba[..., :r].reshape(b, s, nv), ba[..., r:].reshape(b, s, nv)
        mixed = jnp.concatenate(
            [q.reshape(b, s, -1), k.reshape(b, s, -1), v.reshape(b, s, -1)],
            axis=-1,
        )
        if conv_state is None:
            conv_state = jnp.zeros(
                (b, self.conv1d.weight.shape[1] - 1, mixed.shape[-1]),
                mixed.dtype,
            )
        mixed, new_conv_state = self.conv1d.with_state(mixed, conv_state)
        mixed = jax.nn.silu(mixed)
        q, k, v = jnp.split(mixed, [nk * hk, 2 * nk * hk], axis=-1)
        q = q.reshape(b, s, nk, hk)
        k = k.reshape(b, s, nk, hk)
        v = v.reshape(b, s, nv, hv)
        beta = jax.nn.sigmoid(b_.astype(jnp.float32))
        g = -jnp.exp(self.A_log.astype(jnp.float32)) * jax.nn.softplus(
            a.astype(jnp.float32) + self.dt_bias.astype(jnp.float32)
        )
        if r > 1:
            q = jnp.repeat(q, r, axis=2)
            k = jnp.repeat(k, r, axis=2)
        core, new_rec_state = _gated_delta_rule(
            q, k, v, g, beta, self.chunk_size, rec_state
        )
        core = core.astype(x.dtype)
        # gated per-head RMSNorm: norm -> weight -> * silu(z)
        y = self.norm(core, ctx) * jax.nn.silu(
            z.astype(jnp.float32)
        ).astype(x.dtype)
        return (
            self.out_proj(y.reshape(b, s, nv * hv), ctx),
            new_conv_state,
            new_rec_state,
        )

    @staticmethod
    def create(
        key: jax.Array,
        dim: int,
        n_k_heads: int,
        n_v_heads: int,
        head_k_dim: int,
        head_v_dim: int,
        conv_kernel: int,
        norm_eps: float,
        dtype: Any,
    ) -> "GatedDeltaNet":
        ks = jax.random.split(key, 4)
        key_dim = n_k_heads * head_k_dim
        value_dim = n_v_heads * head_v_dim
        return GatedDeltaNet(
            in_proj_qkvz=nn.Linear.create(
                ks[0], dim, 2 * key_dim + 2 * value_dim, False, dtype
            ),
            in_proj_ba=nn.Linear.create(
                ks[1], dim, 2 * n_v_heads, False, dtype
            ),
            conv1d=DepthwiseConv1d.create(
                ks[2], 2 * key_dim + value_dim, conv_kernel, False, dtype
            ),
            dt_bias=jnp.ones((n_v_heads,), dtype),
            A_log=jnp.log(
                jnp.linspace(1.0, 15.0, n_v_heads, dtype=jnp.float32)
            ),
            norm=nn.RMSNorm.create(head_v_dim, norm_eps, dtype),
            out_proj=nn.Linear.create(ks[3], value_dim, dim, False, dtype),
            n_k_heads=n_k_heads,
            n_v_heads=n_v_heads,
            head_k_dim=head_k_dim,
            head_v_dim=head_v_dim,
        )


class RGLRU(nn.Module):
    """RecurrentGemma's real-gated linear recurrent unit (HF
    RecurrentGemmaRglru): per-head BLOCK-DIAGONAL sigmoid input/
    recurrence gates, a = exp(-8 * gate * softplus(c)), inputs scaled by
    sqrt(1 - a^2) (1 at position 0), and the diagonal recurrence
    h_t = a_t h_{t-1} + x_t as a log-depth associative scan in f32."""

    recurrent_param: jax.Array  # (lru_width,)
    input_gate_weight: jax.Array  # (H, bw, bw)
    input_gate_bias: jax.Array  # (H, bw)
    recurrent_gate_weight: jax.Array
    recurrent_gate_bias: jax.Array
    n_heads: int = nn.static_field(default=4)

    def __call__(
        self,
        x: jax.Array,
        positions: jax.Array,
        h0: Optional[jax.Array] = None,
    ) -> tuple[jax.Array, jax.Array]:
        """Returns (hidden states, final f32 state).  ``h0`` (b, lru) f32
        is the recurrence state entering this chunk — it folds into the
        scan via the cumulative decay (and a position-0 reset zeroes the
        decay, so a stream-start chunk ignores it exactly)."""
        b, s, lru = x.shape
        H = self.n_heads
        bw = lru // H
        xh = x.reshape(b, s, H, bw)
        ig = jax.nn.sigmoid(
            jnp.einsum("bshw,hwv->bshv", xh, self.input_gate_weight)
            + self.input_gate_bias
        ).reshape(b, s, lru)
        rg = jax.nn.sigmoid(
            jnp.einsum("bshw,hwv->bshv", xh, self.recurrent_gate_weight)
            + self.recurrent_gate_bias
        ).reshape(b, s, lru)
        log_a = (
            -8.0
            * rg.astype(jnp.float32)
            * jax.nn.softplus(self.recurrent_param.astype(jnp.float32))
        )
        a = jnp.exp(log_a)
        reset = (positions == 0)[..., None]  # (b, s, 1)
        mult = jnp.where(reset, 1.0, jnp.sqrt(1.0 - jnp.exp(2.0 * log_a)))
        xn = (x * ig).astype(jnp.float32) * mult
        a = jnp.where(reset, 0.0, a)

        def comb(left, right):
            aL, hL = left
            aR, hR = right
            return aL * aR, hL * aR + hR

        a_cum, h = jax.lax.associative_scan(comb, (a, xn), axis=1)
        if h0 is not None:
            h = h + a_cum * h0.astype(jnp.float32)[:, None, :]
        return h.astype(x.dtype), h[:, -1]


class RecurrentBlock(nn.Module):
    """Griffin temporal block (HF RecurrentGemmaRecurrentBlock):
    linear_y -> act gate; linear_x -> causal depthwise conv -> RG-LRU;
    product -> linear_out.  All three Linears carry biases."""

    linear_y: nn.Linear
    linear_x: nn.Linear
    linear_out: nn.Linear
    conv_1d: DepthwiseConv1d
    rg_lru: RGLRU

    def __call__(
        self,
        x: jax.Array,
        ctx: Optional[nn.Ctx] = None,
        *,
        positions: Optional[jax.Array] = None,
        attn_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        return self.forward_with_state(
            x, ctx, positions=positions, attn_mask=attn_mask
        )[0]

    def init_state(
        self, batch_size: int, dtype: Any
    ) -> tuple[jax.Array, jax.Array]:
        lru = self.rg_lru.recurrent_param.shape[0]
        k = self.conv_1d.weight.shape[1]
        return (
            jnp.zeros((batch_size, k - 1, lru), dtype),
            jnp.zeros((batch_size, lru), jnp.float32),
        )

    def forward_with_state(
        self,
        x: jax.Array,
        ctx: Optional[nn.Ctx] = None,
        conv_state: Optional[jax.Array] = None,
        rec_state: Optional[jax.Array] = None,
        *,
        positions: Optional[jax.Array] = None,
        attn_mask: Optional[jax.Array] = None,
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """Stateful forward for KV-cache-style decoding: conv tail over
        the lru stream + the (b, lru) f32 RG-LRU state.  The absolute
        ``positions`` matter: the RG-LRU resets at position 0 and scales
        inputs by sqrt(1-a^2) elsewhere.  None states = stream start (the
        stateless call delegates here, bit-identical)."""
        b, s, _ = x.shape
        y = jax.nn.gelu(self.linear_y(x, ctx), approximate=True)
        hx = self.linear_x(x, ctx)
        if conv_state is None:
            k = self.conv_1d.weight.shape[1]
            conv_state = jnp.zeros((b, k - 1, hx.shape[-1]), hx.dtype)
        h, new_conv_state = self.conv_1d.with_state(hx, conv_state)
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))
        h, new_rec_state = self.rg_lru(h, positions, rec_state)
        return self.linear_out(h * y, ctx), new_conv_state, new_rec_state

    @staticmethod
    def create(
        key: jax.Array,
        dim: int,
        lru_width: int,
        conv_width: int,
        n_heads: int,
        dtype: Any,
    ) -> "RecurrentBlock":
        ks = jax.random.split(key, 6)
        bw = lru_width // n_heads
        return RecurrentBlock(
            linear_y=nn.Linear.create(ks[0], dim, lru_width, True, dtype),
            linear_x=nn.Linear.create(ks[1], dim, lru_width, True, dtype),
            linear_out=nn.Linear.create(ks[2], lru_width, dim, True, dtype),
            conv_1d=DepthwiseConv1d.create(
                ks[3], lru_width, conv_width, True, dtype
            ),
            rg_lru=RGLRU(
                recurrent_param=jnp.full((lru_width,), 1.0, dtype),
                input_gate_weight=0.01
                * jax.random.normal(ks[4], (n_heads, bw, bw), dtype),
                input_gate_bias=jnp.zeros((n_heads, bw), dtype),
                recurrent_gate_weight=0.01
                * jax.random.normal(ks[5], (n_heads, bw, bw), dtype),
                recurrent_gate_bias=jnp.zeros((n_heads, bw), dtype),
                n_heads=n_heads,
            ),
        )


class ShortConvMixer(nn.Module):
    """LFM2 gated short convolution (HF Lfm2ShortConv.slow_forward):
    in_proj -> (B, C, x) thirds, a causal depthwise conv over B*x, gated
    by C, then out_proj.  The conv kernel is tiny (conv_L_cache, e.g. 3)
    so the unrolled shift form fuses into elementwise ops."""

    in_proj: nn.Linear  # dim -> 3*dim
    conv: DepthwiseConv1d
    out_proj: nn.Linear

    def __call__(
        self,
        x: jax.Array,
        ctx: Optional[nn.Ctx] = None,
        *,
        positions: Optional[jax.Array] = None,
        attn_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        return self.forward_with_state(x, ctx, attn_mask=attn_mask)[0]

    def init_state(
        self, batch_size: int, dtype: Any
    ) -> tuple[jax.Array, None]:
        ch = self.conv.weight.shape[0]
        k = self.conv.weight.shape[1]
        return jnp.zeros((batch_size, k - 1, ch), dtype), None

    def forward_with_state(
        self,
        x: jax.Array,
        ctx: Optional[nn.Ctx] = None,
        conv_state: Optional[jax.Array] = None,
        rec_state: None = None,
        *,
        positions: Optional[jax.Array] = None,
        attn_mask: Optional[jax.Array] = None,
    ) -> tuple[jax.Array, jax.Array, None]:
        """Stateful forward for KV-cache-style decoding: the only state is
        the conv-input tail over the gated (B*x) stream."""
        if attn_mask is not None:
            x = x * attn_mask[..., None].astype(x.dtype)
        bcx = self.in_proj(x, ctx)
        B, C, xs = jnp.split(bcx, 3, axis=-1)
        bx = B * xs
        if conv_state is None:
            k = self.conv.weight.shape[1]
            conv_state = jnp.zeros(
                (x.shape[0], k - 1, bx.shape[-1]), bx.dtype
            )
        conv_out, new_conv_state = self.conv.with_state(bx, conv_state)
        y = C * conv_out
        return self.out_proj(y, ctx), new_conv_state, None

    @staticmethod
    def create(
        key: jax.Array, dim: int, L: int, bias: bool, dtype: Any
    ) -> "ShortConvMixer":
        ks = jax.random.split(key, 3)
        return ShortConvMixer(
            in_proj=nn.Linear.create(ks[0], dim, 3 * dim, bias, dtype),
            conv=DepthwiseConv1d.create(ks[1], dim, L, bias, dtype),
            out_proj=nn.Linear.create(ks[2], dim, dim, bias, dtype),
        )


class MambaBlock(nn.Module):
    """norm -> mixer -> residual (HF MambaBlock / Mamba2Block)."""

    norm: nn.RMSNorm
    mixer: nn.Module

    def __call__(
        self,
        x: jax.Array,
        ctx: Optional[nn.Ctx] = None,
        *,
        positions: Optional[jax.Array] = None,
        attn_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        return x + self.mixer(
            self.norm(x), ctx, positions=positions, attn_mask=attn_mask
        )


class MambaBackbone(nn.Module):
    embeddings: nn.Embedding
    layers: tuple
    norm_f: nn.RMSNorm
    remat: bool = nn.static_field(default=False)

    def __call__(
        self,
        input_ids: jax.Array,
        ctx: Optional[nn.Ctx] = None,
        *,
        attn_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        x = self.embeddings(input_ids)
        use_remat = self.remat and not (ctx is not None and ctx.no_remat)
        for layer in self.layers:
            if use_remat:
                x = jax.checkpoint(
                    lambda lyr, h: lyr(h, ctx, attn_mask=attn_mask)
                )(layer, x)
            else:
                x = layer(x, ctx, attn_mask=attn_mask)
        return self.norm_f(x)


class MambaLM(nn.Module):
    """Dict-in/logits-out causal LM over a Mamba backbone — same calling
    convention as models.CausalLM, so the trainer apps, dwain/falor
    engines, and metrics run unchanged on SSM checkpoints."""

    backbone: MambaBackbone
    lm_head: Optional[nn.Linear]
    tie_embeddings: bool = nn.static_field(default=True)

    def __call__(self, batch: Any, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        if isinstance(batch, dict):
            input_ids = batch["input_ids"]
            attn_mask = batch.get("attention_mask")
        else:
            input_ids, attn_mask = batch, None
        h = self.backbone(input_ids, ctx, attn_mask=attn_mask)
        if self.tie_embeddings:
            return jnp.dot(h, self.backbone.embeddings.table.T)
        return self.lm_head(h, ctx)

    @staticmethod
    def create(key: jax.Array, cfg: MambaConfig) -> "MambaLM":
        keys = jax.random.split(key, cfg.n_layers + 2)
        mixer_cls = Mamba2Mixer if cfg.version == 2 else Mamba1Mixer
        backbone = MambaBackbone(
            embeddings=nn.Embedding.create(
                keys[0], cfg.vocab_size, cfg.dim, cfg.dtype
            ),
            layers=tuple(
                MambaBlock(
                    norm=nn.RMSNorm.create(cfg.dim, cfg.norm_eps, cfg.dtype),
                    mixer=mixer_cls.create(keys[1 + i], cfg),
                )
                for i in range(cfg.n_layers)
            ),
            norm_f=nn.RMSNorm.create(cfg.dim, cfg.norm_eps, cfg.dtype),
            remat=cfg.remat,
        )
        lm_head = (
            None
            if cfg.tie_embeddings
            else nn.Linear.create(
                keys[-1], cfg.dim, cfg.vocab_size, False, cfg.dtype
            )
        )
        return MambaLM(
            backbone=backbone,
            lm_head=lm_head,
            tie_embeddings=cfg.tie_embeddings,
        )


# ---------------------------------------------------------------------------
# RWKV (v4): receptance-weighted key-value linear attention
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class RwkvConfig:
    """HF RwkvConfig subset (transformers models/rwkv).  The rescale_every
    half-precision inference trick is irrelevant here — the recurrence
    runs in f32."""

    vocab_size: int = 256
    dim: int = 64
    n_layers: int = 2
    hidden_dim: int = 256  # intermediate_size, default 4*dim
    attn_dim: int = 64  # attention_hidden_size, default dim
    norm_eps: float = 1e-5
    tie_embeddings: bool = True
    remat: bool = False
    dtype: Any = jnp.float32

    @staticmethod
    def from_hf_config(
        hf: dict[str, Any], dtype: Any = jnp.bfloat16, remat: bool = False
    ) -> "RwkvConfig":
        if hf.get("model_type") != "rwkv":
            raise ValueError("not an rwkv config")
        dim = int(hf["hidden_size"])
        return RwkvConfig(
            vocab_size=int(hf["vocab_size"]),
            dim=dim,
            n_layers=int(hf["num_hidden_layers"]),
            hidden_dim=int(hf.get("intermediate_size") or 4 * dim),
            attn_dim=int(hf.get("attention_hidden_size") or dim),
            norm_eps=float(hf.get("layer_norm_epsilon", 1e-5)),
            tie_embeddings=bool(hf.get("tie_word_embeddings", True)),
            remat=remat,
            dtype=dtype,
        )


def _time_shift(x: jax.Array) -> jax.Array:
    """HF's ZeroPad2d((0,0,1,-1)): each position sees the PREVIOUS one
    (zeros at t=0)."""
    return jnp.pad(x, ((0, 0), (1, 0), (0, 0)))[:, :-1]


def _wkv_scan(
    time_decay: jax.Array,
    time_first: jax.Array,
    key: jax.Array,
    value: jax.Array,
    init: Optional[tuple] = None,
) -> tuple[jax.Array, tuple]:
    """The WKV recurrence with max-state stabilization, bit-matching HF's
    rwkv_linear_attention_cpu in f32.  TPU note: the per-step body is
    pure elementwise math over a (b, d) carry — the MXU-heavy
    projections all happen OUTSIDE as whole-sequence matmuls, so a
    lax.scan (one fused loop, tiny state in registers/VMEM) is the right
    mapping; the log-depth associative form is numerically unsafe here
    because the decay-compensated partial sums overflow e^{-w·t}."""
    w = -jnp.exp(time_decay.astype(jnp.float32))  # (d,)
    u = time_first.astype(jnp.float32)
    k = key.astype(jnp.float32)
    v = value.astype(jnp.float32)
    b, s, d = k.shape
    if init is None:  # stream start (HF's initial num/den/max state)
        init = (
            jnp.zeros((b, d), jnp.float32),
            jnp.zeros((b, d), jnp.float32),
            jnp.full((b, d), -1e38, jnp.float32),
        )

    def step(carry, kv):
        num, den, mx = carry
        ck, cv = kv
        m_out = jnp.maximum(mx, ck + u)
        e1 = jnp.exp(mx - m_out)
        e2 = jnp.exp(ck + u - m_out)
        out = (e1 * num + e2 * cv) / (e1 * den + e2)
        m_st = jnp.maximum(mx + w, ck)
        e1s = jnp.exp(mx + w - m_st)
        e2s = jnp.exp(ck - m_st)
        return (e1s * num + e2s * cv, e1s * den + e2s, m_st), out

    carry, out = jax.lax.scan(
        step, init, (jnp.swapaxes(k, 0, 1), jnp.swapaxes(v, 0, 1))
    )
    return jnp.swapaxes(out, 0, 1).astype(value.dtype), carry


class RwkvTimeMix(nn.Module):
    """HF RwkvSelfAttention: previous-token interpolation (time_mix_*)
    feeds bias-free r/k/v projections; the WKV recurrence output is
    gated by sigmoid(receptance) and projected back."""

    time_decay: jax.Array
    time_first: jax.Array
    time_mix_key: jax.Array
    time_mix_value: jax.Array
    time_mix_receptance: jax.Array
    key: nn.Linear
    value: nn.Linear
    receptance: nn.Linear
    output: nn.Linear

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        return self.forward_with_state(x, ctx)[0]

    def forward_with_state(
        self,
        x: jax.Array,
        ctx: Optional[nn.Ctx] = None,
        shift_state: Optional[jax.Array] = None,
        wkv_state: Optional[tuple] = None,
    ) -> tuple[jax.Array, jax.Array, tuple]:
        """Stateful forward for decoding: ``shift_state`` (b, dim) is the
        previous token's input to this mixer (the time-shift sees it),
        ``wkv_state`` the (num, den, max) WKV carry.  None = stream start
        (bit-identical to the stateless call, which delegates here)."""
        if shift_state is None:
            shifted = _time_shift(x)
        else:
            shifted = jnp.concatenate(
                [shift_state[:, None].astype(x.dtype), x[:, :-1]], axis=1
            )
        xk = x * self.time_mix_key + shifted * (1 - self.time_mix_key)
        xv = x * self.time_mix_value + shifted * (1 - self.time_mix_value)
        xr = x * self.time_mix_receptance + shifted * (
            1 - self.time_mix_receptance
        )
        r = jax.nn.sigmoid(self.receptance(xr, ctx))
        wkv, new_wkv = _wkv_scan(
            self.time_decay, self.time_first,
            self.key(xk, ctx), self.value(xv, ctx),
            wkv_state,
        )
        return self.output(r * wkv, ctx), x[:, -1], new_wkv

    @staticmethod
    def create(key: jax.Array, cfg: RwkvConfig) -> "RwkvTimeMix":
        ks = jax.random.split(key, 4)
        d, a = cfg.dim, cfg.attn_dim
        return RwkvTimeMix(
            time_decay=jnp.zeros((a,), cfg.dtype),
            time_first=jnp.zeros((a,), cfg.dtype),
            time_mix_key=jnp.full((1, 1, d), 0.5, cfg.dtype),
            time_mix_value=jnp.full((1, 1, d), 0.5, cfg.dtype),
            time_mix_receptance=jnp.full((1, 1, d), 0.5, cfg.dtype),
            key=nn.Linear.create(ks[0], d, a, False, cfg.dtype),
            value=nn.Linear.create(ks[1], d, a, False, cfg.dtype),
            receptance=nn.Linear.create(ks[2], d, a, False, cfg.dtype),
            output=nn.Linear.create(ks[3], a, d, False, cfg.dtype),
        )


class RwkvChannelMix(nn.Module):
    """HF RwkvFeedForward: squared-relu key path gated by
    sigmoid(receptance) of the shifted mix."""

    time_mix_key: jax.Array
    time_mix_receptance: jax.Array
    key: nn.Linear
    receptance: nn.Linear
    value: nn.Linear

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        return self.forward_with_state(x, ctx)[0]

    def forward_with_state(
        self,
        x: jax.Array,
        ctx: Optional[nn.Ctx] = None,
        shift_state: Optional[jax.Array] = None,
    ) -> tuple[jax.Array, jax.Array]:
        if shift_state is None:
            shifted = _time_shift(x)
        else:
            shifted = jnp.concatenate(
                [shift_state[:, None].astype(x.dtype), x[:, :-1]], axis=1
            )
        xk = x * self.time_mix_key + shifted * (1 - self.time_mix_key)
        xr = x * self.time_mix_receptance + shifted * (
            1 - self.time_mix_receptance
        )
        k = jnp.square(jax.nn.relu(self.key(xk, ctx)))
        return (
            jax.nn.sigmoid(self.receptance(xr, ctx)) * self.value(k, ctx),
            x[:, -1],
        )

    @staticmethod
    def create(key: jax.Array, cfg: RwkvConfig) -> "RwkvChannelMix":
        ks = jax.random.split(key, 3)
        d, h = cfg.dim, cfg.hidden_dim
        return RwkvChannelMix(
            time_mix_key=jnp.full((1, 1, d), 0.5, cfg.dtype),
            time_mix_receptance=jnp.full((1, 1, d), 0.5, cfg.dtype),
            key=nn.Linear.create(ks[0], d, h, False, cfg.dtype),
            receptance=nn.Linear.create(ks[1], d, d, False, cfg.dtype),
            value=nn.Linear.create(ks[2], h, d, False, cfg.dtype),
        )


class RwkvLayer(nn.Module):
    """HF RwkvBlock: x + attn(ln1 x), then x + ffn(ln2 x); block 0
    additionally LayerNorms the raw embedding first (pre_ln)."""

    ln1: nn.LayerNorm
    ln2: nn.LayerNorm
    attention: RwkvTimeMix
    feed_forward: RwkvChannelMix
    pre_ln: Optional[nn.LayerNorm] = None

    def __call__(
        self,
        x: jax.Array,
        ctx: Optional[nn.Ctx] = None,
        *,
        positions: Optional[jax.Array] = None,
        attn_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        return self.forward_with_state(x, ctx)[0]

    def init_state(self, batch_size: int, dtype: Any) -> tuple:
        d = self.ln1.scale.shape[0]
        a = self.attention.time_decay.shape[0]
        f32 = jnp.float32
        return (
            jnp.zeros((batch_size, d), dtype),
            (
                jnp.zeros((batch_size, a), f32),
                jnp.zeros((batch_size, a), f32),
                jnp.full((batch_size, a), -1e38, f32),
            ),
            jnp.zeros((batch_size, d), dtype),
        )

    def forward_with_state(
        self,
        x: jax.Array,
        ctx: Optional[nn.Ctx] = None,
        state: Optional[tuple] = None,
    ) -> tuple[jax.Array, tuple]:
        """state = (attn_shift, (num, den, max), ffn_shift); None =
        stream start (the stateless call delegates here)."""
        attn_shift, wkv, ffn_shift = state if state is not None else (
            None, None, None,
        )
        if self.pre_ln is not None:
            x = self.pre_ln(x)
        a_out, new_attn_shift, new_wkv = self.attention.forward_with_state(
            self.ln1(x), ctx, attn_shift, wkv
        )
        x = x + a_out
        f_out, new_ffn_shift = self.feed_forward.forward_with_state(
            self.ln2(x), ctx, ffn_shift
        )
        return x + f_out, (new_attn_shift, new_wkv, new_ffn_shift)


class RwkvLM(nn.Module):
    """Dict-in/logits-out RWKV causal LM (HF RwkvForCausalLM layout:
    rwkv.embeddings / rwkv.blocks.N / rwkv.ln_out / tied head).  Same
    calling convention as CausalLM, so the trainer apps and the dwain/
    falor engines run unchanged."""

    embeddings: nn.Embedding
    blocks: tuple
    ln_out: nn.LayerNorm
    head: Optional[nn.Linear]
    tie_embeddings: bool = nn.static_field(default=True)
    remat: bool = nn.static_field(default=False)

    def __call__(self, batch: Any, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        input_ids = batch["input_ids"] if isinstance(batch, dict) else batch
        x = self.embeddings(input_ids)
        use_remat = self.remat and not (ctx is not None and ctx.no_remat)
        for blk in self.blocks:
            if use_remat:
                x = jax.checkpoint(lambda b_, h: b_(h, ctx))(blk, x)
            else:
                x = blk(x, ctx)
        x = self.ln_out(x)
        if self.tie_embeddings:
            return jnp.dot(x, self.embeddings.table.T)
        return self.head(x, ctx)

    @staticmethod
    def create(key: jax.Array, cfg: RwkvConfig) -> "RwkvLM":
        keys = jax.random.split(key, cfg.n_layers + 2)

        def ln():
            return nn.LayerNorm.create(cfg.dim, True, cfg.norm_eps, cfg.dtype)

        return RwkvLM(
            embeddings=nn.Embedding.create(
                keys[0], cfg.vocab_size, cfg.dim, cfg.dtype
            ),
            blocks=tuple(
                RwkvLayer(
                    ln1=ln(),
                    ln2=ln(),
                    attention=RwkvTimeMix.create(
                        jax.random.fold_in(keys[1 + i], 0), cfg
                    ),
                    feed_forward=RwkvChannelMix.create(
                        jax.random.fold_in(keys[1 + i], 1), cfg
                    ),
                    pre_ln=ln() if i == 0 else None,
                )
                for i in range(cfg.n_layers)
            ),
            ln_out=ln(),
            head=(
                None
                if cfg.tie_embeddings
                else nn.Linear.create(
                    keys[-1], cfg.dim, cfg.vocab_size, False, cfg.dtype
                )
            ),
            tie_embeddings=cfg.tie_embeddings,
            remat=cfg.remat,
        )


# ---------------------------------------------------------------------------
# Zamba: mamba backbone with a SHARED concat-input transformer block
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ZambaConfig:
    """HF ZambaConfig subset (Zyphra Zamba v1): a multi-head mamba1
    backbone where every `attn_layer_period`-th layer also runs a
    transformer block over cat(hidden, embedding) — the block's weights
    are SHARED across those layers upstream; each native hybrid layer
    carries its own copy (identical values on load), which decomposes
    independently like the reference's AutoModel consumption would."""

    vocab_size: int = 64
    dim: int = 32
    n_layers: int = 4
    layers_block_type: tuple = ("mamba", "mamba", "hybrid", "mamba")
    # shared transformer block (input width 2*dim)
    attention_hidden_size: int = 64
    n_attn_heads: int = 4
    attention_head_dim: int = 16
    intermediate_size: int = 64
    # multi-head mamba
    d_inner: int = 64
    d_state: int = 16
    d_conv: int = 4
    n_mamba_heads: int = 2
    dt_rank: int = 4
    conv_bias: bool = True
    proj_bias: bool = False
    norm_eps: float = 1e-5
    tie_embeddings: bool = True
    # zamba2: mamba2 mixers, rotary on the shared attention, and LoRA
    # adapters on the shared projections (folded into dense per-layer
    # weights on load)
    version: int = 1
    mamba_headdim: int = 8
    n_groups: int = 1
    chunk_size: int = 256
    use_mem_rope: bool = False
    rope_theta: float = 10000.0
    remat: bool = False
    dtype: Any = jnp.float32

    @staticmethod
    def from_hf_config(
        hf: dict[str, Any], dtype: Any = jnp.bfloat16, remat: bool = False
    ) -> "ZambaConfig":
        if hf.get("model_type") == "zamba2":
            return ZambaConfig._from_hf_zamba2(hf, dtype, remat)
        if hf.get("model_type") != "zamba":
            raise ValueError("not a zamba config")
        if _hf_act_name(hf.get("hidden_act", "gelu")) != "gelu" or (
            hf.get("hidden_mamba_act", "silu") != "silu"
        ):
            # HF ZambaMLP uses hidden_act (default gelu); the mixer silu
            raise ValueError(
                "zamba with non-default activations is not implemented"
            )
        dim = int(hf["hidden_size"])
        n_layers = int(hf["num_hidden_layers"])
        lbt = tuple(
            str(t)
            for t in (
                hf.get("layers_block_type")
                or ZambaConfig._derive_block_types(
                    n_layers,
                    int(hf.get("attn_layer_period") or 6),
                    int(hf.get("attn_layer_offset") or 4),
                )
            )
        )
        d_inner = int(hf.get("mamba_expand", 2)) * dim
        n_mh = int(hf.get("n_mamba_heads", 2))
        dt_rank = hf.get("mamba_dt_rank")
        return ZambaConfig(
            vocab_size=int(hf["vocab_size"]),
            dim=dim,
            n_layers=n_layers,
            layers_block_type=lbt,
            attention_hidden_size=int(
                hf.get("attention_hidden_size") or 2 * dim
            ),
            n_attn_heads=int(hf["num_attention_heads"]),
            attention_head_dim=int(
                hf.get("attention_head_dim")
                or (2 * dim) // int(hf["num_attention_heads"])
            ),
            intermediate_size=int(hf["intermediate_size"]),
            d_inner=d_inner,
            d_state=int(hf.get("mamba_d_state", 16)),
            d_conv=int(hf.get("mamba_d_conv", 4)),
            n_mamba_heads=n_mh,
            dt_rank=(
                int(dt_rank)
                if dt_rank and dt_rank != "auto"
                else -(-dim // 16)  # HF "auto": ceil(hidden/16)
            ),
            conv_bias=bool(hf.get("mamba_conv_bias", True)),
            proj_bias=bool(hf.get("mamba_proj_bias", False)),
            norm_eps=float(hf.get("rms_norm_eps", 1e-5)),
            tie_embeddings=bool(hf.get("tie_word_embeddings", True)),
            remat=remat,
            dtype=dtype,
        )

    @staticmethod
    def _derive_block_types(n_layers, period, offset):
        return [
            "hybrid" if i % period == offset else "mamba"
            for i in range(n_layers)
        ]

    @staticmethod
    def _from_hf_zamba2(
        hf: dict[str, Any], dtype: Any, remat: bool
    ) -> "ZambaConfig":
        """HF Zamba2Config -> native.  The per-hybrid-layer LoRA adapters
        on the shared projections are folded into dense per-layer weights
        by the translator, so the native model needs no adapter fields."""
        if _hf_act_name(hf.get("hidden_act", "gelu")) != "gelu" or (
            hf.get("mamba_hidden_act", "silu") != "silu"
        ):
            raise ValueError(
                "zamba2 with non-default activations is not implemented"
            )
        if hf.get("add_bias_linear"):
            raise ValueError(
                "zamba2 add_bias_linear=True is not implemented"
            )
        dim = int(hf["hidden_size"])
        n_layers = int(hf["num_hidden_layers"])
        d_inner = int(hf.get("mamba_expand", 2)) * dim
        return ZambaConfig(
            vocab_size=int(hf["vocab_size"]),
            dim=dim,
            n_layers=n_layers,
            layers_block_type=tuple(
                str(t) for t in hf["layers_block_type"]
            ),
            attention_hidden_size=int(
                hf.get("attention_hidden_size") or 2 * dim
            ),
            n_attn_heads=int(hf["num_attention_heads"]),
            attention_head_dim=int(
                hf.get("attention_head_dim")
                or (2 * dim) // int(hf["num_attention_heads"])
            ),
            intermediate_size=int(hf["intermediate_size"]),
            d_inner=d_inner,
            d_state=int(hf.get("mamba_d_state", 64)),
            d_conv=int(hf.get("mamba_d_conv", 4)),
            n_mamba_heads=int(
                hf.get("n_mamba_heads")
                or d_inner // int(hf.get("mamba_headdim", 64))
            ),
            conv_bias=bool(hf.get("use_conv_bias", True)),
            norm_eps=float(hf.get("rms_norm_eps", 1e-5)),
            tie_embeddings=bool(hf.get("tie_word_embeddings", True)),
            version=2,
            mamba_headdim=int(hf.get("mamba_headdim", 64)),
            n_groups=int(hf.get("mamba_ngroups", 1)),
            chunk_size=int(hf.get("chunk_size", 256)),
            use_mem_rope=bool(hf.get("use_mem_rope", False)),
            rope_theta=float(hf.get("rope_theta", 10000.0)),
            remat=remat,
            dtype=dtype,
        )


def _hf_act_name(act: str) -> str:
    return {"gelu_pytorch_tanh": "gelu_tanh"}.get(act, act)


class ZambaMixer(nn.Module):
    """Zamba's multi-head mamba1 (HF ZambaMambaMixer.slow_forward): the
    in_proj emits INTERLEAVED (x, gate) channel pairs, and the
    x_proj/dt_proj selections are block-diagonal over n_mamba_heads —
    each head owns mamba_head_dim channels with its own B/C streams.
    Expanding the per-head B/C to per-channel reduces it to the same
    associative-scan recurrence as Mamba1Mixer."""

    in_proj: nn.Linear  # dim -> 2*d_inner, (x, z) interleaved
    conv1d: DepthwiseConv1d
    x_proj_weight: jax.Array  # (h, dt_rank + 2*d_state, head_dim)
    dt_proj_weight: jax.Array  # (h, head_dim, dt_rank)
    dt_proj_bias: jax.Array  # (h, head_dim)
    A_log: jax.Array  # (h, head_dim, d_state)
    D: jax.Array  # (h, head_dim)
    out_proj: nn.Linear  # d_inner -> dim
    n_heads: int = nn.static_field(default=2)
    d_state: int = nn.static_field(default=16)
    dt_rank: int = nn.static_field(default=4)

    def __call__(
        self,
        x: jax.Array,
        ctx: Optional[nn.Ctx] = None,
        *,
        positions: Optional[jax.Array] = None,
        attn_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        return self.forward_with_state(x, ctx, attn_mask=attn_mask)[0]

    def init_state(
        self, batch_size: int, dtype: Any
    ) -> tuple[jax.Array, jax.Array]:
        k = self.conv1d.weight.shape[1]
        d_inner = self.conv1d.weight.shape[0]
        hd = d_inner // self.n_heads
        return (
            jnp.zeros((batch_size, k - 1, d_inner), dtype),
            jnp.zeros(
                (batch_size, self.n_heads, hd, self.d_state), jnp.float32
            ),
        )

    def forward_with_state(
        self,
        x: jax.Array,
        ctx: Optional[nn.Ctx] = None,
        conv_state: Optional[jax.Array] = None,
        rec_state: Optional[jax.Array] = None,
        *,
        positions: Optional[jax.Array] = None,
        attn_mask: Optional[jax.Array] = None,
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """Stateful forward for decoding: conv tail over d_inner channels
        + the per-head (b, nh, hd, d_state) f32 recurrence state (folds
        into the scan via the cumulative decay, like Mamba1Mixer).  None
        states = stream start (the stateless call delegates here,
        bit-identical)."""
        b, s, _ = x.shape
        proj = self.in_proj(x, ctx)  # (b, s, 2*d_inner) interleaved pairs
        pairs = proj.reshape(b, s, -1, 2)
        h, gate = pairs[..., 0], pairs[..., 1]  # (b, s, d_inner)
        if attn_mask is not None:
            h = h * attn_mask[..., None].astype(h.dtype)
        if conv_state is None:
            conv_state = jnp.zeros(
                (b, self.conv1d.weight.shape[1] - 1, h.shape[-1]), h.dtype
            )
        h, new_conv_state = self.conv1d.with_state(h, conv_state)
        h = jax.nn.silu(h)
        if attn_mask is not None:
            h = h * attn_mask[..., None].astype(h.dtype)
        nh, hd = self.n_heads, h.shape[-1] // self.n_heads
        hh = h.reshape(b, s, nh, hd)
        # per-head selection: (h, r, hd) @ (b, s, h, hd) -> (b, s, h, r)
        sel = jnp.einsum("hrd,bshd->bshr", self.x_proj_weight, hh)
        dt, B, C = (
            sel[..., : self.dt_rank],
            sel[..., self.dt_rank : self.dt_rank + self.d_state],
            sel[..., self.dt_rank + self.d_state :],
        )
        dt = jnp.einsum("hdr,bshr->bshd", self.dt_proj_weight, dt)
        dt = jax.nn.softplus(dt + self.dt_proj_bias[None, None])
        A = -jnp.exp(self.A_log.astype(jnp.float32))  # (h, hd, n)
        dtf = dt.astype(jnp.float32)
        dA = jnp.exp(dtf[..., None] * A[None, None])  # (b, s, h, hd, n)
        dBu = (
            dtf[..., None]
            * B.astype(jnp.float32)[:, :, :, None, :]
            * hh.astype(jnp.float32)[..., None]
        )

        def comb(left, right):
            aL, bL = left
            aR, bR = right
            return aL * aR, bL * aR + bR

        a_cum, hs = jax.lax.associative_scan(comb, (dA, dBu), axis=1)
        if rec_state is not None:
            hs = hs + a_cum * rec_state.astype(jnp.float32)[:, None]
        new_rec_state = hs[:, -1]
        y = jnp.einsum("bshdn,bshn->bshd", hs.astype(x.dtype), C)
        y = y + hh * self.D[None, None]
        y = y.reshape(b, s, -1) * jax.nn.silu(gate)
        return self.out_proj(y, ctx), new_conv_state, new_rec_state

    @staticmethod
    def create(key: jax.Array, cfg: ZambaConfig) -> "ZambaMixer":
        ks = jax.random.split(key, 3)
        nh = cfg.n_mamba_heads
        hd = cfg.d_inner // nh
        A = jnp.broadcast_to(
            jnp.arange(1, cfg.d_state + 1, dtype=jnp.float32)[None, None],
            (nh, hd, cfg.d_state),
        )
        return ZambaMixer(
            in_proj=nn.Linear.create(
                ks[0], cfg.dim, 2 * cfg.d_inner, cfg.proj_bias, cfg.dtype
            ),
            conv1d=DepthwiseConv1d.create(
                ks[1], cfg.d_inner, cfg.d_conv, cfg.conv_bias, cfg.dtype
            ),
            x_proj_weight=jnp.zeros(
                (nh, cfg.dt_rank + 2 * cfg.d_state, hd), cfg.dtype
            ),
            dt_proj_weight=jnp.zeros((nh, hd, cfg.dt_rank), cfg.dtype),
            dt_proj_bias=jnp.zeros((nh, hd), cfg.dtype),
            A_log=jnp.log(A),
            D=jnp.ones((nh, hd), cfg.dtype),
            out_proj=nn.Linear.create(
                ks[2], cfg.d_inner, cfg.dim, cfg.proj_bias, cfg.dtype
            ),
            n_heads=nh,
            d_state=cfg.d_state,
            dt_rank=cfg.dt_rank,
        )


class ZambaSharedBlock(nn.Module):
    """The shared transformer block (HF ZambaAttentionDecoderLayer): NO
    internal residuals — rms(cat(h, emb)) -> rope-free attention at
    scale (head_dim/2)^-0.5 -> rms -> gated-gelu MLP."""

    input_layernorm: nn.RMSNorm  # over 2*dim
    self_attn: Any  # transformer.Attention (2*dim in, dim out)
    pre_ff_layernorm: nn.RMSNorm  # over dim
    feed_forward: Any  # transformer.MLP

    def __call__(
        self,
        x2: jax.Array,
        ctx: Optional[nn.Ctx] = None,
        *,
        positions: Optional[jax.Array] = None,
        attn_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        h = self.self_attn(
            self.input_layernorm(x2), ctx,
            positions=positions, attn_mask=attn_mask,
        )
        return self.feed_forward(self.pre_ff_layernorm(h), ctx)


class ZambaHybridLayer(nn.Module):
    """norm+mamba residual layer, optionally fed by the shared block:
    x = x + mamba(rms(x + linear(shared(cat(x, emb0)))))."""

    input_layernorm: nn.RMSNorm
    mamba: ZambaMixer
    shared_transf: Optional[ZambaSharedBlock] = None
    linear: Optional[nn.Linear] = None

    def __call__(
        self,
        x: jax.Array,
        x0: jax.Array,
        ctx: Optional[nn.Ctx] = None,
        *,
        positions: Optional[jax.Array] = None,
        attn_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        h = x
        if self.shared_transf is not None:
            t = self.shared_transf(
                jnp.concatenate([x, x0], axis=-1), ctx,
                positions=positions, attn_mask=attn_mask,
            )
            h = x + self.linear(t, ctx)
        return x + self.mamba(
            self.input_layernorm(h), ctx,
            positions=positions, attn_mask=attn_mask,
        )


class ZambaLM(nn.Module):
    """Dict-in/logits-out Zamba causal LM (HF ZambaForCausalLM layout)."""

    embed_tokens: nn.Embedding
    layers: tuple
    final_layernorm: nn.RMSNorm
    lm_head: Optional[nn.Linear]
    tie_embeddings: bool = nn.static_field(default=True)
    remat: bool = nn.static_field(default=False)

    def __call__(self, batch: Any, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        if isinstance(batch, dict):
            input_ids = batch["input_ids"]
            attn_mask = batch.get("attention_mask")
        else:
            input_ids, attn_mask = batch, None
        x = self.embed_tokens(input_ids)
        x0 = x  # the shared block always re-reads the raw embedding
        use_remat = self.remat and not (ctx is not None and ctx.no_remat)
        for layer in self.layers:
            if use_remat:
                x = jax.checkpoint(
                    lambda lyr, h, e: lyr(h, e, ctx, attn_mask=attn_mask)
                )(layer, x, x0)
            else:
                x = layer(x, x0, ctx, attn_mask=attn_mask)
        x = self.final_layernorm(x)
        if self.tie_embeddings:
            return jnp.dot(x, self.embed_tokens.table.T)
        return self.lm_head(x, ctx)

    @staticmethod
    def create(key: jax.Array, cfg: ZambaConfig) -> "ZambaLM":
        from .transformer import MLP, Attention, TransformerConfig

        keys = jax.random.split(key, cfg.n_layers + 2)
        # the shared attention block sized on a synthetic TransformerConfig
        shared_cfg = TransformerConfig(
            vocab_size=cfg.vocab_size,
            dim=2 * cfg.dim,
            n_layers=1,
            n_heads=cfg.n_attn_heads,
            n_kv_heads=cfg.n_attn_heads,
            hidden_dim=cfg.intermediate_size,
            head_dim_override=cfg.attention_head_dim,
            norm_eps=cfg.norm_eps,
            mlp_act="gelu_exact",
            use_rope=cfg.use_mem_rope,  # zamba2's mem-block rotary
            rope_theta=cfg.rope_theta,
            query_scale_override=(cfg.attention_head_dim / 2) ** -0.5,
            dtype=cfg.dtype,
        )
        mamba_cfg = MambaConfig(
            vocab_size=cfg.vocab_size,
            dim=cfg.dim,
            n_layers=1,
            d_inner=cfg.d_inner,
            d_state=cfg.d_state,
            d_conv=cfg.d_conv,
            version=2,
            n_heads=cfg.n_mamba_heads,
            head_dim=cfg.mamba_headdim,
            n_groups=cfg.n_groups,
            chunk_size=cfg.chunk_size,
            conv_bias=cfg.conv_bias,
            norm_eps=cfg.norm_eps,
            dtype=cfg.dtype,
        )

        def make_layer(i: int, t: str) -> ZambaHybridLayer:
            k = keys[1 + i]
            if t == "hybrid":
                attn = Attention.create(jax.random.fold_in(k, 0), shared_cfg)
                # o_proj maps back to dim (not 2*dim)
                attn = attn.replace(
                    o_proj=nn.Linear.create(
                        jax.random.fold_in(k, 4),
                        cfg.n_attn_heads * cfg.attention_head_dim,
                        cfg.dim,
                        False,
                        cfg.dtype,
                    )
                )
                mlp_cfg = dataclasses.replace(
                    shared_cfg, dim=cfg.dim, hidden_dim=cfg.intermediate_size
                )
                shared = ZambaSharedBlock(
                    input_layernorm=nn.RMSNorm.create(
                        2 * cfg.dim, cfg.norm_eps, cfg.dtype
                    ),
                    self_attn=attn,
                    pre_ff_layernorm=nn.RMSNorm.create(
                        cfg.dim, cfg.norm_eps, cfg.dtype
                    ),
                    feed_forward=MLP.create(
                        jax.random.fold_in(k, 1), mlp_cfg
                    ),
                )
                linear = nn.Linear.create(
                    jax.random.fold_in(k, 2), cfg.dim, cfg.dim, False,
                    cfg.dtype,
                )
            else:
                shared, linear = None, None
            return ZambaHybridLayer(
                input_layernorm=nn.RMSNorm.create(
                    cfg.dim, cfg.norm_eps, cfg.dtype
                ),
                mamba=(
                    Mamba2Mixer.create(jax.random.fold_in(k, 3), mamba_cfg)
                    if cfg.version == 2
                    else ZambaMixer.create(jax.random.fold_in(k, 3), cfg)
                ),
                shared_transf=shared,
                linear=linear,
            )

        lm_head = (
            None
            if cfg.tie_embeddings
            else nn.Linear.create(
                keys[-1], cfg.dim, cfg.vocab_size, False, cfg.dtype
            )
        )
        return ZambaLM(
            embed_tokens=nn.Embedding.create(
                keys[0], cfg.vocab_size, cfg.dim, cfg.dtype
            ),
            layers=tuple(
                make_layer(i, t)
                for i, t in enumerate(cfg.layers_block_type)
            ),
            final_layernorm=nn.RMSNorm.create(
                cfg.dim, cfg.norm_eps, cfg.dtype
            ),
            lm_head=lm_head,
            tie_embeddings=cfg.tie_embeddings,
            remat=cfg.remat,
        )
