"""Mega (moving-average-equipped gated attention), TPU-native.

Reference consumption analogue: AutoModelForCausalLM coverage
(/root/reference/examples/trainer_llm/builder.py:97-107).  Mirrors HF
``MegaForCausalLM`` (deprecated namespace) exactly:

* multi-dimensional damped EMA applied before single-headed attention:
  the (hidden, ndim)-factored kernel materializes as a length-L causal
  filter applied via FFT convolution (rfft/irfft, identical math to
  upstream; the bidirectional flavor pads/flips the second half);
* the gated attention block: silu'd value projection, a fused mx_proj
  on the EMA output splitting into sigmoid residual weights, silu'd
  shared query/key (rescaled per-row by qk_weight/qk_bias) + attention
  gate, single-head softmax attention with SIMPLE (learned vector,
  tiled) or ROTARY (sinusoid x learned alpha/beta) relative bias,
  and the ``residual + w * (act(h_proj(attn * gate) + intermediate) -
  residual)`` addcmul wiring;
* ScaleNorm (single learned scalar, RMS denominator from the
  PRE-scaled input) or LayerNorm sequence norms; upstream's
  MegaRMSNorm is BROKEN (returns the unnormalized input) and the
  'rmsnorm' type is refused loudly rather than reproduced;
* normalized feed-forward network, optional tanh'd dense before the
  biased lm_head.

v_proj/mx_proj/h_proj/fc1/fc2/dense/lm_head are decomposable
``nn.Linear`` sites.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import nn


@dataclass(frozen=True)
class MegaConfig:
    vocab_size: int = 30522
    hidden_size: int = 128
    num_hidden_layers: int = 4
    intermediate_size: int = 256
    ema_projection_size: int = 16
    shared_representation_size: int = 64
    nffn_hidden_size: int = 256
    bidirectional: bool = True
    normalize_before_mega: bool = True
    normalize_before_ffn: bool = True
    use_normalized_ffn: bool = True
    normalization_type: str = "scalenorm"
    relative_positional_bias: str = "rotary"
    max_positions: int = 2048
    add_lm_hidden_dense_layer: bool = True
    norm_eps: float = 1e-6
    dtype: Any = jnp.float32

    @staticmethod
    def from_hf_config(hf: dict, dtype: Any = jnp.bfloat16,
                       remat: bool = False) -> "MegaConfig":
        if hf.get("attention_activation", "softmax") != "softmax":
            raise ValueError("mega attention_activation != softmax unsupported")
        if hf.get("activation", "silu") != "silu":
            raise ValueError("mega activation != silu unsupported")
        if hf.get("use_chunking"):
            raise ValueError("mega use_chunking unsupported")
        if hf.get("normalization_type") == "rmsnorm":
            raise ValueError(
                "mega normalization_type='rmsnorm' refused: upstream "
                "MegaRMSNorm.forward drops its normalization result "
                "(modeling_mega) — a silent no-op we will not reproduce"
            )
        if hf.get("add_token_type_embeddings"):
            raise ValueError("mega token type embeddings unsupported")
        return MegaConfig(
            vocab_size=int(hf["vocab_size"]),
            hidden_size=int(hf["hidden_size"]),
            num_hidden_layers=int(hf["num_hidden_layers"]),
            intermediate_size=int(hf["intermediate_size"]),
            ema_projection_size=int(hf.get("ema_projection_size", 16)),
            shared_representation_size=int(
                hf.get("shared_representation_size", 64)
            ),
            nffn_hidden_size=int(hf.get("nffn_hidden_size", 256)),
            bidirectional=bool(hf.get("bidirectional", True)),
            normalize_before_mega=bool(hf.get("normalize_before_mega", True)),
            normalize_before_ffn=bool(hf.get("normalize_before_ffn", True)),
            use_normalized_ffn=bool(hf.get("use_normalized_ffn", True)),
            normalization_type=hf.get("normalization_type", "scalenorm"),
            relative_positional_bias=hf.get(
                "relative_positional_bias", "rotary"
            ),
            max_positions=int(hf.get("max_positions", 2048)),
            add_lm_hidden_dense_layer=bool(
                hf.get("add_lm_hidden_dense_layer", True)
            ),
            dtype=dtype,
        )


class ScaleNorm(nn.Module):
    scalar: Optional[jax.Array] = None
    eps: float = nn.static_field(default=1e-6)

    def __call__(self, x, ctx=None):
        ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
        if self.scalar is not None:
            x = self.scalar * x
        return x * jax.lax.rsqrt(ms + self.eps)


class SimpleRelBias(nn.Module):
    rel_pos_bias: jax.Array  # (2*max_positions - 1,)
    max_positions: int = nn.static_field(default=2048)

    def __call__(self, seq_len: int, ctx=None):
        b = self.rel_pos_bias[
            self.max_positions - seq_len:self.max_positions + seq_len - 1
        ]
        t = jnp.pad(b, (0, seq_len))
        t = jnp.tile(t, seq_len)[:-seq_len].reshape(seq_len, 3 * seq_len - 2)
        start = (2 * seq_len - 1) // 2
        return t[:, start:t.shape[1] - start]


class RotaryRelBias(nn.Module):
    alpha: jax.Array  # (1, shared)
    b_param: jax.Array
    embed_dim: int = nn.static_field(default=64)

    def _rotary(self, x, seq_len):
        half = self.embed_dim // 2
        emb = jnp.exp(jnp.arange(half) * (-math.log(10000) / half))
        ang = jnp.arange(seq_len)[:, None] * emb[None]
        sin, cos = jnp.sin(ang), jnp.cos(ang)
        c1, c2 = x[:, :half], x[:, half:]
        return jnp.concatenate(
            [c1 * cos - c2 * sin, c2 * cos + c1 * sin], axis=1
        )

    def __call__(self, seq_len: int, ctx=None):
        ra = self._rotary(jnp.broadcast_to(self.alpha,
                                           (seq_len, self.embed_dim)), seq_len)
        rb = self._rotary(jnp.broadcast_to(self.b_param,
                                           (seq_len, self.embed_dim)), seq_len)
        return jnp.einsum("mk,nk->mn", ra, rb)


class DampedEma(nn.Module):
    damping_factor: jax.Array  # (kernel_dim, ndim, 1)
    decay_factor: jax.Array
    ema_expansion_matrix: jax.Array
    kernel_projection_matrix: jax.Array  # (kernel_dim, ndim)
    residual_weight: jax.Array  # (hidden,)
    hidden: int = nn.static_field(default=128)
    ndim: int = nn.static_field(default=16)
    bidirectional: bool = nn.static_field(default=True)

    def __call__(self, x, ctx=None):
        # x (b, L, d)
        b, length, d = x.shape
        residual = x * self.residual_weight
        xt = x.transpose(0, 2, 1)  # (b, d, L)
        p = jax.nn.sigmoid(self.damping_factor)
        q = 1.0 - p * jax.nn.sigmoid(self.decay_factor)
        vander = jnp.arange(length)[None, None] * jnp.log(q)
        kern = (p * self.ema_expansion_matrix) * jnp.exp(vander)
        scale = math.sqrt(1.0 / self.ndim)
        kernel = jnp.einsum(
            "dnl,dn->dl", kern, self.kernel_projection_matrix * scale
        )
        if self.bidirectional:
            k1, k2 = kernel[:d], kernel[d:]
            kernel = (
                jnp.pad(k1, ((0, 0), (length - 1, 0)))
                + jnp.pad(k2[:, ::-1], ((0, 0), (0, length - 1)))
            )
            xt = jnp.pad(xt, ((0, 0), (0, 0), (length - 1, 0)))
            fft_len = 2 * length - 1
            s = 2 * length - 2
        else:
            fft_len = length
            s = 0
        n = 2 * fft_len
        conv = jnp.fft.irfft(
            jnp.fft.rfft(xt.astype(jnp.float32), n=n)
            * jnp.fft.rfft(kernel.astype(jnp.float32), n=n),
            n=n,
        )[..., s:s + length].astype(x.dtype)
        return jax.nn.silu(conv.transpose(0, 2, 1) + residual)


class GatedAttention(nn.Module):
    norm: nn.Module
    ema_gate: DampedEma
    v_proj: nn.Linear
    mx_proj: nn.Linear
    h_proj: nn.Linear
    qk_weight: jax.Array  # (2, shared)
    qk_bias: jax.Array
    rel_pos_bias: nn.Module
    shared: int = nn.static_field(default=64)
    inter: int = nn.static_field(default=256)
    hidden: int = nn.static_field(default=128)
    prenorm: bool = nn.static_field(default=True)

    def __call__(self, x, causal_mask, ctx=None):
        # x (b, L, d)
        residual = x
        if self.prenorm:
            x = self.norm(x, ctx)
        value = jax.nn.silu(self.v_proj(x, ctx))
        ema_out = self.ema_gate(x, ctx)
        base = self.mx_proj(ema_out, ctx)
        d, s, i = self.hidden, self.shared, self.inter
        rw = jax.nn.sigmoid(base[..., :d])
        qk_gates = jax.nn.silu(base[..., d:d + s + i])
        inter_state = base[..., d + s + i:]
        query_key = qk_gates[..., :s]
        attention_gate = qk_gates[..., s:]
        qk = query_key[..., None, :] * self.qk_weight + self.qk_bias
        q, k = qk[..., 0, :], qk[..., 1, :]
        seq_len = x.shape[1]
        bias = self.rel_pos_bias(seq_len, ctx)
        logits = jnp.einsum(
            "bqs,bks->bqk", q * (s ** -0.5), k
        ) + bias[None]
        if causal_mask is not None:
            logits = jnp.where(causal_mask[None], logits,
                               -jnp.inf)
        attn = jax.nn.softmax(logits, axis=-1)
        weighted = jnp.einsum("bqk,bkd->bqd", attn, value)
        out = jax.nn.silu(
            inter_state + self.h_proj(weighted * attention_gate, ctx)
        )
        out = residual + rw * (out - residual)
        if not self.prenorm:
            out = self.norm(out, ctx)
        return out


class NFFN(nn.Module):
    norm: nn.Module
    fc1: nn.Linear
    fc2: nn.Linear
    prenorm: bool = nn.static_field(default=True)

    def __call__(self, x, ctx=None):
        residual = x
        if self.prenorm:
            x = self.norm(x, ctx)
        h = self.fc2(jax.nn.silu(self.fc1(x, ctx)), ctx)
        out = h + residual
        if not self.prenorm:
            out = self.norm(out, ctx)
        return out


class MegaBlock(nn.Module):
    mega_layer: GatedAttention
    nffn: Optional[NFFN] = None

    def __call__(self, x, causal_mask, ctx=None):
        x = self.mega_layer(x, causal_mask, ctx)
        if self.nffn is not None:
            x = self.nffn(x, ctx)
        return x


class _WordEmb(nn.Module):
    word_embeddings: nn.Embedding

    def __call__(self, ids, ctx=None):
        return self.word_embeddings(ids, ctx)


class MegaLM(nn.Module):
    """dict{input_ids} -> logits (MegaForCausalLM)."""

    embedding_layer: _WordEmb
    layers: tuple
    lm_head: nn.Linear
    dense: Optional[nn.Linear] = None
    is_decoder: bool = nn.static_field(default=True)

    def __call__(self, batch, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        ids = batch["input_ids"] if isinstance(batch, dict) else batch
        s = ids.shape[1]
        h = self.embedding_layer(ids, ctx)
        causal = jnp.tril(jnp.ones((s, s), bool)) if self.is_decoder else None
        for layer in self.layers:
            h = layer(h, causal, ctx)
        if self.dense is not None:
            h = jnp.tanh(self.dense(h, ctx))
        return self.lm_head(h, ctx)

    @staticmethod
    def create(key: jax.Array, cfg: MegaConfig) -> "MegaLM":
        keys = iter(jax.random.split(key, 8 * cfg.num_hidden_layers + 8))
        d = cfg.hidden_size
        kernel_dim = 2 * d if cfg.bidirectional else d

        def norm() -> nn.Module:
            if cfg.normalization_type == "scalenorm":
                # MegaSequenceNorm default eps is 1e-5
                return ScaleNorm(scalar=jnp.ones((1,), cfg.dtype), eps=1e-5)
            if cfg.normalization_type == "layernorm":
                return nn.LayerNorm.create(d, eps=1e-5, dtype=cfg.dtype)
            raise ValueError(cfg.normalization_type)

        def rel_bias() -> nn.Module:
            if cfg.relative_positional_bias == "simple":
                return SimpleRelBias(
                    rel_pos_bias=jnp.zeros((2 * cfg.max_positions - 1,),
                                           cfg.dtype),
                    max_positions=cfg.max_positions,
                )
            return RotaryRelBias(
                alpha=jnp.zeros((1, cfg.shared_representation_size),
                                cfg.dtype),
                b_param=jnp.zeros((1, cfg.shared_representation_size),
                                  cfg.dtype),
                embed_dim=cfg.shared_representation_size,
            )

        layers = tuple(
            MegaBlock(
                mega_layer=GatedAttention(
                    norm=norm(),
                    ema_gate=DampedEma(
                        damping_factor=jnp.zeros((kernel_dim,
                                                  cfg.ema_projection_size, 1),
                                                 cfg.dtype),
                        decay_factor=jnp.zeros((kernel_dim,
                                                cfg.ema_projection_size, 1),
                                               cfg.dtype),
                        ema_expansion_matrix=jnp.zeros(
                            (kernel_dim, cfg.ema_projection_size, 1),
                            cfg.dtype,
                        ),
                        kernel_projection_matrix=jnp.zeros(
                            (kernel_dim, cfg.ema_projection_size), cfg.dtype
                        ),
                        residual_weight=jnp.ones((d,), cfg.dtype),
                        hidden=d,
                        ndim=cfg.ema_projection_size,
                        bidirectional=cfg.bidirectional,
                    ),
                    v_proj=nn.Linear.create(next(keys), d,
                                            cfg.intermediate_size, True,
                                            cfg.dtype),
                    mx_proj=nn.Linear.create(
                        next(keys), d,
                        cfg.shared_representation_size
                        + cfg.intermediate_size + 2 * d,
                        True, cfg.dtype,
                    ),
                    h_proj=nn.Linear.create(next(keys),
                                            cfg.intermediate_size, d, True,
                                            cfg.dtype),
                    qk_weight=jnp.zeros(
                        (2, cfg.shared_representation_size), cfg.dtype
                    ),
                    qk_bias=jnp.zeros(
                        (2, cfg.shared_representation_size), cfg.dtype
                    ),
                    rel_pos_bias=rel_bias(),
                    shared=cfg.shared_representation_size,
                    inter=cfg.intermediate_size,
                    hidden=d,
                    prenorm=cfg.normalize_before_mega,
                ),
                nffn=(
                    NFFN(
                        norm=norm(),
                        fc1=nn.Linear.create(next(keys), d,
                                             cfg.nffn_hidden_size, True,
                                             cfg.dtype),
                        fc2=nn.Linear.create(next(keys),
                                             cfg.nffn_hidden_size, d, True,
                                             cfg.dtype),
                        prenorm=cfg.normalize_before_ffn,
                    )
                    if cfg.use_normalized_ffn else None
                ),
            )
            for _ in range(cfg.num_hidden_layers)
        )
        return MegaLM(
            embedding_layer=_WordEmb(
                word_embeddings=nn.Embedding.create(next(keys),
                                                    cfg.vocab_size, d,
                                                    cfg.dtype),
            ),
            layers=layers,
            dense=(
                nn.Linear.create(next(keys), d, d, True, cfg.dtype)
                if cfg.add_lm_hidden_dense_layer else None
            ),
            lm_head=nn.Linear.create(next(keys), d, cfg.vocab_size, True,
                                     cfg.dtype),
            is_decoder=True,
        )


def translate_hf_mega_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF MegaForCausalLM -> native torch-layout keys: strip ``mega.``,
    embedding_layer nesting kept, norm scalars land on ``scalar``."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.endswith("._float_tensor"):
            continue  # device-tracking buffer
        if k.startswith("mega."):
            k = k[len("mega."):]
        # MegaSequenceNorm wraps the actual norm one level deeper
        k = k.replace(".norm.norm.", ".norm.")
        out[k] = v
    return out
