"""Reformer, TPU-native.

Reference consumption analogue: AutoModelForCausalLM coverage
(/root/reference/examples/trainer_llm/builder.py:97-107).  Mirrors HF
``ReformerModelWithLMHead`` exactly:

* REVERSIBLE residual streams: both halves start as the embedding;
  Y1 = X1 + attn(LN(X2)), Y2 = X2 + ff(Y1); the final LayerNorm and
  the lm_head act on the CONCATENATED 2*hidden streams;
* LOCAL attention: both the short-sequence full path and the chunked
  path (circular look_adjacent over neighboring chunks with the
  index-based causal mask neutralizing the wrap-around), key vectors
  pre-scaled by sqrt(head_size), logsumexp-exp softmax with the -1e9
  mask value;
* LSH attention in its deterministic SHORT-SEQUENCE regime
  (sequence_length <= lsh_attn_chunk_length, upstream's
  do_standard_self_attention fallback): shared query/key projection,
  keys length-normalized then scaled, the -1e5 SELF-mask (shared-QK
  tokens must not attend themselves).  TRUE bucketed LSH is refused
  loudly: upstream samples hash rotations from the torch RNG at
  forward time, which no cross-framework implementation can reproduce;
* axial (two-factor broadcast-concatenated) or plain learned position
  embeddings; q/k/v/output/ff projections are decomposable
  ``nn.Linear`` sites.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import nn

_MASK = -1e9
_SELF_MASK = -1e5


@dataclass(frozen=True)
class ReformerConfig:
    vocab_size: int = 320
    hidden_size: int = 256
    attn_layers: tuple = ("local", "lsh", "local", "lsh", "local", "lsh")
    num_attention_heads: int = 12
    attention_head_size: int = 64
    feed_forward_size: int = 512
    hidden_act: str = "relu"
    layer_norm_eps: float = 1e-12
    local_attn_chunk_length: int = 64
    local_num_chunks_before: int = 1
    local_num_chunks_after: int = 0
    lsh_attn_chunk_length: int = 64
    axial_pos_embds: bool = True
    axial_pos_shape: tuple = (64, 64)
    axial_pos_embds_dim: tuple = (64, 192)
    max_position_embeddings: int = 4096
    dtype: Any = jnp.float32

    @staticmethod
    def from_hf_config(hf: dict, dtype: Any = jnp.bfloat16,
                       remat: bool = False) -> "ReformerConfig":
        if hf.get("hidden_act", "relu") not in ("relu", "gelu"):
            raise ValueError(f"reformer hidden_act={hf.get('hidden_act')!r}")
        if int(hf.get("local_num_chunks_after", 0)) != 0:
            raise ValueError("causal reformer needs local_num_chunks_after=0")
        return ReformerConfig(
            vocab_size=int(hf["vocab_size"]),
            hidden_size=int(hf["hidden_size"]),
            attn_layers=tuple(hf["attn_layers"]),
            num_attention_heads=int(hf["num_attention_heads"]),
            attention_head_size=int(hf["attention_head_size"]),
            feed_forward_size=int(hf["feed_forward_size"]),
            hidden_act=hf.get("hidden_act", "relu"),
            layer_norm_eps=float(hf.get("layer_norm_eps", 1e-12)),
            local_attn_chunk_length=int(hf.get("local_attn_chunk_length", 64)),
            local_num_chunks_before=int(hf.get("local_num_chunks_before", 1)),
            local_num_chunks_after=int(hf.get("local_num_chunks_after", 0)),
            lsh_attn_chunk_length=int(hf.get("lsh_attn_chunk_length", 64)),
            axial_pos_embds=bool(hf.get("axial_pos_embds", True)),
            axial_pos_shape=tuple(hf.get("axial_pos_shape", (64, 64))),
            axial_pos_embds_dim=tuple(hf.get("axial_pos_embds_dim",
                                             (64, 192))),
            max_position_embeddings=int(
                hf.get("max_position_embeddings", 4096)
            ),
            dtype=dtype,
        )


def _look_adjacent(x: jax.Array, before: int, after: int) -> jax.Array:
    """HF _look_adjacent: circular neighbor chunks concatenated on the
    within-chunk axis (dim 3)."""
    if before == 0 and after == 0:
        return x
    slices = []
    for i in range(-before, after + 1):
        if i == 0:
            slices.append(x)
        else:
            slices.append(jnp.concatenate([x[:, :, i:], x[:, :, :i]], axis=2))
    return jnp.concatenate(slices, axis=3)


class _AxW(nn.Module):
    weight: jax.Array  # (s1, 1, d0) or (1, s2, d1)

    def __call__(self, x, ctx=None):
        raise NotImplementedError


class AxialPositionEmbeddings(nn.Module):
    weights: tuple  # two _AxW factors
    axial_pos_shape: tuple = nn.static_field(default=(64, 64))

    def __call__(self, seq_len: int, ctx=None):
        s1, s2 = self.axial_pos_shape
        if s1 * s2 < seq_len:
            raise ValueError(
                f"axial_pos_shape {self.axial_pos_shape} too small for "
                f"sequence length {seq_len}"
            )
        pos = jnp.arange(seq_len)
        # HF stores the factors as (s1, 1, d0) and (1, s2, d1)
        w0 = self.weights[0].weight.reshape(s1, -1)
        w1 = self.weights[1].weight.reshape(s2, -1)
        return jnp.concatenate([w0[pos // s2], w1[pos % s2]], axis=-1)[None]


class PositionEmbeddings(nn.Module):
    embedding: nn.Embedding

    def __call__(self, seq_len: int, ctx=None):
        return self.embedding.table[:seq_len][None]


class Embeddings(nn.Module):
    word_embeddings: nn.Embedding
    position_embeddings: nn.Module

    def __call__(self, ids, ctx=None):
        return self.word_embeddings(ids, ctx) + self.position_embeddings(
            ids.shape[1], ctx
        )


class LSHAttention(nn.Module):
    """Deterministic short-sequence (full-attention) regime only."""

    query_key: nn.Linear
    value: nn.Linear
    n_heads: int = nn.static_field(default=12)
    head_size: int = nn.static_field(default=64)
    chunk_length: int = nn.static_field(default=64)

    def __call__(self, x, ctx=None):
        b, s, _ = x.shape
        if s > self.chunk_length:
            raise ValueError(
                f"LSH attention beyond lsh_attn_chunk_length "
                f"({s} > {self.chunk_length}) needs upstream's torch-RNG "
                "hash rotations and cannot be reproduced deterministically"
            )
        n, dh = self.n_heads, self.head_size
        qk = self.query_key(x, ctx).reshape(b, s, n, dh).transpose(0, 2, 1, 3)
        v = self.value(x, ctx).reshape(b, s, n, dh).transpose(0, 2, 1, 3)
        var = jnp.mean(jnp.square(qk), axis=-1, keepdims=True)
        k = qk * jax.lax.rsqrt(var + 1e-6) / math.sqrt(dh)
        dots = jnp.einsum("bhqd,bhkd->bhqk", qk, k)
        idx = jnp.arange(s)
        causal = idx[:, None] >= idx[None, :]
        dots = jnp.where(causal[None, None], dots, _MASK)
        self_mask = idx[:, None] != idx[None, :]
        dots = jnp.where(self_mask[None, None], dots, _SELF_MASK)
        probs = jax.nn.softmax(dots, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        return out.transpose(0, 2, 1, 3).reshape(b, s, n * dh)


class LocalAttention(nn.Module):
    query: nn.Linear
    key: nn.Linear
    value: nn.Linear
    n_heads: int = nn.static_field(default=12)
    head_size: int = nn.static_field(default=64)
    chunk_length: int = nn.static_field(default=64)
    num_chunks_before: int = nn.static_field(default=1)
    num_chunks_after: int = nn.static_field(default=0)

    def __call__(self, x, ctx=None):
        b, s, _ = x.shape
        n, dh = self.n_heads, self.head_size

        def split(t):
            return t.reshape(b, s, n, dh).transpose(0, 2, 1, 3)

        q = split(self.query(x, ctx))
        k = split(self.key(x, ctx)) / math.sqrt(dh)
        v = split(self.value(x, ctx))
        idx = jnp.broadcast_to(jnp.arange(s), (b, n, s))
        if s <= self.chunk_length:
            dots = jnp.einsum("bhqd,bhkd->bhqk", q, k)
            causal = idx[..., :, None] >= idx[..., None, :]
            dots = jnp.where(causal, dots, _MASK)
            probs = jax.nn.softmax(dots, axis=-1)
            out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        else:
            c = self.chunk_length
            if s % c:
                raise ValueError(
                    f"sequence length {s} must be a multiple of "
                    f"local_attn_chunk_length {c} (HF pads via the "
                    "tokenizer; pad inputs explicitly here)"
                )
            nc = s // c

            def chunk(t):
                return t.reshape(b, n, nc, c, dh)

            qc, kc, vc = chunk(q), chunk(k), chunk(v)
            qi = idx.reshape(b, n, nc, c)
            ki = _look_adjacent(qi, self.num_chunks_before,
                                self.num_chunks_after)
            kc = _look_adjacent(kc, self.num_chunks_before,
                                self.num_chunks_after)
            vc = _look_adjacent(vc, self.num_chunks_before,
                                self.num_chunks_after)
            dots = jnp.einsum("bhncd,bhnkd->bhnck", qc, kc)
            causal = qi[..., :, None] >= ki[..., None, :]
            dots = jnp.where(causal, dots, _MASK)
            probs = jax.nn.softmax(dots, axis=-1)
            out = jnp.einsum("bhnck,bhnkd->bhncd", probs, vc)
            out = out.reshape(b, n, s, dh)
        return out.transpose(0, 2, 1, 3).reshape(b, s, n * dh)


class _Dense(nn.Module):
    dense: nn.Linear

    def __call__(self, x, ctx=None):
        return self.dense(x, ctx)


class ReformerAttention(nn.Module):
    layer_norm: nn.LayerNorm
    self_attention: nn.Module
    output: _Dense

    def __call__(self, x, ctx=None):
        return self.output(self.self_attention(self.layer_norm(x, ctx), ctx),
                           ctx)


class ChunkFeedForward(nn.Module):
    layer_norm: nn.LayerNorm
    dense: _Dense
    output: _Dense
    act: str = nn.static_field(default="relu")

    def __call__(self, x, ctx=None):
        h = self.dense(self.layer_norm(x, ctx), ctx)
        h = jax.nn.relu(h) if self.act == "relu" else jax.nn.gelu(
            h, approximate=False
        )
        return self.output(h, ctx)


class ReformerLayer(nn.Module):
    attention: ReformerAttention
    feed_forward: ChunkFeedForward

    def __call__(self, x1, x2, ctx=None):
        y1 = x1 + self.attention(x2, ctx)
        y2 = x2 + self.feed_forward(y1, ctx)
        return y1, y2


class ReformerLMHead(nn.Module):
    decoder: nn.Linear

    def __call__(self, x, ctx=None):
        return self.decoder(x, ctx)


class ReformerLM(nn.Module):
    """dict{input_ids} -> logits (ReformerModelWithLMHead)."""

    embeddings: Embeddings
    layers: tuple
    layer_norm: nn.LayerNorm  # over 2*hidden concatenated streams
    lm_head: ReformerLMHead

    def __call__(self, batch, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        ids = batch["input_ids"] if isinstance(batch, dict) else batch
        h = self.embeddings(ids, ctx)
        x1 = x2 = h
        for layer in self.layers:
            x1, x2 = layer(x1, x2, ctx)
        cat = jnp.concatenate([x1, x2], axis=-1)
        return self.lm_head(self.layer_norm(cat, ctx), ctx)

    @staticmethod
    def create(key: jax.Array, cfg: ReformerConfig) -> "ReformerLM":
        keys = iter(jax.random.split(key, 8 * len(cfg.attn_layers) + 8))
        d = cfg.hidden_size
        n, dh = cfg.num_attention_heads, cfg.attention_head_size
        all_head = n * dh

        def ln(dim):
            return nn.LayerNorm.create(dim, eps=cfg.layer_norm_eps,
                                       dtype=cfg.dtype)

        layers = []
        for kind in cfg.attn_layers:
            if kind == "lsh":
                attn: nn.Module = LSHAttention(
                    query_key=nn.Linear.create(next(keys), d, all_head,
                                               False, cfg.dtype),
                    value=nn.Linear.create(next(keys), d, all_head, False,
                                           cfg.dtype),
                    n_heads=n,
                    head_size=dh,
                    chunk_length=cfg.lsh_attn_chunk_length,
                )
            elif kind == "local":
                attn = LocalAttention(
                    query=nn.Linear.create(next(keys), d, all_head, False,
                                           cfg.dtype),
                    key=nn.Linear.create(next(keys), d, all_head, False,
                                         cfg.dtype),
                    value=nn.Linear.create(next(keys), d, all_head, False,
                                           cfg.dtype),
                    n_heads=n,
                    head_size=dh,
                    chunk_length=cfg.local_attn_chunk_length,
                    num_chunks_before=cfg.local_num_chunks_before,
                    num_chunks_after=cfg.local_num_chunks_after,
                )
            else:
                raise ValueError(f"unknown attn layer {kind!r}")
            layers.append(ReformerLayer(
                attention=ReformerAttention(
                    layer_norm=ln(d),
                    self_attention=attn,
                    output=_Dense(dense=nn.Linear.create(
                        next(keys), all_head, d, False, cfg.dtype
                    )),
                ),
                feed_forward=ChunkFeedForward(
                    layer_norm=ln(d),
                    dense=_Dense(dense=nn.Linear.create(
                        next(keys), d, cfg.feed_forward_size, True, cfg.dtype
                    )),
                    output=_Dense(dense=nn.Linear.create(
                        next(keys), cfg.feed_forward_size, d, True, cfg.dtype
                    )),
                    act=cfg.hidden_act,
                ),
            ))
        if cfg.axial_pos_embds:
            s1, s2 = cfg.axial_pos_shape
            d0, d1 = cfg.axial_pos_embds_dim
            pos: nn.Module = AxialPositionEmbeddings(
                weights=(
                    _AxW(weight=jnp.ones((s1, 1, d0), cfg.dtype)),
                    _AxW(weight=jnp.ones((1, s2, d1), cfg.dtype)),
                ),
                axial_pos_shape=cfg.axial_pos_shape,
            )
        else:
            pos = PositionEmbeddings(embedding=nn.Embedding.create(
                next(keys), cfg.max_position_embeddings, d, cfg.dtype
            ))
        return ReformerLM(
            embeddings=Embeddings(
                word_embeddings=nn.Embedding.create(next(keys),
                                                    cfg.vocab_size, d,
                                                    cfg.dtype),
                position_embeddings=pos,
            ),
            layers=tuple(layers),
            layer_norm=ln(2 * d),
            lm_head=ReformerLMHead(decoder=nn.Linear.create(
                next(keys), 2 * d, cfg.vocab_size, True, cfg.dtype
            )),
        )


def translate_hf_reformer_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF ReformerModelWithLMHead -> native torch-layout keys: strip
    ``reformer.``/``encoder.``; the separate lm_head ``bias`` alias of
    decoder.bias and mask-value buffers are dropped."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.endswith(("mask_value_float16", "mask_value_float32")):
            continue
        if k == "lm_head.bias":
            continue  # alias of lm_head.decoder.bias
        if k.startswith("reformer."):
            k = k[len("reformer."):]
        if k.startswith("encoder.layers."):
            k = k[len("encoder."):]
        if k.startswith("encoder.layer_norm."):
            k = k[len("encoder."):]
        # ParameterList entries land on the _AxW wrapper's weight leaf
        k = re.sub(r"(position_embeddings\.weights\.\d+)$", r"\1.weight", k)
        out[k] = v
    return out
