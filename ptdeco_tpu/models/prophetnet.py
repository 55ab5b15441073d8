"""ProphetNet (n-stream future n-gram decoder), TPU-native.

Reference consumption analogue: AutoModelForCausalLM coverage
(/root/reference/examples/trainer_llm/builder.py:97-107).  Mirrors HF
``ProphetNetForCausalLM`` exactly (modeling_prophetnet.py; the
deprecated XLMProphetNet shares the identical graph and layout):

* three streams per ngram=2 default: the MAIN stream (token embedding +
  learned positions offset by cumsum-from-1) and ngram PREDICT streams
  (pure ngram embedding + positions+1) — upstream indexes
  ``ngram_embeddings[ngram - 1]`` for ngram in range(ngram), so stream
  0 takes the LAST row (kept verbatim);
* the ngram self-attention: main stream attends causally to itself;
  each predict stream attends the main keys/values plus its own
  DIAGONAL position (ngram_attention_bias), with content-dependent
  bucketed relative-position logits (a Linear from the hidden state to
  buckets x heads, gathered by T5-style unidirectional buckets built
  over positions 1..max_target and sliced — including upstream's
  off-by-one column slice on the predict half);
* post-LN residual blocks, exact-gelu FFN;
* ``.logits`` ARE the first PREDICT stream's logits (not the main
  stream) — the model predicts position t+1 from stream 0.

All projections (incl. relative_pos_embeddings) are decomposable
``nn.Linear`` sites.  The bucket tables and stream masks are numpy
constants at trace time (static shapes).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import nn

_NEG = float(np.finfo(np.float32).min)


def _rel_buckets(num_buckets: int, max_distance: int,
                 rel: np.ndarray) -> np.ndarray:
    """HF compute_relative_buckets (unidirectional) in numpy."""
    inv = -rel
    inv = np.maximum(inv, 0)
    max_exact = num_buckets // 2
    is_small = inv < max_exact
    with np.errstate(divide="ignore"):
        large = max_exact + (
            np.log(np.maximum(inv, 1).astype(np.float64) / max_exact)
            / math.log(max_distance / max_exact) * (num_buckets - max_exact)
        ).astype(np.int64)
    large = np.minimum(large, num_buckets - 1)
    return np.where(is_small, inv, large).astype(np.int32)


def _buffered_buckets(num_buckets: int, max_distance: int, max_target: int,
                      seq: int) -> tuple[np.ndarray, np.ndarray]:
    """HF ProphetNetDecoder.compute_buffered_relative_buckets verbatim
    (including the predict half's [max_target : max_target+seq] column
    slice into the concatenated (pos-1, pos) table)."""
    pos = np.arange(1, max_target)[None]  # (1, L)
    main_rel = pos[0][None, None, :] - pos[0][None, :, None]
    main = _rel_buckets(num_buckets, max_distance, main_rel)
    pred_pos = np.concatenate([pos - 1, pos], axis=-1)  # (1, 2L)
    pred_rel = pred_pos[0][None, None, :] - pos[0][None, :, None]
    predict = _rel_buckets(num_buckets, max_distance, pred_rel)
    main = main[:, :seq, :seq]
    predict = np.concatenate(
        [predict[:, :seq, :seq],
         predict[:, :seq, max_target:max_target + seq]],
        axis=2,
    )
    return main[0], predict[0]


def _ngram_bias(max_target: int, ngram: int, seq: int) -> np.ndarray:
    """HF ngram_attention_bias sliced to (ngram, seq, 2*seq)."""
    left = np.full((ngram, max_target, max_target), _NEG, np.float32)
    right = np.full((ngram, max_target, max_target), _NEG, np.float32)
    for s in range(ngram):
        np.fill_diagonal(right[s], 0.0)
        left[s] = np.triu(left[s], -s + 1)
    left[:, :, 0] = 0.0
    return np.concatenate(
        [left[:, :seq, :seq], right[:, :seq, :seq]], axis=-1
    )


@dataclass(frozen=True)
class ProphetNetConfig:
    vocab_size: int = 30522
    hidden_size: int = 1024
    num_decoder_layers: int = 12
    num_decoder_attention_heads: int = 16
    decoder_ffn_dim: int = 4096
    ngram: int = 2
    num_buckets: int = 32
    relative_max_distance: int = 128
    max_position_embeddings: int = 512
    pad_token_id: int = 0
    dtype: Any = jnp.float32

    @staticmethod
    def from_hf_config(hf: dict, dtype: Any = jnp.bfloat16,
                       remat: bool = False) -> "ProphetNetConfig":
        return ProphetNetConfig(
            vocab_size=int(hf["vocab_size"]),
            hidden_size=int(hf["hidden_size"]),
            num_decoder_layers=int(hf["num_decoder_layers"]),
            num_decoder_attention_heads=int(
                hf["num_decoder_attention_heads"]
            ),
            decoder_ffn_dim=int(hf["decoder_ffn_dim"]),
            ngram=int(hf.get("ngram", 2)),
            num_buckets=int(hf.get("num_buckets", 32)),
            relative_max_distance=int(hf.get("relative_max_distance", 128)),
            max_position_embeddings=int(
                hf.get("max_position_embeddings", 512)
            ),
            pad_token_id=int(hf.get("pad_token_id") or 0),
            dtype=dtype,
        )


class NgramSelfAttention(nn.Module):
    query_proj: nn.Linear
    key_proj: nn.Linear
    value_proj: nn.Linear
    out_proj: nn.Linear
    relative_pos_embeddings: nn.Linear
    n_heads: int = nn.static_field(default=16)
    ngram: int = nn.static_field(default=2)
    num_buckets: int = nn.static_field(default=32)

    def _rel_main(self, hidden, buckets, ctx):
        # hidden (b, s, d) -> (b, heads, s, buckets) -> gather columns
        b, s, _ = hidden.shape
        r = self.relative_pos_embeddings(hidden, ctx)
        r = r.reshape(b, s, self.num_buckets, self.n_heads)
        r = r.transpose(0, 3, 1, 2)  # (b, h, s, buckets)
        idx = jnp.broadcast_to(buckets[None, None], (b, self.n_heads) + buckets.shape)
        return jnp.take_along_axis(r, idx, axis=-1)

    def _rel_predict(self, hidden, buckets, ctx):
        # hidden (b, ngram, s, d); buckets (s, 2s)
        b, g, s, _ = hidden.shape
        r = self.relative_pos_embeddings(hidden, ctx)
        r = r.reshape(b, g, s, self.num_buckets, self.n_heads)
        r = r.transpose(0, 1, 4, 2, 3)  # (b, g, h, s, buckets)
        idx = jnp.broadcast_to(
            buckets[None, None, None], (b, g, self.n_heads) + buckets.shape
        )
        return jnp.take_along_axis(r, idx, axis=-1)

    def __call__(self, x, main_mask, predict_bias, main_buckets,
                 predict_buckets, ctx=None):
        b, total, d = x.shape
        g = self.ngram
        s = total // (1 + g)
        hd = d // self.n_heads

        def split(t):
            return t.reshape(b, -1, self.n_heads, hd).transpose(0, 2, 1, 3)

        q = split(self.query_proj(x, ctx)) / math.sqrt(hd)
        k = split(self.key_proj(x, ctx))
        v = split(self.value_proj(x, ctx))
        main_h = x[:, :s]
        pred_h = x[:, s:].reshape(b, g, s, d)
        mq, pq = q[:, :, :s], q[:, :, s:]
        mk, pk = k[:, :, :s], k[:, :, s:]
        mv, pv = v[:, :, :s], v[:, :, s:]

        # MAIN stream
        mw = jnp.einsum("bhqd,bhkd->bhqk", mq, mk)
        mw = mw + self._rel_main(main_h, main_buckets, ctx)
        mw = mw + main_mask
        mp = jax.nn.softmax(mw, axis=-1)
        mo = jnp.einsum("bhqk,bhkd->bhqd", mp, mv)
        mo = mo.transpose(0, 2, 1, 3).reshape(b, s, d)
        mo = self.out_proj(mo, ctx)

        # PREDICT streams: queries (b, g, h, s, hd); keys/values are
        # cat(main, stream_i) along the sequence
        pq = pq.reshape(b, self.n_heads, g, s, hd).transpose(0, 2, 1, 3, 4)
        pk = pk.reshape(b, self.n_heads, g, s, hd).transpose(0, 2, 1, 3, 4)
        pv = pv.reshape(b, self.n_heads, g, s, hd).transpose(0, 2, 1, 3, 4)
        mk_g = jnp.broadcast_to(mk[:, None], (b, g, self.n_heads, s, hd))
        mv_g = jnp.broadcast_to(mv[:, None], (b, g, self.n_heads, s, hd))
        pk_full = jnp.concatenate([mk_g, pk], axis=3)  # (b,g,h,2s,hd)
        pv_full = jnp.concatenate([mv_g, pv], axis=3)
        pw = jnp.einsum("bghqd,bghkd->bghqk", pq, pk_full)
        pw = pw + self._rel_predict(pred_h, predict_buckets, ctx)
        pw = pw + predict_bias[None, :, None]  # (g, s, 2s) -> (1,g,1,s,2s)
        pp = jax.nn.softmax(pw, axis=-1)
        po = jnp.einsum("bghqk,bghkd->bghqd", pp, pv_full)
        po = po.transpose(0, 1, 3, 2, 4).reshape(b, g, s, d)
        po = self.out_proj(po, ctx)

        return jnp.concatenate([mo, po.reshape(b, g * s, d)], axis=1)


class FeedForward(nn.Module):
    intermediate: nn.Linear
    output: nn.Linear

    def __call__(self, x, ctx=None):
        return self.output(
            jax.nn.gelu(self.intermediate(x, ctx), approximate=False), ctx
        )


class DecoderLayer(nn.Module):
    self_attn: NgramSelfAttention
    self_attn_layer_norm: nn.LayerNorm
    feed_forward: FeedForward
    feed_forward_layer_norm: nn.LayerNorm

    def __call__(self, x, main_mask, predict_bias, main_buckets,
                 predict_buckets, ctx=None):
        a = self.self_attn(x, main_mask, predict_bias, main_buckets,
                           predict_buckets, ctx)
        x = self.self_attn_layer_norm(x + a, ctx)
        return self.feed_forward_layer_norm(x + self.feed_forward(x, ctx),
                                            ctx)


class ProphetNetLM(nn.Module):
    """dict{input_ids} -> logits; upstream's .logits come from PREDICT
    stream 0 (the t+1 predictor), reproduced here."""

    word_embeddings: nn.Embedding
    position_embeddings: nn.Embedding
    ngram_embeddings: nn.Embedding
    embeddings_layer_norm: nn.LayerNorm
    layers: tuple
    lm_head: nn.Linear
    ngram: int = nn.static_field(default=2)
    num_buckets: int = nn.static_field(default=32)
    relative_max_distance: int = nn.static_field(default=128)
    max_target: int = nn.static_field(default=512)
    pad_token_id: int = nn.static_field(default=0)

    def __call__(self, batch, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        ids = batch["input_ids"] if isinstance(batch, dict) else batch
        b, s = ids.shape
        g = self.ngram
        pos = jnp.arange(1, s + 1) + self.pad_token_id  # cumsum-of-ones rule
        pos = jnp.minimum(pos, self.max_target - 1)
        main = self.word_embeddings(ids, ctx) + self.position_embeddings.table[pos][None]
        pred_pos = self.position_embeddings.table[pos + 1]
        # upstream: ngram_embeddings.weight[ngram - 1] for ngram in range(g)
        rows = [(i - 1) % g for i in range(g)]
        streams = [
            jnp.broadcast_to(
                (self.ngram_embeddings.table[r] + pred_pos)[None],
                (b, s, main.shape[-1]),
            )
            for r in rows
        ]
        h = jnp.concatenate([main] + streams, axis=1)
        h = self.embeddings_layer_norm(h, ctx)

        main_buckets, predict_buckets = _buffered_buckets(
            self.num_buckets, self.relative_max_distance, self.max_target, s
        )
        main_mask = jnp.asarray(
            np.triu(np.full((s, s), _NEG, np.float32), 1)[None, None]
        )
        predict_bias = jnp.asarray(_ngram_bias(self.max_target, g, s))
        mb = jnp.asarray(main_buckets)
        pb = jnp.asarray(predict_buckets)
        for layer in self.layers:
            h = layer(h, main_mask, predict_bias, mb, pb, ctx)
        stream0 = h[:, s:2 * s]
        return self.lm_head(stream0, ctx)

    @staticmethod
    def create(key: jax.Array, cfg: ProphetNetConfig) -> "ProphetNetLM":
        keys = iter(jax.random.split(key, 8 * cfg.num_decoder_layers + 8))
        d = cfg.hidden_size

        def ln():
            return nn.LayerNorm.create(d, eps=1e-5, dtype=cfg.dtype)

        layers = tuple(
            DecoderLayer(
                self_attn=NgramSelfAttention(
                    query_proj=nn.Linear.create(next(keys), d, d, True,
                                                cfg.dtype),
                    key_proj=nn.Linear.create(next(keys), d, d, True,
                                              cfg.dtype),
                    value_proj=nn.Linear.create(next(keys), d, d, True,
                                                cfg.dtype),
                    out_proj=nn.Linear.create(next(keys), d, d, True,
                                              cfg.dtype),
                    relative_pos_embeddings=nn.Linear.create(
                        next(keys), d,
                        cfg.num_buckets * cfg.num_decoder_attention_heads,
                        True, cfg.dtype,
                    ),
                    n_heads=cfg.num_decoder_attention_heads,
                    ngram=cfg.ngram,
                    num_buckets=cfg.num_buckets,
                ),
                self_attn_layer_norm=ln(),
                feed_forward=FeedForward(
                    intermediate=nn.Linear.create(
                        next(keys), d, cfg.decoder_ffn_dim, True, cfg.dtype
                    ),
                    output=nn.Linear.create(
                        next(keys), cfg.decoder_ffn_dim, d, True, cfg.dtype
                    ),
                ),
                feed_forward_layer_norm=ln(),
            )
            for _ in range(cfg.num_decoder_layers)
        )
        return ProphetNetLM(
            word_embeddings=nn.Embedding.create(next(keys), cfg.vocab_size,
                                                d, cfg.dtype),
            position_embeddings=nn.Embedding.create(
                next(keys), cfg.max_position_embeddings, d, cfg.dtype
            ),
            ngram_embeddings=nn.Embedding.create(next(keys), cfg.ngram, d,
                                                 cfg.dtype),
            embeddings_layer_norm=ln(),
            layers=layers,
            lm_head=nn.Linear.create(next(keys), d, cfg.vocab_size, False,
                                     cfg.dtype),
            ngram=cfg.ngram,
            num_buckets=cfg.num_buckets,
            relative_max_distance=cfg.relative_max_distance,
            max_target=cfg.max_position_embeddings,
            pad_token_id=cfg.pad_token_id,
        )


def translate_hf_prophetnet_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF ProphetNetForCausalLM (and the deprecated XLMProphetNet twin)
    -> native torch-layout keys: strip ``prophetnet.decoder.`` /
    ``prophetnet.``, drop the duplicate tied word embedding and the
    (unused without an encoder) cross-attention blocks."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if ".cross_attn." in k or ".cross_attn_layer_norm." in k:
            continue
        if k == "prophetnet.word_embeddings.weight":
            continue  # tied duplicate of decoder.word_embeddings
        if k.startswith("prophetnet.decoder."):
            k = k[len("prophetnet.decoder."):]
        elif k.startswith("prophetnet."):
            k = k[len("prophetnet."):]
        out[k] = v
    return out
