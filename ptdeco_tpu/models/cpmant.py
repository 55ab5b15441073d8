"""CPM-Ant, TPU-native.

Reference consumption analogue: AutoModelForCausalLM coverage
(/root/reference/examples/trainer_llm/builder.py:97-107).  Mirrors HF
``CpmAntForCausalLM`` exactly (modeling_cpmant.py):

* the model PREPENDS its 32 learned prompt tokens (ids
  2*prompt_length+vocab .. 3*prompt_length+vocab) to every sequence and
  drops those positions from the output;
* segments: prompt -> 0, nonzero token -> 2, zero token -> 0 (zero ids
  are LEFT padding, masked out by the length rule);
* with context=1 everywhere the attention is fully BIDIRECTIONAL —
  upstream's mask reduces to the padding mask (kept verbatim);
* segment-relative position bias: same-segment pairs use the T5-style
  bidirectional log bucket of (k_pos - q_pos); cross-segment pairs use
  a (q_seg * segment_types + k_seg + num_buckets) bucket, one shared
  (segment_types^2 + num_buckets, heads) table;
* RMSNorm pre-norm blocks, bias-free q/k/v/out with a decoupled
  dim_head, gelu-gated FFN (gelu(w_0 x) * w_1 -> w_out), final RMSNorm,
  logits through the TIED extended embedding (vocab + prompt rows).

All projections are decomposable ``nn.Linear`` sites.
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
class CpmAntConfig:
    vocab_size: int = 30720
    hidden_size: int = 4096
    num_hidden_layers: int = 48
    num_attention_heads: int = 32
    dim_head: int = 128
    dim_ff: int = 10240
    prompt_types: int = 32
    prompt_length: int = 32
    segment_types: int = 32
    position_bias_num_buckets: int = 512
    position_bias_max_distance: int = 2048
    eps: float = 1e-6
    dtype: Any = jnp.float32

    @staticmethod
    def from_hf_config(hf: dict, dtype: Any = jnp.bfloat16,
                       remat: bool = False) -> "CpmAntConfig":
        return CpmAntConfig(
            vocab_size=int(hf["vocab_size"]),
            hidden_size=int(hf["hidden_size"]),
            num_hidden_layers=int(hf["num_hidden_layers"]),
            num_attention_heads=int(hf["num_attention_heads"]),
            dim_head=int(hf["dim_head"]),
            dim_ff=int(hf["dim_ff"]),
            prompt_types=int(hf.get("prompt_types", 32)),
            prompt_length=int(hf.get("prompt_length", 32)),
            segment_types=int(hf.get("segment_types", 32)),
            position_bias_num_buckets=int(
                hf.get("position_bias_num_buckets", 512)
            ),
            position_bias_max_distance=int(
                hf.get("position_bias_max_distance", 2048)
            ),
            eps=float(hf.get("eps", 1e-6)),
            dtype=dtype,
        )


class CpmAttention(nn.Module):
    project_q: nn.Linear
    project_k: nn.Linear
    project_v: nn.Linear
    attention_out: nn.Linear
    n_heads: int = nn.static_field(default=32)
    dim_head: int = nn.static_field(default=128)

    def __call__(self, x, mask, bias, ctx=None):
        b, n, _ = x.shape

        def split(t):
            return t.reshape(b, n, self.n_heads, self.dim_head).transpose(
                0, 2, 1, 3
            )

        q = split(self.project_q(x, ctx))
        k = split(self.project_k(x, ctx))
        v = split(self.project_v(x, ctx))
        score = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(self.dim_head)
        score = score + bias
        score = jnp.where(mask[:, None], score, -jnp.inf)
        score = jax.nn.softmax(score, axis=-1)
        # upstream re-zeroes masked entries after the softmax (all-masked
        # rows would otherwise be NaN)
        score = jnp.where(mask[:, None], score, 0.0)
        out = jnp.einsum("bhqk,bhkd->bhqd", score, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, -1)
        return self.attention_out(out, ctx)


class GatedFFNInner(nn.Module):
    w_0: nn.Linear
    w_1: nn.Linear

    def __call__(self, x, ctx=None):
        return jax.nn.gelu(self.w_0(x, ctx), approximate=False) * self.w_1(
            x, ctx
        )


class GatedFFN(nn.Module):
    w_in: GatedFFNInner
    w_out: nn.Linear

    def __call__(self, x, ctx=None):
        return self.w_out(self.w_in(x, ctx), ctx)


class SelfAttBlock(nn.Module):
    layernorm_before_attention: nn.RMSNorm
    self_attention: CpmAttention

    def __call__(self, x, mask, bias, ctx=None):
        return x + self.self_attention(
            self.layernorm_before_attention(x, ctx), mask, bias, ctx
        )


class FFNBlock(nn.Module):
    layernorm_before_ffn: nn.RMSNorm
    ffn: GatedFFN

    def __call__(self, x, ctx=None):
        return x + self.ffn(self.layernorm_before_ffn(x, ctx), ctx)


class CpmBlock(nn.Module):
    self_att: SelfAttBlock
    ffn: FFNBlock

    def __call__(self, x, mask, bias, ctx=None):
        return self.ffn(self.self_att(x, mask, bias, ctx), ctx)


class Encoder(nn.Module):
    layers: tuple
    output_layernorm: nn.RMSNorm

    def __call__(self, x, mask, bias, ctx=None):
        for layer in self.layers:
            x = layer(x, mask, bias, ctx)
        return self.output_layernorm(x, ctx)


class SegmentPositionBias(nn.Module):
    relative_attention_bias: jax.Array  # (S^2 + buckets, heads)
    num_buckets: int = nn.static_field(default=512)
    max_distance: int = nn.static_field(default=2048)
    num_segments: int = nn.static_field(default=32)

    def __call__(self, position, segment, ctx=None):
        # position (b, n) int32; segment (b, n) int32
        rel_seg = segment[:, :, None] * self.num_segments + segment[:, None, :]
        rel_seg = rel_seg + self.num_buckets
        rel_pos = position[:, None, :] - position[:, :, None]  # k - q
        abs_bucket = _t5_bucket(rel_pos[0], self.num_buckets,
                                self.max_distance)[None]
        bucket = jnp.where(
            segment[:, None, :] == segment[:, :, None], abs_bucket, rel_seg
        )
        embeds = jnp.take(self.relative_attention_bias, bucket, axis=0)
        return embeds.transpose(0, 3, 1, 2)  # (b, heads, q, k)


def _t5_bucket(rel: jax.Array, num_buckets: int, max_distance: int) -> jax.Array:
    """HF CpmAntSegmentPositionEmbedding._position_bucket (always
    bidirectional) in int32."""
    nb = num_buckets // 2
    buckets = (rel > 0).astype(jnp.int32) * nb
    rel = jnp.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    large = max_exact + (
        jnp.log(rel.astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact)
        * (nb - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, nb - 1)
    return buckets + jnp.where(is_small, rel.astype(jnp.int32), large)


class CpmAntLM(nn.Module):
    """dict{input_ids} -> logits over the EXTENDED vocabulary
    (vocab + prompt_types*prompt_length), prompt positions dropped."""

    input_embedding: nn.Embedding
    segment_embedding: nn.Embedding
    position_bias: SegmentPositionBias
    encoder: Encoder
    prompt_length: int = nn.static_field(default=32)
    base_vocab: int = nn.static_field(default=30720)

    def __call__(self, batch, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        ids = batch["input_ids"] if isinstance(batch, dict) else batch
        b, n = ids.shape
        pl = self.prompt_length
        segment = jnp.where(ids != 0, 2, 0).astype(jnp.int32)
        length = (segment != 0).sum(axis=-1)
        prompt_ids = jnp.arange(
            pl * 2 + self.base_vocab, pl * 3 + self.base_vocab, dtype=ids.dtype
        )
        full_ids = jnp.concatenate(
            [jnp.broadcast_to(prompt_ids, (b, pl)), ids], axis=1
        )
        segment = jnp.concatenate(
            [jnp.zeros((b, pl), jnp.int32), segment], axis=1
        )
        total = n + pl
        position = jnp.broadcast_to(jnp.arange(total, dtype=jnp.int32),
                                    (b, total))
        # context=1 everywhere -> the directional term vanishes; only the
        # left-padding length mask survives (modeling_cpmant
        # _prepare_attention_mask)
        mask_1d = jnp.concatenate(
            [
                jnp.ones((b, pl), bool),
                jnp.arange(n - 1, -1, -1)[None, :] < length[:, None],
            ],
            axis=1,
        )
        mask = mask_1d[:, :, None] & mask_1d[:, None, :]
        h = self.input_embedding(full_ids, ctx) + self.segment_embedding(
            segment, ctx
        )
        bias = self.position_bias(position, segment, ctx)
        h = self.encoder(h, mask, bias, ctx)
        h = h[:, pl:, :]
        # tied head over the extended embedding table
        return h @ self.input_embedding.table.T

    @staticmethod
    def create(key: jax.Array, cfg: CpmAntConfig) -> "CpmAntLM":
        keys = iter(jax.random.split(key, 8 * cfg.num_hidden_layers + 8))
        d, dh, nh = cfg.hidden_size, cfg.dim_head, cfg.num_attention_heads

        def rms():
            return nn.RMSNorm.create(d, eps=cfg.eps, dtype=cfg.dtype)

        layers = tuple(
            CpmBlock(
                self_att=SelfAttBlock(
                    layernorm_before_attention=rms(),
                    self_attention=CpmAttention(
                        project_q=nn.Linear.create(next(keys), d, nh * dh,
                                                   False, cfg.dtype),
                        project_k=nn.Linear.create(next(keys), d, nh * dh,
                                                   False, cfg.dtype),
                        project_v=nn.Linear.create(next(keys), d, nh * dh,
                                                   False, cfg.dtype),
                        attention_out=nn.Linear.create(next(keys), nh * dh, d,
                                                       False, cfg.dtype),
                        n_heads=nh,
                        dim_head=dh,
                    ),
                ),
                ffn=FFNBlock(
                    layernorm_before_ffn=rms(),
                    ffn=GatedFFN(
                        w_in=GatedFFNInner(
                            w_0=nn.Linear.create(next(keys), d, cfg.dim_ff,
                                                 False, cfg.dtype),
                            w_1=nn.Linear.create(next(keys), d, cfg.dim_ff,
                                                 False, cfg.dtype),
                        ),
                        w_out=nn.Linear.create(next(keys), cfg.dim_ff, d,
                                               False, cfg.dtype),
                    ),
                ),
            )
            for _ in range(cfg.num_hidden_layers)
        )
        ext_vocab = cfg.vocab_size + cfg.prompt_types * cfg.prompt_length
        return CpmAntLM(
            input_embedding=nn.Embedding.create(next(keys), ext_vocab, d,
                                                cfg.dtype),
            segment_embedding=nn.Embedding.create(next(keys),
                                                  cfg.segment_types, d,
                                                  cfg.dtype),
            position_bias=SegmentPositionBias(
                relative_attention_bias=jax.random.normal(
                    next(keys),
                    (cfg.segment_types ** 2 + cfg.position_bias_num_buckets,
                     nh),
                    cfg.dtype,
                ) * 0.02,
                num_buckets=cfg.position_bias_num_buckets,
                max_distance=cfg.position_bias_max_distance,
                num_segments=cfg.segment_types,
            ),
            encoder=Encoder(layers=layers, output_layernorm=rms()),
            prompt_length=cfg.prompt_length,
            base_vocab=cfg.vocab_size,
        )


def translate_hf_cpmant_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF CpmAntForCausalLM -> native torch-layout keys: strip
    ``cpmant.``; the tied lm_head is dropped."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k == "lm_head.weight":
            continue
        if k.startswith("cpmant."):
            k = k[len("cpmant."):]
        out[k] = v
    return out
