"""XLNet (inference path), TPU-native.

Reference consumption analogue: AutoModelForCausalLM coverage
(/root/reference/examples/trainer_llm/builder.py:97-107).  Mirrors HF
``XLNetLMHeadModel`` exactly in its standard usage — no ``perm_mask``
/ ``target_mapping`` / ``token_type_ids`` — where the two-stream
permutation machinery degenerates to the CONTENT stream only:

* fully BIDIRECTIONAL attention (attn_type='bi' builds no mask);
* Transformer-XL relative attention: content score (q + r_w_bias) @ k
  plus position score (q + r_r_bias) @ (W_r sinusoid(klen..-qlen+1))
  put through the rel_shift reshape trick, scaled by 1/sqrt(d_head);
* post-LN blocks (LayerNorm AFTER each residual), exact-gelu FFN;
* the head carries a BIAS on the tied projection (lm_loss).

The checkpoint's per-head (d_model, n_head, d_head) q/k/v/o/r tensors
are reshaped into plain ``nn.Linear`` kernels by the translator so
every projection is a decomposable site.  The (unused) mask_emb and
seg_embed parameters are kept as leaves so checkpoints load strictly.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import nn


@dataclass(frozen=True)
class XLNetConfig:
    vocab_size: int = 32000
    d_model: int = 1024
    n_layer: int = 24
    n_head: int = 16
    d_head: int = 64
    d_inner: int = 4096
    layer_norm_eps: float = 1e-12
    clamp_len: int = -1
    dtype: Any = jnp.float32

    @staticmethod
    def from_hf_config(hf: dict, dtype: Any = jnp.bfloat16,
                       remat: bool = False) -> "XLNetConfig":
        if hf.get("attn_type", "bi") != "bi":
            raise ValueError("xlnet attn_type != 'bi' unsupported")
        if hf.get("bi_data"):
            raise ValueError("xlnet bi_data unsupported")
        if hf.get("ff_activation", "gelu") != "gelu":
            raise ValueError(
                f"xlnet ff_activation={hf.get('ff_activation')!r} unsupported"
            )
        return XLNetConfig(
            vocab_size=int(hf["vocab_size"]),
            d_model=int(hf["d_model"]),
            n_layer=int(hf["n_layer"]),
            n_head=int(hf["n_head"]),
            d_head=int(hf["d_head"]),
            d_inner=int(hf["d_inner"]),
            layer_norm_eps=float(hf.get("layer_norm_eps", 1e-12)),
            clamp_len=int(hf.get("clamp_len", -1)),
            dtype=dtype,
        )


class RelAttention(nn.Module):
    q_proj: nn.Linear
    k_proj: nn.Linear
    v_proj: nn.Linear
    o_proj: nn.Linear
    r_proj: nn.Linear
    r_w_bias: jax.Array  # (n_head, d_head)
    r_r_bias: jax.Array
    r_s_bias: jax.Array  # unused (no segments) — checkpoint leaf
    seg_embed: jax.Array  # unused — checkpoint leaf
    layer_norm: nn.LayerNorm
    n_head: int = nn.static_field(default=16)
    d_head: int = nn.static_field(default=64)

    def __call__(self, h, pos_emb, ctx=None):
        b, q, _ = h.shape
        n, dh = self.n_head, self.d_head

        def split(t):
            return t.reshape(b, -1, n, dh)

        qh = split(self.q_proj(h, ctx))
        kh = split(self.k_proj(h, ctx))
        vh = split(self.v_proj(h, ctx))
        kr = self.r_proj(pos_emb, ctx).reshape(-1, n, dh)  # (2q, n, dh)
        ac = jnp.einsum("bind,bjnd->bnij", qh + self.r_w_bias, kh)
        bd = jnp.einsum("bind,jnd->bnij", qh + self.r_r_bias, kr)
        # rel_shift_bnij (HF): reinterpret (b,n,i,2q) as (b,n,2q,i), drop
        # the first row, reinterpret back, keep the first q columns
        klen = ac.shape[3]
        bs, nn_, i, j = bd.shape
        bd = bd.reshape(bs, nn_, j, i)[:, :, 1:, :]
        bd = bd.reshape(bs, nn_, i, j - 1)[:, :, :, :klen]
        score = (ac + bd) * (1.0 / (dh ** 0.5))
        prob = jax.nn.softmax(score, axis=3)
        vec = jnp.einsum("bnij,bjnd->bind", prob, vh)
        out = self.o_proj(vec.reshape(b, q, n * dh), ctx)
        return self.layer_norm(h + out, ctx)


class XLNetFF(nn.Module):
    layer_1: nn.Linear
    layer_2: nn.Linear
    layer_norm: nn.LayerNorm

    def __call__(self, x, ctx=None):
        h = self.layer_2(
            jax.nn.gelu(self.layer_1(x, ctx), approximate=False), ctx
        )
        return self.layer_norm(h + x, ctx)


class XLNetLayer(nn.Module):
    rel_attn: RelAttention
    ff: XLNetFF

    def __call__(self, h, pos_emb, ctx=None):
        return self.ff(self.rel_attn(h, pos_emb, ctx), ctx)


class XLNetLM(nn.Module):
    """dict{input_ids} -> logits (content stream, bidirectional)."""

    word_embedding: nn.Embedding
    mask_emb: jax.Array  # (1, 1, d) — two-stream only, kept for loading
    layer: tuple
    lm_loss: nn.Linear
    d_model: int = nn.static_field(default=1024)
    clamp_len: int = nn.static_field(default=-1)

    def __call__(self, batch, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        ids = batch["input_ids"] if isinstance(batch, dict) else batch
        q = ids.shape[1]
        h = self.word_embedding(ids, ctx)
        # relative positions klen .. -qlen+1 with the classic sinusoid
        pos_seq = jnp.arange(q, -q, -1, dtype=jnp.float32)
        if self.clamp_len > 0:
            pos_seq = jnp.clip(pos_seq, -self.clamp_len, self.clamp_len)
        inv_freq = 1.0 / (
            10000.0 ** (jnp.arange(0, self.d_model, 2.0) / self.d_model)
        )
        sin_inp = jnp.einsum("i,d->id", pos_seq, inv_freq)
        pos_emb = jnp.concatenate([jnp.sin(sin_inp), jnp.cos(sin_inp)],
                                  axis=-1).astype(h.dtype)
        for layer in self.layer:
            h = layer(h, pos_emb, ctx)
        return self.lm_loss(h, ctx)

    @staticmethod
    def create(key: jax.Array, cfg: XLNetConfig) -> "XLNetLM":
        keys = iter(jax.random.split(key, 8 * cfg.n_layer + 8))
        d, n, dh = cfg.d_model, cfg.n_head, cfg.d_head

        def ln():
            return nn.LayerNorm.create(d, eps=cfg.layer_norm_eps,
                                       dtype=cfg.dtype)

        layers = tuple(
            XLNetLayer(
                rel_attn=RelAttention(
                    q_proj=nn.Linear.create(next(keys), d, n * dh, False,
                                            cfg.dtype),
                    k_proj=nn.Linear.create(next(keys), d, n * dh, False,
                                            cfg.dtype),
                    v_proj=nn.Linear.create(next(keys), d, n * dh, False,
                                            cfg.dtype),
                    o_proj=nn.Linear.create(next(keys), n * dh, d, False,
                                            cfg.dtype),
                    r_proj=nn.Linear.create(next(keys), d, n * dh, False,
                                            cfg.dtype),
                    r_w_bias=jnp.zeros((n, dh), cfg.dtype),
                    r_r_bias=jnp.zeros((n, dh), cfg.dtype),
                    r_s_bias=jnp.zeros((n, dh), cfg.dtype),
                    seg_embed=jnp.zeros((2, n, dh), cfg.dtype),
                    layer_norm=ln(),
                    n_head=n,
                    d_head=dh,
                ),
                ff=XLNetFF(
                    layer_1=nn.Linear.create(next(keys), d, cfg.d_inner,
                                             True, cfg.dtype),
                    layer_2=nn.Linear.create(next(keys), cfg.d_inner, d,
                                             True, cfg.dtype),
                    layer_norm=ln(),
                ),
            )
            for _ in range(cfg.n_layer)
        )
        return XLNetLM(
            word_embedding=nn.Embedding.create(next(keys), cfg.vocab_size, d,
                                               cfg.dtype),
            mask_emb=jnp.zeros((1, 1, d), cfg.dtype),
            layer=layers,
            lm_loss=nn.Linear.create(next(keys), d, cfg.vocab_size, True,
                                     cfg.dtype),
            d_model=d,
            clamp_len=cfg.clamp_len,
        )


def translate_hf_xlnet_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF XLNetLMHeadModel -> native torch-layout keys: strip
    ``transformer.``; the per-head (d_model, n_head, d_head) projection
    tensors reshape into Linear kernels (q/k/v/r transpose into
    torch-(out,in) layout, o keeps d_model as the OUT dim)."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.startswith("transformer."):
            k = k[len("transformer."):]
        if k.endswith((".rel_attn.q", ".rel_attn.k", ".rel_attn.v",
                       ".rel_attn.r")):
            d = v.shape[0]
            out[k + "_proj.weight"] = np.ascontiguousarray(
                v.reshape(d, -1).T
            )
            continue
        if k.endswith(".rel_attn.o"):
            d = v.shape[0]
            out[k[:-1] + "o_proj.weight"] = np.ascontiguousarray(
                v.reshape(d, -1)
            )
            continue
        out[k] = v
    return out
