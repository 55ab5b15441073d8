"""Transformer-XL, TPU-native.

Reference consumption analogue: AutoModelForCausalLM coverage
(/root/reference/examples/trainer_llm/builder.py:97-107).  Mirrors HF
``TransfoXLLMHeadModel`` (deprecated namespace) exactly for a single
segment:

* HF's ``init_mems`` prepends ``mem_len`` ZERO memory vectors on the
  very first forward — their (bias-free) zero keys/values still join
  the softmax through the position term, so they materially shape the
  output (reproduced verbatim, klen = mem_len + qlen);
* relative partial-learnable attention: fused bias-free qkv, the
  sinusoid r projected per layer, r_w/r_r biases (untied per layer),
  the zero-pad rel_shift, post-LN residuals (pre_lnorm supported);
* ADAPTIVE embedding (div_val clusters at shrinking widths, projected
  to d_model and scaled by sqrt(d_proj)) and the projected adaptive
  log-softmax head — like upstream, the model's output scores are LOG
  PROBABILITIES over the full vocabulary, assembled from the head
  cluster and cluster-conditional tails;
* same_length masking supported (the stock wt103 config).

qkv/o/r projections are decomposable ``nn.Linear`` sites.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import nn


@dataclass(frozen=True)
class TransfoXLConfig:
    vocab_size: int = 267735
    cutoffs: tuple = (20000, 40000, 200000)
    d_model: int = 1024
    d_embed: int = 1024
    n_head: int = 16
    d_head: int = 64
    d_inner: int = 4096
    div_val: int = 4
    n_layer: int = 18
    mem_len: int = 1600
    clamp_len: int = 1000
    same_length: bool = True
    pre_lnorm: bool = False
    layer_norm_epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @staticmethod
    def from_hf_config(hf: dict, dtype: Any = jnp.bfloat16,
                       remat: bool = False) -> "TransfoXLConfig":
        if int(hf.get("attn_type", 0)) != 0:
            raise ValueError("transfo-xl attn_type != 0 unsupported")
        if not hf.get("untie_r", True):
            raise ValueError("transfo-xl untie_r=False unsupported")
        return TransfoXLConfig(
            vocab_size=int(hf["vocab_size"]),
            cutoffs=tuple(hf.get("cutoffs", ())),
            d_model=int(hf["d_model"]),
            d_embed=int(hf.get("d_embed", hf["d_model"])),
            n_head=int(hf["n_head"]),
            d_head=int(hf["d_head"]),
            d_inner=int(hf["d_inner"]),
            div_val=int(hf.get("div_val", 1)),
            n_layer=int(hf["n_layer"]),
            mem_len=int(hf.get("mem_len", 0)),
            clamp_len=int(hf.get("clamp_len", -1)),
            same_length=bool(hf.get("same_length", False)),
            pre_lnorm=bool(hf.get("pre_lnorm", False)),
            layer_norm_epsilon=float(hf.get("layer_norm_epsilon", 1e-5)),
            dtype=dtype,
        )


class _Emb(nn.Module):
    weight: jax.Array  # torch Embedding layout (n, d)

    def __call__(self, x, ctx=None):
        raise NotImplementedError


class _Proj(nn.Module):
    proj: jax.Array  # (d_proj, d_emb_i)

    def __call__(self, x, ctx=None):
        raise NotImplementedError


class AdaptiveEmbedding(nn.Module):
    emb_layers: tuple  # of _Emb
    emb_projs: tuple  # of _Proj (possibly empty when d_proj == d_embed)
    cutoff_ends: tuple = nn.static_field(default=(0,))
    emb_scale: float = nn.static_field(default=32.0)

    def __call__(self, ids, ctx=None):
        if len(self.emb_layers) == 1:
            out = self.emb_layers[0].weight[ids]
            if self.emb_projs:
                out = out @ self.emb_projs[0].proj.T
        else:
            out = None
            for i, layer in enumerate(self.emb_layers):
                lo, hi = self.cutoff_ends[i], self.cutoff_ends[i + 1]
                local = jnp.clip(ids - lo, 0, hi - lo - 1)
                emb = layer.weight[local] @ self.emb_projs[i].proj.T
                sel = ((ids >= lo) & (ids < hi))[..., None]
                out = emb if out is None else jnp.where(sel, emb, out)
        return out * self.emb_scale


class RelAttn(nn.Module):
    qkv_net: nn.Linear
    r_net: nn.Linear
    o_net: nn.Linear
    layer_norm: nn.LayerNorm
    r_w_bias: jax.Array
    r_r_bias: jax.Array
    n_head: int = nn.static_field(default=16)
    d_head: int = nn.static_field(default=64)
    pre_lnorm: bool = nn.static_field(default=False)

    def __call__(self, w, pos_emb, mask, mlen, ctx=None):
        # w (b, q, d); zero mems of length mlen are prepended to k/v
        b, q, d = w.shape
        n, dh = self.n_head, self.d_head
        cat = jnp.concatenate(
            [jnp.zeros((b, mlen, d), w.dtype), w], axis=1
        ) if mlen else w
        src = self.layer_norm(cat, ctx) if self.pre_lnorm else cat
        heads = self.qkv_net(src, ctx)
        qh, kh, vh = jnp.split(heads, 3, axis=-1)
        qh = qh[:, -q:]
        klen = kh.shape[1]
        qh = qh.reshape(b, q, n, dh)
        kh = kh.reshape(b, klen, n, dh)
        vh = vh.reshape(b, klen, n, dh)
        rk = self.r_net(pos_emb, ctx).reshape(-1, n, dh)  # (klen, n, dh)
        ac = jnp.einsum("bind,bjnd->bijn", qh + self.r_w_bias, kh)
        bd = jnp.einsum("bind,jnd->bijn", qh + self.r_r_bias, rk)
        # zero-pad rel shift on (b, i, j, n): pad j-front, reinterpret
        bd = jnp.pad(bd, ((0, 0), (0, 0), (1, 0), (0, 0)))
        bd = bd.reshape(b, klen + 1, q, n)[:, 1:].reshape(b, q, klen, n)
        score = (ac + bd) * (1.0 / (dh ** 0.5))
        score = jnp.where(mask[None, :, :, None],
                          jnp.finfo(score.dtype).min, score)
        prob = jax.nn.softmax(score, axis=2)
        vec = jnp.einsum("bijn,bjnd->bind", prob, vh).reshape(b, q, n * dh)
        out = self.o_net(vec, ctx)
        if self.pre_lnorm:
            return w + out
        return self.layer_norm(w + out, ctx)


class PosFF(nn.Module):
    core1: nn.Linear  # CoreNet.0
    core2: nn.Linear  # CoreNet.3
    layer_norm: nn.LayerNorm
    pre_lnorm: bool = nn.static_field(default=False)

    def __call__(self, x, ctx=None):
        src = self.layer_norm(x, ctx) if self.pre_lnorm else x
        h = self.core2(jax.nn.relu(self.core1(src, ctx)), ctx)
        if self.pre_lnorm:
            return x + h
        return self.layer_norm(x + h, ctx)


class XLLayer(nn.Module):
    dec_attn: RelAttn
    pos_ff: PosFF

    def __call__(self, x, pos_emb, mask, mlen, ctx=None):
        return self.pos_ff(self.dec_attn(x, pos_emb, mask, mlen, ctx), ctx)


class AdaptiveLogSoftmax(nn.Module):
    """ProjectedAdaptiveLogSoftmax (labels=None path): full-vocab log
    probabilities from the head cluster + conditional tails."""

    out_layers: tuple  # of _Emb-like {weight, bias}
    out_projs: tuple  # of Optional[_Proj]
    cluster_weight: Optional[jax.Array] = None
    cluster_bias: Optional[jax.Array] = None
    cutoffs: tuple = nn.static_field(default=())
    div_val: int = nn.static_field(default=1)

    def __call__(self, hidden, ctx=None):
        def logit(h, weight, bias, proj):
            if proj is not None:
                h = h @ proj.proj
            return h @ weight.T + bias

        if not self.cutoffs or len(self.cutoffs) == 1:
            out = logit(hidden, self.out_layers[0].weight,
                        self.out_layers[0].bias,
                        self.out_projs[0] if self.out_projs else None)
            return jax.nn.log_softmax(out, axis=-1)
        cut0 = self.cutoffs[0]
        if self.div_val == 1:
            w0 = self.out_layers[0].weight[:cut0]
            b0 = self.out_layers[0].bias[:cut0]
        else:
            w0 = self.out_layers[0].weight
            b0 = self.out_layers[0].bias
        head_w = jnp.concatenate([w0, self.cluster_weight], axis=0)
        head_b = jnp.concatenate([b0, self.cluster_bias], axis=0)
        head = logit(hidden, head_w, head_b,
                     self.out_projs[0] if self.out_projs else None)
        head_lp = jax.nn.log_softmax(head, axis=-1)
        pieces = [head_lp[..., :cut0]]
        bounds = (0,) + tuple(self.cutoffs)
        for i in range(1, len(bounds) - 1):
            lo, hi = bounds[i], bounds[i + 1]
            if self.div_val == 1:
                wi = self.out_layers[0].weight[lo:hi]
                bi = self.out_layers[0].bias[lo:hi]
            else:
                wi = self.out_layers[i].weight
                bi = self.out_layers[i].bias
            tail = logit(hidden, wi, bi,
                         self.out_projs[i] if self.out_projs else None)
            tail_lp = jax.nn.log_softmax(tail, axis=-1)
            pieces.append(head_lp[..., cut0 + i - 1:cut0 + i] + tail_lp)
        return jnp.concatenate(pieces, axis=-1)


class _OutLayer(nn.Module):
    weight: jax.Array
    bias: jax.Array

    def __call__(self, x, ctx=None):
        raise NotImplementedError


class TransfoXLLM(nn.Module):
    """dict{input_ids} -> full-vocab LOG PROBABILITIES (upstream's
    prediction_scores ARE post-log-softmax)."""

    word_emb: AdaptiveEmbedding
    layers: tuple
    crit: AdaptiveLogSoftmax
    n_layer: int = nn.static_field(default=18)
    d_model: int = nn.static_field(default=1024)
    mem_len: int = nn.static_field(default=1600)
    clamp_len: int = nn.static_field(default=1000)
    same_length: bool = nn.static_field(default=True)

    def __call__(self, batch, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        ids = batch["input_ids"] if isinstance(batch, dict) else batch
        q = ids.shape[1]
        mlen = self.mem_len
        klen = mlen + q
        h = self.word_emb(ids, ctx)
        ones = np.ones((q, klen), bool)
        if self.same_length:
            mask_len = klen - self.mem_len
            shift = q - mask_len if mask_len > 0 else q
            mask = np.triu(ones, 1 + mlen) + np.tril(ones, -shift)
        else:
            mask = np.triu(ones, 1 + mlen)
        mask = jnp.asarray(mask)
        pos_seq = jnp.arange(klen - 1, -1, -1, dtype=jnp.float32)
        if self.clamp_len > 0:
            pos_seq = jnp.minimum(pos_seq, self.clamp_len)
        inv_freq = 1.0 / (
            10000.0 ** (jnp.arange(0.0, self.d_model, 2.0) / self.d_model)
        )
        sin_inp = jnp.einsum("i,d->id", pos_seq, inv_freq)
        pos_emb = jnp.concatenate(
            [jnp.sin(sin_inp), jnp.cos(sin_inp)], axis=-1
        ).astype(h.dtype)
        for layer in self.layers:
            h = layer(h, pos_emb, mask, mlen, ctx)
        return self.crit(h, ctx)

    @staticmethod
    def create(key: jax.Array, cfg: TransfoXLConfig) -> "TransfoXLLM":
        keys = iter(jax.random.split(key, 8 * cfg.n_layer + 16))
        d, n, dh = cfg.d_model, cfg.n_head, cfg.d_head
        cutoffs = tuple(cfg.cutoffs) + (cfg.vocab_size,)
        cutoff_ends = (0,) + cutoffs

        def ln():
            return nn.LayerNorm.create(d, eps=cfg.layer_norm_epsilon,
                                       dtype=cfg.dtype)

        if cfg.div_val == 1:
            emb_layers = (_Emb(weight=jax.random.normal(
                next(keys), (cfg.vocab_size, cfg.d_embed), cfg.dtype
            ) * 0.02),)
            emb_projs = (
                (_Proj(proj=jax.random.normal(
                    next(keys), (d, cfg.d_embed), cfg.dtype) * 0.02),)
                if d != cfg.d_embed else ()
            )
        else:
            emb_layers = tuple(
                _Emb(weight=jax.random.normal(
                    next(keys),
                    (cutoff_ends[i + 1] - cutoff_ends[i],
                     cfg.d_embed // (cfg.div_val ** i)),
                    cfg.dtype,
                ) * 0.02)
                for i in range(len(cutoffs))
            )
            emb_projs = tuple(
                _Proj(proj=jax.random.normal(
                    next(keys), (d, cfg.d_embed // (cfg.div_val ** i)),
                    cfg.dtype,
                ) * 0.02)
                for i in range(len(cutoffs))
            )
        layers = tuple(
            XLLayer(
                dec_attn=RelAttn(
                    qkv_net=nn.Linear.create(next(keys), d, 3 * n * dh,
                                             False, cfg.dtype),
                    r_net=nn.Linear.create(next(keys), d, n * dh, False,
                                           cfg.dtype),
                    o_net=nn.Linear.create(next(keys), n * dh, d, False,
                                           cfg.dtype),
                    layer_norm=ln(),
                    r_w_bias=jnp.zeros((n, dh), cfg.dtype),
                    r_r_bias=jnp.zeros((n, dh), cfg.dtype),
                    n_head=n,
                    d_head=dh,
                    pre_lnorm=cfg.pre_lnorm,
                ),
                pos_ff=PosFF(
                    core1=nn.Linear.create(next(keys), d, cfg.d_inner, True,
                                           cfg.dtype),
                    core2=nn.Linear.create(next(keys), cfg.d_inner, d, True,
                                           cfg.dtype),
                    layer_norm=ln(),
                    pre_lnorm=cfg.pre_lnorm,
                ),
            )
            for _ in range(cfg.n_layer)
        )
        n_clusters = len(cutoffs) - 1
        if cfg.div_val == 1:
            out_layers = (_OutLayer(
                weight=jax.random.normal(next(keys),
                                         (cfg.vocab_size, cfg.d_embed),
                                         cfg.dtype) * 0.02,
                bias=jnp.zeros((cfg.vocab_size,), cfg.dtype),
            ),)
            out_projs = tuple(
                _Proj(proj=jax.random.normal(
                    next(keys), (d, cfg.d_embed), cfg.dtype) * 0.02)
                for _ in range(len(cutoffs))
            ) if d != cfg.d_embed else ()
        else:
            out_layers = tuple(
                _OutLayer(
                    weight=jax.random.normal(
                        next(keys),
                        (cutoff_ends[i + 1] - cutoff_ends[i],
                         cfg.d_embed // (cfg.div_val ** i)),
                        cfg.dtype,
                    ) * 0.02,
                    bias=jnp.zeros(
                        (cutoff_ends[i + 1] - cutoff_ends[i],), cfg.dtype
                    ),
                )
                for i in range(len(cutoffs))
            )
            out_projs = tuple(
                _Proj(proj=jax.random.normal(
                    next(keys), (d, cfg.d_embed // (cfg.div_val ** i)),
                    cfg.dtype,
                ) * 0.02)
                for i in range(len(cutoffs))
            )
        return TransfoXLLM(
            word_emb=AdaptiveEmbedding(
                emb_layers=emb_layers,
                emb_projs=emb_projs,
                cutoff_ends=cutoff_ends,
                emb_scale=float(d) ** 0.5,
            ),
            layers=layers,
            crit=AdaptiveLogSoftmax(
                out_layers=out_layers,
                out_projs=out_projs,
                cluster_weight=(
                    jnp.zeros((n_clusters, cfg.d_embed), cfg.dtype)
                    if n_clusters > 0 else None
                ),
                cluster_bias=(
                    jnp.zeros((n_clusters,), cfg.dtype)
                    if n_clusters > 0 else None
                ),
                cutoffs=cutoffs,
                div_val=cfg.div_val,
            ),
            n_layer=cfg.n_layer,
            d_model=d,
            mem_len=cfg.mem_len,
            clamp_len=cfg.clamp_len,
            same_length=cfg.same_length,
        )


def translate_hf_transfo_xl_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF TransfoXLLMHeadModel -> native torch-layout keys: strip
    ``transformer.``, CoreNet.0/.3 -> core1/core2, the ParameterList
    emb_projs/out_projs entries land on the ``proj`` leaves."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.startswith("transformer."):
            k = k[len("transformer."):]
        if k == "pos_emb.inv_freq":
            continue  # constant sinusoid buffer, rebuilt at trace time
        k = k.replace(".CoreNet.0.", ".core1.")
        k = k.replace(".CoreNet.3.", ".core2.")
        import re
        k = re.sub(r"\.emb_projs\.(\d+)$", r".emb_projs.\1.proj", k)
        k = re.sub(r"^crit\.out_projs\.(\d+)$", r"crit.out_projs.\1.proj", k)
        out[k] = v
    return out
