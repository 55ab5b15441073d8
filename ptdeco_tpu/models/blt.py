"""BLT (Byte Latent Transformer), TPU-native.

Reference consumption analogue: AutoModelForCausalLM coverage
(/root/reference/examples/trainer_llm/builder.py:97-107).  Mirrors HF
``BltForCausalLM`` exactly:

* byte embeddings augmented with rolling-polynomial hash-n-gram
  embeddings — the hash is 64-bit wraparound arithmetic, computed
  host-side through ``jax.pure_callback`` (exact under jit; the x32
  device arithmetic cannot express torch's int64 overflow);
* local encoder (llama-style byte transformer) whose per-patch amax
  reduction feeds ``cross_attn_k`` patch queries cross-attending the
  byte stream; upstream's cross-attention adds its residual INSIDE the
  module and the caller adds again (2x residual) — kept verbatim;
* global transformer over the patch lattice; local decoder where every
  byte cross-attends its patch states (patch ids shifted by one patch)
  before causal self-attention; untied lm_head over bytes;
* entropy patching: the patcher LM runs on-device, the threshold
  boundary extraction runs host-side (data-dependent ragged shapes —
  patching is data preparation, not compute).  ``patch_lengths`` can
  be passed explicitly for fully static jit'd steps; without it the
  forward computes them eagerly and refuses under tracing with a
  pointer to the precompute API.

All q/k/v/o/gate/up/down/projection matmuls are decomposable
``nn.Linear`` sites.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import nn

_PRIMES = [
    1000000007, 5915587277, 1500450271, 3267000013, 5754853343,
    4093082899, 9576890767, 3628273133, 2860486313, 5463458053,
    3367900313,
]


@dataclass(frozen=True)
class BltSubConfig:
    hidden_size: int
    num_hidden_layers: int
    num_attention_heads: int
    num_key_value_heads: int
    intermediate_size: int
    rms_norm_eps: float = 1e-5
    rope_theta: float = 500000.0
    vocab_size: int = 260
    cross_attn_all_layers: bool = False
    hidden_size_global: int = 0

    @staticmethod
    def from_hf(sub: dict) -> "BltSubConfig":
        heads = int(sub["num_attention_heads"])
        return BltSubConfig(
            hidden_size=int(sub["hidden_size"]),
            num_hidden_layers=int(sub["num_hidden_layers"]),
            num_attention_heads=heads,
            num_key_value_heads=int(sub.get("num_key_value_heads") or heads),
            intermediate_size=int(sub["intermediate_size"]),
            rms_norm_eps=float(sub.get("rms_norm_eps", 1e-5)),
            rope_theta=float(sub.get("rope_theta", 500000.0)),
            vocab_size=int(sub.get("vocab_size", 260)),
            cross_attn_all_layers=bool(sub.get("cross_attn_all_layers",
                                               False)),
            hidden_size_global=int(sub.get("hidden_size_global") or 0),
        )


@dataclass(frozen=True)
class BltConfig:
    vocab_size: int
    patcher: Optional[BltSubConfig]
    encoder: BltSubConfig
    decoder: BltSubConfig
    global_cfg: BltSubConfig
    cross_attn_k: int = 2
    patch_size: int = 4
    patching_mode: str = "entropy"
    patching_threshold: float = 1.335442066192627
    max_patch_length: Optional[int] = None
    hash_group_sizes: tuple = (3, 4, 5, 6, 7, 8)
    hash_vocab: int = 500002
    hash_nb_functions: int = 1
    encoder_cross_output_size: Optional[int] = None
    dtype: Any = jnp.float32

    @staticmethod
    def from_hf_config(hf: dict, dtype: Any = jnp.bfloat16,
                       remat: bool = False) -> "BltConfig":
        return BltConfig(
            vocab_size=int(hf["vocab_size"]),
            patcher=(
                BltSubConfig.from_hf(hf["patcher_config"])
                if hf.get("patcher_config") and hf.get("patch_in_forward",
                                                       True)
                else None
            ),
            encoder=BltSubConfig.from_hf(hf["encoder_config"]),
            decoder=BltSubConfig.from_hf(hf["decoder_config"]),
            global_cfg=BltSubConfig.from_hf(hf["global_config"]),
            cross_attn_k=int(hf.get("cross_attn_k", 2)),
            patch_size=int(hf.get("patch_size", 4)),
            patching_mode=hf.get("patching_mode", "entropy"),
            patching_threshold=float(hf.get("patching_threshold", 0.0) or 0.0),
            max_patch_length=hf.get("max_patch_length"),
            hash_group_sizes=tuple(hf.get("encoder_hash_byte_group_size",
                                          (3, 4, 5, 6, 7, 8))),
            hash_vocab=int(hf.get("encoder_hash_byte_group_vocab", 500002)),
            hash_nb_functions=int(
                hf.get("encoder_hash_byte_group_nb_functions", 1)
            ),
            encoder_cross_output_size=(
                int(hf["global_config"]["encoder_cross_output_size"])
                if hf["global_config"].get("encoder_cross_output_size")
                else None
            ),
            dtype=dtype,
        )


def _hash_ids_host(ids: np.ndarray, group_size: int, prime: int,
                   max_hash: int) -> np.ndarray:
    """torch int64 wraparound polynomial hash, exactly."""
    with np.errstate(over="ignore"):
        ids64 = ids.astype(np.int64)
        b, s = ids64.shape
        padded = np.concatenate(
            [np.zeros((b, group_size - 1), np.int64), ids64], axis=1
        )
        powers = np.array(
            [pow(prime, i, 1 << 64) for i in range(group_size)], np.uint64
        )
        windows = np.lib.stride_tricks.sliding_window_view(
            padded, group_size, axis=1
        ).astype(np.uint64)
        h = (windows * powers).sum(axis=-1, dtype=np.uint64)
        return (h.astype(np.int64) % max_hash).astype(np.int32)


def _rope(x_len: int, head_dim: int, theta: float, dtype):
    inv = 1.0 / (theta ** (jnp.arange(0, head_dim, 2) / head_dim))
    ang = jnp.arange(x_len)[:, None] * inv[None]
    emb = jnp.concatenate([ang, ang], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def _rotate_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


class BltMLP(nn.Module):
    gate_proj: nn.Linear
    up_proj: nn.Linear
    down_proj: nn.Linear

    def __call__(self, x, ctx=None):
        return self.down_proj(
            jax.nn.silu(self.gate_proj(x, ctx)) * self.up_proj(x, ctx), ctx
        )


class BltSelfAttention(nn.Module):
    q_proj: nn.Linear
    k_proj: nn.Linear
    v_proj: nn.Linear
    o_proj: nn.Linear
    n_heads: int = nn.static_field(default=8)
    n_kv: int = nn.static_field(default=8)

    def __call__(self, x, cos_sin, causal, ctx=None):
        b, s, d = x.shape
        n, kv = self.n_heads, self.n_kv
        dh = d // n
        cos, sin = cos_sin

        def split(t, h):
            return t.reshape(b, s, h, dh).transpose(0, 2, 1, 3)

        q = split(self.q_proj(x, ctx), n)
        k = split(self.k_proj(x, ctx), kv)
        v = split(self.v_proj(x, ctx), kv)
        q = q * cos[None, None] + _rotate_half(q) * sin[None, None]
        k = k * cos[None, None] + _rotate_half(k) * sin[None, None]
        if kv != n:
            rep = n // kv
            k = jnp.repeat(k, rep, axis=1)
            v = jnp.repeat(v, rep, axis=1)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (dh ** -0.5)
        if causal:
            mask = jnp.tril(jnp.ones((s, s), bool))
            logits = jnp.where(mask[None, None], logits, -jnp.inf)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        return self.o_proj(out.transpose(0, 2, 1, 3).reshape(b, s, d), ctx)


class BltLayer(nn.Module):
    self_attn: BltSelfAttention
    mlp: BltMLP
    input_layernorm: nn.RMSNorm
    post_attention_layernorm: nn.RMSNorm

    def __call__(self, x, cos_sin, ctx=None):
        x = x + self.self_attn(self.input_layernorm(x, ctx), cos_sin, True,
                               ctx)
        return x + self.mlp(self.post_attention_layernorm(x, ctx), ctx)


class BltCrossAttention(nn.Module):
    """Upstream adds the residual INSIDE (returns attn + queries)."""

    q_proj: nn.Linear
    k_proj: nn.Linear
    v_proj: nn.Linear
    o_proj: nn.Linear
    q_norm: nn.RMSNorm
    k_norm: nn.RMSNorm
    n_heads: int = nn.static_field(default=8)
    n_kv: int = nn.static_field(default=8)

    def __call__(self, x, cross, mask, ctx=None):
        b, ql, d = x.shape
        n, kv = self.n_heads, self.n_kv
        dh = d // n
        q = self.q_proj(self.q_norm(x, ctx), ctx)
        cn = self.k_norm(cross, ctx)
        k = self.k_proj(cn, ctx)
        v = self.v_proj(cn, ctx)
        q = q.reshape(b, ql, n, dh).transpose(0, 2, 1, 3)
        k = k.reshape(b, -1, kv, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, -1, kv, dh).transpose(0, 2, 1, 3)
        if kv != n:
            rep = n // kv
            k = jnp.repeat(k, rep, axis=1)
            v = jnp.repeat(v, rep, axis=1)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (dh ** -0.5) + mask
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = self.o_proj(out.transpose(0, 2, 1, 3).reshape(b, ql, d), ctx)
        return out + x


def _make_layers(keys, sub: BltSubConfig, dtype) -> tuple:
    d = sub.hidden_size
    dh = d // sub.num_attention_heads
    layers = []
    for _ in range(sub.num_hidden_layers):
        layers.append(BltLayer(
            self_attn=BltSelfAttention(
                q_proj=nn.Linear.create(next(keys), d, d, False, dtype),
                k_proj=nn.Linear.create(next(keys), d,
                                        sub.num_key_value_heads * dh, False,
                                        dtype),
                v_proj=nn.Linear.create(next(keys), d,
                                        sub.num_key_value_heads * dh, False,
                                        dtype),
                o_proj=nn.Linear.create(next(keys), d, d, False, dtype),
                n_heads=sub.num_attention_heads,
                n_kv=sub.num_key_value_heads,
            ),
            mlp=BltMLP(
                gate_proj=nn.Linear.create(next(keys), d,
                                           sub.intermediate_size, False,
                                           dtype),
                up_proj=nn.Linear.create(next(keys), d,
                                         sub.intermediate_size, False,
                                         dtype),
                down_proj=nn.Linear.create(next(keys),
                                           sub.intermediate_size, d, False,
                                           dtype),
            ),
            input_layernorm=nn.RMSNorm.create(d, eps=sub.rms_norm_eps,
                                              dtype=dtype),
            post_attention_layernorm=nn.RMSNorm.create(
                d, eps=sub.rms_norm_eps, dtype=dtype
            ),
        ))
    return tuple(layers)


def _make_cross(keys, sub: BltSubConfig, dtype) -> BltCrossAttention:
    d = sub.hidden_size
    dh = d // sub.num_attention_heads
    return BltCrossAttention(
        q_proj=nn.Linear.create(next(keys), d, d, False, dtype),
        k_proj=nn.Linear.create(next(keys), d,
                                sub.num_key_value_heads * dh, False, dtype),
        v_proj=nn.Linear.create(next(keys), d,
                                sub.num_key_value_heads * dh, False, dtype),
        o_proj=nn.Linear.create(next(keys), d, d, False, dtype),
        q_norm=nn.RMSNorm.create(d, eps=sub.rms_norm_eps, dtype=dtype),
        k_norm=nn.RMSNorm.create(d, eps=sub.rms_norm_eps, dtype=dtype),
        n_heads=sub.num_attention_heads,
        n_kv=sub.num_key_value_heads,
    )


class BltLocalEncoder(nn.Module):
    embed_tokens: nn.Embedding
    layers: tuple
    patch_embedding_projection: nn.Linear
    cross_attn_layers: tuple
    cross_attn_k: int = nn.static_field(default=2)
    cross_attn_all_layers: bool = nn.static_field(default=False)
    rope_theta: float = nn.static_field(default=500000.0)

    def __call__(self, embeds, num_patches, patch_ids, cross_mask, ctx=None):
        b, s, d = embeds.shape
        dh = d // self.layers[0].self_attn.n_heads
        cos_sin = _rope(s, dh, self.rope_theta, embeds.dtype)
        h = embeds
        patch_embeds = None
        for idx, layer in enumerate(self.layers):
            h = layer(h, cos_sin, ctx)
            if idx == len(self.layers) - 1 or self.cross_attn_all_layers:
                reduced = _patch_reduce(h, num_patches, patch_ids)
                pe = self.patch_embedding_projection(reduced, ctx)
                pe = pe.reshape(b, num_patches * self.cross_attn_k, d)
                ca = self.cross_attn_layers[
                    idx if self.cross_attn_all_layers else 0
                ]
                # the caller-side add duplicates the internal residual
                # (upstream quirk kept)
                pe = pe + ca(pe, h, cross_mask, ctx)
                patch_embeds = pe
        return h, patch_embeds


def _patch_reduce(h, num_patches, patch_ids):
    b, s, d = h.shape
    init = jnp.full((b, num_patches, d), -jnp.inf, h.dtype)
    bi = jnp.arange(b)[:, None]
    red = init.at[bi, patch_ids].max(h)
    return jnp.where(jnp.isfinite(red), red, 0.0)


class BltGlobalTransformer(nn.Module):
    layers: tuple
    token_embedding_projection: Optional[nn.Linear] = None
    rope_theta: float = nn.static_field(default=500000.0)

    def __call__(self, x, ctx=None):
        if self.token_embedding_projection is not None:
            x = self.token_embedding_projection(x, ctx)
        dh = x.shape[-1] // self.layers[0].self_attn.n_heads
        cos_sin = _rope(x.shape[1], dh, self.rope_theta, x.dtype)
        for layer in self.layers:
            x = layer(x, cos_sin, ctx)
        return x


class BltLocalDecoder(nn.Module):
    layers: tuple
    patch_embedding_projection: nn.Linear
    norm: nn.RMSNorm
    cross_attn_layers: tuple
    cross_attn_k: int = nn.static_field(default=2)
    cross_attn_all_layers: bool = nn.static_field(default=False)
    rope_theta: float = nn.static_field(default=500000.0)

    def __call__(self, embeds, patch_embeds, cross_mask, ctx=None):
        b, s, d = embeds.shape
        pe = self.patch_embedding_projection(patch_embeds, ctx)
        pe = pe.reshape(b, -1, d)
        dh = d // self.layers[0].self_attn.n_heads
        cos_sin = _rope(s, dh, self.rope_theta, embeds.dtype)
        h = embeds
        for i, layer in enumerate(self.layers):
            if i == 0 or self.cross_attn_all_layers:
                ca = self.cross_attn_layers[
                    i if self.cross_attn_all_layers else 0
                ]
                h = h + ca(h, pe, cross_mask, ctx)
            h = layer(h, cos_sin, ctx)
        return self.norm(h, ctx)


class BltPatcher(nn.Module):
    embed_tokens: nn.Embedding
    layers: tuple
    norm: nn.RMSNorm
    lm_head: nn.Linear
    rope_theta: float = nn.static_field(default=500000.0)

    def entropies(self, ids, ctx=None):
        h = self.embed_tokens(ids, ctx)
        dh = h.shape[-1] // self.layers[0].self_attn.n_heads
        cos_sin = _rope(h.shape[1], dh, self.rope_theta, h.dtype)
        for layer in self.layers:
            h = layer(h, cos_sin, ctx)
        logits = self.lm_head(self.norm(h, ctx), ctx).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.sum(jnp.exp(logp) * logp, axis=-1)

    def __call__(self, x, ctx=None):
        raise NotImplementedError("use .entropies / compute_patch_lengths")


def _patch_lengths_from_entropies(ent: np.ndarray, sequence_length: int,
                                  threshold: float) -> np.ndarray:
    """HF BltPatcher.patch_lengths_from_entropies in numpy."""
    b = ent.shape[0]
    ent = ent[:, 1:]
    mask = ent > threshold
    seq_len = mask.shape[1]
    starts_list = [np.nonzero(mask[i])[0] for i in range(b)]
    max_valid = int(mask.sum(axis=1).max()) if b else 0
    rows = []
    for i in range(b):
        s = starts_list[i]
        padded = np.concatenate([s, np.full(seq_len - len(s), seq_len)])
        rows.append(padded[:max_valid])
    starts = np.stack(rows) if b else np.zeros((0, 0), np.int64)
    init = np.tile(np.array([[0, 1]], np.int64), (b, 1))
    start_ids = np.concatenate([init, starts + 2], axis=1)
    last = np.full((b, 1), sequence_length - 1, np.int64)
    ends = np.concatenate([start_ids[:, 1:] - 1, last], axis=1)
    return ends - start_ids + 1


def _patch_ids_from_lengths(patch_lengths: jnp.ndarray,
                            seq_len: int) -> jnp.ndarray:
    starts = jnp.concatenate(
        [jnp.zeros((patch_lengths.shape[0], 1), patch_lengths.dtype),
         jnp.cumsum(patch_lengths, axis=-1)[:, :-1]],
        axis=-1,
    )
    pos = jnp.arange(seq_len)
    return (starts[:, None, :] <= pos[None, :, None]).sum(axis=-1) - 1


def _cross_mask(patch_ids, num_patches, seq_len, patches_as_queries,
                cross_attn_k, dtype):
    b = patch_ids.shape[0]
    pid = jnp.arange(num_patches)
    if patches_as_queries:
        eq = pid[None, :, None] == patch_ids[:, None, :]  # (b, P, s)
        eq = jnp.repeat(eq, cross_attn_k, axis=1)
    else:
        eq = patch_ids[:, :, None] == pid[None, None, :]  # (b, s, P)
        eq = jnp.repeat(eq, cross_attn_k, axis=2)
    neg = jnp.finfo(dtype).min
    return jnp.where(eq, 0.0, neg).astype(dtype)[:, None]


class BltLM(nn.Module):
    """dict{input_ids[, patch_lengths]} -> byte logits."""

    local_encoder: BltLocalEncoder
    encoder_hash_tok_embedding: nn.Embedding
    global_transformer: BltGlobalTransformer
    local_decoder: BltLocalDecoder
    lm_head: nn.Linear
    patcher: Optional[BltPatcher] = None
    cross_attn_k: int = nn.static_field(default=2)
    patching_threshold: float = nn.static_field(default=0.0)
    hash_group_sizes: tuple = nn.static_field(default=(3, 4, 5, 6, 7, 8))
    hash_vocab: int = nn.static_field(default=500002)
    hash_nb_functions: int = nn.static_field(default=1)

    def compute_patch_lengths(self, ids) -> jnp.ndarray:
        """Entropy patching: patcher LM on device, ragged boundary
        extraction on host (eager; not traceable by design)."""
        if self.patcher is None:
            raise ValueError("no patcher: pass patch_lengths explicitly")
        ent = np.asarray(jax.device_get(self.patcher.entropies(
            jnp.asarray(ids)
        )), np.float32)
        return jnp.asarray(_patch_lengths_from_entropies(
            ent, ids.shape[1], self.patching_threshold
        ))

    def _hash_embeds(self, ids, ctx):
        emb = self.local_encoder.embed_tokens(ids, ctx)
        idx = 0
        for fn in range(self.hash_nb_functions):
            prime = _PRIMES[fn % len(_PRIMES)]
            for gs in self.hash_group_sizes:
                hash_ids = jax.pure_callback(
                    lambda a, g=gs, p=prime: _hash_ids_host(
                        np.asarray(a), g, p, self.hash_vocab
                    ),
                    jax.ShapeDtypeStruct(ids.shape, jnp.int32),
                    ids,
                    vmap_method="sequential",
                )
                emb = emb + self.encoder_hash_tok_embedding.table[
                    hash_ids + idx * self.hash_vocab
                ]
                idx += 1
        return emb

    def __call__(self, batch, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        if isinstance(batch, dict):
            ids = batch["input_ids"]
            patch_lengths = batch.get("patch_lengths")
        else:
            ids, patch_lengths = batch, None
        b, s = ids.shape
        if patch_lengths is None:
            if isinstance(jnp.asarray(ids), jax.core.Tracer):
                raise ValueError(
                    "entropy patching is data-dependent; precompute "
                    "batch['patch_lengths'] via compute_patch_lengths "
                    "for jit'd steps"
                )
            patch_lengths = self.compute_patch_lengths(np.asarray(ids))
        num_patches = patch_lengths.shape[1]
        embeds = self._hash_embeds(ids, ctx)
        patch_ids = _patch_ids_from_lengths(patch_lengths, s)
        enc_mask = _cross_mask(patch_ids, num_patches, s, True,
                               self.cross_attn_k, embeds.dtype)
        h, cross_states = self.local_encoder(
            embeds, num_patches, patch_ids, enc_mask, ctx
        )
        cross_states = cross_states.reshape(b, num_patches, -1)
        g = self.global_transformer(cross_states, ctx)
        dec_patch_ids = _patch_ids_from_lengths(patch_lengths[:, 1:], s)
        dec_mask = _cross_mask(dec_patch_ids, num_patches, s, False,
                               self.cross_attn_k, embeds.dtype)
        out = self.local_decoder(h, g, dec_mask, ctx)
        return self.lm_head(out, ctx)

    @staticmethod
    def create(key: jax.Array, cfg: BltConfig) -> "BltLM":
        n_layers = (
            cfg.encoder.num_hidden_layers + cfg.decoder.num_hidden_layers
            + cfg.global_cfg.num_hidden_layers
            + (cfg.patcher.num_hidden_layers if cfg.patcher else 0)
        )
        keys = iter(jax.random.split(key, 16 * n_layers + 32))
        enc, dec, glob = cfg.encoder, cfg.decoder, cfg.global_cfg
        n_hash = cfg.hash_nb_functions * len(cfg.hash_group_sizes)
        encoder = BltLocalEncoder(
            embed_tokens=nn.Embedding.create(next(keys), enc.vocab_size,
                                             enc.hidden_size, cfg.dtype),
            layers=_make_layers(keys, enc, cfg.dtype),
            patch_embedding_projection=nn.Linear.create(
                next(keys), enc.hidden_size,
                enc.hidden_size * cfg.cross_attn_k, False, cfg.dtype,
            ),
            cross_attn_layers=tuple(
                _make_cross(keys, enc, cfg.dtype)
                for _ in range(
                    enc.num_hidden_layers if enc.cross_attn_all_layers else 1
                )
            ),
            cross_attn_k=cfg.cross_attn_k,
            cross_attn_all_layers=enc.cross_attn_all_layers,
            rope_theta=enc.rope_theta,
        )
        decoder = BltLocalDecoder(
            layers=_make_layers(keys, dec, cfg.dtype),
            patch_embedding_projection=nn.Linear.create(
                next(keys), dec.hidden_size_global or glob.hidden_size,
                dec.hidden_size * cfg.cross_attn_k, False, cfg.dtype,
            ),
            norm=nn.RMSNorm.create(dec.hidden_size, eps=dec.rms_norm_eps,
                                   dtype=cfg.dtype),
            cross_attn_layers=tuple(
                _make_cross(keys, dec, cfg.dtype)
                for _ in range(
                    dec.num_hidden_layers if dec.cross_attn_all_layers else 1
                )
            ),
            cross_attn_k=cfg.cross_attn_k,
            cross_attn_all_layers=dec.cross_attn_all_layers,
            rope_theta=dec.rope_theta,
        )
        global_tf = BltGlobalTransformer(
            layers=_make_layers(keys, glob, cfg.dtype),
            token_embedding_projection=(
                nn.Linear.create(next(keys), cfg.encoder_cross_output_size,
                                 glob.hidden_size, False, cfg.dtype)
                if cfg.encoder_cross_output_size is not None else None
            ),
            rope_theta=glob.rope_theta,
        )
        patcher = None
        if cfg.patcher is not None:
            patcher = BltPatcher(
                embed_tokens=nn.Embedding.create(
                    next(keys), cfg.patcher.vocab_size,
                    cfg.patcher.hidden_size, cfg.dtype,
                ),
                layers=_make_layers(keys, cfg.patcher, cfg.dtype),
                norm=nn.RMSNorm.create(cfg.patcher.hidden_size,
                                       eps=cfg.patcher.rms_norm_eps,
                                       dtype=cfg.dtype),
                lm_head=nn.Linear.create(next(keys),
                                         cfg.patcher.hidden_size,
                                         cfg.patcher.vocab_size, False,
                                         cfg.dtype),
                rope_theta=cfg.patcher.rope_theta,
            )
        return BltLM(
            local_encoder=encoder,
            encoder_hash_tok_embedding=nn.Embedding.create(
                next(keys), n_hash * cfg.hash_vocab, enc.hidden_size,
                cfg.dtype,
            ),
            global_transformer=global_tf,
            local_decoder=decoder,
            lm_head=nn.Linear.create(next(keys), dec.hidden_size,
                                     cfg.vocab_size, False, cfg.dtype),
            patcher=patcher,
            cross_attn_k=cfg.cross_attn_k,
            patching_threshold=cfg.patching_threshold,
            hash_group_sizes=cfg.hash_group_sizes,
            hash_vocab=cfg.hash_vocab,
            hash_nb_functions=cfg.hash_nb_functions,
        )


def translate_hf_blt_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF BltForCausalLM -> native torch-layout keys: strip ``model.``;
    the patcher's rotary buffers are dropped."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if "rotary_emb" in k:
            continue
        if k.startswith("model."):
            k = k[len("model."):]
        out[k] = v
    return out
