"""Gemma 3n text decoder (HF ``Gemma3nForCausalLM`` /
``Gemma3nTextModel``), TPU-native.

The gemma3n graph is structurally unlike the llama decoder, so it gets a
dedicated LM (same pattern as MambaLM / ZambaLM) instead of more
TransformerConfig knobs:

* **AltUp** (Alternating Updates): the residual stream is a STACK of
  ``altup_num_inputs`` (4) hidden states.  Each layer ``predict``s all
  streams from a learned per-token mixing matrix (prediction_coefs of the
  tanh'd modality router), runs the transformer sublayers on the ACTIVE
  stream only, then ``correct``s every stream with the innovation
  (activated - prediction) scaled by per-stream correction coefficients.
* **Laurel** (Learned Augmented Residual Layer): a rank-``laurel_rank``
  linear bypass around attention, RMS-normed, averaged into the attention
  residual as (attn_residual + laurel(x)) / sqrt(2).
* **Per-layer embeddings**: a second embedding table
  (vocab_size_per_layer_input x n_layers*hidden_per_layer) plus a
  projection of the input embeddings provide a per-layer input vector
  that gates the corrected active stream back into streams 1..n-1.
* **KV sharing**: the last ``num_kv_shared_layers`` layers compute no
  k/v of their own — each reuses the (roped, normed) k/v of the LAST
  non-shared layer of the same attention type (sliding vs full).
* Attention uses scale 1.0 (no 1/sqrt(d)), per-head RMS on q and k, and
  a SCALE-FREE RMS on v; sliding layers rope with
  ``rope_local_base_freq`` and mask to ``sliding_window``.
* MLP is gated gelu-tanh with optional "gaussian top-k" activation
  sparsity: gate preactivations below mean + std*Phi^-1(sparsity) are
  cut (per-layer ``activation_sparsity_pattern``).

Reference coverage analogue: AutoModelForCausalLM
(/root/reference/examples/trainer_llm/builder.py:97-107).  Weight-clip
hooks on the altup coefficient matrices are a TRAIN-time in-place clamp
in HF (altup_coef_clip) and are not applied here (decomposition runs in
eval; finetuning the clip-free mirror matches HF eval numerics).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ptdeco_tpu import nn
from ptdeco_tpu.models.transformer import _rope

__all__ = ["Gemma3nConfig", "Gemma3nLM"]


@dataclasses.dataclass(frozen=True)
class Gemma3nConfig:
    vocab_size: int = 262400
    vocab_size_per_layer_input: int = 262144
    dim: int = 2048
    n_layers: int = 35
    n_heads: int = 8
    n_kv_heads: int = 2
    head_dim: int = 256
    hidden_per_layer: int = 256
    intermediate_sizes: tuple = (16384,) * 35  # per layer
    laurel_rank: int = 64
    norm_eps: float = 1e-6
    rope_theta: float = 1_000_000.0
    rope_local_theta: float = 10_000.0
    sliding_window: int = 512
    layer_types: tuple = ()  # "sliding_attention" | "full_attention"
    activation_sparsity: tuple = ()  # per layer, 0.0 = off
    altup_num_inputs: int = 4
    altup_active_idx: int = 0
    altup_correct_scale: bool = True
    num_kv_shared_layers: int = 0
    final_logit_softcap: Optional[float] = 30.0
    tie_embeddings: bool = True
    remat: bool = False
    dtype: Any = jnp.float32

    @staticmethod
    def from_hf_config(
        hf: dict[str, Any], dtype: Any = jnp.bfloat16, remat: bool = False
    ) -> "Gemma3nConfig":
        """HF Gemma3nTextConfig (or the Gemma3nConfig multimodal wrapper,
        whose text path is text_config) -> native."""
        if hf.get("model_type") == "gemma3n":
            hf = dict(hf["text_config"])
        n_layers = int(hf.get("num_hidden_layers", 35))
        inter = hf.get("intermediate_size", 16384)
        if isinstance(inter, int):
            inter = [inter] * n_layers
        layer_types = hf.get("layer_types")
        if layer_types is None:
            # HF default: every 5th layer (1-indexed) is full attention
            layer_types = [
                "full_attention" if (i + 1) % 5 == 0 else "sliding_attention"
                for i in range(n_layers)
            ]
        sparsity = hf.get("activation_sparsity_pattern")
        if sparsity is None:
            sparsity = [0.0] * n_layers
        if hf.get("hidden_activation", "gelu_pytorch_tanh") != (
            "gelu_pytorch_tanh"
        ):
            raise ValueError(
                f"gemma3n hidden_activation="
                f"{hf.get('hidden_activation')!r} unsupported"
            )
        if hf.get("attention_bias", False):
            raise ValueError("gemma3n attention_bias=True unsupported")
        if hf.get("rope_scaling") not in (None, {"rope_type": "default"}):
            raise ValueError(
                f"gemma3n rope_scaling={hf.get('rope_scaling')!r} unsupported"
            )
        n_heads = int(hf.get("num_attention_heads", 8))
        return Gemma3nConfig(
            vocab_size=int(hf.get("vocab_size", 262400)),
            vocab_size_per_layer_input=int(
                hf.get("vocab_size_per_layer_input", 262144)
            ),
            dim=int(hf.get("hidden_size", 2048)),
            n_layers=n_layers,
            n_heads=n_heads,
            n_kv_heads=int(hf.get("num_key_value_heads", n_heads)),
            head_dim=int(hf.get("head_dim", 256)),
            hidden_per_layer=int(hf.get("hidden_size_per_layer_input", 256)),
            intermediate_sizes=tuple(int(i) for i in inter),
            laurel_rank=int(hf.get("laurel_rank", 64)),
            norm_eps=float(hf.get("rms_norm_eps", 1e-6)),
            rope_theta=float(hf.get("rope_theta", 1e6)),
            rope_local_theta=float(hf.get("rope_local_base_freq", 1e4)),
            sliding_window=int(hf.get("sliding_window", 512)),
            layer_types=tuple(str(t) for t in layer_types),
            activation_sparsity=tuple(float(s) for s in sparsity),
            altup_num_inputs=int(hf.get("altup_num_inputs", 4)),
            altup_active_idx=int(hf.get("altup_active_idx", 0)),
            altup_correct_scale=bool(hf.get("altup_correct_scale", True)),
            num_kv_shared_layers=int(hf.get("num_kv_shared_layers", 0)),
            final_logit_softcap=(
                float(hf["final_logit_softcapping"])
                if hf.get("final_logit_softcapping") is not None
                else None
            ),
            tie_embeddings=bool(hf.get("tie_word_embeddings", True)),
            remat=remat,
            dtype=dtype,
        )


def _rms(x: jax.Array, eps: float) -> jax.Array:
    """Scale-free RMS normalization in f32 (HF Gemma3nRMSNorm
    with_scale=False — the v_norm)."""
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(
        jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps
    )
    return y.astype(x.dtype)


class Gemma3nLaurel(nn.Module):
    """linear_left -> linear_right -> RMS, added to the input."""

    linear_left: nn.Linear
    linear_right: nn.Linear
    post_laurel_norm: nn.RMSNorm

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        h = self.linear_right(self.linear_left(x, ctx), ctx)
        return x + self.post_laurel_norm(h, ctx)


class Gemma3nMLP(nn.Module):
    gate_proj: nn.Linear
    up_proj: nn.Linear
    down_proj: nn.Linear
    activation_sparsity: float = nn.static_field(default=0.0)

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        gate = self.gate_proj(x, ctx)
        if self.activation_sparsity > 0.0:
            # "gaussian top-k": cut gate preactivations below
            # mean + std * Phi^-1(sparsity) (population std, f32 cutoff
            # math cast to the activation dtype as in HF _gaussian_topk)
            std_mult = jax.scipy.special.ndtri(
                jnp.float32(self.activation_sparsity)
            ).astype(gate.dtype)
            mean = jnp.mean(gate, axis=-1, keepdims=True)
            std = jnp.sqrt(
                jnp.mean(jnp.square(gate - mean), axis=-1, keepdims=True)
            )
            gate = jax.nn.relu(gate - (mean + std * std_mult))
        return self.down_proj(
            jax.nn.gelu(gate, approximate=True) * self.up_proj(x, ctx), ctx
        )


class Gemma3nAltUp(nn.Module):
    """predict/correct mixing of the stacked hidden streams."""

    correction_coefs: nn.Linear  # n -> n
    prediction_coefs: nn.Linear  # n -> n^2
    modality_router: nn.Linear  # d -> n
    router_norm: nn.RMSNorm
    correct_output_scale: jax.Array  # (d,)
    n_inputs: int = nn.static_field(default=4)
    active_idx: int = nn.static_field(default=0)

    def _modalities(
        self, x: jax.Array, ctx: Optional[nn.Ctx]
    ) -> jax.Array:
        routed = self.modality_router(
            self.router_norm(x, ctx) * (1.0 / x.shape[-1]), ctx
        )
        return jnp.tanh(routed.astype(jnp.float32)).astype(x.dtype)

    def predict(
        self, h: jax.Array, ctx: Optional[nn.Ctx] = None
    ) -> jax.Array:
        """h: (n, b, t, d) -> predictions (n, b, t, d).

        HF reshapes prediction_coefs(modalities) to (b,t,n,n) and
        transposes the trailing matrices, so predictions[j] =
        sum_i coefs[..., j, i] * h[i] + h[j]."""
        n = self.n_inputs
        mod = self._modalities(h[self.active_idx], ctx)  # (b, t, n)
        coefs = self.prediction_coefs(mod, ctx)  # (b, t, n*n)
        coefs = coefs.reshape(*mod.shape[:-1], n, n)
        return jnp.einsum("ibtd,btji->jbtd", h, coefs) + h

    def correct(
        self,
        predictions: jax.Array,
        activated: jax.Array,
        ctx: Optional[nn.Ctx] = None,
    ) -> jax.Array:
        mod = self._modalities(activated, ctx)  # (b, t, n)
        innovation = activated - predictions[self.active_idx]  # (b, t, d)
        coefs = self.correction_coefs(mod, ctx) + 1.0  # (b, t, n)
        # corrected[j] = innovation * coefs[..., j] + predictions[j]
        return (
            innovation[None] * jnp.moveaxis(coefs, -1, 0)[..., None]
            + predictions
        )

    def scale_corrected_output(self, x: jax.Array) -> jax.Array:
        return (
            x.astype(self.correct_output_scale.dtype)
            * self.correct_output_scale
        ).astype(x.dtype)


class Gemma3nAttention(nn.Module):
    """q always computed locally; k/v either computed (and returned for
    downstream shared layers) or taken from ``shared_kv``.  Attention
    scale is 1.0 — gemma3n relies on the per-head q/k RMS norms instead
    of 1/sqrt(head_dim)."""

    q_proj: nn.Linear
    k_proj: nn.Linear
    v_proj: nn.Linear
    o_proj: nn.Linear
    q_norm: nn.RMSNorm
    k_norm: nn.RMSNorm
    n_heads: int = nn.static_field(default=8)
    n_kv_heads: int = nn.static_field(default=2)
    rope_theta: float = nn.static_field(default=1e6)
    sliding_window: Optional[int] = nn.static_field(default=None)
    norm_eps: float = nn.static_field(default=1e-6)

    def __call__(
        self,
        x: jax.Array,
        ctx: Optional[nn.Ctx] = None,
        *,
        positions: jax.Array,
        attn_mask: Optional[jax.Array] = None,
        shared_kv: Optional[tuple] = None,
    ) -> tuple[jax.Array, tuple]:
        b, s, _ = x.shape
        q = self.q_proj(x, ctx)
        hd = q.shape[-1] // self.n_heads
        q = self.q_norm(q.reshape(b, s, self.n_heads, hd), ctx)
        q = _rope(q, positions, self.rope_theta)
        if shared_kv is not None:
            k, v = shared_kv
        else:
            k = self.k_proj(x, ctx).reshape(b, s, self.n_kv_heads, hd)
            k = _rope(self.k_norm(k, ctx), positions, self.rope_theta)
            v = _rms(
                self.v_proj(x, ctx).reshape(b, s, self.n_kv_heads, hd),
                self.norm_eps,
            )
        rep = self.n_heads // self.n_kv_heads
        kr = jnp.repeat(k, rep, axis=2) if rep > 1 else k
        vr = jnp.repeat(v, rep, axis=2) if rep > 1 else v
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, kr, preferred_element_type=jnp.float32
        )
        causal = jnp.tril(jnp.ones((s, s), bool))
        if self.sliding_window is not None:
            idx = jnp.arange(s)
            causal = causal & (
                idx[:, None] - idx[None, :] < self.sliding_window
            )
        mask = causal[None, None, :, :]
        if attn_mask is not None:
            mask = mask & attn_mask[:, None, None, :].astype(bool)
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, vr).reshape(b, s, -1)
        return self.o_proj(out, ctx), (k, v)


class Gemma3nBlock(nn.Module):
    self_attn: Gemma3nAttention
    mlp: Gemma3nMLP
    altup: Gemma3nAltUp
    laurel: Gemma3nLaurel
    input_layernorm: nn.RMSNorm
    post_attention_layernorm: nn.RMSNorm
    pre_feedforward_layernorm: nn.RMSNorm
    post_feedforward_layernorm: nn.RMSNorm
    per_layer_input_gate: nn.Linear  # d -> p
    per_layer_projection: nn.Linear  # p -> d
    post_per_layer_input_norm: nn.RMSNorm
    active_idx: int = nn.static_field(default=0)
    correct_scale: bool = nn.static_field(default=True)
    # index of the layer whose k/v this layer reuses (None = computes own)
    kv_source: Optional[int] = nn.static_field(default=None)

    def __call__(
        self,
        h: jax.Array,  # (n_altup, b, t, d)
        per_layer_input: jax.Array,  # (b, t, p)
        ctx: Optional[nn.Ctx] = None,
        *,
        positions: jax.Array,
        attn_mask: Optional[jax.Array] = None,
        shared_kv: Optional[tuple] = None,
    ) -> tuple[jax.Array, tuple]:
        predictions = self.altup.predict(h, ctx)
        active = predictions[self.active_idx]
        active_normed = self.input_layernorm(active, ctx)
        laurel_out = self.laurel(active_normed, ctx)

        attn, kv = self.self_attn(
            active_normed,
            ctx,
            positions=positions,
            attn_mask=attn_mask,
            shared_kv=shared_kv,
        )
        attn = self.post_attention_layernorm(attn, ctx)
        attn_laurel = (active + attn + laurel_out) * (1.0 / math.sqrt(2.0))

        ffw = self.mlp(self.pre_feedforward_layernorm(attn_laurel, ctx), ctx)
        activated = attn_laurel + self.post_feedforward_layernorm(ffw, ctx)
        corrected = self.altup.correct(predictions, activated, ctx)

        first = corrected[self.active_idx]
        if self.correct_scale:
            first = self.altup.scale_corrected_output(first)
        gated = (
            jax.nn.gelu(self.per_layer_input_gate(first, ctx), approximate=True)
            * per_layer_input
        )
        contrib = self.post_per_layer_input_norm(
            self.per_layer_projection(gated, ctx), ctx
        )
        corrected = corrected.at[1:].add(contrib)
        return corrected, kv


class Gemma3nDecoder(nn.Module):
    embed_tokens: nn.Embedding
    embed_tokens_per_layer: nn.Embedding
    per_layer_model_projection: nn.Linear  # d -> L*p
    per_layer_projection_norm: nn.RMSNorm  # over p
    altup_projections: tuple  # n-1 Linears d -> d
    altup_unembed_projections: tuple  # n-1 Linears d -> d
    layers: tuple
    norm: nn.RMSNorm
    hidden_per_layer: int = nn.static_field(default=256)
    n_altup: int = nn.static_field(default=4)
    remat: bool = nn.static_field(default=False)

    def _renorm_to(self, target_mag: jax.Array, x: jax.Array) -> jax.Array:
        new_mag = jnp.sqrt(
            jnp.maximum(
                jnp.mean(jnp.square(x), axis=-1, keepdims=True),
                jnp.asarray(1e-5, x.dtype),
            )
        )
        return x * target_mag / new_mag

    def __call__(
        self,
        input_ids: jax.Array,
        ctx: Optional[nn.Ctx] = None,
        *,
        attn_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        b, s = input_ids.shape
        d = self.embed_tokens.table.shape[-1]
        positions = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))

        h0 = self.embed_tokens(input_ids) * jnp.asarray(
            d**0.5, self.embed_tokens.table.dtype
        )
        # per-layer inputs: scaled table lookup + scaled projection of the
        # input embeddings, RMS-normed, averaged with 1/sqrt(2)
        n_layers = len(self.layers)
        p = self.hidden_per_layer
        pli = self.embed_tokens_per_layer(input_ids).reshape(
            b, s, n_layers, p
        ) * jnp.asarray(p**0.5, h0.dtype)
        proj = self.per_layer_model_projection(h0, ctx) * jnp.asarray(
            d**-0.5, h0.dtype
        )
        proj = self.per_layer_projection_norm(
            proj.reshape(b, s, n_layers, p), ctx
        )
        per_layer = (proj + pli) * jnp.asarray(2.0**-0.5, h0.dtype)

        # expand to n_altup streams, each renormalized to h0's magnitude
        target_mag = jnp.sqrt(
            jnp.mean(jnp.square(h0), axis=-1, keepdims=True)
        )
        streams = [h0]
        for i in range(1, self.n_altup):
            streams.append(
                self._renorm_to(
                    target_mag, self.altup_projections[i - 1](h0, ctx)
                )
            )
        h = jnp.stack(streams, axis=0)

        use_remat = self.remat and not (ctx is not None and ctx.no_remat)
        stored_kv: dict[int, tuple] = {}
        # which layers must store k/v for downstream shared layers
        needed = {
            lyr.kv_source for lyr in self.layers if lyr.kv_source is not None
        }
        for i, layer in enumerate(self.layers):
            shared = (
                stored_kv[layer.kv_source]
                if layer.kv_source is not None
                else None
            )
            if use_remat:
                h, kv = jax.checkpoint(
                    lambda lyr, hh, pl, sh: lyr(
                        hh, pl, ctx, positions=positions,
                        attn_mask=attn_mask, shared_kv=sh,
                    )
                )(layer, h, per_layer[:, :, i], shared)
            else:
                h, kv = layer(
                    h, per_layer[:, :, i], ctx, positions=positions,
                    attn_mask=attn_mask, shared_kv=shared,
                )
            if i in needed:
                stored_kv[i] = kv

        # collapse streams: unembed-project 1..n-1, renorm to stream 0's
        # magnitude, mean, final norm
        target_mag = jnp.sqrt(
            jnp.mean(jnp.square(h[0]), axis=-1, keepdims=True)
        )
        outs = [h[0]]
        for i in range(1, self.n_altup):
            outs.append(
                self._renorm_to(
                    target_mag,
                    self.altup_unembed_projections[i - 1](h[i], ctx),
                )
            )
        return self.norm(jnp.mean(jnp.stack(outs, axis=0), axis=0), ctx)


class Gemma3nLM(nn.Module):
    """Dict-in/logits-out causal LM (the trainer convention)."""

    model: Gemma3nDecoder
    lm_head: Optional[nn.Linear]
    tie_embeddings: bool = nn.static_field(default=True)
    final_logit_softcap: Optional[float] = nn.static_field(default=None)

    def __call__(self, batch: Any, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        if isinstance(batch, dict):
            input_ids = batch["input_ids"]
            attn_mask = batch.get("attention_mask")
        else:
            input_ids, attn_mask = batch, None
        h = self.model(input_ids, ctx, attn_mask=attn_mask)
        if self.tie_embeddings:
            logits = jnp.dot(h, self.model.embed_tokens.table.T)
        else:
            logits = self.lm_head(h, ctx)
        if self.final_logit_softcap is not None:
            cap = jnp.asarray(self.final_logit_softcap, logits.dtype)
            logits = cap * jnp.tanh(logits / cap)
        return logits

    @staticmethod
    def create(key: jax.Array, cfg: Gemma3nConfig) -> "Gemma3nLM":
        keys = jax.random.split(key, cfg.n_layers + 4)
        n = cfg.altup_num_inputs
        first_shared = cfg.n_layers - cfg.num_kv_shared_layers

        def kv_source_for(i: int) -> Optional[int]:
            if cfg.num_kv_shared_layers <= 0 or i < first_shared:
                return None
            # last non-shared layer of the same attention type
            t = cfg.layer_types[i]
            for j in range(first_shared - 1, -1, -1):
                if cfg.layer_types[j] == t:
                    return j
            raise ValueError(
                f"no non-shared layer of type {t!r} before layer {i}"
            )

        def make_layer(i: int) -> Gemma3nBlock:
            k = jax.random.split(keys[i], 16)
            sliding = cfg.layer_types[i] == "sliding_attention"
            qd = cfg.n_heads * cfg.head_dim
            kvd = cfg.n_kv_heads * cfg.head_dim
            return Gemma3nBlock(
                self_attn=Gemma3nAttention(
                    q_proj=nn.Linear.create(k[0], cfg.dim, qd, False, cfg.dtype),
                    k_proj=nn.Linear.create(k[1], cfg.dim, kvd, False, cfg.dtype),
                    v_proj=nn.Linear.create(k[2], cfg.dim, kvd, False, cfg.dtype),
                    o_proj=nn.Linear.create(k[3], qd, cfg.dim, False, cfg.dtype),
                    q_norm=nn.RMSNorm.create(cfg.head_dim, cfg.norm_eps, cfg.dtype),
                    k_norm=nn.RMSNorm.create(cfg.head_dim, cfg.norm_eps, cfg.dtype),
                    n_heads=cfg.n_heads,
                    n_kv_heads=cfg.n_kv_heads,
                    rope_theta=(
                        cfg.rope_local_theta if sliding else cfg.rope_theta
                    ),
                    sliding_window=cfg.sliding_window if sliding else None,
                    norm_eps=cfg.norm_eps,
                ),
                mlp=Gemma3nMLP(
                    gate_proj=nn.Linear.create(
                        k[4], cfg.dim, cfg.intermediate_sizes[i], False, cfg.dtype
                    ),
                    up_proj=nn.Linear.create(
                        k[5], cfg.dim, cfg.intermediate_sizes[i], False, cfg.dtype
                    ),
                    down_proj=nn.Linear.create(
                        k[6], cfg.intermediate_sizes[i], cfg.dim, False, cfg.dtype
                    ),
                    activation_sparsity=cfg.activation_sparsity[i],
                ),
                altup=Gemma3nAltUp(
                    correction_coefs=nn.Linear.create(k[7], n, n, False, cfg.dtype),
                    prediction_coefs=nn.Linear.create(
                        k[8], n, n * n, False, cfg.dtype
                    ),
                    modality_router=nn.Linear.create(
                        k[9], cfg.dim, n, False, cfg.dtype
                    ),
                    router_norm=nn.RMSNorm.create(
                        cfg.dim, cfg.norm_eps, cfg.dtype
                    ),
                    correct_output_scale=jnp.zeros((cfg.dim,), cfg.dtype),
                    n_inputs=n,
                    active_idx=cfg.altup_active_idx,
                ),
                laurel=Gemma3nLaurel(
                    linear_left=nn.Linear.create(
                        k[10], cfg.dim, cfg.laurel_rank, False, cfg.dtype
                    ),
                    linear_right=nn.Linear.create(
                        k[11], cfg.laurel_rank, cfg.dim, False, cfg.dtype
                    ),
                    post_laurel_norm=nn.RMSNorm.create(
                        cfg.dim, cfg.norm_eps, cfg.dtype
                    ),
                ),
                input_layernorm=nn.RMSNorm.create(cfg.dim, cfg.norm_eps, cfg.dtype),
                post_attention_layernorm=nn.RMSNorm.create(
                    cfg.dim, cfg.norm_eps, cfg.dtype
                ),
                pre_feedforward_layernorm=nn.RMSNorm.create(
                    cfg.dim, cfg.norm_eps, cfg.dtype
                ),
                post_feedforward_layernorm=nn.RMSNorm.create(
                    cfg.dim, cfg.norm_eps, cfg.dtype
                ),
                per_layer_input_gate=nn.Linear.create(
                    k[12], cfg.dim, cfg.hidden_per_layer, False, cfg.dtype
                ),
                per_layer_projection=nn.Linear.create(
                    k[13], cfg.hidden_per_layer, cfg.dim, False, cfg.dtype
                ),
                post_per_layer_input_norm=nn.RMSNorm.create(
                    cfg.dim, cfg.norm_eps, cfg.dtype
                ),
                active_idx=cfg.altup_active_idx,
                correct_scale=cfg.altup_correct_scale,
                kv_source=kv_source_for(i),
            )

        decoder = Gemma3nDecoder(
            embed_tokens=nn.Embedding.create(
                keys[-1], cfg.vocab_size, cfg.dim, cfg.dtype
            ),
            embed_tokens_per_layer=nn.Embedding.create(
                keys[-2],
                cfg.vocab_size_per_layer_input,
                cfg.n_layers * cfg.hidden_per_layer,
                cfg.dtype,
            ),
            per_layer_model_projection=nn.Linear.create(
                keys[-3],
                cfg.dim,
                cfg.n_layers * cfg.hidden_per_layer,
                False,
                cfg.dtype,
            ),
            per_layer_projection_norm=nn.RMSNorm.create(
                cfg.hidden_per_layer, cfg.norm_eps, cfg.dtype
            ),
            altup_projections=tuple(
                nn.Linear.create(
                    jax.random.fold_in(keys[-4], i), cfg.dim, cfg.dim,
                    False, cfg.dtype,
                )
                for i in range(n - 1)
            ),
            altup_unembed_projections=tuple(
                nn.Linear.create(
                    jax.random.fold_in(keys[-4], 100 + i), cfg.dim, cfg.dim,
                    False, cfg.dtype,
                )
                for i in range(n - 1)
            ),
            layers=tuple(make_layer(i) for i in range(cfg.n_layers)),
            norm=nn.RMSNorm.create(cfg.dim, cfg.norm_eps, cfg.dtype),
            hidden_per_layer=cfg.hidden_per_layer,
            n_altup=n,
            remat=cfg.remat,
        )
        lm_head = (
            None
            if cfg.tie_embeddings
            else nn.Linear.create(
                jax.random.fold_in(keys[-1], 7),
                cfg.dim,
                cfg.vocab_size,
                False,
                cfg.dtype,
            )
        )
        return Gemma3nLM(
            model=decoder,
            lm_head=lm_head,
            tie_embeddings=cfg.tie_embeddings,
            final_logit_softcap=cfg.final_logit_softcap,
        )
