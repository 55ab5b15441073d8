"""Phi-2 family CausalLM (parallel attention+MLP blocks), TPU-native.

The reference's headline LLM workload is microsoft/phi-2
(/root/reference/examples/trainer_llm/examples_config/decompose_dwain_phi2.yaml).
Architecture: LayerNorm (with bias) feeding attention and MLP in PARALLEL
residual branches, partial rotary embeddings (rotary_dim < head_dim), all
projections with bias, gelu MLP, biased lm_head.

Field names mirror HF phi ("model.layers.N.self_attn.dense",
"mlp.fc1/fc2", "model.final_layernorm") so blacklists/checkpoints written
for the reference driver apply unchanged and HF safetensors import by name.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from .. import nn
from .transformer import _rope

__all__ = ["PhiConfig", "PhiCausalLM"]


@dataclasses.dataclass(frozen=True)
class PhiConfig:
    vocab_size: int = 51200
    dim: int = 2560
    n_layers: int = 32
    n_heads: int = 32
    hidden_dim: int = 10240
    rope_theta: float = 10000.0
    partial_rotary_factor: float = 0.4
    norm_eps: float = 1e-5
    dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads

    @property
    def rotary_dim(self) -> int:
        return int(self.head_dim * self.partial_rotary_factor)

    @staticmethod
    def phi2(dtype: Any = jnp.bfloat16) -> "PhiConfig":
        return PhiConfig(dtype=dtype)

    @staticmethod
    def from_hf_config(hf: dict, dtype: Any = jnp.bfloat16) -> "PhiConfig":
        """HF ``config.json`` (model_type "phi") -> PhiConfig: any
        phi-family checkpoint (phi-1/-1.5/-2) builds without a zoo entry —
        the phi arm of the generic-constructor coverage
        (cf. TransformerConfig.from_hf_config for the llama family)."""
        if hf.get("model_type") != "phi":
            raise ValueError(f"not a phi config: {hf.get('model_type')!r}")
        if hf.get("hidden_act", "gelu_new") not in ("gelu_new", "gelu"):
            raise ValueError(f"Unsupported hidden_act={hf.get('hidden_act')!r}")
        n_heads = int(hf["num_attention_heads"])
        if int(hf.get("num_key_value_heads", n_heads)) != n_heads:
            raise ValueError("phi decoder here is MHA; GQA phi unsupported")
        return PhiConfig(
            vocab_size=int(hf["vocab_size"]),
            dim=int(hf["hidden_size"]),
            n_layers=int(hf["num_hidden_layers"]),
            n_heads=n_heads,
            hidden_dim=int(hf["intermediate_size"]),
            rope_theta=float(hf.get("rope_theta", 10000.0)),
            partial_rotary_factor=float(hf.get("partial_rotary_factor", 0.5)),
            norm_eps=float(hf.get("layer_norm_eps", 1e-5)),
            dtype=dtype,
        )

    @staticmethod
    def tiny(vocab_size: int = 256, dtype: Any = jnp.float32) -> "PhiConfig":
        return PhiConfig(
            vocab_size=vocab_size, dim=64, n_layers=2, n_heads=4,
            hidden_dim=128, dtype=dtype,
        )


class PhiAttention(nn.Module):
    q_proj: nn.Linear
    k_proj: nn.Linear
    v_proj: nn.Linear
    dense: nn.Linear
    n_heads: int = nn.static_field(default=32)
    rotary_dim: int = nn.static_field(default=32)
    rope_theta: float = nn.static_field(default=10000.0)

    def __call__(
        self,
        x: jax.Array,
        ctx: Optional[nn.Ctx] = None,
        *,
        positions: Optional[jax.Array] = None,
        attn_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        b, s, _ = x.shape
        q = self.q_proj(x, ctx)
        hd = q.shape[-1] // self.n_heads
        q = q.reshape(b, s, self.n_heads, hd)
        k = self.k_proj(x, ctx).reshape(b, s, self.n_heads, hd)
        v = self.v_proj(x, ctx).reshape(b, s, self.n_heads, hd)

        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))
        rd = self.rotary_dim
        q = jnp.concatenate(
            [_rope(q[..., :rd], positions, self.rope_theta), q[..., rd:]], -1
        )
        k = jnp.concatenate(
            [_rope(k[..., :rd], positions, self.rope_theta), k[..., rd:]], -1
        )

        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (hd**-0.5)
        mask = jnp.tril(jnp.ones((s, s), bool))[None, None]
        if attn_mask is not None:
            mask = mask & attn_mask[:, None, None, :].astype(bool)
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, -1)
        return self.dense(out, ctx)

    @staticmethod
    def create(key: jax.Array, cfg: PhiConfig) -> "PhiAttention":
        ks = jax.random.split(key, 4)
        return PhiAttention(
            q_proj=nn.Linear.create(ks[0], cfg.dim, cfg.dim, True, cfg.dtype),
            k_proj=nn.Linear.create(ks[1], cfg.dim, cfg.dim, True, cfg.dtype),
            v_proj=nn.Linear.create(ks[2], cfg.dim, cfg.dim, True, cfg.dtype),
            dense=nn.Linear.create(ks[3], cfg.dim, cfg.dim, True, cfg.dtype),
            n_heads=cfg.n_heads,
            rotary_dim=cfg.rotary_dim,
            rope_theta=cfg.rope_theta,
        )


class PhiMLP(nn.Module):
    fc1: nn.Linear
    fc2: nn.Linear

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        return self.fc2(jax.nn.gelu(self.fc1(x, ctx), approximate=True), ctx)

    @staticmethod
    def create(key: jax.Array, cfg: PhiConfig) -> "PhiMLP":
        k1, k2 = jax.random.split(key)
        return PhiMLP(
            fc1=nn.Linear.create(k1, cfg.dim, cfg.hidden_dim, True, cfg.dtype),
            fc2=nn.Linear.create(k2, cfg.hidden_dim, cfg.dim, True, cfg.dtype),
        )


class PhiBlock(nn.Module):
    """Parallel residual: x + attn(ln(x)) + mlp(ln(x))."""

    input_layernorm: nn.LayerNorm
    self_attn: PhiAttention
    mlp: PhiMLP

    def __call__(
        self,
        x: jax.Array,
        ctx: Optional[nn.Ctx] = None,
        *,
        positions: Optional[jax.Array] = None,
        attn_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        h = self.input_layernorm(x, ctx)
        return (
            x
            + self.self_attn(h, ctx, positions=positions, attn_mask=attn_mask)
            + self.mlp(h, ctx)
        )

    @staticmethod
    def create(key: jax.Array, cfg: PhiConfig) -> "PhiBlock":
        k1, k2 = jax.random.split(key)
        return PhiBlock(
            input_layernorm=nn.LayerNorm.create(cfg.dim, True, cfg.norm_eps,
                                                cfg.dtype),
            self_attn=PhiAttention.create(k1, cfg),
            mlp=PhiMLP.create(k2, cfg),
        )


class PhiDecoder(nn.Module):
    embed_tokens: nn.Embedding
    layers: tuple
    final_layernorm: nn.LayerNorm
    # rematerialize each block during backward (same contract as
    # transformer.Decoder.remat; Ctx.no_remat gates capture paths)
    remat: bool = nn.static_field(default=False)

    def __call__(self, input_ids, ctx=None, *, attn_mask=None):
        x = self.embed_tokens(input_ids)
        b, s = input_ids.shape
        positions = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))
        use_remat = self.remat and not (ctx is not None and ctx.no_remat)
        for layer in self.layers:
            if use_remat:
                x = jax.checkpoint(
                    lambda lyr, h: lyr(
                        h, ctx, positions=positions, attn_mask=attn_mask
                    )
                )(layer, x)
            else:
                x = layer(x, ctx, positions=positions, attn_mask=attn_mask)
        return self.final_layernorm(x)


class PhiCausalLM(nn.Module):
    model: PhiDecoder
    lm_head: nn.Linear  # biased, unlike llama

    def __call__(self, batch: Any, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        if isinstance(batch, dict):
            input_ids = batch["input_ids"]
            attn_mask = batch.get("attention_mask")
        else:
            input_ids, attn_mask = batch, None
        h = self.model(input_ids, ctx, attn_mask=attn_mask)
        return self.lm_head(h, ctx)

    @staticmethod
    def create(key: jax.Array, cfg: PhiConfig) -> "PhiCausalLM":
        keys = jax.random.split(key, cfg.n_layers + 2)
        return PhiCausalLM(
            model=PhiDecoder(
                embed_tokens=nn.Embedding.create(
                    keys[0], cfg.vocab_size, cfg.dim, cfg.dtype
                ),
                layers=tuple(
                    PhiBlock.create(keys[1 + i], cfg)
                    for i in range(cfg.n_layers)
                ),
                final_layernorm=nn.LayerNorm.create(
                    cfg.dim, True, cfg.norm_eps, cfg.dtype
                ),
            ),
            lm_head=nn.Linear.create(
                keys[-1], cfg.dim, cfg.vocab_size, True, cfg.dtype
            ),
        )
