"""Perceiver (learned-query image classifier), TPU-native (NHWC).

Reference consumption analogue: any timm/HF perceiver checkpoint
through the reference's generic builders
(trainer_vision/builder.py:134-144).  Mirrors HF
``PerceiverForImageClassificationLearned`` exactly:

* conv1x1 featurizer to 256 channels, learned per-pixel positions
  projected to 256 and CONCATENATED (inputs are 512-channel tokens);
* a learned latent array cross-attends the inputs (qk width follows the
  ``cross_attention_shape_for_attention='kv'`` rule: q/k project to the
  KV width), then ``num_blocks`` WEIGHT-SHARED passes over the
  self-attention stack; every layer is pre-LN with a post-attention
  ``attn_out + mlp(ln(attn_out))`` wiring and optional query residual;
* classification decoder: a single learned query cross-attends the
  latents (one head, query residual) and a final linear produces the
  logits.  LayerNorms use the torch DEFAULT eps (config.layer_norm_eps
  is never threaded through — upstream quirk kept).

All q/k/v/dense projections are decomposable ``nn.Linear`` sites; the
latent bottleneck keeps every matmul MXU-shaped regardless of input
resolution.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import nn


class PSelfAttention(nn.Module):
    """HF PerceiverSelfAttention: pre-LN q (and kv for cross), separate
    qk/v widths, scale by sqrt(qk_per_head)."""

    layernorm1: nn.LayerNorm
    query: nn.Linear
    key: nn.Linear
    value: nn.Linear
    layernorm2: Optional[nn.LayerNorm] = None  # cross-attention only
    n_heads: int = nn.static_field(default=1)

    def __call__(
        self, x: jax.Array, inputs: Optional[jax.Array] = None,
        ctx: Optional[nn.Ctx] = None,
    ) -> jax.Array:
        b, n, _ = x.shape
        h = self.layernorm1(x, ctx)
        kv = h if inputs is None else self.layernorm2(inputs, ctx)
        q = self.query(h, ctx)
        k = self.key(kv, ctx)
        v = self.value(kv, ctx)
        qk_h = q.shape[-1] // self.n_heads
        v_h = v.shape[-1] // self.n_heads

        def split(t, dh):
            return t.reshape(b, -1, self.n_heads, dh).transpose(0, 2, 1, 3)

        q, k, v = split(q, qk_h), split(k, qk_h), split(v, v_h)
        attn = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
                jnp.asarray(qk_h, x.dtype)
            ),
            axis=-1,
        )
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        return out.transpose(0, 2, 1, 3).reshape(b, n, self.n_heads * v_h)


class _Dense(nn.Module):
    dense: nn.Linear

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        return self.dense(x, ctx)


class PAttention(nn.Module):
    # HF's field is literally named "self" (an illegal dataclass field
    # name here) -- the translator renames ".self." -> ".attn."
    attn: PSelfAttention
    output: _Dense
    use_query_residual: bool = nn.static_field(default=True)

    def __call__(self, x, inputs=None, ctx=None):
        out = self.output(self.attn(x, inputs, ctx), ctx)
        return out + x if self.use_query_residual else out


class PMLP(nn.Module):
    dense1: nn.Linear
    dense2: nn.Linear

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        return self.dense2(jax.nn.gelu(self.dense1(x, ctx), approximate=False),
                           ctx)


class PLayer(nn.Module):
    attention: PAttention
    layernorm: nn.LayerNorm
    mlp: PMLP

    def __call__(self, x, inputs=None, ctx=None):
        h = self.attention(x, inputs, ctx)
        return h + self.mlp(self.layernorm(h, ctx), ctx)


class PEncoder(nn.Module):
    cross_attention: PLayer
    self_attends: tuple
    num_blocks: int = nn.static_field(default=1)

    def __call__(self, latents, inputs, ctx=None):
        z = self.cross_attention(latents, inputs, ctx)
        for _ in range(self.num_blocks):  # weight-shared repeats
            for layer in self.self_attends:
                z = layer(z, None, ctx)
        return z


class _TrainablePos(nn.Module):
    position_embeddings: jax.Array  # (n, c)

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        raise NotImplementedError  # read the leaf directly


class ImagePreprocessor(nn.Module):
    """conv1x1 + projected learned positions, concatenated."""

    convnet_1x1: nn.Conv2d
    position_embeddings: _TrainablePos
    positions_projection: nn.Linear

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        y = self.convnet_1x1(x, ctx)
        b, h, w, c = y.shape
        t = y.reshape(b, h * w, c)
        pos = self.position_embeddings.position_embeddings
        if pos.shape[0] != h * w:
            raise ValueError(
                f"perceiver positions built for {pos.shape[0]} pixels, got "
                f"{h * w}; resize inputs to the config image_size"
            )
        pos = self.positions_projection(pos, ctx)
        pos = jnp.broadcast_to(pos[None], (b,) + pos.shape)
        return jnp.concatenate([t, pos], axis=-1)


class _Latents(nn.Module):
    latents: jax.Array  # (num_latents, d_latents)

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        raise NotImplementedError


class BasicDecoder(nn.Module):
    output_position_encodings: _TrainablePos
    decoding_cross_attention: PLayer
    final_layer: nn.Linear

    def __call__(self, z: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        b = z.shape[0]
        query = self.output_position_encodings.position_embeddings
        query = jnp.broadcast_to(query[None], (b,) + query.shape)
        out = self.decoding_cross_attention(query, z, ctx)
        return self.final_layer(out, ctx)[:, 0, :]


class _DecoderWrap(nn.Module):
    decoder: BasicDecoder

    def __call__(self, z, ctx=None):
        return self.decoder(z, ctx)


class PerceiverImageClassifierLearned(nn.Module):
    """NHWC Perceiver (Learned) classifier; input (b, h, w, 3)."""

    input_preprocessor: ImagePreprocessor
    embeddings: _Latents
    encoder: PEncoder
    decoder: _DecoderWrap

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        inputs = self.input_preprocessor(x, ctx)
        b = x.shape[0]
        lat = self.embeddings.latents
        latents = jnp.broadcast_to(lat[None], (b,) + lat.shape)
        z = self.encoder(latents, inputs, ctx)
        return self.decoder(z, ctx)

    @staticmethod
    def create(
        key: jax.Array,
        num_classes: int = 1000,
        image_size: int = 224,
        num_latents: int = 256,
        d_latents: int = 1280,
        num_blocks: int = 1,
        num_self_attends_per_block: int = 26,
        num_self_attention_heads: int = 8,
        num_cross_attention_heads: int = 8,
        qk_channels: Optional[int] = None,
        v_channels: Optional[int] = None,
        cross_attention_shape_for_attention: str = "kv",
        self_attention_widening_factor: int = 1,
        cross_attention_widening_factor: int = 1,
        use_query_residual: bool = True,
        prep_channels: int = 256,
        dtype: Any = jnp.float32,
    ) -> "PerceiverImageClassifierLearned":
        keys = iter(jax.random.split(
            key, 8 * num_self_attends_per_block + 32
        ))
        kv_dim = 2 * prep_channels  # conv features ++ projected positions

        def ln(ch):
            return nn.LayerNorm.create(ch, eps=1e-5, dtype=dtype)

        def player(q_dim, layer_kv_dim, heads, widening, cross,
                   query_residual) -> PLayer:
            if cross and qk_channels is None:
                qk = (
                    layer_kv_dim
                    if cross_attention_shape_for_attention == "kv" else q_dim
                )
            else:
                qk = qk_channels if qk_channels is not None else q_dim
            vch = v_channels if v_channels is not None else qk
            return PLayer(
                attention=PAttention(
                    attn=PSelfAttention(
                        layernorm1=ln(q_dim),
                        layernorm2=ln(layer_kv_dim) if cross else None,
                        query=nn.Linear.create(next(keys), q_dim, qk, True,
                                               dtype),
                        key=nn.Linear.create(next(keys), layer_kv_dim, qk,
                                             True, dtype),
                        value=nn.Linear.create(next(keys), layer_kv_dim, vch,
                                               True, dtype),
                        n_heads=heads,
                    ),
                    output=_Dense(dense=nn.Linear.create(
                        next(keys), vch, q_dim, True, dtype
                    )),
                    use_query_residual=query_residual,
                ),
                layernorm=ln(q_dim),
                mlp=PMLP(
                    dense1=nn.Linear.create(next(keys), q_dim,
                                            widening * q_dim, True, dtype),
                    dense2=nn.Linear.create(next(keys), widening * q_dim,
                                            q_dim, True, dtype),
                ),
            )

        return PerceiverImageClassifierLearned(
            input_preprocessor=ImagePreprocessor(
                convnet_1x1=nn.Conv2d.create(
                    next(keys), 3, prep_channels, (1, 1), use_bias=True,
                    dtype=dtype,
                ),
                position_embeddings=_TrainablePos(
                    position_embeddings=jax.random.normal(
                        next(keys), (image_size * image_size, prep_channels),
                        dtype,
                    ),
                ),
                positions_projection=nn.Linear.create(
                    next(keys), prep_channels, prep_channels, True, dtype
                ),
            ),
            embeddings=_Latents(latents=jax.random.normal(
                next(keys), (num_latents, d_latents), dtype
            )),
            encoder=PEncoder(
                cross_attention=player(
                    d_latents, kv_dim, num_cross_attention_heads,
                    cross_attention_widening_factor, True,
                    use_query_residual,
                ),
                self_attends=tuple(
                    player(
                        d_latents, d_latents, num_self_attention_heads,
                        self_attention_widening_factor, False, True,
                    )
                    for _ in range(num_self_attends_per_block)
                ),
                num_blocks=num_blocks,
            ),
            decoder=_DecoderWrap(decoder=BasicDecoder(
                output_position_encodings=_TrainablePos(
                    position_embeddings=jax.random.normal(
                        next(keys), (1, d_latents), dtype
                    ),
                ),
                decoding_cross_attention=player(
                    d_latents, d_latents, 1, 1, True, True
                ),
                final_layer=nn.Linear.create(
                    next(keys), d_latents, num_classes, True, dtype
                ),
            )),
        )


def translate_hf_perceiver_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF PerceiverForImageClassificationLearned -> native torch-layout
    keys: strip ``perceiver.`` and rename the ``.self.`` attention
    segment (an illegal dataclass field name) to ``.attn.``."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.startswith("perceiver."):
            k = k[len("perceiver."):]
        k = k.replace(".self.", ".attn.")
        out[k] = v
    return out
