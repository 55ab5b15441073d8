"""Loss primitives (JAX).

Functionally equivalent to
/root/reference/src/ptdeco/utils/losses_primitives.py:10-63, with the same
numerics: NSR uses the *unbiased* (ddof=1) per-channel variance like
``torch.std`` and epsilon 1e-3; the KL divergence sums over axis 1; the KL
loss is the mean of the elementwise max of both KL directions.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

__all__ = [
    "calc_per_channel_noise_to_signal_ratio",
    "calc_kl_divergence",
    "calc_kl_loss",
]


def calc_per_channel_noise_to_signal_ratio(
    x: jax.Array,
    y: jax.Array,
    non_channel_dim: Sequence[int] = (0, 2, 3),
    epsilon: float = 1e-3,
    mode: str = "mean",
) -> jax.Array:
    """mean over channels of mean((x-y)^2) / (var_unbiased(y) + eps).

    NB: the reference defaults ``non_channel_dim=(0, 2, 3)`` for torch NCHW;
    with our NHWC layout image callers pass (0, 1, 2).
    """
    del mode  # only "mean" is implemented, as in the reference
    axes = tuple(non_channel_dim)
    y32 = y.astype(jnp.float32)
    x32 = x.astype(jnp.float32)
    y_per_channel_variance = jnp.var(y32, axis=axes, ddof=1)
    per_channel_squared_difference = jnp.mean(
        jnp.square(x32 - y32), axis=axes
    )
    return jnp.mean(
        per_channel_squared_difference / (y_per_channel_variance + epsilon)
    )


def calc_kl_divergence(q_logits: jax.Array, p_logits: jax.Array) -> jax.Array:
    q_prob = jax.nn.softmax(q_logits.astype(jnp.float32), axis=-1)
    p_prob = jax.nn.softmax(p_logits.astype(jnp.float32), axis=-1)
    return jnp.sum(p_prob * jnp.log(p_prob / q_prob), axis=1)


def calc_kl_loss(student_logits: jax.Array, teacher_logits: jax.Array) -> jax.Array:
    return jnp.mean(
        jnp.maximum(
            calc_kl_divergence(student_logits, teacher_logits),
            calc_kl_divergence(teacher_logits, student_logits),
        )
    )
