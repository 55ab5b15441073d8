"""LOCKD training losses (reference /root/reference/src/ptdeco/lockd/losses.py).

The gate-entropy and proportion losses are pure functions of the module tree
(they read only the gate logits).  The NSR losses consume the per-layer NSR
dict *sown* during a forward with an ``nn.Ctx`` — use ``forward_collecting``
or thread your own Ctx — instead of the reference's post-forward module
attribute scan (losses.py:47-62), which keeps the train step a single pure
jitted function.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from .. import nn
from . import decomposition

__all__ = [
    "calc_entropy_from_logits",
    "get_entropy_dict",
    "get_entropy_loss",
    "get_nsr_dict",
    "get_nsr_loss",
    "get_proportion_dict",
    "get_proportion_loss",
    "forward_collecting",
]


def calc_entropy_from_logits(
    logits: jax.Array, epsilon: float = 0.01
) -> jax.Array:
    # stable binary entropy via log-sigmoid: the naive p*log(p) form is
    # 0*log(0) = NaN once |logits| saturates fp32 sigmoid (~16.6), which
    # the entropy-minimizing training objective reliably reaches.  The
    # reference's torch formula has the same latent NaN (losses.py:16-23);
    # this form is exactly equal in the non-saturated regime.
    lz = logits.astype(jnp.float32)
    p = jax.nn.sigmoid(lz)
    # H(p) = log_sigmoid(z)*(-p') ... expressed as softplus-based identity:
    # H = log(1+e^z) - z*sigmoid(z)  (binary entropy of sigmoid(z))
    entropy = jax.nn.softplus(lz) - lz * p
    return jnp.maximum(jnp.mean(entropy), epsilon)


def get_entropy_dict(wrapped_module: nn.Module) -> dict[str, jax.Array]:
    return {
        name: calc_entropy_from_logits(m.logits)
        for name, m in decomposition.named_wrapped_modules(wrapped_module)
    }


def get_entropy_loss(wrapped_module: nn.Module) -> jax.Array:
    vals = [
        calc_entropy_from_logits(m.logits)
        for _, m in decomposition.named_wrapped_modules(wrapped_module)
    ]
    return jnp.mean(jnp.stack(vals))


def forward_collecting(
    root: nn.Module,
    x: Any,
    key: Optional[jax.Array] = None,
    train: bool = True,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Forward pass returning (output, {layer_name: nsr}).  Jit-safe."""
    ctx = nn.Ctx(key=key, train=train)
    y = root(x, ctx=ctx)
    return y, dict(ctx.sink.get("nsr", {}))


def get_nsr_dict(nsr_sink: dict[str, jax.Array]) -> dict[str, jax.Array]:
    return dict(nsr_sink)


def get_nsr_loss(
    nsr_sink: dict[str, jax.Array], nsr_threshold: float
) -> jax.Array:
    """mean over layers of relu(nsr - t) / t (reference losses.py:56-62)."""
    if not nsr_sink:
        raise ValueError(
            "empty NSR sink: no wrapped layers ran in this forward — "
            "wrap the model first (lockd.wrap) and check the blacklist "
            "did not exclude every Linear/Conv2d"
        )
    vals = [
        jax.nn.relu(v - nsr_threshold) / nsr_threshold
        for v in nsr_sink.values()
    ]
    return jnp.mean(jnp.stack(vals))


def get_proportion_dict(wrapped_module: nn.Module) -> dict[str, jax.Array]:
    return {
        name: decomposition.calc_propotion_from_logits(m.logits)
        for name, m in decomposition.named_wrapped_modules(wrapped_module)
    }


def get_proportion_loss(wrapped_module: nn.Module) -> jax.Array:
    vals = [
        decomposition.calc_propotion_from_logits(m.logits)
        for _, m in decomposition.named_wrapped_modules(wrapped_module)
    ]
    return jnp.mean(jnp.stack(vals))
