"""Small synthetic models for tests and benchmarks."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from .. import nn

__all__ = ["MLP", "make_mlp"]


class MLP(nn.Module):
    """Stack of Linear+relu blocks with a head; accepts dict or array batch."""

    blocks: tuple
    head: nn.Linear

    def __call__(self, batch: Any, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        x = batch["inp"] if isinstance(batch, dict) else batch
        for blk in self.blocks:
            x = jax.nn.relu(blk(x, ctx))
        return self.head(x, ctx)


def make_mlp(
    key: jax.Array,
    dim: int = 1024,
    depth: int = 4,
    n_out: int = 16,
    dtype: Any = jnp.float32,
) -> MLP:
    keys = jax.random.split(key, depth + 1)
    blocks = tuple(
        nn.Linear.create(keys[i], dim, dim, dtype=dtype) for i in range(depth)
    )
    return MLP(blocks=blocks, head=nn.Linear.create(keys[-1], dim, n_out, dtype=dtype))
