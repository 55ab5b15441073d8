"""Serving-path fusion for decomposed models.

``fuse_factor_pairs`` swaps every Sequential factor pair (the artifact of
dwain/falor/lockd decomposition) for a ``FusedLowRankLinear`` whose forward
is the Pallas fused UV matmul (ops/lowrank_pallas.py) — the rank-r
intermediate never leaves VMEM.  ``unfuse_factor_pairs`` restores the
checkpoint-compatible Sequential form (state-dict naming is defined on the
factor pair, so fuse before serving, unfuse before saving).
"""

from __future__ import annotations

from typing import Any, Optional

import jax

from .layers import Conv2d, Linear, Sequential, conv1x1_from_kernel
from .module import Ctx, Module, named_modules, replace_submodule, static_field

__all__ = ["FusedLowRankLinear", "fuse_factor_pairs", "unfuse_factor_pairs"]


class FusedLowRankLinear(Module):
    """y = (x @ k1) @ k2 + b with the hidden tile kept in VMEM.

    Works for Linear factor pairs and stride-1 unpadded 1x1-conv pairs (an
    NHWC 1x1 conv is this exact matmul over the flattened pixels)."""

    k1: jax.Array  # (in, r)
    k2: jax.Array  # (r, out)
    bias: Optional[jax.Array]
    from_conv: bool = static_field(default=False)
    # preserved through fuse->unfuse so the rebuilt pair keeps the matmul
    # precision the engine configured on the original factors
    precision: Any = static_field(default=None)

    def __call__(self, x: jax.Array, ctx: Optional[Ctx] = None) -> jax.Array:
        from ..ops.lowrank_pallas import lowrank_matmul

        return lowrank_matmul(x, self.k1, self.k2, self.bias)


def _is_linear_pair(m: Module) -> bool:
    return (
        isinstance(m, Sequential)
        and len(m) == 2
        and isinstance(m[0], Linear)
        and isinstance(m[1], Linear)
        and m[0].bias is None
    )


def _is_plain_conv1x1_pair(m: Module) -> bool:
    def plain(c: Conv2d) -> bool:
        return (
            c.kernel_size == (1, 1)
            and c.groups == 1
            and c.stride == (1, 1)
            and c.padding in ((0, 0), 0)
        )

    return (
        isinstance(m, Sequential)
        and len(m) == 2
        and isinstance(m[0], Conv2d)
        and isinstance(m[1], Conv2d)
        and m[0].bias is None
        and plain(m[0])
        and plain(m[1])
    )


def fuse_factor_pairs(root: Module) -> Module:
    """Replace decomposed factor pairs with fused modules (pure)."""
    for name, m in list(named_modules(root)):
        if name == "":
            continue
        if _is_linear_pair(m):
            fused = FusedLowRankLinear(
                k1=m[0].kernel, k2=m[1].kernel, bias=m[1].bias,
                from_conv=False, precision=m[1].precision,
            )
            root = replace_submodule(root, name, fused)
        elif _is_plain_conv1x1_pair(m):
            fused = FusedLowRankLinear(
                k1=m[0].kernel[0, 0],
                k2=m[1].kernel[0, 0],
                bias=m[1].bias,
                from_conv=True,
                precision=m[1].precision,
            )
            root = replace_submodule(root, name, fused)
    return root


def unfuse_factor_pairs(root: Module) -> Module:
    """Restore the checkpoint-compatible Sequential factor pairs."""
    for name, m in list(named_modules(root)):
        if isinstance(m, FusedLowRankLinear):
            if m.from_conv:
                pair = Sequential(
                    layers=(
                        conv1x1_from_kernel(m.k1, None, precision=m.precision),
                        conv1x1_from_kernel(m.k2, m.bias, precision=m.precision),
                    )
                )
            else:
                pair = Sequential(
                    layers=(
                        Linear(kernel=m.k1, bias=None, precision=m.precision),
                        Linear(kernel=m.k2, bias=m.bias, precision=m.precision),
                    )
                )
            root = replace_submodule(root, name, pair)
    return root
