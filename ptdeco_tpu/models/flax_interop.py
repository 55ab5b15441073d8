"""Import flax/linen parameter pytrees (e.g. HF Flax checkpoints) into
native models.

Flax Dense kernels are (in, out) — our layout — so import is a pure
name-mapping exercise (no transposes, unlike the torch path in
utils/statedict.py).  Leaf-name translation: kernel->kernel, bias->bias,
embedding->table, LayerNorm scale/bias -> scale/offset.

Scope note: this imports *weights*.  Decomposing a linen module in place is
out of scope — linen structure is static; convert the architecture to
ptdeco_tpu.nn (the model zoo covers the reference's families) and import
the weights with this helper.
"""

from __future__ import annotations

import logging
from typing import Any, Mapping

import jax.numpy as jnp

from .. import nn

logger = logging.getLogger(__name__)

__all__ = ["flatten_flax_params", "load_flax_params"]


def flatten_flax_params(params: Mapping[str, Any]) -> dict[str, Any]:
    """{'model': {'layers_0': {'kernel': ...}}} -> {'model.layers_0.kernel'}."""
    if "params" in params and isinstance(params["params"], Mapping):
        params = params["params"]
    out: dict[str, Any] = {}

    def rec(prefix: str, node: Any) -> None:
        if isinstance(node, Mapping):
            for k, v in node.items():
                rec(f"{prefix}.{k}" if prefix else str(k), v)
        else:
            out[prefix] = node

    rec("", params)
    return out


_LEAF_RENAMES = {
    "embedding": "table",  # flax nn.Embed -> our Embedding
}


def load_flax_params(
    model: nn.Module,
    params: Mapping[str, Any],
    strict: bool = True,
) -> nn.Module:
    """Load a flax params dict into a native model by dotted-name match.

    Handles flax's layer-list naming ("layers_0" -> "layers.0") and
    LayerNorm's bias->offset."""
    flat = flatten_flax_params(params)

    def normalize(name: str) -> str:
        parts = []
        for p in name.split("."):
            head, _, tail = p.rpartition("_")
            if head and tail.isdigit():
                parts.extend([head, tail])
            else:
                parts.append(p)
        return ".".join(parts)

    flat = {normalize(k): v for k, v in flat.items()}

    used = set()
    for our_name, leaf in list(nn.named_parameters(model)):
        candidates = [our_name]
        stem, _, last = our_name.rpartition(".")
        for flax_leaf, ours in _LEAF_RENAMES.items():
            if last == ours:
                candidates.append(f"{stem}.{flax_leaf}" if stem else flax_leaf)
        if last == "offset":
            candidates.append(f"{stem}.bias" if stem else "bias")
        if last == "scale":
            # HF Flax norm layers call the scale "weight"
            # (e.g. FlaxLlamaRMSNorm)
            candidates.append(f"{stem}.weight" if stem else "weight")
        found = next((c for c in candidates if c in flat), None)
        if found is None:
            if strict:
                raise KeyError(f"No flax param for {our_name!r}")
            continue
        used.add(found)
        model = nn.replace_submodule(
            model, our_name, jnp.asarray(flat[found], leaf.dtype)
        )
    unused = set(flat) - used
    if unused:
        logger.info(f"Unused flax params: {sorted(unused)[:8]}...")
    return model
