"""Torch-format state dicts: export/import with layout conversion.

The reference's durable artifact is ``decompose_state_dict.pt`` with torch
tensor layouts and torch naming (``{site}.0.weight`` etc., README.md:54-105).
Our internal layouts are TPU-native (Linear kernel (in,out); conv HWIO), so
the boundary transposes live here and only here.

On-disk formats supported: torch ``.pt`` (via the CPU torch wheel, for
bit-compatible round-trips with the reference) and ``.safetensors``.
"""

from __future__ import annotations

import logging
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from .. import nn

__all__ = [
    "state_dict",
    "load_state_dict",
    "save_state_dict_pt",
    "load_state_dict_pt",
    "save_state_dict_safetensors",
    "load_state_dict_safetensors",
]

logger = logging.getLogger(__name__)


def _np(a: jax.Array) -> np.ndarray:
    return np.asarray(jax.device_get(a))


# --- per-type export/import ------------------------------------------------

# export: module -> {torch_param_name: np.ndarray}
# import_: (module, {torch_param_name: np.ndarray}) -> module

def _export_linear(m: nn.Linear) -> dict[str, np.ndarray]:
    out = {"weight": _np(m.kernel).T}
    if m.bias is not None:
        out["bias"] = _np(m.bias)
    return out


def _import_linear(m: nn.Linear, d: dict[str, np.ndarray]) -> nn.Linear:
    kernel = jnp.asarray(np.ascontiguousarray(d["weight"].T), m.kernel.dtype)
    bias = m.bias
    if m.bias is not None:
        bias = jnp.asarray(d["bias"], m.bias.dtype)
    return m.replace(kernel=kernel, bias=bias)


def _export_conv2d(m: nn.Conv2d) -> dict[str, np.ndarray]:
    # HWIO -> OIHW
    out = {"weight": _np(m.kernel).transpose(3, 2, 0, 1)}
    if m.bias is not None:
        out["bias"] = _np(m.bias)
    return out


def _import_conv2d(m: nn.Conv2d, d: dict[str, np.ndarray]) -> nn.Conv2d:
    kernel = jnp.asarray(
        np.ascontiguousarray(d["weight"].transpose(2, 3, 1, 0)), m.kernel.dtype
    )
    bias = m.bias
    if m.bias is not None:
        bias = jnp.asarray(d["bias"], m.bias.dtype)
    return m.replace(kernel=kernel, bias=bias)


def _export_norm(m: Any) -> dict[str, np.ndarray]:
    if m.scale is None:  # olmo's non-parametric LayerNorm: no keys at all
        return {}
    out = {"weight": _np(m.scale)}
    offset = getattr(m, "offset", None)
    if offset is not None:
        out["bias"] = _np(offset)
    return out


def _import_norm(m: Any, d: dict[str, np.ndarray]) -> Any:
    if m.scale is None:
        return m
    changes: dict[str, Any] = {"scale": jnp.asarray(d["weight"], m.scale.dtype)}
    if getattr(m, "offset", None) is not None:
        changes["offset"] = jnp.asarray(d["bias"], m.offset.dtype)
    return m.replace(**changes)


def _export_bn(m: nn.BatchNorm2d) -> dict[str, np.ndarray]:
    return {
        "weight": _np(m.scale),
        "bias": _np(m.offset),
        "running_mean": _np(m.running_mean),
        "running_var": _np(m.running_var),
        # torch tracks this; emit 0 so strict torch loads succeed
        "num_batches_tracked": np.asarray(0, np.int64),
    }


def _import_bn(m: nn.BatchNorm2d, d: dict[str, np.ndarray]) -> nn.BatchNorm2d:
    return m.replace(
        scale=jnp.asarray(d["weight"], m.scale.dtype),
        offset=jnp.asarray(d["bias"], m.offset.dtype),
        running_mean=jnp.asarray(d["running_mean"], m.running_mean.dtype),
        running_var=jnp.asarray(d["running_var"], m.running_var.dtype),
    )


def _export_embedding(m: nn.Embedding) -> dict[str, np.ndarray]:
    return {"weight": _np(m.table)}


def _import_embedding(m: nn.Embedding, d: dict[str, np.ndarray]) -> nn.Embedding:
    return m.replace(table=jnp.asarray(d["weight"], m.table.dtype))


_EXPORTERS: dict[type, Callable[[Any], dict[str, np.ndarray]]] = {
    nn.Linear: _export_linear,
    nn.Conv2d: _export_conv2d,
    nn.LayerNorm: _export_norm,
    nn.RMSNorm: _export_norm,
    nn.BatchNorm2d: _export_bn,
    nn.Embedding: _export_embedding,
}

_IMPORTERS: dict[type, Callable[[Any, dict[str, np.ndarray]], Any]] = {
    nn.Linear: _import_linear,
    nn.Conv2d: _import_conv2d,
    nn.LayerNorm: _import_norm,
    nn.RMSNorm: _import_norm,
    nn.BatchNorm2d: _import_bn,
    nn.Embedding: _import_embedding,
}


def register_statedict_handlers(
    cls: type,
    exporter: Callable[[Any], dict[str, np.ndarray]],
    importer: Callable[[Any, dict[str, np.ndarray]], Any],
) -> None:
    _EXPORTERS[cls] = exporter
    _IMPORTERS[cls] = importer


def _is_array(v: Any) -> bool:
    return isinstance(v, (jax.Array, np.ndarray)) or (
        hasattr(v, "shape") and hasattr(v, "dtype")
    )


_SERVING_FORMS = (
    "FusedLowRankLinear",
    "StackedMoEMLP",
    "QuantLinear",
    "QuantConv2d",
)


def state_dict(root: nn.Module, prefix: str = "") -> dict[str, np.ndarray]:
    """Export to a flat torch-format dict {dotted_name: np.ndarray}."""
    if type(root).__name__ in _SERVING_FORMS:
        # serving-form modules export raw leaves (w_gate/k1/...), not the
        # torch checkpoint layout — almost certainly a forgotten
        # unfuse_factor_pairs / unstack_moe_experts before saving
        import logging

        logging.getLogger(__name__).warning(
            "state_dict export of serving-form module %s at %r: convert "
            "back (nn.unfuse_factor_pairs / models.unstack_moe_experts) "
            "for a checkpoint-compatible layout",
            type(root).__name__,
            prefix,
        )
    out: dict[str, np.ndarray] = {}
    exporter = _EXPORTERS.get(type(root))
    if exporter is not None:
        for pname, arr in exporter(root).items():
            out[f"{prefix}.{pname}" if prefix else pname] = arr
        return out
    for name, child in root._name_children():
        full = f"{prefix}.{name}" if prefix else name
        if isinstance(child, nn.Module):
            out.update(state_dict(child, full))
        elif _is_array(child):
            # unknown module type: export raw leaf under its native field name
            out[full] = _np(child)
    return out


def state_dict_keys(root: nn.Module, prefix: str = "") -> set[str]:
    """The key set ``state_dict`` would emit, WITHOUT materializing any
    parameter on host (no device_get, no layout transposes) — for key
    audits on large models."""
    out: set[str] = set()
    exporter = _EXPORTERS.get(type(root))
    if exporter is not None:
        # exporters are cheap on metadata but would device_get values; the
        # key set depends only on which optional params exist, so probe
        # with the real exporter only for modules (all registered types)
        # whose key set we can derive from field presence instead:
        names = _export_key_names(root)
        for pname in names:
            out.add(f"{prefix}.{pname}" if prefix else pname)
        return out
    for name, child in root._name_children():
        full = f"{prefix}.{name}" if prefix else name
        if isinstance(child, nn.Module):
            out |= state_dict_keys(child, full)
        elif _is_array(child):
            out.add(full)
    return out


def _export_key_names(m: Any) -> list[str]:
    # dispatch on EXACT type like _EXPORTERS does: a registered subclass of
    # nn.Linear etc. with a custom exporter may emit different keys, and an
    # isinstance shortcut here would make state_dict_keys() disagree with
    # state_dict()
    t = type(m)
    if t in (nn.Linear, nn.Conv2d):
        return ["weight"] + (["bias"] if m.bias is not None else [])
    if t is nn.BatchNorm2d:
        return ["weight", "bias", "running_mean", "running_var",
                "num_batches_tracked"]
    if t in (nn.LayerNorm, nn.RMSNorm):
        if m.scale is None:  # non-parametric (olmo) — no keys
            return []
        names = ["weight"]
        if getattr(m, "offset", None) is not None:
            names.append("bias")
        return names
    if t is nn.Embedding:
        return ["weight"]
    # registered custom type: fall back to the exporter (materializes)
    return list(_EXPORTERS[type(m)](m).keys())


def load_state_dict(
    root: nn.Module,
    sd: dict[str, np.ndarray],
    prefix: str = "",
    strict: bool = True,
) -> nn.Module:
    """Return a new module tree with parameters taken from a torch-format
    state dict.  With strict=True (torch default, used by the reference
    round-trip test tests/test_config_torchvision_timm.py:40) every module
    parameter must be present and every state-dict key consumed."""
    used: set[str] = set()
    new_root = _load_module(root, sd, prefix, strict, used)
    if strict:
        unexpected = set(sd.keys()) - used
        if unexpected:
            raise KeyError(f"Unexpected keys in state dict: {sorted(unexpected)}")
    return new_root


def _join(prefix: str, name: str) -> str:
    return f"{prefix}.{name}" if prefix else name


def _load_module(
    root: nn.Module, sd: dict, prefix: str, strict: bool, used: set[str]
) -> nn.Module:
    importer = _IMPORTERS.get(type(root))
    if importer is not None:
        # the module's exporter defines exactly which param names exist —
        # only those count as consumed, so strict mode still flags keys the
        # importer would silently ignore (e.g. a '.bias' for a bias-less
        # Linear, or BN stats aimed at a site that is now a Linear)
        expected = set(_EXPORTERS[type(root)](root).keys())
        local: dict[str, np.ndarray] = {}
        lead = f"{prefix}." if prefix else ""
        for full, v in sd.items():
            if full.startswith(lead):
                pname = full[len(lead):]
                if pname and "." not in pname and pname in expected:
                    local[pname] = v
                    used.add(full)
        try:
            return importer(root, local)
        except KeyError as e:
            if strict:
                raise KeyError(f"Missing key under {prefix!r}: {e}") from e
            if not local:
                return root
            # partial non-strict load: fill the missing names from the
            # module's current values so the present keys still land
            # (torch strict=False semantics), instead of dropping them all
            current = _EXPORTERS[type(root)](root)
            return importer(root, {**current, **local})
    # Generic container: walk named children (handles Sequential's elision
    # symmetrically with state_dict()).
    for name, child in list(root._name_children()):
        full = _join(prefix, name)
        if isinstance(child, nn.Module):
            new_child = _load_module(child, sd, full, strict, used)
            if new_child is not child:
                root = nn.replace_submodule(root, name, new_child)
        elif _is_array(child):
            if full in sd:
                used.add(full)
                root = nn.replace_submodule(
                    root, name, jnp.asarray(sd[full], child.dtype)
                )
            elif strict:
                raise KeyError(f"Missing key {full!r} in state dict")
    return root


# --- on-disk formats ---------------------------------------------------------


def save_state_dict_pt(sd: dict[str, np.ndarray], path: str) -> None:
    import torch

    def to_torch(v: np.ndarray) -> "torch.Tensor":
        # copy: jax.device_get returns non-writable views torch warns about
        v = np.ascontiguousarray(v).copy()
        if v.dtype == jnp.bfloat16:  # ml_dtypes bf16: torch can't ingest it
            return torch.from_numpy(v.view(np.uint16)).view(torch.bfloat16)
        return torch.from_numpy(v)

    # torch+XLA OMP pools can deadlock on small hosts; pin threads only for
    # the duration of the save rather than process-wide
    prev_threads = torch.get_num_threads()
    torch.set_num_threads(1)
    try:
        torch.save({k: to_torch(v) for k, v in sd.items()}, path)
    finally:
        torch.set_num_threads(prev_threads)


def load_state_dict_pt(path: str) -> dict[str, np.ndarray]:
    import torch

    torch_sd = torch.load(path, map_location="cpu", weights_only=True)
    out = {}
    for k, v in torch_sd.items():
        if v.dtype == torch.bfloat16:
            out[k] = v.to(torch.float32).numpy().astype(jnp.bfloat16)
        else:
            out[k] = v.numpy()
    return out


def save_state_dict_safetensors(sd: dict[str, np.ndarray], path: str) -> None:
    from safetensors.numpy import save_file

    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, path)


def load_state_dict_safetensors(path: str) -> dict[str, np.ndarray]:
    from safetensors.numpy import load_file

    return load_file(path)
