"""decompose_config (de)serialization.

This is the frozen compatibility contract with the reference: the JSON format
must match /root/reference/src/ptdeco/utils/modconfig.py:21-130 field for
field so ``decompose_config.json`` files round-trip between implementations
(reference README.md:54-105).  Tuples are emitted as lists (what json.dump
does to torch's tuples).
"""

from __future__ import annotations

import collections
import logging
from typing import Any, Optional

import jax.numpy as jnp

from .. import nn
from . import common

__all__ = [
    "get_module_config",
    "build_module_from_config",
    "apply_decompose_config",
    "MODCONFIG_META_KEY",
]

logger = logging.getLogger(__name__)

MODCONFIG_META_KEY = "__meta__"


def _listify(v: Any) -> Any:
    if isinstance(v, tuple):
        return [int(x) for x in v]
    return v


def _get_module_config_sequential(m: nn.Sequential) -> dict[str, Any]:
    config: dict[str, Any] = {"type": "Sequential"}
    config["modules"] = {}
    for k, v in m._name_children():
        config["modules"][k] = get_module_config(v)
    return config


def _get_module_config_conv2d(m: nn.Conv2d) -> dict[str, Any]:
    config: dict[str, Any] = {}
    config["type"] = "Conv2d"
    config["in_channels"] = m.in_channels
    config["out_channels"] = m.out_channels
    config["kernel_size"] = _listify(m.kernel_size)
    config["bias"] = m.bias is not None
    config["groups"] = m.groups
    config["padding"] = _listify(m.padding)
    config["padding_mode"] = m.padding_mode
    config["stride"] = _listify(m.stride)
    config["dilation"] = _listify(m.dilation)
    return config


def _get_module_config_linear(m: nn.Linear) -> dict[str, Any]:
    res: dict[str, Any] = {}
    res["type"] = "Linear"
    res["in_features"] = m.in_features
    res["out_features"] = m.out_features
    res["bias"] = m.bias is not None
    return res


def get_module_config(m: nn.Module) -> dict[str, Any]:
    if isinstance(m, nn.Sequential):
        return _get_module_config_sequential(m)
    elif isinstance(m, nn.Conv2d):
        return _get_module_config_conv2d(m)
    elif isinstance(m, nn.Linear):
        return _get_module_config_linear(m)
    else:
        raise ValueError(f"get_module_config not implemented for {type(m)}")


def _pairify(v: Any) -> Any:
    if isinstance(v, (list, tuple)):
        return (int(v[0]), int(v[1]))
    if isinstance(v, int):
        return (v, v)
    return v  # str paddings like "same"


def _build_conv2d_from_config(config: dict[str, Any], dtype: Any) -> nn.Conv2d:
    assert config["type"] == "Conv2d"
    kh, kw = _pairify(config["kernel_size"])
    groups = config["groups"]
    in_ch = config["in_channels"]
    out_ch = config["out_channels"]
    kernel = jnp.zeros((kh, kw, in_ch // groups, out_ch), dtype)
    bias = jnp.zeros((out_ch,), dtype) if config["bias"] else None
    return nn.Conv2d(
        kernel=kernel,
        bias=bias,
        stride=_pairify(config["stride"]),
        padding=_pairify(config["padding"]),
        dilation=_pairify(config["dilation"]),
        groups=groups,
        padding_mode=config.get("padding_mode", "zeros"),
    )


def _build_linear_from_config(config: dict[str, Any], dtype: Any) -> nn.Linear:
    assert config["type"] == "Linear"
    kernel = jnp.zeros((config["in_features"], config["out_features"]), dtype)
    bias = jnp.zeros((config["out_features"],), dtype) if config["bias"] else None
    return nn.Linear(kernel=kernel, bias=bias)


def _build_sequential_from_config(
    config: dict[str, Any], dtype: Any
) -> nn.Sequential:
    assert config["type"] == "Sequential"
    modules_config = config["modules"]
    # The reference distinguishes index-named vs dict-named children
    # (modconfig.py:88-99); our Sequential names children by index either way,
    # but we preserve insertion order for both.
    layers = tuple(
        build_module_from_config(v, dtype=dtype) for v in modules_config.values()
    )
    return nn.Sequential(layers=layers)


def build_module_from_config(
    config: dict[str, Any], dtype: Any = jnp.float32
) -> nn.Module:
    type_ = config.get("type")
    if type_ == "Sequential":
        return _build_sequential_from_config(config, dtype)
    elif type_ == "Conv2d":
        return _build_conv2d_from_config(config, dtype)
    elif type_ == "Linear":
        return _build_linear_from_config(config, dtype)
    else:
        raise ValueError(f"{type_=} not supported")


def apply_decompose_config(
    module: nn.Module,
    decompose_config: dict[str, Any],
    dtype: Optional[Any] = None,
) -> nn.Module:
    """Pure-functional analogue of ``apply_decompose_config_in_place``
    (/root/reference/src/ptdeco/utils/modconfig.py:114-130): returns a new
    model with each configured site replaced by a freshly built (zero-filled)
    module; load a state dict afterwards to populate the weights."""
    decomposed_counter: collections.Counter[str] = collections.Counter()
    for submodule_name, new_submodule_config in decompose_config.items():
        old = nn.get_submodule(module, submodule_name)
        use_dtype = dtype if dtype is not None else common.get_default_dtype(old)
        new_submodule = build_module_from_config(
            new_submodule_config, dtype=use_dtype
        )
        module = nn.replace_submodule(module, submodule_name, new_submodule)
        decomposed_counter[common.get_type_name(old)] += 1

    for submodule_type_name, count in decomposed_counter.items():
        logger.info(f"Decomposed {count} instances of {submodule_type_name}")
    return module
