"""Vision model builder + model stats.

Reference: /root/reference/examples/trainer_vision/builder.py (timm
create_model + fvcore FLOPs).  Native model zoo instead of timm; FLOPs from
XLA compiled cost analysis; kmapps = kilo-MACs per pixel (the reference's
kmapps metric, builder.py:28-37, with FLOPs = 2*MACs).
"""

from __future__ import annotations

import logging
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ptdeco_tpu import engine, nn, utils
from ptdeco_tpu.models import convnext as convnext_zoo
from ptdeco_tpu.models import resnet as resnet_zoo
from ptdeco_tpu.models import vit as vit_zoo

logger = logging.getLogger(__name__)

_ZOO = {
    "resnet18": resnet_zoo.resnet18,
    "resnet34": resnet_zoo.resnet34,
    "resnet50": resnet_zoo.resnet50,
    "resnet101": resnet_zoo.resnet101,
    "convnext_tiny": convnext_zoo.convnext_tiny,
    "convnext_small": convnext_zoo.convnext_small,
    "vit_tiny_patch16_224": vit_zoo.vit_tiny,
    "vit_small_patch16_224": vit_zoo.vit_small,
    "vit_base_patch16_224": vit_zoo.vit_base,
}


def register_model(name: str, factory) -> None:
    _ZOO[name] = factory


def make_model(
    model_name: str,
    num_classes: int = 1000,
    seed: int = 0,
    checkpoint_path: Optional[str] = None,
) -> nn.Module:
    if model_name.startswith("ptdeco_tpu."):
        model_name = model_name.split(".", 1)[1]
    if model_name not in _ZOO:
        raise ValueError(f"Unknown model {model_name!r}; known: {sorted(_ZOO)}")
    model = _ZOO[model_name](jax.random.PRNGKey(seed), num_classes=num_classes)
    if checkpoint_path is not None:
        # torchvision/timm state dicts load through the torch-format importer
        if checkpoint_path.endswith(".safetensors"):
            sd = utils.load_state_dict_safetensors(checkpoint_path)
        else:
            sd = utils.load_state_dict_pt(checkpoint_path)
        model = utils.load_state_dict(model, sd, strict=False)
        logger.info(f"Loaded weights from {checkpoint_path}")
    log_decomposeable_inventory(model)
    return model


def log_decomposeable_inventory(model: nn.Module) -> None:
    """reference builder.py:146-170"""
    names = engine.get_decomposeable_submodule_names(model)
    msgs = [f"There are {len(names)} modules that can be decomposed:"]
    for i, n in enumerate(names, 1):
        msgs.append(f"  {i}. {n}")
    logger.info("\n".join(msgs))


def get_model_stats(
    model: nn.Module, b_h_w_c: tuple[int, int, int, int]
) -> dict[str, Any]:
    """params [M], gflops, kmapps (reference get_model_stats,
    builder.py:48-60)."""
    x = jnp.zeros(b_h_w_c, jnp.float32)
    lowered = jax.jit(lambda m, x: m(x)).lower(model, x)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0)) / b_h_w_c[0]
    gflops = flops / 1e9
    # kmapps: kilo MACs per pixel; fvcore counts MACs, flops = 2*MACs
    kmapps = flops / 2.0 / (b_h_w_c[1] * b_h_w_c[2]) / 1.0e3
    return {
        "mparams": utils.get_num_params(model) / 1e6,
        "gflops": gflops,
        "kmapps": kmapps,
    }


def validate_module_names(model: nn.Module, names: Optional[list[str]]) -> None:
    if names is None:
        return
    known = {name for name, _ in nn.named_modules(model)}
    unknown = [n for n in names if n not in known]
    if unknown:
        raise ValueError(f"Unknown module names: {unknown}")
