"""Load HuggingFace checkpoints into native models.

Our transformer field names deliberately mirror HF llama-family naming
("model.layers.N.self_attn.q_proj", ...), so an HF state dict loads through
the generic torch-format importer (utils.statedict handles the layout
transposes).  Replaces the reference's AutoModelForCausalLM dependency
(/root/reference/examples/trainer_llm/builder.py:97-107) for the supported
families.
"""

from __future__ import annotations

import json
import logging
import pathlib
from typing import Any

import numpy as np

from .. import nn, utils

logger = logging.getLogger(__name__)


def read_hf_state_dict(checkpoint_dir: str) -> dict[str, np.ndarray]:
    """Read all safetensors shards (or pytorch_model.bin) in a local HF
    snapshot directory."""
    d = pathlib.Path(checkpoint_dir)
    sd: dict[str, np.ndarray] = {}
    shards = sorted(d.glob("*.safetensors"))
    if shards:
        for shard in shards:
            sd.update(utils.load_state_dict_safetensors(str(shard)))
        return sd
    bins = sorted(d.glob("pytorch_model*.bin"))
    if bins:
        for b in bins:
            sd.update(utils.load_state_dict_pt(str(b)))
        return sd
    raise FileNotFoundError(f"No checkpoint shards found in {checkpoint_dir}")


def load_into_causal_lm(model: nn.Module, checkpoint_dir: str) -> nn.Module:
    sd = read_hf_state_dict(checkpoint_dir)
    # rotary_emb buffers etc. may exist; load non-strict but log misses
    model2 = utils.load_state_dict(model, sd, strict=False)
    # keys-only walk: state_dict() would device_get + transpose every
    # parameter (16 GB host traffic on an 8B model) just for this audit
    own = utils.statedict.state_dict_keys(model)
    missing = own - set(sd.keys())
    if missing:
        logger.warning(f"Keys missing from checkpoint: {sorted(missing)[:10]}...")
    return model2


def read_hf_config(checkpoint_dir: str) -> dict[str, Any]:
    with open(pathlib.Path(checkpoint_dir) / "config.json") as f:
        return json.load(f)
