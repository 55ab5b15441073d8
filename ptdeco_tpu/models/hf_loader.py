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


def load_into_causal_lm(
    model: nn.Module, checkpoint_dir: str, key_translator: Any = None
) -> nn.Module:
    sd = read_hf_state_dict(checkpoint_dir)
    if key_translator is not None:
        # checkpoint-layout translation (e.g. phi3's fused projections
        # via split_phi3_fused_projections)
        sd = key_translator(sd)
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


def translate_mixtral_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """Translate the HF Mixtral checkpoint layout into the qwen3_moe-style
    layout the native MoEMLP uses: ``block_sparse_moe`` -> ``mlp`` and the
    Megablocks-era expert names ``w1/w3/w2`` -> ``gate_proj/up_proj/
    down_proj`` (w1 gates, w3 is the up projection, w2 projects down —
    HF MixtralBlockSparseTop2MLP).  The router ``block_sparse_moe.gate``
    becomes ``mlp.gate`` unchanged; every other key passes through."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if ".block_sparse_moe." in k:
            k = k.replace(".block_sparse_moe.", ".mlp.")
            for old, new in (
                (".w1.", ".gate_proj."),
                (".w3.", ".up_proj."),
                (".w2.", ".down_proj."),
            ):
                if old in k:
                    k = k.replace(old, new)
                    break
        out[k] = v
    return out


def translate_glm4_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """Translate the HF Glm4 checkpoint layout into this decoder's gemma2
    sandwich naming (the block wiring is identical, HF Glm4DecoderLayer):

    * ``post_self_attn_layernorm``  (norm on the attention OUTPUT)
      -> ``post_attention_layernorm`` (our post-attn sandwich slot)
    * ``post_attention_layernorm``  (glm4's PRE-MLP norm)
      -> ``pre_feedforward_layernorm``
    * ``post_mlp_layernorm`` -> ``post_feedforward_layernorm``
    * ``mlp.gate_up_proj`` splits into gate/up (the phi3 fused layout,
      Glm4MLP chunks it in halves the same way)

    Each key matches at most one rule, so ordering cannot collide the two
    post_* names."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if ".post_self_attn_layernorm." in k:
            out[k.replace(".post_self_attn_layernorm.",
                          ".post_attention_layernorm.")] = v
        elif ".post_attention_layernorm." in k:
            out[k.replace(".post_attention_layernorm.",
                          ".pre_feedforward_layernorm.")] = v
        elif ".post_mlp_layernorm." in k:
            out[k.replace(".post_mlp_layernorm.",
                          ".post_feedforward_layernorm.")] = v
        elif k.endswith(".mlp.gate_up_proj.weight"):
            stem = k[: -len("gate_up_proj.weight")]
            half = v.shape[0] // 2
            out[stem + "gate_proj.weight"] = v[:half]
            out[stem + "up_proj.weight"] = v[half:]
        else:
            out[k] = v
    return out


def translate_deepseek_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """Translate the HF Deepseek V2/V3 checkpoint layout: the ungated
    always-on expert block is ``mlp.shared_experts`` (plural) -> our
    qwen2_moe-named ``mlp.shared_expert`` slot, and the v3 router's
    selection bias buffer ``mlp.gate.e_score_correction_bias`` -> the
    ``mlp.gate_correction_bias`` leaf (our router gate is a plain Linear
    that cannot carry a non-weight buffer).  Everything else (MLA
    projections, experts.N.*) matches field-for-field."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if ".mlp.shared_experts." in k:
            out[k.replace(".mlp.shared_experts.", ".mlp.shared_expert.")] = v
        elif k.endswith(".mlp.gate.e_score_correction_bias"):
            out[
                k.replace(
                    ".mlp.gate.e_score_correction_bias",
                    ".mlp.gate_correction_bias",
                )
            ] = v
        else:
            out[k] = v
    return out


def translate_gpt_oss_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """Translate the HF GptOss checkpoint layout into per-expert Linears:

    * ``mlp.router.{weight,bias}`` -> ``mlp.gate.{weight,bias}``
    * ``mlp.experts.gate_up_proj``  (E, d, 2h) with gate/up INTERLEAVED in
      the last dim (HF GptOssExperts: gate = [..., ::2], up = [..., 1::2])
      -> per-expert ``experts.N.gate_proj.weight`` / ``up_proj.weight`` in
      torch (out, in) layout, plus the matching de-interleaved biases
    * ``mlp.experts.down_proj`` (E, h, d) + bias -> per-expert
      ``experts.N.down_proj.{weight,bias}``
    * ``self_attn.sinks`` passes through (a bare leaf on Attention)
    """
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if ".mlp.router." in k:
            out[k.replace(".mlp.router.", ".mlp.gate.")] = v
        elif k.endswith(".mlp.experts.gate_up_proj"):
            stem = k[: -len("gate_up_proj")]
            for e in range(v.shape[0]):
                out[f"{stem}{e}.gate_proj.weight"] = np.ascontiguousarray(
                    v[e][:, 0::2].T
                )
                out[f"{stem}{e}.up_proj.weight"] = np.ascontiguousarray(
                    v[e][:, 1::2].T
                )
        elif k.endswith(".mlp.experts.gate_up_proj_bias"):
            stem = k[: -len("gate_up_proj_bias")]
            for e in range(v.shape[0]):
                out[f"{stem}{e}.gate_proj.bias"] = np.ascontiguousarray(
                    v[e][0::2]
                )
                out[f"{stem}{e}.up_proj.bias"] = np.ascontiguousarray(
                    v[e][1::2]
                )
        elif k.endswith(".mlp.experts.down_proj"):
            stem = k[: -len("down_proj")]
            for e in range(v.shape[0]):
                out[f"{stem}{e}.down_proj.weight"] = np.ascontiguousarray(
                    v[e].T
                )
        elif k.endswith(".mlp.experts.down_proj_bias"):
            stem = k[: -len("down_proj_bias")]
            for e in range(v.shape[0]):
                out[f"{stem}{e}.down_proj.bias"] = np.ascontiguousarray(v[e])
        else:
            out[k] = v
    return out


def split_phi3_fused_projections(
    sd: dict[str, np.ndarray], n_heads: int, n_kv_heads: int, head_dim: int
) -> dict[str, np.ndarray]:
    """Translate the phi3 fused-projection layout into the per-projection
    llama layout this decoder uses: ``self_attn.qkv_proj.weight``
    ((q+k+v), dim torch layout) splits into q/k/v_proj, and
    ``mlp.gate_up_proj.weight`` ((2*hidden), dim) into gate/up_proj.
    Every other key passes through unchanged."""
    out: dict[str, np.ndarray] = {}
    q_rows = n_heads * head_dim
    kv_rows = n_kv_heads * head_dim
    for k, v in sd.items():
        if k.endswith(".self_attn.qkv_proj.weight"):
            stem = k[: -len("qkv_proj.weight")]
            out[stem + "q_proj.weight"] = v[:q_rows]
            out[stem + "k_proj.weight"] = v[q_rows : q_rows + kv_rows]
            out[stem + "v_proj.weight"] = v[q_rows + kv_rows :]
        elif k.endswith(".mlp.gate_up_proj.weight"):
            stem = k[: -len("gate_up_proj.weight")]
            half = v.shape[0] // 2
            out[stem + "gate_proj.weight"] = v[:half]
            out[stem + "up_proj.weight"] = v[half:]
        else:
            out[k] = v
    return out
