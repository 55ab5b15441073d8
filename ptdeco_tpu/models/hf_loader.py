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


def translate_glm_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF Glm (glm-4 chat generation, GlmDecoderLayer): a standard
    two-norm pre-norm llama block — only the fused ``mlp.gate_up_proj``
    (chunked in halves, GlmMLP.forward) needs splitting."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.endswith(".mlp.gate_up_proj.weight"):
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


def translate_gpt2_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """Translate the HF GPT2 checkpoint layout (reference analogue:
    consumed whole by AutoModelForCausalLM,
    /root/reference/examples/trainer_llm/builder.py:97-107).

    GPT2 stores projections as Conv1D — (in, out), the TRANSPOSE of
    torch Linear — so every projection transposes; ``attn.c_attn``
    additionally splits into thirds (q|k|v along the output dim).  Name
    map: wte/wpe -> embed_tokens/pos_embed, ln_1/ln_2 ->
    input/post_attention_layernorm, c_proj -> o_proj, mlp.c_fc/c_proj ->
    up/down_proj, ln_f -> model.norm.  The causal-mask buffers
    (attn.bias/masked_bias) and the tied lm_head are dropped."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.endswith(".attn.bias") or k.endswith(".attn.masked_bias"):
            continue
        if k == "lm_head.weight":
            continue  # tied to wte
        k = k.replace("transformer.wte.", "model.embed_tokens.")
        k = k.replace("transformer.wpe.", "model.pos_embed.")
        # openai-gpt (GPT-1) spells the same tables differently
        k = k.replace("transformer.tokens_embed.", "model.embed_tokens.")
        k = k.replace("transformer.positions_embed.", "model.pos_embed.")
        k = k.replace("transformer.ln_f.", "model.norm.")
        k = k.replace("transformer.h.", "model.layers.")
        k = k.replace(".ln_1.", ".input_layernorm.")
        k = k.replace(".ln_2.", ".post_attention_layernorm.")
        if ".attn.c_attn." in k:
            stem = k.split(".attn.c_attn.")[0] + ".self_attn."
            leaf = k.rsplit(".", 1)[1]
            w = v.T if leaf == "weight" else v  # Conv1D -> Linear layout
            third = w.shape[0] // 3
            for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
                out[f"{stem}{name}.{leaf}"] = np.ascontiguousarray(
                    w[i * third : (i + 1) * third]
                )
            continue
        if ".attn.c_proj." in k:
            k = k.replace(".attn.c_proj.", ".self_attn.o_proj.")
            if k.endswith(".weight"):
                v = np.ascontiguousarray(v.T)
        elif ".mlp.c_fc." in k:
            k = k.replace(".mlp.c_fc.", ".mlp.up_proj.")
            if k.endswith(".weight"):
                v = np.ascontiguousarray(v.T)
        elif ".mlp.c_proj." in k:
            k = k.replace(".mlp.c_proj.", ".mlp.down_proj.")
            if k.endswith(".weight"):
                v = np.ascontiguousarray(v.T)
        out[k] = v
    return out


def translate_imagegpt_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """ImageGPT shares gpt2's Conv1D layout and naming but its lm_head
    is UNTIED (vocab_size-1 outputs, no SOS row) — keep it where the
    gpt2 translator would drop it."""
    head = {k: v for k, v in sd.items() if k.startswith("lm_head.")}
    out = translate_gpt2_state_dict(
        {k: v for k, v in sd.items() if not k.startswith("lm_head.")}
    )
    out.update(head)
    return out


def make_gpt_neox_translator(hf_cfg: dict[str, Any]):
    """HF GPTNeoX fuses q/k/v PER HEAD: ``query_key_value.weight`` is
    (n_heads*3*head_dim, dim) laid out [head0: q k v][head1: q k v]...
    (GPTNeoXAttention view (..., n_heads, 3*head_dim)); splitting needs
    the head count, hence a config closure.  Remaining map: embed_in ->
    embed_tokens, attention.dense -> o_proj, dense_h_to_4h/dense_4h_to_h
    -> up/down_proj, final_layer_norm -> model.norm, embed_out ->
    lm_head."""
    n_heads = int(hf_cfg["num_attention_heads"])
    hd = int(hf_cfg["hidden_size"]) // n_heads

    def translate(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        out: dict[str, np.ndarray] = {}
        for k, v in sd.items():
            if (
                k.endswith(".attention.bias")
                or k.endswith(".attention.masked_bias")
                or k.endswith("rotary_emb.inv_freq")
            ):
                continue
            k = k.replace("gpt_neox.embed_in.", "model.embed_tokens.")
            k = k.replace("gpt_neox.final_layer_norm.", "model.norm.")
            k = k.replace("gpt_neox.layers.", "model.layers.")
            k = k.replace("embed_out.", "lm_head.")
            if ".attention.query_key_value." in k:
                stem = k.split(".attention.query_key_value.")[0] + ".self_attn."
                leaf = k.rsplit(".", 1)[1]
                w = v.reshape(n_heads, 3, hd, *v.shape[1:])
                for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
                    out[f"{stem}{name}.{leaf}"] = np.ascontiguousarray(
                        w[:, i].reshape(n_heads * hd, *v.shape[1:])
                    )
                continue
            k = k.replace(".attention.dense.", ".self_attn.o_proj.")
            k = k.replace(".mlp.dense_h_to_4h.", ".mlp.up_proj.")
            k = k.replace(".mlp.dense_4h_to_h.", ".mlp.down_proj.")
            out[k] = v
        return out

    return translate


def make_falcon_translator(hf_cfg: dict[str, Any]):
    """HF Falcon's fused ``query_key_value`` has three layouts
    (FalconAttention._split_heads): new_decoder_architecture groups
    [q x (heads/kv) | k | v] per kv head; classic multi_query appends one
    k and one v row-block after all q heads; falcon-rw interleaves per
    head like neox.  Norm names also differ per generation (ln_attn/
    ln_mlp vs input/post_attention_layernorm)."""
    n_heads = int(hf_cfg["num_attention_heads"])
    hd = int(hf_cfg["hidden_size"]) // n_heads
    new_arch = bool(hf_cfg.get("new_decoder_architecture", False))
    multi_query = bool(hf_cfg.get("multi_query", True))
    n_kv = (
        int(hf_cfg.get("num_kv_heads") or n_heads)
        if new_arch
        else (1 if multi_query else n_heads)
    )

    def split_qkv(v: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        rest = v.shape[1:]
        if new_arch:
            g = n_heads // n_kv
            w = v.reshape(n_kv, g + 2, hd, *rest)
            q = w[:, :g].reshape(n_heads * hd, *rest)
            k = w[:, g].reshape(n_kv * hd, *rest)
            val = w[:, g + 1].reshape(n_kv * hd, *rest)
        elif multi_query:
            w = v.reshape(n_heads + 2, hd, *rest)
            q = w[:n_heads].reshape(n_heads * hd, *rest)
            k = w[n_heads].reshape(hd, *rest)
            val = w[n_heads + 1].reshape(hd, *rest)
        else:
            w = v.reshape(n_heads, 3, hd, *rest)
            q = w[:, 0].reshape(n_heads * hd, *rest)
            k = w[:, 1].reshape(n_heads * hd, *rest)
            val = w[:, 2].reshape(n_heads * hd, *rest)
        return q, k, val

    def translate(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        out: dict[str, np.ndarray] = {}
        for k, v in sd.items():
            if k.endswith("rotary_emb.inv_freq"):
                continue
            k = k.replace("transformer.word_embeddings.", "model.embed_tokens.")
            k = k.replace("transformer.ln_f.", "model.norm.")
            k = k.replace("transformer.h.", "model.layers.")
            k = k.replace(".ln_attn.", ".input_layernorm.")
            k = k.replace(".ln_mlp.", ".post_attention_layernorm.")
            if ".self_attention.query_key_value." in k:
                stem = (
                    k.split(".self_attention.query_key_value.")[0]
                    + ".self_attn."
                )
                leaf = k.rsplit(".", 1)[1]
                q, key, val = split_qkv(v)
                out[f"{stem}q_proj.{leaf}"] = np.ascontiguousarray(q)
                out[f"{stem}k_proj.{leaf}"] = np.ascontiguousarray(key)
                out[f"{stem}v_proj.{leaf}"] = np.ascontiguousarray(val)
                continue
            k = k.replace(".self_attention.dense.", ".self_attn.o_proj.")
            k = k.replace(".mlp.dense_h_to_4h.", ".mlp.up_proj.")
            k = k.replace(".mlp.dense_4h_to_h.", ".mlp.down_proj.")
            out[k] = v
        return out

    return translate


def translate_starcoder2_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """Starcoder2 matches the llama layout except the non-gated MLP names
    (mlp.c_fc -> up_proj, mlp.c_proj -> down_proj)."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        k = k.replace(".mlp.c_fc.", ".mlp.up_proj.")
        k = k.replace(".mlp.c_proj.", ".mlp.down_proj.")
        out[k] = v
    return out


def translate_gptj_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF GPTJ layout: plain renames (separate unfused projections) —
    ln_1 -> input_layernorm (the single one_norm), attn.out_proj ->
    o_proj, mlp.fc_in/fc_out -> up/down_proj; causal-mask buffers
    dropped; the biased lm_head passes through."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.endswith(".attn.bias") or k.endswith(".attn.masked_bias"):
            continue
        k = k.replace("transformer.wte.", "model.embed_tokens.")
        k = k.replace("transformer.ln_f.", "model.norm.")
        k = k.replace("transformer.h.", "model.layers.")
        k = k.replace(".ln_1.", ".input_layernorm.")
        k = k.replace(".attn.q_proj.", ".self_attn.q_proj.")
        k = k.replace(".attn.k_proj.", ".self_attn.k_proj.")
        k = k.replace(".attn.v_proj.", ".self_attn.v_proj.")
        k = k.replace(".attn.out_proj.", ".self_attn.o_proj.")
        k = k.replace(".mlp.fc_in.", ".mlp.up_proj.")
        k = k.replace(".mlp.fc_out.", ".mlp.down_proj.")
        out[k] = v
    return out


def translate_opt_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF OPT layout.  ``embed_positions`` carries torch's legacy +2
    offset rows (OPTLearnedPositionalEmbedding adds 2 to every index) —
    the first two rows are DROPPED so the native absolute arange indexes
    the same vectors.  Per-layer ``final_layer_norm`` (the pre-MLP norm)
    maps to post_attention_layernorm; the decoder-level one to
    model.norm."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k == "lm_head.weight":
            continue  # tied
        k = k.replace("model.decoder.embed_tokens.", "model.embed_tokens.")
        if k.startswith("model.decoder.embed_positions."):
            out[
                k.replace("model.decoder.embed_positions.", "model.pos_embed.")
            ] = v[2:]
            continue
        k = k.replace("model.decoder.final_layer_norm.", "model.norm.")
        k = k.replace("model.decoder.layers.", "model.layers.")
        k = k.replace(".self_attn.out_proj.", ".self_attn.o_proj.")
        k = k.replace(".self_attn_layer_norm.", ".input_layernorm.")
        k = k.replace(".final_layer_norm.", ".post_attention_layernorm.")
        k = k.replace(".fc1.", ".mlp.up_proj.")
        k = k.replace(".fc2.", ".mlp.down_proj.")
        out[k] = v
    return out


def make_bloom_translator(hf_cfg: dict[str, Any]):
    """HF Bloom layout: word_embeddings(+_layernorm) -> model.embed_tokens
    / model.embed_norm, h.N -> model.layers.N, self_attention.dense ->
    o_proj, dense_h_to_4h/dense_4h_to_h -> up/down_proj, ln_f ->
    model.norm.  ``self_attention.query_key_value`` fuses q/k/v PER HEAD
    ((n_heads, 3, head_dim) view, BloomAttention._reshape) — same split
    as gpt_neox."""
    n_heads = int(
        hf_cfg.get("n_head", hf_cfg.get("num_attention_heads", 0))
    )
    dim = int(hf_cfg.get("hidden_size", hf_cfg.get("n_embed", 0)))
    hd = dim // n_heads

    def translate(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        out: dict[str, np.ndarray] = {}
        for k, v in sd.items():
            if k == "lm_head.weight":
                continue  # tied
            k = k.replace(
                "transformer.word_embeddings_layernorm.", "model.embed_norm."
            )
            k = k.replace("transformer.word_embeddings.", "model.embed_tokens.")
            k = k.replace("transformer.ln_f.", "model.norm.")
            k = k.replace("transformer.h.", "model.layers.")
            if ".self_attention.query_key_value." in k:
                stem = (
                    k.split(".self_attention.query_key_value.")[0]
                    + ".self_attn."
                )
                leaf = k.rsplit(".", 1)[1]
                w = v.reshape(n_heads, 3, hd, *v.shape[1:])
                for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
                    out[f"{stem}{name}.{leaf}"] = np.ascontiguousarray(
                        w[:, i].reshape(n_heads * hd, *v.shape[1:])
                    )
                continue
            k = k.replace(".self_attention.dense.", ".self_attn.o_proj.")
            k = k.replace(".mlp.dense_h_to_4h.", ".mlp.up_proj.")
            k = k.replace(".mlp.dense_4h_to_h.", ".mlp.down_proj.")
            out[k] = v
        return out

    return translate


def make_mpt_translator(hf_cfg: dict[str, Any]):
    """HF MPT layout: wte -> embed_tokens, blocks.N.norm_1/norm_2 ->
    input/post_attention_layernorm, attn.out_proj -> o_proj,
    ffn.up_proj/down_proj pass through, norm_f -> model.norm.
    ``attn.Wqkv`` is a straight [q | k | v] stack (MptAttention splits
    [d_model, kv_dim, kv_dim]) — cut by the config's kv head count."""
    dim = int(hf_cfg["d_model"])
    n_heads = int(hf_cfg["n_heads"])
    kv_heads = int(hf_cfg.get("attn_config", {}).get("kv_n_heads", n_heads))
    kv_dim = (dim // n_heads) * kv_heads

    def translate(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        out: dict[str, np.ndarray] = {}
        for k, v in sd.items():
            if k == "lm_head.weight":
                continue  # tied (mpt always ties)
            k = k.replace("transformer.wte.", "model.embed_tokens.")
            k = k.replace("transformer.norm_f.", "model.norm.")
            k = k.replace("transformer.blocks.", "model.layers.")
            k = k.replace(".norm_1.", ".input_layernorm.")
            k = k.replace(".norm_2.", ".post_attention_layernorm.")
            if ".attn.Wqkv." in k:
                stem = k.split(".attn.Wqkv.")[0] + ".self_attn."
                leaf = k.rsplit(".", 1)[1]
                cuts = (dim, dim + kv_dim)
                for name, part in zip(
                    ("q_proj", "k_proj", "v_proj"),
                    (v[: cuts[0]], v[cuts[0] : cuts[1]], v[cuts[1] :]),
                ):
                    out[f"{stem}{name}.{leaf}"] = np.ascontiguousarray(part)
                continue
            k = k.replace(".attn.out_proj.", ".self_attn.o_proj.")
            k = k.replace(".ffn.up_proj.", ".mlp.up_proj.")
            k = k.replace(".ffn.down_proj.", ".mlp.down_proj.")
            out[k] = v
        return out

    return translate


def make_gpt_bigcode_translator(hf_cfg: dict[str, Any]):
    """HF GPTBigCode (starcoder1) layout: gpt2 names but plain Linear
    modules (no Conv1D transpose) and a multi-query fused ``c_attn``
    packing [q (dim) | k (head_dim) | v (head_dim)] rows, split onto
    q/k/v_proj with the single shared kv head."""
    dim = int(hf_cfg["n_embd"])
    hd = dim // int(hf_cfg["n_head"])

    def translate(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        out: dict[str, np.ndarray] = {}
        for k, v in sd.items():
            if k.endswith(".attn.bias") or k.endswith(".attn.masked_bias"):
                continue
            if k == "lm_head.weight":
                continue  # tied
            k = k.replace("transformer.wte.", "model.embed_tokens.")
            k = k.replace("transformer.wpe.", "model.pos_embed.")
            k = k.replace("transformer.ln_f.", "model.norm.")
            k = k.replace("transformer.h.", "model.layers.")
            k = k.replace(".ln_1.", ".input_layernorm.")
            k = k.replace(".ln_2.", ".post_attention_layernorm.")
            if ".attn.c_attn." in k:
                stem = k.split(".attn.c_attn.")[0] + ".self_attn."
                leaf = k.rsplit(".", 1)[1]
                for name, part in zip(
                    ("q_proj", "k_proj", "v_proj"),
                    (v[:dim], v[dim : dim + hd], v[dim + hd :]),
                ):
                    out[f"{stem}{name}.{leaf}"] = np.ascontiguousarray(part)
                continue
            k = k.replace(".attn.c_proj.", ".self_attn.o_proj.")
            k = k.replace(".mlp.c_fc.", ".mlp.up_proj.")
            k = k.replace(".mlp.c_proj.", ".mlp.down_proj.")
            out[k] = v
        return out

    return translate


def make_persimmon_translator(hf_cfg: dict[str, Any]):
    """HF Persimmon fuses q/k/v per head exactly like gpt_neox
    (PersimmonAttention._split_heads views (..., n_heads, 3, head_dim)).
    Remaining map: self_attn.dense -> o_proj, q/k_layernorm -> q/k_norm,
    dense_h_to_4h/dense_4h_to_h -> up/down_proj, final_layernorm ->
    model.norm."""
    n_heads = int(hf_cfg["num_attention_heads"])
    hd = int(hf_cfg["hidden_size"]) // n_heads

    def translate(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        out: dict[str, np.ndarray] = {}
        for k, v in sd.items():
            if k.endswith("rotary_emb.inv_freq"):
                continue
            k = k.replace("model.final_layernorm.", "model.norm.")
            if ".self_attn.query_key_value." in k:
                stem = k.split(".query_key_value.")[0] + "."
                leaf = k.rsplit(".", 1)[1]
                w = v.reshape(n_heads, 3, hd, *v.shape[1:])
                for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
                    out[f"{stem}{name}.{leaf}"] = np.ascontiguousarray(
                        w[:, i].reshape(n_heads * hd, *v.shape[1:])
                    )
                continue
            k = k.replace(".self_attn.dense.", ".self_attn.o_proj.")
            k = k.replace(".self_attn.q_layernorm.", ".self_attn.q_norm.")
            k = k.replace(".self_attn.k_layernorm.", ".self_attn.k_norm.")
            k = k.replace(".mlp.dense_h_to_4h.", ".mlp.up_proj.")
            k = k.replace(".mlp.dense_4h_to_h.", ".mlp.down_proj.")
            out[k] = v
        return out

    return translate


def make_dbrx_translator(hf_cfg: dict[str, Any]):
    """HF Dbrx layout -> native: transformer.wte/norm_f -> model
    embed_tokens/norm, blocks.N.norm_attn_norm.{norm_1,norm_2} ->
    input/post_attention_layernorm, the fused ``Wqkv`` split
    [q (d rows) | k (kv*hd) | v (kv*hd)] (DbrxAttention.forward), and the
    fused expert tensors ``ffn.experts.mlp.{w1,v1,w2}`` of shape
    (E*ffn_hidden, d) chunked per expert onto
    ``mlp.experts.E.{gate_proj,up_proj,down_proj}`` — w2 chunks transpose
    because DbrxExpertGLU right-multiplies (h @ w2[e]) while Linear
    stores (out, in).  Router ``ffn.router.layer`` -> ``mlp.gate``."""
    d = int(hf_cfg["d_model"])
    n_heads = int(hf_cfg["n_heads"])
    hd = d // n_heads
    attn = hf_cfg.get("attn_config") or {}
    ffn = hf_cfg.get("ffn_config") or {}
    kv = int(attn.get("kv_n_heads", 1))
    n_exp = int(ffn["moe_num_experts"])
    ffn_h = int(ffn["ffn_hidden_size"])

    def translate(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        out: dict[str, np.ndarray] = {}
        for k, v in sd.items():
            k = k.replace("transformer.wte.", "model.embed_tokens.")
            k = k.replace("transformer.norm_f.", "model.norm.")
            k = k.replace("transformer.blocks.", "model.layers.")
            k = k.replace(".norm_attn_norm.norm_1.", ".input_layernorm.")
            k = k.replace(
                ".norm_attn_norm.norm_2.", ".post_attention_layernorm."
            )
            if ".norm_attn_norm.attn.Wqkv." in k:
                stem = (
                    k.split(".norm_attn_norm.attn.Wqkv.")[0] + ".self_attn."
                )
                leaf = k.rsplit(".", 1)[1]
                q, kk, vv = np.split(v, [d, d + kv * hd], axis=0)
                for name, w in (("q_proj", q), ("k_proj", kk), ("v_proj", vv)):
                    out[f"{stem}{name}.{leaf}"] = np.ascontiguousarray(w)
                continue
            k = k.replace(".norm_attn_norm.attn.out_proj.", ".self_attn.o_proj.")
            k = k.replace(".ffn.router.layer.", ".mlp.gate.")
            if ".ffn.experts.mlp." in k:
                stem, which = k.split(".ffn.experts.mlp.")
                w = v.reshape(n_exp, ffn_h, d)
                for e in range(n_exp):
                    if which == "w2":
                        out[f"{stem}.mlp.experts.{e}.down_proj.weight"] = (
                            np.ascontiguousarray(w[e].T)
                        )
                    else:
                        name = "gate_proj" if which == "w1" else "up_proj"
                        out[f"{stem}.mlp.experts.{e}.{name}.weight"] = (
                            np.ascontiguousarray(w[e])
                        )
                continue
            out[k] = v
        return out

    return translate


def make_granitemoe_translator(hf_cfg: dict[str, Any]):
    """HF GraniteMoe: block_sparse_moe holds megablocks-format fused
    expert tensors — input_linear.weight (E, 2*ffn, d) whose output is
    chunked [gate | up] (GraniteMoeMoE.forward: act(chunk0)*chunk1), and
    output_linear.weight (E, d, ffn) already in Linear (out, in) format.
    Split per expert onto mlp.experts.E.{gate_proj,up_proj,down_proj};
    router.layer -> mlp.gate."""
    ffn_h = int(hf_cfg["intermediate_size"])

    shared_h = int(hf_cfg.get("shared_intermediate_size") or 0)

    def translate(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        out: dict[str, np.ndarray] = {}
        for k, v in sd.items():
            if ".block_sparse_moe.router.layer." in k:
                out[
                    k.replace(".block_sparse_moe.router.layer.", ".mlp.gate.")
                ] = v
                continue
            if ".shared_mlp.input_linear.weight" in k:
                # granitemoeshared: fused (2*shared_ffn, d), chunk
                # [gate | up] (GraniteMoeSharedMLP.forward)
                stem = k.split(".shared_mlp.")[0]
                out[f"{stem}.mlp.shared_expert.gate_proj.weight"] = (
                    np.ascontiguousarray(v[:shared_h])
                )
                out[f"{stem}.mlp.shared_expert.up_proj.weight"] = (
                    np.ascontiguousarray(v[shared_h:])
                )
                continue
            if ".shared_mlp.output_linear.weight" in k:
                stem = k.split(".shared_mlp.")[0]
                out[f"{stem}.mlp.shared_expert.down_proj.weight"] = v
                continue
            if ".block_sparse_moe.input_linear.weight" in k:
                stem = k.split(".block_sparse_moe.")[0]
                for e in range(v.shape[0]):
                    out[f"{stem}.mlp.experts.{e}.gate_proj.weight"] = (
                        np.ascontiguousarray(v[e, :ffn_h])
                    )
                    out[f"{stem}.mlp.experts.{e}.up_proj.weight"] = (
                        np.ascontiguousarray(v[e, ffn_h:])
                    )
                continue
            if ".block_sparse_moe.output_linear.weight" in k:
                stem = k.split(".block_sparse_moe.")[0]
                for e in range(v.shape[0]):
                    out[f"{stem}.mlp.experts.{e}.down_proj.weight"] = (
                        np.ascontiguousarray(v[e])
                    )
                continue
            out[k] = v
        return out

    return translate


def translate_vaultgemma_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """VaultGemma names its PRE-MLP norm ``pre_feedforward_layernorm``
    (VaultGemmaDecoderLayer) in an otherwise standard two-norm block —
    rename onto the post_attention_layernorm slot."""
    return {
        k.replace(".pre_feedforward_layernorm.", ".post_attention_layernorm."): v
        for k, v in sd.items()
    }


def translate_apertus_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF Apertus: block norms named attention_layernorm /
    feedforward_layernorm (standard pre-norm slots) and the xIELU
    activation's learned scalars mlp.act_fn.{alpha_p,alpha_n} -> the
    mlp.act_alpha_p / act_alpha_n leaves."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        k = k.replace(".attention_layernorm.", ".input_layernorm.")
        k = k.replace(".feedforward_layernorm.", ".post_attention_layernorm.")
        k = k.replace(".mlp.act_fn.alpha_p", ".mlp.act_alpha_p")
        k = k.replace(".mlp.act_fn.alpha_n", ".mlp.act_alpha_n")
        out[k] = v
    return out


def translate_hunyuan_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF HunYuanDenseV1: per-head q/k RMSNorms named query_layernorm /
    key_layernorm -> q_norm / k_norm."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        k = k.replace(".self_attn.query_layernorm.", ".self_attn.q_norm.")
        k = k.replace(".self_attn.key_layernorm.", ".self_attn.k_norm.")
        out[k] = v
    return out


def translate_hunyuan_moe_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF HunYuanMoEV1: the dense family's query/key_layernorm renames
    plus the router weight at ``mlp.gate.wg`` -> ``mlp.gate`` and the
    always-on ``mlp.shared_mlp`` -> ``mlp.shared_expert``."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        k = k.replace(".self_attn.query_layernorm.", ".self_attn.q_norm.")
        k = k.replace(".self_attn.key_layernorm.", ".self_attn.k_norm.")
        k = k.replace(".mlp.gate.wg.", ".mlp.gate.")
        k = k.replace(".mlp.shared_mlp.", ".mlp.shared_expert.")
        out[k] = v
    return out


def translate_ernie_moe_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF Ernie4_5_Moe: ``mlp.moe_statics.e_score_correction_bias`` (shape
    (1, E)) -> the flat ``mlp.gate_correction_bias`` leaf, plural
    ``mlp.shared_experts`` -> ``mlp.shared_expert``."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.endswith(".mlp.moe_statics.e_score_correction_bias"):
            out[
                k.replace(
                    ".mlp.moe_statics.e_score_correction_bias",
                    ".mlp.gate_correction_bias",
                )
            ] = v.reshape(-1)
        elif ".mlp.shared_experts." in k:
            out[k.replace(".mlp.shared_experts.", ".mlp.shared_expert.")] = v
        else:
            out[k] = v
    return out


def translate_aria_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF AriaText: the grouped-GEMM expert tensors are stored FUSED and
    in (in, out) orientation — ``mlp.experts.fc1.weight`` (E, d, 2h)
    chunks into (projection, gate) where silu applies to the FIRST half
    (AriaGroupedExpertsMLP: silu(projection) * gate — so projection is
    our gate_proj and gate our up_proj), ``fc2.weight`` (E, h, d) is the
    down projection.  Each per-expert slice is transposed back to the
    torch (out, in) exchange layout.  ``mlp.router`` -> ``mlp.gate``,
    plural shared_experts -> shared_expert."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.endswith(".mlp.experts.fc1.weight"):
            stem = k[: -len("experts.fc1.weight")]
            h = v.shape[2] // 2
            for e in range(v.shape[0]):
                out[f"{stem}experts.{e}.gate_proj.weight"] = (
                    np.ascontiguousarray(v[e, :, :h].T)
                )
                out[f"{stem}experts.{e}.up_proj.weight"] = (
                    np.ascontiguousarray(v[e, :, h:].T)
                )
        elif k.endswith(".mlp.experts.fc2.weight"):
            stem = k[: -len("experts.fc2.weight")]
            for e in range(v.shape[0]):
                out[f"{stem}experts.{e}.down_proj.weight"] = (
                    np.ascontiguousarray(v[e].T)
                )
        elif ".mlp.shared_experts." in k:
            out[k.replace(".mlp.shared_experts.", ".mlp.shared_expert.")] = v
        elif ".mlp.router." in k:
            out[k.replace(".mlp.router.", ".mlp.gate.")] = v
        else:
            out[k] = v
    return out


def translate_xglm_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF XGLM layout (OPT-like): out_proj -> o_proj, the per-layer
    self_attn_layer_norm/final_layer_norm pre-norm pair -> input/
    post_attention_layernorm, fc1/fc2 -> up/down_proj, the decoder-level
    layer_norm -> model.norm.  Sinusoidal positions have no weight."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k == "lm_head.weight":
            continue  # tied to embed_tokens
        k = k.replace("model.layer_norm.", "model.norm.")
        k = k.replace(".self_attn.out_proj.", ".self_attn.o_proj.")
        k = k.replace(".self_attn_layer_norm.", ".input_layernorm.")
        k = k.replace(".final_layer_norm.", ".post_attention_layernorm.")
        k = k.replace(".fc1.", ".mlp.up_proj.")
        k = k.replace(".fc2.", ".mlp.down_proj.")
        out[k] = v
    return out


def make_codegen_translator(hf_cfg: dict[str, Any]):
    """HF CodeGen fuses q/k/v across mp_num=4 TP shards:
    ``attn.qkv_proj.weight`` is (3*dim, dim) laid out
    [shard0: q v k][shard1: q v k]... with local_dim = dim/4 rows per
    projection per shard (CodeGenAttention.forward's reshape + split
    ordering — note the q, VALUE, KEY order).  Concatenating each
    projection's shard slices restores contiguous head-major q/k/v.
    Remaining map: the gptj naming (ln_1 one-norm parallel block,
    fc_in/fc_out, biased lm_head)."""
    dim = int(hf_cfg["n_embd"])
    mp_num = 4
    local = dim // mp_num

    def translate(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        out: dict[str, np.ndarray] = {}
        for k, v in sd.items():
            if k.endswith(".attn.causal_mask"):
                continue
            k = k.replace("transformer.wte.", "model.embed_tokens.")
            k = k.replace("transformer.ln_f.", "model.norm.")
            k = k.replace("transformer.h.", "model.layers.")
            k = k.replace(".ln_1.", ".input_layernorm.")
            if ".attn.qkv_proj." in k:
                stem = k.split(".attn.qkv_proj.")[0] + ".self_attn."
                leaf = k.rsplit(".", 1)[1]
                w = v.reshape(mp_num, 3 * local, *v.shape[1:])
                # per-shard row order is (q, value, key)
                parts = {
                    "q_proj": w[:, :local],
                    "v_proj": w[:, local : 2 * local],
                    "k_proj": w[:, 2 * local :],
                }
                for name, p in parts.items():
                    out[f"{stem}{name}.{leaf}"] = np.ascontiguousarray(
                        p.reshape(dim, *v.shape[1:])
                    )
                continue
            k = k.replace(".attn.out_proj.", ".self_attn.o_proj.")
            k = k.replace(".mlp.fc_in.", ".mlp.up_proj.")
            k = k.replace(".mlp.fc_out.", ".mlp.down_proj.")
            out[k] = v
        return out

    return translate


def make_gpt_neox_japanese_translator(hf_cfg: dict[str, Any]):
    """HF GPTNeoXJapanese: the neox per-head-fused query_key_value split
    (heads x [q k v] x head_dim rows), ``attention.dense`` -> o_proj with
    the LAST layer's separate ``attention.dense_bias`` mapped to its
    o_proj bias and every other layer's bias ZERO-FILLED (the HF module
    only instantiates the bias on the final layer), embed_in/embed_out
    and the mlp dense_* renames."""
    n_heads = int(hf_cfg["num_attention_heads"])
    dim = int(hf_cfg["hidden_size"])
    hd = dim // n_heads
    n_layers = int(hf_cfg["num_hidden_layers"])

    def translate(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        out: dict[str, np.ndarray] = {}
        for k, v in sd.items():
            if k.endswith("rotary_emb.inv_freq"):
                continue
            k = k.replace("gpt_neox_japanese.embed_in.", "model.embed_tokens.")
            k = k.replace("gpt_neox_japanese.final_layer_norm.", "model.norm.")
            k = k.replace("gpt_neox_japanese.layers.", "model.layers.")
            k = k.replace("embed_out.", "lm_head.")
            if ".attention.query_key_value." in k:
                stem = k.split(".attention.query_key_value.")[0] + ".self_attn."
                leaf = k.rsplit(".", 1)[1]
                w = v.reshape(n_heads, 3, hd, *v.shape[1:])
                for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
                    out[f"{stem}{name}.{leaf}"] = np.ascontiguousarray(
                        w[:, i].reshape(n_heads * hd, *v.shape[1:])
                    )
                continue
            if k.endswith(".attention.dense_bias"):
                k = k.replace(".attention.dense_bias", ".self_attn.o_proj.bias")
            k = k.replace(".attention.dense.", ".self_attn.o_proj.")
            k = k.replace(".mlp.dense_h_to_4h.", ".mlp.up_proj.")
            k = k.replace(".mlp.dense_4h_to_h.", ".mlp.down_proj.")
            out[k] = v
        for i in range(n_layers):
            key = f"model.layers.{i}.self_attn.o_proj.bias"
            if key not in out:
                out[key] = np.zeros((dim,), np.float32)
        return out

    return translate


def make_modernbert_decoder_translator(hf_cfg: dict[str, Any]):
    """HF ModernBertDecoder: embeddings.tok_embeddings/norm ->
    embed_tokens/embed_norm, attn.Wo -> o_proj, the fused gated Wi
    ((input, gate) halves where the act applies to the FIRST — our
    gate_proj) split on load, mlp_norm -> post_attention_layernorm,
    attn_norm -> input_layernorm (absent on layer 0), final_norm ->
    model.norm, the lm_head dense/norm prediction head ->
    head_transform.*, and the decoder output Linear: weight dropped when
    tied, its bias -> tied_head_bias."""
    tied = bool(hf_cfg.get("tie_word_embeddings", True))

    def translate(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        out: dict[str, np.ndarray] = {}
        for k, v in sd.items():
            k = k.replace(
                "model.embeddings.tok_embeddings.", "model.embed_tokens."
            )
            k = k.replace("model.embeddings.norm.", "model.embed_norm.")
            k = k.replace("model.final_norm.", "model.norm.")
            if k.startswith("decoder."):
                leaf = k.split(".", 1)[1]
                if leaf.startswith("bias"):
                    out["tied_head_bias" if tied else "lm_head.bias"] = v
                elif not tied:
                    out["lm_head.weight"] = v
                continue  # tied decoder.weight duplicates embed_tokens
            k = k.replace("lm_head.dense.", "head_transform.dense.")
            k = k.replace("lm_head.norm.", "head_transform.norm.")
            if ".mlp.Wi." in k:
                stem, leaf = k.split(".mlp.Wi.")
                h = v.shape[0] // 2
                out[f"{stem}.mlp.gate_proj.{leaf}"] = np.ascontiguousarray(
                    v[:h]
                )
                out[f"{stem}.mlp.up_proj.{leaf}"] = np.ascontiguousarray(
                    v[h:]
                )
                continue
            k = k.replace(".mlp.Wo.", ".mlp.down_proj.")
            k = k.replace(".mlp_norm.", ".post_attention_layernorm.")
            k = k.replace(".attn_norm.", ".input_layernorm.")
            k = k.replace(".attn.Wo.", ".self_attn.o_proj.")
            k = k.replace(".attn.", ".self_attn.")
            out[k] = v
        return out

    return translate


def translate_doge_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF Doge: the dynamic-mask parameter ``self_attn.A`` -> our
    ``self_attn.dyn_mask_A`` leaf; everything else (dt_proj, q/k norms,
    input_residual / post_attention_residual) matches field-for-field."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.endswith(".self_attn.A"):
            out[k.replace(".self_attn.A", ".self_attn.dyn_mask_A")] = v
        else:
            out[k] = v
    return out


def translate_bamba_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF Bamba hybrid: the per-layer mixer lives at ``mamba`` (-> the
    native Block's self_attn slot), the MLP at ``feed_forward`` and its
    norm at ``pre_ff_layernorm``; the depthwise conv squeezes its group
    dim; ``final_layernorm`` -> model.norm."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        k = k.replace("model.final_layernorm.", "model.norm.")
        k = k.replace(".mamba.", ".self_attn.")
        k = k.replace(".feed_forward.", ".mlp.")
        k = k.replace(".pre_ff_layernorm.", ".post_attention_layernorm.")
        if k.endswith(".conv1d.weight") and v.ndim == 3:
            v = np.ascontiguousarray(v[:, 0, :])
        out[k] = v
    return out


def make_granitemoehybrid_translator(hf_cfg: dict[str, Any]):
    """GraniteMoeHybrid = the granitemoe fused-expert splits plus the
    bamba-style mamba -> self_attn rename and conv group-dim squeeze."""
    base = make_granitemoe_translator(hf_cfg)

    def translate(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        out: dict[str, np.ndarray] = {}
        for k, v in sd.items():
            k = k.replace(".mamba.", ".self_attn.")
            if k.endswith(".conv1d.weight") and v.ndim == 3:
                v = np.ascontiguousarray(v[:, 0, :])
            out[k] = v
        return base(out)

    return translate


def translate_jamba_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF Jamba hybrid: per-layer mixer at ``mamba`` -> self_attn slot
    (incl. the affine dt/b/c stream norms), ``feed_forward`` is either a
    dense MLP or a sparse block whose ``router`` -> mlp.gate,
    ``pre_ff_layernorm`` -> post_attention_layernorm, ``final_layernorm``
    -> model.norm, conv group dim squeezed."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        k = k.replace("model.final_layernorm.", "model.norm.")
        k = k.replace(".mamba.", ".self_attn.")
        k = k.replace(".feed_forward.router.", ".mlp.gate.")
        k = k.replace(".feed_forward.", ".mlp.")
        k = k.replace(".pre_ff_layernorm.", ".post_attention_layernorm.")
        if k.endswith(".conv1d.weight") and v.ndim == 3:
            v = np.ascontiguousarray(v[:, 0, :])
        out[k] = v
    return out


def make_falcon_h1_translator(hf_cfg: dict[str, Any]):
    """FalconH1: fold the seven per-module mup multipliers into the
    checkpoint weights (exact — each scales a linear map's input or
    output):

    * attention_in_multiplier scales the attention INPUT -> q/k/v
      weights (not biases); key_multiplier scales the projected keys ->
      k_proj weight AND bias; attention_out_multiplier scales the
      attention output -> o_proj weight and bias.
    * mlp_multipliers = (gate, down): act(gate(x)*g) folds g into
      gate_proj; y=down(.)*d folds d into down_proj weight and bias.
    * ssm_in_multiplier scales the mixer input -> in_proj weight;
      the 5-way ssm_multipliers (z, x, B, C, dt slices of the in_proj
      OUTPUT) scale the matching in_proj rows and bias rows;
      ssm_out_multiplier scales the mixer output -> out_proj weight+bias.

    Plus bamba-style renames (mamba stays 'mamba' — the parallel slot —
    but pre_ff_layernorm -> post_attention_layernorm, final_layernorm ->
    model.norm) and the conv group-dim squeeze."""
    dim = int(hf_cfg["hidden_size"])
    d_ssm = int(
        hf_cfg.get("mamba_d_ssm")
        or int(hf_cfg.get("mamba_expand", 2)) * dim
    )
    gn = int(hf_cfg.get("mamba_n_groups", 1)) * int(
        hf_cfg.get("mamba_d_state", 128)
    )
    n_heads_m = int(hf_cfg["mamba_n_heads"])
    aim = float(hf_cfg.get("attention_in_multiplier", 1.0))
    aom = float(hf_cfg.get("attention_out_multiplier", 1.0))
    km = float(hf_cfg.get("key_multiplier", 1.0))
    gm, dm = (
        float(v) for v in (hf_cfg.get("mlp_multipliers") or (1.0, 1.0))
    )
    sim = float(hf_cfg.get("ssm_in_multiplier", 1.0))
    smul = [
        float(v)
        for v in (hf_cfg.get("ssm_multipliers") or (1.0,) * 5)
    ]
    # in_proj output rows: [z (d_ssm), x (d_ssm), B (gn), C (gn), dt (H)]
    row_scale = np.concatenate(
        [
            np.full(d_ssm, smul[0]),
            np.full(d_ssm, smul[1]),
            np.full(gn, smul[2]),
            np.full(gn, smul[3]),
            np.full(n_heads_m, smul[4]),
        ]
    ).astype(np.float32)

    def translate(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        out: dict[str, np.ndarray] = {}
        for k, v in sd.items():
            k = k.replace("model.final_layernorm.", "model.norm.")
            k = k.replace(".pre_ff_layernorm.", ".post_attention_layernorm.")
            k = k.replace(".feed_forward.", ".mlp.")
            if k.endswith(".conv1d.weight") and v.ndim == 3:
                v = np.ascontiguousarray(v[:, 0, :])
            if ".self_attn." in k:
                if ".q_proj.weight" in k or ".v_proj.weight" in k:
                    v = v * aim
                elif ".k_proj.weight" in k:
                    v = v * (aim * km)
                elif ".k_proj.bias" in k:
                    v = v * km
                elif ".o_proj." in k:
                    v = v * aom
            elif ".mlp.gate_proj." in k:
                v = v * gm
            elif ".mlp.down_proj." in k:
                v = v * dm
            elif ".mamba.in_proj.weight" in k:
                v = v * (row_scale[:, None] * sim)
            elif ".mamba.in_proj.bias" in k:
                v = v * row_scale
            elif ".mamba.out_proj." in k:
                v = v * float(hf_cfg.get("ssm_out_multiplier", 1.0))
            out[k] = v.astype(np.float32) if v.dtype == np.float64 else v
        return out

    return translate


def translate_llama4_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF Llama4 text: ``feed_forward`` -> ``mlp``; the MoE's fused
    (in, out)-oriented expert tensors split per expert —
    ``experts.gate_up_proj`` (E, d, 2h) chunks into (gate, up) and
    ``experts.down_proj`` (E, h, d) — each slice transposed back to the
    torch (out, in) exchange layout; ``router`` -> ``gate``; the
    language_model prefix (multimodal checkpoints) is stripped."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.startswith("language_model."):
            k = k[len("language_model."):]
        elif k.split(".", 1)[0] in ("vision_model", "multi_modal_projector"):
            continue
        k = k.replace(".feed_forward.", ".mlp.")
        if k.endswith(".mlp.experts.gate_up_proj"):
            stem = k[: -len("experts.gate_up_proj")]
            h = v.shape[2] // 2
            for e in range(v.shape[0]):
                out[f"{stem}experts.{e}.gate_proj.weight"] = (
                    np.ascontiguousarray(v[e, :, :h].T)
                )
                out[f"{stem}experts.{e}.up_proj.weight"] = (
                    np.ascontiguousarray(v[e, :, h:].T)
                )
            continue
        if k.endswith(".mlp.experts.down_proj"):
            stem = k[: -len("experts.down_proj")]
            for e in range(v.shape[0]):
                out[f"{stem}experts.{e}.down_proj.weight"] = (
                    np.ascontiguousarray(v[e].T)
                )
            continue
        k = k.replace(".mlp.router.", ".mlp.gate.")
        out[k] = v
    return out


def translate_lfm2_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF LFM2: operator_norm -> input_layernorm, ffn_norm ->
    post_attention_layernorm, the decoder-level embedding_norm (the
    FINAL norm, despite its name) -> model.norm, feed_forward w1/w3/w2
    -> gate/up/down, attention out_proj + q/k_layernorm renames, conv
    mixer at ``conv`` -> the self_attn slot with the group dim
    squeezed."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        k = k.replace("model.embedding_norm.", "model.norm.")
        k = k.replace(".operator_norm.", ".input_layernorm.")
        k = k.replace(".ffn_norm.", ".post_attention_layernorm.")
        k = k.replace(".feed_forward.w1.", ".mlp.gate_proj.")
        k = k.replace(".feed_forward.w3.", ".mlp.up_proj.")
        k = k.replace(".feed_forward.w2.", ".mlp.down_proj.")
        k = k.replace(".self_attn.out_proj.", ".self_attn.o_proj.")
        k = k.replace(".self_attn.q_layernorm.", ".self_attn.q_norm.")
        k = k.replace(".self_attn.k_layernorm.", ".self_attn.k_norm.")
        if ".conv.conv." in k:
            if k.endswith("weight") and v.ndim == 3:
                v = np.ascontiguousarray(v[:, 0, :])
            k = k.replace(".conv.", ".self_attn.", 1)
        elif ".conv." in k:  # in_proj / out_proj of the conv mixer
            k = k.replace(".conv.", ".self_attn.", 1)
        out[k] = v
    return out


def make_longcat_translator(hf_cfg: dict[str, Any]):
    """LongcatFlash: router ``classifier`` -> ``gate`` and its
    ``e_score_correction_bias`` buffer -> the flat gate_correction_bias
    leaf; the MLA lora output scales (q_b x sqrt(dim/q_lora_rank), the
    k_nope rows of kv_b x sqrt(dim/kv_lora_rank) — HF mla_scale_q_lora /
    mla_scale_kv_lora) FOLD INTO THE WEIGHTS (exact: each scales a
    linear map's output rows; the v rows stay unscaled)."""
    dim = int(hf_cfg["hidden_size"])
    q_rank = hf_cfg.get("q_lora_rank")
    kv_rank = int(hf_cfg["kv_lora_rank"])
    scale_q = (dim / q_rank) ** 0.5 if q_rank else 1.0
    # mla_scale_kv_lora multiplies the normed LATENT before kv_b_proj —
    # an input scale, so the WHOLE kv_b weight folds (k_nope and v alike)
    scale_kv = (dim / kv_rank) ** 0.5

    def translate(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        out: dict[str, np.ndarray] = {}
        for k, v in sd.items():
            if k.endswith(".mlp.router.classifier.weight"):
                k = k.replace(".mlp.router.classifier.", ".mlp.gate.")
            elif k.endswith(".mlp.router.e_score_correction_bias"):
                k = k.replace(
                    ".mlp.router.e_score_correction_bias",
                    ".mlp.gate_correction_bias",
                )
                v = v.reshape(-1)
            elif ".q_b_proj.weight" in k:
                v = v * np.float32(scale_q)
            elif ".kv_b_proj.weight" in k:
                v = v * np.float32(scale_kv)
            out[k] = v
        return out

    return translate


def translate_qwen3_next_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF Qwen3Next: the gated-DeltaNet mixer lives at ``linear_attn``
    (-> the native Block's self_attn slot; its fused qkvz/ba projections
    and per-v-head gated norm match field-for-field) with the depthwise
    conv group dim squeezed; everything else (gated q_proj, qwen3-MoE
    naming) already matches."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        k = k.replace(".linear_attn.", ".self_attn.")
        if k.endswith(".conv1d.weight") and v.ndim == 3:
            v = np.ascontiguousarray(v[:, 0, :])
        out[k] = v
    return out


def translate_recurrent_gemma_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF RecurrentGemma (Griffin): temporal_pre_norm/channel_pre_norm ->
    input/post_attention_layernorm, temporal_block -> the self_attn slot
    (attention layers' q/k/v/o names then match; recurrent layers keep
    their linear_y/linear_x/linear_out/conv_1d/rg_lru names),
    mlp_block -> mlp, final_norm -> model.norm, conv group dim
    squeezed."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        k = k.replace("model.final_norm.", "model.norm.")
        k = k.replace(".temporal_pre_norm.", ".input_layernorm.")
        k = k.replace(".channel_pre_norm.", ".post_attention_layernorm.")
        k = k.replace(".temporal_block.", ".self_attn.")
        k = k.replace(".mlp_block.", ".mlp.")
        if k.endswith(".conv_1d.weight") and v.ndim == 3:
            v = np.ascontiguousarray(v[:, 0, :])
        out[k] = v
    return out


def make_jetmoe_translator(hf_cfg: dict[str, Any]):
    """HF JetMoE: both sublayers hold STACKED per-expert tensors
    (JetMoeParallelExperts, (E, out, in) torch orientation) — the MoA's
    input/output_linear split onto self_attn.{input,output}_experts.E,
    the glu MoE's input_linear (E, 2*ffn, d) chunks into [act-side gate
    | up] halves, output_linear -> down_proj; routers at router.layer ->
    gate; the learned output biases land on self_attn.bias /
    mlp.output_bias."""
    ffn = int(hf_cfg["intermediate_size"])

    def translate(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        out: dict[str, np.ndarray] = {}
        for k, v in sd.items():
            k = k.replace(".self_attention.", ".self_attn.")
            if k.endswith(".self_attn.experts.input_linear.weight"):
                stem = k[: -len("experts.input_linear.weight")]
                for e in range(v.shape[0]):
                    out[f"{stem}input_experts.{e}.weight"] = (
                        np.ascontiguousarray(v[e])
                    )
                continue
            if k.endswith(".self_attn.experts.output_linear.weight"):
                stem = k[: -len("experts.output_linear.weight")]
                for e in range(v.shape[0]):
                    out[f"{stem}output_experts.{e}.weight"] = (
                        np.ascontiguousarray(v[e])
                    )
                continue
            if k.endswith(".self_attn.experts.bias"):
                out[k.replace(".experts.bias", ".bias")] = v
                continue
            if k.endswith(".mlp.input_linear.weight"):
                stem = k[: -len("input_linear.weight")]
                for e in range(v.shape[0]):
                    out[f"{stem}experts.{e}.gate_proj.weight"] = (
                        np.ascontiguousarray(v[e, :ffn])
                    )
                    out[f"{stem}experts.{e}.up_proj.weight"] = (
                        np.ascontiguousarray(v[e, ffn:])
                    )
                continue
            if k.endswith(".mlp.output_linear.weight"):
                stem = k[: -len("output_linear.weight")]
                for e in range(v.shape[0]):
                    out[f"{stem}experts.{e}.down_proj.weight"] = (
                        np.ascontiguousarray(v[e])
                    )
                continue
            if k.endswith(".mlp.bias"):
                out[k.replace(".mlp.bias", ".mlp.output_bias")] = v
                continue
            k = k.replace(".experts.router.layer.", ".gate.")
            k = k.replace(".router.layer.", ".gate.")
            out[k] = v
        return out

    return translate


def make_bert_decoder_translator(hf_cfg: dict[str, Any]):
    """HF BERT/RoBERTa(-clone) causal decoders: strip the body prefix
    (bert./roberta.), map the post-LN layer names (attention.self.query
    -> self_attn.q_proj, attention.output.LayerNorm -> input_layernorm
    — in post-LN it norms AFTER the attention residual — output.dense ->
    mlp.down_proj, output.LayerNorm -> post_attention_layernorm), the
    embedding pieces (token_type row 0, roberta's pad+1 position offset
    rows dropped), and the prediction head (transform.dense/LayerNorm ->
    head_transform, decoder.weight dropped when tied, its bias ->
    tied_head_bias)."""
    mt = hf_cfg.get("model_type", "bert")
    roberta_like = mt in (
        "roberta", "camembert", "xlm-roberta", "data2vec-text",
        "roberta-prelayernorm", "xlm-roberta-xl", "xmod",
    )
    prefix = {
        "data2vec-text": "data2vec_text.",
        "ernie": "ernie.",
        "electra": "electra.",
        "megatron-bert": "bert.",
        "big_bird": "bert.",
        "rembert": "rembert.",
        "roberta-prelayernorm": "roberta_prelayernorm.",
        "roformer": "roformer.",
        "roc_bert": "roc_bert.",
        "git": "git.",
    }.get(mt, "roberta." if roberta_like else "bert.")
    pad = int(hf_cfg.get("pad_token_id") or 0)
    offset = pad + 1 if roberta_like else 0
    # xmod: keep exactly one language's adapter (default_language if set)
    langs = [str(x) for x in (hf_cfg.get("languages") or [])]
    keep_lang = str(hf_cfg.get("default_language") or (langs[0] if langs else ""))
    roc_fused = mt == "roc_bert" and bool(hf_cfg.get("concat_input", True))

    def translate(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        out: dict[str, np.ndarray] = {}
        roc: dict[str, np.ndarray] = {}
        for k, v in sd.items():
            if k.startswith(prefix):
                k = "model." + k[len(prefix):]
            if k.startswith(("model.image_encoder.", "model.visual_projection.")):
                continue  # git vision tower: text-only path
            if ".adapter_modules." in k:
                lang = k.split(".adapter_modules.")[1].split(".")[0]
                if lang != keep_lang:
                    continue
                k = k.replace(
                    f".output.adapter_modules.{lang}.", ".ffn_adapter."
                )
            if mt == "roc_bert" and (
                ".map_inputs_layer." in k
                or ".shape_embed." in k
                or ".pronunciation_embed." in k
            ):
                roc[k.split(".")[-2] + "." + k.split(".")[-1]] = v
                continue
            if k == "output.weight":  # git's untied head
                out["lm_head.weight"] = v
                continue
            if k == "output.bias":
                out["lm_head.bias"] = v
                continue
            if ".pooler." in k:
                continue  # big_bird ships a pooler the LM head never runs
            if "embed_positions" in k:
                continue  # roformer's sinusoid table: computed as rotary
            if k == "model.embeddings.word_embeddings.weight":
                out["model.embed_tokens.weight"] = v
                continue
            if k == "model.embeddings.position_embeddings.weight":
                out["model.pos_embed.weight"] = v[offset:]
                continue
            if k == "model.embeddings.token_type_embeddings.weight":
                out["model.token_type_embed"] = v[0]
                continue
            k = k.replace("model.embeddings.LayerNorm.", "model.embed_norm.")
            k = k.replace("model.embeddings_project.", "model.embed_proj.")
            # rembert's input_embedding_size -> hidden projection
            k = k.replace(
                "model.encoder.embedding_hidden_mapping_in.",
                "model.embed_proj.",
            )
            # pre-LN members: megatron-bert's attention.ln / layer.ln
            # feed the sublayers; xlm-roberta-xl / roberta-prelayernorm
            # name them self_attn_layer_norm / layer.LayerNorm /
            # attention.LayerNorm / intermediate.LayerNorm, with a final
            # encoder-level norm
            k = k.replace("model.encoder.ln.", "model.norm.")
            k = k.replace("model.encoder.LayerNorm.", "model.norm.")
            k = k.replace("model.LayerNorm.", "model.norm.")
            k = k.replace("model.encoder.layer.", "model.layers.")
            k = k.replace(".attention.ln.", ".input_layernorm.")
            k = k.replace(
                ".attention.self_attn_layer_norm.", ".input_layernorm."
            )
            k = k.replace(".attention.LayerNorm.", ".input_layernorm.")
            k = k.replace(
                ".intermediate.LayerNorm.", ".post_attention_layernorm."
            )
            if mt == "megatron-bert":
                k = k.replace(".ln.", ".post_attention_layernorm.")
            if mt == "xlm-roberta-xl":
                # the layer-level LayerNorm (pre-MLP): layers.N.LayerNorm
                parts = k.split(".")
                if (
                    len(parts) >= 4
                    and parts[1] == "layers"
                    and parts[3] == "LayerNorm"
                ):
                    k = ".".join(
                        parts[:3] + ["post_attention_layernorm"] + parts[4:]
                    )
            k = k.replace(".attention.self.query.", ".self_attn.q_proj.")
            k = k.replace(".attention.self.key.", ".self_attn.k_proj.")
            k = k.replace(".attention.self.value.", ".self_attn.v_proj.")
            k = k.replace(".attention.output.dense.", ".self_attn.o_proj.")
            k = k.replace(".attention.output.LayerNorm.", ".input_layernorm.")
            k = k.replace(".intermediate.dense.", ".mlp.up_proj.")
            k = k.replace(".output.dense.", ".mlp.down_proj.")
            k = k.replace(".output.LayerNorm.", ".post_attention_layernorm.")
            # heads: bert cls.predictions.* / roberta lm_head.*
            k = k.replace(
                "cls.predictions.transform.dense.", "head_transform.dense."
            )
            k = k.replace(
                "cls.predictions.transform.LayerNorm.",
                "head_transform.norm.",
            )
            k = k.replace("lm_head.dense.", "head_transform.dense.")
            k = k.replace("lm_head.layer_norm.", "head_transform.norm.")
            # rembert's head holds dense/LayerNorm directly (no transform.)
            k = k.replace("cls.predictions.dense.", "head_transform.dense.")
            k = k.replace(
                "cls.predictions.LayerNorm.", "head_transform.norm."
            )
            k = k.replace(
                "generator_predictions.dense.", "head_transform.dense."
            )
            k = k.replace(
                "generator_predictions.LayerNorm.", "head_transform.norm."
            )
            if k in (
                "cls.predictions.decoder.weight",
                "cls.predictions.decoder.bias",
            ) and mt == "rembert":
                # rembert's decoder is genuinely untied (output width
                # differs from the input embedding width)
                out[k.replace("cls.predictions.decoder.", "lm_head.")] = v
                continue
            if k in (
                "cls.predictions.decoder.weight",
                "lm_head.decoder.weight",
                "generator_lm_head.weight",
            ):
                continue  # tied to embed_tokens
            if k in (
                "cls.predictions.decoder.bias",
                "cls.predictions.bias",
                "lm_head.decoder.bias",
                "lm_head.bias",
                "generator_lm_head.bias",
            ):
                out["tied_head_bias"] = v
                continue
            out[k] = v
        if roc_fused and "map_inputs_layer.weight" in roc:
            # fold the fused map: out = W @ cat(word, shape0, pron0) + b
            # = (W_word @ word) + const — embed_proj.weight is the word
            # slice, its bias absorbs the zero-id shape/pronunciation
            # rows (text-only inputs always index row 0)
            W = roc["map_inputs_layer.weight"]
            d = W.shape[0]
            bias = np.array(
                roc.get("map_inputs_layer.bias", np.zeros(d, W.dtype))
            )
            col = d
            if bool(hf_cfg.get("enable_shape", True)):
                s0 = roc["shape_embed.weight"][0]
                bias = bias + W[:, col : col + s0.shape[0]] @ s0
                col += s0.shape[0]
            if bool(hf_cfg.get("enable_pronunciation", True)):
                p0 = roc["pronunciation_embed.weight"][0]
                bias = bias + W[:, col : col + p0.shape[0]] @ p0
                col += p0.shape[0]
            out["model.embed_proj.weight"] = np.ascontiguousarray(W[:, :d])
            out["model.embed_proj.bias"] = bias
        return out

    return translate


def make_mamba_translator(hf_cfg: dict[str, Any]):
    """HF mamba / falcon_mamba / mamba2: squeeze the depthwise conv's
    singleton group dim ((ch, 1, k) -> (ch, k)) and drop the tied
    lm_head copy.  All other leaves (A_log, D, dt_bias, norms, the
    in/x/dt/out projections) match the native tree field-for-field."""
    tied = bool(hf_cfg.get("tie_word_embeddings", True))

    def translate(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        out: dict[str, np.ndarray] = {}
        for k, v in sd.items():
            if tied and k == "lm_head.weight":
                continue
            if k.endswith(".conv1d.weight") and v.ndim == 3:
                v = np.ascontiguousarray(v[:, 0, :])
            out[k] = v
        return out

    return translate


def make_zamba_translator(hf_cfg: dict[str, Any]):
    """HF Zamba / Zamba2 ForCausalLM: strip the ``model.`` prefix,
    flatten the hybrid layers' ``mamba_decoder`` nesting onto the layer
    itself, squeeze the depthwise conv's singleton group dim, drop the
    tied head.  The shared transformer block's tensors appear under
    every hybrid layer (upstream ties them; torch state_dict repeats
    them), so each native copy loads the same values.  Zamba2's
    PER-HYBRID-LAYER LoRA adapters on the shared gate_up (and q/k/v when
    use_shared_attention_adapter) are FOLDED into dense per-layer
    weights: W_eff(layer) = W_shared + B_p @ A_p with p the layer's
    position among hybrid layers — exact, since the adapter reads the
    same input as the base projection."""
    tied = bool(hf_cfg.get("tie_word_embeddings", True))
    v2 = hf_cfg.get("model_type") == "zamba2"
    lbt = [str(t) for t in (hf_cfg.get("layers_block_type") or ())]
    hybrid_pos = {
        layer: pos
        for pos, layer in enumerate(
            i for i, t in enumerate(lbt) if t == "hybrid"
        )
    }

    def translate(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        out: dict[str, np.ndarray] = {}
        adapters: dict[str, np.ndarray] = {}
        for k, v in sd.items():
            if k == "lm_head.weight" and tied:
                continue
            if k.startswith("model."):
                k = k[len("model."):]
            k = k.replace(".mamba_decoder.mamba.", ".mamba.")
            k = k.replace(
                ".mamba_decoder.input_layernorm.", ".input_layernorm."
            )
            k = k.replace(".shared_transformer.", ".shared_transf.")
            if "_adapter_list." in k:
                adapters[k] = v
                continue
            if k.endswith(".conv1d.weight") and v.ndim == 3:
                v = np.ascontiguousarray(v[:, 0, :])
            out[k] = v
        if v2:
            # fold adapters, then split the fused gate_up into halves
            for layer, pos in hybrid_pos.items():
                stem = f"layers.{layer}.shared_transf."
                gu = out.pop(stem + "feed_forward.gate_up_proj.weight")
                a = adapters.get(
                    stem
                    + f"feed_forward.gate_up_proj_adapter_list.{pos}.0.weight"
                )
                b = adapters.get(
                    stem
                    + f"feed_forward.gate_up_proj_adapter_list.{pos}.1.weight"
                )
                if a is not None and b is not None:
                    gu = gu + b @ a
                half = gu.shape[0] // 2
                out[stem + "feed_forward.gate_proj.weight"] = (
                    np.ascontiguousarray(gu[:half])
                )
                out[stem + "feed_forward.up_proj.weight"] = (
                    np.ascontiguousarray(gu[half:])
                )
                for name in ("q", "k", "v"):
                    a = adapters.get(
                        stem
                        + f"self_attn.linear_{name}_adapter_list.{pos}.0.weight"
                    )
                    b = adapters.get(
                        stem
                        + f"self_attn.linear_{name}_adapter_list.{pos}.1.weight"
                    )
                    if a is not None and b is not None:
                        wk = stem + f"self_attn.{name}_proj.weight"
                        out[wk] = out[wk] + b @ a
        return out

    return translate


def make_rwkv_translator(hf_cfg: dict[str, Any]):
    """HF RwkvForCausalLM: strip the ``rwkv.`` body prefix (embeddings /
    blocks.N / ln_out match the native tree field-for-field) and drop
    the tied head copy."""
    tied = bool(hf_cfg.get("tie_word_embeddings", True))

    def translate(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        out: dict[str, np.ndarray] = {}
        for k, v in sd.items():
            if k == "head.weight" and tied:
                continue
            if k.startswith("rwkv."):
                k = k[len("rwkv."):]
            out[k] = v
        return out

    return translate


def translate_gpt_neo_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF GPTNeo layout: transformer.h.N.attn.attention.{q,k,v,out}_proj
    (plain Linears, no Conv1D transpose) -> self_attn ..., ln_1/ln_2 ->
    input/post_attention_layernorm, mlp.c_fc/c_proj -> up/down_proj,
    wte/wpe -> embed_tokens/pos_embed, ln_f -> model.norm."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.endswith(".attn.bias") or k.endswith(".attn.masked_bias"):
            continue
        k = k.replace("transformer.wte.", "model.embed_tokens.")
        k = k.replace("transformer.wpe.", "model.pos_embed.")
        k = k.replace("transformer.ln_f.", "model.norm.")
        k = k.replace("transformer.h.", "model.layers.")
        k = k.replace(".ln_1.", ".input_layernorm.")
        k = k.replace(".ln_2.", ".post_attention_layernorm.")
        k = k.replace(".attn.attention.out_proj.", ".self_attn.o_proj.")
        k = k.replace(".attn.attention.", ".self_attn.")
        k = k.replace(".mlp.c_fc.", ".mlp.up_proj.")
        k = k.replace(".mlp.c_proj.", ".mlp.down_proj.")
        out[k] = v
    return out


def translate_biogpt_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF BioGpt: the OPT layout under a ``biogpt.`` prefix — learned
    positions with the legacy +2 offset rows dropped, per-layer
    self_attn_layer_norm/final_layer_norm onto the input/post slots,
    fc1/fc2 onto up/down; ``output_projection`` is the tied lm_head."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k == "output_projection.weight":
            continue  # tied
        k = k.replace("biogpt.embed_tokens.", "model.embed_tokens.")
        if k.startswith("biogpt.embed_positions."):
            out[
                k.replace("biogpt.embed_positions.", "model.pos_embed.")
            ] = v[2:]
            continue
        k = k.replace("biogpt.layer_norm.", "model.norm.")
        k = k.replace("biogpt.layers.", "model.layers.")
        k = k.replace(".self_attn.out_proj.", ".self_attn.o_proj.")
        k = k.replace(".self_attn_layer_norm.", ".input_layernorm.")
        k = k.replace(".final_layer_norm.", ".post_attention_layernorm.")
        k = k.replace(".fc1.", ".mlp.up_proj.")
        k = k.replace(".fc2.", ".mlp.down_proj.")
        out[k] = v
    return out


def translate_open_llama_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF (deprecated) open-llama: llama names plus the stable-embedding
    LayerNorm (embed_layer_norm -> embed_norm); the shared input/output
    embedding means no lm_head leaf."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k == "lm_head.weight":
            continue  # shared_input_output_embedding
        k = k.replace("model.embed_layer_norm.", "model.embed_norm.")
        out[k] = v
    return out


def make_multimodal_text_translator(hf_cfg: dict[str, Any]):
    """Multimodal wrappers whose language model is a covered family
    (gemma3 / got_ocr2 / fuyu): strip the ``model.language_model.`` (or
    fuyu's ``language_model.``) wrapper prefix, drop the vision tower /
    projector / patch-embedding weights the text path never runs, then
    apply the INNER family's layout translator (fuyu -> persimmon;
    gemma3_text / qwen2 need none)."""
    mt = hf_cfg["model_type"]
    inner_cfg = dict(hf_cfg.get("text_config") or {})
    inner_cfg.setdefault(
        "model_type",
        {"gemma3": "gemma3_text", "got_ocr2": "qwen2",
         "fuyu": "persimmon"}[mt],
    )
    inner = translator_for(inner_cfg)
    tied = bool(inner_cfg.get("tie_word_embeddings", mt == "gemma3"))
    drop = (
        "model.vision_tower.",
        "model.multi_modal_projector.",
        "model.vision_embed_tokens.",
        "vision_embed_tokens.",
    )

    def translate(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        out: dict[str, np.ndarray] = {}
        for k, v in sd.items():
            if any(k.startswith(d) for d in drop):
                continue
            if k == "lm_head.weight" and tied:
                continue
            k = k.replace("model.language_model.", "model.")
            # fuyu nests the persimmon model one level shallower
            if k.startswith("language_model."):
                k = k[len("language_model."):]
            out[k] = v
        return inner(out) if inner is not None else out

    return translate


def translate_moshi_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF MoshiForCausalLM: unwrap the MoshiFlexibleLinear-compatible
    ``.linear`` nesting on the attention projections, split the fused
    gating fc1 into [gate | up] halves, fc2 -> down_proj; the depth
    decoder / audio encoder of full Moshi checkpoints are dropped."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.startswith(("depth_decoder.", "audio_encoder.")):
            continue
        k = k.replace(".self_attn.q_proj.linear.", ".self_attn.q_proj.")
        k = k.replace(".self_attn.k_proj.linear.", ".self_attn.k_proj.")
        k = k.replace(".self_attn.v_proj.linear.", ".self_attn.v_proj.")
        k = k.replace(".self_attn.o_proj.linear.", ".self_attn.o_proj.")
        if ".mlp.fc1." in k:
            half = v.shape[0] // 2
            stem = k.split(".mlp.fc1.")[0]
            leaf = k.rsplit(".", 1)[1]
            out[f"{stem}.mlp.gate_proj.{leaf}"] = np.ascontiguousarray(
                v[:half]
            )
            out[f"{stem}.mlp.up_proj.{leaf}"] = np.ascontiguousarray(
                v[half:]
            )
            continue
        k = k.replace(".mlp.fc2.", ".mlp.down_proj.")
        out[k] = v
    return out


def translate_musicgen_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF MusicgenForCausalLM / MusicgenMelodyForCausalLM: strip the
    ``model.decoder.`` wrapper (per-codebook embed_tokens.K and
    lm_heads.K keep their indices), map the bart-style layer names, drop
    the unused cross-attention and any text/audio encoder parts of full
    composite checkpoints."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if ".encoder_attn" in k or k.startswith(
            ("text_encoder.", "audio_encoder.", "enc_to_dec_proj.")
        ):
            continue
        if "embed_positions" in k:
            continue  # computed sinusoid
        k = k.replace("model.decoder.", "")
        k = k.replace("decoder.model.decoder.", "")
        k = k.replace(".self_attn.out_proj.", ".self_attn.o_proj.")
        k = k.replace(".self_attn_layer_norm.", ".input_layernorm.")
        k = k.replace(".final_layer_norm.", ".post_attention_layernorm.")
        k = k.replace(".fc1.", ".mlp.up_proj.")
        k = k.replace(".fc2.", ".mlp.down_proj.")
        out[k] = v
    return out


def make_mllama_translator(hf_cfg: dict[str, Any]):
    """HF mllama text model: strip the multimodal wrapper prefix when
    present (full mllama snapshots), drop the vision tower / projector
    and EVERY weight of the cross-attention layers (text-only mode skips
    those layers outright — SkipBlock placeholders keep the numbering)."""
    inner = dict(hf_cfg.get("text_config") or hf_cfg)
    cross = set(int(i) for i in (inner.get("cross_attention_layers") or ()))

    def translate(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        out: dict[str, np.ndarray] = {}
        for k, v in sd.items():
            if k.startswith(("vision_model.", "multi_modal_projector.")):
                continue
            k = k.replace("model.language_model.", "model.")
            if k.startswith("language_model."):
                k = k[len("language_model."):]
            parts = k.split(".")
            if (
                len(parts) > 2
                and parts[0] == "model"
                and parts[1] == "layers"
                and int(parts[2]) in cross
            ):
                continue  # cross-attention layer: skipped in text mode
            out[k] = v
        return out

    return translate


def translate_ctrl_state_dict(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF CTRL: transformer.w -> embed_tokens, h.N.multi_head_attention
    .{Wq,Wk,Wv,dense} -> self_attn.{q,k,v,o}_proj, the ffn Sequential's
    .0/.2 -> mlp.up/down_proj, layernorm1/2 -> input/post slots, the
    final transformer.layernorm -> model.norm; positions are computed
    (t2t sinusoid, no weight) and the tied lm_head keeps only its bias."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k == "lm_head.weight":
            continue  # tied to transformer.w
        if k == "lm_head.bias":
            out["tied_head_bias"] = v
            continue
        k = k.replace("transformer.w.", "model.embed_tokens.")
        k = k.replace("transformer.layernorm.", "model.norm.")
        k = k.replace("transformer.h.", "model.layers.")
        k = k.replace(".multi_head_attention.Wq.", ".self_attn.q_proj.")
        k = k.replace(".multi_head_attention.Wk.", ".self_attn.k_proj.")
        k = k.replace(".multi_head_attention.Wv.", ".self_attn.v_proj.")
        k = k.replace(".multi_head_attention.dense.", ".self_attn.o_proj.")
        k = k.replace(".layernorm1.", ".input_layernorm.")
        k = k.replace(".layernorm2.", ".post_attention_layernorm.")
        k = k.replace(".ffn.0.", ".mlp.up_proj.")
        k = k.replace(".ffn.2.", ".mlp.down_proj.")
        out[k] = v
    return out


def translate_xlm_state_dict_clm(
    sd: dict[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """HF XLM (causal=True): embeddings/position_embeddings/
    layer_norm_emb onto embed_tokens/pos_embed/embed_norm, the per-layer
    ModuleLists (attentions.N.{q,k,v,out}_lin, layer_norm1/2.N,
    ffns.N.lin1/lin2) onto the layer tree, pred_layer.proj's bias onto
    the tied matmul.  Language embeddings are dropped — the causal-LM
    forward never passes a ``langs`` tensor."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.startswith("transformer.lang_embeddings."):
            continue
        if k == "pred_layer.proj.weight":
            continue  # tied to embeddings
        if k == "pred_layer.proj.bias":
            out["tied_head_bias"] = v
            continue
        k = k.replace("transformer.embeddings.", "model.embed_tokens.")
        k = k.replace(
            "transformer.position_embeddings.", "model.pos_embed."
        )
        k = k.replace("transformer.layer_norm_emb.", "model.embed_norm.")
        for src, dst in (
            ("attentions", "self_attn"),
            ("layer_norm1", "input_layernorm"),
            ("layer_norm2", "post_attention_layernorm"),
            ("ffns", "mlp"),
        ):
            pre = f"transformer.{src}."
            if k.startswith(pre):
                layer, rest = k[len(pre):].split(".", 1)
                k = f"model.layers.{layer}.{dst}.{rest}"
                break
        k = k.replace(".self_attn.q_lin.", ".self_attn.q_proj.")
        k = k.replace(".self_attn.k_lin.", ".self_attn.k_proj.")
        k = k.replace(".self_attn.v_lin.", ".self_attn.v_proj.")
        k = k.replace(".self_attn.out_lin.", ".self_attn.o_proj.")
        k = k.replace(".mlp.lin1.", ".mlp.up_proj.")
        k = k.replace(".mlp.lin2.", ".mlp.down_proj.")
        out[k] = v
    return out


def marian_sinusoid_table(n_pos: int, dim: int) -> np.ndarray:
    """The Marian/Pegasus deterministic position table
    (MarianSinusoidalPositionalEmbedding._init_weight): tensor2tensor
    angles pos / 10000^(2*(j//2)/dim) with the sin features in the first
    half of the vector and cos in the second (NOT interleaved).  Stored
    as an ordinary embedding weight in the torch modules; synthesized
    here when a checkpoint omits it (both families list embed_positions
    under _keys_to_ignore_on_save)."""
    j = np.arange(dim)
    enc = np.arange(n_pos)[:, None] / np.power(10000.0, 2 * (j // 2) / dim)
    sentinel = dim // 2 if dim % 2 == 0 else dim // 2 + 1
    out = np.empty((n_pos, dim), np.float32)
    out[:, :sentinel] = np.sin(enc[:, 0::2])
    out[:, sentinel:] = np.cos(enc[:, 1::2])
    return out


def make_bart_decoder_translator(hf_cfg: dict[str, Any]):
    """HF bart-lineage ``*ForCausalLM`` layouts (bart / mbart / marian /
    pegasus / blenderbot / blenderbot-small / mvp / plbart / trocr /
    whisper / speech_to_text_2 / bigbird_pegasus): strip the
    ``model.decoder.`` wrapper, drop the unused cross-attention modules
    (encoder_attn / encoder_attn_layer_norm — the causal-LM forward never
    runs them), drop the legacy +2 position-offset rows where the family
    has them, map self_attn_layer_norm/final_layer_norm onto the
    input/post_attention slots (the SAME key map serves post-LN and
    pre-LN variants), fc1/fc2 onto up/down_proj, layernorm_embedding ->
    embed_norm, the decoder-level layer_norm -> model.norm, and
    synthesize the marian/pegasus sinusoid table when absent."""
    mt = hf_cfg["model_type"]
    offset2 = mt in ("bart", "mbart", "mvp", "plbart", "trocr")
    stored_sinusoid = mt in ("marian", "pegasus")
    computed = mt == "speech_to_text_2" or (
        mt == "trocr"
        and not hf_cfg.get("use_learned_position_embeddings", True)
    )
    tied = bool(hf_cfg.get("tie_word_embeddings", True))

    def translate(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        out: dict[str, np.ndarray] = {}
        for k, v in sd.items():
            if k in ("lm_head.weight", "proj_out.weight"):
                if tied:
                    continue
                out["lm_head.weight"] = v
                continue
            if ".encoder_attn" in k:
                continue  # cross-attention: unused in causal-LM mode
            k = k.replace("model.decoder.", "model.")
            if "embed_positions" in k:
                if computed:
                    continue  # deterministic, computed natively
                out["model.pos_embed.weight"] = v[2:] if offset2 else v
                continue
            # bigbird_pegasus's decoder-level `layernorm_embedding` runs
            # AFTER the last layer — it is the final norm, not an
            # embedding norm
            k = k.replace(
                "model.layernorm_embedding.",
                "model.norm." if mt == "bigbird_pegasus"
                else "model.embed_norm.",
            )
            k = k.replace("model.layer_norm.", "model.norm.")
            k = k.replace(".self_attn.out_proj.", ".self_attn.o_proj.")
            k = k.replace(".self_attn_layer_norm.", ".input_layernorm.")
            k = k.replace(".final_layer_norm.", ".post_attention_layernorm.")
            k = k.replace(".fc1.", ".mlp.up_proj.")
            k = k.replace(".fc2.", ".mlp.down_proj.")
            out[k] = v
        if stored_sinusoid and "model.pos_embed.weight" not in out:
            dim = int(hf_cfg.get("d_model") or hf_cfg["hidden_size"])
            out["model.pos_embed.weight"] = marian_sinusoid_table(
                int(hf_cfg["max_position_embeddings"]), dim
            )
        return out

    return translate


def translator_for(hf_cfg: dict[str, Any]):
    """Checkpoint-layout translator for a config dict's model_type, or
    None when the HF layout already matches the native tree field-for-
    field.  phi3 is NOT handled here (its split needs head counts AND the
    fused names collide with glm4's — the builder wires it explicitly)."""
    mt = hf_cfg.get("model_type")
    if mt in ("mixtral", "phimoe", "minimax"):
        # phimoe/minimax reuse mixtral's block_sparse_moe / w1-w3-w2
        # layout (minimax's lightning buffers are recomputed, and its
        # mixer field names match natively under the self_attn slot)
        return translate_mixtral_state_dict
    if mt == "modernbert-decoder":
        return make_modernbert_decoder_translator(hf_cfg)
    if mt == "doge":
        return translate_doge_state_dict
    if mt == "glm4":
        return translate_glm4_state_dict
    if mt == "glm":
        return translate_glm_state_dict
    if mt in ("deepseek_v2", "deepseek_v3", "glm4_moe", "dots1"):
        # glm4_moe / dots1 reuse deepseek's shared_experts + router
        # correction-bias checkpoint naming
        return translate_deepseek_state_dict
    if mt == "gpt_oss":
        return translate_gpt_oss_state_dict
    if mt in ("gpt2", "openai-gpt", "gpt-sw3"):
        return translate_gpt2_state_dict
    if mt == "imagegpt":
        return translate_imagegpt_state_dict
    if mt == "cpmant":
        from .cpmant import translate_hf_cpmant_state_dict

        return translate_hf_cpmant_state_dict
    if mt in ("prophetnet", "xlm-prophetnet"):
        from .prophetnet import translate_hf_prophetnet_state_dict

        return translate_hf_prophetnet_state_dict
    if mt == "xlnet":
        from .xlnet import translate_hf_xlnet_state_dict

        return translate_hf_xlnet_state_dict
    if mt == "transfo-xl":
        from .transfoxl import translate_hf_transfo_xl_state_dict

        return translate_hf_transfo_xl_state_dict
    if mt == "mega":
        from .mega import translate_hf_mega_state_dict

        return translate_hf_mega_state_dict
    if mt == "reformer":
        from .reformer import translate_hf_reformer_state_dict

        return translate_hf_reformer_state_dict
    if mt == "blt":
        from .blt import translate_hf_blt_state_dict

        return translate_hf_blt_state_dict
    if mt == "ctrl":
        return translate_ctrl_state_dict
    if mt == "xlm":
        return translate_xlm_state_dict_clm
    if mt == "open-llama":
        return translate_open_llama_state_dict
    if mt in ("gemma3", "got_ocr2", "fuyu"):
        return make_multimodal_text_translator(hf_cfg)
    if mt in ("mllama", "mllama_text_model"):
        return make_mllama_translator(hf_cfg)
    if mt == "moshi":
        return translate_moshi_state_dict
    if mt in (
        "musicgen",
        "musicgen_melody",
        "musicgen_decoder",
        "musicgen_melody_decoder",
    ):
        return translate_musicgen_state_dict
    if mt == "phi4_multimodal":
        # phi3 text layout + vision/audio towers to drop
        n_heads = int(hf_cfg["num_attention_heads"])
        n_kv = int(hf_cfg.get("num_key_value_heads") or n_heads)
        hd = int(hf_cfg["hidden_size"]) // n_heads

        def translate_phi4mm(sd):
            sd = {
                k: v
                for k, v in sd.items()
                if not k.startswith("model.embed_tokens_extend.")
            }
            return split_phi3_fused_projections(sd, n_heads, n_kv, hd)

        return translate_phi4mm
    if mt == "gpt_neox":
        return make_gpt_neox_translator(hf_cfg)
    if mt == "falcon":
        return make_falcon_translator(hf_cfg)
    if mt == "starcoder2":
        return translate_starcoder2_state_dict
    if mt == "gptj":
        return translate_gptj_state_dict
    if mt == "opt":
        return translate_opt_state_dict
    if mt == "bloom":
        return make_bloom_translator(hf_cfg)
    if mt == "mpt":
        return make_mpt_translator(hf_cfg)
    if mt == "gpt_bigcode":
        return make_gpt_bigcode_translator(hf_cfg)
    if mt == "persimmon":
        return make_persimmon_translator(hf_cfg)
    if mt == "dbrx":
        return make_dbrx_translator(hf_cfg)
    if mt in ("granitemoe", "granitemoeshared"):
        return make_granitemoe_translator(hf_cfg)
    if mt == "vaultgemma":
        return translate_vaultgemma_state_dict
    if mt == "apertus":
        return translate_apertus_state_dict
    if mt == "hunyuan_v1_dense":
        return translate_hunyuan_state_dict
    if mt == "hunyuan_v1_moe":
        return translate_hunyuan_moe_state_dict
    if mt == "ernie4_5_moe":
        return translate_ernie_moe_state_dict
    if mt == "aria_text":
        return translate_aria_state_dict
    if mt == "xglm":
        return translate_xglm_state_dict
    if mt == "codegen":
        return make_codegen_translator(hf_cfg)
    if mt == "gpt_neox_japanese":
        return make_gpt_neox_japanese_translator(hf_cfg)
    if mt == "gpt_neo":
        return translate_gpt_neo_state_dict
    if mt == "biogpt":
        return translate_biogpt_state_dict
    if mt in ("mamba", "falcon_mamba", "mamba2"):
        return make_mamba_translator(hf_cfg)
    if mt == "rwkv":
        return make_rwkv_translator(hf_cfg)
    if mt in ("zamba", "zamba2"):
        return make_zamba_translator(hf_cfg)
    if mt == "bamba":
        return translate_bamba_state_dict
    if mt == "granitemoehybrid":
        return make_granitemoehybrid_translator(hf_cfg)
    if mt == "jamba":
        return translate_jamba_state_dict
    if mt == "falcon_h1":
        return make_falcon_h1_translator(hf_cfg)
    if mt in ("llama4", "llama4_text"):
        return translate_llama4_state_dict
    if mt == "lfm2":
        return translate_lfm2_state_dict
    if mt == "longcat_flash":
        return make_longcat_translator(hf_cfg)
    if mt == "qwen3_next":
        return translate_qwen3_next_state_dict
    if mt == "gemma3n":
        # multimodal wrapper: the text decoder lives under
        # model.language_model.* (HF _checkpoint_conversion_mapping) with
        # vision/audio towers alongside — rename in, drop the towers.
        # A bare gemma3n_text checkpoint needs no translation.
        def translate_gemma3n_wrapper(sd):
            out = {}
            for k, v in sd.items():
                if k.startswith("model.language_model."):
                    out["model." + k[len("model.language_model."):]] = v
                elif k == "lm_head.weight":
                    out[k] = v
                # vision_tower / audio_tower / embed_vision / embed_audio
                # are dropped
            return out

        return translate_gemma3n_wrapper
    if mt == "recurrent_gemma":
        return translate_recurrent_gemma_state_dict
    if mt == "jetmoe":
        return make_jetmoe_translator(hf_cfg)
    if mt in (
        "bert",
        "roberta",
        "camembert",
        "xlm-roberta",
        "data2vec-text",
        "ernie",
        "bert-generation",
        "electra",
        "megatron-bert",
        "rembert",
        "roberta-prelayernorm",
        "xlm-roberta-xl",
        "roformer",
        "big_bird",
        "xmod",
        "roc_bert",
        "git",
    ):
        return make_bert_decoder_translator(hf_cfg)
    if mt in (
        "bart",
        "mbart",
        "marian",
        "pegasus",
        "blenderbot",
        "blenderbot-small",
        "mvp",
        "plbart",
        "trocr",
        "whisper",
        "speech_to_text_2",
        "bigbird_pegasus",
    ):
        return make_bart_decoder_translator(hf_cfg)
    return None
