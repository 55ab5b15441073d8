"""Decoder-only causal LM (Llama / TinyLlama / Qwen2 family), TPU-native.

The reference consumes HF torch models via ``AutoModelForCausalLM``
(/root/reference/examples/trainer_llm/builder.py:97-107); we implement the
architecture natively on the pytree module system so that every projection
is an ``nn.Linear`` site that dwain can decompose functionally.

Field names mirror HF ("model.layers.N.self_attn.q_proj", ...) so blacklists
and decompose_config names line up with reference LLM checkpoints, and
hf_loader.py can import HF safetensors weights by name.

TPU notes: attention runs in bf16 with f32 softmax; all shapes static;
GQA via head repetition (XLA fuses the broadcast into the matmul); RoPE
computed on the fly (no persistent cache to shard).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import nn

logger = logging.getLogger(__name__)

# Trace-time switch for the pallas flash-attention core (single-TPU bf16
# paths only; see Attention.__call__).  Benches flip this to measure the
# einsum path — flip BEFORE building a fresh jit wrapper, the value is
# read at trace time.
_FLASH_ENABLED = True

__all__ = [
    "TransformerConfig", "CausalLM", "Attention", "MLP", "MoEMLP", "Block",
    "PrunedSublayer", "prune_blocks", "MusicgenConfig", "MusicgenLM",
]


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    vocab_size: int = 32000
    dim: int = 2048
    n_layers: int = 22
    n_heads: int = 32
    n_kv_heads: int = 4
    hidden_dim: int = 5632
    norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    qkv_bias: bool = False  # True for Qwen2
    tie_embeddings: bool = False
    # gemma-family knobs (HF GemmaConfig): explicit head_dim (gemma-7b has
    # n_heads*head_dim != dim), tanh-GELU MLP, sqrt(dim) embedding scale,
    # and (1 + w) RMSNorm
    head_dim_override: Optional[int] = None
    mlp_act: str = "silu"  # "silu" | "gelu_tanh"
    scale_embeddings: bool = False
    norm_plus_one: bool = False
    # qwen3: per-head RMSNorm on q and k before RoPE.  qk_norm_type
    # "layernorm" switches the flavor to per-head LayerNorm with affine
    # and bias (persimmon/phi2's qk_layernorm)
    qk_norm: bool = False
    qk_norm_type: str = "rmsnorm"  # | "layernorm"
    # olmo2: RMSNorm over the FLAT q/k projections (all heads jointly,
    # weight shape n_heads*head_dim) instead of per-head
    qk_norm_flat: bool = False
    # olmo2: post-norm-only blocks — no input/pre-FFN norms; norms apply
    # to the attention and MLP OUTPUTS before the residual adds
    post_norm_only: bool = False
    # gemma2: sandwich norms (post-attn/pre+post-FFN), tanh softcapping of
    # attention and final logits, and a fixed query scale
    # (query_pre_attn_scalar ** -0.5 instead of head_dim ** -0.5)
    sandwich_norms: bool = False
    attn_logit_softcap: Optional[float] = None
    final_logit_softcap: Optional[float] = None
    query_scale_override: Optional[float] = None
    # llama3.1+ rope scaling (factor, low_freq, high_freq, original_len)
    rope_llama3_scaling: Optional[tuple] = None
    # Mixture-of-Experts (mixtral / qwen3_moe): n_experts > 0 replaces the
    # dense MLP with a top-k-routed MoEMLP on sparse layers.  moe_hidden_dim
    # is the per-expert FFN width (qwen3's moe_intermediate_size differs
    # from intermediate_size; mixtral reuses it).  A layer i is sparse iff
    # i not in mlp_only_layers and (i + 1) % decoder_sparse_step == 0 —
    # the HF Qwen3Moe layer-selection rule; mixtral is all-sparse
    # (step 1, empty list).
    n_experts: int = 0
    n_experts_per_tok: int = 2
    norm_topk_prob: bool = True
    moe_hidden_dim: Optional[int] = None
    mlp_only_layers: tuple = ()
    decoder_sparse_step: int = 1
    # qwen2_moe: always-on shared expert of this width, sigmoid-gated
    shared_expert_hidden_dim: Optional[int] = None
    # deepseek_v2/v3 multi-head latent attention: kv_lora_rank set
    # switches Block to MLAttention (latent-compressed KV with a decoupled
    # per-token rope head); q_lora_rank None = direct q_proj (V2-Lite)
    q_lora_rank: Optional[int] = None
    kv_lora_rank: Optional[int] = None
    qk_rope_head_dim: int = 64
    qk_nope_head_dim: int = 128
    v_head_dim: int = 128
    # deepseek yarn: softmax scale multiplier beyond qk_head^-0.5
    # (mscale^2 with mscale = 0.1*mscale_all_dim*ln(factor)+1, HF
    # DeepseekV3Attention.__init__)
    mla_softmax_scale: Optional[float] = None
    # deepseek MoE routing flavor on top of the qwen3-style fields above:
    # sigmoid scores (v3), group-limited expert choice over n_group groups
    # keeping topk_group (group score = max for v2, top-2 sum for v3's
    # noaux_tc), a selection-only correction bias (v3), and a scale on the
    # final combine weights
    router_score_func: str = "softmax"  # | "sigmoid"
    router_n_group: int = 0  # 0 = no group limiting
    router_topk_group: int = 0
    router_group_top2_sum: bool = False
    router_correction_bias: bool = False
    routed_scaling_factor: float = 1.0
    # qwen2_moe gates the shared expert by sigmoid(dim->1); deepseek's
    # shared experts are always-on ungated
    shared_expert_gated: bool = True
    # gpt_oss: per-head learned attention-sink logits, sliding-window
    # attention on the layers layer_types marks "sliding_attention",
    # biases on ALL FOUR attention projections, a router that softmaxes
    # over the top-k LOGITS (with a router bias), clamped-swiglu experts
    # with biases, and yarn rope
    attn_sinks: bool = False
    sliding_window: Optional[int] = None
    layer_types: tuple = ()
    o_proj_bias: bool = False
    router_bias: bool = False
    router_softmax_after_topk: bool = False
    moe_clamp_limit: Optional[float] = None  # 7.0 for gpt-oss
    # precomputed yarn rotary: (inv_freq tuple, attention_factor) — cos/sin
    # are scaled by attention_factor (HF _compute_yarn_parameters).  Also
    # reused for linear rope scaling (inv_freq / factor, attention factor 1)
    rope_yarn: Optional[tuple] = None
    # gemma3: sliding-attention layers run an UNSCALED local rotary at this
    # theta (HF rope_local_base_freq) while full-attention layers use
    # rope_theta with the config's rope_scaling (carried via rope_yarn)
    rope_local_theta: Optional[float] = None
    # smollm3: per-layer NoPE — rope_layers[i] == 0 disables rotary in
    # layer i (HF no_rope_layers; empty tuple = rope everywhere)
    rope_layers: tuple = ()
    # glm4: rotary over only the first head_dim*factor dims of each head,
    # with the pair-interleaved (GPT-J style) rotation convention
    rope_partial_factor: Optional[float] = None
    rope_interleaved: bool = False
    # --- beyond-llama graph knobs (gpt2 / gpt_neox / falcon / starcoder2
    # / stablelm / granite / cohere) -----------------------------------
    # LayerNorm blocks instead of RMSNorm (norm_bias = the LN offset;
    # cohere's LNs carry no bias).  norm_no_affine drops the learnable
    # affine entirely (olmo's OlmoLayerNorm); norm_plus_one on layernorm
    # is nemotron's LayerNorm1P (y * (w + 1) + b, zero-init w)
    norm_type: str = "rmsnorm"  # | "layernorm"
    norm_bias: bool = True
    norm_no_affine: bool = False
    # olmo / dbrx: clamp q/k/v projections to [-clip_qkv, clip_qkv]
    clip_qkv: Optional[float] = None
    # non-gated MLP: up_proj -> act -> down_proj, no gate_proj
    # (gpt2 c_fc/c_proj, neox/falcon dense_h_to_4h/dense_4h_to_h,
    # starcoder2 c_fc/c_proj — all translated onto up/down at load)
    mlp_gated: bool = True
    mlp_bias: bool = False
    # learned absolute position table of this many positions added to the
    # token embedding (gpt2 wpe); pairs with use_rope=False
    learned_pos: Optional[int] = None
    use_rope: bool = True
    # parallel attention+MLP residual: "two_norm" = neox/falcon-new
    # (x + attn(ln1(x)) + mlp(ln2(x))), "one_norm" = falcon-7b/cohere
    # (both branches read the SAME input_layernorm output)
    parallel_residual: str = "none"  # | "two_norm" | "one_norm"
    # granite scalar multipliers (attention_multiplier is carried by
    # query_scale_override); cohere's logit_scale also lands on
    # logit_scale (multiplies final logits)
    embedding_multiplier: Optional[float] = None
    residual_multiplier: Optional[float] = None
    logit_scale: Optional[float] = None
    # gptj: the untied lm_head carries a bias
    lm_head_bias: bool = False
    # bloom/mpt: ALiBi linear attention biases instead of any positional
    # embedding (pairs with use_rope=False, learned_pos=None)
    use_alibi: bool = False
    # bloom: LayerNorm over the token embedding before the first block
    embed_norm: bool = False
    # blenderbot-small: its DECODER applies layernorm_embedding to the
    # token embedding BEFORE the position embedding is added (unlike
    # bart and its own encoder)
    embed_norm_pre_pos: bool = False
    # bitnet: RMSNorms over the attention output (pre-o_proj, named
    # attn_sub_norm) and the MLP activation product (pre-down_proj,
    # ffn_sub_norm) — HF BitNetAttention/BitNetMLP
    sub_norms: bool = False
    # ernie4_5_moe: the top-k renormalization denominator is clamped
    # below at this value (Ernie4_5_MoeSparseMoeBlock norm_min)
    router_norm_min: float = 0.0
    # xglm: deterministic fairseq/tensor2tensor sinusoidal position
    # embedding (cat(sin, cos) halves, +2 index offset) added to the
    # scaled token embedding — no checkpoint weight.  speech_to_text_2
    # indexes at padding_idx+1 instead of the fixed 2 (fairseq
    # create_position_ids_from_input_ids with an all-ones mask)
    sinusoidal_pos: bool = False
    sinusoidal_offset: int = 2
    # ctrl computes the tensor2tensor flavor instead (angle exponent
    # 2*(i)/dim rather than fairseq's half-1 denominator)
    sinusoidal_kind: str = "fairseq"  # | "t2t"
    # diffllama: differential attention — the head pool splits into two
    # softmax groups subtracted with a learned, layer-indexed lambda over
    # paired 2*head_dim values (HF DiffLlamaAttention)
    diff_attention: bool = False
    # phimoe: eval-deterministic sparsemixer routing (sequential top-2
    # with per-step locally-masked softmax weights, no joint renorm)
    router_sparsemixer: bool = False
    router_jitter_eps: float = 0.01
    # doge: value-derived per-kv-head additive key bias exp(A*softplus(
    # dt_proj(v))); exact for seqlen <= keep_window_size (the top-k
    # dynamic masking beyond that is refused at trace time)
    dyn_mask_keep_window: Optional[int] = None
    # doge: learned per-channel vectors scaling the residual stream
    residual_scales: bool = False
    # modernbert-decoder: layer 0 carries no attention input norm
    first_layer_no_attn_norm: bool = False
    # modernbert-decoder: dense+act+norm prediction head before the
    # output projection (HF ModernBertPredictionHead); with
    # tie_embeddings + lm_head_bias a separate bias rides the tied matmul
    head_transform: bool = False
    head_transform_act: str = "gelu_exact"
    head_transform_bias: bool = False
    # hybrid SSM decoders (bamba / granitemoehybrid / jamba): layer_types
    # entries "mamba" put a Mamba mixer (sized by this ssm.MambaConfig)
    # in the attention slot; the rest of the block (norms, MLP/MoE,
    # residuals) is shared with the attention layers
    mamba: Optional[Any] = None
    # falcon_h1: EVERY layer runs a Mamba2 mixer in parallel with
    # attention (outputs summed into the residual)
    parallel_ssm: bool = False
    # llama4: affine-free per-head RMS on q/k after rope (rope layers
    # only), temperature tuning on NoPE layers ((attn_scale,
    # floor_scale)), block-diagonal chunked attention, and a router
    # whose sigmoid(top-k logit) weights scale the expert INPUTS
    qk_l2norm: bool = False
    attn_temperature_tuning: Optional[tuple] = None
    attention_chunk_size: Optional[int] = None
    router_topk_then_sigmoid: bool = False
    moe_scale_expert_input: bool = False
    # lfm2: layer_types "conv" layers run a gated short-conv mixer
    # ((kernel_length, bias) — ssm.ShortConvMixer) in the attention slot
    conv_mixer: Optional[tuple] = None
    # minimax: layer_types "linear_attention" layers run lightning
    # attention at this block size, and every layer uses the NORM-FIRST
    # scaled-residual wiring h = norm(x)*alpha + mixer(norm(x))*beta with
    # per-type (full_a, full_b, linear_a, linear_b, mlp_a, mlp_b)
    lightning_block_size: int = 256
    minimax_residual_factors: Optional[tuple] = None
    # longcat_flash: dual-sublayer blocks (two MLA attentions + two dense
    # MLPs per logical layer) with a shortcut MoE whose router also
    # scores n_zero_experts identity experts
    longcat_dual: bool = False
    n_zero_experts: int = 0
    # qwen3_next: layer_types "linear_attention" layers run the gated
    # DeltaNet ((n_k_heads, n_v_heads, head_k_dim, head_v_dim,
    # conv_kernel) — ssm.GatedDeltaNet); full-attention layers carry a
    # fused sigmoid output gate inside q_proj (attn_gate)
    gdn: Optional[tuple] = None
    attn_gate: bool = False
    # recurrent_gemma (griffin): layer_types "recurrent" layers run the
    # RG-LRU temporal block ((lru_width, conv1d_width, n_lru_heads))
    rglru: Optional[tuple] = None
    scale_embeddings_bf16: bool = False
    # jetmoe: mixture-of-attention-heads (per-expert q/out projections
    # around a shared kv) and a learned bias on the MoE output
    moa: bool = False
    moe_output_bias: bool = False
    # bert-as-decoder: true post-LN blocks (norms AFTER residual adds)
    # and a constant token-type-0 embedding row added to every position;
    # post-LN graphs carry NO final decoder norm
    post_ln: bool = False
    token_type_zero: bool = False
    final_norm: bool = True
    # electra: embeddings (word/pos/token-type/LN) live in a SMALLER
    # embedding_size and are projected to dim; the prediction head
    # projects back to embedding_size before the tied matmul
    embed_dim: Optional[int] = None
    # rembert: the prediction head projects to output_embedding_size
    # (decoupled from BOTH dim and the input embedding width) and the
    # UNTIED decoder maps that width to the vocabulary
    head_out_dim: Optional[int] = None
    # mllama: the embedding table holds vocab_size+8 rows (the <image>
    # special tokens) while the untied lm_head outputs vocab_size
    embed_vocab_size: Optional[int] = None
    # xmod: a bottleneck adapter (dense1 -> act -> dense2, residual)
    # applied to each post-LN block's OUTPUT — the single-language
    # degenerate form of its per-language adapter stack
    ffn_adapter_dim: Optional[int] = None
    # roc_bert: the embedding projection applies BEFORE the position/
    # token-type adds (its fused map_inputs_layer runs first); electra's
    # default applies it after the embedding LayerNorm
    embed_proj_pre_pos: bool = False
    # rematerialize each block's activations during backward passes
    # (jax.checkpoint) — the HBM/flops trade for large-model calibration
    # and fine-tuning (the reference toggles HF gradient checkpointing,
    # trainer_llm/builder.py:109-110)
    remat: bool = False
    dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        if self.head_dim_override is not None:
            return self.head_dim_override
        return self.dim // self.n_heads

    @staticmethod
    def from_hf_config(
        hf: dict[str, Any], dtype: Any = jnp.bfloat16, remat: bool = False
    ) -> "TransformerConfig":
        """Generic HF ``config.json`` -> native config for the llama config
        family (llama / tinyllama / mistral / qwen2 / gemma): ANY checkpoint
        in the family loads without a hand-written zoo entry or custom
        builder, narrowing the reference's AutoModelForCausalLM coverage
        delta (/root/reference/examples/trainer_llm/builder.py:97-107).
        Raises ValueError (naming the offending field) for architectures
        whose compute graph this decoder does not express."""
        mt = hf.get("model_type", "llama")
        if mt == "code_llama":
            # CodeLlama has no config class of its own — CONFIG_MAPPING
            # aliases it to LlamaConfig (rope_theta=1e6 checkpoints);
            # the graph IS the llama decoder
            mt = "llama"
        if mt == "gpt-sw3":
            # AI-Sweden's GPT-SW3 aliases GPT2Config/GPT2LMHeadModel
            mt = "gpt2"
        if mt == "llama4":
            hf = dict(hf["text_config"])
            mt = hf.get("model_type", "llama4_text")
        if mt == "emu3":
            # Emu3ForCausalLM runs entirely on its text_config (a llama
            # graph over the multimodal token vocabulary)
            hf = dict(hf["text_config"])
            mt = hf.get("model_type", "emu3_text_model")
        if mt == "phi4_multimodal":
            # the text decoder IS the phi3 graph (fused qkv/gate_up,
            # longrope); vision/audio towers live under
            # embed_tokens_extend and are dropped on load
            mt = "phi3"
        if mt in ("gemma3", "got_ocr2", "fuyu"):
            # multimodal wrappers whose language model is a covered
            # family: gemma3 -> gemma3_text, got_ocr2 -> qwen2, fuyu ->
            # persimmon.  The text path builds from text_config; the
            # vision tower/projector weights are dropped on load.
            inner = dict(hf["text_config"])
            inner.setdefault(
                "model_type",
                {"gemma3": "gemma3_text", "got_ocr2": "qwen2",
                 "fuyu": "persimmon"}[mt],
            )
            hf, mt = inner, inner["model_type"]
        # families whose graph differs from the llama decoder (LayerNorm,
        # non-gated MLPs, learned positions, parallel residual) build
        # through dedicated constructors below
        beyond_llama = {
            "gpt2": _hf_gpt2,
            "imagegpt": _hf_imagegpt,
            "gpt_neox": _hf_gpt_neox,
            "falcon": _hf_falcon,
            "starcoder2": _hf_starcoder2,
            "stablelm": _hf_stablelm,
            "granite": _hf_granite,
            "cohere": _hf_cohere,
            "gptj": _hf_gptj,
            "opt": _hf_opt,
            "bloom": _hf_bloom,
            "mpt": _hf_mpt,
            "gpt_bigcode": _hf_gpt_bigcode,
            "olmo": _hf_olmo,
            "nemotron": _hf_nemotron,
            "persimmon": _hf_persimmon,
            "dbrx": _hf_dbrx,
            "granitemoe": _hf_granitemoe,
            "granitemoeshared": _hf_granitemoe,
            "cohere2": _hf_cohere2,
            "glm4_moe": _hf_glm4_moe,
            "apertus": _hf_apertus,
            "gpt_neo": _hf_gpt_neo,
            "biogpt": _hf_biogpt,
            "hunyuan_v1_dense": _hf_hunyuan_dense,
            "dots1": _hf_dots1,
            "vaultgemma": _hf_vaultgemma,
            "exaone4": _hf_exaone4,
            "ernie4_5": _hf_ernie4_5,
            "arcee": _hf_arcee,
            "seed_oss": _hf_seed_oss,
            "bitnet": _hf_bitnet,
            "hunyuan_v1_moe": _hf_hunyuan_moe,
            "ernie4_5_moe": _hf_ernie4_5_moe,
            "aria_text": _hf_aria_text,
            "xglm": _hf_xglm,
            "codegen": _hf_codegen,
            "gpt_neox_japanese": _hf_gpt_neox_japanese,
            "diffllama": _hf_diffllama,
            "phimoe": _hf_phimoe,
            "modernbert-decoder": _hf_modernbert_decoder,
            "doge": _hf_doge,
            "bamba": _hf_bamba,
            "granitemoehybrid": _hf_granitemoehybrid,
            "jamba": _hf_jamba,
            "falcon_h1": _hf_falcon_h1,
            "llama4_text": _hf_llama4,
            "lfm2": _hf_lfm2,
            "minimax": _hf_minimax,
            "longcat_flash": _hf_longcat,
            "qwen3_next": _hf_qwen3_next,
            "recurrent_gemma": _hf_recurrent_gemma,
            "jetmoe": _hf_jetmoe,
            "bert": _hf_bert_decoder,
            "roberta": _hf_bert_decoder,
            "camembert": _hf_bert_decoder,
            "xlm-roberta": _hf_bert_decoder,
            "data2vec-text": _hf_bert_decoder,
            "ernie": _hf_bert_decoder,
            "bert-generation": _hf_bert_decoder,
            "electra": _hf_bert_decoder,
            "megatron-bert": _hf_bert_decoder,
            "rembert": _hf_bert_decoder,
            "roberta-prelayernorm": _hf_bert_decoder,
            "xlm-roberta-xl": _hf_bert_decoder,
            "roformer": _hf_bert_decoder,
            "big_bird": _hf_bert_decoder,
            "xmod": _hf_bert_decoder,
            "roc_bert": _hf_bert_decoder,
            "git": _hf_bert_decoder,
            "openai-gpt": _hf_openai_gpt,
            "ctrl": _hf_ctrl,
            "xlm": _hf_xlm,
            "helium": _hf_helium,
            "open-llama": _hf_open_llama,
            "mllama": _hf_mllama,
            "mllama_text_model": _hf_mllama,
            "moshi": _hf_moshi,
            **{k: _hf_bart_decoder for k in _BART_LINEAGE},
        }
        if mt in beyond_llama:
            return beyond_llama[mt](hf, dtype, remat)
        if mt not in (
            "llama", "mistral", "qwen2", "qwen3", "gemma", "gemma2",
            "gemma3_text", "phi3",
            "olmo2", "olmo3", "olmoe", "flex_olmo", "mixtral",
            "ministral", "qwen2_moe",
            "qwen3_moe", "smollm3", "glm", "glm4",
            "deepseek_v2", "deepseek_v3", "gpt_oss",
            "emu3_text_model",  # the llama graph over multimodal tokens
        ):
            raise ValueError(
                f"model_type={mt!r} is outside the supported config "
                "families (llama/mistral/qwen2/qwen3/gemma/gemma2/"
                "gemma3_text/phi3/"
                "olmo2/mixtral/qwen2_moe/qwen3_moe/smollm3/glm4/"
                "deepseek_v2/deepseek_v3/gpt_oss/gpt2/gpt_neox/falcon/"
                "starcoder2/stablelm/granite/cohere); use a models/ zoo "
                "entry or a custom builder"
            )
        deepseek = mt in ("deepseek_v2", "deepseek_v3")
        gemma_like = mt in ("gemma", "gemma2", "gemma3_text")
        if mt == "gemma3_text" and hf.get("use_bidirectional_attention"):
            raise ValueError(
                "gemma3 use_bidirectional_attention is not implemented "
                "(this decoder is causal)"
            )
        # phi3's compute graph IS the llama graph; only the checkpoint
        # layout differs (fused qkv_proj / gate_up_proj — split on load
        # with hf_loader.split_phi3_fused_projections).  Its longrope
        # scaling is supported in the SHORT-FACTOR regime: HF picks
        # short_factor whenever the actual sequence length stays within
        # original_max_position_embeddings (_compute_longrope_parameters),
        # which is exactly the calibration regime (the data loaders cap
        # max_length).  The attention factor sqrt(1 + ln(f)/ln(orig))
        # still applies at every length.
        longrope = None
        if mt == "phi3" and hf.get("rope_scaling") is not None:
            rs3 = hf["rope_scaling"]
            rtype3 = rs3.get("rope_type", rs3.get("type"))
            if rtype3 != "longrope":
                raise ValueError(
                    f"phi3 rope_scaling type {rtype3!r} is not implemented"
                )
            longrope = rs3
        # gemma configs carry "hidden_activation" (the authoritative field,
        # older snapshots say hidden_act="gelu" but run tanh-approx)
        act = hf.get("hidden_activation") or hf.get("hidden_act", "silu")
        act_map = {
            "silu": "silu",
            "gelu": "gelu_tanh",  # HF gemma "gelu" runs tanh-approx in practice
            "gelu_pytorch_tanh": "gelu_tanh",
        }
        if act not in act_map:
            raise ValueError(f"Unsupported hidden_act={act!r}")
        n_heads = int(hf["num_attention_heads"])
        dim = int(hf["hidden_size"])
        head_dim = hf.get("head_dim")
        override = (
            int(head_dim)
            if head_dim is not None and int(head_dim) * n_heads != dim
            else None
        )
        # per-head q/k RMSNorm before RoPE (qwen3 and its MoE sibling;
        # gemma3's are the zero-centered (1+w) flavor via norm_plus_one)
        qk_norm = mt in ("qwen3", "qwen3_moe", "gemma3_text")
        # MoE routing fields.  Mixtral (HF MixtralSparseMoeBlock) always
        # renormalizes the top-k probabilities and runs experts at
        # intermediate_size on every layer; qwen3_moe gates normalization
        # on norm_topk_prob, sizes experts by moe_intermediate_size, and
        # selects sparse layers via decoder_sparse_step / mlp_only_layers.
        n_experts, top_k, norm_topk, moe_hidden = 0, 2, True, None
        mlp_only, sparse_step, shared_hidden = (), 1, None
        score_func, n_group, topk_group = "softmax", 0, 0
        group_top2, corr_bias, routed_scale, shared_gated = (
            False, False, 1.0, True,
        )
        if deepseek:
            # HF DeepseekV2MoEGate / DeepseekV3TopkRouter: dense layers are
            # the first first_k_dense_replace (expressed via
            # mlp_only_layers), shared experts are ungated at
            # moe_intermediate_size * n_shared_experts
            n_experts = int(hf["n_routed_experts"])
            # HF's DEFAULT DeepseekV2Config carries num_experts_per_tok=None
            # (real checkpoints always set it); fall back like upstream's
            # gate does rather than crashing on int(None)
            top_k = int(hf.get("num_experts_per_tok") or 8)
            norm_topk = bool(hf.get("norm_topk_prob", False))
            moe_hidden = int(hf["moe_intermediate_size"])
            mlp_only = tuple(range(int(hf.get("first_k_dense_replace", 0))))
            shared_hidden = moe_hidden * int(hf.get("n_shared_experts") or 1)
            shared_gated = False
            routed_scale = float(hf.get("routed_scaling_factor", 1.0))
            if mt == "deepseek_v3":
                score_func = "sigmoid"
                group_top2 = True
                corr_bias = True
                n_group = int(hf.get("n_group", 1))
                topk_group = int(hf.get("topk_group", 1))
            elif hf.get("topk_method") == "group_limited_greedy":
                n_group = int(hf.get("n_group", 1))
                topk_group = int(hf.get("topk_group", 1))
            elif hf.get("topk_method", "greedy") != "greedy":
                raise ValueError(
                    f"deepseek topk_method={hf.get('topk_method')!r} is "
                    "not implemented"
                )
        if mt == "gpt_oss":
            # HF GptOssExperts/GptOssTopKRouter: every layer is MoE,
            # experts carry biases and the clamped swiglu, the router has
            # a bias and softmaxes over the top-k logits.  The fused
            # (E, d, 2h) checkpoint layout is split per expert on load
            # (hf_loader.translate_gpt_oss_state_dict).
            n_experts = int(hf["num_local_experts"])
            top_k = int(hf.get("num_experts_per_tok", 4))
            moe_hidden = int(hf["intermediate_size"])
        elif mt == "mixtral":
            n_experts = int(hf["num_local_experts"])
            top_k = int(hf.get("num_experts_per_tok", 2))
        elif mt in ("qwen2_moe", "qwen3_moe"):
            n_experts = int(hf["num_experts"])
            top_k = int(hf.get("num_experts_per_tok", 8))
            norm_topk = bool(hf.get("norm_topk_prob", False))
            moe_hidden = int(hf["moe_intermediate_size"])
            mlp_only = tuple(hf.get("mlp_only_layers") or ())
            sparse_step = int(hf.get("decoder_sparse_step", 1))
            if mt == "qwen2_moe":
                shared_hidden = int(hf["shared_expert_intermediate_size"])
        elif mt in ("olmoe", "flex_olmo"):
            # OlmoeSparseMoeBlock: mixtral-style softmax-then-topk routing
            # gated by norm_topk_prob, every layer sparse, experts at
            # intermediate_size; attention adds FLAT q/k RMSNorms (the
            # olmo2 layout) and an optional clip_qkv clamp
            n_experts = int(hf["num_experts"])
            top_k = int(hf.get("num_experts_per_tok", 8))
            norm_topk = bool(hf.get("norm_topk_prob", False))
            moe_hidden = int(hf["intermediate_size"])
        # bias layouts this decoder does NOT express: llama/mistral with
        # attention_bias=True also put a bias on o_proj (qwen2's layout —
        # the one qkv_bias models — has none), and mlp_bias adds biases to
        # gate/up/down.  Loading such a checkpoint would silently DROP
        # those biases (strict=False import), so refuse loudly instead.
        # glm4 puts biases on q/k/v only (Glm4Attention: o_proj bias=False)
        # — the same layout qwen2 uses, so it is expressible
        if bool(hf.get("attention_bias", False)) and mt not in (
            "qwen2", "glm", "glm4", "gpt_oss", "gemma3_text"
        ):
            raise ValueError(
                "attention_bias=True with an o_proj bias is not expressed "
                "by this decoder (only the qwen2/glm4 q/k/v-bias layout "
                "is); use a custom builder"
            )
        if bool(hf.get("mlp_bias", False)):
            raise ValueError(
                "mlp_bias=True (biases on gate/up/down) is not expressed "
                "by this decoder; use a custom builder"
            )
        # rope scaling: the llama3 type is implemented (it rescales
        # frequencies at EVERY position — Llama-3.1/3.2 checkpoints are
        # wrong without it); other types are refused loudly rather than
        # silently ignored
        rope_llama3 = None
        rope_yarn = None
        rs = hf.get("rope_scaling")
        if rs is not None and mt != "phi3":
            rtype = rs.get("rope_type", rs.get("type"))
            if rtype == "llama3":
                rope_llama3 = (
                    float(rs["factor"]),
                    float(rs.get("low_freq_factor", 1.0)),
                    float(rs.get("high_freq_factor", 4.0)),
                    int(rs.get("original_max_position_embeddings", 8192)),
                )
            elif rtype == "yarn":
                if deepseek:
                    # the decoupled rope head is the only rotated part
                    yarn_dim = int(hf.get("qk_rope_head_dim", 64))
                elif head_dim is not None:
                    yarn_dim = int(head_dim)
                else:
                    yarn_dim = dim // n_heads
                rope_yarn = yarn_parameters(
                    yarn_dim,
                    float(hf.get("rope_theta", 10000.0)),
                    rs,
                    int(hf.get("max_position_embeddings", 4096)),
                )
            elif rtype == "linear":
                # linear position interpolation (gemma3's global layers):
                # every inverse frequency divided by factor, no cos/sin
                # scaling — expressed through the rope_yarn carrier
                lin_dim = (
                    int(head_dim) if head_dim is not None else dim // n_heads
                )
                factor = float(rs["factor"])
                theta0 = float(hf.get("rope_theta", 10000.0))
                half = lin_dim // 2
                rope_yarn = (
                    tuple(
                        float(1.0 / (theta0 ** (i / half) * factor))
                        for i in range(half)
                    ),
                    1.0,
                )
            elif rtype in (None, "default"):
                pass
            else:
                raise ValueError(
                    f"rope_scaling type {rtype!r} is not implemented "
                    "(only 'llama3', 'yarn' and 'linear'); use a custom "
                    "builder"
                )
        if longrope is not None:
            import math

            hd_full = int(head_dim) if head_dim is not None else dim // n_heads
            rot = int(hd_full * float(hf.get("partial_rotary_factor", 1.0)))
            short = [float(v) for v in longrope["short_factor"]]
            orig = int(
                hf.get("original_max_position_embeddings")
                or hf.get("max_position_embeddings", 4096)
            )
            lr_factor = float(hf.get("max_position_embeddings", orig)) / orig
            af = longrope.get("attention_factor")
            if af is None:
                af = (
                    1.0
                    if lr_factor <= 1.0
                    else math.sqrt(1 + math.log(lr_factor) / math.log(orig))
                )
            theta0 = float(hf.get("rope_theta", 10000.0))
            rope_yarn = (
                tuple(
                    float(1.0 / (short[i] * theta0 ** (2 * i / rot)))
                    for i in range(rot // 2)
                ),
                float(af),
            )
            logger.info(
                "phi3 longrope: short-factor frequencies (exact for "
                "sequences <= original_max_position_embeddings=%d)",
                orig,
            )
        # deepseek + yarn: the softmax scale gains mscale^2 on top of
        # qk_head^-0.5 (HF DeepseekV2/V3Attention.__init__)
        mla_scale = None
        if deepseek and rs is not None and rs.get("mscale_all_dim"):
            import math

            factor = float(rs["factor"])
            if factor > 1:
                mla_scale = (
                    0.1 * float(rs["mscale_all_dim"]) * math.log(factor)
                    + 1.0
                ) ** 2
        # layer-alternating sliding-window attention (gpt_oss, gemma3):
        # layer_types marks which layers are windowed; gemma3 configs that
        # omit it derive the pattern (every sliding_window_pattern-th layer
        # is full attention, HF Gemma3TextConfig.__init__)
        hybrid_sliding = mt in (
            "gpt_oss", "gemma3_text", "ministral", "olmo3"
        )
        layer_types = tuple(hf.get("layer_types") or ())
        if mt == "gemma3_text" and not layer_types:
            pat = int(hf.get("sliding_window_pattern") or 6)
            layer_types = tuple(
                "full_attention"
                if (i + 1) % pat == 0
                else "sliding_attention"
                for i in range(int(hf["num_hidden_layers"]))
            )
        sliding = hf.get("sliding_window")
        if (
            sliding is not None
            and hf.get("use_sliding_window", True)
            and not hybrid_sliding  # implemented per layer_types there
        ):
            # vanilla causal attention is exact for seqlen <= window; the
            # calibration loaders cap max_seqlen, so just surface it
            logger.info(
                "sliding_window=%s in config: full causal attention is used;"
                " keep calibration max_seqlen <= window for exactness",
                sliding,
            )
        return TransformerConfig(
            vocab_size=int(hf["vocab_size"]),
            dim=dim,
            n_layers=int(hf["num_hidden_layers"]),
            n_heads=n_heads,
            n_kv_heads=int(hf.get("num_key_value_heads", n_heads)),
            hidden_dim=int(hf["intermediate_size"]),
            norm_eps=float(hf.get("rms_norm_eps", 1e-6)),
            rope_theta=float(hf.get("rope_theta", 10000.0)),
            qkv_bias=(
                # qwen2_moe names the q/k/v-bias layout knob "qkv_bias"
                # (attention_bias is present but None in its configs)
                bool(hf.get("qkv_bias", True))
                if mt == "qwen2_moe"
                else bool(
                    hf.get(
                        "attention_bias",
                        mt in ("qwen2", "glm", "glm4", "gpt_oss"),
                    )
                )
            ),
            tie_embeddings=bool(hf.get("tie_word_embeddings", gemma_like)),
            head_dim_override=override,
            mlp_act=act_map[act],
            scale_embeddings=gemma_like,
            norm_plus_one=gemma_like,
            qk_norm=qk_norm,
            qk_norm_flat=mt in ("olmo2", "olmo3", "olmoe", "flex_olmo"),
            post_norm_only=mt in ("olmo2", "olmo3", "flex_olmo"),
            clip_qkv=(
                float(hf["clip_qkv"])
                if hf.get("clip_qkv") is not None
                else None
            ),
            # glm4's block is gemma2's sandwich wiring under different
            # state-dict key names (post_self_attn/post_mlp_layernorm —
            # translated on load, hf_loader.translate_glm4_state_dict)
            sandwich_norms=mt in ("gemma2", "gemma3_text", "glm4"),
            attn_logit_softcap=(
                float(hf["attn_logit_softcapping"])
                if hf.get("attn_logit_softcapping") is not None
                else None
            ),
            final_logit_softcap=(
                float(hf["final_logit_softcapping"])
                if hf.get("final_logit_softcapping") is not None
                else None
            ),
            query_scale_override=(
                float(hf["query_pre_attn_scalar"])
                if hf.get("query_pre_attn_scalar") is not None
                else None
            ),
            rope_llama3_scaling=rope_llama3,
            n_experts=n_experts,
            n_experts_per_tok=top_k,
            norm_topk_prob=norm_topk,
            moe_hidden_dim=moe_hidden,
            mlp_only_layers=mlp_only,
            decoder_sparse_step=sparse_step,
            shared_expert_hidden_dim=shared_hidden,
            q_lora_rank=(
                int(hf["q_lora_rank"])
                if deepseek and hf.get("q_lora_rank") is not None
                else None
            ),
            kv_lora_rank=int(hf["kv_lora_rank"]) if deepseek else None,
            qk_rope_head_dim=int(hf.get("qk_rope_head_dim", 64)),
            qk_nope_head_dim=int(hf.get("qk_nope_head_dim", 128)),
            v_head_dim=int(hf.get("v_head_dim", 128)),
            router_score_func=score_func,
            router_n_group=n_group,
            router_topk_group=topk_group,
            router_group_top2_sum=group_top2,
            router_correction_bias=corr_bias,
            routed_scaling_factor=routed_scale,
            shared_expert_gated=shared_gated,
            mla_softmax_scale=mla_scale,
            rope_layers=(
                tuple(int(v) for v in (hf.get("no_rope_layers") or ()))
                if mt == "smollm3"
                else ()
            ),
            attn_sinks=mt == "gpt_oss",
            sliding_window=(
                int(sliding) if hybrid_sliding and sliding else None
            ),
            layer_types=layer_types if hybrid_sliding else (),
            o_proj_bias=(
                # gpt_oss and gemma3 bias ALL FOUR projections when
                # attention_bias is set (default True / False resp.)
                bool(hf.get("attention_bias", mt == "gpt_oss"))
                if hybrid_sliding
                else False
            ),
            router_bias=mt == "gpt_oss",
            router_softmax_after_topk=mt == "gpt_oss",
            moe_clamp_limit=(
                float(hf.get("swiglu_limit", 7.0))
                if mt == "gpt_oss"
                else None
            ),
            rope_yarn=rope_yarn,
            rope_local_theta=(
                # gemma3: a separate local base frequency; olmo3: sliding
                # layers use the SAME theta but with rope_scaling dropped
                # (Olmo3Model.rotary_embs rope_type="default")
                float(hf.get("rope_local_base_freq", 10000.0))
                if mt == "gemma3_text"
                else float(hf.get("rope_theta", 10000.0))
                if mt == "olmo3"
                else None
            ),
            rope_partial_factor=(
                float(hf.get("partial_rotary_factor", 0.5))
                if mt in ("glm", "glm4")
                else None
            ),
            rope_interleaved=(
                mt in ("glm", "glm4")
                # v3 configs carry rope_interleave (default true); v2's
                # complex-pair apply_rotary_emb is always interleaved
                or (deepseek and bool(hf.get("rope_interleave", True)))
            ),
            remat=remat,
            dtype=dtype,
        )

    @staticmethod
    def tiny(vocab_size: int = 256, dtype: Any = jnp.float32) -> "TransformerConfig":
        return TransformerConfig(
            vocab_size=vocab_size,
            dim=64,
            n_layers=2,
            n_heads=4,
            n_kv_heads=2,
            hidden_dim=128,
            dtype=dtype,
        )

    @staticmethod
    def tinyllama_1_1b(dtype: Any = jnp.bfloat16) -> "TransformerConfig":
        return TransformerConfig(
            vocab_size=32000, dim=2048, n_layers=22, n_heads=32, n_kv_heads=4,
            hidden_dim=5632, dtype=dtype,
        )

    @staticmethod
    def qwen2_1_5b(dtype: Any = jnp.bfloat16) -> "TransformerConfig":
        return TransformerConfig(
            vocab_size=151936, dim=1536, n_layers=28, n_heads=12, n_kv_heads=2,
            hidden_dim=8960, qkv_bias=True, tie_embeddings=True,
            rope_theta=1000000.0, norm_eps=1e-6, dtype=dtype,
        )

    @staticmethod
    def llama3_8b(dtype: Any = jnp.bfloat16) -> "TransformerConfig":
        return TransformerConfig(
            vocab_size=128256, dim=4096, n_layers=32, n_heads=32, n_kv_heads=8,
            hidden_dim=14336, rope_theta=500000.0, dtype=dtype,
        )


def _hf_act(act: str) -> str:
    table = {
        "gelu": "gelu_exact",
        "gelu_new": "gelu_tanh",
        "gelu_fast": "gelu_tanh",
        "gelu_pytorch_tanh": "gelu_tanh",
        "silu": "silu",
        "relu": "relu",
        "relu2": "relu2",
        "xielu": "xielu",
        "quick_gelu": "quick_gelu",
    }
    if act not in table:
        raise ValueError(f"Unsupported hidden_act={act!r}")
    return table[act]


def _hf_gpt2(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF GPT2Config -> native.  Learned wpe positions, pre-LN blocks,
    non-gated gelu_new MLP, fused Conv1D projections split+transposed on
    load (hf_loader.translate_gpt2_state_dict); always weight-tied."""
    if hf.get("scale_attn_by_inverse_layer_idx") or hf.get(
        "reorder_and_upcast_attn"
    ):
        raise ValueError(
            "gpt2 scale_attn_by_inverse_layer_idx/reorder_and_upcast_attn "
            "are not implemented; use a custom builder"
        )
    dim = int(hf["n_embd"])
    n_heads = int(hf["n_head"])
    inner = hf.get("n_inner")
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=dim,
        n_layers=int(hf["n_layer"]),
        n_heads=n_heads,
        n_kv_heads=n_heads,
        hidden_dim=int(inner) if inner else 4 * dim,
        norm_eps=float(hf.get("layer_norm_epsilon", 1e-5)),
        norm_type="layernorm",
        mlp_gated=False,
        mlp_bias=True,
        mlp_act=_hf_act(hf.get("activation_function", "gelu_new")),
        qkv_bias=True,
        o_proj_bias=True,
        use_rope=False,
        learned_pos=int(hf["n_positions"]),
        tie_embeddings=True,
        query_scale_override=(
            None if hf.get("scale_attn_weights", True) else 1.0
        ),
        remat=remat,
        dtype=dtype,
    )


def _hf_imagegpt(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF ImageGPTConfig -> native.  The gpt2 graph over color-cluster
    tokens with three twists: ImageGPTLayerNorm IS RMSNorm (no mean
    centering, no bias), quick_gelu MLPs, and an UNTIED lm_head of
    vocab_size-1 outputs (the SOS token row exists only in the
    embedding; modeling_imagegpt.ImageGPTForCausalImageModeling).  The
    classification flavor mean-pools the same trunk."""
    dim = int(hf["n_embd"])
    n_heads = int(hf["n_head"])
    inner = hf.get("n_inner")
    vocab = int(hf["vocab_size"])
    return TransformerConfig(
        vocab_size=vocab - 1,
        embed_vocab_size=vocab,
        dim=dim,
        n_layers=int(hf["n_layer"]),
        n_heads=n_heads,
        n_kv_heads=n_heads,
        hidden_dim=int(inner) if inner else 4 * dim,
        norm_eps=float(hf.get("layer_norm_epsilon", 1e-5)),
        norm_type="rmsnorm",
        mlp_gated=False,
        mlp_bias=True,
        mlp_act=_hf_act(hf.get("activation_function", "quick_gelu")),
        qkv_bias=True,
        o_proj_bias=True,
        use_rope=False,
        learned_pos=int(hf["n_positions"]),
        tie_embeddings=False,
        remat=remat,
        dtype=dtype,
    )


def _hf_gpt_neox(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF GPTNeoXConfig (pythia) -> native.  Partial rotary (rotary_pct,
    rotate-half), LayerNorm, non-gated exact-gelu MLP, fused per-head
    query_key_value split on load (translate_gpt_neox_state_dict), and the
    use_parallel_residual wiring (x + attn(ln1 x) + mlp(ln2 x))."""
    dim = int(hf["hidden_size"])
    pct = float(hf.get("rotary_pct", 0.25))
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=dim,
        n_layers=int(hf["num_hidden_layers"]),
        n_heads=int(hf["num_attention_heads"]),
        n_kv_heads=int(hf["num_attention_heads"]),
        hidden_dim=int(hf["intermediate_size"]),
        norm_eps=float(hf.get("layer_norm_eps", 1e-5)),
        norm_type="layernorm",
        mlp_gated=False,
        mlp_bias=True,
        mlp_act=_hf_act(hf.get("hidden_act", "gelu")),
        qkv_bias=bool(hf.get("attention_bias", True)),
        o_proj_bias=bool(hf.get("attention_bias", True)),
        rope_theta=float(hf.get("rotary_emb_base", hf.get("rope_theta", 10000.0))),
        rope_partial_factor=pct if pct < 1.0 else None,
        parallel_residual=(
            "two_norm" if hf.get("use_parallel_residual", True) else "none"
        ),
        tie_embeddings=bool(hf.get("tie_word_embeddings", False)),
        remat=remat,
        dtype=dtype,
    )


def _hf_falcon(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF FalconConfig -> native.  Three generations of block wiring:
    new_decoder_architecture (ln_attn/ln_mlp, parallel two-norm, grouped
    fused qkv), classic parallel_attn (single norm shared by both
    branches, MQA), and sequential falcon-rw.  Fused query_key_value is
    split per layout on load (make_falcon_translator)."""
    if hf.get("alibi"):
        raise ValueError("falcon alibi positions are not implemented")
    dim = int(hf["hidden_size"])
    n_heads = int(hf["num_attention_heads"])
    new_arch = bool(hf.get("new_decoder_architecture", False))
    if new_arch:
        n_kv = int(hf.get("num_kv_heads") or n_heads)
        parallel = "two_norm"
    else:
        n_kv = 1 if hf.get("multi_query", True) else n_heads
        parallel = "one_norm" if hf.get("parallel_attn", True) else "none"
    bias = bool(hf.get("bias", False))
    ffn = hf.get("ffn_hidden_size")
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=dim,
        n_layers=int(hf["num_hidden_layers"]),
        n_heads=n_heads,
        n_kv_heads=n_kv,
        hidden_dim=int(ffn) if ffn else 4 * dim,
        norm_eps=float(hf.get("layer_norm_epsilon", 1e-5)),
        norm_type="layernorm",
        mlp_gated=False,
        mlp_bias=bias,
        mlp_act=_hf_act(hf.get("activation", hf.get("hidden_act", "gelu"))),
        qkv_bias=bias,
        o_proj_bias=bias,
        rope_theta=float(hf.get("rope_theta", 10000.0)),
        parallel_residual=parallel,
        tie_embeddings=bool(hf.get("tie_word_embeddings", True)),
        remat=remat,
        dtype=dtype,
    )


def _hf_starcoder2(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF Starcoder2Config -> native.  The llama graph with LayerNorm,
    a non-gated tanh-gelu MLP (c_fc/c_proj -> up/down on load), and
    use_bias on every projection; full rotary, GQA."""
    bias = bool(hf.get("use_bias", True))
    sliding = hf.get("sliding_window")
    if sliding:
        logger.info(
            "starcoder2 sliding_window=%s: full causal attention is used; "
            "keep calibration max_seqlen <= window for exactness",
            sliding,
        )
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=int(hf["hidden_size"]),
        n_layers=int(hf["num_hidden_layers"]),
        n_heads=int(hf["num_attention_heads"]),
        n_kv_heads=int(hf.get("num_key_value_heads", hf["num_attention_heads"])),
        hidden_dim=int(hf["intermediate_size"]),
        norm_eps=float(hf.get("norm_epsilon", 1e-5)),
        norm_type="layernorm",
        mlp_gated=False,
        mlp_bias=bias,
        mlp_act=_hf_act(hf.get("hidden_act", "gelu_pytorch_tanh")),
        qkv_bias=bias,
        o_proj_bias=bias,
        rope_theta=float(hf.get("rope_theta", 10000.0)),
        tie_embeddings=bool(hf.get("tie_word_embeddings", True)),
        remat=remat,
        dtype=dtype,
    )


def _hf_stablelm(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF StableLmConfig -> native.  Llama graph with LayerNorm blocks
    and partial rotary (partial_rotary_factor, rotate-half); gated silu
    MLP; optional qkv biases (use_qkv_bias)."""
    if hf.get("qk_layernorm"):
        raise ValueError("stablelm qk_layernorm is not implemented")
    if hf.get("use_parallel_residual"):
        raise ValueError(
            "stablelm use_parallel_residual is not implemented; "
            "use a custom builder"
        )
    pct = float(hf.get("partial_rotary_factor", 0.25))
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=int(hf["hidden_size"]),
        n_layers=int(hf["num_hidden_layers"]),
        n_heads=int(hf["num_attention_heads"]),
        n_kv_heads=int(hf.get("num_key_value_heads", hf["num_attention_heads"])),
        hidden_dim=int(hf["intermediate_size"]),
        norm_eps=float(hf.get("layer_norm_eps", 1e-5)),
        norm_type="layernorm",
        mlp_act=_hf_act(hf.get("hidden_act", "silu")),
        qkv_bias=bool(hf.get("use_qkv_bias", False)),
        rope_theta=float(hf.get("rope_theta", 10000.0)),
        rope_partial_factor=pct if pct < 1.0 else None,
        tie_embeddings=bool(hf.get("tie_word_embeddings", False)),
        remat=remat,
        dtype=dtype,
    )


def _hf_olmo(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF OlmoConfig (OLMo v1: OLMo-1B/7B) -> native.  The llama graph
    with NON-PARAMETRIC LayerNorms (OlmoLayerNorm: no weight, no bias,
    eps hardcoded 1e-5 — modeling_olmo.py) and an optional q/k/v clamp
    (clip_qkv).  Gated silu MLP, full rotary, no biases anywhere."""
    if bool(hf.get("attention_bias", False)):
        raise ValueError("olmo attention_bias=True is not expressed")
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=int(hf["hidden_size"]),
        n_layers=int(hf["num_hidden_layers"]),
        n_heads=int(hf["num_attention_heads"]),
        n_kv_heads=int(
            hf.get("num_key_value_heads") or hf["num_attention_heads"]
        ),
        hidden_dim=int(hf["intermediate_size"]),
        norm_eps=1e-5,  # hardcoded in OlmoLayerNorm, not a config field
        norm_type="layernorm",
        norm_no_affine=True,
        clip_qkv=(
            float(hf["clip_qkv"]) if hf.get("clip_qkv") is not None else None
        ),
        mlp_act=_hf_act(hf.get("hidden_act", "silu")),
        rope_theta=float(hf.get("rope_theta", 10000.0)),
        tie_embeddings=bool(hf.get("tie_word_embeddings", False)),
        remat=remat,
        dtype=dtype,
    )


def _hf_nemotron(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF NemotronConfig -> native.  Llama-shaped blocks with LayerNorm1P
    norms (y * (weight + 1) + bias, NemotronLayerNorm1P), a NON-gated
    squared-relu MLP (up_proj -> relu^2 -> down_proj), and partial rotary
    (partial_rotary_factor, split-half convention)."""
    pct = float(hf.get("partial_rotary_factor", 0.5))
    bias = bool(hf.get("attention_bias", False))
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=int(hf["hidden_size"]),
        n_layers=int(hf["num_hidden_layers"]),
        n_heads=int(hf["num_attention_heads"]),
        n_kv_heads=int(
            hf.get("num_key_value_heads") or hf["num_attention_heads"]
        ),
        hidden_dim=int(hf["intermediate_size"]),
        norm_eps=float(hf.get("norm_eps", 1e-5)),
        norm_type="layernorm",
        norm_plus_one=True,
        mlp_gated=False,
        mlp_bias=bool(hf.get("mlp_bias", False)),
        mlp_act=_hf_act(hf.get("hidden_act", "relu2")),
        qkv_bias=bias,
        o_proj_bias=bias,
        rope_theta=float(hf.get("rope_theta", 10000.0)),
        rope_partial_factor=pct if pct < 1.0 else None,
        tie_embeddings=bool(hf.get("tie_word_embeddings", False)),
        remat=remat,
        dtype=dtype,
    )


def _hf_persimmon(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF PersimmonConfig -> native.  LayerNorm blocks with biases
    everywhere (fused query_key_value + dense + both MLP projections all
    carry bias=True), per-head q/k LAYERNORM (qk_layernorm), partial
    rotary (default 0.5, split-half), and the non-gated squared-relu MLP.
    The per-head-interleaved fused qkv is split on load
    (hf_loader.make_persimmon_translator)."""
    pct = float(hf.get("partial_rotary_factor", 0.5))
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=int(hf["hidden_size"]),
        n_layers=int(hf["num_hidden_layers"]),
        n_heads=int(hf["num_attention_heads"]),
        n_kv_heads=int(hf["num_attention_heads"]),  # MHA only
        hidden_dim=int(hf["intermediate_size"]),
        norm_eps=float(hf.get("layer_norm_eps", 1e-5)),
        norm_type="layernorm",
        qk_norm=bool(hf.get("qk_layernorm", True)),
        qk_norm_type="layernorm",
        mlp_gated=False,
        mlp_bias=True,
        mlp_act=_hf_act(hf.get("hidden_act", "relu2")),
        qkv_bias=True,
        o_proj_bias=True,
        rope_theta=float(hf.get("rope_theta", 25000.0)),
        rope_partial_factor=pct if pct < 1.0 else None,
        tie_embeddings=bool(hf.get("tie_word_embeddings", False)),
        remat=remat,
        dtype=dtype,
    )


def _hf_ernie4_5(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF Ernie4_5Config -> native.  The llama graph with ONE bias knob
    (use_bias) covering q/k/v, o_proj AND the gated MLP, plus an explicit
    head_dim."""
    bias = bool(hf.get("use_bias", False))
    n_heads = int(hf["num_attention_heads"])
    dim = int(hf["hidden_size"])
    head_dim = hf.get("head_dim")
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=dim,
        n_layers=int(hf["num_hidden_layers"]),
        n_heads=n_heads,
        n_kv_heads=int(hf.get("num_key_value_heads") or n_heads),
        hidden_dim=int(hf["intermediate_size"]),
        norm_eps=float(hf.get("rms_norm_eps", 1e-5)),
        head_dim_override=(
            int(head_dim)
            if head_dim is not None and int(head_dim) * n_heads != dim
            else None
        ),
        mlp_act=_hf_act(hf.get("hidden_act", "silu")),
        mlp_bias=bias,
        qkv_bias=bias,
        o_proj_bias=bias,
        rope_theta=float(hf.get("rope_theta", 10000.0)),
        # "glm rope style (with full dim)" — pair-interleaved rotation
        # over the whole head (HF ernie4_5 apply_rotary_pos_emb)
        rope_interleaved=True,
        tie_embeddings=bool(hf.get("tie_word_embeddings", True)),
        remat=remat,
        dtype=dtype,
    )


def _hf_arcee(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF ArceeConfig (AFM) -> native.  The llama graph with a NON-gated
    squared-relu MLP (ArceeMLP: up_proj -> relu^2 -> down_proj) and an
    explicit head_dim."""
    n_heads = int(hf["num_attention_heads"])
    dim = int(hf["hidden_size"])
    head_dim = hf.get("head_dim")
    bias = bool(hf.get("attention_bias", False))
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=dim,
        n_layers=int(hf["num_hidden_layers"]),
        n_heads=n_heads,
        n_kv_heads=int(hf.get("num_key_value_heads") or n_heads),
        hidden_dim=int(hf["intermediate_size"]),
        norm_eps=float(hf.get("rms_norm_eps", 1e-5)),
        head_dim_override=(
            int(head_dim)
            if head_dim is not None and int(head_dim) * n_heads != dim
            else None
        ),
        mlp_gated=False,
        mlp_bias=bool(hf.get("mlp_bias", False)),
        mlp_act=_hf_act(hf.get("hidden_act", "relu2")),
        qkv_bias=bias,
        o_proj_bias=bias,
        rope_theta=float(hf.get("rope_theta", 10000.0)),
        tie_embeddings=bool(hf.get("tie_word_embeddings", False)),
        remat=remat,
        dtype=dtype,
    )


def _hf_seed_oss(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF SeedOssConfig -> native.  Llama graph with SPLIT bias knobs:
    attention_bias on q/k/v, attention_out_bias on o_proj; explicit
    head_dim."""
    n_heads = int(hf["num_attention_heads"])
    dim = int(hf["hidden_size"])
    head_dim = hf.get("head_dim")
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=dim,
        n_layers=int(hf["num_hidden_layers"]),
        n_heads=n_heads,
        n_kv_heads=int(hf.get("num_key_value_heads") or n_heads),
        hidden_dim=int(hf["intermediate_size"]),
        norm_eps=float(hf.get("rms_norm_eps", 1e-6)),
        head_dim_override=(
            int(head_dim)
            if head_dim is not None and int(head_dim) * n_heads != dim
            else None
        ),
        mlp_act=_hf_act(hf.get("hidden_act", "silu")),
        mlp_bias=bool(hf.get("mlp_bias", False)),
        qkv_bias=bool(hf.get("attention_bias", True)),
        o_proj_bias=bool(hf.get("attention_out_bias", False)),
        rope_theta=float(hf.get("rope_theta", 10000.0)),
        tie_embeddings=bool(hf.get("tie_word_embeddings", False)),
        remat=remat,
        dtype=dtype,
    )


def _hf_granitemoe(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF GraniteMoeConfig -> native.  The granite scalar-multiplier graph
    (embedding/residual/attention multipliers, logits_scaling) with every
    MLP a top-k MoE whose router picks top-k LOGITS and softmaxes over
    them (GraniteMoeTopKGating — the gpt_oss ordering, without the router
    bias).  Fused (E, 2*ffn, d) input_linear and (E, d, ffn) output_linear
    expert tensors split on load (hf_loader.make_granitemoe_translator)."""
    attn_mult = float(hf.get("attention_multiplier", 1.0))
    logits_scaling = float(hf.get("logits_scaling", 1.0))
    if bool(hf.get("attention_bias", False)):
        raise ValueError("granitemoe attention_bias=True is not expressed")
    # granitemoeshared: an always-on UNGATED shared MLP of
    # shared_intermediate_size added to the routed output (0 = none)
    shared = int(hf.get("shared_intermediate_size") or 0)
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=int(hf["hidden_size"]),
        n_layers=int(hf["num_hidden_layers"]),
        n_heads=int(hf["num_attention_heads"]),
        n_kv_heads=int(
            hf.get("num_key_value_heads") or hf["num_attention_heads"]
        ),
        hidden_dim=int(hf["intermediate_size"]),
        norm_eps=float(hf.get("rms_norm_eps", 1e-6)),
        mlp_act=_hf_act(hf.get("hidden_act", "silu")),
        rope_theta=float(hf.get("rope_theta", 10000.0)),
        n_experts=int(hf["num_local_experts"]),
        n_experts_per_tok=int(hf.get("num_experts_per_tok", 2)),
        router_softmax_after_topk=True,
        shared_expert_hidden_dim=shared if shared > 0 else None,
        shared_expert_gated=False,
        embedding_multiplier=(
            float(hf["embedding_multiplier"])
            if hf.get("embedding_multiplier") is not None
            else None
        ),
        residual_multiplier=(
            float(hf["residual_multiplier"])
            if hf.get("residual_multiplier") is not None
            else None
        ),
        query_scale_override=(
            attn_mult**-2 if attn_mult != 1.0 else None
        ),
        logit_scale=(
            1.0 / logits_scaling if logits_scaling != 1.0 else None
        ),
        tie_embeddings=bool(hf.get("tie_word_embeddings", False)),
        remat=remat,
        dtype=dtype,
    )


def _hf_exaone4(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF Exaone4Config -> native.  olmo2-style POST-norm blocks
    (post_attention/post_feedforward norms on the sublayer outputs),
    per-head q/k RMSNorm, hybrid sliding layers — and ROTARY ONLY ON
    SLIDING layers when a window is configured (Exaone4Attention.forward:
    full-attention layers skip apply_rotary_pos_emb), expressed through
    per-layer rope_layers."""
    sliding = hf.get("sliding_window")
    layer_types = tuple(hf.get("layer_types") or ())
    if not layer_types and sliding:
        pat = int(hf.get("sliding_window_pattern") or 4)
        layer_types = tuple(
            "full_attention" if (i + 1) % pat == 0 else "sliding_attention"
            for i in range(int(hf["num_hidden_layers"]))
        )
    rope_layers = (
        tuple(
            1 if lt == "sliding_attention" else 0 for lt in layer_types
        )
        if sliding
        else ()
    )
    n_heads = int(hf["num_attention_heads"])
    dim = int(hf["hidden_size"])
    head_dim = hf.get("head_dim")
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=dim,
        n_layers=int(hf["num_hidden_layers"]),
        n_heads=n_heads,
        n_kv_heads=int(hf.get("num_key_value_heads") or n_heads),
        hidden_dim=int(hf["intermediate_size"]),
        norm_eps=float(hf.get("rms_norm_eps", 1e-5)),
        head_dim_override=(
            int(head_dim)
            if head_dim is not None and int(head_dim) * n_heads != dim
            else None
        ),
        qk_norm=True,
        post_norm_only=True,
        mlp_act=_hf_act(hf.get("hidden_act", "silu")),
        qkv_bias=bool(hf.get("attention_bias") or False),
        rope_theta=float(hf.get("rope_theta", 10000.0)),
        sliding_window=int(sliding) if sliding else None,
        layer_types=layer_types,
        rope_layers=rope_layers,
        tie_embeddings=bool(hf.get("tie_word_embeddings", False)),
        remat=remat,
        dtype=dtype,
    )


def _hf_dbrx(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF DbrxConfig -> native.  Bias-free-LayerNorm pre-norm blocks
    (DbrxNormAttentionNorm norm_1/norm_2), a GQA attention whose fused
    Wqkv is clamped to ±clip_qkv BEFORE the [q | k | v] split, and a
    mixtral-style MoE on every layer (DbrxRouter: softmax over all
    experts, top-k, then p-norm renormalization — p=1 on released
    checkpoints, which for positive softmax weights is exactly the
    norm_topk_prob sum).  Config is NESTED (attn_config / ffn_config);
    fused Wqkv and the (E*ffn, d) expert tensors split on load
    (hf_loader.make_dbrx_translator)."""
    attn = hf.get("attn_config") or {}
    ffn = hf.get("ffn_config") or {}
    norm_p = ffn.get("moe_normalize_expert_weights")
    if norm_p is not None and float(norm_p) != 1.0:
        raise ValueError(
            f"dbrx moe_normalize_expert_weights={norm_p} is not "
            "implemented (only p=1 / None)"
        )
    act = (ffn.get("ffn_act_fn") or {}).get("name", "silu")
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=int(hf["d_model"]),
        n_layers=int(hf["n_layers"]),
        n_heads=int(hf["n_heads"]),
        n_kv_heads=int(attn.get("kv_n_heads", 1)),
        hidden_dim=int(ffn["ffn_hidden_size"]),
        norm_eps=1e-5,  # torch LayerNorm default; dbrx sets none
        norm_type="layernorm",
        norm_bias=False,
        clip_qkv=(
            float(attn["clip_qkv"])
            if attn.get("clip_qkv") is not None
            else None
        ),
        mlp_act=_hf_act(act),
        rope_theta=float(attn.get("rope_theta", 10000.0)),
        n_experts=int(ffn["moe_num_experts"]),
        n_experts_per_tok=int(ffn.get("moe_top_k", 1)),
        norm_topk_prob=norm_p is not None,
        tie_embeddings=bool(hf.get("tie_word_embeddings", False)),
        remat=remat,
        dtype=dtype,
    )


def _hf_granite(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF GraniteConfig -> native.  Exactly the llama graph plus four
    scalar multipliers: embedding_multiplier on the embeddings,
    residual_multiplier on both residual adds, attention_multiplier as
    the attention score scale (stored via query_scale_override =
    multiplier**-2 so override**-0.5 reproduces it), and logits scaled by
    1/logits_scaling."""
    attn_mult = float(hf.get("attention_multiplier", 1.0))
    logits_scaling = float(hf.get("logits_scaling", 1.0))
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=int(hf["hidden_size"]),
        n_layers=int(hf["num_hidden_layers"]),
        n_heads=int(hf["num_attention_heads"]),
        n_kv_heads=int(hf.get("num_key_value_heads", hf["num_attention_heads"])),
        hidden_dim=int(hf["intermediate_size"]),
        norm_eps=float(hf.get("rms_norm_eps", 1e-6)),
        mlp_act=_hf_act(hf.get("hidden_act", "silu")),
        rope_theta=float(hf.get("rope_theta", 10000.0)),
        embedding_multiplier=(
            float(hf["embedding_multiplier"])
            if hf.get("embedding_multiplier") is not None
            else None
        ),
        residual_multiplier=(
            float(hf["residual_multiplier"])
            if hf.get("residual_multiplier") is not None
            else None
        ),
        query_scale_override=(
            attn_mult ** -2 if attn_mult != 1.0 else None
        ),
        logit_scale=(
            1.0 / logits_scaling if logits_scaling != 1.0 else None
        ),
        tie_embeddings=bool(hf.get("tie_word_embeddings", False)),
        remat=remat,
        dtype=dtype,
    )


def _hf_cohere(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF CohereConfig (command-r) -> native.  Bias-free LayerNorm, a
    single shared input norm feeding parallel attention+MLP branches,
    gated silu MLP, interleaved rotary, and logit_scale on the tied
    logits."""
    if hf.get("use_qk_norm"):
        raise ValueError("cohere use_qk_norm is not implemented")
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=int(hf["hidden_size"]),
        n_layers=int(hf["num_hidden_layers"]),
        n_heads=int(hf["num_attention_heads"]),
        n_kv_heads=int(hf.get("num_key_value_heads", hf["num_attention_heads"])),
        hidden_dim=int(hf["intermediate_size"]),
        norm_eps=float(hf.get("layer_norm_eps", 1e-5)),
        norm_type="layernorm",
        norm_bias=False,
        mlp_act=_hf_act(hf.get("hidden_act", "silu")),
        qkv_bias=bool(hf.get("attention_bias", False)),
        rope_theta=float(hf.get("rope_theta", 10000.0)),
        rope_interleaved=True,
        parallel_residual="one_norm",
        logit_scale=float(hf.get("logit_scale", 0.0625)),
        tie_embeddings=bool(hf.get("tie_word_embeddings", True)),
        remat=remat,
        dtype=dtype,
    )


def _hf_cohere2(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF Cohere2Config (command-r7b) -> native.  The cohere one-norm
    parallel-residual graph plus hybrid sliding layers where ROTARY
    APPLIES ONLY ON SLIDING layers (Cohere2Attention.forward: full
    layers skip apply_rotary_pos_emb) — expressed via layer_types +
    per-layer rope_layers."""
    if hf.get("use_qk_norm"):
        raise ValueError("cohere2 use_qk_norm is not implemented")
    sliding = hf.get("sliding_window")
    layer_types = tuple(hf.get("layer_types") or ())
    if not layer_types and sliding:
        pat = int(hf.get("sliding_window_pattern") or 4)
        layer_types = tuple(
            "full_attention" if (i + 1) % pat == 0 else "sliding_attention"
            for i in range(int(hf["num_hidden_layers"]))
        )
    rope_layers = (
        tuple(1 if lt == "sliding_attention" else 0 for lt in layer_types)
        if sliding
        else ()
    )
    n_heads = int(hf["num_attention_heads"])
    dim = int(hf["hidden_size"])
    head_dim = hf.get("head_dim")
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=dim,
        n_layers=int(hf["num_hidden_layers"]),
        n_heads=n_heads,
        n_kv_heads=int(hf.get("num_key_value_heads") or n_heads),
        hidden_dim=int(hf["intermediate_size"]),
        norm_eps=float(hf.get("layer_norm_eps", 1e-5)),
        norm_type="layernorm",
        norm_bias=False,
        head_dim_override=(
            int(head_dim)
            if head_dim is not None and int(head_dim) * n_heads != dim
            else None
        ),
        mlp_act=_hf_act(hf.get("hidden_act", "silu")),
        qkv_bias=bool(hf.get("attention_bias", False)),
        rope_theta=float(hf.get("rope_theta", 10000.0)),
        rope_interleaved=True,
        parallel_residual="one_norm",
        logit_scale=float(hf.get("logit_scale", 0.0625)),
        sliding_window=int(sliding) if sliding else None,
        layer_types=layer_types,
        rope_layers=rope_layers,
        tie_embeddings=bool(hf.get("tie_word_embeddings", True)),
        remat=remat,
        dtype=dtype,
    )


def _hf_vaultgemma(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF VaultGemmaConfig -> native.  A gemma2-generation graph WITHOUT
    the sandwich norms: standard two-norm pre-norm blocks whose second
    norm is named ``pre_feedforward_layernorm`` in the checkpoint
    (renamed on load), (1+w) RMSNorms, sqrt(dim) embedding scale,
    query_pre_attn_scalar scale, attn+final softcapping, hybrid sliding
    layers, tied embeddings."""
    sliding = hf.get("sliding_window")
    layer_types = tuple(hf.get("layer_types") or ())
    if not layer_types and sliding:
        layer_types = tuple(
            "sliding_attention" if i % 2 == 0 else "full_attention"
            for i in range(int(hf["num_hidden_layers"]))
        )
    n_heads = int(hf["num_attention_heads"])
    dim = int(hf["hidden_size"])
    head_dim = hf.get("head_dim")
    act = hf.get("hidden_activation") or hf.get("hidden_act", "gelu_pytorch_tanh")
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=dim,
        n_layers=int(hf["num_hidden_layers"]),
        n_heads=n_heads,
        n_kv_heads=int(hf.get("num_key_value_heads") or n_heads),
        hidden_dim=int(hf["intermediate_size"]),
        norm_eps=float(hf.get("rms_norm_eps", 1e-6)),
        head_dim_override=(
            int(head_dim)
            if head_dim is not None and int(head_dim) * n_heads != dim
            else None
        ),
        mlp_act=_hf_act(act),
        scale_embeddings=True,
        norm_plus_one=True,
        attn_logit_softcap=(
            float(hf["attn_logit_softcapping"])
            if hf.get("attn_logit_softcapping") is not None
            else None
        ),
        final_logit_softcap=(
            float(hf["final_logit_softcapping"])
            if hf.get("final_logit_softcapping") is not None
            else None
        ),
        query_scale_override=(
            float(hf["query_pre_attn_scalar"])
            if hf.get("query_pre_attn_scalar") is not None
            else None
        ),
        rope_theta=float(hf.get("rope_theta", 10000.0)),
        sliding_window=int(sliding) if sliding else None,
        layer_types=layer_types,
        tie_embeddings=bool(hf.get("tie_word_embeddings", True)),
        remat=remat,
        dtype=dtype,
    )


def _hf_glm4_moe(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF Glm4MoeConfig -> native.  Glm attention (partial interleaved
    rotary, q/k/v biases per attention_bias, optional per-head qk_norm)
    over the deepseek-v3 noaux_tc router (sigmoid scores, selection-only
    correction bias, group-top2-sum limiting, norm_topk, routed scaling),
    ungated shared experts, first_k_dense_replace dense layers."""
    n_heads = int(hf["num_attention_heads"])
    dim = int(hf["hidden_size"])
    head_dim = hf.get("head_dim")
    moe_hidden = int(hf["moe_intermediate_size"])
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=dim,
        n_layers=int(hf["num_hidden_layers"]),
        n_heads=n_heads,
        n_kv_heads=int(hf.get("num_key_value_heads") or n_heads),
        hidden_dim=int(hf["intermediate_size"]),
        norm_eps=float(hf.get("rms_norm_eps", 1e-5)),
        head_dim_override=(
            int(head_dim)
            if head_dim is not None and int(head_dim) * n_heads != dim
            else None
        ),
        qk_norm=bool(hf.get("use_qk_norm", False)),
        mlp_act=_hf_act(hf.get("hidden_act", "silu")),
        qkv_bias=bool(hf.get("attention_bias", False)),
        rope_theta=float(hf.get("rope_theta", 10000.0)),
        # partial rotary with the STANDARD split-half convention — unlike
        # glm/glm4, glm4_moe's rotate_half is the llama one
        rope_partial_factor=float(hf.get("partial_rotary_factor", 0.5)),
        n_experts=int(hf["n_routed_experts"]),
        n_experts_per_tok=int(hf.get("num_experts_per_tok", 8)),
        norm_topk_prob=bool(hf.get("norm_topk_prob", True)),
        moe_hidden_dim=moe_hidden,
        mlp_only_layers=tuple(range(int(hf.get("first_k_dense_replace", 0)))),
        shared_expert_hidden_dim=(
            moe_hidden * int(hf.get("n_shared_experts") or 1)
        ),
        shared_expert_gated=False,
        router_score_func="sigmoid",
        router_n_group=int(hf.get("n_group", 1)),
        router_topk_group=int(hf.get("topk_group", 1)),
        router_group_top2_sum=True,
        router_correction_bias=True,
        routed_scaling_factor=float(hf.get("routed_scaling_factor", 1.0)),
        tie_embeddings=bool(hf.get("tie_word_embeddings", False)),
        remat=remat,
        dtype=dtype,
    )


def _hf_dots1(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF Dots1Config (rednote dots.llm1) -> native.  Qwen3-style
    attention (per-head q/k RMSNorm, split-half rotary) over the same
    deepseek-v3 noaux_tc router as glm4_moe; ungated shared experts."""
    n_heads = int(hf["num_attention_heads"])
    dim = int(hf["hidden_size"])
    head_dim = hf.get("head_dim")
    moe_hidden = int(hf["moe_intermediate_size"])
    n_shared = int(hf.get("n_shared_experts") or 0)
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=dim,
        n_layers=int(hf["num_hidden_layers"]),
        n_heads=n_heads,
        n_kv_heads=int(hf.get("num_key_value_heads") or n_heads),
        hidden_dim=int(hf["intermediate_size"]),
        norm_eps=float(hf.get("rms_norm_eps", 1e-6)),
        head_dim_override=(
            int(head_dim)
            if head_dim is not None and int(head_dim) * n_heads != dim
            else None
        ),
        qk_norm=True,
        mlp_act=_hf_act(hf.get("hidden_act", "silu")),
        qkv_bias=bool(hf.get("attention_bias", False)),
        rope_theta=float(hf.get("rope_theta", 10000.0)),
        n_experts=int(hf["n_routed_experts"]),
        n_experts_per_tok=int(hf.get("num_experts_per_tok", 6)),
        norm_topk_prob=bool(hf.get("norm_topk_prob", False)),
        moe_hidden_dim=moe_hidden,
        mlp_only_layers=tuple(range(int(hf.get("first_k_dense_replace", 0)))),
        shared_expert_hidden_dim=(
            moe_hidden * n_shared if n_shared else None
        ),
        shared_expert_gated=False,
        router_score_func="sigmoid",
        router_n_group=int(hf.get("n_group", 1)),
        router_topk_group=int(hf.get("topk_group", 1)),
        router_group_top2_sum=True,
        router_correction_bias=True,
        routed_scaling_factor=float(hf.get("routed_scaling_factor", 1.0)),
        tie_embeddings=bool(hf.get("tie_word_embeddings", False)),
        remat=remat,
        dtype=dtype,
    )


def _hf_apertus(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF ApertusConfig (Swiss AI) -> native.  Llama attention with
    per-head q/k RMSNorms, block norms checkpoint-named
    attention_layernorm/feedforward_layernorm (renamed on load), a
    NON-gated xIELU MLP with learned scalar alphas, and llama3 rope
    scaling."""
    rope_llama3 = None
    rs = hf.get("rope_scaling")
    if rs is not None:
        rtype = rs.get("rope_type", rs.get("type"))
        if rtype == "llama3":
            rope_llama3 = (
                float(rs["factor"]),
                float(rs.get("low_freq_factor", 1.0)),
                float(rs.get("high_freq_factor", 4.0)),
                int(rs.get("original_max_position_embeddings", 8192)),
            )
        elif rtype not in (None, "default"):
            raise ValueError(
                f"apertus rope_scaling type {rtype!r} is not implemented"
            )
    n_heads = int(hf["num_attention_heads"])
    dim = int(hf["hidden_size"])
    head_dim = hf.get("head_dim")
    bias = bool(hf.get("attention_bias", False))
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=dim,
        n_layers=int(hf["num_hidden_layers"]),
        n_heads=n_heads,
        n_kv_heads=int(hf.get("num_key_value_heads") or n_heads),
        hidden_dim=int(hf["intermediate_size"]),
        norm_eps=float(hf.get("rms_norm_eps", 1e-5)),
        head_dim_override=(
            int(head_dim)
            if head_dim is not None and int(head_dim) * n_heads != dim
            else None
        ),
        qk_norm=True,
        mlp_gated=False,
        mlp_act=_hf_act(hf.get("hidden_act", "xielu")),
        mlp_bias=bool(hf.get("mlp_bias", False)),
        qkv_bias=bias,
        o_proj_bias=bias,
        rope_theta=float(hf.get("rope_theta", 10000.0)),
        rope_llama3_scaling=rope_llama3,
        tie_embeddings=bool(hf.get("tie_word_embeddings", False)),
        remat=remat,
        dtype=dtype,
    )


def _hf_hunyuan_dense(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF HunYuanDenseV1Config -> native.  The llama graph with per-head
    q/k RMSNorms checkpoint-named query_layernorm/key_layernorm (renamed
    on load)."""
    if hf.get("rope_scaling") is not None:
        raise ValueError(
            "hunyuan rope_scaling is not implemented; use a custom builder"
        )
    n_heads = int(hf["num_attention_heads"])
    dim = int(hf["hidden_size"])
    head_dim = hf.get("head_dim")
    bias = bool(hf.get("attention_bias", False))
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=dim,
        n_layers=int(hf["num_hidden_layers"]),
        n_heads=n_heads,
        n_kv_heads=int(hf.get("num_key_value_heads") or n_heads),
        hidden_dim=int(hf["intermediate_size"]),
        norm_eps=float(hf.get("rms_norm_eps", 1e-5)),
        head_dim_override=(
            int(head_dim)
            if head_dim is not None and int(head_dim) * n_heads != dim
            else None
        ),
        qk_norm=True,
        mlp_act=_hf_act(hf.get("hidden_act", "silu")),
        qkv_bias=bias,
        o_proj_bias=bias,
        rope_theta=float(hf.get("rope_theta", 10000.0)),
        tie_embeddings=bool(hf.get("tie_word_embeddings", False)),
        remat=remat,
        dtype=dtype,
    )


def _hf_gpt_neo(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF GPTNeoConfig -> native.  Learned positions, UNSCALED attention
    (GPTNeoSelfAttention._attn has no 1/sqrt(hd) — query_scale_override
    1.0), alternating global/local layers where local = sliding window
    (bias buffer: 0 <= q-k < window, our mask convention exactly),
    bias-free q/k/v with a biased out_proj, non-gated gelu_new MLP."""
    layers = [str(t) for t in hf.get("attention_layers") or []]
    if not layers:
        layers = ["global"] * int(hf["num_layers"])
    has_local = "local" in layers
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=int(hf["hidden_size"]),
        n_layers=int(hf["num_layers"]),
        n_heads=int(hf["num_heads"]),
        n_kv_heads=int(hf["num_heads"]),
        hidden_dim=int(
            hf.get("intermediate_size") or 4 * int(hf["hidden_size"])
        ),
        norm_eps=float(hf.get("layer_norm_epsilon", 1e-5)),
        norm_type="layernorm",
        mlp_gated=False,
        mlp_bias=True,
        mlp_act=_hf_act(hf.get("activation_function", "gelu_new")),
        qkv_bias=False,
        o_proj_bias=True,
        learned_pos=int(hf["max_position_embeddings"]),
        use_rope=False,
        query_scale_override=1.0,
        sliding_window=int(hf.get("window_size", 256)) if has_local else None,
        layer_types=tuple(
            "sliding_attention" if t == "local" else "full_attention"
            for t in layers
        )
        if has_local
        else (),
        tie_embeddings=bool(hf.get("tie_word_embeddings", True)),
        remat=remat,
        dtype=dtype,
    )


def _hf_biogpt(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF BioGptConfig -> native.  OPT-style pre-norm blocks (biased
    everything, exact-gelu non-gated MLP, learned +2-offset positions
    dropped on load) plus the sqrt(dim) embedding scale
    (BioGptScaledWordEmbedding)."""
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=int(hf["hidden_size"]),
        n_layers=int(hf["num_hidden_layers"]),
        n_heads=int(hf["num_attention_heads"]),
        n_kv_heads=int(hf["num_attention_heads"]),
        hidden_dim=int(hf["intermediate_size"]),
        norm_eps=float(hf.get("layer_norm_eps", 1e-12)),
        norm_type="layernorm",
        mlp_gated=False,
        mlp_bias=True,
        mlp_act=_hf_act(hf.get("hidden_act", "gelu")),
        qkv_bias=True,
        o_proj_bias=True,
        learned_pos=int(hf["max_position_embeddings"]),
        use_rope=False,
        scale_embeddings=bool(hf.get("scale_embedding", True)),
        tie_embeddings=True,
        remat=remat,
        dtype=dtype,
    )


def _hf_gptj(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF GPTJConfig -> native.  The namesake pair-interleaved rotary over
    the first rotary_dim dims, a single shared norm feeding parallel
    attention+MLP (one_norm), bias-free separate q/k/v/out projections, a
    biased non-gated gelu_new MLP, and an untied lm_head WITH bias."""
    dim = int(hf["n_embd"])
    n_heads = int(hf["n_head"])
    hd = dim // n_heads
    inner = hf.get("n_inner")
    rotary_dim = hf.get("rotary_dim")
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=dim,
        n_layers=int(hf["n_layer"]),
        n_heads=n_heads,
        n_kv_heads=n_heads,
        hidden_dim=int(inner) if inner else 4 * dim,
        norm_eps=float(hf.get("layer_norm_epsilon", 1e-5)),
        norm_type="layernorm",
        mlp_gated=False,
        mlp_bias=True,
        mlp_act=_hf_act(hf.get("activation_function", "gelu_new")),
        rope_theta=10000.0,
        rope_interleaved=True,
        rope_partial_factor=(
            int(rotary_dim) / hd if rotary_dim and int(rotary_dim) < hd else None
        ),
        parallel_residual="one_norm",
        tie_embeddings=bool(hf.get("tie_word_embeddings", False)),
        lm_head_bias=True,
        remat=remat,
        dtype=dtype,
    )


def _hf_opt(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF OPTConfig -> native.  Learned positions with the checkpoint's
    +2 offset rows DROPPED by the translator (equivalent for the
    non-padded absolute positions this decoder uses), pre-LN blocks,
    biased non-gated relu MLP.  The 350m layout (word_embed_proj_dim !=
    hidden_size, do_layer_norm_before=False) is refused."""
    dim = int(hf["hidden_size"])
    if int(hf.get("word_embed_proj_dim", dim)) != dim:
        raise ValueError(
            "opt word_embed_proj_dim != hidden_size (project_in/out, the "
            "350m layout) is not implemented; use a custom builder"
        )
    if not hf.get("do_layer_norm_before", True):
        raise ValueError(
            "opt do_layer_norm_before=False (the 350m post-norm layout) "
            "is not implemented; use a custom builder"
        )
    if not hf.get("layer_norm_elementwise_affine", True):
        raise ValueError("opt layer_norm_elementwise_affine=False unsupported")
    bias = bool(hf.get("enable_bias", True))
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=dim,
        n_layers=int(hf["num_hidden_layers"]),
        n_heads=int(hf["num_attention_heads"]),
        n_kv_heads=int(hf["num_attention_heads"]),
        hidden_dim=int(hf["ffn_dim"]),
        norm_eps=1e-5,
        norm_type="layernorm",
        mlp_gated=False,
        mlp_bias=bias,
        mlp_act=_hf_act(hf.get("activation_function", "relu")),
        qkv_bias=bias,
        o_proj_bias=bias,
        use_rope=False,
        learned_pos=int(hf["max_position_embeddings"]),
        tie_embeddings=bool(hf.get("tie_word_embeddings", True)),
        remat=remat,
        dtype=dtype,
    )


def _hf_bloom(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF BloomConfig -> native.  ALiBi positions (no rope), a LayerNorm
    over the word embeddings before block 0 (word_embeddings_layernorm),
    biased per-head-fused query_key_value split on load
    (hf_loader.translate_bloom_state_dict), biased tanh-gelu MLP, tied
    embeddings."""
    if hf.get("apply_residual_connection_post_layernorm"):
        raise ValueError(
            "bloom apply_residual_connection_post_layernorm unsupported"
        )
    dim = int(hf.get("hidden_size", hf.get("n_embed", 0)))
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=dim,
        n_layers=int(hf.get("n_layer", hf.get("num_hidden_layers", 0))),
        n_heads=int(hf.get("n_head", hf.get("num_attention_heads", 0))),
        n_kv_heads=int(hf.get("n_head", hf.get("num_attention_heads", 0))),
        hidden_dim=4 * dim,
        norm_eps=float(hf.get("layer_norm_epsilon", 1e-5)),
        norm_type="layernorm",
        mlp_gated=False,
        mlp_bias=True,
        mlp_act="gelu_tanh",
        qkv_bias=True,
        o_proj_bias=True,
        use_rope=False,
        use_alibi=True,
        embed_norm=True,
        tie_embeddings=bool(hf.get("tie_word_embeddings", True)),
        remat=remat,
        dtype=dtype,
    )


def _hf_mpt(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF MptConfig -> native.  ALiBi, bias-free everything (no_bias),
    bias-free LayerNorms, straight-thirds fused Wqkv split on load
    (hf_loader.translate_mpt_state_dict), non-gated exact-gelu MLP at
    expansion_ratio, tied embeddings (mpt has no untied variant)."""
    attn_cfg = hf.get("attn_config", {})
    if not attn_cfg.get("alibi", True):
        raise ValueError("mpt attn_config.alibi=False unsupported (use rope?)")
    if attn_cfg.get("qk_ln"):
        raise ValueError("mpt attn_config.qk_ln unsupported")
    n_heads = int(hf.get("n_heads", 0))
    if n_heads & (n_heads - 1):
        raise ValueError(
            "mpt with non-power-of-2 n_heads unsupported (mpt's gen_slopes "
            "interleaving differs from the ALiBi-paper construction there)"
        )
    if float(attn_cfg.get("alibi_bias_max", 8)) != 8.0:
        raise ValueError("mpt alibi_bias_max != 8 unsupported")
    if not hf.get("no_bias", True):
        raise ValueError("mpt no_bias=False unsupported")
    dim = int(hf["d_model"])
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=dim,
        n_layers=int(hf["n_layers"]),
        n_heads=n_heads,
        n_kv_heads=int(attn_cfg.get("kv_n_heads", n_heads)),
        hidden_dim=int(hf.get("expansion_ratio", 4)) * dim,
        norm_eps=1e-5,
        norm_type="layernorm",
        norm_bias=False,
        mlp_gated=False,
        mlp_bias=False,
        mlp_act="gelu_exact",
        qkv_bias=False,
        o_proj_bias=False,
        use_rope=False,
        use_alibi=True,
        tie_embeddings=True,
        remat=remat,
        dtype=dtype,
    )


def _hf_gpt_bigcode(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF GPTBigCodeConfig (starcoder1/santacoder) -> native.  gpt2-style
    learned positions + pre-LN + biased tanh-gelu MLP, but plain Linear
    projections and multi-query attention: the fused c_attn packs
    [q (dim), k (head_dim), v (head_dim)] rows, split on load onto
    q/k/v_proj with n_kv_heads=1 (hf_loader.translate_gpt_bigcode_
    state_dict)."""
    if not hf.get("multi_query", True):
        raise ValueError("gpt_bigcode multi_query=False unsupported")
    dim = int(hf["n_embd"])
    n_heads = int(hf["n_head"])
    inner = hf.get("n_inner")
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=dim,
        n_layers=int(hf["n_layer"]),
        n_heads=n_heads,
        n_kv_heads=1,
        hidden_dim=int(inner) if inner else 4 * dim,
        norm_eps=float(hf.get("layer_norm_epsilon", 1e-5)),
        norm_type="layernorm",
        mlp_gated=False,
        mlp_bias=True,
        mlp_act=_hf_act(hf.get("activation_function", "gelu_pytorch_tanh")),
        qkv_bias=True,
        o_proj_bias=True,
        use_rope=False,
        learned_pos=int(hf["n_positions"]),
        query_scale_override=(
            None if hf.get("scale_attn_weights", True) else 1.0
        ),
        tie_embeddings=True,
        remat=remat,
        dtype=dtype,
    )


def _llama3_scale_freqs(
    inv_freq: jax.Array, scaling: tuple[float, float, float, int]
) -> jax.Array:
    """HF llama3 rope scaling (transformers _compute_llama3_parameters):
    frequencies whose wavelength exceeds the original context are divided
    by ``factor``, high frequencies pass through, and the band between is
    smoothly interpolated.  Applies at EVERY position (not just long
    context), so Llama-3.1/3.2 checkpoints need it for correct logits."""
    factor, low_freq_factor, high_freq_factor, old_len = scaling
    import math

    wavelen = 2.0 * math.pi / inv_freq
    low_freq_wavelen = old_len / low_freq_factor
    high_freq_wavelen = old_len / high_freq_factor
    scaled = jnp.where(wavelen > low_freq_wavelen, inv_freq / factor, inv_freq)
    smooth = (old_len / wavelen - low_freq_factor) / (
        high_freq_factor - low_freq_factor
    )
    smoothed = (1.0 - smooth) / factor * inv_freq + smooth * inv_freq
    is_medium = (wavelen >= high_freq_wavelen) & (wavelen <= low_freq_wavelen)
    return jnp.where(is_medium, smoothed, scaled)


def yarn_parameters(
    head_dim: int, theta: float, scaling: dict, max_pos: int
) -> tuple[tuple, float]:
    """Yarn inverse frequencies + attention factor, mirroring HF
    _compute_yarn_parameters (transformers modeling_rope_utils): low
    frequencies are interpolated by ``factor``, high frequencies
    extrapolated unchanged, with a linear ramp between the beta_fast /
    beta_slow rotation boundaries; cos/sin are scaled by the attention
    factor (0.1·mscale·ln(factor)+1 unless given).  Returned as plain
    floats so the result can live in a static (hashable) module field."""
    import math

    factor = float(scaling["factor"])
    attention_factor = scaling.get("attention_factor")
    mscale = scaling.get("mscale")
    mscale_all_dim = scaling.get("mscale_all_dim")
    original_max = int(
        scaling.get("original_max_position_embeddings") or max_pos
    )

    def get_mscale(scale: float, m: float = 1.0) -> float:
        return 0.1 * m * math.log(scale) + 1.0 if scale > 1 else 1.0

    if attention_factor is None:
        if mscale and mscale_all_dim:
            attention_factor = get_mscale(factor, mscale) / get_mscale(
                factor, mscale_all_dim
            )
        else:
            attention_factor = get_mscale(factor)
    beta_fast = float(scaling.get("beta_fast") or 32.0)
    beta_slow = float(scaling.get("beta_slow") or 1.0)
    truncate = bool(scaling.get("truncate", True))

    def correction_dim(num_rotations: float) -> float:
        return (
            head_dim
            * math.log(original_max / (num_rotations * 2 * math.pi))
        ) / (2 * math.log(theta))

    low, high = correction_dim(beta_fast), correction_dim(beta_slow)
    if truncate:
        low, high = math.floor(low), math.ceil(high)
    low, high = max(low, 0.0), min(high, head_dim - 1)
    if low == high:
        high += 0.001
    pos_freqs = np.asarray(
        [theta ** (2 * i / head_dim) for i in range(head_dim // 2)],
        np.float64,
    )
    extrap = 1.0 / pos_freqs
    interp = 1.0 / (factor * pos_freqs)
    ramp = np.clip(
        (np.arange(head_dim // 2, dtype=np.float64) - low) / (high - low),
        0.0,
        1.0,
    )
    extrap_factor = 1.0 - ramp
    inv_freq = interp * (1 - extrap_factor) + extrap * extrap_factor
    return tuple(float(v) for v in inv_freq), float(attention_factor)


def _rope(
    x: jax.Array,
    positions: jax.Array,
    theta: float,
    llama3_scaling: Optional[tuple[float, float, float, int]] = None,
    partial_dim: Optional[int] = None,
    interleaved: bool = False,
    yarn: Optional[tuple] = None,
) -> jax.Array:
    """Rotary embedding.  Default: split-half convention (HF llama
    rotate_half).  ``partial_dim`` rotates only the first that many dims of
    each head (the rest pass through) and ``interleaved`` switches to the
    pair-interleaved GPT-J convention — together they are glm4's rotary
    (HF Glm4 apply_rotary_pos_emb: repeat_interleaved cos/sin over the
    leading partial_rotary_factor*head_dim dims).  x: (B, S, H, hd)."""
    if partial_dim is not None and partial_dim < x.shape[-1]:
        xr, xp = x[..., :partial_dim], x[..., partial_dim:]
    else:
        xr, xp = x, None
    half = xr.shape[-1] // 2
    attn_factor = 1.0
    if yarn is not None:
        inv_freq, attn_factor = yarn
        freqs = jnp.asarray(inv_freq, jnp.float32)
    else:
        freqs = 1.0 / (
            theta ** (jnp.arange(0, half, dtype=jnp.float32) / half)
        )
    if llama3_scaling is not None:
        freqs = _llama3_scale_freqs(freqs, llama3_scaling)
    angles = positions[:, :, None].astype(jnp.float32) * freqs  # (B,S,half)
    cos = jnp.cos(angles)[:, :, None, :] * attn_factor
    sin = jnp.sin(angles)[:, :, None, :] * attn_factor
    if interleaved:
        x1, x2 = xr[..., 0::2], xr[..., 1::2]
    else:
        x1, x2 = xr[..., :half], xr[..., half:]
    xf1, xf2 = x1.astype(jnp.float32), x2.astype(jnp.float32)
    o1, o2 = xf1 * cos - xf2 * sin, xf2 * cos + xf1 * sin
    if interleaved:
        out = jnp.stack([o1, o2], axis=-1).reshape(xr.shape)
    else:
        out = jnp.concatenate([o1, o2], axis=-1)
    out = out.astype(x.dtype)
    if xp is not None:
        out = jnp.concatenate([out, xp], axis=-1)
    return out


def alibi_slopes(n_heads: int) -> np.ndarray:
    """Per-head ALiBi slopes, the closest-power-of-2 construction from the
    ALiBi paper that HF's ``build_alibi_tensor`` (bloom) implements: for
    2^k heads, slopes are ``2^(-8i/n)`` for i in 1..n; otherwise the
    power-of-2 prefix plus interleaved slopes from the doubled table.
    MPT's ``gen_slopes`` agrees for power-of-2 head counts (every released
    MPT model); the mpt constructor guards the rest."""
    import math

    def pow2_slopes(n: int) -> list[float]:
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start**i) for i in range(n)]

    if math.log2(n_heads).is_integer():
        return np.asarray(pow2_slopes(n_heads), np.float32)
    base = 2 ** math.floor(math.log2(n_heads))
    extra = pow2_slopes(2 * base)[0::2][: n_heads - base]
    return np.asarray(pow2_slopes(base) + extra, np.float32)


def _make_qk_norm(cfg: "TransformerConfig", width: int):
    if cfg.qk_norm_type == "layernorm":  # persimmon/phi2 qk_layernorm
        return nn.LayerNorm.create(width, True, cfg.norm_eps, cfg.dtype)
    return nn.RMSNorm.create(
        width, cfg.norm_eps, cfg.dtype, plus_one=cfg.norm_plus_one
    )


def _hf_bitnet(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF BitNetConfig -> native.  The llama graph plus two sub-RMSNorms:
    attn_sub_norm on the merged attention output before o_proj and
    ffn_sub_norm on the activation product before down_proj
    (BitNetAttention/BitNetMLP), with a relu^2 gated MLP.  The public HF
    modeling runs plain Linears (the ternary quantization lives in the
    quantizer config, not the graph)."""
    n_heads = int(hf["num_attention_heads"])
    dim = int(hf["hidden_size"])
    head_dim = hf.get("head_dim")
    bias = bool(hf.get("attention_bias", False))
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=dim,
        n_layers=int(hf["num_hidden_layers"]),
        n_heads=n_heads,
        n_kv_heads=int(hf.get("num_key_value_heads") or n_heads),
        hidden_dim=int(hf["intermediate_size"]),
        norm_eps=float(hf.get("rms_norm_eps", 1e-5)),
        head_dim_override=(
            int(head_dim)
            if head_dim is not None and int(head_dim) * n_heads != dim
            else None
        ),
        sub_norms=True,
        mlp_act=_hf_act(hf.get("hidden_act", "relu2")),
        qkv_bias=bias,
        o_proj_bias=bias,
        rope_theta=float(hf.get("rope_theta", 500000.0)),
        tie_embeddings=bool(hf.get("tie_word_embeddings", False)),
        remat=remat,
        dtype=dtype,
    )


def _int_or_uniform(v: Any, what: str) -> int:
    """hunyuan configs may carry per-layer lists for num_experts/moe_topk;
    only the uniform case is expressible by one TransformerConfig."""
    if isinstance(v, (list, tuple)):
        vals = set(int(x) for x in v)
        if len(vals) != 1:
            raise ValueError(
                f"per-layer heterogeneous {what}={v!r} is not supported"
            )
        return vals.pop()
    return int(v)


def _hf_hunyuan_moe(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF HunYuanMoEV1Config -> native.  The hunyuan dense graph (per-head
    q/k RMSNorms named query/key_layernorm) where every MLP is a
    mixtral-routed MoE (softmax -> top-k -> renormalize,
    HunYuanMoEV1Moe.forward) at expert width intermediate_size plus an
    ALWAYS-ON ungated shared MLP of the same width; the fp32 router
    weight lives at mlp.gate.wg (renamed on load)."""
    if hf.get("rope_scaling") is not None:
        raise ValueError(
            "hunyuan rope_scaling is not implemented; use a custom builder"
        )
    n_heads = int(hf["num_attention_heads"])
    dim = int(hf["hidden_size"])
    head_dim = hf.get("head_dim")
    bias = bool(hf.get("attention_bias", False))
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=dim,
        n_layers=int(hf["num_hidden_layers"]),
        n_heads=n_heads,
        n_kv_heads=int(hf.get("num_key_value_heads") or n_heads),
        hidden_dim=int(hf["intermediate_size"]),
        norm_eps=float(hf.get("rms_norm_eps", 1e-5)),
        head_dim_override=(
            int(head_dim)
            if head_dim is not None and int(head_dim) * n_heads != dim
            else None
        ),
        qk_norm=True,
        mlp_act=_hf_act(hf.get("hidden_act", "silu")),
        qkv_bias=bias,
        o_proj_bias=bias,
        rope_theta=float(hf.get("rope_theta", 10000.0)),
        n_experts=_int_or_uniform(hf["num_experts"], "num_experts"),
        n_experts_per_tok=_int_or_uniform(
            hf.get("moe_topk", 1), "moe_topk"
        ),
        norm_topk_prob=True,
        moe_hidden_dim=int(hf["intermediate_size"]),
        shared_expert_hidden_dim=int(hf["intermediate_size"]),
        shared_expert_gated=False,
        tie_embeddings=bool(hf.get("tie_word_embeddings", False)),
        remat=remat,
        dtype=dtype,
    )


def _hf_ernie4_5_moe(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF Ernie4_5_MoeConfig -> native.  The ernie4_5 graph (full-dim
    interleaved rope, one use_bias knob) where a layer is MoE iff
    (i+1) % moe_layer_interval == 0 and start <= i <= end
    (Ernie4_5_MoeDecoderLayer) — expressed as mlp_only_layers over the
    complement.  Routing: softmax scores in fp32, SELECTION biased by
    moe_statics.e_score_correction_bias, combine weights gathered from
    the raw softmax and renormalized with the denominator clamped at
    moe_norm_min (Ernie4_5_MoeSparseMoeBlock); optional ungated shared
    experts at moe_intermediate_size * moe_num_shared_experts."""
    bias = bool(hf.get("use_bias", False))
    n_heads = int(hf["num_attention_heads"])
    dim = int(hf["hidden_size"])
    head_dim = hf.get("head_dim")
    n_layers = int(hf["num_hidden_layers"])
    interval = int(hf.get("moe_layer_interval", 1))
    start = int(hf.get("moe_layer_start_index", 0))
    end_raw = hf.get("moe_layer_end_index")
    end = n_layers - 1 if end_raw is None or int(end_raw) < 0 else int(end_raw)
    mlp_only = tuple(
        i
        for i in range(n_layers)
        if not ((i + 1) % interval == 0 and start <= i <= end)
    )
    n_shared = int(hf.get("moe_num_shared_experts") or 0)
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=dim,
        n_layers=n_layers,
        n_heads=n_heads,
        n_kv_heads=int(hf.get("num_key_value_heads") or n_heads),
        hidden_dim=int(hf["intermediate_size"]),
        norm_eps=float(hf.get("rms_norm_eps", 1e-5)),
        head_dim_override=(
            int(head_dim)
            if head_dim is not None and int(head_dim) * n_heads != dim
            else None
        ),
        mlp_act=_hf_act(hf.get("hidden_act", "silu")),
        mlp_bias=bias,
        qkv_bias=bias,
        o_proj_bias=bias,
        rope_theta=float(hf.get("rope_theta", 10000.0)),
        rope_interleaved=True,
        n_experts=int(hf["moe_num_experts"]),
        n_experts_per_tok=int(hf.get("moe_k", 2)),
        norm_topk_prob=True,
        router_norm_min=float(hf.get("moe_norm_min", 1e-12)),
        router_correction_bias=True,
        moe_hidden_dim=int(hf["moe_intermediate_size"]),
        mlp_only_layers=mlp_only,
        shared_expert_hidden_dim=(
            int(hf["moe_intermediate_size"]) * n_shared
            if n_shared > 0
            else None
        ),
        shared_expert_gated=False,
        tie_embeddings=bool(hf.get("tie_word_embeddings", True)),
        remat=remat,
        dtype=dtype,
    )


def _hf_aria_text(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF AriaTextConfig -> native.  The llama graph where every MLP is a
    MoE routed gpt_oss-style (top-k on the raw router logits, softmax
    over just those k — AriaTextMoELayer.forward) at expert width
    intermediate_size, plus an always-on ungated shared MLP at
    intermediate_size * moe_num_shared_experts.  The fused grouped-GEMM
    expert tensors (fc1 (E, d, 2h) in (projection, gate) order, fc2
    (E, h, d)) are split per expert on load
    (hf_loader.translate_aria_state_dict)."""
    n_heads = int(hf["num_attention_heads"])
    dim = int(hf["hidden_size"])
    head_dim = hf.get("head_dim")
    bias = bool(hf.get("attention_bias", False))
    if hf.get("rope_scaling") is not None:
        raise ValueError(
            "aria rope_scaling is not implemented; use a custom builder"
        )
    n_shared = int(hf.get("moe_num_shared_experts") or 0)
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=dim,
        n_layers=int(hf["num_hidden_layers"]),
        n_heads=n_heads,
        n_kv_heads=int(hf.get("num_key_value_heads") or n_heads),
        hidden_dim=int(hf["intermediate_size"]),
        norm_eps=float(hf.get("rms_norm_eps", 1e-5)),
        head_dim_override=(
            int(head_dim)
            if head_dim is not None and int(head_dim) * n_heads != dim
            else None
        ),
        mlp_act=_hf_act(hf.get("hidden_act", "silu")),
        qkv_bias=bias,
        o_proj_bias=bias,
        rope_theta=float(hf.get("rope_theta", 10000.0)),
        n_experts=int(hf["moe_num_experts"]),
        n_experts_per_tok=int(hf.get("moe_topk", 2)),
        router_softmax_after_topk=True,
        moe_hidden_dim=int(hf["intermediate_size"]),
        shared_expert_hidden_dim=(
            int(hf["intermediate_size"]) * n_shared if n_shared > 0 else None
        ),
        shared_expert_gated=False,
        tie_embeddings=bool(hf.get("tie_word_embeddings", False)),
        remat=remat,
        dtype=dtype,
    )


def _hf_xglm(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF XGLMConfig -> native.  OPT-style pre-norm biased blocks with a
    final LayerNorm, exact-gelu non-gated MLP, sqrt(d_model) embedding
    scale, and DETERMINISTIC fairseq sinusoidal positions with the +2
    index offset (XGLMSinusoidalPositionalEmbedding — no checkpoint
    weight; computed on the fly)."""
    if hf.get("activation_function", "gelu") != "gelu":
        raise ValueError(
            f"xglm activation {hf.get('activation_function')!r} is not "
            "implemented"
        )
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=int(hf["d_model"]),
        n_layers=int(hf["num_layers"]),
        n_heads=int(hf["attention_heads"]),
        n_kv_heads=int(hf["attention_heads"]),
        hidden_dim=int(hf["ffn_dim"]),
        norm_eps=1e-5,
        norm_type="layernorm",
        mlp_gated=False,
        mlp_bias=True,
        mlp_act="gelu_exact",
        qkv_bias=True,
        o_proj_bias=True,
        use_rope=False,
        sinusoidal_pos=True,
        scale_embeddings=bool(hf.get("scale_embedding", True)),
        tie_embeddings=bool(hf.get("tie_word_embeddings", True)),
        remat=remat,
        dtype=dtype,
    )


def _hf_codegen(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF CodeGenConfig -> native.  The gptj graph (pair-interleaved
    partial rotary over rotary_dim, one shared norm feeding parallel
    attention+MLP, biased gelu_new MLP, biased untied lm_head) with
    bias-free FUSED qkv in the mp_num=4 sharded (q, v, k) layout — split
    on load (hf_loader.translate_codegen_state_dict)."""
    dim = int(hf["n_embd"])
    n_heads = int(hf["n_head"])
    hd = dim // n_heads
    rotary_dim = hf.get("rotary_dim")
    if not rotary_dim:
        raise ValueError(
            "codegen without rotary_dim is not implemented (the fallback "
            "rotates the whole embed dim, not per-head dims)"
        )
    inner = hf.get("n_inner")
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=dim,
        n_layers=int(hf["n_layer"]),
        n_heads=n_heads,
        n_kv_heads=n_heads,
        hidden_dim=int(inner) if inner else 4 * dim,
        norm_eps=float(hf.get("layer_norm_epsilon", 1e-5)),
        norm_type="layernorm",
        mlp_gated=False,
        mlp_bias=True,
        mlp_act=_hf_act(hf.get("activation_function", "gelu_new")),
        rope_theta=10000.0,
        rope_interleaved=True,
        rope_partial_factor=(
            int(rotary_dim) / hd if int(rotary_dim) < hd else None
        ),
        parallel_residual="one_norm",
        tie_embeddings=bool(hf.get("tie_word_embeddings", False)),
        lm_head_bias=True,
        remat=remat,
        dtype=dtype,
    )


def _hf_gpt_neox_japanese(
    hf: dict, dtype: Any, remat: bool
) -> "TransformerConfig":
    """HF GPTNeoXJapaneseConfig -> native.  SEQUENTIAL-residual neox
    blocks (unlike gpt_neox's parallel default): per-head-fused bias-free
    query_key_value, partial split-half rotary at rotary_pct, bias-free
    non-gated exact-gelu MLP at dim * intermediate_multiple_size, and an
    attention dense bias ON THE LAST LAYER ONLY (zero-filled elsewhere by
    the translator)."""
    dim = int(hf["hidden_size"])
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=dim,
        n_layers=int(hf["num_hidden_layers"]),
        n_heads=int(hf["num_attention_heads"]),
        n_kv_heads=int(hf["num_attention_heads"]),
        hidden_dim=int(dim * float(hf.get("intermediate_multiple_size", 4))),
        norm_eps=float(hf.get("layer_norm_eps", 1e-5)),
        norm_type="layernorm",
        mlp_gated=False,
        mlp_bias=False,
        mlp_act=_hf_act(hf.get("hidden_act", "gelu")),
        qkv_bias=False,
        o_proj_bias=True,  # last layer only; others zero-filled on load
        rope_theta=float(hf.get("rotary_emb_base", 10000.0)),
        rope_partial_factor=(
            pct if (pct := float(hf.get("rotary_pct", 1.0))) < 1.0 else None
        ),
        tie_embeddings=bool(hf.get("tie_word_embeddings", False)),
        remat=remat,
        dtype=dtype,
    )


def _hf_diffllama(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF DiffLlamaConfig -> native.  The llama graph with DIFFERENTIAL
    attention (see DiffAttention): per-layer lambda_init
    0.8 - 0.6*exp(-0.3*i), learned lambda q/k vector pairs, affine-free
    RMS groupnorm over paired 2*head_dim values, (1 - lambda_init) output
    scale.  attention_bias covers all four projections."""
    if hf.get("rope_scaling") is not None:
        raise ValueError(
            "diffllama rope_scaling is not implemented; use a custom builder"
        )
    n_heads = int(hf["num_attention_heads"])
    if n_heads % 2:
        raise ValueError("differential attention needs an even head count")
    dim = int(hf["hidden_size"])
    head_dim = hf.get("head_dim")
    bias = bool(hf.get("attention_bias", False))
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=dim,
        n_layers=int(hf["num_hidden_layers"]),
        n_heads=n_heads,
        n_kv_heads=int(hf.get("num_key_value_heads") or n_heads),
        hidden_dim=int(hf["intermediate_size"]),
        norm_eps=float(hf.get("rms_norm_eps", 1e-5)),
        head_dim_override=(
            int(head_dim)
            if head_dim is not None and int(head_dim) * n_heads != dim
            else None
        ),
        diff_attention=True,
        mlp_act=_hf_act(hf.get("hidden_act", "silu")),
        qkv_bias=bias,
        o_proj_bias=bias,
        rope_theta=float(hf.get("rope_theta", 10000.0)),
        tie_embeddings=bool(hf.get("tie_word_embeddings", False)),
        remat=remat,
        dtype=dtype,
    )


def _hf_phimoe(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF PhimoeConfig -> native.  Mixtral's expert layout under
    LAYERNORM block norms, routed by the eval-deterministic sparsemixer
    (sequential top-2, per-pick locally-masked softmax weights — HF
    sparsemixer()'s inference path), attention_bias covering all four
    projections and an optional lm_head bias."""
    if hf.get("rope_scaling") is not None:
        raise ValueError(
            "phimoe longrope rope_scaling is not implemented; use a "
            "custom builder"
        )
    bias = bool(hf.get("attention_bias", False))
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=int(hf["hidden_size"]),
        n_layers=int(hf["num_hidden_layers"]),
        n_heads=int(hf["num_attention_heads"]),
        n_kv_heads=int(
            hf.get("num_key_value_heads") or hf["num_attention_heads"]
        ),
        hidden_dim=int(hf["intermediate_size"]),
        norm_eps=float(hf.get("rms_norm_eps", 1e-5)),
        norm_type="layernorm",
        mlp_act=_hf_act(hf.get("hidden_act", "silu")),
        qkv_bias=bias,
        o_proj_bias=bias,
        rope_theta=float(hf.get("rope_theta", 10000.0)),
        n_experts=int(hf["num_local_experts"]),
        n_experts_per_tok=int(hf.get("num_experts_per_tok", 2)),
        router_sparsemixer=True,
        router_jitter_eps=float(hf.get("router_jitter_noise", 0.01)),
        lm_head_bias=bool(hf.get("lm_head_bias", False)),
        tie_embeddings=bool(hf.get("tie_word_embeddings", False)),
        remat=remat,
        dtype=dtype,
    )


def _hf_modernbert_decoder(
    hf: dict, dtype: Any, remat: bool
) -> "TransformerConfig":
    """HF ModernBertDecoderConfig -> native.  Pre-LN blocks where LAYER 0
    HAS NO ATTENTION NORM (nn.Identity), a LayerNorm over the token
    embedding, alternating global/sliding layers with PER-TYPE rope
    thetas (global_rope_theta / local_rope_theta), a fused-Wi gated GLU
    (act applies to the FIRST chunk — split on load), and a
    dense+act+norm prediction head whose tied output matmul carries a
    separate decoder bias."""
    layer_types = tuple(hf.get("layer_types") or ())
    if not layer_types:
        every = int(hf.get("global_attn_every_n_layers", 3))
        layer_types = tuple(
            "full_attention" if i % every == 0 else "sliding_attention"
            for i in range(int(hf["num_hidden_layers"]))
        )
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=int(hf["hidden_size"]),
        n_layers=int(hf["num_hidden_layers"]),
        n_heads=int(hf["num_attention_heads"]),
        n_kv_heads=int(hf["num_attention_heads"]),
        hidden_dim=int(hf["intermediate_size"]),
        norm_eps=float(hf.get("norm_eps", 1e-5)),
        norm_type="layernorm",
        norm_bias=bool(hf.get("norm_bias", False)),
        mlp_act=_hf_act(hf.get("hidden_activation", "gelu")),
        mlp_bias=bool(hf.get("mlp_bias", False)),
        qkv_bias=bool(hf.get("attention_bias", False)),
        o_proj_bias=bool(hf.get("attention_bias", False)),
        rope_theta=float(hf.get("global_rope_theta", 160000.0)),
        rope_local_theta=float(hf.get("local_rope_theta", 160000.0)),
        sliding_window=(
            int(hf["sliding_window"])
            if hf.get("sliding_window") is not None
            else None
        ),
        layer_types=layer_types,
        first_layer_no_attn_norm=True,
        embed_norm=True,
        head_transform=True,
        head_transform_act=_hf_act(
            hf.get("classifier_activation", "gelu")
        ),
        head_transform_bias=bool(hf.get("classifier_bias", False)),
        lm_head_bias=bool(hf.get("decoder_bias", True)),
        tie_embeddings=bool(hf.get("tie_word_embeddings", True)),
        remat=remat,
        dtype=dtype,
    )


def _hf_doge(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF DogeConfig -> native.  The llama graph with per-head q/k
    RMSNorms, DYNAMIC-MASK attention (per-kv-head additive key bias
    exp(A*softplus(dt_proj(v))); exact for seqlen <= keep_window_size —
    the top-k masking beyond is refused at trace time), and learned
    per-channel residual scales (input_residual /
    post_attention_residual).  The CDMoE variant (is_moe) is not
    implemented."""
    if hf.get("is_moe"):
        raise ValueError(
            "doge CDMoE (is_moe=True) is not implemented; use a custom "
            "builder"
        )
    rs = hf.get("rope_scaling")
    if rs is not None and rs.get("rope_type", rs.get("type")) not in (
        None,
        "default",
    ):
        raise ValueError(
            f"doge rope_scaling {rs!r} is not implemented; use a custom "
            "builder"
        )
    n_heads = int(hf["num_attention_heads"])
    dim = int(hf["hidden_size"])
    head_dim = hf.get("head_dim")
    bias = bool(hf.get("attention_bias", False))
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=dim,
        n_layers=int(hf["num_hidden_layers"]),
        n_heads=n_heads,
        n_kv_heads=int(hf.get("num_key_value_heads") or n_heads),
        hidden_dim=int(hf["intermediate_size"]),
        norm_eps=float(hf.get("rms_norm_eps", 1e-6)),
        head_dim_override=(
            int(head_dim)
            if head_dim is not None and int(head_dim) * n_heads != dim
            else None
        ),
        qk_norm=True,
        dyn_mask_keep_window=int(hf.get("keep_window_size", 2048)),
        residual_scales=True,
        mlp_act=_hf_act(hf.get("hidden_act", "silu")),
        mlp_bias=bool(hf.get("mlp_bias", False)),
        qkv_bias=bias,
        o_proj_bias=bias,
        rope_theta=float(hf.get("rope_theta", 10000.0)),
        tie_embeddings=bool(hf.get("tie_word_embeddings", True)),
        remat=remat,
        dtype=dtype,
    )


def _hf_bamba(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF BambaConfig -> native.  A hybrid decoder: layers_block_type
    selects per layer between a Mamba2 (SSD) mixer and partial-rotary
    GQA attention; every layer keeps the llama MLP with the pre_ff
    norm (renamed post_attention_layernorm on load).  The mixer params
    match Mamba2Mixer field-for-field (renamed mamba -> self_attn)."""
    from . import ssm

    if hf.get("rope_scaling") is not None:
        raise ValueError(
            "bamba rope_scaling is not implemented; use a custom builder"
        )
    n_heads = int(hf["num_attention_heads"])
    dim = int(hf["hidden_size"])
    n_layers = int(hf["num_hidden_layers"])
    # layers_block_type is a derived property (not serialized): attention
    # layers are the attn_layer_indices, everything else is mamba
    lbt = hf.get("layers_block_type")
    if lbt:
        layer_types = tuple(str(t) for t in lbt)
    else:
        attn_idx = set(int(i) for i in (hf.get("attn_layer_indices") or ()))
        layer_types = tuple(
            "attention" if i in attn_idx else "mamba"
            for i in range(n_layers)
        )
    pct = float(hf.get("partial_rotary_factor", 0.5))
    mamba_cfg = ssm.MambaConfig(
        version=2,
        vocab_size=int(hf["vocab_size"]),
        dim=dim,
        n_layers=n_layers,
        d_inner=int(hf.get("mamba_expand", 2)) * dim,
        d_state=int(hf.get("mamba_d_state", 128)),
        d_conv=int(hf.get("mamba_d_conv", 4)),
        n_heads=int(hf["mamba_n_heads"]),
        head_dim=int(hf.get("mamba_d_head") or 64),
        n_groups=int(hf.get("mamba_n_groups", 1)),
        chunk_size=int(hf.get("mamba_chunk_size", 256)),
        conv_bias=bool(hf.get("mamba_conv_bias", True)),
        proj_bias=bool(hf.get("mamba_proj_bias", False)),
        norm_eps=float(hf.get("rms_norm_eps", 1e-5)),
        dtype=dtype,
    )
    bias = bool(hf.get("attention_bias", False))
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=dim,
        n_layers=n_layers,
        n_heads=n_heads,
        n_kv_heads=int(hf.get("num_key_value_heads") or n_heads),
        hidden_dim=int(hf["intermediate_size"]),
        norm_eps=float(hf.get("rms_norm_eps", 1e-5)),
        mlp_act=_hf_act(hf.get("hidden_act", "silu")),
        mlp_bias=bool(hf.get("mlp_bias", False)),
        qkv_bias=bias,
        o_proj_bias=bias,
        rope_theta=float(hf.get("rope_theta", 10000.0)),
        rope_partial_factor=pct if pct < 1.0 else None,
        layer_types=layer_types,
        mamba=mamba_cfg,
        tie_embeddings=bool(hf.get("tie_word_embeddings", False)),
        remat=remat,
        dtype=dtype,
    )


def _hf_granitemoehybrid(
    hf: dict, dtype: Any, remat: bool
) -> "TransformerConfig":
    """HF GraniteMoeHybridConfig -> native.  The granitemoeshared graph
    (scalar multipliers, topk-then-softmax router, fused shared MLP)
    where layer_types selects per layer between a Mamba2 mixer and GQA
    attention; attention layers rotate ONLY when position_embedding_type
    == 'rope' (the released checkpoints are NoPE)."""
    from . import ssm

    base = _hf_granitemoe(hf, dtype, remat)
    dim = base.dim
    n_layers = base.n_layers
    layer_types = tuple(
        str(t) for t in (hf.get("layer_types") or ["mamba"] * n_layers)
    )
    mamba_cfg = ssm.MambaConfig(
        version=2,
        vocab_size=base.vocab_size,
        dim=dim,
        n_layers=n_layers,
        d_inner=int(hf.get("mamba_expand", 2)) * dim,
        d_state=int(hf.get("mamba_d_state", 128)),
        d_conv=int(hf.get("mamba_d_conv", 4)),
        n_heads=int(hf["mamba_n_heads"]),
        head_dim=int(hf.get("mamba_d_head") or 64),
        n_groups=int(hf.get("mamba_n_groups", 1)),
        chunk_size=int(hf.get("mamba_chunk_size", 256)),
        conv_bias=bool(hf.get("mamba_conv_bias", True)),
        proj_bias=bool(hf.get("mamba_proj_bias", False)),
        norm_eps=base.norm_eps,
        dtype=dtype,
    )
    return dataclasses.replace(
        base,
        layer_types=layer_types,
        mamba=mamba_cfg,
        use_rope=hf.get("position_embedding_type") == "rope",
    )


def _hf_jamba(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF JambaConfig -> native.  A NoPE hybrid: layers are mamba1
    mixers (with AFFINE dt/b/c stream RMSNorms — JambaMambaMixer) except
    every attn_layer_period-th (offset attn_layer_offset) which is plain
    GQA attention; the MLP is a mixtral-style MoE (softmax -> top-k, NO
    renormalization) on every expert_layer_period-th layer (offset
    expert_layer_offset) when num_experts > 1, a dense llama MLP
    elsewhere."""
    from . import ssm

    dim = int(hf["hidden_size"])
    n_layers = int(hf["num_hidden_layers"])
    n_heads = int(hf["num_attention_heads"])
    lbt = hf.get("layers_block_type")
    if lbt:
        layer_types = tuple(str(t) for t in lbt)
    else:
        ap = int(hf.get("attn_layer_period", 8))
        ao = int(hf.get("attn_layer_offset", 4))
        layer_types = tuple(
            "attention" if ap and i % ap == ao else "mamba"
            for i in range(n_layers)
        )
    n_experts = int(hf.get("num_experts", 1))
    if n_experts > 1:
        ep = int(hf.get("expert_layer_period", 2))
        eo = int(hf.get("expert_layer_offset", 1))
        mlp_only = tuple(
            i for i in range(n_layers) if not (ep and i % ep == eo)
        )
    else:
        mlp_only = ()
        n_experts = 0
    tr = hf.get("mamba_dt_rank", "auto")
    mamba_cfg = ssm.MambaConfig(
        version=1,
        vocab_size=int(hf["vocab_size"]),
        dim=dim,
        n_layers=n_layers,
        d_inner=int(hf.get("mamba_expand", 2)) * dim,
        d_state=int(hf.get("mamba_d_state", 16)),
        d_conv=int(hf.get("mamba_d_conv", 4)),
        dt_rank=(dim + 15) // 16 if tr in (None, "auto") else int(tr),
        stream_norms=True,
        conv_bias=bool(hf.get("mamba_conv_bias", True)),
        proj_bias=bool(hf.get("mamba_proj_bias", False)),
        norm_eps=float(hf.get("rms_norm_eps", 1e-6)),
        dtype=dtype,
    )
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=dim,
        n_layers=n_layers,
        n_heads=n_heads,
        n_kv_heads=int(hf.get("num_key_value_heads") or n_heads),
        hidden_dim=int(hf["intermediate_size"]),
        norm_eps=float(hf.get("rms_norm_eps", 1e-6)),
        mlp_act=_hf_act(hf.get("hidden_act", "silu")),
        qkv_bias=False,
        use_rope=False,
        layer_types=layer_types,
        mamba=mamba_cfg,
        n_experts=n_experts,
        n_experts_per_tok=int(hf.get("num_experts_per_tok", 2)),
        norm_topk_prob=False,
        mlp_only_layers=mlp_only,
        tie_embeddings=bool(hf.get("tie_word_embeddings", False)),
        remat=remat,
        dtype=dtype,
    )


def _hf_falcon_h1(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF FalconH1Config -> native.  EVERY layer runs a Mamba2 mixer IN
    PARALLEL with rotary GQA attention (one input norm feeds both,
    outputs sum into the residual), over a llama MLP.  The nine mup
    multipliers are handled without graph changes: embedding_multiplier
    and lm_head_multiplier map onto existing knobs, and the seven others
    (attention in/out, key, mlp gate/down, ssm in/out + the 5-way
    zxbcdt mup vector) FOLD INTO THE WEIGHTS on load
    (hf_loader.make_falcon_h1_translator) — exact because each scales a
    linear map's input or output."""
    from . import ssm

    if hf.get("rope_scaling") is not None:
        raise ValueError(
            "falcon_h1 rope_scaling is not implemented; use a custom "
            "builder"
        )
    dim = int(hf["hidden_size"])
    n_layers = int(hf["num_hidden_layers"])
    n_heads = int(hf["num_attention_heads"])
    head_dim = hf.get("head_dim")
    d_ssm = hf.get("mamba_d_ssm") or int(hf.get("mamba_expand", 2)) * dim
    bias = bool(hf.get("attention_bias", False))
    lm_mult = float(hf.get("lm_head_multiplier", 1.0))
    mamba_cfg = ssm.MambaConfig(
        version=2,
        vocab_size=int(hf["vocab_size"]),
        dim=dim,
        n_layers=n_layers,
        d_inner=int(d_ssm),
        d_state=int(hf.get("mamba_d_state", 128)),
        d_conv=int(hf.get("mamba_d_conv", 4)),
        n_heads=int(hf["mamba_n_heads"]),
        head_dim=int(hf.get("mamba_d_head") or int(d_ssm) // int(hf["mamba_n_heads"])),
        n_groups=int(hf.get("mamba_n_groups", 1)),
        chunk_size=int(hf.get("mamba_chunk_size", 256)),
        conv_bias=bool(hf.get("mamba_conv_bias", True)),
        proj_bias=bool(hf.get("projectors_bias", False)),
        gated_norm=bool(hf.get("mamba_rms_norm", False)),
        norm_eps=float(hf.get("rms_norm_eps", 1e-5)),
        dtype=dtype,
    )
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=dim,
        n_layers=n_layers,
        n_heads=n_heads,
        n_kv_heads=int(hf.get("num_key_value_heads") or n_heads),
        hidden_dim=int(hf["intermediate_size"]),
        norm_eps=float(hf.get("rms_norm_eps", 1e-5)),
        head_dim_override=(
            int(head_dim)
            if head_dim is not None and int(head_dim) * n_heads != dim
            else None
        ),
        mlp_act=_hf_act(hf.get("hidden_act", "silu")),
        mlp_bias=bool(hf.get("mlp_bias", False)),
        qkv_bias=bias,
        o_proj_bias=bias,
        rope_theta=float(hf.get("rope_theta", 100000.0)),
        parallel_ssm=True,
        mamba=mamba_cfg,
        embedding_multiplier=(
            float(hf["embedding_multiplier"])
            if float(hf.get("embedding_multiplier", 1.0)) != 1.0
            else None
        ),
        logit_scale=lm_mult if lm_mult != 1.0 else None,
        tie_embeddings=bool(hf.get("tie_word_embeddings", False)),
        remat=remat,
        dtype=dtype,
    )


def _hf_llama4(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF Llama4TextConfig -> native.  Interleaved-rope llama graph with:
    NoPE layers (no_rope_layers, 1 = rope) carrying attention
    temperature tuning (log1p(floor((pos+1)/floor_scale)) * attn_scale
    + 1 on the queries), affine-free per-head L2 qk norm AFTER rope on
    rope layers, block-diagonal chunked attention on 'chunked_attention'
    layers, and a MoE (moe_layers / interleave_moe_layer_step) whose
    router takes sigmoid(top-k logits) as weights scaling the expert
    INPUTS, with an always-on ungated shared expert; dense layers use
    intermediate_size_mlp while experts/shared use intermediate_size."""
    n_heads = int(hf["num_attention_heads"])
    dim = int(hf["hidden_size"])
    n_layers = int(hf["num_hidden_layers"])
    head_dim = hf.get("head_dim")
    bias = bool(hf.get("attention_bias", False))
    rope_layers = tuple(int(v) for v in (hf.get("no_rope_layers") or ()))
    moe_layers = hf.get("moe_layers")
    if moe_layers is None:
        step = int(hf.get("interleave_moe_layer_step", 1))
        moe_layers = (
            [i for i in range(n_layers) if (i + 1) % step == 0]
            if step
            else []
        )
    mlp_only = tuple(i for i in range(n_layers) if i not in set(moe_layers))
    rs = hf.get("rope_scaling")
    rope_llama3 = None
    if rs is not None:
        rtype = rs.get("rope_type", rs.get("type"))
        if rtype == "llama3":
            rope_llama3 = (
                float(rs["factor"]),
                float(rs.get("low_freq_factor", 1.0)),
                float(rs.get("high_freq_factor", 4.0)),
                int(rs.get("original_max_position_embeddings", 8192)),
            )
        elif rtype not in (None, "default"):
            raise ValueError(
                f"llama4 rope_scaling type {rtype!r} is not implemented"
            )
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=dim,
        n_layers=n_layers,
        n_heads=n_heads,
        n_kv_heads=int(hf.get("num_key_value_heads") or n_heads),
        hidden_dim=int(
            hf.get("intermediate_size_mlp") or 4 * int(hf["intermediate_size"])
        ),
        norm_eps=float(hf.get("rms_norm_eps", 1e-5)),
        head_dim_override=(
            int(head_dim)
            if head_dim is not None and int(head_dim) * n_heads != dim
            else None
        ),
        mlp_act=_hf_act(hf.get("hidden_act", "silu")),
        qkv_bias=bias,
        o_proj_bias=bias,
        rope_theta=float(hf.get("rope_theta", 500000.0)),
        rope_interleaved=True,
        rope_llama3_scaling=rope_llama3,
        rope_layers=rope_layers,
        layer_types=tuple(hf.get("layer_types") or ()),
        attention_chunk_size=(
            int(hf["attention_chunk_size"])
            if hf.get("attention_chunk_size")
            else None
        ),
        qk_l2norm=bool(hf.get("use_qk_norm", True)),
        attn_temperature_tuning=(
            (
                float(hf.get("attn_scale", 0.1)),
                float(hf.get("floor_scale", 8192)),
            )
            if hf.get("attn_temperature_tuning", True)
            else None
        ),
        n_experts=int(hf.get("num_local_experts", 16)),
        n_experts_per_tok=int(hf.get("num_experts_per_tok", 1)),
        norm_topk_prob=False,
        router_topk_then_sigmoid=True,
        moe_scale_expert_input=True,
        moe_hidden_dim=int(hf["intermediate_size"]),
        mlp_only_layers=mlp_only,
        shared_expert_hidden_dim=int(hf["intermediate_size"]),
        shared_expert_gated=False,
        tie_embeddings=bool(hf.get("tie_word_embeddings", False)),
        remat=remat,
        dtype=dtype,
    )


def _hf_lfm2(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF Lfm2Config -> native.  Hybrid of gated short-conv mixers
    (layer_types 'conv': in_proj thirds (B, C, x), causal depthwise conv
    over B*x gated by C) and bias-free GQA attention with per-head qk
    RMSNorms; llama MLP under the w1/w3/w2 naming; the FINAL norm is the
    checkpoint's 'embedding_norm' (renamed on load)."""
    n_heads = int(hf["num_attention_heads"])
    dim = int(hf["hidden_size"])
    n_layers = int(hf["num_hidden_layers"])
    lt = hf.get("layer_types")
    if not lt:
        full = set(int(i) for i in (hf.get("full_attn_idxs") or ()))
        lt = [
            "full_attention" if i in full else "conv"
            for i in range(n_layers)
        ]
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=dim,
        n_layers=n_layers,
        n_heads=n_heads,
        n_kv_heads=int(hf.get("num_key_value_heads") or n_heads),
        hidden_dim=int(
            hf.get("intermediate_size") or hf.get("block_ff_dim") or 4 * dim
        ),
        norm_eps=float(hf.get("norm_eps", 1e-5)),
        qk_norm=True,
        mlp_act=_hf_act(hf.get("hidden_act", "silu")),
        rope_theta=float(hf.get("rope_theta", 1e6)),
        layer_types=tuple(str(t) for t in lt),
        conv_mixer=(
            int(hf.get("conv_L_cache", 3)),
            bool(hf.get("conv_bias", False)),
        ),
        tie_embeddings=bool(hf.get("tie_word_embeddings", True)),
        remat=remat,
        dtype=dtype,
    )


def _hf_minimax(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF MiniMaxConfig -> native.  Hybrid of lightning (linear)
    attention layers and rotary full-attention layers over a mixtral
    MoE, with the NORM-FIRST scaled-residual wiring (residual = the
    normed stream, scaled by per-type alpha/beta factors)."""
    n_heads = int(hf["num_attention_heads"])
    dim = int(hf["hidden_size"])
    n_layers = int(hf["num_hidden_layers"])
    head_dim = hf.get("head_dim")
    layer_types = tuple(
        str(t)
        for t in (
            hf.get("layer_types")
            or [
                "full_attention" if i % 2 == 0 else "linear_attention"
                for i in range(n_layers)
            ]
        )
    )
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=dim,
        n_layers=n_layers,
        n_heads=n_heads,
        n_kv_heads=int(hf.get("num_key_value_heads") or n_heads),
        hidden_dim=int(hf["intermediate_size"]),
        norm_eps=float(hf.get("rms_norm_eps", 1e-5)),
        head_dim_override=(
            int(head_dim)
            if head_dim is not None and int(head_dim) * n_heads != dim
            else None
        ),
        mlp_act=_hf_act(hf.get("hidden_act", "silu")),
        rope_theta=float(hf.get("rope_theta", 10000.0)),
        layer_types=layer_types,
        lightning_block_size=int(hf.get("block_size", 256)),
        minimax_residual_factors=(
            float(hf.get("full_attn_alpha_factor", 1.0)),
            float(hf.get("full_attn_beta_factor", 1.0)),
            float(hf.get("linear_attn_alpha_factor", 1.0)),
            float(hf.get("linear_attn_beta_factor", 1.0)),
            float(hf.get("mlp_alpha_factor", 1.0)),
            float(hf.get("mlp_beta_factor", 1.0)),
        ),
        n_experts=int(hf["num_local_experts"]),
        n_experts_per_tok=int(hf.get("num_experts_per_tok", 2)),
        tie_embeddings=bool(hf.get("tie_word_embeddings", False)),
        remat=remat,
        dtype=dtype,
    )


def _hf_longcat(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF LongcatFlashConfig -> native.  Dual-sublayer blocks (two MLA
    attentions + two dense MLPs per logical layer) with a shortcut MoE
    added after the second sublayer; the router softmaxes in fp32,
    selects with a correction bias over n_routed + zero_expert_num
    IDENTITY experts (whose weight passes the token through), takes raw
    softmax scores as weights and scales by routed_scaling_factor.  The
    MLA q/kv lora output scales (sqrt(dim/rank)) fold into the
    checkpoint weights on load (hf_loader.make_longcat_translator)."""
    if hf.get("rope_scaling") is not None:
        raise ValueError(
            "longcat rope_scaling is not implemented; use a custom builder"
        )
    dim = int(hf["hidden_size"])
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=dim,
        n_layers=int(hf.get("num_layers") or hf["num_hidden_layers"]),
        n_heads=int(hf["num_attention_heads"]),
        n_kv_heads=int(
            hf.get("num_key_value_heads") or hf["num_attention_heads"]
        ),
        hidden_dim=int(hf["ffn_hidden_size"]),
        norm_eps=float(hf.get("rms_norm_eps", 1e-5)),
        mlp_act=_hf_act(hf.get("hidden_act", "silu")),
        rope_theta=float(hf.get("rope_theta", 10000000.0)),
        longcat_dual=True,
        q_lora_rank=(
            int(hf["q_lora_rank"])
            if hf.get("q_lora_rank") is not None
            else None
        ),
        kv_lora_rank=int(hf["kv_lora_rank"]),
        qk_rope_head_dim=int(hf.get("qk_rope_head_dim", 64)),
        qk_nope_head_dim=int(hf.get("qk_nope_head_dim", 128)),
        v_head_dim=int(hf.get("v_head_dim", 128)),
        # LongcatFlashMLA uses apply_rotary_pos_emb_interleave
        rope_interleaved=True,
        n_experts=int(hf["n_routed_experts"]),
        n_zero_experts=int(hf.get("zero_expert_num") or 0),
        n_experts_per_tok=int(hf.get("moe_topk", 2)),
        norm_topk_prob=False,
        router_correction_bias=True,
        router_bias=bool(hf.get("router_bias", False)),
        routed_scaling_factor=float(hf.get("routed_scaling_factor", 1.0)),
        moe_hidden_dim=int(hf["expert_ffn_hidden_size"]),
        tie_embeddings=bool(hf.get("tie_word_embeddings", False)),
        remat=remat,
        dtype=dtype,
    )


def _hf_qwen3_next(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF Qwen3NextConfig -> native.  Hybrid of gated-DeltaNet linear
    attention (chunked delta rule, qk L2 norm in kernel, silu'd conv,
    per-v-head gated RMSNorm) and full attention carrying a fused
    sigmoid output gate in q_proj, per-head q/k RMSNorms, and partial
    split-half rotary; MLPs are the qwen3-MoE layout (norm_topk_prob,
    moe_intermediate_size, gated shared expert)."""
    if hf.get("rope_scaling") is not None:
        raise ValueError(
            "qwen3_next rope_scaling is not implemented; use a custom "
            "builder"
        )
    n_heads = int(hf["num_attention_heads"])
    dim = int(hf["hidden_size"])
    n_layers = int(hf["num_hidden_layers"])
    head_dim = hf.get("head_dim")
    n_experts = int(hf.get("num_experts") or 0)
    shared = int(hf.get("shared_expert_intermediate_size") or 0)
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=dim,
        n_layers=n_layers,
        n_heads=n_heads,
        n_kv_heads=int(hf.get("num_key_value_heads") or n_heads),
        hidden_dim=int(hf["intermediate_size"]),
        norm_eps=float(hf.get("rms_norm_eps", 1e-6)),
        head_dim_override=(
            int(head_dim)
            if head_dim is not None and int(head_dim) * n_heads != dim
            else None
        ),
        qk_norm=True,
        attn_gate=True,
        norm_plus_one=True,  # Qwen3NextRMSNorm is the (1+w) flavor
        mlp_act=_hf_act(hf.get("hidden_act", "silu")),
        rope_theta=float(hf.get("rope_theta", 10000.0)),
        rope_partial_factor=(
            pct
            if (pct := float(hf.get("partial_rotary_factor", 0.25))) < 1.0
            else None
        ),
        layer_types=tuple(str(t) for t in (hf.get("layer_types") or ())),
        gdn=(
            int(hf["linear_num_key_heads"]),
            int(hf["linear_num_value_heads"]),
            int(hf["linear_key_head_dim"]),
            int(hf["linear_value_head_dim"]),
            int(hf.get("linear_conv_kernel_dim", 4)),
        ),
        n_experts=n_experts,
        n_experts_per_tok=int(hf.get("num_experts_per_tok", 8)),
        norm_topk_prob=bool(hf.get("norm_topk_prob", True)),
        moe_hidden_dim=(
            int(hf["moe_intermediate_size"]) if n_experts else None
        ),
        mlp_only_layers=tuple(hf.get("mlp_only_layers") or ()),
        decoder_sparse_step=int(hf.get("decoder_sparse_step", 1)),
        shared_expert_hidden_dim=shared if shared > 0 else None,
        tie_embeddings=bool(hf.get("tie_word_embeddings", False)),
        remat=remat,
        dtype=dtype,
    )


def _hf_recurrent_gemma(
    hf: dict, dtype: Any, remat: bool
) -> "TransformerConfig":
    """HF RecurrentGemmaConfig (Griffin) -> native.  block_types cycles
    'recurrent' (RG-LRU temporal blocks) and 'attention' (sliding-window
    MQA/GQA with partial split-half rotary and a BIASED o_proj); the MLP
    is gated gelu-tanh at intermediate_size//2 with biases everywhere;
    gemma-style sqrt(dim) embedding scale, (1+w) RMSNorms, and a final
    logits soft cap."""
    n_layers = int(hf["num_hidden_layers"])
    pattern = [str(t) for t in (hf.get("block_types") or ["recurrent"])]
    lbt = hf.get("layers_block_type") or [
        pattern[i % len(pattern)] for i in range(n_layers)
    ]
    # NOTE: HF's prefill mask is PLAIN CAUSAL — attention_window_size
    # only bounds the decode-time KV cache (_update_causal_mask builds
    # triu(-1) * (j > i) = causal, no window clip).  The calibration
    # forward therefore runs full attention, matching HF exactly.
    layer_types = tuple(
        "full_attention" if t == "attention" else "recurrent" for t in lbt
    )
    n_heads = int(hf["num_attention_heads"])
    dim = int(hf["hidden_size"])
    head_dim = hf.get("head_dim")
    lru = int(hf.get("lru_width") or dim)
    cap = hf.get("logits_soft_cap")
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=dim,
        n_layers=n_layers,
        n_heads=n_heads,
        n_kv_heads=int(hf.get("num_key_value_heads") or n_heads),
        hidden_dim=int(hf["intermediate_size"]) // 2,
        norm_eps=float(hf.get("rms_norm_eps", 1e-6)),
        head_dim_override=(
            int(head_dim)
            if head_dim is not None and int(head_dim) * n_heads != dim
            else None
        ),
        norm_plus_one=True,
        scale_embeddings=True,
        scale_embeddings_bf16=True,
        mlp_act=_hf_act(
            hf.get("hidden_activation", "gelu_pytorch_tanh")
        ),
        mlp_bias=True,
        qkv_bias=bool(hf.get("attention_bias", False)),
        o_proj_bias=True,  # RecurrentGemmaSdpaAttention hardcodes it
        rope_theta=float(hf.get("rope_theta", 10000.0)),
        rope_partial_factor=(
            pct
            if (pct := float(hf.get("partial_rotary_factor", 0.5))) < 1.0
            else None
        ),
        layer_types=layer_types,
        rglru=(
            lru,
            int(hf.get("conv1d_width", 4)),
            n_heads,
        ),
        final_logit_softcap=float(cap) if cap else None,
        tie_embeddings=bool(hf.get("tie_word_embeddings", True)),
        remat=remat,
        dtype=dtype,
    )


def _hf_jetmoe(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF JetMoeConfig -> native.  BOTH sublayers are sparse: attention
    is a mixture of attention heads (per-expert q/output projections
    around a shared kv, softmax-over-top-k gates, learned output bias —
    see MoAttention) and the MLP is a glu MoE with the same router
    flavor and output bias; experts' fused stacked tensors split on
    load (hf_loader.translate_jetmoe_state_dict)."""
    n_kv = int(hf["num_key_value_heads"])
    top_k = int(hf.get("num_experts_per_tok", 2))
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=int(hf["hidden_size"]),
        n_layers=int(hf["num_hidden_layers"]),
        # num_attention_heads must equal top_k * n_kv (JetMoeAttention)
        n_heads=top_k * n_kv,
        n_kv_heads=n_kv,
        head_dim_override=int(hf.get("kv_channels", 128)),
        hidden_dim=int(hf["intermediate_size"]),
        norm_eps=float(hf.get("rms_norm_eps", 1e-6)),
        moa=True,
        mlp_act=_hf_act(hf.get("activation_function", "silu")),
        rope_theta=float(hf.get("rope_theta", 10000.0)),
        n_experts=int(hf.get("num_local_experts", 8)),
        n_experts_per_tok=top_k,
        router_softmax_after_topk=True,
        moe_hidden_dim=int(hf["intermediate_size"]),
        moe_output_bias=True,
        tie_embeddings=bool(hf.get("tie_word_embeddings", True)),
        remat=remat,
        dtype=dtype,
    )


def _hf_bert_decoder(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF BertLMHeadModel / RobertaForCausalLM (+ camembert /
    xlm-roberta clones) used as causal decoders (is_decoder=True) ->
    native.  TRUE post-LN blocks (norms after each residual add),
    learned absolute positions (roberta's legacy +pad_token_id+1 offset
    rows are dropped on load), a constant token-type-0 embedding,
    embedding LayerNorm, biased exact-gelu MLP, and the
    dense+act+LayerNorm prediction head with a bias on the tied output
    matmul."""
    mt = hf.get("model_type", "bert")
    if mt != "roformer" and (
        hf.get("position_embedding_type", "absolute") != "absolute"
    ):
        raise ValueError(
            "only absolute position_embedding_type is implemented; use a "
            "custom builder"
        )
    if mt == "ernie" and hf.get("use_task_id"):
        raise ValueError(
            "ernie use_task_id=True (task-type embeddings) is not "
            "implemented; use a custom builder"
        )
    if mt == "roformer" and hf.get("rotary_value"):
        raise ValueError(
            "roformer rotary_value=True (rotary on the value vectors) is "
            "not implemented; use a custom builder"
        )
    if mt == "xmod":
        # only the default adapter wiring is implemented: the post-FFN
        # LayerNorm feeds a residual bottleneck (ln_before_adapter with
        # the reused block LayerNorm, no separate adapter norm, post-LN)
        if hf.get("pre_norm") or hf.get("adapter_layer_norm"):
            raise ValueError(
                "xmod pre_norm / adapter_layer_norm variants are not "
                "implemented; use a custom builder"
            )
        if not hf.get("adapter_reuse_layer_norm", True) or not hf.get(
            "ln_before_adapter", True
        ):
            raise ValueError(
                "xmod without ln_before_adapter+adapter_reuse_layer_norm "
                "is not implemented; use a custom builder"
            )
    roberta_like = mt in (
        "roberta", "camembert", "xlm-roberta", "data2vec-text",
        "roberta-prelayernorm", "xlm-roberta-xl", "xmod",
    )
    # bert-generation has no token-type table and a transform-less head
    bare = mt == "bert-generation"
    # pre-LN members: megatron-bert (attention.ln / layer.ln feeding the
    # sublayers, final encoder.ln), roberta-prelayernorm, xlm-roberta-xl
    # (which also drops the embedding LayerNorm)
    pre_ln = mt in (
        "megatron-bert", "roberta-prelayernorm", "xlm-roberta-xl",
    )
    # electra/roformer: embeddings live in embedding_size, projected to
    # hidden; rembert calls the same width input_embedding_size
    ed = (
        int(hf.get("embedding_size") or 0)
        if mt in ("electra", "roformer")
        else int(hf.get("input_embedding_size") or 0)
        if mt == "rembert"
        else 0
    )
    # roc_bert concat_input: word/shape0/pron0 run through the fused
    # map_inputs_layer — a LINEAR map of the hidden-width word embedding
    # plus constants, folded on load into an embed_proj (weight = the
    # word slice, bias = bias + shape/pron zero-row contributions)
    # applied BEFORE the position/token-type adds.  Text-only inputs use
    # all-zero shape/pronunciation ids (HF RoCBertEmbeddings defaults),
    # so the fold is exact.  concat_input=False text-only degenerates to
    # plain bert (None ids are skipped, denominator 1).
    roc_fused = mt == "roc_bert" and bool(hf.get("concat_input", True))
    max_pos = int(hf["max_position_embeddings"])
    pad = int(hf.get("pad_token_id") or 0)
    # roformer replaces absolute positions with standard interleaved
    # rotary at theta 10000 over the full head dim (its marian-layout
    # sinusoid table chunked to (sin, cos) IS the rope inv_freq ladder)
    rope = mt == "roformer"
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=int(hf["hidden_size"]),
        n_layers=int(hf["num_hidden_layers"]),
        n_heads=int(hf["num_attention_heads"]),
        n_kv_heads=int(hf["num_attention_heads"]),
        hidden_dim=int(hf["intermediate_size"]),
        norm_eps=float(hf.get("layer_norm_eps", 1e-12)),
        norm_type="layernorm",
        post_ln=not pre_ln,
        final_norm=pre_ln,
        mlp_gated=False,
        mlp_bias=True,
        mlp_act=_hf_act(hf.get("hidden_act", "gelu")),
        qkv_bias=True,
        o_proj_bias=True,
        use_rope=rope,
        rope_theta=10000.0,
        rope_interleaved=rope,
        # big_bird rescale_embeddings: sqrt(hidden) on the word embedding
        # before the positional/token-type adds (matches scale_embeddings)
        scale_embeddings=bool(hf.get("rescale_embeddings", False)),
        # roberta's position table starts at pad+1; the offset rows are
        # dropped by the translator so arange indexes the same vectors
        learned_pos=(
            None
            if rope
            else max_pos - (pad + 1 if roberta_like else 0)
        ),
        token_type_zero=not bare and mt != "git",
        embed_norm=mt not in ("megatron-bert", "xlm-roberta-xl"),
        head_transform=not bare and mt != "git",
        embed_proj_pre_pos=roc_fused,
        ffn_adapter_dim=(
            int(hf["hidden_size"])
            // int(hf.get("adapter_reduction_factor") or 2)
            if mt == "xmod"
            else None
        ),
        head_out_dim=(
            int(hf["output_embedding_size"]) if mt == "rembert" else None
        ),
        # electra's generator head hardcodes exact gelu
        head_transform_act=(
            "gelu_exact"
            if mt == "electra"
            else _hf_act(hf.get("hidden_act", "gelu"))
        ),
        head_transform_bias=True,
        embed_dim=ed if ed and ed != int(hf["hidden_size"]) else None,
        lm_head_bias=True,
        # rembert's decoder is genuinely untied (input/output embedding
        # widths differ); git's plain `output` head likewise
        tie_embeddings=(
            False
            if mt in ("rembert", "git")
            else bool(hf.get("tie_word_embeddings", True))
        ),
        remat=remat,
        dtype=dtype,
    )


# (model_type -> (positions, post_ln, embed_norm, final_norm)) for the
# bart decoder lineage.  positions: "learned2" = BartLearnedPositional
# Embedding's +2 index offset (the translator drops the two offset rows),
# "learned" = plain arange lookup, "weight" = a deterministic sinusoid
# STORED as an embedding weight (marian/pegasus — copied through, or
# synthesized by the translator when a checkpoint omits it),
# "computed" = the fairseq sinusoid computed on the fly (speech_to_text_2).
_BART_LINEAGE: dict[str, tuple] = {
    "bart": ("learned2", True, True, False),
    "mvp": ("learned2", True, True, False),
    "plbart": ("learned2", True, True, False),
    "trocr": ("learned2", True, True, False),  # embed_norm from config
    "mbart": ("learned2", False, True, True),
    "marian": ("weight", True, False, False),
    "pegasus": ("weight", False, False, True),
    "blenderbot": ("learned", False, False, True),
    "blenderbot-small": ("learned", True, True, False),
    "whisper": ("learned", False, False, True),
    "speech_to_text_2": ("computed", True, False, False),
    # bigbird_pegasus's decoder applies its `layernorm_embedding` AFTER
    # the last layer — it is the final decoder norm under a misleading
    # checkpoint name (the translator maps it onto model.norm)
    "bigbird_pegasus": ("learned", False, False, True),
}


def _hf_bart_decoder(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF bart-lineage ``*ForCausalLM`` decoders (bart / mbart / marian /
    pegasus / blenderbot / blenderbot-small / mvp / plbart / trocr /
    whisper / speech_to_text_2 / bigbird_pegasus) -> native.  One shared
    seq2seq-decoder graph family: LayerNorm blocks (post-LN for the
    original bart generation, pre-LN with a final decoder norm for the
    mbart/pegasus/blenderbot/whisper generation), biased non-gated MLPs
    (fc1/fc2), biased attention projections, optional sqrt(d_model)
    embedding scale, optional embedding LayerNorm, and the per-family
    position flavors in ``_BART_LINEAGE``.  Cross-attention modules in the
    checkpoints are unused by the causal-LM forward and dropped on load."""
    mt = hf["model_type"]
    pos_kind, post_ln, embed_norm, final_norm = _BART_LINEAGE[mt]
    if mt == "mvp" and hf.get("use_prompt"):
        raise ValueError(
            "mvp use_prompt=True (prompt tuning tensors) is not "
            "implemented; use a custom builder"
        )
    if mt == "trocr":
        if not hf.get("use_learned_position_embeddings", True):
            pos_kind = "computed"  # TrOCRSinusoidalPositionalEmbedding
        embed_norm = bool(hf.get("layernorm_embedding", True))
    dim = int(hf.get("d_model") or hf["hidden_size"])
    # whisper and speech_to_text_2 size the decoder by max_target_positions
    max_pos = int(
        hf.get("max_target_positions")
        if mt in ("whisper", "speech_to_text_2")
        else hf["max_position_embeddings"]
    )
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=dim,
        n_layers=int(hf["decoder_layers"]),
        n_heads=int(hf["decoder_attention_heads"]),
        n_kv_heads=int(hf["decoder_attention_heads"]),
        hidden_dim=int(hf["decoder_ffn_dim"]),
        norm_eps=1e-5,
        norm_type="layernorm",
        post_ln=post_ln,
        final_norm=final_norm,
        embed_norm=embed_norm,
        mlp_gated=False,
        mlp_bias=True,
        mlp_act=_hf_act(hf.get("activation_function", "gelu")),
        qkv_bias=bool(hf.get("use_bias", True)),  # bigbird_pegasus knob
        o_proj_bias=bool(hf.get("use_bias", True)),
        use_rope=False,
        learned_pos=(
            max_pos if pos_kind in ("learned", "learned2", "weight") else None
        ),
        sinusoidal_pos=pos_kind == "computed",
        # fairseq position ids start at padding_idx+1 (speech_to_text_2 /
        # trocr's sinusoidal fallback); xglm's fixed 2 is the same value
        # at the default pad_token_id=1
        sinusoidal_offset=int(hf.get("pad_token_id") or 1) + 1,
        scale_embeddings=bool(hf.get("scale_embedding", False)),
        embed_norm_pre_pos=mt == "blenderbot-small",
        tie_embeddings=bool(hf.get("tie_word_embeddings", True)),
        remat=remat,
        dtype=dtype,
    )


def _hf_helium(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF HeliumForCausalLM -> native: the llama graph with INTERLEAVED
    rotary — helium slices cos/sin back to the inv_freq half and
    repeat_interleaves, pairing dims (2i, 2i+1) at angle theta^(-2i/d),
    i.e. the gptj convention — plus explicit head_dim, config-gated
    qkv/mlp biases (o_proj always bias-free), and rms eps 1e-8."""
    if _hf_act(hf.get("hidden_act", "silu")) != "silu":
        raise ValueError(
            f"helium hidden_act {hf.get('hidden_act')!r} is not implemented"
        )
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=int(hf["hidden_size"]),
        n_layers=int(hf["num_hidden_layers"]),
        n_heads=int(hf["num_attention_heads"]),
        n_kv_heads=int(
            hf.get("num_key_value_heads") or hf["num_attention_heads"]
        ),
        hidden_dim=int(hf["intermediate_size"]),
        head_dim_override=(
            int(hf["head_dim"]) if hf.get("head_dim") else None
        ),
        norm_eps=float(hf.get("rms_norm_eps", 1e-8)),
        rope_theta=float(hf.get("rope_theta", 100000.0)),
        rope_interleaved=True,
        qkv_bias=bool(hf.get("attention_bias", False)),
        mlp_bias=bool(hf.get("mlp_bias", False)),
        tie_embeddings=bool(hf.get("tie_word_embeddings", False)),
        remat=remat,
        dtype=dtype,
    )


def _hf_open_llama(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF (deprecated) OpenLlamaForCausalLM -> native: the llama graph
    plus use_stable_embedding's LayerNorm over the token embedding and
    shared_input_output_embedding tying.  use_memory_efficient_attention
    is math-identical attention.  Tiny documented divergence: the embed
    LayerNorm runs at rms_norm_eps instead of torch's default 1e-5 (the
    difference is below f32 noise for non-degenerate activations)."""
    if _hf_act(hf.get("hidden_act", "silu")) != "silu":
        raise ValueError(
            f"open-llama hidden_act {hf.get('hidden_act')!r} is not "
            "implemented"
        )
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=int(hf["hidden_size"]),
        n_layers=int(hf["num_hidden_layers"]),
        n_heads=int(hf["num_attention_heads"]),
        n_kv_heads=int(hf["num_attention_heads"]),
        hidden_dim=int(hf["intermediate_size"]),
        norm_eps=float(hf.get("rms_norm_eps", 1e-6)),
        rope_theta=float(hf.get("rope_theta", 10000.0)),
        embed_norm=bool(hf.get("use_stable_embedding", True)),
        tie_embeddings=bool(hf.get("shared_input_output_embedding", True)),
        remat=remat,
        dtype=dtype,
    )


def _hf_moshi(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF MoshiForCausalLM (the temporal transformer; the audio depth
    decoder is a separate model) -> native.  The llama graph with a
    FUSED gating MLP — fc1 emits [gate | up] halves, out = fc2(act(g)*u),
    split on load — one extra embedding row (vocab+1 audio pad), rms eps
    1e-8, and an always-on 3000-token sliding window (full causal
    attention is exact below it; the loaders cap max_seqlen)."""
    if _hf_act(hf.get("hidden_act", "silu")) != "silu":
        raise ValueError(
            f"moshi hidden_act {hf.get('hidden_act')!r} is not implemented"
        )
    dim = int(hf["hidden_size"])
    sliding = hf.get("sliding_window")
    if sliding:
        logger.info(
            "moshi sliding_window=%s: full causal attention is used; keep "
            "calibration max_seqlen <= window for exactness", sliding,
        )
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=dim,
        n_layers=int(hf["num_hidden_layers"]),
        n_heads=int(hf["num_attention_heads"]),
        n_kv_heads=int(
            hf.get("num_key_value_heads") or hf["num_attention_heads"]
        ),
        hidden_dim=int(hf["ffn_dim"]) // 2,  # fc1 fuses [gate | up]
        head_dim_override=(
            int(hf["head_dim"])
            if hf.get("head_dim")
            and int(hf["head_dim"]) != dim // int(hf["num_attention_heads"])
            else None
        ),
        norm_eps=float(hf.get("rms_norm_eps", 1e-8)),
        rope_theta=float(hf.get("rope_theta", 10000.0)),
        embed_vocab_size=int(hf["vocab_size"]) + 1,
        tie_embeddings=bool(hf.get("tie_word_embeddings", False)),
        remat=remat,
        dtype=dtype,
    )


def _hf_mllama(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF MllamaForCausalLM (the llama-3.2-vision text model) -> native.
    The self-attention layers are the plain llama graph (GQA, llama3
    rope scaling, untied head); the cross_attention_layers indices are
    SKIPPED outright in text-only mode (MllamaTextModel.forward
    `continue`s them when no vision states exist) and build as
    SkipBlock placeholders so HF layer numbering is preserved; their
    weights are dropped on load."""
    if hf.get("model_type") == "mllama":
        hf = dict(hf["text_config"])
    if _hf_act(hf.get("hidden_act", "silu")) != "silu":
        raise ValueError(
            f"mllama hidden_act {hf.get('hidden_act')!r} is not implemented"
        )
    n_layers = int(hf["num_hidden_layers"])
    cross = set(int(i) for i in (hf.get("cross_attention_layers") or ()))
    rope_llama3 = None
    rs = hf.get("rope_scaling")
    if rs is not None:
        rtype = rs.get("rope_type", rs.get("type"))
        if rtype == "llama3":
            rope_llama3 = (
                float(rs["factor"]),
                float(rs.get("low_freq_factor", 1.0)),
                float(rs.get("high_freq_factor", 4.0)),
                int(rs.get("original_max_position_embeddings", 8192)),
            )
        elif rtype not in (None, "default"):
            raise ValueError(
                f"mllama rope_type {rtype!r} is not implemented"
            )
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=int(hf["hidden_size"]),
        n_layers=n_layers,
        n_heads=int(hf["num_attention_heads"]),
        n_kv_heads=int(
            hf.get("num_key_value_heads") or hf["num_attention_heads"]
        ),
        hidden_dim=int(hf["intermediate_size"]),
        norm_eps=float(hf.get("rms_norm_eps", 1e-5)),
        rope_theta=float(hf.get("rope_theta", 500000.0)),
        rope_llama3_scaling=rope_llama3,
        layer_types=tuple(
            "skip" if i in cross else "full_attention"
            for i in range(n_layers)
        ),
        # the embedding holds 8 extra rows for the <image> special
        # tokens; the untied lm_head outputs plain vocab_size
        embed_vocab_size=int(hf["vocab_size"]) + 8,
        tie_embeddings=bool(hf.get("tie_word_embeddings", False)),
        remat=remat,
        dtype=dtype,
    )


def _hf_openai_gpt(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF OpenAIGPTLMHeadModel (GPT-1) -> native: the gpt2 Conv1D layout
    WITHOUT final ln_f, with TRUE post-LN blocks (ln_1/ln_2 after each
    residual add) and learned positions.  Its "gelu" afn is the tanh
    approximation (ACT_FNS maps gelu -> gelu_new)."""
    afn = hf.get("afn", "gelu")
    act = {"gelu": "gelu_tanh", "relu": "relu", "silu": "silu",
           "swish": "silu"}.get(afn)
    if act is None:
        raise ValueError(f"openai-gpt afn {afn!r} is not implemented")
    dim = int(hf["n_embd"])
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=dim,
        n_layers=int(hf["n_layer"]),
        n_heads=int(hf["n_head"]),
        n_kv_heads=int(hf["n_head"]),
        hidden_dim=4 * dim,
        norm_eps=float(hf.get("layer_norm_epsilon", 1e-5)),
        norm_type="layernorm",
        post_ln=True,
        final_norm=False,
        mlp_gated=False,
        mlp_bias=True,
        mlp_act=act,
        qkv_bias=True,
        o_proj_bias=True,
        use_rope=False,
        learned_pos=int(hf["n_positions"]),
        tie_embeddings=True,
        remat=remat,
        dtype=dtype,
    )


def _hf_ctrl(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF CTRLLMHeadModel -> native: pre-LN blocks at the HARDCODED
    eps 1e-6, biased relu MLP, sqrt(d) embedding scale, COMPUTED
    tensor2tensor sinusoidal positions (no checkpoint weight), a final
    layernorm, and a tied lm_head that carries its own bias."""
    return TransformerConfig(
        vocab_size=int(hf["vocab_size"]),
        dim=int(hf["n_embd"]),
        n_layers=int(hf["n_layer"]),
        n_heads=int(hf["n_head"]),
        n_kv_heads=int(hf["n_head"]),
        hidden_dim=int(hf["dff"]),
        norm_eps=1e-6,  # EncoderLayer hardcodes eps=1e-6
        norm_type="layernorm",
        mlp_gated=False,
        mlp_bias=True,
        mlp_act="relu",
        qkv_bias=True,
        o_proj_bias=True,
        use_rope=False,
        sinusoidal_pos=True,
        sinusoidal_offset=0,
        sinusoidal_kind="t2t",
        scale_embeddings=True,
        tie_embeddings=True,
        lm_head_bias=True,  # tied weight + separate bias
        remat=remat,
        dtype=dtype,
    )


def _hf_xlm(hf: dict, dtype: Any, remat: bool) -> "TransformerConfig":
    """HF XLMWithLMHeadModel -> native.  Requires causal=True — XLM's
    default is a BIDIRECTIONAL encoder and this decoder is causal.
    Post-LN blocks (layer_norm1/2 after the residual adds), learned
    positions, embedding LayerNorm, exact-gelu (or relu) MLP, and the
    tied-with-bias pred_layer.  Language embeddings are never added when
    no ``langs`` tensor is passed — the causal-LM calling convention —
    so checkpoints with them load fine (the table is dropped)."""
    if not hf.get("causal"):
        raise ValueError(
            "xlm with causal=False is a bidirectional encoder, not a "
            "causal decoder; set causal=true in config.json"
        )
    if hf.get("asm"):
        raise ValueError(
            "xlm asm=True (adaptive softmax head) is not implemented"
        )
    dim = int(hf["emb_dim"])
    return TransformerConfig(
        vocab_size=int(hf["n_words" if "n_words" in hf else "vocab_size"]),
        dim=dim,
        n_layers=int(hf["n_layers"]),
        n_heads=int(hf["n_heads"]),
        n_kv_heads=int(hf["n_heads"]),
        hidden_dim=4 * dim,
        norm_eps=float(hf.get("layer_norm_eps", 1e-12)),
        norm_type="layernorm",
        post_ln=True,
        final_norm=False,
        mlp_gated=False,
        mlp_bias=True,
        mlp_act="gelu_exact" if hf.get("gelu_activation", True) else "relu",
        qkv_bias=True,
        o_proj_bias=True,
        use_rope=False,
        learned_pos=int(hf.get("max_position_embeddings", 512)),
        embed_norm=True,
        tie_embeddings=True,
        lm_head_bias=True,  # pred_layer.proj bias rides the tied matmul
        remat=remat,
        dtype=dtype,
    )


class Attention(nn.Module):
    q_proj: nn.Linear
    k_proj: nn.Linear
    v_proj: nn.Linear
    o_proj: nn.Linear
    # qwen3-style per-head norms over head_dim (or olmo2-style flat norms
    # over the whole projection, see qk_norm_flat), pre-RoPE
    q_norm: Optional[nn.RMSNorm] = None
    k_norm: Optional[nn.RMSNorm] = None
    # gpt_oss: learned per-head sink logit joining the softmax denominator
    sinks: Optional[jax.Array] = None
    # bitnet: RMSNorm over the merged attention output before o_proj
    attn_sub_norm: Optional[nn.RMSNorm] = None
    # doge dynamic-mask attention: additive per-kv-head key bias
    # exp(A * softplus(dt_proj(v_merged))) on the scaled logits
    dyn_mask_A: Optional[jax.Array] = None
    dt_proj: Optional[nn.Linear] = None
    dyn_mask_keep_window: Optional[int] = nn.static_field(default=None)
    qk_norm_flat: bool = nn.static_field(default=False)
    n_heads: int = nn.static_field(default=8)
    n_kv_heads: int = nn.static_field(default=8)
    rope_theta: float = nn.static_field(default=10000.0)
    # gemma2: tanh softcap on attention logits and fixed query scale
    logit_softcap: Optional[float] = nn.static_field(default=None)
    scale_override: Optional[float] = nn.static_field(default=None)
    # llama3.1+: (factor, low_freq_factor, high_freq_factor, original_len)
    rope_llama3_scaling: Optional[tuple] = nn.static_field(default=None)
    # smollm3 NoPE layers skip rotary entirely
    use_rope: bool = nn.static_field(default=True)
    # glm4: rotate only the first rope_partial_dim dims, pair-interleaved
    rope_partial_dim: Optional[int] = nn.static_field(default=None)
    rope_interleaved: bool = nn.static_field(default=False)
    # yarn: (inv_freq floats, attention_factor) — see yarn_parameters
    rope_yarn: Optional[tuple] = nn.static_field(default=None)
    # gpt_oss sliding layers: attend only to the last `sliding_window` keys
    sliding_window: Optional[int] = nn.static_field(default=None)
    # bloom/mpt ALiBi: per-head slope * key-position bias on the logits
    # (equivalent to the distance form under row-wise softmax shift
    # invariance, the identity HF's build_alibi_tensor relies on)
    use_alibi: bool = nn.static_field(default=False)
    # olmo/dbrx: clamp q/k/v projection outputs to ±clip_qkv
    clip_qkv: Optional[float] = nn.static_field(default=None)
    # llama4: affine-free per-head RMS (L2 norm) on q/k AFTER rope
    qk_l2norm: bool = nn.static_field(default=False)
    qk_l2norm_eps: float = nn.static_field(default=1e-6)
    # llama4 NoPE layers: q scaled by
    # log1p(floor((pos+1)/floor_scale)) * attn_scale + 1
    attn_temperature: Optional[tuple] = nn.static_field(default=None)
    # llama4 chunked_attention layers: attend only within the same
    # attention_chunk_size block (block-diagonal causal)
    chunk_size: Optional[int] = nn.static_field(default=None)
    # qwen3_next: q_proj is fused (q | gate) per head; the attention
    # output is multiplied by sigmoid(gate) before o_proj
    gated: bool = nn.static_field(default=False)

    def project_qkv(
        self,
        x: jax.Array,
        ctx: Optional[nn.Ctx] = None,
        positions: Optional[jax.Array] = None,
    ) -> tuple[jax.Array, jax.Array, jax.Array, Optional[jax.Array]]:
        """Everything before the attention contraction: projections, q/k
        norms, clipping, rope, post-rope norms and temperature scaling.
        Returns ``(q, k, v, out_gate)`` with q ``(b, s, n_heads, hd)`` and
        k/v ``(b, s, n_kv_heads, hd)`` — BEFORE any GQA head repeat.  Split
        out so the KV-cache decode path (serving.py) reuses the exact
        projection pipeline without duplicating it."""
        b, s, _ = x.shape
        q = self.q_proj(x, ctx)
        out_gate = None
        if self.gated:  # qwen3_next fused (q | gate) per head
            hd2 = q.shape[-1] // self.n_heads
            qg = q.reshape(b, s, self.n_heads, hd2)
            q, out_gate = qg[..., : hd2 // 2], qg[..., hd2 // 2 :]
            out_gate = out_gate.reshape(b, s, -1)
            q = q.reshape(b, s, -1)
        hd = q.shape[-1] // self.n_heads  # robust to decomposed projections
        k = self.k_proj(x, ctx)
        v = self.v_proj(x, ctx)
        if self.q_norm is not None and self.qk_norm_flat:
            q = self.q_norm(q, ctx)  # olmo2: all heads jointly
            k = self.k_norm(k, ctx)
        if self.clip_qkv is not None:  # olmo/dbrx/olmoe (olmoe: post-norm)
            c = self.clip_qkv
            q, k, v = (jnp.clip(t, -c, c) for t in (q, k, v))
        q = q.reshape(b, s, self.n_heads, hd)
        k = k.reshape(b, s, self.n_kv_heads, hd)
        v = v.reshape(b, s, self.n_kv_heads, hd)
        if self.q_norm is not None and not self.qk_norm_flat:
            q = self.q_norm(q, ctx)  # qwen3: per head
            k = self.k_norm(k, ctx)
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))
        if self.use_rope:
            q = _rope(
                q, positions, self.rope_theta, self.rope_llama3_scaling,
                self.rope_partial_dim, self.rope_interleaved,
                self.rope_yarn,
            )
            k = _rope(
                k, positions, self.rope_theta, self.rope_llama3_scaling,
                self.rope_partial_dim, self.rope_interleaved,
                self.rope_yarn,
            )

        if self.qk_l2norm:  # llama4: post-rope, affine-free, per head
            def _l2(t):
                tf = t.astype(jnp.float32)
                return (
                    tf
                    * jax.lax.rsqrt(
                        jnp.mean(jnp.square(tf), axis=-1, keepdims=True)
                        + self.qk_l2norm_eps
                    )
                ).astype(t.dtype)

            q, k = _l2(q), _l2(k)
        if self.attn_temperature is not None and not self.use_rope:
            a_scale, floor_scale = self.attn_temperature
            scales = (
                jnp.log1p(
                    jnp.floor((positions.astype(jnp.float32) + 1.0) / floor_scale)
                )
                * a_scale
                + 1.0
            )
            q = (q * scales[..., None, None]).astype(q.dtype)
        return q, k, v, out_gate

    def finish(
        self,
        merged: jax.Array,
        out_gate: Optional[jax.Array],
        ctx: Optional[nn.Ctx] = None,
    ) -> jax.Array:
        """Post-contraction epilogue shared with the KV-cache decode path:
        bitnet sub-norm, qwen3_next output gate, output projection."""
        if self.attn_sub_norm is not None:
            merged = self.attn_sub_norm(merged, ctx)
        if out_gate is not None:
            merged = merged * jax.nn.sigmoid(out_gate)
        return self.o_proj(merged, ctx)

    def __call__(
        self,
        x: jax.Array,
        ctx: Optional[nn.Ctx] = None,
        *,
        positions: Optional[jax.Array] = None,
        attn_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        b, s, d = x.shape
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))
        q, k, v, out_gate = self.project_qkv(x, ctx, positions)
        hd = q.shape[-1]
        dyn_bias = None
        if self.dt_proj is not None:  # doge dynamic-mask attention
            if (
                self.dyn_mask_keep_window is not None
                and s > self.dyn_mask_keep_window
            ):
                raise ValueError(
                    f"doge top-k dynamic masking (seqlen {s} > "
                    f"keep_window_size {self.dyn_mask_keep_window}) is not "
                    "implemented; keep calibration seqlen within the window"
                )
            dt = self.dt_proj(v.reshape(b, s, -1), ctx)  # (b, s_k, n_kv)
            dyn_bias = jnp.exp(
                self.dyn_mask_A.astype(jnp.float32)
                * jax.nn.softplus(dt.astype(jnp.float32))
            ).transpose(0, 2, 1)[:, :, None, :]  # (b, n_kv, 1, s_k)

        rep = self.n_heads // self.n_kv_heads
        if rep > 1:
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)

        scale = (
            self.scale_override if self.scale_override is not None else hd
        ) ** -0.5
        if (
            _FLASH_ENABLED
            and jax.default_backend() == "tpu"
            and q.dtype == jnp.bfloat16
            and self.logit_softcap is None
            and self.sinks is None
            and self.sliding_window is None
            and not self.use_alibi
            and dyn_bias is None
            and (self.chunk_size is None or s <= self.chunk_size)
            and attn_mask is None
            and s % 128 == 0
            and (hd <= 128 or hd % 128 == 0)
        ):
            # Flash attention (pallas): never materializes the s x s f32
            # logits — at calibration shapes (s=1024, 32 heads) the einsum
            # path writes/reads a 128MB logits tensor per batch element
            # per layer, which HBM-bounds the forward.  The kernel's
            # causal mask from absolute indices matches the einsum path's
            # tril (positions only affect rope, not masking, on both).
            # ops.flash_attention is custom_partitioning-wrapped, so this
            # path stays on under dp/tp meshes (batch/heads shard, the
            # kernel runs per-device) — no device_count gate needed.
            from ..ops.flash_attention import flash_attention as _flash_op

            out = _flash_op(
                q.transpose(0, 2, 1, 3),
                k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
                scale,
            ).transpose(0, 2, 1, 3)
            return self.finish(out.reshape(b, s, -1), out_gate, ctx)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * scale
        if dyn_bias is not None:
            logits = logits + jnp.repeat(
                dyn_bias, self.n_heads // self.n_kv_heads, axis=1
            )
        if self.use_alibi:
            slopes = jnp.asarray(alibi_slopes(self.n_heads))
            logits = logits + (
                slopes[None, :, None, None]
                * positions.astype(jnp.float32)[:, None, None, :]
            )
        if self.logit_softcap is not None:
            cap = jnp.float32(self.logit_softcap)
            logits = cap * jnp.tanh(logits / cap)
        causal = jnp.tril(jnp.ones((s, s), bool))
        if self.sliding_window is not None:
            # attend only to keys within the window: q - k < window
            # (HF sliding_window_overlay convention, self included)
            idx = jnp.arange(s)
            causal = causal & (idx[:, None] - idx[None, :] < self.sliding_window)
        if self.chunk_size is not None:  # llama4 block-diagonal causal
            idx = jnp.arange(s)
            causal = causal & (
                idx[:, None] // self.chunk_size
                == idx[None, :] // self.chunk_size
            )
        mask = causal[None, None, :, :]
        if attn_mask is not None:
            mask = mask & attn_mask[:, None, None, :].astype(bool)
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
        if self.sinks is not None:
            # gpt_oss: a learned per-head logit competes in the softmax
            # denominator and its probability mass is then discarded
            sink = jnp.broadcast_to(
                self.sinks.astype(jnp.float32)[None, :, None, None],
                (b, logits.shape[1], s, 1),
            )
            probs = jax.nn.softmax(
                jnp.concatenate([logits, sink], axis=-1), axis=-1
            )[..., :-1].astype(x.dtype)
        else:
            probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        return self.finish(out.reshape(b, s, -1), out_gate, ctx)

    @staticmethod
    def create(
        key: jax.Array, cfg: TransformerConfig, layer_idx: int = 0
    ) -> "Attention":
        ks = jax.random.split(key, 4)
        hd = cfg.head_dim
        use_rope = cfg.use_rope
        if cfg.rope_layers and layer_idx < len(cfg.rope_layers):
            use_rope = bool(cfg.rope_layers[layer_idx])
        is_sliding = (
            cfg.layer_types
            and layer_idx < len(cfg.layer_types)
            and cfg.layer_types[layer_idx] == "sliding_attention"
        )
        is_chunked = (
            cfg.layer_types
            and layer_idx < len(cfg.layer_types)
            and cfg.layer_types[layer_idx] == "chunked_attention"
        )
        # gemma3: sliding layers rotate at the unscaled local theta; only
        # full-attention layers get rope_theta + the rope_yarn scaling
        local_rope = is_sliding and cfg.rope_local_theta is not None
        return Attention(
            q_proj=nn.Linear.create(
                ks[0],
                cfg.dim,
                cfg.n_heads * hd * (2 if cfg.attn_gate else 1),
                cfg.qkv_bias,
                cfg.dtype,
            ),
            gated=cfg.attn_gate,
            k_proj=nn.Linear.create(
                ks[1], cfg.dim, cfg.n_kv_heads * hd, cfg.qkv_bias, cfg.dtype
            ),
            v_proj=nn.Linear.create(
                ks[2], cfg.dim, cfg.n_kv_heads * hd, cfg.qkv_bias, cfg.dtype
            ),
            o_proj=nn.Linear.create(
                ks[3], cfg.n_heads * hd, cfg.dim, cfg.o_proj_bias, cfg.dtype
            ),
            sinks=(
                jnp.zeros((cfg.n_heads,), cfg.dtype)
                if cfg.attn_sinks
                else None
            ),
            logit_softcap=cfg.attn_logit_softcap,
            scale_override=cfg.query_scale_override,
            rope_llama3_scaling=cfg.rope_llama3_scaling,
            q_norm=(
                _make_qk_norm(cfg, cfg.n_heads * hd if cfg.qk_norm_flat else hd)
                if cfg.qk_norm or cfg.qk_norm_flat
                else None
            ),
            k_norm=(
                _make_qk_norm(
                    cfg, cfg.n_kv_heads * hd if cfg.qk_norm_flat else hd
                )
                if cfg.qk_norm or cfg.qk_norm_flat
                else None
            ),
            qk_norm_flat=cfg.qk_norm_flat,
            n_heads=cfg.n_heads,
            n_kv_heads=cfg.n_kv_heads,
            rope_theta=(
                cfg.rope_local_theta if local_rope else cfg.rope_theta
            ),
            use_rope=use_rope,
            rope_partial_dim=(
                int(hd * cfg.rope_partial_factor)
                if cfg.rope_partial_factor is not None
                else None
            ),
            rope_interleaved=cfg.rope_interleaved,
            rope_yarn=None if local_rope else cfg.rope_yarn,
            use_alibi=cfg.use_alibi,
            clip_qkv=cfg.clip_qkv,
            sliding_window=cfg.sliding_window if is_sliding else None,
            attn_sub_norm=(
                nn.RMSNorm.create(cfg.n_heads * hd, cfg.norm_eps, cfg.dtype)
                if cfg.sub_norms
                else None
            ),
            dyn_mask_A=(
                jnp.zeros((cfg.n_kv_heads,), cfg.dtype)
                if cfg.dyn_mask_keep_window is not None
                else None
            ),
            dt_proj=(
                nn.Linear.create(
                    jax.random.fold_in(key, 7),
                    cfg.n_kv_heads * hd,
                    cfg.n_kv_heads,
                    cfg.qkv_bias,
                    cfg.dtype,
                )
                if cfg.dyn_mask_keep_window is not None
                else None
            ),
            dyn_mask_keep_window=cfg.dyn_mask_keep_window,
            qk_l2norm=cfg.qk_l2norm and use_rope,
            qk_l2norm_eps=cfg.norm_eps,
            attn_temperature=cfg.attn_temperature_tuning,
            chunk_size=(
                cfg.attention_chunk_size if is_chunked else None
            ),
        )


class DiffAttention(nn.Module):
    """DiffLlama differential attention (HF DiffLlamaAttention): the head
    pool runs ONE softmax over all n_heads, then splits into two halves
    whose value-weighted outputs are SUBTRACTED with a learned lambda —
    lambda = exp(lq1.lk1) - exp(lq2.lk2) + lambda_init, lambda_init
    layer-indexed as 0.8 - 0.6*exp(-0.3*layer_idx).  Values are paired
    feature-wise to 2*head_dim (half as many value groups), the
    difference is RMS-normalized (no affine) per group and scaled by
    (1 - lambda_init) before o_proj."""

    q_proj: nn.Linear
    k_proj: nn.Linear
    v_proj: nn.Linear
    o_proj: nn.Linear
    lambda_q1: jax.Array
    lambda_k1: jax.Array
    lambda_q2: jax.Array
    lambda_k2: jax.Array
    n_heads: int = nn.static_field(default=8)
    n_kv_heads: int = nn.static_field(default=8)
    rope_theta: float = nn.static_field(default=10000.0)
    lambda_init: float = nn.static_field(default=0.8)
    norm_eps: float = nn.static_field(default=1e-6)

    def __call__(
        self,
        x: jax.Array,
        ctx: Optional[nn.Ctx] = None,
        *,
        positions: Optional[jax.Array] = None,
        attn_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        b, s, _ = x.shape
        q = self.q_proj(x, ctx)
        hd = q.shape[-1] // self.n_heads
        k = self.k_proj(x, ctx)
        v = self.v_proj(x, ctx)
        q = q.reshape(b, s, self.n_heads, hd)
        k = k.reshape(b, s, self.n_kv_heads, hd)
        v = v.reshape(b, s, self.n_kv_heads, hd)
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))
        q = _rope(q, positions, self.rope_theta, None, None, False, None)
        k = _rope(k, positions, self.rope_theta, None, None, False, None)
        rep = self.n_heads // self.n_kv_heads
        if rep > 1:
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
        half = self.n_heads // 2
        # values pair feature-wise: (b, s, half, 2*hd)
        vp = jnp.concatenate([v[:, :, :half], v[:, :, half:]], axis=-1)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (hd**-0.5)
        causal = jnp.tril(jnp.ones((s, s), bool))[None, None]
        if attn_mask is not None:
            causal = causal & attn_mask[:, None, None, :].astype(bool)
        logits = jnp.where(causal, logits, jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        o1 = jnp.einsum("bhqk,bkhd->bqhd", probs[:, :half], vp)
        o2 = jnp.einsum("bhqk,bkhd->bqhd", probs[:, half:], vp)
        lam1 = jnp.exp(
            jnp.sum(
                self.lambda_q1.astype(jnp.float32)
                * self.lambda_k1.astype(jnp.float32)
            )
        )
        lam2 = jnp.exp(
            jnp.sum(
                self.lambda_q2.astype(jnp.float32)
                * self.lambda_k2.astype(jnp.float32)
            )
        )
        lam = (lam1 - lam2 + self.lambda_init).astype(x.dtype)
        out = o1 - lam * o2
        # groupnorm: affine-free RMSNorm over the paired 2*hd features
        of = out.astype(jnp.float32)
        rms = jax.lax.rsqrt(
            jnp.mean(jnp.square(of), axis=-1, keepdims=True) + self.norm_eps
        )
        out = ((of * rms) * (1.0 - self.lambda_init)).astype(x.dtype)
        return self.o_proj(out.reshape(b, s, -1), ctx)

    @staticmethod
    def create(
        key: jax.Array, cfg: TransformerConfig, layer_idx: int = 0
    ) -> "DiffAttention":
        import math

        ks = jax.random.split(key, 8)
        hd = cfg.head_dim
        std = 0.1  # config lambda_std_dev default
        return DiffAttention(
            q_proj=nn.Linear.create(
                ks[0], cfg.dim, cfg.n_heads * hd, cfg.qkv_bias, cfg.dtype
            ),
            k_proj=nn.Linear.create(
                ks[1], cfg.dim, cfg.n_kv_heads * hd, cfg.qkv_bias, cfg.dtype
            ),
            v_proj=nn.Linear.create(
                ks[2], cfg.dim, cfg.n_kv_heads * hd, cfg.qkv_bias, cfg.dtype
            ),
            o_proj=nn.Linear.create(
                ks[3], cfg.n_heads * hd, cfg.dim, cfg.o_proj_bias, cfg.dtype
            ),
            lambda_q1=std * jax.random.normal(ks[4], (hd,), cfg.dtype),
            lambda_k1=std * jax.random.normal(ks[5], (hd,), cfg.dtype),
            lambda_q2=std * jax.random.normal(ks[6], (hd,), cfg.dtype),
            lambda_k2=std * jax.random.normal(ks[7], (hd,), cfg.dtype),
            n_heads=cfg.n_heads,
            n_kv_heads=cfg.n_kv_heads,
            rope_theta=cfg.rope_theta,
            lambda_init=0.8 - 0.6 * math.exp(-0.3 * layer_idx),
            norm_eps=cfg.norm_eps,
        )


class LightningAttention(nn.Module):
    """MiniMax lightning (linear) attention (HF MiniMaxLightningAttention):
    silu(qkv_proj(x)) split per head, processed in blocks — intra-block
    (Q Kᵀ ⊙ exp(-slope·(i-j)) ) V plus inter-block Q·S with the running
    Kᵀ V state decayed by exp(-slope·block) between blocks — then an RMS
    norm over the merged heads, a sigmoid output gate from the BLOCK
    INPUT, and out_proj.  The per-head slope is ALiBi-style
    (1/2^(8/H))^(h+1) scaled by (1 - l/(L-1+1e-5) + 1e-5).  The
    inter-block recurrence runs as a log-depth associative scan; every
    heavy contraction is an einsum."""

    qkv_proj: nn.Linear  # dim -> 3*H*hd
    out_proj: nn.Linear
    output_gate: nn.Linear  # dim -> H*hd
    norm: nn.RMSNorm  # over H*hd
    n_heads: int = nn.static_field(default=8)
    block_size: int = nn.static_field(default=256)
    layer_idx: int = nn.static_field(default=0)
    n_layers: int = nn.static_field(default=1)

    def _slope(self) -> jax.Array:
        base = 1.0 / (2.0 ** (8.0 / self.n_heads))
        exponent = jnp.arange(1, self.n_heads + 1, dtype=jnp.float32)
        factor = 1.0 - self.layer_idx / (self.n_layers - 1 + 1e-5) + 1e-5
        return (base**exponent) * factor  # (H,)

    def __call__(
        self,
        x: jax.Array,
        ctx: Optional[nn.Ctx] = None,
        *,
        positions: Optional[jax.Array] = None,
        attn_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        return self.forward_with_state(x, ctx, attn_mask=attn_mask)[0]

    def init_state(self, batch_size: int, dtype: Any):
        # derive hd from the norm (over H*hd) — robust to decomposed
        # qkv/out projections, whose factor pairs have no out_features
        hd = self.norm.scale.shape[0] // self.n_heads
        return None, jnp.zeros(
            (batch_size, self.n_heads, hd, hd), jnp.float32
        )

    def forward_with_state(
        self,
        x: jax.Array,
        ctx: Optional[nn.Ctx] = None,
        conv_state: None = None,
        rec_state: Optional[jax.Array] = None,
        *,
        positions: Optional[jax.Array] = None,
        attn_mask: Optional[jax.Array] = None,
    ) -> tuple[jax.Array, None, jax.Array]:
        """Stateful forward for KV-cache-style decoding: ``rec_state``
        (b, H, hd, hd) f32 is the decayed Kᵀ V sum AT THE LAST CONSUMED
        TOKEN — exactly what the inter-block recurrence passes between
        blocks, so it enters where the zero block sat (decayed per block
        by the cumulative block decay) and every query applies its own
        exp(-slope (i+1)) on top.  The returned state is computed
        decay-safe on the UNPADDED k/v (pad-block decays never touch it).
        None = stream start; the stateless call delegates here,
        bit-identical (the extra state output is dead code there)."""
        b, s, _ = x.shape
        H = self.n_heads
        qkv = jax.nn.silu(self.qkv_proj(x, ctx))
        hd = qkv.shape[-1] // (3 * H)
        qkv = qkv.reshape(b, s, H, 3 * hd)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if attn_mask is not None:
            v = v * attn_mask[..., None, None].astype(v.dtype)
        bs = self.block_size
        pad = (-s) % bs
        nb = (s + pad) // bs

        def chunks(t):  # (b, s, H, hd) -> (b, nb, bs, H, hd)
            t = jnp.pad(t, ((0, 0), (0, pad), (0, 0), (0, 0)))
            return t.reshape(b, nb, bs, H, hd)

        qc, kc, vc = chunks(q), chunks(k), chunks(v)
        slope = self._slope()  # (H,)
        idx = jnp.arange(bs, dtype=jnp.float32)
        # decay within a block: exp(-slope (i - j)) for i >= j
        diag = idx[:, None] - idx[None, :]
        diag_decay = jnp.where(
            diag >= 0, jnp.exp(-slope[:, None, None] * diag), 0.0
        )  # (H, bs, bs)
        q_decay = jnp.exp(-slope[None, :] * (idx[:, None] + 1.0))  # (bs, H)
        k_decay = jnp.exp(-slope[None, :] * (bs - (idx[:, None] + 1.0)))
        block_decay = jnp.exp(-slope * bs)  # (H,)
        # intra-block: all blocks in parallel
        w = jnp.einsum(
            "bnihd,bnjhd->bnhij", qc, kc, preferred_element_type=jnp.float32
        )
        intra = jnp.einsum(
            "bnhij,bnjhd->bnihd", w * diag_decay[None, None], vc.astype(jnp.float32)
        )
        # per-block Kᵀ V states and the decayed running sum across blocks
        states = jnp.einsum(
            "bnjhd,bnjhe->bnhde",
            kc.astype(jnp.float32) * k_decay[None, None, :, :, None],
            vc.astype(jnp.float32),
        )  # (b, nb, H, hd, hd)
        bd = jnp.broadcast_to(
            block_decay[None, None, :, None, None], states.shape
        )

        def comb(left, right):
            aL, sL = left
            aR, sR = right
            return aL * aR, sL * aR + sR

        a_cum, cum = jax.lax.associative_scan(comb, (bd, states), axis=1)
        # state entering block n = cumulative sum through block n-1
        prev = jnp.concatenate(
            [jnp.zeros_like(cum[:, :1]), cum[:, :-1]], axis=1
        )
        if rec_state is not None:
            # injected state entering block n decays by block_decay^n
            pref = jnp.concatenate(
                [jnp.ones_like(a_cum[:, :1]), a_cum[:, :-1]], axis=1
            )
            prev = prev + pref * rec_state.astype(jnp.float32)[:, None]
        inter = jnp.einsum(
            "bnihd,bnhde->bnihe",
            qc.astype(jnp.float32) * q_decay[None, None, :, :, None],
            prev,
        )
        out = (intra + inter).astype(x.dtype).reshape(b, nb * bs, H * hd)
        if pad:
            out = out[:, :s]
        out = self.norm(out, ctx)
        out = jax.nn.sigmoid(self.output_gate(x, ctx)) * out
        # new state at the TRUE last token, on unpadded k/v (no pad-block
        # decay to divide back out, which would overflow for large pads)
        w_last = jnp.exp(
            -slope[None, :]
            * (s - 1 - jnp.arange(s, dtype=jnp.float32))[:, None]
        )  # (s, H)
        new_state = jnp.einsum(
            "bjhd,jh,bjhe->bhde",
            k.astype(jnp.float32),
            w_last,
            v.astype(jnp.float32),
        )
        if rec_state is not None:
            new_state = new_state + (
                jnp.exp(-slope * s)[None, :, None, None]
                * rec_state.astype(jnp.float32)
            )
        return self.out_proj(out, ctx), None, new_state

    @staticmethod
    def create(
        key: jax.Array, cfg: "TransformerConfig", layer_idx: int
    ) -> "LightningAttention":
        ks = jax.random.split(key, 3)
        hd = cfg.head_dim
        return LightningAttention(
            qkv_proj=nn.Linear.create(
                ks[0], cfg.dim, 3 * cfg.n_heads * hd, False, cfg.dtype
            ),
            out_proj=nn.Linear.create(
                ks[1], cfg.n_heads * hd, cfg.dim, False, cfg.dtype
            ),
            output_gate=nn.Linear.create(
                ks[2], cfg.dim, cfg.n_heads * hd, False, cfg.dtype
            ),
            # HF instantiates this norm WITHOUT passing the config eps,
            # so it keeps MiniMaxRMSNorm's default 1e-6
            norm=nn.RMSNorm.create(cfg.n_heads * hd, 1e-6, cfg.dtype),
            n_heads=cfg.n_heads,
            block_size=cfg.lightning_block_size,
            layer_idx=layer_idx,
            n_layers=cfg.n_layers,
        )


class MoAttention(nn.Module):
    """JetMoE mixture of attention heads (HF JetMoeAttention + JetMoeMoA):
    each token routes to top_k attention experts — per-expert query and
    output projections around a SHARED kv projection.  Slot j of a token
    runs the j-th picked expert's q_proj; all slots attend with the
    shared (repeated) keys/values; slot outputs go through their
    expert's output projection, weighted by softmax-over-top-k gates,
    summed, plus a learned output bias.  Experts run zero-masked dense
    (FLOPs ∝ n_experts) so each expert projection stays a plain
    decomposable Linear and taps capture the routed token sets."""

    kv_proj: nn.Linear  # dim -> 2 * n_kv_heads * head_dim
    gate: nn.Linear  # router
    input_experts: tuple  # of nn.Linear (dim -> kv_size)
    output_experts: tuple  # of nn.Linear (kv_size -> dim)
    bias: jax.Array  # (dim,)
    top_k: int = nn.static_field(default=2)
    n_kv_heads: int = nn.static_field(default=8)
    rope_theta: float = nn.static_field(default=10000.0)

    def __call__(
        self,
        x: jax.Array,
        ctx: Optional[nn.Ctx] = None,
        *,
        positions: Optional[jax.Array] = None,
        attn_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        b, s, d = x.shape
        n_exp = len(self.input_experts)
        logits = self.gate(x, ctx).astype(jnp.float32)
        top_logits, top_idx = jax.lax.top_k(logits, self.top_k)
        gates = jax.nn.softmax(top_logits, axis=-1).astype(x.dtype)
        kv = self.kv_proj(x, ctx)
        kv_size = kv.shape[-1] // 2
        hd = kv_size // self.n_kv_heads
        k, v = kv[..., :kv_size], kv[..., kv_size:]
        # per-slot expert queries, zero-masked dense over experts
        q_slots = jnp.zeros((b, s, self.top_k, kv_size), x.dtype)
        for e, expert in enumerate(self.input_experts):
            sel = (top_idx == e).astype(x.dtype)  # (b, s, k)
            any_e = jnp.max(sel, axis=-1, keepdims=True)
            q_e = expert(x * any_e, ctx)  # zero rows for unrouted tokens
            q_slots = q_slots + sel[..., None] * q_e[:, :, None, :]
        q = q_slots.reshape(b, s, self.top_k * self.n_kv_heads, hd)
        k = k.reshape(b, s, self.n_kv_heads, hd)
        v = v.reshape(b, s, self.n_kv_heads, hd)
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))
        q = _rope(q, positions, self.rope_theta, None, None, False, None)
        k = _rope(k, positions, self.rope_theta, None, None, False, None)
        k = jnp.tile(k, (1, 1, self.top_k, 1))
        v = jnp.tile(v, (1, 1, self.top_k, 1))
        logits_a = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (hd**-0.5)
        causal = jnp.tril(jnp.ones((s, s), bool))[None, None]
        if attn_mask is not None:
            causal = causal & attn_mask[:, None, None, :].astype(bool)
        logits_a = jnp.where(causal, logits_a, jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(logits_a, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        out = out.reshape(b, s, self.top_k, kv_size)
        y = jnp.zeros((b, s, d), x.dtype)
        for e, expert in enumerate(self.output_experts):
            sel = (top_idx == e).astype(x.dtype)  # (b, s, k)
            o_in = jnp.einsum("bsk,bskh->bsh", sel, out)
            w_e = jnp.sum(sel * gates, axis=-1, keepdims=True)
            y = y + expert(o_in, ctx) * w_e
        return y + self.bias.astype(x.dtype)

    @staticmethod
    def create(key: jax.Array, cfg: TransformerConfig) -> "MoAttention":
        ks = jax.random.split(key, 2 * cfg.n_experts + 2)
        kv_size = cfg.n_kv_heads * cfg.head_dim
        return MoAttention(
            kv_proj=nn.Linear.create(
                ks[0], cfg.dim, 2 * kv_size, False, cfg.dtype
            ),
            gate=nn.Linear.create(
                ks[1], cfg.dim, cfg.n_experts, False, cfg.dtype
            ),
            input_experts=tuple(
                nn.Linear.create(ks[2 + e], cfg.dim, kv_size, False, cfg.dtype)
                for e in range(cfg.n_experts)
            ),
            output_experts=tuple(
                nn.Linear.create(
                    ks[2 + cfg.n_experts + e], kv_size, cfg.dim, False,
                    cfg.dtype,
                )
                for e in range(cfg.n_experts)
            ),
            bias=jnp.zeros((cfg.dim,), cfg.dtype),
            top_k=cfg.n_experts_per_tok,
            n_kv_heads=cfg.n_kv_heads,
            rope_theta=cfg.rope_theta,
        )


class MLAttention(nn.Module):
    """Deepseek V2/V3 multi-head latent attention (HF DeepseekV2Attention /
    DeepseekV3Attention; field names match the checkpoint layout).

    Queries go through an optional low-rank bottleneck (q_a_proj ->
    RMSNorm -> q_b_proj; direct q_proj when q_lora_rank is None, the
    V2-Lite layout).  Keys/values are compressed to a kv_lora_rank latent
    plus ONE shared per-token rope head (kv_a_proj_with_mqa), normalized,
    and expanded per head by kv_b_proj into qk_nope_head_dim key dims and
    v_head_dim value dims; attention runs over qk_nope+qk_rope dims with
    1/sqrt(qk_head_dim) scaling while values keep v_head_dim.

    Rope applies only to the decoupled rope dims, pair-interleaved when
    ``rope_interleaved`` (HF v3 de-interleaves then splits halves; v2
    rotates complex pairs in place — both are the same pair rotations
    under a fixed permutation applied to q and k alike, so attention
    scores are identical; we use the in-place convention).  Yarn scaling
    applies over the rope dims (inv_freq + attention factor precomputed
    by yarn_parameters) with the deepseek mscale^2 multiplier on the
    softmax scale (softmax_scale_mult).

    Every projection (q_a/q_b/kv_a/kv_b/o) is a plain Linear and
    therefore a dwain/falor site; kv_a_proj_with_mqa and q_a_proj are the
    model's own low-rank bottlenecks — already-compressed sites the
    ladder will typically reject, which is the correct outcome."""

    kv_a_proj_with_mqa: nn.Linear
    kv_a_layernorm: nn.RMSNorm
    kv_b_proj: nn.Linear
    o_proj: nn.Linear
    q_proj: Optional[nn.Linear] = None  # V2-Lite: no q bottleneck
    q_a_proj: Optional[nn.Linear] = None
    q_a_layernorm: Optional[nn.RMSNorm] = None
    q_b_proj: Optional[nn.Linear] = None
    n_heads: int = nn.static_field(default=8)
    qk_nope_head_dim: int = nn.static_field(default=128)
    qk_rope_head_dim: int = nn.static_field(default=64)
    v_head_dim: int = nn.static_field(default=128)
    kv_lora_rank: int = nn.static_field(default=512)
    rope_theta: float = nn.static_field(default=10000.0)
    rope_interleaved: bool = nn.static_field(default=True)
    rope_yarn: Optional[tuple] = nn.static_field(default=None)
    # extra multiplier on qk_head^-0.5 (deepseek yarn mscale^2)
    softmax_scale_mult: float = nn.static_field(default=1.0)

    def __call__(
        self,
        x: jax.Array,
        ctx: Optional[nn.Ctx] = None,
        *,
        positions: Optional[jax.Array] = None,
        attn_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        b, s, _ = x.shape
        nope, rope_d = self.qk_nope_head_dim, self.qk_rope_head_dim
        qk_head = nope + rope_d
        if self.q_a_proj is not None:
            q = self.q_b_proj(self.q_a_layernorm(self.q_a_proj(x, ctx)), ctx)
        else:
            q = self.q_proj(x, ctx)
        q = q.reshape(b, s, self.n_heads, qk_head)
        q_nope, q_pe = q[..., :nope], q[..., nope:]

        ckv = self.kv_a_proj_with_mqa(x, ctx)
        k_lat, k_pe = ckv[..., : self.kv_lora_rank], ckv[..., self.kv_lora_rank :]
        kv = self.kv_b_proj(self.kv_a_layernorm(k_lat), ctx)
        kv = kv.reshape(b, s, self.n_heads, nope + self.v_head_dim)
        k_nope, v = kv[..., :nope], kv[..., nope:]
        k_pe = k_pe[:, :, None, :]  # one shared rope head

        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))
        q_pe = _rope(
            q_pe, positions, self.rope_theta,
            interleaved=self.rope_interleaved, yarn=self.rope_yarn,
        )
        k_pe = _rope(
            k_pe, positions, self.rope_theta,
            interleaved=self.rope_interleaved, yarn=self.rope_yarn,
        )
        k_pe = jnp.broadcast_to(k_pe, (b, s, self.n_heads, rope_d))

        qf = jnp.concatenate([q_nope, q_pe], axis=-1)
        kf = jnp.concatenate([k_nope, k_pe], axis=-1)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", qf, kf, preferred_element_type=jnp.float32
        ) * (qk_head ** -0.5 * self.softmax_scale_mult)
        causal = jnp.tril(jnp.ones((s, s), bool))
        mask = causal[None, None, :, :]
        if attn_mask is not None:
            mask = mask & attn_mask[:, None, None, :].astype(bool)
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        return self.o_proj(out.reshape(b, s, -1), ctx)

    @staticmethod
    def create(key: jax.Array, cfg: TransformerConfig) -> "MLAttention":
        ks = jax.random.split(key, 5)
        qk_head = cfg.qk_nope_head_dim + cfg.qk_rope_head_dim
        if cfg.q_lora_rank is not None:
            q_kw = dict(
                q_a_proj=nn.Linear.create(
                    ks[0], cfg.dim, cfg.q_lora_rank, False, cfg.dtype
                ),
                # HF (deepseek AND longcat) constructs the lora norms
                # WITHOUT passing the config eps — they keep the RMSNorm
                # class default 1e-6 regardless of rms_norm_eps
                q_a_layernorm=nn.RMSNorm.create(
                    cfg.q_lora_rank, 1e-6, cfg.dtype
                ),
                q_b_proj=nn.Linear.create(
                    ks[1], cfg.q_lora_rank, cfg.n_heads * qk_head, False,
                    cfg.dtype,
                ),
            )
        else:
            q_kw = dict(
                q_proj=nn.Linear.create(
                    ks[0], cfg.dim, cfg.n_heads * qk_head, False, cfg.dtype
                )
            )
        return MLAttention(
            kv_a_proj_with_mqa=nn.Linear.create(
                ks[2], cfg.dim, cfg.kv_lora_rank + cfg.qk_rope_head_dim,
                False, cfg.dtype,
            ),
            kv_a_layernorm=nn.RMSNorm.create(
                cfg.kv_lora_rank, 1e-6, cfg.dtype
            ),
            kv_b_proj=nn.Linear.create(
                ks[3], cfg.kv_lora_rank,
                cfg.n_heads * (cfg.qk_nope_head_dim + cfg.v_head_dim),
                False, cfg.dtype,
            ),
            o_proj=nn.Linear.create(
                ks[4], cfg.n_heads * cfg.v_head_dim, cfg.dim, False, cfg.dtype
            ),
            n_heads=cfg.n_heads,
            qk_nope_head_dim=cfg.qk_nope_head_dim,
            qk_rope_head_dim=cfg.qk_rope_head_dim,
            v_head_dim=cfg.v_head_dim,
            kv_lora_rank=cfg.kv_lora_rank,
            rope_theta=cfg.rope_theta,
            rope_interleaved=cfg.rope_interleaved,
            rope_yarn=cfg.rope_yarn,
            softmax_scale_mult=(
                cfg.mla_softmax_scale
                if cfg.mla_softmax_scale is not None
                else 1.0
            ),
            **q_kw,
        )


class MLP(nn.Module):
    """Gated MLP: SwiGLU (llama/qwen2), GeGLU-tanh (gemma), or gpt_oss's
    clamped swiglu (act "gptoss_glu": gate clamped above at clamp_limit,
    up clamped to ±clamp_limit, glu = gate·sigmoid(1.702·gate), output
    (up+1)·glu — HF GptOssExperts with its hardcoded alpha)."""

    # gate_proj is None for the non-gated families (gpt2 / neox / falcon
    # / starcoder2): up_proj -> act -> down_proj
    gate_proj: Optional[nn.Linear]
    up_proj: nn.Linear
    down_proj: nn.Linear
    act: str = nn.static_field(default="silu")
    clamp_limit: float = nn.static_field(default=7.0)
    # apertus xIELU (HF XIELUActivation): learned scalar alphas, raw
    # (pre-softplus) checkpoint values; beta/eps fixed bf16 buffers
    act_alpha_p: Optional[jax.Array] = None
    act_alpha_n: Optional[jax.Array] = None
    # bitnet: RMSNorm over the activation product before down_proj
    ffn_sub_norm: Optional[nn.RMSNorm] = None

    def _apply_act(self, h: jax.Array) -> jax.Array:
        if self.act == "gelu_tanh":
            return jax.nn.gelu(h, approximate=True)
        if self.act == "gelu_exact":
            return jax.nn.gelu(h, approximate=False)
        if self.act == "relu":
            return jax.nn.relu(h)
        if self.act == "relu2":  # nemotron relu^2
            return jnp.square(jax.nn.relu(h))
        if self.act == "quick_gelu":  # imagegpt/clip x*sigmoid(1.702x)
            return h * jax.nn.sigmoid(1.702 * h)
        if self.act == "xielu":
            # HF _xielu_python: x>0 -> alpha_p x^2 + beta x; else
            # (expm1(min(x, eps)) - x) alpha_n + beta x, with
            # alpha_p = softplus(a_p), alpha_n = beta + softplus(a_n).
            # HF keeps the alpha params (and the softplus outputs) in
            # bf16 regardless of model dtype — reproduce that rounding.
            beta = jnp.float32(0.5)
            eps = jnp.asarray(-1e-6, jnp.bfloat16).astype(jnp.float32)
            ap_ = (
                jax.nn.softplus(self.act_alpha_p.astype(jnp.float32))
                .astype(jnp.bfloat16)
                .astype(jnp.float32)
            )
            an_ = beta + (
                jax.nn.softplus(self.act_alpha_n.astype(jnp.float32))
                .astype(jnp.bfloat16)
                .astype(jnp.float32)
            )
            xf = h.astype(jnp.float32)
            pos = ap_ * xf * xf + beta * xf
            neg = (jnp.expm1(jnp.minimum(xf, eps)) - xf) * an_ + beta * xf
            return jnp.where(xf > 0, pos, neg).astype(h.dtype)
        return jax.nn.silu(h)

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        if self.gate_proj is None:
            h = self._apply_act(self.up_proj(x, ctx))
        elif self.act == "gptoss_glu":
            g = jnp.minimum(self.gate_proj(x, ctx), self.clamp_limit)
            u = jnp.clip(self.up_proj(x, ctx), -self.clamp_limit, self.clamp_limit)
            h = (u + 1.0) * (g * jax.nn.sigmoid(1.702 * g))
        else:
            h = self._apply_act(self.gate_proj(x, ctx)) * self.up_proj(x, ctx)
        if self.ffn_sub_norm is not None:  # bitnet
            h = self.ffn_sub_norm(h, ctx)
        return self.down_proj(h, ctx)

    @staticmethod
    def create(key: jax.Array, cfg: TransformerConfig) -> "MLP":
        ks = jax.random.split(key, 3)
        act = cfg.mlp_act
        bias = cfg.mlp_bias
        if cfg.moe_clamp_limit is not None:
            act = "gptoss_glu"
            bias = True  # gpt_oss experts carry biases on all projections
        return MLP(
            gate_proj=(
                nn.Linear.create(ks[0], cfg.dim, cfg.hidden_dim, bias, cfg.dtype)
                if cfg.mlp_gated
                else None
            ),
            up_proj=nn.Linear.create(ks[1], cfg.dim, cfg.hidden_dim, bias, cfg.dtype),
            down_proj=nn.Linear.create(ks[2], cfg.hidden_dim, cfg.dim, bias, cfg.dtype),
            act=act,
            clamp_limit=cfg.moe_clamp_limit if cfg.moe_clamp_limit is not None else 7.0,
            # HF XIELUActivation init: log(expm1(0.8)) and
            # log(expm1(0.8 - 0.5)), stored bf16
            act_alpha_p=(
                jnp.log(jnp.expm1(jnp.asarray([0.8], jnp.bfloat16)))
                .astype(jnp.float32)
                if act == "xielu"
                else None
            ),
            act_alpha_n=(
                jnp.log(jnp.expm1(jnp.asarray([0.3], jnp.bfloat16)))
                .astype(jnp.float32)
                if act == "xielu"
                else None
            ),
            ffn_sub_norm=(
                nn.RMSNorm.create(cfg.hidden_dim, cfg.norm_eps, cfg.dtype)
                if cfg.sub_norms
                else None
            ),
        )




def _moe_routing(
    mod: Any, n_experts: int, x: jax.Array, ctx: Optional["nn.Ctx"]
) -> tuple[jax.Array, jax.Array]:
    """Top-k expert ids and combine weights; HF computes the scores
    in f32 regardless of activation dtype and casts the (optionally
    renormalized) top-k weights back.

    Shared by ``MoEMLP`` (tuple-of-expert form) and ``StackedMoEMLP``
    (the ep-shardable stacked serving form, models/moe_stack.py) — ``m``
    is any module carrying the router Linear (``gate``) and the routing
    static fields.

    Deepseek extensions on top of the mixtral/qwen softmax-top-k:
    sigmoid scores (v3), a selection-only correction bias, and
    group-limited choice (experts partitioned into n_group groups,
    only the best topk_group groups eligible; group score is the max
    member for v2's group_limited_greedy, the top-2 sum for v3's
    noaux_tc); combine weights always come from the RAW scores at the
    selected indices, scaled by routed_scaling."""
    logits = mod.gate(x, ctx).astype(jnp.float32)
    if mod.sparsemixer:  # phimoe, eval path of HF sparsemixer()
        neg = jnp.finfo(jnp.float32).min

        def pick(scores, base):
            # mask experts whose relative gap to the max exceeds
            # 2*jitter_eps, softmax the REMAINING base scores, and
            # take the max element's weight
            m = jnp.max(scores, axis=-1, keepdims=True)
            idx = jnp.argmax(scores, axis=-1)
            factor = jnp.maximum(jnp.abs(logits), m)
            drop = (m - logits) / factor > 2 * mod.jitter_eps
            gates = jax.nn.softmax(
                jnp.where(drop, neg, base), axis=-1
            )
            w = jnp.take_along_axis(gates, idx[..., None], axis=-1)
            return w[..., 0], idx

        w1, idx1 = pick(logits, logits)
        masked = jnp.where(
            jax.nn.one_hot(idx1, n_experts, dtype=bool), neg, logits
        )
        w2, idx2 = pick(masked, masked)
        return (
            jnp.stack([w1, w2], axis=-1),
            jnp.stack([idx1, idx2], axis=-1),
        )
    if mod.topk_then_sigmoid:  # llama4 Llama4Router
        top_logits, top_idx = jax.lax.top_k(logits, mod.top_k)
        return jax.nn.sigmoid(top_logits), top_idx
    if mod.softmax_after_topk:  # gpt_oss GptOssTopKRouter
        top_logits, top_idx = jax.lax.top_k(logits, mod.top_k)
        return jax.nn.softmax(top_logits, axis=-1), top_idx
    if mod.score_func == "sigmoid":
        scores = jax.nn.sigmoid(logits)
    else:
        scores = jax.nn.softmax(logits, axis=-1)
    choice = scores
    if mod.gate_correction_bias is not None:
        choice = choice + mod.gate_correction_bias.astype(jnp.float32)
    if mod.n_group > 1:
        g = choice.reshape(*choice.shape[:-1], mod.n_group, -1)
        if mod.group_top2_sum:
            group_scores = jnp.sum(jax.lax.top_k(g, 2)[0], axis=-1)
        else:
            group_scores = jnp.max(g, axis=-1)
        _, group_idx = jax.lax.top_k(group_scores, mod.topk_group)
        group_mask = jnp.sum(
            jax.nn.one_hot(group_idx, mod.n_group, dtype=jnp.float32),
            axis=-2,
        )  # (..., n_group)
        expert_mask = jnp.repeat(
            group_mask, n_experts // mod.n_group, axis=-1
        )
        choice = jnp.where(expert_mask > 0, choice, 0.0)
    _, top_idx = jax.lax.top_k(choice, mod.top_k)
    top_vals = jnp.take_along_axis(scores, top_idx, axis=-1)
    if mod.norm_topk:
        denom = jnp.sum(top_vals, axis=-1, keepdims=True)
        if mod.score_func == "sigmoid":
            denom = denom + 1e-20  # HF v3 epsilon
        if mod.norm_min > 0.0:  # ernie4_5_moe clamp
            denom = jnp.maximum(denom, mod.norm_min)
        top_vals = top_vals / denom
    if mod.routed_scaling != 1.0:
        top_vals = top_vals * jnp.float32(mod.routed_scaling)
    return top_vals, top_idx


# int8 grouped-kernel dispatch: GSPMD-legal since the kernel grew
# custom_partitioning over the expert/output-column axes (VERDICT r4 #4
# — previously gated to device_count() == 1, silently falling off the
# fast path under the ep/tp meshes).  CPU tests force interpret mode by
# monkeypatching these.
_INT8_GMM_INTERPRET = False


def _use_int8_gmm() -> bool:
    if _INT8_GMM_INTERPRET:
        return True
    return jax.default_backend() == "tpu"


class MoEMLP(nn.Module):
    """Top-k-routed mixture of expert MLPs (Mixtral / Qwen2-MoE / Qwen3-MoE).

    Two dispatch strategies, chosen statically at trace time:

    * **Grouped (fast) path** — when every expert is a pristine plain
      ``MLP`` of exact-type ``nn.Linear`` projections, the (token, slot)
      pairs are sorted by expert id and the three expert matmuls run as
      ``lax.ragged_dot`` grouped matmuls over kernels stacked to
      ``(E, d, h)`` — the MXU-native MoE dispatch: exact routing (no
      capacity-factor token dropping), expert FLOPs proportional to
      ``top_k`` rather than ``n_experts``.  Kernels stay unstacked in the
      pytree (each expert projection remains an addressable dwain site);
      the stack is traced, so XLA materializes a transient contiguous
      copy per layer call.

    * **Zero-masked dense path** — whenever any expert projection is NOT
      a plain Linear (engine tap wrappers during calibration, decomposed
      factor pairs after surgery, LoRA-wrapped Linears during recovery
      finetune), every expert runs on the full token batch with tokens
      not routed to it ZEROED at its input.  Because expert projections
      are bias-free, zero inputs produce zero outputs, so this is
      numerically the routed computation the HF implementations
      index-add together (MixtralSparseMoeBlock / Qwen3MoeSparseMoeBlock)
      — and the tap capture (engine._Tap) records exactly the ROUTED
      token set per expert: zero rows contribute nothing to an input
      Gram, so low-rank EVD initialization sees each expert's true input
      distribution instead of the all-token superset.  FLOPs overhead is
      n_experts/top_k on the expert matmuls, paid only on calibration /
      post-surgery passes.

    Both paths produce identical routing decisions; their outputs agree
    to matmul-reassociation tolerance (pinned by tests).

    Field names put the router at ``<block>.mlp.gate`` and experts at
    ``<block>.mlp.experts.E.{gate_proj,up_proj,down_proj}`` — the HF
    qwen3_moe layout; mixtral checkpoints are translated on load
    (hf_loader.translate_mixtral_state_dict).  Qwen2-MoE additionally
    carries an always-on ``shared_expert`` whose output is scaled by
    ``sigmoid(shared_expert_gate(x))``.  The router Linear
    (dim x n_experts) is a valid dwain site but far too small to ever
    clear a proportion threshold; blacklist ``.mlp.gate`` to avoid
    wasting a ladder walk on it.
    """

    gate: nn.Linear  # router: dim -> n_experts
    experts: tuple  # of MLP
    # qwen2_moe: always-on shared expert, sigmoid-gated by a dim->1 Linear;
    # deepseek: same field UNGATED (shared_expert_gate stays None) — the
    # checkpoint's plural 'shared_experts' key is renamed on load
    shared_expert: Optional[MLP] = None
    shared_expert_gate: Optional[nn.Linear] = None
    # deepseek_v3 noaux_tc: per-expert bias added to the scores for expert
    # SELECTION only (combine weights use the raw scores) — a state-dict
    # leaf ('gate.e_score_correction_bias' renamed on load)
    gate_correction_bias: Optional[jax.Array] = None
    top_k: int = nn.static_field(default=2)
    norm_topk: bool = nn.static_field(default=True)
    # deepseek routing flavor (see TransformerConfig router_* fields)
    score_func: str = nn.static_field(default="softmax")
    n_group: int = nn.static_field(default=0)
    topk_group: int = nn.static_field(default=0)
    group_top2_sum: bool = nn.static_field(default=False)
    routed_scaling: float = nn.static_field(default=1.0)
    # gpt_oss: top-k on the raw router logits, softmax over just those k
    softmax_after_topk: bool = nn.static_field(default=False)
    # ernie4_5_moe: clamp the renormalization denominator below at this
    norm_min: float = nn.static_field(default=0.0)
    # phimoe: eval-deterministic sparsemixer (sequential top-2; each
    # pick's weight comes from a LOCALLY masked softmax, no joint renorm)
    sparsemixer: bool = nn.static_field(default=False)
    jitter_eps: float = nn.static_field(default=0.01)
    # llama4: weights = sigmoid(top-k raw logits), and they scale the
    # expert INPUTS (not outputs) — different through the gated nonlinearity
    topk_then_sigmoid: bool = nn.static_field(default=False)
    scale_expert_input: bool = nn.static_field(default=False)
    # longcat_flash: the router ALSO scores this many "zero" experts —
    # identity passthroughs whose selection contributes weight * x
    n_zero_experts: int = nn.static_field(default=0)
    # jetmoe: learned bias added to the combined routed output
    output_bias: Optional[jax.Array] = None

    def _experts_are_pristine(self, allow_quant: bool = False) -> bool:
        """Static (trace-time) check: grouped dispatch requires every
        expert projection to be an exact-type plain Linear — tap wrappers,
        decomposed factor pairs, and LoRA wrappers all fail this and fall
        back to the zero-masked dense path.  Biases (gpt_oss) are fine as
        long as their presence is uniform across experts (the grouped path
        stacks them per slot).

        ``allow_quant`` additionally admits weight-only int8
        ``quant.QuantLinear`` projections, uniformly per slot (all
        gate_projs the same type, etc.) — the grouped forward dequantizes
        the stacked int8 grid into the activation dtype, which costs LESS
        transient HBM than stacking bf16 tuple kernels.  Serving dispatch
        passes True; ``stack_moe_experts`` keeps the strict check (its
        stacked form quantizes in place AFTER stacking)."""
        from ..quant import QuantLinear  # lazy: quant imports nn only

        ok = (nn.Linear, QuantLinear) if allow_quant else (nn.Linear,)
        bias_sig = None
        type_sig = None
        for e in self.experts:
            if type(e) is not MLP:
                return False
            if e.ffn_sub_norm is not None:
                return False  # grouped path has no sub-norm hook
            projs = (e.gate_proj, e.up_proj, e.down_proj)
            if any(type(p) not in ok for p in projs):
                return False
            sig = tuple(p.bias is not None for p in projs)
            tsig = tuple(type(p) for p in projs)
            if bias_sig is None:
                bias_sig, type_sig = sig, tsig
            elif sig != bias_sig or tsig != type_sig:
                return False
        return True

    def _routing(
        self, x: jax.Array, ctx: Optional[nn.Ctx]
    ) -> tuple[jax.Array, jax.Array]:
        return _moe_routing(
            self, len(self.experts) + self.n_zero_experts, x, ctx
        )

    def _sort_by_expert(self, x: jax.Array, ctx: Optional[nn.Ctx]):
        """Shared grouped-dispatch prologue: route, sort (token, slot)
        pairs by expert, scale llama4-style inputs.  Returns
        (xg, w_sorted, eid_sorted, tok_sorted, group_sizes)."""
        n_experts = len(self.experts)
        b, s, d = x.shape
        n_tok = b * s
        xf = x.reshape(n_tok, d)
        top_vals, top_idx = self._routing(xf, ctx)
        expert_ids = top_idx.reshape(-1)  # (n_tok * k,), row-major by token
        token_ids = jnp.arange(n_tok * self.top_k, dtype=jnp.int32) // self.top_k
        order = jnp.argsort(expert_ids)
        tok_sorted = token_ids[order]
        group_sizes = jnp.bincount(expert_ids, length=n_experts).astype(jnp.int32)
        xg = xf[tok_sorted]
        w_sorted = top_vals.reshape(-1)[order].astype(x.dtype)
        if self.scale_expert_input:  # llama4: weight scales expert input
            xg = xg * w_sorted[:, None]
        eid_sorted = expert_ids[order]
        return xg, w_sorted, eid_sorted, tok_sorted, group_sizes

    def _act_pair(self, g: jax.Array, u: jax.Array) -> jax.Array:
        """gate/up combine for the grouped paths (matches MLP._apply_act)."""
        e0 = self.experts[0]
        if e0.act == "gptoss_glu":
            lim = e0.clamp_limit
            gc = jnp.minimum(g, lim)
            return (jnp.clip(u, -lim, lim) + 1.0) * (
                gc * jax.nn.sigmoid(1.702 * gc)
            )
        if e0.act == "gelu_tanh":
            return jax.nn.gelu(g, approximate=True) * u
        return jax.nn.silu(g) * u

    def _grouped(self, x: jax.Array, ctx: Optional[nn.Ctx]) -> jax.Array:
        n_experts = len(self.experts)
        b, s, d = x.shape
        n_tok = b * s
        xg, w_sorted, eid_sorted, tok_sorted, group_sizes = (
            self._sort_by_expert(x, ctx)
        )
        use_gmm = (
            jax.default_backend() == "tpu"
            and jax.device_count() == 1  # pallas is opaque to GSPMD
            and xg.dtype == jnp.bfloat16
        )
        m_rows = xg.shape[0]
        pad = (-m_rows) % 512 if use_gmm else 0
        if pad:
            # megablox gmm requires m % tm == 0 (k/n tiles pad internally,
            # the m tile does not).  Pad rows are routed to the LAST
            # expert (group_sizes must sum to the padded m); their outputs
            # are sliced off after the down-projection.
            xg = jnp.concatenate([xg, jnp.zeros((pad, d), xg.dtype)])
            eid_sorted = jnp.concatenate(
                [
                    eid_sorted,
                    jnp.full((pad,), n_experts - 1, eid_sorted.dtype),
                ]
            )
            group_sizes = group_sizes.at[-1].add(pad)
        def _stack_kernels(projs):
            if type(projs[0]) is nn.Linear:
                return jnp.stack([p.kernel for p in projs])
            # QuantLinear (uniform per slot, checked by
            # _experts_are_pristine): stack the int8 grid and dequantize
            # into the activation dtype.  The transient (E, d, h) copy
            # reads int8 where the bf16 tuple stack reads bf16 — strictly
            # less HBM traffic, and gmm/ragged_dot then run as usual.
            wq = jnp.stack([p.w_q for p in projs])
            sc = jnp.stack([p.scale for p in projs]).astype(x.dtype)
            return wq.astype(x.dtype) * sc[:, None, :]

        w_gate = _stack_kernels([e.gate_proj for e in self.experts])
        w_up = _stack_kernels([e.up_proj for e in self.experts])
        w_down = _stack_kernels([e.down_proj for e in self.experts])

        def _bias_rows(projs):
            # per-row bias: stack per-expert biases, gather by sorted id
            if projs[0].bias is None:
                return None
            return jnp.stack([p.bias for p in projs])[eid_sorted]

        b_gate = _bias_rows([e.gate_proj for e in self.experts])
        b_up = _bias_rows([e.up_proj for e in self.experts])
        b_down = _bias_rows([e.down_proj for e in self.experts])
        if use_gmm:
            # megablox grouped-matmul Pallas kernel.  Tiling is the whole
            # game: the default (128,128,128) measured 10 TF/s on v5e
            # where (512, k, n) reaches 41 TF/s = 83% of a dense matmul
            # of the same (narrow-n) shape; tiles are clamped so the
            # lhs/rhs/acc working set stays inside the 16MB scoped vmem
            from jax.experimental.pallas.ops.tpu.megablox.ops import gmm

            def _gdot(a, w):
                m_t, k_t = 512, min(w.shape[1], 2048)
                n_t = min(w.shape[2], 1024)
                # double-buffered lhs/rhs tiles + f32 acc must fit the
                # 16MB scoped vmem; keep the estimate under 12MB
                def est():
                    return (
                        2 * (m_t * k_t + k_t * n_t) * 2 + m_t * n_t * 4
                    )

                while est() > 12 * 1024 * 1024 and max(k_t, n_t) > 512:
                    if k_t >= n_t:
                        k_t //= 2
                    else:
                        n_t //= 2
                return gmm(
                    a, w, group_sizes,
                    preferred_element_type=a.dtype,
                    tiling=(m_t, k_t, n_t),
                )
        else:
            def _gdot(a, w):
                return jax.lax.ragged_dot(a, w, group_sizes)

        g = _gdot(xg, w_gate)
        u = _gdot(xg, w_up)
        if b_gate is not None:
            g = g + b_gate
        if b_up is not None:
            u = u + b_up
        h = self._act_pair(g, u)
        y = _gdot(h, w_down)
        if b_down is not None:
            y = y + b_down
        if pad:
            y = y[:m_rows]
        if not self.scale_expert_input:
            y = y * w_sorted[:, None]
        out = jnp.zeros((n_tok, d), x.dtype).at[tok_sorted].add(y)
        return out.reshape(b, s, d)

    def _grouped_int8(
        self, x: jax.Array, ctx: Optional[nn.Ctx], interpret: bool = False
    ) -> jax.Array:
        """Grouped dispatch over weight-only int8 experts through the
        in-kernel-dequant Pallas grouped matmul (ops/gmm_int8.py).

        Rows are scattered into a per-group-padded layout (every expert's
        group a multiple of the m-tile), so each m-tile lies wholly in
        one expert and the kernel is a block-diagonal matmul driven by a
        scalar-prefetched tile->expert map — HBM streams the int8 grids
        directly (the dequantize-then-gmm alternative round-trips a full
        bf16 copy of every expert through HBM, 2.5x the weight traffic).
        gate/up/down biases add per padded row; pad rows are zero and
        their outputs are discarded by the final gather."""
        from ..ops.gmm_int8 import grouped_matmul_int8, pad_groups_for_tiles

        n_experts = len(self.experts)
        b, s, d = x.shape
        n_tok = b * s
        xg, w_sorted, eid_sorted, tok_sorted, group_sizes = (
            self._sort_by_expert(x, ctx)
        )
        m_rows = xg.shape[0]
        bm = 256 if m_rows >= 256 else 128
        n_tiles = -(-m_rows // bm) + n_experts  # static upper bound
        dst, tile_expert, row_expert = pad_groups_for_tiles(
            group_sizes, m_rows, n_tiles, bm
        )
        m_pad = n_tiles * bm
        xp = jnp.zeros((m_pad, d), xg.dtype).at[dst].set(xg)

        def _stack_q(projs):
            return (
                jnp.stack([p.w_q for p in projs]),
                jnp.stack([p.scale for p in projs]),
            )

        wq_gate, sc_gate = _stack_q([e.gate_proj for e in self.experts])
        wq_up, sc_up = _stack_q([e.up_proj for e in self.experts])
        wq_down, sc_down = _stack_q([e.down_proj for e in self.experts])

        def _bias_rows(projs):
            if projs[0].bias is None:
                return None
            return jnp.stack([p.bias for p in projs])[row_expert]

        g = grouped_matmul_int8(
            xp, wq_gate, sc_gate, tile_expert, bm=bm, interpret=interpret
        )
        u = grouped_matmul_int8(
            xp, wq_up, sc_up, tile_expert, bm=bm, interpret=interpret
        )
        bg = _bias_rows([e.gate_proj for e in self.experts])
        bu = _bias_rows([e.up_proj for e in self.experts])
        if bg is not None:
            g = g + bg
        if bu is not None:
            u = u + bu
        h = self._act_pair(g, u)
        y = grouped_matmul_int8(
            h, wq_down, sc_down, tile_expert, bm=bm, interpret=interpret
        )
        bd = _bias_rows([e.down_proj for e in self.experts])
        if bd is not None:
            y = y + bd
        y = y[dst]  # back to sorted-row space; pad rows drop out here
        if not self.scale_expert_input:
            y = y * w_sorted[:, None]
        out = jnp.zeros((n_tok, d), x.dtype).at[tok_sorted].add(y)
        return out.reshape(b, s, d)

    def _dense_masked(self, x: jax.Array, ctx: Optional[nn.Ctx]) -> jax.Array:
        n_experts = len(self.experts) + self.n_zero_experts
        top_vals, top_idx = self._routing(x, ctx)
        # combine weights per expert: (..., E); zero where not selected
        onehot = jax.nn.one_hot(top_idx, n_experts, dtype=jnp.float32)
        w = jnp.einsum("...ke,...k->...e", onehot, top_vals).astype(x.dtype)
        out = jnp.zeros_like(x)
        for e, expert in enumerate(self.experts):
            w_e = w[..., e : e + 1]
            if self.scale_expert_input:  # llama4: weight INSIDE the expert
                out = out + expert(x * w_e, ctx)
            else:
                x_e = jnp.where(w_e > 0, x, jnp.zeros_like(x))
                out = out + expert(x_e, ctx) * w_e
        if self.n_zero_experts:
            # longcat zero experts: nn.Identity passthroughs — their
            # selected weight multiplies the token itself
            w_zero = jnp.sum(
                w[..., len(self.experts):], axis=-1, keepdims=True
            )
            out = out + x * w_zero
        return out

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        if self.n_zero_experts == 0 and self._experts_are_pristine(
            allow_quant=True
        ):
            quant = type(self.experts[0].gate_proj) is not nn.Linear
            n_rows = x.shape[0] * x.shape[1] * self.top_k
            # the int8 kernel wins where WEIGHT streaming dominates
            # (decode/small-batch: 1.47x vs bf16 gmm, 2.16x vs the
            # dequant path at 16 tokens — BENCH_MOE decode row); at
            # prefill token counts the expert matmuls are compute-bound
            # and its per-group padding costs more than int8 bytes save
            # (0.67-0.95x measured), so large batches keep dequant+gmm
            if quant and _use_int8_gmm() and (
                n_rows <= 512 or _INT8_GMM_INTERPRET
            ):
                out = self._grouped_int8(
                    x, ctx, interpret=_INT8_GMM_INTERPRET
                )
            else:
                out = self._grouped(x, ctx)
        else:
            out = self._dense_masked(x, ctx)
        if self.shared_expert is not None:
            shared = self.shared_expert(x, ctx)
            if self.shared_expert_gate is not None:  # qwen2_moe
                gate = jax.nn.sigmoid(
                    self.shared_expert_gate(x, ctx).astype(jnp.float32)
                ).astype(x.dtype)
                shared = shared * gate
            out = out + shared  # deepseek: ungated always-on
        if self.output_bias is not None:  # jetmoe
            out = out + self.output_bias.astype(out.dtype)
        return out

    @staticmethod
    def create(key: jax.Array, cfg: TransformerConfig) -> "MoEMLP":
        ks = jax.random.split(key, cfg.n_experts + 3)
        moe_hidden = cfg.moe_hidden_dim or cfg.hidden_dim
        expert_cfg = dataclasses.replace(cfg, hidden_dim=moe_hidden)
        shared = None
        shared_gate = None
        if cfg.shared_expert_hidden_dim is not None:
            shared_cfg = dataclasses.replace(
                cfg, hidden_dim=cfg.shared_expert_hidden_dim
            )
            shared = MLP.create(ks[-2], shared_cfg)
            if cfg.shared_expert_gated:
                shared_gate = nn.Linear.create(
                    ks[-1], cfg.dim, 1, False, cfg.dtype
                )
        return MoEMLP(
            gate=nn.Linear.create(
                ks[0],
                cfg.dim,
                cfg.n_experts + cfg.n_zero_experts,
                cfg.router_bias,
                cfg.dtype,
            ),
            experts=tuple(
                MLP.create(ks[1 + e], expert_cfg) for e in range(cfg.n_experts)
            ),
            shared_expert=shared,
            shared_expert_gate=shared_gate,
            gate_correction_bias=(
                jnp.zeros(
                    (cfg.n_experts + cfg.n_zero_experts,), jnp.float32
                )
                if cfg.router_correction_bias
                else None
            ),
            top_k=cfg.n_experts_per_tok,
            norm_topk=cfg.norm_topk_prob,
            score_func=cfg.router_score_func,
            n_group=cfg.router_n_group,
            topk_group=cfg.router_topk_group,
            group_top2_sum=cfg.router_group_top2_sum,
            routed_scaling=cfg.routed_scaling_factor,
            softmax_after_topk=cfg.router_softmax_after_topk,
            norm_min=cfg.router_norm_min,
            sparsemixer=cfg.router_sparsemixer,
            jitter_eps=cfg.router_jitter_eps,
            topk_then_sigmoid=cfg.router_topk_then_sigmoid,
            scale_expert_input=cfg.moe_scale_expert_input,
            n_zero_experts=cfg.n_zero_experts,
            output_bias=(
                jnp.zeros((cfg.dim,), cfg.dtype)
                if cfg.moe_output_bias
                else None
            ),
        )


def _layer_is_sparse(cfg: TransformerConfig, layer_idx: int) -> bool:
    """HF Qwen3Moe layer-selection rule; all layers for mixtral."""
    return (
        cfg.n_experts > 0
        and layer_idx not in cfg.mlp_only_layers
        and (layer_idx + 1) % cfg.decoder_sparse_step == 0
    )


def _make_mamba_mixer(key: jax.Array, cfg: TransformerConfig):
    from . import ssm

    mc = cfg.mamba
    cls = ssm.Mamba2Mixer if mc.version == 2 else ssm.Mamba1Mixer
    return cls.create(key, mc)


def _make_conv_mixer(key: jax.Array, cfg: TransformerConfig):
    from . import ssm

    L, bias = cfg.conv_mixer
    return ssm.ShortConvMixer.create(key, cfg.dim, int(L), bool(bias), cfg.dtype)


def _make_gdn_mixer(key: jax.Array, cfg: TransformerConfig):
    from . import ssm

    nk, nv, hk, hv, ck = cfg.gdn
    return ssm.GatedDeltaNet.create(
        key, cfg.dim, nk, nv, hk, hv, ck, cfg.norm_eps, cfg.dtype
    )


def _make_rglru_mixer(key: jax.Array, cfg: TransformerConfig):
    from . import ssm

    lru_width, conv_width, n_heads = cfg.rglru
    return ssm.RecurrentBlock.create(
        key, cfg.dim, lru_width, conv_width, n_heads, cfg.dtype
    )


def _make_block_norm(cfg: TransformerConfig):
    if cfg.norm_type == "layernorm":
        return nn.LayerNorm.create(
            cfg.dim, cfg.norm_bias, cfg.norm_eps, cfg.dtype,
            plus_one=cfg.norm_plus_one, affine=not cfg.norm_no_affine,
        )
    return nn.RMSNorm.create(
        cfg.dim, cfg.norm_eps, cfg.dtype, plus_one=cfg.norm_plus_one
    )


class BottleneckAdapter(nn.Module):
    """xmod per-language adapter in its single-language degenerate form
    (HF XmodAdapter): dense1 -> act -> dense2, added residually to the
    post-LN block output by Block.__call__.  Both projections are plain
    nn.Linear sites, so they decompose like any other."""

    dense1: nn.Linear
    dense2: nn.Linear
    act: str = nn.static_field(default="gelu_exact")

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        h = self.dense1(x, ctx)
        if self.act == "gelu_tanh":
            h = jax.nn.gelu(h, approximate=True)
        elif self.act == "gelu_exact":
            h = jax.nn.gelu(h, approximate=False)
        elif self.act == "relu":
            h = jax.nn.relu(h)
        else:
            h = jax.nn.silu(h)
        return self.dense2(h, ctx)


class Block(nn.Module):
    # input_layernorm is None for olmo2's post-norm-only blocks.  Norms
    # are RMSNorm or LayerNorm per TransformerConfig.norm_type.
    input_layernorm: Optional[nn.Module]
    self_attn: Attention
    # None for "one_norm" parallel-residual blocks (falcon-7b / cohere):
    # attention and MLP both read the single input_layernorm output
    post_attention_layernorm: Optional[nn.Module]
    mlp: MLP
    # gemma2 sandwich norms: post_attention_layernorm applies AFTER the
    # attention output (HF keeps the same field name with this changed
    # meaning), and the MLP gets its own pre/post pair.  olmo2 reuses
    # post_feedforward_layernorm with pre/input norms absent.
    pre_feedforward_layernorm: Optional[nn.Module] = None
    post_feedforward_layernorm: Optional[nn.Module] = None
    # "two_norm" (neox / falcon-new): x + attn(ln1(x)) + mlp(ln2(x));
    # "one_norm" (falcon-7b / cohere): both branches share ln1(x)
    parallel_residual: str = nn.static_field(default="none")
    # granite: residual adds scaled by this factor
    residual_multiplier: Optional[float] = nn.static_field(default=None)
    # doge: learned per-channel vectors scaling the RESIDUAL term of each
    # add (ones-initialized; HF input_residual / post_attention_residual)
    input_residual: Optional[jax.Array] = None
    post_attention_residual: Optional[jax.Array] = None
    # falcon_h1: a Mamba2 mixer running IN PARALLEL with attention — both
    # read the input norm's output and their outputs sum into the
    # residual (the mup multipliers are folded into the checkpoint
    # weights on load, hf_loader.make_falcon_h1_translator)
    mamba: Optional[nn.Module] = None
    # minimax: NORM-FIRST scaled residuals — the residual stream itself
    # is the NORMED value: h = norm(x)*a1 + attn(norm(x))*b1, then
    # norm2(h)*a2 + mlp(norm2(h))*b2.  (a1, b1, a2, b2) per layer type.
    residual_factors: Optional[tuple] = nn.static_field(default=None)
    # xmod: bottleneck adapter on the post-LN block output
    ffn_adapter: Optional[nn.Module] = None
    # bert-as-decoder: TRUE post-LN — attention reads the RAW stream,
    # norms apply AFTER each residual add
    post_ln: bool = nn.static_field(default=False)

    def __call__(
        self,
        x: jax.Array,
        ctx: Optional[nn.Ctx] = None,
        *,
        positions: Optional[jax.Array] = None,
        attn_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        xin = (
            x
            if self.input_layernorm is None or self.post_ln
            else self.input_layernorm(x)
        )
        attn_out = self.self_attn(
            xin, ctx, positions=positions, attn_mask=attn_mask
        )
        if self.post_ln:  # bert-as-decoder
            h = self.input_layernorm(x + attn_out)
            out = self.post_attention_layernorm(h + self.mlp(h, ctx))
            if self.ffn_adapter is not None:
                # xmod language adapter: the SAME post-FFN LayerNorm runs
                # twice — once inside lang_adapter (adapter_reuse_layer_
                # norm) and once on the layer output (XmodLayer:497-498)
                out = self.post_attention_layernorm(
                    out + self.ffn_adapter(out, ctx)
                )
            return out
        if self.mamba is not None:  # falcon_h1 parallel hybrid
            h = x + attn_out + self.mamba(
                xin, ctx, positions=positions, attn_mask=attn_mask
            )
            return h + self.mlp(self.post_attention_layernorm(h), ctx)
        if self.residual_factors is not None:  # minimax norm-first wiring
            a1, b1, a2, b2 = self.residual_factors
            h = xin * a1 + attn_out * b1
            h2 = self.post_attention_layernorm(h)
            return h2 * a2 + self.mlp(h2, ctx) * b2
        if self.parallel_residual != "none":
            mlp_in = (
                xin
                if self.parallel_residual == "one_norm"
                else self.post_attention_layernorm(x)
            )
            return x + attn_out + self.mlp(mlp_in, ctx)
        if self.input_layernorm is None:  # olmo2 post-norm-only wiring
            h = x + self.post_attention_layernorm(attn_out)
            return h + self.post_feedforward_layernorm(self.mlp(h, ctx))
        if self.pre_feedforward_layernorm is not None:  # gemma2 wiring
            h = x + self.post_attention_layernorm(attn_out)
            ffw = self.mlp(self.pre_feedforward_layernorm(h), ctx)
            return h + self.post_feedforward_layernorm(ffw)
        if self.residual_multiplier is not None:  # granite
            mult = jnp.asarray(self.residual_multiplier, x.dtype)
            h = x + mult * attn_out
            return h + mult * self.mlp(self.post_attention_layernorm(h), ctx)
        if self.input_residual is not None:  # doge residual scaling
            h = self.input_residual * x + attn_out
            return self.post_attention_residual * h + self.mlp(
                self.post_attention_layernorm(h), ctx
            )
        h = x + attn_out
        return h + self.mlp(self.post_attention_layernorm(h), ctx)

    @staticmethod
    def create(key: jax.Array, cfg: TransformerConfig, layer_idx: int = 0) -> "Block":
        k1, k2 = jax.random.split(key)

        def norm():
            return _make_block_norm(cfg)

        return Block(
            input_layernorm=(
                nn.Identity()
                if cfg.first_layer_no_attn_norm and layer_idx == 0
                else None
                if cfg.post_norm_only
                else norm()
            ),
            self_attn=(
                _make_mamba_mixer(k1, cfg)
                if (
                    cfg.mamba is not None
                    and cfg.layer_types
                    and layer_idx < len(cfg.layer_types)
                    and cfg.layer_types[layer_idx] == "mamba"
                )
                else _make_conv_mixer(k1, cfg)
                if (
                    cfg.conv_mixer is not None
                    and cfg.layer_types
                    and layer_idx < len(cfg.layer_types)
                    and cfg.layer_types[layer_idx] == "conv"
                )
                else _make_rglru_mixer(k1, cfg)
                if (
                    cfg.rglru is not None
                    and cfg.layer_types
                    and layer_idx < len(cfg.layer_types)
                    and cfg.layer_types[layer_idx] == "recurrent"
                )
                else _make_gdn_mixer(k1, cfg)
                if (
                    cfg.gdn is not None
                    and cfg.layer_types
                    and layer_idx < len(cfg.layer_types)
                    and cfg.layer_types[layer_idx] == "linear_attention"
                )
                else LightningAttention.create(k1, cfg, layer_idx)
                if (
                    cfg.layer_types
                    and layer_idx < len(cfg.layer_types)
                    and cfg.layer_types[layer_idx] == "linear_attention"
                )
                else MoAttention.create(k1, cfg)
                if cfg.moa
                else MLAttention.create(k1, cfg)
                if cfg.kv_lora_rank is not None
                else DiffAttention.create(k1, cfg, layer_idx)
                if cfg.diff_attention
                else Attention.create(k1, cfg, layer_idx)
            ),
            post_attention_layernorm=(
                None if cfg.parallel_residual == "one_norm" else norm()
            ),
            mlp=(
                MoEMLP.create(k2, cfg)
                if _layer_is_sparse(cfg, layer_idx)
                else MLP.create(k2, cfg)
            ),
            pre_feedforward_layernorm=norm() if cfg.sandwich_norms else None,
            post_feedforward_layernorm=norm()
            if (cfg.sandwich_norms or cfg.post_norm_only)
            else None,
            parallel_residual=cfg.parallel_residual,
            residual_multiplier=cfg.residual_multiplier,
            input_residual=(
                jnp.ones((cfg.dim,), cfg.dtype)
                if cfg.residual_scales
                else None
            ),
            post_attention_residual=(
                jnp.ones((cfg.dim,), cfg.dtype)
                if cfg.residual_scales
                else None
            ),
            mamba=(
                _make_mamba_mixer(jax.random.fold_in(key, 5), cfg)
                if cfg.parallel_ssm
                else None
            ),
            residual_factors=(
                (
                    (mf[2], mf[3], mf[4], mf[5])
                    if (
                        cfg.layer_types
                        and layer_idx < len(cfg.layer_types)
                        and cfg.layer_types[layer_idx] == "linear_attention"
                    )
                    else (mf[0], mf[1], mf[4], mf[5])
                )
                if (mf := cfg.minimax_residual_factors) is not None
                else None
            ),
            ffn_adapter=(
                BottleneckAdapter(
                    dense1=nn.Linear.create(
                        jax.random.fold_in(key, 6), cfg.dim,
                        cfg.ffn_adapter_dim, True, cfg.dtype,
                    ),
                    dense2=nn.Linear.create(
                        jax.random.fold_in(key, 7), cfg.ffn_adapter_dim,
                        cfg.dim, True, cfg.dtype,
                    ),
                    act=cfg.mlp_act,
                )
                if cfg.ffn_adapter_dim
                else None
            ),
            post_ln=cfg.post_ln,
        )


def _sinusoidal_positions(positions: jax.Array, dim: int) -> jax.Array:
    """fairseq/tensor2tensor sinusoidal table (XGLMSinusoidalPositional
    Embedding.get_embedding): exponent scale log(1e4)/(half-1) — NOT the
    rope half-denominator — with sin and cos CONCATENATED (not
    interleaved).  Computed on the fly; callers add the fairseq +2 index
    offset themselves."""
    half = dim // 2
    if dim % 2:
        raise ValueError("sinusoidal positions require an even dim")
    freqs = jnp.exp(
        jnp.arange(half, dtype=jnp.float32)
        * -(jnp.log(jnp.float32(10000.0)) / (half - 1))
    )
    ang = positions.astype(jnp.float32)[..., None] * freqs
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def _t2t_sinusoidal_positions(positions: jax.Array, dim: int) -> jax.Array:
    """tensor2tensor sinusoidal table (CTRL's positional_encoding /
    Marian's _init_weight): angle exponent 2i/dim — rope's inv_freq
    ladder — with sin and cos concatenated halves."""
    half = dim // 2
    if dim % 2:
        raise ValueError("sinusoidal positions require an even dim")
    freqs = jnp.exp(
        jnp.arange(half, dtype=jnp.float32)
        * -(jnp.log(jnp.float32(10000.0)) * 2.0 / dim)
    )
    ang = positions.astype(jnp.float32)[..., None] * freqs
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class LongcatBlock(nn.Module):
    """LongcatFlash dual-sublayer block (HF LongcatFlashDecoderLayer):
    two sequential MLA-attention + dense-MLP sublayers, with a shortcut
    MoE computed from the FIRST sublayer's post-attention norm output
    and added after the SECOND sublayer's MLP."""

    input_layernorm: tuple  # 2 norms
    self_attn: tuple  # 2 MLAttention
    post_attention_layernorm: tuple
    mlps: tuple  # 2 dense MLP
    mlp: "MoEMLP"  # the shortcut expert block

    def __call__(
        self,
        x: jax.Array,
        ctx: Optional[nn.Ctx] = None,
        *,
        positions: Optional[jax.Array] = None,
        attn_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        h = x + self.self_attn[0](
            self.input_layernorm[0](x), ctx,
            positions=positions, attn_mask=attn_mask,
        )
        p0 = self.post_attention_layernorm[0](h)
        shortcut = self.mlp(p0, ctx)
        h = h + self.mlps[0](p0, ctx)
        h = h + self.self_attn[1](
            self.input_layernorm[1](h), ctx,
            positions=positions, attn_mask=attn_mask,
        )
        p1 = self.post_attention_layernorm[1](h)
        return h + self.mlps[1](p1, ctx) + shortcut

    @staticmethod
    def create(
        key: jax.Array, cfg: TransformerConfig, layer_idx: int = 0
    ) -> "LongcatBlock":
        ks = jax.random.split(key, 5)
        return LongcatBlock(
            input_layernorm=(_make_block_norm(cfg), _make_block_norm(cfg)),
            self_attn=(
                MLAttention.create(ks[0], cfg),
                MLAttention.create(ks[1], cfg),
            ),
            post_attention_layernorm=(
                _make_block_norm(cfg),
                _make_block_norm(cfg),
            ),
            mlps=(MLP.create(ks[2], cfg), MLP.create(ks[3], cfg)),
            mlp=MoEMLP.create(ks[4], cfg),
        )


class Decoder(nn.Module):
    embed_tokens: nn.Embedding
    layers: tuple
    norm: nn.Module
    # gpt2 wpe: learned absolute position table added to the embedding
    pos_embed: Optional[nn.Embedding] = None
    # bert: the token-type-0 embedding row (decoder-only inputs are all
    # segment 0, so it degenerates to one constant vector)
    token_type_embed: Optional[jax.Array] = None
    # bloom word_embeddings_layernorm
    embed_norm: Optional[nn.Module] = None
    # electra embeddings_project: embedding_size -> hidden projection
    embed_proj: Optional[nn.Linear] = None
    remat: bool = nn.static_field(default=False)
    # xglm: deterministic fairseq sinusoidal positions (+2 offset)
    sinusoidal_pos: bool = nn.static_field(default=False)
    sinusoidal_offset: int = nn.static_field(default=2)
    sinusoidal_kind: str = nn.static_field(default="fairseq")
    # blenderbot-small: embed_norm BEFORE the position add
    embed_norm_pre_pos: bool = nn.static_field(default=False)
    # roc_bert: embed_proj (the folded fusion map) BEFORE the position/
    # token-type adds; electra's default runs it after the embed norm
    embed_proj_pre_pos: bool = nn.static_field(default=False)
    # gemma: hidden states scaled by sqrt(dim) after embedding (HF
    # GemmaModel.forward normalizer, applied in the activation dtype)
    scale_embeddings: bool = nn.static_field(default=False)
    # recurrent_gemma registers its normalizer buffer as BF16 — the
    # rounded value is what every checkpoint was trained with
    scale_embeddings_bf16: bool = nn.static_field(default=False)
    # granite embedding_multiplier (an arbitrary scalar, unlike gemma's
    # sqrt(dim))
    embedding_multiplier: Optional[float] = nn.static_field(default=None)

    def embed_inputs(
        self,
        input_ids: jax.Array,
        ctx: Optional[nn.Ctx] = None,
        positions: Optional[jax.Array] = None,
    ) -> tuple[jax.Array, jax.Array]:
        """Everything before the layer stack: token embedding, scaling,
        positional adds, embedding norms/projections.  Returns
        ``(hidden, positions)`` — split out so the pipeline-parallel
        forward (parallel/pipeline.py) and the KV-cache decode path
        (serving.py, which passes absolute ``positions`` offset by the
        cache fill) can reuse the exact pre-layer computation without
        duplicating it."""
        x = self.embed_tokens(input_ids)
        if self.scale_embeddings:
            norm = jnp.asarray(x.shape[-1] ** 0.5, jnp.float32)
            if self.scale_embeddings_bf16:  # recurrent_gemma rounding
                norm = norm.astype(jnp.bfloat16)
            x = x * norm.astype(x.dtype)
        if self.embedding_multiplier is not None:
            x = x * jnp.asarray(self.embedding_multiplier, x.dtype)
        b, s = input_ids.shape
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))
        if self.embed_norm is not None and self.embed_norm_pre_pos:
            x = self.embed_norm(x, ctx)
        if self.embed_proj is not None and self.embed_proj_pre_pos:
            x = self.embed_proj(x, ctx)  # roc_bert fused map
        if self.pos_embed is not None:
            x = x + self.pos_embed(positions)
        if self.sinusoidal_pos:
            sin_fn = (
                _t2t_sinusoidal_positions
                if self.sinusoidal_kind == "t2t"
                else _sinusoidal_positions
            )
            x = x + sin_fn(
                positions + self.sinusoidal_offset, x.shape[-1]
            ).astype(x.dtype)
        if self.token_type_embed is not None:  # bert segment 0
            x = x + self.token_type_embed.astype(x.dtype)
        if self.embed_norm is not None and not self.embed_norm_pre_pos:
            x = self.embed_norm(x, ctx)
        if self.embed_proj is not None and not self.embed_proj_pre_pos:
            x = self.embed_proj(x, ctx)
        return x, positions

    def __call__(
        self,
        input_ids: jax.Array,
        ctx: Optional[nn.Ctx] = None,
        *,
        attn_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        x, positions = self.embed_inputs(input_ids, ctx)
        use_remat = self.remat and not (ctx is not None and ctx.no_remat)
        for layer in self.layers:
            if use_remat:
                # layer is a pytree: pass it through the checkpoint boundary
                # so its params are differentiable residuals, not constants.
                # ctx (incl. a traced key) is closed over — fine for RNG use;
                # modules that SOW under remat would leak tracers, which is
                # why capture paths set ctx.no_remat.
                x = jax.checkpoint(
                    lambda lyr, h: lyr(
                        h, ctx, positions=positions, attn_mask=attn_mask
                    )
                )(layer, x)
            else:
                x = layer(x, ctx, positions=positions, attn_mask=attn_mask)
        return self.norm(x)


class PredictionHeadTransform(nn.Module):
    """ModernBERT-style prediction head (HF ModernBertPredictionHead):
    dense -> activation -> norm applied to the final hidden states before
    the output projection / tied matmul."""

    dense: nn.Linear
    norm: nn.Module
    act: str = nn.static_field(default="gelu_exact")

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        h = self.dense(x, ctx)
        if self.act == "gelu_exact":
            h = jax.nn.gelu(h, approximate=False)
        elif self.act == "gelu_tanh":
            h = jax.nn.gelu(h, approximate=True)
        elif self.act == "relu":
            h = jax.nn.relu(h)
        elif self.act != "identity":
            raise ValueError(f"unsupported head activation {self.act!r}")
        return self.norm(h, ctx)


class CausalLM(nn.Module):
    """Callable with a batch dict {"input_ids", optional "attention_mask"}
    returning logits — the dict-in/logits-out convention the reference's
    WrapperModule adapts HF models to
    (/root/reference/examples/trainer_llm/dwain_wrapper_module.py:21-30)."""

    model: Decoder
    lm_head: Optional[nn.Linear]
    # modernbert-decoder: dense+act+norm before the output projection,
    # and an untied bias on the TIED output matmul (HF 'decoder.bias')
    head_transform: Optional[PredictionHeadTransform] = None
    tied_head_bias: Optional[jax.Array] = None
    tie_embeddings: bool = nn.static_field(default=False)
    # gemma2: tanh softcap on the final logits
    final_logit_softcap: Optional[float] = nn.static_field(default=None)
    # cohere logit_scale / granite 1/logits_scaling: multiplies the logits
    logit_scale: Optional[float] = nn.static_field(default=None)

    def head(self, h: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        """Final hidden states -> logits (head transform, tied/untied
        projection, logit scale/softcap).  Split out so the
        pipeline-parallel forward (parallel/pipeline.py) reuses the exact
        head computation."""
        if self.head_transform is not None:
            h = self.head_transform(h, ctx)
        if self.tie_embeddings:
            logits = jnp.dot(h, self.model.embed_tokens.table.T)
            if self.tied_head_bias is not None:
                logits = logits + self.tied_head_bias.astype(logits.dtype)
        else:
            logits = self.lm_head(h, ctx)
        if self.logit_scale is not None:
            logits = logits * jnp.asarray(self.logit_scale, logits.dtype)
        if self.final_logit_softcap is not None:
            cap = jnp.asarray(self.final_logit_softcap, logits.dtype)
            logits = cap * jnp.tanh(logits / cap)
        return logits

    def __call__(self, batch: Any, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        if isinstance(batch, dict):
            input_ids = batch["input_ids"]
            attn_mask = batch.get("attention_mask")
        else:
            input_ids, attn_mask = batch, None
        h = self.model(input_ids, ctx, attn_mask=attn_mask)
        return self.head(h, ctx)

    @staticmethod
    def create(key: jax.Array, cfg: TransformerConfig) -> "CausalLM":
        keys = jax.random.split(key, cfg.n_layers + 3)
        ed = cfg.embed_dim or cfg.dim  # electra: embeddings live smaller
        # with embed_proj_pre_pos (roc_bert) only the token table lives in
        # ed — positions/token-type/embed-norm sit after the projection
        pd = cfg.dim if cfg.embed_proj_pre_pos else ed
        decoder = Decoder(
            embed_tokens=nn.Embedding.create(
                keys[0], cfg.embed_vocab_size or cfg.vocab_size, ed,
                cfg.dtype,
            ),
            layers=tuple(
                SkipBlock()
                if cfg.layer_types and cfg.layer_types[i] == "skip"
                else (LongcatBlock if cfg.longcat_dual else Block).create(
                    keys[1 + i], cfg, layer_idx=i
                )
                for i in range(cfg.n_layers)
            ),
            norm=_make_block_norm(cfg) if cfg.final_norm else nn.Identity(),
            pos_embed=(
                nn.Embedding.create(
                    keys[-2], cfg.learned_pos, pd, cfg.dtype
                )
                if cfg.learned_pos is not None
                else None
            ),
            token_type_embed=(
                jnp.zeros((pd,), cfg.dtype)
                if cfg.token_type_zero
                else None
            ),
            embed_norm=(
                nn.LayerNorm.create(
                    pd, cfg.norm_bias, cfg.norm_eps, cfg.dtype
                )
                if cfg.embed_norm
                else None
            ),
            embed_proj=(
                nn.Linear.create(
                    jax.random.fold_in(keys[0], 3), ed, cfg.dim, True,
                    cfg.dtype,
                )
                if ed != cfg.dim or cfg.embed_proj_pre_pos
                else None
            ),
            remat=cfg.remat,
            embed_proj_pre_pos=cfg.embed_proj_pre_pos,
            sinusoidal_pos=cfg.sinusoidal_pos,
            sinusoidal_offset=cfg.sinusoidal_offset,
            sinusoidal_kind=cfg.sinusoidal_kind,
            embed_norm_pre_pos=cfg.embed_norm_pre_pos,
            scale_embeddings=cfg.scale_embeddings,
            scale_embeddings_bf16=cfg.scale_embeddings_bf16,
            embedding_multiplier=cfg.embedding_multiplier,
        )
        # width of the prediction-head transform output: rembert decouples
        # it from both dim and the input embedding width (head_out_dim);
        # electra's tied head projects back to the embedding width
        hw = cfg.head_out_dim or ed
        lm_head = (
            None
            if cfg.tie_embeddings
            else nn.Linear.create(
                keys[-1],
                hw if cfg.head_transform else cfg.dim,
                cfg.vocab_size,
                cfg.lm_head_bias,
                cfg.dtype,
            )
        )
        return CausalLM(
            model=decoder,
            lm_head=lm_head,
            head_transform=(
                PredictionHeadTransform(
                    dense=nn.Linear.create(
                        jax.random.fold_in(keys[-1], 1),
                        cfg.dim,
                        hw,
                        cfg.head_transform_bias,
                        cfg.dtype,
                    ),
                    norm=(
                        nn.LayerNorm.create(
                            hw, cfg.norm_bias, cfg.norm_eps, cfg.dtype
                        )
                        if cfg.norm_type == "layernorm"
                        else nn.RMSNorm.create(hw, cfg.norm_eps, cfg.dtype)
                    ),
                    act=cfg.head_transform_act,
                )
                if cfg.head_transform
                else None
            ),
            tied_head_bias=(
                jnp.zeros((cfg.vocab_size,), cfg.dtype)
                if cfg.tie_embeddings and cfg.lm_head_bias
                else None
            ),
            tie_embeddings=cfg.tie_embeddings,
            final_logit_softcap=cfg.final_logit_softcap,
            logit_scale=cfg.logit_scale,
        )


def ce_loss(batch: dict[str, jax.Array], logits: jax.Array) -> jax.Array:
    """Shifted causal cross-entropy, mean over NON-PADDING positions.

    Deliberate divergence from the reference's ce_loss
    (trainer_llm/dwain_wrapper_module.py:33-46), which zeroes the *logits*
    at padded positions but still averages the cross-entropy over every
    position (including pads, each contributing log-vocab noise) and shifts
    the mask off by one.  This masked mean is the standard perplexity
    definition; with the fully-packed calibration loaders (all-ones masks)
    the two agree exactly."""
    labels = batch["input_ids"][:, 1:]
    mask = batch.get("attention_mask")
    logits = logits[:, :-1].astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if mask is not None:
        m = mask[:, 1:].astype(jnp.float32)
        return -jnp.sum(ll * m) / jnp.maximum(jnp.sum(m), 1.0)
    return -jnp.mean(ll)


@dataclasses.dataclass(frozen=True)
class MusicgenConfig:
    """HF MusicgenDecoderConfig subset (musicgen / musicgen_melody used
    as ``*ForCausalLM`` audio decoders): K codebook embedding tables
    summed on entry, a pre-LN bias-free-projection decoder with biased
    LayerNorms, computed cos|sin sinusoidal positions, and K untied
    bias-free lm_heads stacked on the codebook axis."""

    vocab_size: int = 60
    dim: int = 32
    n_layers: int = 2
    n_heads: int = 4
    hidden_dim: int = 64
    num_codebooks: int = 2
    mlp_act: str = "gelu_exact"
    norm_eps: float = 1e-5
    scale_embeddings: bool = False
    remat: bool = False
    dtype: Any = jnp.float32

    @staticmethod
    def from_hf_config(
        hf: dict[str, Any], dtype: Any = jnp.bfloat16, remat: bool = False
    ) -> "MusicgenConfig":
        mt = hf.get("model_type", "")
        if mt in ("musicgen", "musicgen_melody"):
            hf = dict(hf["decoder"])
            mt = hf.get("model_type", mt + "_decoder")
        if mt not in ("musicgen_decoder", "musicgen_melody_decoder"):
            raise ValueError(f"not a musicgen decoder config: {mt!r}")
        return MusicgenConfig(
            vocab_size=int(hf["vocab_size"]),
            dim=int(hf["hidden_size"]),
            n_layers=int(hf["num_hidden_layers"]),
            n_heads=int(hf["num_attention_heads"]),
            hidden_dim=int(hf["ffn_dim"]),
            num_codebooks=int(hf.get("num_codebooks", 4)),
            mlp_act=_hf_act(hf.get("activation_function", "gelu")),
            scale_embeddings=bool(hf.get("scale_embedding", False)),
            remat=remat,
            dtype=dtype,
        )


def _musicgen_sinusoid(positions: jax.Array, dim: int) -> jax.Array:
    """Musicgen's sinusoid: fairseq denominator (half-1) with COS in the
    first half and SIN in the second (MusicgenSinusoidalPositional
    Embedding.get_embedding cats cos before sin)."""
    half = dim // 2
    freqs = jnp.exp(
        jnp.arange(half, dtype=jnp.float32)
        * -(jnp.log(jnp.float32(10000.0)) / (half - 1))
    )
    ang = positions.astype(jnp.float32)[..., None] * freqs
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


class MusicgenLM(nn.Module):
    """Dict-in/logits-out musicgen audio decoder.  Input ``input_ids`` is
    HF's (batch*num_codebooks, seq) layout; logits come back
    (batch*num_codebooks, seq, vocab) on the same axis order, matching
    MusicgenForCausalLM's stacked lm_heads."""

    embed_tokens: tuple  # K embeddings (vocab+1 rows: the audio pad)
    layers: tuple
    layer_norm: nn.LayerNorm
    lm_heads: tuple  # K bias-free Linears
    num_codebooks: int = nn.static_field(default=2)
    scale_embeddings: bool = nn.static_field(default=False)
    remat: bool = nn.static_field(default=False)

    def __call__(self, batch: Any, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        ids = batch["input_ids"] if isinstance(batch, dict) else batch
        bk, s = ids.shape
        k = self.num_codebooks
        ids = ids.reshape(bk // k, k, s)
        x = sum(
            emb(ids[:, i]) for i, emb in enumerate(self.embed_tokens)
        )
        if self.scale_embeddings:
            x = x * jnp.asarray(x.shape[-1] ** 0.5, x.dtype)
        positions = jnp.broadcast_to(
            jnp.arange(s)[None, :], (bk // k, s)
        )
        x = x + _musicgen_sinusoid(positions, x.shape[-1]).astype(x.dtype)
        use_remat = self.remat and not (ctx is not None and ctx.no_remat)
        for layer in self.layers:
            if use_remat:
                x = jax.checkpoint(
                    lambda lyr, h: lyr(h, ctx, positions=positions)
                )(layer, x)
            else:
                x = layer(x, ctx, positions=positions)
        x = self.layer_norm(x)
        logits = jnp.stack(
            [head(x, ctx) for head in self.lm_heads], axis=1
        )  # (b, k, s, v)
        return logits.reshape(bk, s, -1)

    @staticmethod
    def create(key: jax.Array, cfg: MusicgenConfig) -> "MusicgenLM":
        body = TransformerConfig(
            vocab_size=cfg.vocab_size,
            dim=cfg.dim,
            n_layers=cfg.n_layers,
            n_heads=cfg.n_heads,
            n_kv_heads=cfg.n_heads,
            hidden_dim=cfg.hidden_dim,
            norm_eps=cfg.norm_eps,
            norm_type="layernorm",
            mlp_gated=False,
            mlp_bias=False,
            mlp_act=cfg.mlp_act,
            qkv_bias=False,
            o_proj_bias=False,
            use_rope=False,
            dtype=cfg.dtype,
        )
        keys = jax.random.split(key, cfg.n_layers + 2 * cfg.num_codebooks)
        return MusicgenLM(
            embed_tokens=tuple(
                nn.Embedding.create(
                    keys[i], cfg.vocab_size + 1, cfg.dim, cfg.dtype
                )
                for i in range(cfg.num_codebooks)
            ),
            layers=tuple(
                Block.create(keys[cfg.num_codebooks + i], body, layer_idx=i)
                for i in range(cfg.n_layers)
            ),
            layer_norm=nn.LayerNorm.create(
                cfg.dim, True, cfg.norm_eps, cfg.dtype
            ),
            lm_heads=tuple(
                nn.Linear.create(
                    keys[-1 - i], cfg.dim, cfg.vocab_size, False, cfg.dtype
                )
                for i in range(cfg.num_codebooks)
            ),
            num_codebooks=cfg.num_codebooks,
            scale_embeddings=cfg.scale_embeddings,
            remat=cfg.remat,
        )


class SkipBlock(nn.Module):
    """Identity stand-in for a whole decoder layer the causal-LM forward
    never runs: mllama's cross-attention layers are SKIPPED outright in
    text-only mode (HF MllamaTextModel.forward `continue`s them when no
    vision states exist).  Keeping a placeholder preserves the HF layer
    numbering, so decompose_config module names line up."""

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None, **_: Any):
        return x


class PrunedSublayer(nn.Module):
    """Zero-output stand-in for a block-pruned attention/MLP sublayer: with
    the residual connection the block degenerates to an identity skip.
    Native analogue of the reference's block-pruned custom builders
    (/root/reference/examples/trainer_llm/examples_builder/
    bp_indices_builder.py, which delegates to an external, non-vendored
    llm_pipelines package).  Dtype/shape-transparent and parameter-free, so
    pruned models remain jittable, decomposable, and state-dict loadable."""

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None, **_: Any):
        return jnp.zeros_like(x)


def prune_blocks(
    model: CausalLM,
    attn_indices: list[int],
    mlp_indices: list[int],
) -> CausalLM:
    """Remove the attention sublayer of blocks in ``attn_indices`` and the
    MLP sublayer of blocks in ``mlp_indices`` (block pruning).  Returns a
    new model; decomposition then runs on the surviving sublayers only."""
    n = len(model.model.layers)
    for idx in list(attn_indices) + list(mlp_indices):
        if not 0 <= idx < n:
            raise ValueError(f"block index {idx} out of range [0, {n})")
    for idx in attn_indices:
        model = nn.replace_submodule(
            model, f"model.layers.{idx}.self_attn", PrunedSublayer()
        )
    for idx in mlp_indices:
        model = nn.replace_submodule(
            model, f"model.layers.{idx}.mlp", PrunedSublayer()
        )
    return model
