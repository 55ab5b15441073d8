"""Pydantic config schemas for the LLM trainer.

Mirrors /root/reference/examples/trainer_llm/configurator.py (extra="forbid",
Literal task tags, same field names) with torch dtype strings replaced by
jax ones.
"""

from typing import Any, Literal, Optional

import pydantic
from typing_extensions import Annotated

DTYPES_PATTERN = r"^float32$|^bfloat16$|^float16$"


class _VersionConfig(pydantic.BaseModel):
    ptdeco_trainer_llm_version: Optional[str] = None
    ptdeco_tpu_version: Optional[str] = None


class DecomposeDWAINConfig(_VersionConfig):
    task: Literal["decompose_dwain"]

    # Model specification
    decomposed_model_name: str
    # local HF snapshot dir (safetensors) to import weights from; None =
    # random init (this sandbox has no network/caches)
    decomposed_model_checkpoint_path: Optional[str] = None
    decomposed_model_revision: str = "main"
    decomposed_model_custom_builder_path: Optional[str] = None
    decomposed_model_custom_builder_config: Optional[dict[str, Any]] = None
    decomposed_model_dtype: Annotated[
        str, pydantic.StringConstraints(pattern=DTYPES_PATTERN)
    ]
    # per-block jax.checkpoint (HF gradient-checkpointing analogue,
    # reference trainer_llm/builder.py:109-110)
    decomposed_model_enable_gradient_checkpointing: bool = False

    # Tokenizer and data handling params
    decomposition_data_name: str | list[str]
    decomposition_data_separator: str
    decomposition_data_max_length: int
    decomposition_data_batch_size: int

    perplexity_data_name: str
    perplexity_data_separator: str
    perplexity_data_max_length: int
    perplexity_data_batch_size: int

    # Decomposition params
    num_data_steps: int
    num_metric_steps: int
    trade_off_factor: float
    reduction_factor: float
    max_accepted_ppl_diff: float
    nsr_final_threshold: float
    min_rank: int
    decompose_in_float64: bool
    # None = auto (SYRK kernel on TPU for bf16 activations)
    use_pallas_gram: Optional[bool] = None
    # exact = reference host-LAPACK numerics; auto switches wide sites to
    # the device-side randomized EVD; distributed = shard_map CholeskyQR
    # subspace iteration (no single-device stage larger than the sketch)
    eigh_method: str = "auto"
    # per-layer resume state for the decomposition itself (TPU-new; the
    # reference's decomposition is not resumable, SURVEY.md §5).  Relative
    # paths resolve under the run's output directory.
    decomposition_checkpoint_dir: Optional[str] = "decompose_ckpt"
    precomputing_covariance_num_splits: Optional[int] = None
    blacklisted_modules: list[str]

    # Finetuning params
    finetuning_run: bool
    finetuning_use_lora: bool
    finetuning_lora_min_rank: int = 32
    finetuning_lr: float = 0.0001
    finetuning_num_steps: int = 100
    finetuning_num_last_finetuned_modules: int = 8
    finetuning_use_rank_pattern: bool = False

    # lm_eval evaluation params
    lm_eval_initial: bool = False
    lm_eval_tasks: Optional[list[str]] = None

    # Mesh (TPU-only extension; absent in the reference, SURVEY.md §2.7)
    mesh_dp: Optional[int] = None
    mesh_tp: int = 1
    # sequence-parallel axis for calibration sharding (exact for Gram
    # accumulation: rows are a sum over flattened B*S)
    mesh_sp: int = 1

    model_config = pydantic.ConfigDict(extra="forbid")


class GenerateConfig(_VersionConfig):
    """Serve a (decomposed) causal LM: batched KV-cache generation from a
    prompts file.  No reference analogue — the reference's deployment
    story ends at lm_eval loglikelihood scoring
    (/root/reference/examples/trainer_llm/metrics.py:81-107)."""

    task: Literal["generate"]

    decomposed_model_name: str
    decomposed_model_checkpoint_path: Optional[str] = None
    decomposed_model_revision: str = "main"
    decomposed_model_custom_builder_path: Optional[str] = None
    decomposed_model_custom_builder_config: Optional[dict[str, Any]] = None
    decomposed_model_dtype: Annotated[
        str, pydantic.StringConstraints(pattern=DTYPES_PATTERN)
    ]
    # None = serve the ORIGINAL model (useful as a baseline)
    decompose_config: Optional[str] = None
    decompose_state_dict: Optional[str] = None

    # one of: a .jsonl file ({"text": ...} rows), a plain-text file (one
    # prompt per line), or inline prompts
    prompts_file: Optional[str] = None
    prompts: Optional[list[str]] = None

    max_new_tokens: int = 128
    temperature: float = 0.0
    top_p: Optional[float] = None  # nucleus sampling (with temperature>0)
    top_k: Optional[int] = None  # top-k sampling (with temperature>0)
    min_p: Optional[float] = None  # drop tokens below min_p * max prob
    repetition_penalty: Optional[float] = None  # HF processor semantics
    num_beams: int = 1  # >1: deterministic beam search (temperature 0)
    length_penalty: float = 1.0  # beam ranking: score / len**penalty
    quantize_int8: bool = False  # weight-only int8 serving form
    # speculative decoding: serve the ORIGINAL model with the decomposed
    # artifact (decompose_config/state_dict) as the DRAFT — output is
    # exactly the original's greedy continuation; compression becomes a
    # lossless accelerator.  Requires temperature 0, num_beams 1.
    speculative: bool = False
    speculative_k: int = 4  # draft tokens per round
    # measure draft/target step costs on the live device first and fall
    # back to plain decode when drafting cannot pay (latency-bound
    # regimes) — serving.estimate_speculative_speedup
    speculative_auto_gate: bool = True
    batch_size: int = 8
    max_prompt_length: Optional[int] = None
    stop_at_eos: bool = True
    seed: int = 0

    model_config = pydantic.ConfigDict(extra="forbid")


class FinetuneConfig(_VersionConfig):
    task: Literal["finetune"]

    decomposed_model_name: str
    decomposed_model_checkpoint_path: Optional[str] = None
    decomposed_model_revision: str = "main"
    decomposed_model_custom_builder_path: Optional[str] = None
    decomposed_model_custom_builder_config: Optional[dict[str, Any]] = None
    decomposed_model_dtype: Annotated[
        str, pydantic.StringConstraints(pattern=DTYPES_PATTERN)
    ]
    decomposed_model_enable_gradient_checkpointing: bool = False
    decompose_config: str
    decompose_state_dict: str

    perplexity_data_name: str
    perplexity_data_separator: str
    perplexity_data_max_length: int
    perplexity_data_batch_size: int

    train_data_name: str
    train_data_separator: str
    train_data_max_length: int
    train_data_batch_size: int
    train_data_n_samples: int

    test_data_name: str
    test_data_separator: str
    test_data_max_length: int
    test_data_batch_size: int
    test_data_n_samples: int

    num_train_epochs: int
    finetune_only_decomposed: bool = True
    eval_steps: int = 100
    logging_steps: int = 10
    early_stopping_patience: int = 3
    learning_rate: float = 1e-4
    weight_decay: float = 0.0
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_epsilon: float = 1e-8
    lr_scheduler_type: Literal["linear_with_warmup", "cosine_with_warmup"] = (
        "linear_with_warmup"
    )
    num_warmup_steps: int = 10
    gradient_accumulation_steps: int = 1
    lora_r: int = 16
    lora_alpha: int = 8
    lora_dropout: float = 0.05

    lm_eval_initial: bool = False
    lm_eval_tasks: Optional[list[str]] = None

    mesh_dp: Optional[int] = None
    mesh_tp: int = 1
    # expert parallelism: stack eligible MoE layers
    # (models.stack_moe_experts) and shard the expert axis over an ep
    # mesh axis — each device stores E/ep experts.  Layers whose experts
    # are decomposed/LoRA'd stay in tuple form (logged) and ep does not
    # apply to them.
    mesh_ep: int = 1
    # pipeline parallelism: run train/eval forwards as a GPipe fill-drain
    # pipeline over a pp mesh axis (parallel.pipeline_logits) — each
    # device stores and runs L/pp decoder layers.  Requires a HOMOGENEOUS
    # layer stack (same decomposed/LoRA structure in every layer; hybrid
    # attention/mamba stacks are refused with a ValueError).  Gradients
    # are exact (pinned in tests/test_pipeline.py); only the forward's
    # schedule changes.
    mesh_pp: int = 1
    # microbatches per pipeline step; None = mesh_pp.  More microbatches
    # shrink the (S-1)/(M+S-1) fill-drain bubble at the cost of smaller
    # per-tick matmuls; train/test batch sizes must divide by it (x dp).
    pp_microbatches: Optional[int] = None

    model_config = pydantic.ConfigDict(extra="forbid")
