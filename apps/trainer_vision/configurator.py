"""Pydantic config schemas + factory getters for the vision trainer.

Mirrors /root/reference/examples/trainer_vision/configurator.py with
composer-specific factories replaced by optax equivalents (schedule,
optimizer, gradient clipping); "duration" strings accept "Nep"/"Nba"
(epochs/batches) like composer's.
"""

from __future__ import annotations

import logging
import re
from typing import Literal, Optional

import optax
import pydantic

logger = logging.getLogger(__name__)


class _VersionConfig(pydantic.BaseModel):
    ptdeco_trainer_version: Optional[str] = None
    ptdeco_tpu_version: Optional[str] = None


class _DataConfig(pydantic.BaseModel):
    imagenet_root_dir: str
    trn_imagenet_classes_fname: str
    val_imagenet_classes_fname: str
    batch_size: int
    normalization: Literal[
        "zero_to_one", "negative_one_to_one", "imagenet", "identity"
    ]
    input_h_w: tuple[int, int]
    # optional train-time rotation aug (reference datasets_dali.py:260-272;
    # an unexposed attribute there, a config knob here)
    use_rotation: bool = False


class _TrainConfig(pydantic.BaseModel):
    finetune_only_decomposed: bool = True
    lr: float
    lr_t_warmup: str
    lr_scheduler: Literal["cosine", "fixed"]
    max_duration: str
    optimizer: Literal["SGD", "Adam", "AdamW"]
    precision: Optional[Literal["fp32", "bf16"]] = None
    alg_gradient_clipping_type: Optional[Literal["norm", "value"]] = None
    alg_gradient_clipping_threshold: Optional[float] = None
    mesh_dp: Optional[int] = None
    # mirror the per-layer scalars into tensorboard event files (reference
    # TensorboardCallBack / KD writer); metrics.jsonl is always written
    tensorboard: bool = False
    # autoresume (composer analogue: autoresume=True + save_folder,
    # reference run_decompose_lockd.py:215-219); 0 disables
    save_interval_steps: int = 0


class DecomposeLOCKDConfig(_VersionConfig, _DataConfig, _TrainConfig):
    task: Literal["decompose_lockd"]
    decompose_model_name: str
    decompose_model_checkpoint_path: Optional[str] = None
    proportion_threshold: float
    blacklisted_modules: list[str]
    lmbda: float
    nsr_threshold: float
    # gate-training updates fused per device dispatch (lax.scan chunk).
    # 1 = classic per-step loop.  The per-dispatch host round-trip is the
    # dominant cost of gate training on a high-latency transport: the
    # identical update measures 8-19% MFU dispatched per step vs 26-44%
    # inside a scan (BENCH_LOCKD_PROFILE.json); 8 amortizes it away while
    # keeping metrics/checkpoint cadence in whole chunks.
    steps_per_dispatch: int = 8

    model_config = pydantic.ConfigDict(extra="forbid")


class DecomposeFALORConfig(_VersionConfig, _DataConfig):
    task: Literal["decompose_falor"]
    decompose_model_name: str
    decompose_model_checkpoint_path: Optional[str] = None
    proportion_threshold: float
    blacklisted_modules: list[str]
    kl_final_threshold: float
    nsr_final_threshold: float
    num_data_steps: int
    num_metric_steps: int
    use_float64: bool
    decomposition_checkpoint_dir: Optional[str] = "decompose_ckpt"
    model_config = pydantic.ConfigDict(extra="forbid")


class DecomposeDWAINConfig(_VersionConfig, _DataConfig):
    task: Literal["decompose_dwain"]
    decompose_model_name: str
    decompose_model_checkpoint_path: Optional[str] = None

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
    eigh_method: str = "auto"
    decomposition_checkpoint_dir: Optional[str] = "decompose_ckpt"
    precomputing_covariance_num_splits: Optional[int] = None
    blacklisted_modules: list[str]

    finetuning_run: bool
    finetuning_lr: float
    finetuning_optimizer: Literal["SGD", "Adam", "AdamW"]
    finetuning_reverting: bool
    finetuning_batch_norms_in_eval: bool
    finetuning_num_steps: int
    finetuning_num_log_steps: int
    finetuning_num_last_finetuned_modules: int

    model_config = pydantic.ConfigDict(extra="forbid")


class FinetuneConfig(_VersionConfig, _DataConfig, _TrainConfig):
    task: Literal["finetune"]
    decompose_model_name: str
    decompose_model_checkpoint_path: Optional[str] = None
    decompose_config: str
    decompose_state_dict: str
    proportion_threshold: float = 1.0
    blacklisted_modules: list[str]
    # reference KdClassificationModel(eval_mode=False): the student trains
    # in TRAIN mode — BatchNorms normalize with batch statistics and update
    # running stats during KD (run_finetune.py:54,69-71,341); True freezes
    # them on running stats
    finetune_eval_mode: bool = False
    # KD updates fused per device dispatch (same knob/rationale as the
    # lockd driver's; BENCH_LOCKD_PROFILE.json)
    steps_per_dispatch: int = 8

    model_config = pydantic.ConfigDict(extra="forbid")


# -- factories (composer equivalents; reference configurator.py:103-178) ----


def parse_duration(duration: str, steps_per_epoch: int) -> int:
    """'10ep' / '500ba' -> number of steps."""
    m = re.fullmatch(r"(\d+)(ep|ba)", duration)
    if not m:
        raise ValueError(f"Bad duration {duration!r}")
    n, unit = int(m.group(1)), m.group(2)
    return n * steps_per_epoch if unit == "ep" else n


def get_lr_schedule(config: _TrainConfig, num_steps: int, steps_per_epoch: int):
    warmup = parse_duration(config.lr_t_warmup, steps_per_epoch)
    if config.lr_scheduler == "cosine":
        logger.info(f"Using cosine lr schedule, warmup={warmup}")
        return optax.warmup_cosine_decay_schedule(
            0.0, config.lr, warmup, max(num_steps, warmup + 1)
        )
    logger.info(f"Using fixed lr schedule, warmup={warmup}")
    return optax.join_schedules(
        [optax.linear_schedule(0.0, config.lr, warmup), lambda _: config.lr],
        [warmup],
    )


def bf16_compute(tree, precision):
    """AMP-style compute cast for ``precision: bf16`` (composer amp_bf16
    analogue, reference configurator.py:103-109): master params stay f32 in
    the optimizer; the forward sees bf16 copies.  Identity for fp32/None."""
    if precision != "bf16":
        return tree
    import jax
    import jax.numpy as jnp

    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32
        else x,
        tree,
    )


def get_optimizer(config: _TrainConfig, schedule) -> optax.GradientTransformation:
    logger.info(f"Using optimizer {config.optimizer}")
    if config.optimizer == "Adam":
        tx = optax.adam(schedule)
    elif config.optimizer == "AdamW":
        # torch AdamW default weight decay (the reference's composer
        # optimizers wrap torch; optax defaults to 1e-4)
        tx = optax.adamw(schedule, weight_decay=0.01)
    elif config.optimizer == "SGD":
        tx = optax.sgd(schedule)
    else:
        raise ValueError(f"Unknown optimizer {config.optimizer}")
    if config.alg_gradient_clipping_type == "norm":
        assert config.alg_gradient_clipping_threshold is not None
        tx = optax.chain(
            optax.clip_by_global_norm(config.alg_gradient_clipping_threshold), tx
        )
    elif config.alg_gradient_clipping_type == "value":
        assert config.alg_gradient_clipping_threshold is not None
        tx = optax.chain(
            optax.clip(config.alg_gradient_clipping_threshold), tx
        )
    return tx
