"""Vision dwain driver (accuracy-flavored, with finetune reverting).

Reference: /root/reference/examples/trainer_vision/run_decompose_dwain.py —
same shape as the LLM variant but measuring top-1 accuracy and using the
loss-reverting full fine-tune (:35-65).
"""

from __future__ import annotations

import json
import logging
import pathlib
import time
from typing import Any

import jax

from ptdeco_tpu import dwain, utils

from . import (
    builder,
    configurator,
    datasets_image,
    dwain_wrapper_module,
    metrics,
)

logger = logging.getLogger(__name__)


def main(
    config_raw: dict[str, Any],
    output_path: pathlib.Path,
    train_pipeline=None,
    val_pipeline=None,
) -> None:
    config = configurator.DecomposeDWAINConfig(**config_raw)
    output_path.mkdir(exist_ok=True, parents=True)

    raw_model = builder.make_model(
        config.decompose_model_name,
        checkpoint_path=config.decompose_model_checkpoint_path,
        input_h_w=tuple(config.input_h_w),
    )
    if train_pipeline is None or val_pipeline is None:
        train_pipeline, val_pipeline = datasets_image.make_imagenet_pipelines(
            imagenet_root_dir=config.imagenet_root_dir,
            trn_imagenet_classes_fname=config.trn_imagenet_classes_fname,
            val_imagenet_classes_fname=config.val_imagenet_classes_fname,
            batch_size=config.batch_size,
            normalization=config.normalization,
            input_h_w=config.input_h_w,
            num_classes=builder.infer_num_classes(
                raw_model, tuple(config.input_h_w)
            ),
            use_rotation=config.use_rotation,
        )
    stats_initial = builder.get_model_stats(raw_model, (1, *config.input_h_w, 3))
    stats_initial.update(
        builder.get_decomposeable_model_stats(raw_model, (1, *config.input_h_w, 3))
    )
    model = dwain_wrapper_module.WrapperModule(raw_model=raw_model)
    blacklist = dwain_wrapper_module.add_prefix(config.blacklisted_modules)
    builder.validate_module_names(model, blacklist)

    accuracy_initial = metrics.calc_accuracy(raw_model, val_pipeline)

    def batch_iter():
        for batch in datasets_image.infinite(train_pipeline):
            yield {
                "inputs": batch["inputs"],
                "targets": batch["targets"],
            }

    data_iter = batch_iter()
    ft_iter = batch_iter()

    finetune_fn = None
    if config.finetuning_run:
        def finetune_fn(module, decomposed_names):
            return dwain_wrapper_module.finetune_full(
                model=module,
                ft_iterator=ft_iter,
                decomposed_modules=decomposed_names,
                num_last_modules_to_finetune=(
                    config.finetuning_num_last_finetuned_modules
                ),
                num_steps=config.finetuning_num_steps,
                num_log_steps=config.finetuning_num_log_steps,
                lr=config.finetuning_lr,
                optimizer=config.finetuning_optimizer,
                use_reverting=config.finetuning_reverting,
                batch_norms_in_eval=config.finetuning_batch_norms_in_eval,
            )

    t0 = time.perf_counter()
    model, decompose_config = dwain.decompose(
        module=model,
        data_iterator=data_iter,
        loss_fn=dwain_wrapper_module.ce_loss,
        num_data_steps=config.num_data_steps,
        metric_iterator=data_iter,
        num_metric_steps=config.num_metric_steps,
        nsr_final_threshold=config.nsr_final_threshold,
        finetune_fn=finetune_fn,
        blacklisted_module_names=blacklist,
        min_rank=config.min_rank,
        trade_off_factor=config.trade_off_factor,
        reduction_factor=config.reduction_factor,
        max_accepted_ppl_diff=config.max_accepted_ppl_diff,
        decompose_in_float64=config.decompose_in_float64,
        precomputing_covariance_num_splits=(
            config.precomputing_covariance_num_splits
        ),
        use_pallas_gram=config.use_pallas_gram,
        eigh_method=config.eigh_method,
        checkpoint_dir=utils.resolve_subdir(
            output_path, config.decomposition_checkpoint_dir
        ),
    )
    t_deco = time.perf_counter() - t0

    raw_final = model.raw_model
    accuracy_final = metrics.calc_accuracy(raw_final, val_pipeline)
    stats_final = builder.get_model_stats(raw_final, (1, *config.input_h_w, 3))
    stats_final.update(
        builder.get_decomposeable_model_stats(raw_final, (1, *config.input_h_w, 3))
    )

    with open(output_path / "decompose_config.json", "w") as f:
        json.dump(dwain_wrapper_module.strip_prefix_dict(decompose_config), f)
    sd = dwain_wrapper_module.strip_prefix_dict(utils.state_dict(model))
    utils.save_state_dict_pt(sd, str(output_path / "decompose_state_dict.pt"))

    device = jax.devices()[0]
    summary = {
        "accuracy_initial": accuracy_initial,
        "accuracy_final": accuracy_final,
        "n_decomposed": len(decompose_config),
        "mparams_initial": stats_initial["mparams"],
        "mparams_final": stats_final["mparams"],
        "mparams_frac": stats_final["mparams"] / stats_initial["mparams"] * 100.0,
        "gflops_initial": stats_initial["gflops"],
        "gflops_final": stats_final["gflops"],
        "gflops_frac": stats_final["gflops"] / stats_initial["gflops"] * 100.0,
        "gflops_decomposeable_initial": stats_initial["gflops_decomposeable"],
        "gflops_decomposeable_final": stats_final["gflops_decomposeable"],
        "mparams_decomposeable_initial": stats_initial["mparams_decomposeable"],
        "mparams_decomposeable_final": stats_final["mparams_decomposeable"],
        "time_decomposition": t_deco,
        "device": f"{device.platform}:{device.device_kind}",
    }
    with open(output_path / "summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    logger.info(f"Summary: {json.dumps(summary, indent=2)}")
