"""FALOR driver: eval -> one-shot decompose -> eval -> save.

Reference: /root/reference/examples/trainer_vision/run_decompose_falor.py:27-146.
"""

from __future__ import annotations

import json
import logging
import pathlib
import time
from typing import Any

import jax
import jax.numpy as jnp

from ptdeco_tpu import falor, utils

from . import builder, configurator, datasets_image, metrics

logger = logging.getLogger(__name__)


def main(
    config_raw: dict[str, Any],
    output_path: pathlib.Path,
    train_pipeline=None,
    val_pipeline=None,
) -> None:
    config = configurator.DecomposeFALORConfig(**config_raw)
    output_path.mkdir(exist_ok=True, parents=True)

    model = builder.make_model(
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
                model, tuple(config.input_h_w)
            ),
            use_rotation=config.use_rotation,
        )

    builder.validate_module_names(model, config.blacklisted_modules)
    stats_initial = builder.get_model_stats(model, (1, *config.input_h_w, 3))
    stats_initial.update(
        builder.get_decomposeable_model_stats(model, (1, *config.input_h_w, 3))
    )

    t0 = time.perf_counter()
    accuracy_initial = metrics.calc_accuracy(model, val_pipeline)
    t_eval = time.perf_counter() - t0

    def image_iter():
        # restart semantics live in datasets_image.infinite (one home)
        for batch in datasets_image.infinite(train_pipeline):
            yield jnp.asarray(batch["inputs"])

    t1 = time.perf_counter()
    model, decompose_config = falor.decompose(
        module=model,
        data_iterator=image_iter(),
        proportion_threshold=config.proportion_threshold,
        nsr_final_threshold=config.nsr_final_threshold,
        kl_final_threshold=config.kl_final_threshold,
        num_data_steps=config.num_data_steps,
        num_metric_steps=config.num_metric_steps,
        use_float64=config.use_float64,
        use_mean=False,
        use_damping=True,
        blacklisted_module_names=config.blacklisted_modules,
        checkpoint_dir=utils.resolve_subdir(
            output_path, config.decomposition_checkpoint_dir
        ),
    )
    t_deco = time.perf_counter() - t1

    accuracy_final = metrics.calc_accuracy(model, val_pipeline)
    stats_final = builder.get_model_stats(model, (1, *config.input_h_w, 3))
    stats_final.update(
        builder.get_decomposeable_model_stats(model, (1, *config.input_h_w, 3))
    )

    with open(output_path / "decompose_config.json", "w") as f:
        json.dump(decompose_config, f)
    sd = utils.state_dict(model)
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
        "kmapps_initial": stats_initial["kmapps"],
        "kmapps_final": stats_final["kmapps"],
        "kmapps_frac": stats_final["kmapps"] / stats_initial["kmapps"] * 100.0,
        "time_decomposition": t_deco,
        "time_eval": t_eval,
        "device": f"{device.platform}:{device.device_kind}",
    }
    with open(output_path / "summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    logger.info(f"Summary: {json.dumps(summary, indent=2)}")
