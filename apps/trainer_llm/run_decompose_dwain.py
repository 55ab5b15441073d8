"""dwain decomposition driver for LLMs.

Mirrors /root/reference/examples/trainer_llm/run_decompose_dwain.py: build
model + loaders, measure initial ppl/params/flops, run dwain with the
configured recovery-finetune closure, save decompose_config.json +
decompose_state_dict.pt + summary.json.

TPU extensions: optional (dp, tp) mesh — calibration batches are sharded
over dp and model params over tp (SURVEY.md §2.7 additions).
"""

from __future__ import annotations

import json
import logging
import pathlib
import time
from typing import Any, Iterator

import jax
import numpy as np

from ptdeco_tpu import dwain, finetune, models, parallel, utils
from ptdeco_tpu.parallel import shardings as psh

from . import builder, configurator, datasets_hf, metrics

logger = logging.getLogger(__name__)

PPL_N_SAMPLES = 1000  # reference run_decompose_dwain.py:21


def _make_infinite_iterator(loaders: list) -> Iterator[dict[str, np.ndarray]]:
    """Random merger over multiple datasets (reference :28-47)."""
    rng = np.random.RandomState(0)
    iters = [iter(ld) for ld in loaders]
    while True:
        i = int(rng.randint(len(iters))) if len(iters) > 1 else 0
        yield next(iters[i])


def make_dataloaders(config: configurator.DecomposeDWAINConfig, tokenizer):
    names = config.decomposition_data_name
    if isinstance(names, str):
        names = [names]
    deco_loaders = []
    for name in names:
        ds = datasets_hf.get_dataset(name)
        deco_loaders.append(
            datasets_hf.prepare_dataloader_v2(
                dataset=ds,
                tokenizer=tokenizer,
                max_seqlen=config.decomposition_data_max_length,
                batch_size=config.decomposition_data_batch_size,
                separator=config.decomposition_data_separator,
            )
        )
    ppl_ds = datasets_hf.get_dataset(config.perplexity_data_name)
    ppl_loader = datasets_hf.prepare_dataloader_v1(
        dataset=ppl_ds,
        tokenizer=tokenizer,
        separator=config.perplexity_data_separator,
        max_seqlen=config.perplexity_data_max_length,
        batch_size=config.perplexity_data_batch_size,
        nsamples=min(PPL_N_SAMPLES, len(ppl_ds)),
    )
    return _make_infinite_iterator(deco_loaders), ppl_loader


def main(config_raw: dict[str, Any], output_path: pathlib.Path) -> None:
    config = configurator.DecomposeDWAINConfig(**config_raw)
    output_path.mkdir(exist_ok=True, parents=True)

    model, tokenizer = builder.make_model_and_tokenizer(
        model_name=config.decomposed_model_name,
        model_revision=config.decomposed_model_revision,
        dtype=config.decomposed_model_dtype,
        custom_builder_path=config.decomposed_model_custom_builder_path,
        custom_builder_config=config.decomposed_model_custom_builder_config,
        checkpoint_path=config.decomposed_model_checkpoint_path,
        enable_gradient_checkpointing=(
            config.decomposed_model_enable_gradient_checkpointing
        ),
    )
    builder.validate_module_names(model, config.blacklisted_modules)

    mesh = None
    if config.mesh_dp is not None or config.mesh_tp > 1 or config.mesh_sp > 1:
        mesh = parallel.make_mesh(
            dp=config.mesh_dp, tp=config.mesh_tp, sp=config.mesh_sp
        )
        model = psh.shard_params(model, mesh)
        logger.info(f"Using mesh {dict(mesh.shape)}")

    deco_iter, ppl_loader = make_dataloaders(config, tokenizer)
    if mesh is not None:
        base_iter = deco_iter
        deco_iter = (parallel.shard_batch_seq(b, mesh) for b in base_iter)

    t_start = time.perf_counter()
    sample_batch = next(iter(ppl_loader.one_epoch()))

    ppl_initial = metrics.calc_perplexity(model, ppl_loader.one_epoch())
    params_initial = metrics.get_params_m(model)
    # reference measures GFLOPs on a fixed (1, 512) input (:175), so the
    # absolute numbers are config-independent
    import jax.numpy as _jnp

    flops_len = min(512, config.perplexity_data_max_length)
    flops_batch = {
        "input_ids": _jnp.zeros((1, flops_len), _jnp.int32),
        "attention_mask": _jnp.ones((1, flops_len), _jnp.int32),
    }
    gflops_initial = metrics.get_giga_flops(model, flops_batch)
    lm_eval_initial_results = None
    if config.lm_eval_initial and config.lm_eval_tasks:
        lm_eval_initial_results = metrics.calc_lm_eval_metrics(
            model, tokenizer, config.lm_eval_tasks
        )

    finetune_fn = None
    if config.finetuning_run:
        mode = "lora" if config.finetuning_use_lora else "full"
        kwargs: dict[str, Any] = dict(
            num_last_modules_to_finetune=config.finetuning_num_last_finetuned_modules,
            num_steps=config.finetuning_num_steps,
            lr=config.finetuning_lr,
        )
        if mode == "lora":
            kwargs["min_rank_to_finetune"] = config.finetuning_lora_min_rank
            kwargs["use_rank_pattern"] = config.finetuning_use_rank_pattern
        finetune_fn = finetune.make_finetune_fn(
            mode, deco_iter, models.ce_loss, **kwargs
        )

    t_deco_start = time.perf_counter()
    model, decompose_config = dwain.decompose(
        module=model,
        data_iterator=deco_iter,
        loss_fn=models.ce_loss,
        num_data_steps=config.num_data_steps,
        metric_iterator=deco_iter,
        num_metric_steps=config.num_metric_steps,
        nsr_final_threshold=config.nsr_final_threshold,
        finetune_fn=finetune_fn,
        blacklisted_module_names=config.blacklisted_modules,
        min_rank=config.min_rank,
        trade_off_factor=config.trade_off_factor,
        reduction_factor=config.reduction_factor,
        max_accepted_ppl_diff=config.max_accepted_ppl_diff,
        decompose_in_float64=config.decompose_in_float64,
        precomputing_covariance_num_splits=config.precomputing_covariance_num_splits,
        use_pallas_gram=config.use_pallas_gram,
        eigh_method=config.eigh_method,
        checkpoint_dir=utils.resolve_subdir(
            output_path, config.decomposition_checkpoint_dir
        ),
    )
    t_deco = time.perf_counter() - t_deco_start

    with open(output_path / "decompose_config.json", "w") as f:
        json.dump(decompose_config, f)
    sd = utils.state_dict(model)
    utils.save_state_dict_pt(sd, str(output_path / "decompose_state_dict.pt"))
    utils.save_state_dict_safetensors(
        sd, str(output_path / "decompose_state_dict.safetensors")
    )

    ppl_final = metrics.calc_perplexity(model, ppl_loader.one_epoch())
    params_final = metrics.get_params_m(model)
    gflops_final = metrics.get_giga_flops(model, flops_batch)
    lm_eval_final_results = None
    if config.lm_eval_tasks:
        lm_eval_final_results = metrics.calc_lm_eval_metrics(
            model, tokenizer, config.lm_eval_tasks
        )

    device = jax.devices()[0]
    summary = {
        "ppl_initial": ppl_initial,
        "ppl_final": ppl_final,
        "mparams_initial": params_initial,
        "mparams_final": params_final,
        # percent, matching the reference summary convention (:294)
        "mparams_frac": params_final / params_initial * 100.0,
        "gflops_initial": gflops_initial,
        "gflops_final": gflops_final,
        "gflops_frac": (
            gflops_final / gflops_initial * 100.0 if gflops_initial else None
        ),
        "time_decomposition": t_deco,
        "time_total": time.perf_counter() - t_start,
        "device": f"{device.platform}:{device.device_kind}",
        "n_devices": jax.device_count(),
        "lm_eval_initial": lm_eval_initial_results,
        "lm_eval_final": lm_eval_final_results,
    }
    with open(output_path / "summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    logger.info(f"Summary: {json.dumps(summary, indent=2)}")
