"""Post-hoc LoRA fine-tuning of a decomposed LLM checkpoint.

Mirrors /root/reference/examples/trainer_llm/run_finetune.py: rebuild the
original model, apply decompose_config + state dict, attach LoRA to the
factor pairs (rank = max(site_rank // 32, 8) per the reference :157-212),
train with eval + early stopping, merge, save summary.json.

The reference drives a transformers.Trainer subclass; here it is one jitted
optax train step with a host-side eval/early-stop loop.
"""

from __future__ import annotations

import json
import logging
import pathlib
import re
import time
import zlib
from typing import Any

import jax
import numpy as np
import optax

from ptdeco_tpu import finetune as ft
from ptdeco_tpu import models, nn, parallel, utils
from ptdeco_tpu.parallel import shardings as psh

from . import builder, configurator, datasets_hf, metrics

logger = logging.getLogger(__name__)


def _lora_targets(model: nn.Module, decompose_config: dict[str, Any]):
    """LoRA targets = factor pairs from the decompose config with
    per-module rank max(rank // 32, 8) (reference :157-212)."""
    targets = []
    for name in decompose_config.keys():
        first = f"{name}.0"
        rank = nn.get_submodule(model, first).out_features
        r = max(rank // 32, 8)
        targets.append((f"{name}.0", r))
        targets.append((f"{name}.1", r))
    return targets


def main(config_raw: dict[str, Any], output_path: pathlib.Path) -> None:
    config = configurator.FinetuneConfig(**config_raw)
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
    with open(config.decompose_config) as f:
        decompose_config = json.load(f)
    model = builder.apply_decompose_config_and_state_dict(
        model, config.decompose_config, config.decompose_state_dict
    )
    stacked_moe = False
    if config.mesh_ep > 1:
        # expert parallelism: stack eligible MoE layers so their (E, ...)
        # tensors shard over the ep mesh axis; decomposed/ineligible
        # layers stay in tuple form (stack_moe_experts logs each skip).
        # Must happen BEFORE LoRA attach (stacked layers expose no
        # per-expert Linear sites) — decomposed factor-pair targets live
        # in layers that stay unstacked, so the two compose.
        model = models.stack_moe_experts(model)
        stacked_moe = True
    if config.mesh_pp > 1:
        # fail fast (before any data loading) on non-homogeneous stacks;
        # LoRA attaches uniformly to decomposed sites, so heterogeneity
        # is already visible here (pipeline_logits re-checks post-LoRA)
        parallel.stack_block_params(model.model.layers)

    train_ds = datasets_hf.get_dataset(config.train_data_name)
    train_loader = datasets_hf.prepare_dataloader_v1(
        dataset=train_ds,
        tokenizer=tokenizer,
        separator=config.train_data_separator,
        max_seqlen=config.train_data_max_length,
        batch_size=config.train_data_batch_size,
        nsamples=config.train_data_n_samples,
    )
    test_ds = datasets_hf.get_dataset(config.test_data_name)
    test_loader = datasets_hf.prepare_dataloader_v1(
        dataset=test_ds,
        tokenizer=tokenizer,
        separator=config.test_data_separator,
        max_seqlen=config.test_data_max_length,
        batch_size=config.test_data_batch_size,
        nsamples=config.test_data_n_samples,
    )
    ppl_ds = datasets_hf.get_dataset(config.perplexity_data_name)
    ppl_loader = datasets_hf.prepare_dataloader_v1(
        dataset=ppl_ds,
        tokenizer=tokenizer,
        separator=config.perplexity_data_separator,
        max_seqlen=config.perplexity_data_max_length,
        batch_size=config.perplexity_data_batch_size,
    )

    t0 = time.perf_counter()
    ppl_before = metrics.calc_perplexity(model, ppl_loader.one_epoch())

    # attach LoRA
    use_pp = config.mesh_pp > 1
    key = jax.random.PRNGKey(0)
    targets = _lora_targets(model, decompose_config)
    lora_names = []
    for i, (name, r) in enumerate(targets):
        base = nn.get_submodule(model, name)
        if use_pp:
            # rng_id is a STATIC module field; per-site-global values
            # would make layer treedefs differ and break the pipeline's
            # homogeneous stack.  Under pp the id only needs to be
            # unique WITHIN a layer (pipeline_logits folds the global
            # layer index into ctx.key), so derive it from the
            # within-layer path.  Init keys stay globally unique.
            sub = re.sub(r"^model\.layers\.\d+\.", "", name)
            rng_id = zlib.crc32(sub.encode()) & 0x7FFFFFFF
        else:
            rng_id = i
        model = nn.replace_submodule(
            model,
            name,
            ft.LoRALinear.attach(
                jax.random.fold_in(key, i),
                base,
                r,
                alpha=config.lora_alpha,
                dropout=config.lora_dropout,
                rng_id=rng_id,
            ),
        )
        lora_names.append(name)
    mesh = None
    if (
        config.mesh_dp is not None
        or config.mesh_tp > 1
        or config.mesh_ep > 1
        or config.mesh_pp > 1
    ):
        mesh = parallel.make_mesh(
            dp=config.mesh_dp,
            tp=config.mesh_tp,
            ep=config.mesh_ep,
            pp=config.mesh_pp,
        )
        model = psh.shard_params(model, mesh)
        logger.info(f"Using mesh {dict(mesh.shape)}")
    pp_microbatches = (
        config.pp_microbatches
        if config.pp_microbatches is not None
        else config.mesh_pp
    )

    leaf_names = [f"{n}.lora_a" for n in lora_names] + [
        f"{n}.lora_b" for n in lora_names
    ]
    paths = nn.tree_paths_of(model, leaf_names)
    trainable, frozen = nn.partition(
        model, lambda p, leaf: jax.tree_util.keystr(p) in paths
    )

    steps_per_epoch = len(train_loader)
    num_steps = steps_per_epoch * config.num_train_epochs
    if config.lr_scheduler_type == "cosine_with_warmup":
        sched = optax.warmup_cosine_decay_schedule(
            0.0, config.learning_rate, config.num_warmup_steps, num_steps
        )
    else:
        sched = optax.join_schedules(
            [
                optax.linear_schedule(
                    0.0, config.learning_rate, config.num_warmup_steps
                ),
                optax.linear_schedule(
                    config.learning_rate,
                    0.0,
                    max(num_steps - config.num_warmup_steps, 1),
                ),
            ],
            [config.num_warmup_steps],
        )
    tx = optax.adamw(
        sched,
        b1=config.adam_beta1,
        b2=config.adam_beta2,
        eps=config.adam_epsilon,
        weight_decay=config.weight_decay,
    )
    opt_state = tx.init(trainable)

    def forward(m, batch, ctx=None):
        """Model forward; under mesh_pp this is the GPipe pipeline over
        the pp axis (exact: gradients pinned in tests/test_pipeline.py)."""
        if use_pp:
            return parallel.pipeline_logits(
                m, batch, mesh, pp_microbatches, ctx
            )
        return m(batch, ctx=ctx)

    @jax.jit
    def train_step(trainable, opt_state, batch, key):
        def loss_fn(tr):
            m = nn.combine(tr, frozen)
            ctx = nn.Ctx(key=key, train=True)
            return models.ce_loss(batch, forward(m, batch, ctx))

        loss, grads = jax.value_and_grad(loss_fn)(trainable)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        return optax.apply_updates(trainable, updates), opt_state, loss

    @jax.jit
    def eval_loss(trainable, batch):
        m = nn.combine(trainable, frozen)
        return models.ce_loss(batch, forward(m, batch))

    best_eval = float("inf")
    best_trainable = trainable
    patience = 0
    step = 0
    stop = False
    t_train = time.perf_counter()
    for epoch in range(config.num_train_epochs):
        for batch in train_loader.one_epoch(shuffle=True):
            if mesh is not None:
                batch = parallel.shard_batch(batch, mesh)
            tr_key = jax.random.fold_in(key, 10_000 + step)
            trainable, opt_state, loss = train_step(
                trainable, opt_state, batch, tr_key
            )
            if step % config.logging_steps == 0:
                logger.info(f"step {step}/{num_steps} loss={float(loss):.4f}")
            if (step + 1) % config.eval_steps == 0:
                losses = [
                    float(
                        eval_loss(
                            trainable,
                            parallel.shard_batch(b, mesh)
                            if mesh is not None
                            else b,
                        )
                    )
                    for b in test_loader.one_epoch()
                ]
                ev = float(np.mean(losses)) if losses else float("inf")
                logger.info(f"eval loss={ev:.4f} (best {best_eval:.4f})")
                if ev < best_eval:
                    best_eval, best_trainable, patience = ev, trainable, 0
                else:
                    patience += 1
                    if patience >= config.early_stopping_patience:
                        logger.info("Early stopping")
                        stop = True
                        break
            step += 1
        if stop:
            break
    if best_eval < float("inf"):
        trainable = best_trainable

    model = nn.combine(trainable, frozen)
    model = ft.merge_lora(model)
    time_finetuning = time.perf_counter() - t_train

    ppl_after = metrics.calc_perplexity(model, ppl_loader.one_epoch())

    if stacked_moe:
        # back to the tuple-of-expert checkpoint form before export
        model = models.unstack_moe_experts(model)
    sd = utils.state_dict(model)
    utils.save_state_dict_pt(sd, str(output_path / "finetuned_state_dict.pt"))

    summary = {
        "ppl_before": ppl_before,
        "ppl_after": ppl_after,
        "mparams": metrics.get_params_m(model),
        "time_finetuning": time_finetuning,
        "time_total": time.perf_counter() - t0,
        "steps": step,
        "device": f"{jax.devices()[0].platform}:{jax.devices()[0].device_kind}",
    }
    with open(output_path / "summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    logger.info(f"Summary: {json.dumps(summary, indent=2)}")
