"""Global knowledge-distillation fine-tune of a decomposed vision model.

Reference: /root/reference/examples/trainer_vision/run_finetune.py — the
decomposed student trains against the frozen original teacher with the
symmetric-KL loss (:32-45), with proportion/blacklist filtering of the
decompose config at load time and matching state-dict filtering (:136-175),
composer Trainer replaced by a jitted optax step with periodic eval.
"""

from __future__ import annotations

import json
import logging
import pathlib
import time
from typing import Any

import jax
import numpy as np
import optax

from ptdeco_tpu import nn, parallel, utils

from . import builder, configurator, datasets_image, metrics

logger = logging.getLogger(__name__)


def filter_decompose_config(
    decompose_config: dict[str, Any],
    proportion_threshold: float,
    blacklisted_module_names: list[str],
) -> dict[str, Any]:
    """Drop entries above the proportion threshold or blacklisted
    (reference :136-166)."""
    out = {}
    for name, cfg in decompose_config.items():
        meta = cfg.get(utils.MODCONFIG_META_KEY, {})
        proportion = meta.get("proportion", 0.0)
        if name in blacklisted_module_names:
            logger.info(f"Skipping blacklisted {name}")
            continue
        if proportion >= proportion_threshold:
            logger.info(
                f"Skipping {name}, proportion {proportion:.3f} >= "
                f"{proportion_threshold:.3f}"
            )
            continue
        out[name] = cfg
    return out


def filter_state_dict(
    sd: dict[str, np.ndarray], skipped_sites: set[str]
) -> dict[str, np.ndarray]:
    """Remove factor-pair keys of skipped sites so the original module's
    weights (present under the site name) load instead (reference :168-175)."""
    out = {}
    for k, v in sd.items():
        if any(k.startswith(s + ".0.") or k.startswith(s + ".1.") for s in skipped_sites):
            continue
        out[k] = v
    return out


def kd_loss(student_logits: jax.Array, teacher_logits: jax.Array) -> jax.Array:
    return utils.calc_kl_loss(student_logits, teacher_logits)


def main(
    config_raw: dict[str, Any],
    output_path: pathlib.Path,
    train_pipeline=None,
    val_pipeline=None,
) -> None:
    config = configurator.FinetuneConfig(**config_raw)
    output_path.mkdir(exist_ok=True, parents=True)

    teacher = builder.make_model(
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
                teacher, tuple(config.input_h_w)
            ),
            use_rotation=config.use_rotation,
        )

    with open(config.decompose_config) as f:
        decompose_config = json.load(f)
    kept = filter_decompose_config(
        decompose_config, config.proportion_threshold, config.blacklisted_modules
    )
    skipped = set(decompose_config.keys()) - set(kept.keys())

    student = builder.make_model(
        config.decompose_model_name,
        checkpoint_path=config.decompose_model_checkpoint_path,
        input_h_w=tuple(config.input_h_w),
    )
    student = utils.apply_decompose_config(student, kept)
    if config.decompose_state_dict.endswith(".safetensors"):
        sd = utils.load_state_dict_safetensors(config.decompose_state_dict)
    else:
        sd = utils.load_state_dict_pt(config.decompose_state_dict)
    sd = filter_state_dict(sd, skipped)
    # key-overlap audit, reference run_finetune.py:197-203
    builder.log_state_dict_keys_stats("student:", student, sd)
    student = utils.load_state_dict(student, sd, strict=False)

    # trainable: decomposed factor pairs only (finetune_only_decomposed) or all
    if config.finetune_only_decomposed:
        paths = nn.tree_paths_of(student, list(kept.keys()))
        trainable, frozen = nn.partition(
            student, lambda p, leaf: jax.tree_util.keystr(p) in paths
        )
    else:
        # all PARAMETERS; buffers (window masks, position-index tables,
        # BN running stats) must not reach the optimizer
        trainable, frozen = nn.partition(
            student, nn.trainable_predicate(student)
        )

    mesh = None
    if config.mesh_dp is not None:
        mesh = parallel.make_mesh(dp=config.mesh_dp, tp=1)
        trainable = parallel.replicate(trainable, mesh)
        frozen = parallel.replicate(frozen, mesh)
        teacher = parallel.replicate(teacher, mesh)
        logger.info(f"Using mesh {dict(mesh.shape)}")

    steps_per_epoch = max(len(train_pipeline), 1)
    num_steps = configurator.parse_duration(config.max_duration, steps_per_epoch)
    schedule = configurator.get_lr_schedule(config, num_steps, steps_per_epoch)
    tx = configurator.get_optimizer(config, schedule)
    opt_state = tx.init(trainable)

    @jax.jit
    def train_step(trainable, frozen, opt_state, inputs, key):
        inputs_c = configurator.bf16_compute(inputs, config.precision)
        teacher_logits = teacher(inputs_c)  # teacher stays in eval mode

        def loss_fn(tr):
            m = nn.combine(tr, frozen)
            m = configurator.bf16_compute(m, config.precision)
            if config.finetune_eval_mode:
                return kd_loss(m(inputs_c), teacher_logits), {}
            # reference default: student in TRAIN mode — BatchNorms use
            # batch statistics and sow updated running stats
            ctx = nn.Ctx(key=key, train=True)
            loss = kd_loss(m(inputs_c, ctx=ctx), teacher_logits)
            return loss, ctx.sink.get("bn", {})

        (loss, bn_sink), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable
        )
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        if bn_sink:
            # running stats live in the frozen partition (buffers never
            # reach the optimizer); write the sown updates back in-jit
            frozen = nn.apply_bn_updates(frozen, bn_sink)
        return trainable, frozen, opt_state, loss

    accuracy_initial = metrics.calc_accuracy(
        nn.combine(trainable, frozen), val_pipeline
    )

    ckpt = utils.train_ckpt.TrainCheckpointer(
        str(output_path / "checkpoints"), config.save_interval_steps
    )
    # checkpoint BOTH partitions: in train mode the BatchNorm running stats
    # (frozen leaves) are training state too — resuming only `trainable`
    # would silently reset them
    state, opt_state, start_step = ckpt.restore_or(
        {"params": trainable, "frozen": frozen}, opt_state
    )
    trainable, frozen = state["params"], state["frozen"]

    t0 = time.perf_counter()
    # device prefetch: next batches' H2D transfers overlap the current
    # step's compute (the reference's DALI pipeline analogue)
    data_iter = utils.prefetch_to_device(
        datasets_image.infinite(train_pipeline),
        sharding=parallel.batch_sharding(mesh) if mesh is not None else None,
    )
    from .tb_writer import TBWriter

    tb = TBWriter(output_path / "tensorboard", config.tensorboard)
    key = jax.random.PRNGKey(17)

    # steps_per_dispatch > 1: scan the SAME update over a stacked batch
    # chunk so the per-dispatch host round-trip amortizes (the KD step
    # measures ~9% MFU dispatched per step vs ~4x that in-program —
    # BENCH_LOCKD_PROFILE methodology; same fix as the lockd driver)
    spd = max(int(config.steps_per_dispatch), 1)

    @jax.jit
    def train_chunk(trainable, frozen, opt_state, inputs_k, keys_k):
        def body(carry, xs):
            tr, fr, opt = carry
            inp, k = xs
            tr, fr, opt, loss = train_step(tr, fr, opt, inp, k)
            return (tr, fr, opt), loss

        (trainable, frozen, opt_state), losses = jax.lax.scan(
            body, (trainable, frozen, opt_state), (inputs_k, keys_k)
        )
        return trainable, frozen, opt_state, losses

    step_idx = start_step
    while step_idx < num_steps:
        chunk_start = None
        if spd > 1 and step_idx + spd <= num_steps:
            import jax.numpy as jnp

            chunk_start = step_idx
            inputs_k = jnp.stack(
                [next(data_iter)["inputs"] for _ in range(spd)]
            )
            keys_k = jnp.stack(
                [jax.random.fold_in(key, step_idx + j) for j in range(spd)]
            )
            trainable, frozen, opt_state, losses = train_chunk(
                trainable, frozen, opt_state, inputs_k, keys_k
            )
            loss = losses[-1]
            log_now = any((step_idx + j) % 100 == 0 for j in range(spd))
            step_idx += spd - 1
        else:
            batch = next(data_iter)
            inputs = batch["inputs"]
            trainable, frozen, opt_state, loss = train_step(
                trainable, frozen, opt_state, inputs,
                jax.random.fold_in(key, step_idx),
            )
            log_now = step_idx % 100 == 0
        if log_now:
            logger.info(
                f"step {step_idx}/{num_steps} kd_loss={float(loss):.5f}"
            )
            tb.scalars(step_idx, {"loss/kd": float(loss)})
        if chunk_start is not None:
            # chunk tails rarely align with the save interval — use the
            # covered-multiple-aware save (ADVICE r4: even intervals NEVER
            # checkpointed through the chunked loop)
            ckpt.maybe_save_chunk(
                chunk_start, spd,
                {"params": trainable, "frozen": frozen}, opt_state,
            )
        else:
            ckpt.maybe_save(
                step_idx, {"params": trainable, "frozen": frozen}, opt_state
            )
        step_idx += 1
    time_training = time.perf_counter() - t0
    tb.close()
    ckpt.close()

    student = nn.combine(trainable, frozen)
    accuracy_final = metrics.calc_accuracy(student, val_pipeline)
    stats = builder.get_model_stats(student, (1, *config.input_h_w, 3))

    sd_out = utils.state_dict(student)
    utils.save_state_dict_pt(sd_out, str(output_path / "finetuned_state_dict.pt"))
    with open(output_path / "decompose_config.json", "w") as f:
        json.dump(kept, f)

    device = jax.devices()[0]
    summary = {
        "accuracy_initial": accuracy_initial,
        "accuracy_final": accuracy_final,
        "mparams": stats["mparams"],
        "gflops": stats["gflops"],
        "kmapps": stats["kmapps"],
        "n_decomposed": len(kept),
        "n_skipped": len(skipped),
        "time_training": time_training,
        "device": f"{device.platform}:{device.device_kind}",
    }
    with open(output_path / "summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    logger.info(f"Summary: {json.dumps(summary, indent=2)}")
