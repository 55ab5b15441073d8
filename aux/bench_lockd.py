"""TPU perf artifacts for the two TRAINING loops (VERDICT r2 item 5):
lockd stage-0 gate training and the vision KD finetune — the paths whose
reference analogue is the composer Trainer
(/root/reference/examples/trainer_vision/run_decompose_lockd.py:206-228,
run_finetune.py:376-400) and which previously had correctness tests but no
measured step time / throughput / MFU.

Uses the REAL driver step functions (apps.trainer_vision.run_decompose_lockd
.make_train_step, and a KD step identical to run_finetune's) on resnet18 at
224x224, synthetic NHWC batches (weight-independent step time), bf16
compute.  FLOPs from compiled cost analysis.  Also records lockd decompose
decisions (per-layer proportions) after the timed steps as the
decisions-sanity artifact.

Persists BENCH_LOCKD.json.  Run on TPU:  python aux/bench_lockd.py
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import optax

from ptdeco_tpu import lockd, nn
from ptdeco_tpu.utils.cache import enable_compilation_cache

V5E_BF16_PEAK = 197e12
BATCH = 64  # primary artifact batch
SWEEP_BATCHES = (64, 256)  # MFU scales with per-step work
HOT_STEPS = 5


def flops_of(lowered) -> float:
    ca = lowered.compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca["flops"])


def time_steps(fn, *args, reps=HOT_STEPS, varying=None):
    out = fn(*args)
    # drain the device queue fully (device_get) before starting timers; on
    # the tunneled transport block_until_ready right after a compile
    # returns before the backlog drains and fabricates timings
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    times = []
    for i in range(reps):
        a = varying(i, args) if varying is not None else args
        t0 = time.perf_counter()
        out = fn(*a)
        jax.block_until_ready(jax.tree_util.tree_leaves(out))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2], times


class _SmallConvNet(nn.Module):
    """NHWC twin of aux/bench_reference_lockd.py::SmallConvNet (6 lockd
    sites: 5 groups==1 convs + fc)."""

    stem: nn.Conv2d
    c1: nn.Conv2d
    c2: nn.Conv2d
    c3: nn.Conv2d
    c4: nn.Conv2d
    fc: nn.Linear

    def __call__(self, x, ctx=None):
        import jax.numpy as jnp

        def pool(h):
            b, hh, ww, c = h.shape
            return h.reshape(b, hh // 2, 2, ww // 2, 2, c).mean(axis=(2, 4))

        x = jax.nn.relu(self.stem(x, ctx))
        x = jax.nn.relu(self.c1(x, ctx))
        x = pool(jax.nn.relu(self.c2(x, ctx)))
        x = jax.nn.relu(self.c3(x, ctx))
        x = pool(jax.nn.relu(self.c4(x, ctx)))
        return self.fc(jnp.mean(x, axis=(1, 2)), ctx)


def make_small_convnet(key):
    ks = jax.random.split(key, 6)
    return _SmallConvNet(
        stem=nn.Conv2d.create(ks[0], 3, 32, 3, stride=2, padding=1),
        c1=nn.Conv2d.create(ks[1], 32, 64, 3, padding=1),
        c2=nn.Conv2d.create(ks[2], 64, 64, 3, padding=1),
        c3=nn.Conv2d.create(ks[3], 64, 128, 3, padding=1),
        c4=nn.Conv2d.create(ks[4], 128, 128, 3, padding=1),
        fc=nn.Linear.create(ks[5], 128, 100),
    )


def _lockd_vs_reference() -> dict:
    import pathlib as _pl
    import subprocess
    import sys as _sys

    from apps.trainer_vision import run_decompose_lockd

    # native side: the real driver step on the paired workload
    model = make_small_convnet(jax.random.PRNGKey(0))
    wrapped = lockd.wrap(model, jax.random.PRNGKey(1))
    trainable, frozen = lockd.trainable_partition(wrapped)
    tx = optax.sgd(1e-3, momentum=0.9)
    opt = tx.init(trainable)
    step_fn = run_decompose_lockd.make_train_step(
        frozen, tx, lmbda=0.4, nsr_threshold=0.05, precision="bf16"
    )
    inputs = jax.random.normal(
        jax.random.PRNGKey(2), (32, 64, 64, 3), jnp.float32
    )
    key = jax.random.PRNGKey(3)
    state = {"tr": trainable, "opt": opt}

    def run_step(k):
        tr, o, loss, aux = step_fn(state["tr"], state["opt"], inputs, k)
        state["tr"], state["opt"] = tr, o
        return loss

    t_ours, _ = time_steps(
        run_step, key, varying=lambda i, a: (jax.random.fold_in(key, i),)
    )

    ref = None
    script = _pl.Path(__file__).parent / "bench_reference_lockd.py"
    if _pl.Path("/root/reference/src/ptdeco").exists() and script.exists():
        try:
            r = subprocess.run(
                [_sys.executable, str(script), "--steps", "10"],
                timeout=900, capture_output=True, text=True,
            )
            if r.returncode == 0:
                ref = json.loads(r.stdout.strip().splitlines()[-1])
        except Exception:
            ref = None
    out = {
        "workload": "6-site convnet, batch 32 @ 64x64 (paired arch)",
        "step_s": round(t_ours, 4),
        "images_per_s": round(32 / t_ours, 1),
    }
    if ref is not None:
        out["reference_torch_cpu_step_s"] = ref["lockd_small_step_s"]
        out["baseline_source"] = "live_same_run"
        out["vs_baseline"] = round(ref["lockd_small_step_s"] / t_ours, 2)
    return out


def main() -> None:
    import logging

    logging.basicConfig(level=logging.INFO, format="%(message)s")
    enable_compilation_cache()

    from apps.trainer_vision import builder, configurator, run_decompose_lockd

    inputs = jax.random.normal(
        jax.random.PRNGKey(0), (BATCH, 224, 224, 3), jnp.float32
    )

    # ---- lockd stage-0 gate training ------------------------------------
    model = builder.make_model("resnet18", input_h_w=(224, 224))
    wrapped = lockd.wrap(model, jax.random.PRNGKey(1))
    trainable, frozen = lockd.trainable_partition(wrapped)
    tx = optax.sgd(1e-3, momentum=0.9)
    opt_state = tx.init(trainable)
    step_fn = run_decompose_lockd.make_train_step(
        frozen, tx, lmbda=0.4, nsr_threshold=0.05, precision="bf16"
    )
    key = jax.random.PRNGKey(42)

    lockd_flops = flops_of(
        step_fn.lower(trainable, opt_state, inputs, key)
    )

    state = {"tr": trainable, "opt": opt_state}

    def run_step(k):
        tr, opt, loss, aux = step_fn(state["tr"], state["opt"], inputs, k)
        state["tr"], state["opt"] = tr, opt
        return loss

    t_lockd, lockd_times = time_steps(
        run_step, key, varying=lambda i, a: (jax.random.fold_in(key, i),)
    )
    lockd_mfu = lockd_flops / t_lockd / V5E_BF16_PEAK

    # decisions-sanity artifact: losses finite, gates alive, decompose runs
    final = nn.combine(state["tr"], frozen)
    proportions = {
        name: float(lockd.calc_propotion_from_logits(mod.logits))
        for name, mod in lockd.named_wrapped_modules(final)
    }
    assert all(jnp.isfinite(v) for v in proportions.values())
    decomposed, deco_cfg = lockd.decompose(final, proportion_threshold=1.0)
    n_decomposed = len(deco_cfg)

    # batch sweep: conv-training MFU is batch-bound; record the scaling
    sweep = {}
    for bs in SWEEP_BATCHES:
        if bs == BATCH:
            sweep[bs] = {
                "step_s": round(t_lockd, 4),
                "images_per_s": round(BATCH / t_lockd, 1),
                "mfu_vs_v5e_bf16_peak": round(lockd_mfu, 4),
            }
            continue
        inputs_b = jax.random.normal(
            jax.random.PRNGKey(5), (bs, 224, 224, 3), jnp.float32
        )
        fl = flops_of(step_fn.lower(state["tr"], state["opt"], inputs_b, key))

        def run_b(k, inputs_b=inputs_b):
            tr, opt, loss, aux = step_fn(state["tr"], state["opt"], inputs_b, k)
            return loss

        t_b, _ = time_steps(
            run_b, key, varying=lambda i, a: (jax.random.fold_in(key, 100 + i),)
        )
        sweep[bs] = {
            "step_s": round(t_b, 4),
            "images_per_s": round(bs / t_b, 1),
            "mfu_vs_v5e_bf16_peak": round(fl / t_b / V5E_BF16_PEAK, 4),
        }

    # ---- the driver's chunked stepping (steps_per_dispatch=8): the
    # SAME update scanned 8-per-dispatch — what the real CLI loop now
    # runs by default; amortizes the host round-trip that dominated the
    # per-step numbers above (the "what moved" of VERDICT r3 #2) -------
    chunk_fn = run_decompose_lockd.make_train_chunk(
        frozen, tx, lmbda=0.4, nsr_threshold=0.05, precision="bf16"
    )
    spd = 8
    chunked = {}
    for bs in SWEEP_BATCHES:
        inputs_b = jax.random.normal(
            jax.random.PRNGKey(5), (bs, 224, 224, 3), jnp.float32
        )
        inputs_k = jnp.stack([inputs_b] * spd)
        keys_k = jax.random.split(jax.random.PRNGKey(6), spd)
        fl_step = flops_of(
            step_fn.lower(state["tr"], state["opt"], inputs_b, key)
        )
        cstate = {"tr": state["tr"], "opt": state["opt"]}

        def run_chunk(_):
            tr, opt, ys = chunk_fn(
                cstate["tr"], cstate["opt"], inputs_k, keys_k
            )
            cstate["tr"], cstate["opt"] = tr, opt
            return ys[0]

        t_chunk, _ = time_steps(run_chunk, 0)
        per_step = t_chunk / spd
        chunked[bs] = {
            "steps_per_dispatch": spd,
            "step_s": round(per_step, 4),
            "images_per_s": round(bs / per_step, 1),
            "mfu_vs_v5e_bf16_peak": round(
                fl_step / per_step / V5E_BF16_PEAK, 4
            ),
        }

    # ---- vs the LIVE torch reference (VERDICT r3 #4): identical small
    # convnet both sides (aux/bench_reference_lockd.py), bare-step torch
    # loop (harder baseline than its composer Trainer), same-ambient
    # subprocess measurement like bench.py's dwain/falor comparisons ----
    vs_ref = _lockd_vs_reference()

    # ---- KD finetune step (run_finetune.py's train_step verbatim shape) --
    from apps.trainer_vision.run_finetune import kd_loss

    teacher = builder.make_model("resnet18", input_h_w=(224, 224))
    student = builder.make_model("resnet18", seed=1, input_h_w=(224, 224))
    s_trainable, s_frozen = nn.partition(
        student, nn.trainable_predicate(student)
    )
    tx2 = optax.adamw(1e-4)
    opt2 = tx2.init(s_trainable)
    precision = "bf16"

    @jax.jit
    def kd_step(trainable, opt_state, inputs):
        inputs_c = configurator.bf16_compute(inputs, precision)
        teacher_logits = configurator.bf16_compute(teacher, precision)(inputs_c)

        def loss_fn(tr):
            m = nn.combine(tr, s_frozen)
            m = configurator.bf16_compute(m, precision)
            return kd_loss(m(inputs_c), teacher_logits)

        loss, grads = jax.value_and_grad(loss_fn)(trainable)
        updates, opt_state = tx2.update(grads, opt_state, trainable)
        return optax.apply_updates(trainable, updates), opt_state, loss

    kd_flops = flops_of(kd_step.lower(s_trainable, opt2, inputs))

    kstate = {"tr": s_trainable, "opt": opt2}

    def run_kd(_):
        tr, opt, loss = kd_step(kstate["tr"], kstate["opt"], inputs)
        kstate["tr"], kstate["opt"] = tr, opt
        return loss

    t_kd, kd_times = time_steps(run_kd, 0)
    kd_mfu = kd_flops / t_kd / V5E_BF16_PEAK

    # chunked KD (the driver's steps_per_dispatch default): scan 8
    # updates per dispatch — same methodology as the lockd chunked rows
    @jax.jit
    def kd_chunk(trainable, opt_state, inputs_k):
        def body(carry, inp):
            tr, opt = carry
            tr, opt, loss = kd_step(tr, opt, inp)
            return (tr, opt), loss

        (trainable, opt_state), losses = jax.lax.scan(
            body, (trainable, opt_state), inputs_k
        )
        return trainable, opt_state, losses

    # batch sweep like the lockd rows (VERDICT r4 #7: KD had only the
    # batch-64 chunked row, so "KD is now fast" was half-verified —
    # lockd reached 42.3% MFU at 256 with the same mechanism)
    kd_chunked = {}
    for bs in SWEEP_BATCHES:
        inputs_b = (
            inputs
            if bs == BATCH
            else jax.random.normal(
                jax.random.PRNGKey(7), (bs, 224, 224, 3), jnp.float32
            )
        )
        kd_flops_b = (
            kd_flops
            if bs == BATCH
            else flops_of(kd_step.lower(s_trainable, opt2, inputs_b))
        )
        inputs_k8 = jnp.stack([inputs_b] * 8)
        kc = {"tr": kstate["tr"], "opt": kstate["opt"]}

        def run_kdc(_, inputs_k8=inputs_k8, kc=kc):
            tr, opt, losses = kd_chunk(kc["tr"], kc["opt"], inputs_k8)
            kc["tr"], kc["opt"] = tr, opt
            return losses

        t_kdc, _ = time_steps(run_kdc, 0)
        kd_chunked[bs] = {
            "steps_per_dispatch": 8,
            "step_s": round(t_kdc / 8, 4),
            "images_per_s": round(bs / (t_kdc / 8), 1),
            "mfu_vs_v5e_bf16_peak": round(
                kd_flops_b / (t_kdc / 8) / V5E_BF16_PEAK, 4
            ),
        }

    out = {
        "metric": "lockd_and_kd_train_step",
        "config": {
            "model": "resnet18 224x224 NHWC",
            "batch": BATCH,
            "precision": "bf16 compute",
            "flop_source": "compiled.cost_analysis()",
            "peak_tflops_v5e_bf16": V5E_BF16_PEAK / 1e12,
        },
        "lockd_stage0": {
            "step_s": round(t_lockd, 4),
            "runs_s": [round(t, 4) for t in lockd_times],
            "images_per_s": round(BATCH / t_lockd, 1),
            "flops_per_step": lockd_flops,
            "achieved_tflops": round(lockd_flops / t_lockd / 1e12, 2),
            "mfu_vs_v5e_bf16_peak": round(lockd_mfu, 4),
            "wrapped_layers": len(proportions),
            "batch_sweep": sweep,
            "chunked_driver_steps": chunked,
            "vs_reference_small": vs_ref,
            "decompose_after_steps": {
                "n_decomposed": n_decomposed,
                "proportions_finite": True,
            },
        },
        "kd_finetune": {
            "step_s": round(t_kd, 4),
            "runs_s": [round(t, 4) for t in kd_times],
            "images_per_s": round(BATCH / t_kd, 1),
            "flops_per_step": kd_flops,
            "achieved_tflops": round(kd_flops / t_kd / 1e12, 2),
            "mfu_vs_v5e_bf16_peak": round(kd_mfu, 4),
            "chunked_driver_steps": kd_chunked,
        },
        "device": str(jax.devices()[0]),
        "measured_on": time.strftime("%Y-%m-%d"),
    }
    path = pathlib.Path(__file__).resolve().parent.parent / "BENCH_LOCKD.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
