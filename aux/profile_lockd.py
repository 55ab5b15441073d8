"""Ablation profile of the lockd stage-0 / KD-finetune train steps
(VERDICT r3 #2: "profile and raise lockd MFU (8-19%) or prove the bound").

The jax.profiler trace path is unreliable over the tunneled transport, so
this measures by ABLATION: each row is one jitted multi-step program (scan
over steps, queue-drained, min of hot runs — the BENCH_LOCKD methodology)
and the deltas between rows attribute the cost:

  plain_fwd          resnet18 forward only                (roofline probe)
  plain_train        resnet18 full fwd+bwd+sgd            (the MFU a plain
                                                          trainer gets — the
                                                          honest ceiling for
                                                          a training step on
                                                          this model/chip)
  wrapped_fwd        lockd-wrapped forward (teacher+student, no grads)
  lockd_step         the real driver step                 (BENCH_LOCKD row)
  lockd_step_nonsr   same but the per-layer NSR replaced by a plain sum
                     (costs the per-channel (y0-z)^2 / y0^2 reductions)
  kd_step            the KD finetune step (teacher+student CE/KL)

MFU uses compiled cost_analysis flops for each program over v5e bf16 peak.
Run on TPU:  python aux/profile_lockd.py [batch ...]
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
ITERS = 10


def flops_of(lowered) -> float:
    ca = lowered.compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca["flops"])


def timed(prog, *args):
    out = prog(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(prog(*args))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


def scan_of(step, carry0, key):
    """One dispatch running ITERS steps with a serial dependency."""

    @jax.jit
    def prog(carry, key):
        def body(c, k):
            return step(c, k), None

        out, _ = jax.lax.scan(
            body, carry, jax.random.split(key, ITERS)
        )
        return out

    return prog, (carry0, key)


def measure(name, step, carry0, key, results):
    prog, args = scan_of(step, carry0, key)
    t = timed(prog, *args)
    # per-step flops from lowering ONE step: XLA cost_analysis counts a
    # scan body once regardless of trip count, so the scan program's
    # count IS one step's (documented cost_analysis caveat, BENCH_CALIB
    # docstring) — but lower the single step explicitly to be immune to
    # that behavior changing
    fl = flops_of(
        jax.jit(lambda c, k: step(c, k)).lower(
            args[0], jax.random.split(args[1], ITERS)[0]
        )
    )
    results[name] = {
        "step_s": round(t, 5),
        "gflops_per_step": round(fl / 1e9, 1),
        "achieved_tflops": round(fl / t / 1e12, 2),
        "mfu": round(fl / t / V5E_BF16_PEAK, 4),
    }
    print(name, json.dumps(results[name]))


def main() -> None:
    import logging

    logging.disable(logging.INFO)
    enable_compilation_cache()
    batches = [int(a) for a in sys.argv[1:]] or [64, 256, 512]

    from apps.trainer_vision import builder, run_decompose_lockd

    out: dict = {"device": str(jax.devices()[0]), "rows": {}}
    for bs in batches:
        results: dict = {}
        inputs = jax.random.normal(
            jax.random.PRNGKey(0), (bs, 224, 224, 3), jnp.bfloat16
        )
        model = builder.make_model("resnet18", input_h_w=(224, 224))
        model_bf16 = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            model,
        )

        # plain forward
        def fwd_step(c, k, m=model_bf16):
            y = m(inputs + c.astype(inputs.dtype))
            return (1e-6 * y.sum()).astype(jnp.float32)

        measure("plain_fwd", fwd_step, jnp.zeros((), jnp.float32),
                jax.random.PRNGKey(1), results)

        # plain full training step (all params trainable, CE on random
        # labels) — the ceiling a plain trainer reaches on this model
        labels = jax.random.randint(jax.random.PRNGKey(2), (bs,), 0, 1000)
        tx_full = optax.sgd(1e-3, momentum=0.9)
        opt0 = tx_full.init(model_bf16)

        def train_step(carry, k):
            m, opt = carry

            def loss_fn(m):
                logits = m(inputs)
                lse = jax.nn.logsumexp(logits.astype(jnp.float32), -1)
                ll = jnp.take_along_axis(
                    logits.astype(jnp.float32), labels[:, None], 1
                )[:, 0]
                return jnp.mean(lse - ll)

            loss, grads = jax.value_and_grad(loss_fn)(m)
            upd, opt = tx_full.update(grads, opt, m)
            return (optax.apply_updates(m, upd), opt)

        measure("plain_train", train_step, (model_bf16, opt0),
                jax.random.PRNGKey(3), results)

        # lockd wrapped forward only
        wrapped = lockd.wrap(model, jax.random.PRNGKey(4))
        trainable, frozen = lockd.trainable_partition(wrapped)

        def wfwd_step(c, k):
            m = nn.combine(trainable, frozen)
            from apps.trainer_vision import configurator

            m = configurator.bf16_compute(m, "bf16")
            ctx = nn.Ctx(key=k, train=False)
            _ = m(
                (inputs + c.astype(inputs.dtype)).astype(jnp.bfloat16),
                ctx=ctx,
            )
            nsr = lockd.get_nsr_loss(ctx.sink.get("nsr", {}), 0.05)
            return nsr.astype(jnp.float32)

        measure("wrapped_fwd", wfwd_step, jnp.zeros((), jnp.float32),
                jax.random.PRNGKey(5), results)

        # the real lockd step
        tx = optax.sgd(1e-3, momentum=0.9)
        opt_l = tx.init(trainable)
        step_fn = run_decompose_lockd.make_train_step(
            frozen, tx, lmbda=0.4, nsr_threshold=0.05, precision="bf16"
        )

        def lockd_step(carry, k):
            tr, opt = carry
            tr, opt, loss, aux = step_fn(tr, opt, inputs.astype(jnp.float32), k)
            return (tr, opt)

        measure("lockd_step", lockd_step, (trainable, opt_l),
                jax.random.PRNGKey(6), results)

        # same step with the NSR reductions replaced by a plain sum —
        # the delta prices the per-channel (y0-z)^2 / y0^2 reductions
        from ptdeco_tpu import utils as _utils

        real_nsr = _utils.calc_per_channel_noise_to_signal_ratio

        def fake_nsr(x=None, y=None, non_channel_dim=(0,), **kw):
            # scalar like the real per-layer NSR loss contribution
            return jnp.mean((x - y).astype(jnp.float32))

        try:
            from ptdeco_tpu.lockd import decomposition as _ld

            _ld.utils.calc_per_channel_noise_to_signal_ratio = fake_nsr
            step_fn2 = run_decompose_lockd.make_train_step(
                frozen, tx, lmbda=0.4, nsr_threshold=0.05, precision="bf16"
            )

            def lockd_step2(carry, k):
                tr, opt = carry
                tr, opt, loss, aux = step_fn2(
                    tr, opt, inputs.astype(jnp.float32), k
                )
                return (tr, opt)

            measure("lockd_step_nonsr", lockd_step2, (trainable, opt_l),
                    jax.random.PRNGKey(7), results)
        finally:
            _ld.utils.calc_per_channel_noise_to_signal_ratio = real_nsr

        out["rows"][bs] = results

    path = pathlib.Path(__file__).resolve().parent.parent / (
        "BENCH_LOCKD_PROFILE.json"
    )
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps({"written": str(path)}))


if __name__ == "__main__":
    main()
