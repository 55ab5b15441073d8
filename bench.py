"""Benchmark: dwain whole-model decomposition wall-clock on the standard
workload, vs the measured reference (torch ptdeco) baseline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "s", "vs_baseline": N}

Workload (identical to aux/bench_reference.py): 4-layer d=768 MLP, synthetic
low-rank Gaussian calibration, num_data_steps=8, num_metric_steps=2,
min_rank=32, reduction_factor=0.5, f64 eigendecomposition, no fine-tuning.

vs_baseline = reference_seconds / our_seconds (higher is better).  The
reference has no published numbers (BASELINE.md) and this environment has no
GPU, so the baseline is the reference implementation measured on this host's
CPU (torch, single thread) — see BASELINE_MEASURED.md for the measurement.

We report the second of two runs: the first run pays XLA compilation (which
the in-process jit cache then amortizes, as it would across the layers of
any real-size model); the reference pays no compile cost.
"""

import json
import time

import jax
import jax.numpy as jnp

from ptdeco_tpu import dwain, models, nn

# Measured by aux/bench_reference.py on this host (torch 2.13 CPU, 1 thread);
# see BASELINE_MEASURED.md.
REFERENCE_BASELINE_S = None  # filled after measurement; fallback below
try:
    import pathlib

    _p = pathlib.Path(__file__).parent / "BASELINE_MEASURED.json"
    REFERENCE_BASELINE_S = json.loads(_p.read_text())["dwain_mlp_wall_s"]
except Exception:
    REFERENCE_BASELINE_S = float("nan")

D = 2048
DEPTH = 4
BATCH = 256
RANK = 64
NUM_DATA_STEPS = 8
NUM_METRIC_STEPS = 2


def data_iterator(seed: int):
    key = jax.random.PRNGKey(seed)
    proj = jax.random.normal(jax.random.PRNGKey(123), (RANK, D))
    while True:
        key, sub = jax.random.split(key)
        z = jax.random.normal(sub, (BATCH, RANK))
        yield {"inp": jax.device_put(z @ proj)}


def loss_fn(batch, out):
    return 0.01 * jnp.mean(jnp.square(out))


def run_once(in_float64: bool = True) -> float:
    model = models.make_mlp(jax.random.PRNGKey(0), dim=D, depth=DEPTH, n_out=16)
    it = data_iterator(1)
    t0 = time.perf_counter()
    model, config = dwain.decompose(
        module=model,
        data_iterator=it,
        loss_fn=loss_fn,
        num_data_steps=NUM_DATA_STEPS,
        metric_iterator=it,
        num_metric_steps=NUM_METRIC_STEPS,
        nsr_final_threshold=0.5,
        min_rank=32,
        trade_off_factor=1000.0,
        reduction_factor=0.5,
        max_accepted_ppl_diff=1.0,
        decompose_in_float64=in_float64,
        blacklisted_module_names=["head"],
    )
    jax.block_until_ready(jax.tree_util.tree_leaves(model))
    elapsed = time.perf_counter() - t0
    assert len(config) == DEPTH, f"expected {DEPTH} decomposed, got {len(config)}"
    return elapsed


def main() -> None:
    import logging

    logging.disable(logging.INFO)
    from ptdeco_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    warm = run_once()
    hot = run_once()
    value = hot
    vs = (
        REFERENCE_BASELINE_S / value
        if REFERENCE_BASELINE_S == REFERENCE_BASELINE_S
        else None
    )
    print(
        json.dumps(
            {
                "metric": "dwain_mlp_decompose_wall_clock",
                "value": round(value, 3),
                "unit": "s",
                "vs_baseline": round(vs, 2) if vs is not None else None,
                "detail": {
                    "first_run_incl_compile_s": round(warm, 3),
                    "baseline_reference_torch_cpu_s": REFERENCE_BASELINE_S,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
