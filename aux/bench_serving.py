"""Serving-path benchmark: original vs decomposed vs decomposed+fused
forward throughput on the TPU chip.

The point of decomposition is a cheaper serving forward; this artifact
tracks that end benefit (the reference never measures it).  Workload: the
bench MLP (4x d=2048) decomposed at rank 128 everywhere
(min_rank pins the ladder; 1/8 of d is a serving-realistic
compression), bf16 activations, batch 16384.
``nn.fuse_factor_pairs`` additionally routes each factor pair through the
Pallas fused low-rank kernel (ops/lowrank_pallas.py).

Persists BENCH_SERVING.json (run history, best-of).  Run on TPU:
    python aux/bench_serving.py
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from ptdeco_tpu import dwain, models, nn
from ptdeco_tpu.utils.cache import enable_compilation_cache

D = 2048
DEPTH = 4
RANK = 192  # data rank of the synthetic calibration stream
BATCH = 16384  # large enough that compute clears the ~5ms tunnel floor
MIN_RANK = 128  # serving-realistic compression (1/8 of d); fused-kernel regime
ITERS = 8


def data_iterator(seed: int, batch: int = 256):
    key = jax.random.PRNGKey(seed)
    proj = jax.random.normal(jax.random.PRNGKey(123), (RANK, D))
    while True:
        key, sub = jax.random.split(key)
        z = jax.random.normal(sub, (batch, RANK))
        yield {"inp": z @ proj}


def timeit(fn, make_arg):
    # vary inputs per call: the tunnel runtime memoizes repeated
    # (executable, args) pairs, which would fake the timing
    args = [make_arg(i) for i in range(ITERS)]
    float(sum(jnp.sum(a) for a in args))  # materialize
    float(jnp.sum(fn(args[0])))  # compile
    t0 = time.perf_counter()
    acc = float(sum(jnp.sum(fn(a)) for a in args))
    assert acc == acc
    return (time.perf_counter() - t0) / ITERS


def main() -> None:
    import logging

    logging.disable(logging.INFO)
    enable_compilation_cache()

    model = models.make_mlp(jax.random.PRNGKey(0), dim=D, depth=DEPTH, n_out=16)
    deco, config = dwain.decompose(
        module=model,
        data_iterator=data_iterator(1),
        loss_fn=lambda b, out: 0.01 * jnp.mean(jnp.square(out)),
        num_data_steps=4,
        metric_iterator=data_iterator(2),
        num_metric_steps=1,
        nsr_final_threshold=0.5,
        min_rank=MIN_RANK,
        trade_off_factor=1000.0,
        reduction_factor=0.5,
        max_accepted_ppl_diff=1.0,
        decompose_in_float64=True,
        blacklisted_module_names=["head"],
    )
    assert len(config) == DEPTH

    to_bf16 = lambda m: jtu.tree_map(  # noqa: E731
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32
        else x,
        m,
    )
    orig = to_bf16(model)
    deco = to_bf16(deco)
    fused = nn.fuse_factor_pairs(deco)

    def make_arg(i):
        return (
            jax.random.normal(jax.random.PRNGKey(100 + i), (BATCH, D)) * 0.1
        ).astype(jnp.bfloat16)

    results = {}
    for name, m in (("original", orig), ("decomposed", deco), ("fused", fused)):
        fwd = jax.jit(lambda x, m=m: m({"inp": x}))
        dt = timeit(fwd, make_arg)
        results[name] = {
            "ms_per_batch": round(dt * 1e3, 2),
            "rows_per_s": round(BATCH / dt),
        }

    out = {
        "metric": "serving_forward_throughput",
        "workload": {
            "model": f"mlp d={D} depth={DEPTH}",
            "decomposed_rank": MIN_RANK,
            "batch": BATCH,
            "dtype": "bfloat16",
        },
        "results": results,
        "speedup_decomposed_vs_original": round(
            results["original"]["ms_per_batch"]
            / results["decomposed"]["ms_per_batch"],
            2,
        ),
        "speedup_fused_vs_decomposed": round(
            results["decomposed"]["ms_per_batch"]
            / results["fused"]["ms_per_batch"],
            2,
        ),
        "device": str(jax.devices()[0]),
        "measured_on": time.strftime("%Y-%m-%d"),
    }
    path = pathlib.Path(__file__).resolve().parent.parent / "BENCH_SERVING.json"
    runs = []
    if path.exists():
        runs = json.loads(path.read_text()).get("runs", [])
    runs.append(
        {k: out[k] for k in ("workload", "results", "measured_on")}
    )
    out["runs"] = runs
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
