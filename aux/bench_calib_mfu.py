"""MFU of the dwain calibration hot loops at Llama-3-8B shapes (VERDICT r2
item 1): FLOP-accounted measurements of (a) the calibration forward + Gram
accumulation scan step and (b) the indexed-ladder metric step, in bf16 at
seqlen>=1024 on one chip.

FLOPs come from the compiled program's own cost analysis
(``step.jitted.lower(...).compile().cost_analysis()["flops"]``) — i.e. what
XLA actually runs after DCE/fusion, not a hand model — divided by measured
hot-dispatch wall-clock and the v5e bf16 peak (197 TFLOP/s/chip).  The
reference has no analogue: its calibration loop is eager per-batch torch
(/root/reference/src/ptdeco/dwain/decomposition.py:607-611).

Persists BENCH_CALIB_MFU.json.  Run on TPU:  python aux/bench_calib_mfu.py
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from ptdeco_tpu import engine, models
from ptdeco_tpu.utils.cache import enable_compilation_cache

V5E_BF16_PEAK = 197e12
SEQLEN = 1024
BATCH = 1
GRAM_CHUNK = 8  # stacked batches per dispatch
VOCAB = 32000
HOT_REPS = 3


def make_batches(seed: int, k: int):
    key = jax.random.PRNGKey(seed)
    ids = jax.random.randint(key, (k, BATCH, SEQLEN), 0, VOCAB, jnp.int32)
    return {"input_ids": ids, "attention_mask": jnp.ones_like(ids)}


def ce_metric(batch, y_deco, y_orig):
    # ladder metric shape parity with dwain's default (NSR + ppl pair)
    from ptdeco_tpu.utils import losses_primitives as lp

    nsr = lp.calc_per_channel_noise_to_signal_ratio(
        y_deco.astype(jnp.float32), y_orig.astype(jnp.float32)
    )
    labels = batch["input_ids"][:, 1:]
    logp = jax.nn.log_softmax(y_deco[:, :-1].astype(jnp.float32), axis=-1)
    ll = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return jnp.stack([nsr, jnp.exp(-jnp.mean(ll))])


def flops_of(compiled) -> float:
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca["flops"])


def time_hot(fn, *args):
    """Median of HOT_REPS timed dispatches (first call compiles/warms)."""
    out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out))
    times = []
    for _ in range(HOT_REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(jax.tree_util.tree_leaves(out))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2], times


def main() -> None:
    import logging

    logging.basicConfig(level=logging.INFO, format="%(message)s")
    enable_compilation_cache()

    cfg = models.TransformerConfig(
        vocab_size=VOCAB,
        dim=4096,
        n_layers=2,
        n_heads=32,
        n_kv_heads=8,
        hidden_dim=14336,
        dtype=jnp.bfloat16,
    )
    model = models.CausalLM.create(jax.random.PRNGKey(0), cfg)
    jax.block_until_ready(jax.tree_util.tree_leaves(model))

    site_names = [
        "model.layers.0.self_attn.q_proj",
        "model.layers.0.self_attn.k_proj",
        "model.layers.0.mlp.up_proj",
        "model.layers.0.mlp.down_proj",
        "model.layers.1.mlp.up_proj",
    ]
    sites = {n: engine.get_site(model, n) for n in site_names}

    # --- (a) calibration forward + Gram scan step -------------------------
    gram_step = engine.make_gram_scan_step(
        tuple(site_names), sites, engine.default_apply, False, "auto"
    )
    grams = {
        n: jnp.zeros((s.out_features, s.out_features), jnp.float32)
        for n, s in sites.items()
    }
    means = {n: jnp.zeros((s.out_features,), jnp.float32) for n, s in sites.items()}
    batches = make_batches(1, GRAM_CHUNK)

    lowered = gram_step.jitted.lower(model, batches, grams, means)
    gram_flops = flops_of(lowered.compile())

    def run_gram(b):
        # fresh accumulators per call (donated args)
        g = {
            n: jnp.zeros((s.out_features, s.out_features), jnp.float32)
            for n, s in sites.items()
        }
        m = {
            n: jnp.zeros((s.out_features,), jnp.float32)
            for n, s in sites.items()
        }
        return gram_step(model, b, g, m)

    gram_t, gram_times = time_hot(run_gram, batches)
    gram_tflops = gram_flops / gram_t / 1e12
    gram_mfu = gram_flops / gram_t / V5E_BF16_PEAK

    # --- (b) indexed-ladder metric step ----------------------------------
    site = sites["model.layers.0.self_attn.q_proj"]
    group = tuple(
        s
        for s in sites.values()
        if engine.site_group_signature(s) == engine.site_group_signature(site)
    )
    ladder = engine.make_indexed_ladder_metric_step(
        group, engine.default_apply, ce_metric
    )
    kernel2d = engine.get_site_kernel2d(model, site)
    u = jnp.asarray(
        jax.random.normal(
            jax.random.PRNGKey(2), (site.out_features, site.out_features)
        ),
        jnp.float32,
    )
    n_cand, n_metric = 4, 1
    ranks = jnp.asarray([2048, 1024, 512, 256], jnp.int32)
    lbatches = jax.tree_util.tree_map(
        lambda x: x.reshape((n_cand, n_metric) + x.shape[1:]),
        make_batches(2, n_cand * n_metric),
    )
    idx = jnp.int32(0)
    lowered = ladder.jitted.lower(model, idx, kernel2d, u, ranks, lbatches)
    ladder_flops = flops_of(lowered.compile())
    ladder_t, ladder_times = time_hot(
        ladder, model, idx, kernel2d, u, ranks, lbatches
    )
    ladder_tflops = ladder_flops / ladder_t / 1e12
    ladder_mfu = ladder_flops / ladder_t / V5E_BF16_PEAK

    out = {
        "metric": "calibration_mfu_llama8b_shapes",
        "config": {
            "shapes": "dim=4096 hidden=14336 heads=32/8 (Llama-3-8B), 2 layers",
            "seqlen": SEQLEN,
            "batch": BATCH,
            "dtype": "bfloat16",
            "gram_chunk": GRAM_CHUNK,
            "sites": len(site_names),
            "flop_source": "compiled.cost_analysis() (post-DCE XLA count)",
            "peak_tflops_v5e_bf16": V5E_BF16_PEAK / 1e12,
        },
        "gram_pass": {
            "hot_s": round(gram_t, 4),
            "runs_s": [round(t, 4) for t in gram_times],
            "tokens_per_dispatch": GRAM_CHUNK * BATCH * SEQLEN,
            "flops": gram_flops,
            "achieved_tflops": round(gram_tflops, 2),
            "mfu_vs_v5e_bf16_peak": round(gram_mfu, 4),
        },
        "ladder_step": {
            "hot_s": round(ladder_t, 4),
            "runs_s": [round(t, 4) for t in ladder_times],
            "candidates": n_cand,
            "metric_steps": n_metric,
            "flops": ladder_flops,
            "achieved_tflops": round(ladder_tflops, 2),
            "mfu_vs_v5e_bf16_peak": round(ladder_mfu, 4),
        },
        "device": str(jax.devices()[0]),
        "measured_on": time.strftime("%Y-%m-%d"),
    }
    path = (
        pathlib.Path(__file__).resolve().parent.parent / "BENCH_CALIB_MFU.json"
    )
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
