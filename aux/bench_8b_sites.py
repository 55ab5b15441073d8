"""Llama-3-8B-shaped site walk on one chip: dwain-decompose real 8B layer
shapes (dim 4096, hidden 14336, 32 heads / 8 kv) in bf16 with randomized
EVD — the BASELINE.md stretch-tier configuration, depth-trimmed to 2 layers
so the walk is the full pipeline (taps, Gram, EVD, ladder, factor build) at
the exact per-site tensor shapes of the 8B model.

Weights are random (no egress for real checkpoints); the artifact tracks
per-site wall-clock at 8B shapes, which is weight-independent.

Persists BENCH_8B_SHAPED.json.  Run on TPU:  python aux/bench_8b_sites.py
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from ptdeco_tpu import dwain, engine, models
from ptdeco_tpu.utils.cache import enable_compilation_cache

SEQLEN = 1024
NUM_DATA_STEPS = 4
NUM_METRIC_STEPS = 1
VOCAB = 32000


def data_iterator(seed: int):
    key = jax.random.PRNGKey(seed)
    while True:
        key, sub = jax.random.split(key)
        ids = jax.random.randint(sub, (1, SEQLEN), 0, VOCAB, jnp.int32)
        yield {"input_ids": ids, "attention_mask": jnp.ones_like(ids)}


def ce_loss(batch, logits):
    labels = batch["input_ids"][:, 1:]
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    ll = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return -jnp.mean(ll)


def main() -> None:
    import logging

    logging.basicConfig(level=logging.INFO, format="%(message)s")
    enable_compilation_cache()

    # Llama-3-8B per-layer shapes, depth-trimmed
    cfg = models.TransformerConfig(
        vocab_size=VOCAB,
        dim=4096,
        n_layers=2,
        n_heads=32,
        n_kv_heads=8,
        hidden_dim=14336,
        dtype=jnp.bfloat16,
    )
    t0 = time.perf_counter()
    model = models.CausalLM.create(jax.random.PRNGKey(0), cfg)
    jax.block_until_ready(jax.tree_util.tree_leaves(model))
    t_build = time.perf_counter() - t0

    # one of each distinct site shape: q (4096->4096), kv (4096->1024),
    # o (4096->4096), up (4096->14336, the 14336^2 Gram), down (14336->4096)
    keep = {
        "model.layers.0.self_attn.q_proj",
        "model.layers.0.self_attn.k_proj",
        "model.layers.0.mlp.up_proj",
        "model.layers.0.mlp.down_proj",
        "model.layers.1.mlp.up_proj",
    }
    names = engine.get_decomposeable_submodule_names(model)
    blacklist = [n for n in names if n not in keep]

    engine.reset_dispatch_count()
    t0 = time.perf_counter()
    model, config = dwain.decompose(
        module=model,
        data_iterator=data_iterator(1),
        loss_fn=ce_loss,
        num_data_steps=NUM_DATA_STEPS,
        metric_iterator=data_iterator(2),
        num_metric_steps=NUM_METRIC_STEPS,
        nsr_final_threshold=0.5,
        min_rank=256,
        trade_off_factor=1000.0,
        reduction_factor=0.5,
        max_accepted_ppl_diff=1.0,
        decompose_in_float64=True,
        blacklisted_module_names=blacklist,
        eigh_method="randomized",
    )
    jax.block_until_ready(jax.tree_util.tree_leaves(model))
    wall = time.perf_counter() - t0

    out = {
        "metric": "dwain_llama8b_shaped_sites",
        "sites": len(keep),
        "decomposed": len(config),
        "wall_clock_s": round(wall, 1),
        "s_per_site": round(wall / len(keep), 1),
        "dispatches": engine.dispatch_count(),
        "model_build_s": round(t_build, 1),
        "config": {
            "shapes": "dim=4096 hidden=14336 heads=32/8 (Llama-3-8B), 2 layers",
            "seqlen": SEQLEN,
            "num_data_steps": NUM_DATA_STEPS,
            "num_metric_steps": NUM_METRIC_STEPS,
            "dtype": "bfloat16",
            "eigh": "randomized-topk",
        },
        "device": str(jax.devices()[0]),
        "measured_on": time.strftime("%Y-%m-%d"),
    }
    path = (
        pathlib.Path(__file__).resolve().parent.parent / "BENCH_8B_SHAPED.json"
    )
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
