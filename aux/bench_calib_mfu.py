"""MFU of the dwain calibration hot loops at Llama-3-8B shapes (VERDICT r2
item 1): FLOP-accounted measurements of (a) the calibration forward + Gram
accumulation scan step and (b) the indexed-ladder metric step, in bf16 at
seqlen 1024 on one chip.

FLOP accounting is an explicit analytic model of the ALGORITHMICALLY
REQUIRED matmul work (block linears + attention score/value matmuls + the
Gram), not XLA's cost_analysis — which on this stack counts scan bodies
once, includes dead code (the unused lm_head is DCE'd at runtime: measured
vocab=128 vs 32000 changes chunk time by only 6ms), and omits Pallas
custom-call FLOPs entirely.  The SYRK Gram kernel executes only the lower
tile triangle, so the model reports BOTH the executed FLOPs (hardware MFU)
and the effective 2nd^2 einsum FLOPs the reference's dataflow computes
(/root/reference/src/ptdeco/dwain/decomposition.py:147-152).

Timing drains the device queue (device_get) after warmup before starting
timers — on the tunneled transport, block_until_ready alone right after a
compile returns before the backlog drains and fabricates >100% MFU.

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
HOT_REPS = 4

SITE_NAMES = [
    "model.layers.0.self_attn.q_proj",
    "model.layers.0.self_attn.k_proj",
    "model.layers.0.mlp.up_proj",
    "model.layers.0.mlp.down_proj",
    "model.layers.1.mlp.up_proj",
]


def forward_flops(cfg: models.TransformerConfig, tokens: int, lm_head: bool) -> float:
    """2*MACs of one forward: block linears + attention matmuls
    (+ lm_head when its logits are consumed)."""
    d, hd, kv = cfg.dim, cfg.head_dim, cfg.n_kv_heads * cfg.head_dim
    per_layer_params = (
        d * (cfg.n_heads * hd)  # q
        + 2 * d * kv  # k, v
        + (cfg.n_heads * hd) * d  # o
        + 3 * d * cfg.hidden_dim  # gate, up, down
    )
    linear = 2 * tokens * per_layer_params * cfg.n_layers
    # per layer: QK^T and AV, each 2*S^2*hd per head (batch folded into
    # tokens = B*S, so S^2 terms use SEQLEN with B = tokens/SEQLEN batches)
    b = tokens // SEQLEN
    attn = cfg.n_layers * b * cfg.n_heads * 2 * (2 * SEQLEN * SEQLEN * hd)
    head = 2 * tokens * d * cfg.vocab_size if lm_head else 0
    return float(linear + attn + head)


def gram_flops(sites: dict, tokens: int) -> tuple[float, float]:
    """(executed, effective): SYRK executes the lower tile triangle
    (~n*d^2); the effective einsum is 2*n*d^2 per site."""
    eff = sum(2.0 * tokens * s.out_features**2 for s in sites.values())
    return eff / 2.0, eff


def drain(x) -> None:
    leaf = jax.tree_util.tree_leaves(x)[0]
    jax.device_get(leaf.ravel()[0])


def time_hot(fn, *args):
    out = fn(*args)  # warm (compile)
    drain(out)
    times = []
    for _ in range(HOT_REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2], times


def make_batches(seed: int, k: int):
    key = jax.random.PRNGKey(seed)
    ids = jax.random.randint(key, (k, BATCH, SEQLEN), 0, VOCAB, jnp.int32)
    return {"input_ids": ids, "attention_mask": jnp.ones_like(ids)}


def ce_metric(batch, y_deco, y_orig):
    from ptdeco_tpu.utils import losses_primitives as lp

    v = y_deco.shape[-1]
    nsr = lp.calc_per_channel_noise_to_signal_ratio(
        y_deco.reshape(-1, v), y_orig.reshape(-1, v), non_channel_dim=(0,)
    )
    labels = batch["input_ids"][:, 1:]
    logp = jax.nn.log_softmax(y_deco[:, :-1].astype(jnp.float32), axis=-1)
    ll = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return jnp.stack([nsr, jnp.exp(-jnp.mean(ll))])


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

    sites = {n: engine.get_site(model, n) for n in SITE_NAMES}

    # --- flash-attention numeric pin (TPU-only path; CPU tests never
    # exercise the pallas kernel) ------------------------------------------
    from ptdeco_tpu.models import transformer as _tr

    small = make_batches(7, 1)
    one = jax.tree_util.tree_map(lambda x: x[0], small)
    _tr._FLASH_ENABLED = True
    y_flash = jax.jit(lambda m, b: m(b))(model, one)
    _tr._FLASH_ENABLED = False
    y_einsum = jax.jit(lambda m, b: m(b))(model, one)
    lp_f = jax.nn.log_softmax(y_flash.astype(jnp.float32), axis=-1)
    lp_e = jax.nn.log_softmax(y_einsum.astype(jnp.float32), axis=-1)
    flash_err = float(jnp.max(jnp.abs(lp_f - lp_e)))
    assert flash_err < 0.15, f"flash vs einsum logprob drift: {flash_err}"

    # --- (a) calibration forward + Gram scan step -------------------------
    batches = make_batches(1, GRAM_CHUNK)

    def zeros():
        g = {
            n: jnp.zeros((s.out_features, s.out_features), jnp.float32)
            for n, s in sites.items()
        }
        m = {
            n: jnp.zeros((s.out_features,), jnp.float32)
            for n, s in sites.items()
        }
        return g, m

    def time_gram(flash: bool):
        _tr._FLASH_ENABLED = flash
        gram_step = engine.make_gram_scan_step(
            tuple(SITE_NAMES), sites, engine.default_apply, False, "auto"
        )

        def run_gram(b):
            g, m = zeros()
            return gram_step(model, b, g, m)

        return time_hot(run_gram, batches)

    gram_t_einsum, _ = time_gram(False)
    gram_t, gram_times = time_gram(True)

    chunk_tokens = GRAM_CHUNK * BATCH * SEQLEN
    fwd = forward_flops(cfg, chunk_tokens, lm_head=False)
    g_exec, g_eff = gram_flops(sites, chunk_tokens)
    gram_required = fwd + g_exec
    gram_effective = fwd + g_eff

    # --- (b) indexed-ladder metric step ----------------------------------
    site = sites["model.layers.0.self_attn.q_proj"]
    group = tuple(
        s
        for s in sites.values()
        if engine.site_group_signature(s) == engine.site_group_signature(site)
    )
    kernel2d = engine.get_site_kernel2d(model, site)
    u = jnp.asarray(
        jax.random.normal(
            jax.random.PRNGKey(2), (site.out_features, site.out_features)
        ),
        jnp.float32,
    )
    n_cand, n_metric = 4, 1
    rank_list = [2048, 1024, 512, 256]
    ranks = jnp.asarray(rank_list, jnp.int32)
    lbatches = jax.tree_util.tree_map(
        lambda x: x.reshape((n_cand, n_metric) + x.shape[1:]),
        make_batches(2, n_cand * n_metric),
    )
    idx = jnp.int32(0)

    def time_ladder(flash: bool):
        _tr._FLASH_ENABLED = flash
        ladder = engine.make_indexed_ladder_metric_step(
            group, engine.default_apply, ce_metric
        )
        return time_hot(ladder, model, idx, kernel2d, u, ranks, lbatches)

    ladder_t_einsum, _ = time_ladder(False)
    ladder_t, ladder_times = time_ladder(True)
    # per (candidate, metric batch): TWO full forwards incl. lm_head,
    # plus the deco-kernel composition (W^T u_r then (U V)^T: 2 matmuls of
    # 2*d_in*d_out*r; the indexed ladder composes at the max rank once per
    # candidate)
    fwd1 = forward_flops(cfg, BATCH * SEQLEN, lm_head=True)
    compose = sum(
        2 * 2 * site.in_features * site.out_features * r for r in rank_list
    )
    ladder_required = n_cand * n_metric * 2 * fwd1 + compose

    out = {
        "metric": "calibration_mfu_llama8b_shapes",
        "config": {
            "shapes": "dim=4096 hidden=14336 heads=32/8 (Llama-3-8B), 2 layers",
            "seqlen": SEQLEN,
            "batch": BATCH,
            "dtype": "bfloat16",
            "gram_chunk": GRAM_CHUNK,
            "sites": len(SITE_NAMES),
            "flop_source": "analytic matmul model (see module docstring)",
            "peak_tflops_v5e_bf16": V5E_BF16_PEAK / 1e12,
        },
        "gram_pass": {
            "hot_s": round(gram_t, 4),
            "runs_s": [round(t, 4) for t in gram_times],
            "tokens_per_dispatch": chunk_tokens,
            "required_flops": gram_required,
            "achieved_tflops": round(gram_required / gram_t / 1e12, 2),
            "mfu_vs_v5e_bf16_peak": round(
                gram_required / gram_t / V5E_BF16_PEAK, 4
            ),
            "effective_flops_full_einsum": gram_effective,
            "effective_tflops": round(gram_effective / gram_t / 1e12, 2),
            "einsum_attn_hot_s": round(gram_t_einsum, 4),
            "flash_speedup": round(gram_t_einsum / gram_t, 3),
            "note": "SYRK executes half the Gram; effective_* counts the "
            "full 2nd^2 einsum the reference dataflow computes; "
            "flash_speedup is vs the materialized-logits einsum "
            "attention path on the same program",
        },
        "flash_parity_max_logprob_err": round(flash_err, 5),
        "ladder_step": {
            "hot_s": round(ladder_t, 4),
            "runs_s": [round(t, 4) for t in ladder_times],
            "candidates": n_cand,
            "metric_steps": n_metric,
            "required_flops": ladder_required,
            "achieved_tflops": round(ladder_required / ladder_t / 1e12, 2),
            "mfu_vs_v5e_bf16_peak": round(
                ladder_required / ladder_t / V5E_BF16_PEAK, 4
            ),
            "einsum_attn_hot_s": round(ladder_t_einsum, 4),
            "flash_speedup": round(ladder_t_einsum / ladder_t, 3),
        },
        "device": str(jax.devices()[0]),
        "measured_on": time.strftime("%Y-%m-%d"),
    }
    path = (
        pathlib.Path(__file__).resolve().parent.parent / "BENCH_CALIB_MFU.json"
    )
    runs = []
    if path.exists():
        runs = json.loads(path.read_text()).get("runs", [])
    runs.append(
        {
            "measured_on": out["measured_on"],
            "gram_mfu": out["gram_pass"]["mfu_vs_v5e_bf16_peak"],
            "gram_hot_s": out["gram_pass"]["hot_s"],
            "ladder_mfu": out["ladder_step"]["mfu_vs_v5e_bf16_peak"],
        }
    )
    out["runs"] = runs
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
