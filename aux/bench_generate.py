"""Autoregressive generation throughput on the TPU chip: dense vs
decomposed TinyLlama-1.1B shapes through the KV-cache serving path
(ptdeco_tpu/serving.py).

What this measures (the reference has NO generation path to compare —
its deployment story ends at loglikelihood scoring,
/root/reference/examples/trainer_llm/metrics.py:81-107):

  * decode tokens/s for the dense 1.1B model, whole prefill+decode as ONE
    jitted program (lax.scan over steps);
  * the same after factor-pair surgery on all MLP + attention projections
    at proportion ~0.5 (the serving form compression produces) — the end
    benefit decomposition exists for;
  * the per-token-dispatch anti-pattern (one jitted step per token, host
    sync each step) on the dense model, to quantify what the
    single-program design is worth on this transport (~5ms dispatch
    floor, NOTES_ROUND3.md hardware ground truth).

Weights are random bf16 — decode throughput is weight-streaming-bound, so
shapes, not values, determine the numbers.  Factor ranks are set
directly (rank = out_dim//4 caps proportion at ~0.5 for square sites)
rather than running a full dwain walk: the serving cost model depends
only on the factor shapes.

Persists BENCH_GENERATE.json (run history).  Run on TPU:
    python aux/bench_generate.py
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from ptdeco_tpu import engine, models, nn, serving, utils  # noqa: E402
from ptdeco_tpu.utils.cache import enable_compilation_cache  # noqa: E402

BATCH = 8
PROMPT = 128
NEW_TOKENS = 128
VOCAB = 32000


def decompose_for_serving(lm) -> tuple:
    """Factor-pair surgery on every attention/MLP projection at
    rank = min(in, out) // 4 (≈0.5 proportion on square sites, less on
    rectangular ones); random factors — decode cost depends on shapes."""
    names = [
        n
        for n in engine.get_decomposeable_submodule_names(lm)
        if n != "lm_head" and "embed" not in n
    ]
    key = jax.random.PRNGKey(42)
    n_sites = 0
    for name in names:
        site = engine.get_site(lm, name)
        kern = engine.get_site_kernel2d(lm, site)
        d_in, d_out = kern.shape
        rank = min(d_in, d_out) // 4
        key, k1k, k2k = jax.random.split(key, 3)
        k1 = (jax.random.normal(k1k, (d_in, rank)) * 0.02).astype(kern.dtype)
        k2 = (jax.random.normal(k2k, (rank, d_out)) * 0.02).astype(kern.dtype)
        lm = nn.replace_submodule(
            lm, name, engine.build_decomposed_module(lm, site, k1, k2)
        )
        n_sites += 1
    return lm, n_sites


def time_generate(lm, prompt) -> float:
    """Seconds for PROMPT prefill + NEW_TOKENS decode as one program;
    min of 2 hot runs after a full queue drain."""
    out = serving.generate(lm, prompt, NEW_TOKENS)
    jax.device_get(out)  # drain compile backlog
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        jax.block_until_ready(serving.generate(lm, prompt, NEW_TOKENS))
        times.append(time.perf_counter() - t0)
    return min(times)


def time_per_token_dispatch(lm, prompt, n_tokens: int = 16) -> float:
    """s/token for the anti-pattern: one dispatch + host sync per decode
    step (what a naive port of an eager-torch generate loop would do)."""
    caches = serving.init_cache(lm, BATCH, PROMPT + n_tokens + 1)
    step = jax.jit(
        lambda lm, ids, caches, pos: serving.forward_with_cache(
            lm, ids, caches, pos
        )
    )
    logits, caches = step(lm, prompt, caches, 0)
    tok = jnp.argmax(logits[:, -1:, :], axis=-1).astype(jnp.int32)
    # warm the decode-shape compile
    _, c2 = step(lm, tok, caches, PROMPT)
    jax.device_get(jax.tree_util.tree_leaves(c2)[0])
    t0 = time.perf_counter()
    pos = PROMPT
    for _ in range(n_tokens):
        logits, caches = step(lm, tok, caches, pos)
        tok = jnp.argmax(logits[:, -1:, :], axis=-1).astype(jnp.int32)
        jax.block_until_ready(tok)  # host sync every token: the point
        pos += 1
    return (time.perf_counter() - t0) / n_tokens


def main() -> None:
    import logging

    logging.disable(logging.INFO)
    enable_compilation_cache()

    cfg = models.TransformerConfig.tinyllama_1_1b()
    lm = models.CausalLM.create(jax.random.PRNGKey(0), cfg)
    n_params_dense = utils.get_num_params(lm)
    prompt = jax.random.randint(
        jax.random.PRNGKey(1), (BATCH, PROMPT), 0, VOCAB, jnp.int32
    )

    dense_s = time_generate(lm, prompt)
    dense_tok_s = BATCH * NEW_TOKENS / dense_s
    per_tok_s = time_per_token_dispatch(lm, prompt)
    per_dispatch_tok_s = BATCH / per_tok_s

    lm_deco, n_sites = decompose_for_serving(lm)
    n_params_deco = utils.get_num_params(lm_deco)
    deco_s = time_generate(lm_deco, prompt)
    deco_tok_s = BATCH * NEW_TOKENS / deco_s

    out = {
        "model": "tinyllama_1.1b_shapes_bf16",
        "batch": BATCH,
        "prompt_len": PROMPT,
        "new_tokens": NEW_TOKENS,
        "dense_tok_s": round(dense_tok_s, 1),
        "decomposed_tok_s": round(deco_tok_s, 1),
        "decomposed_sites": n_sites,
        "params_proportion": round(n_params_deco / n_params_dense, 4),
        "serving_speedup_vs_dense": round(deco_tok_s / dense_tok_s, 3),
        "per_token_dispatch_tok_s": round(per_dispatch_tok_s, 1),
        "scan_program_win": round(dense_tok_s / per_dispatch_tok_s, 2),
        "device": jax.devices()[0].device_kind,
        "ts": time.time(),
    }
    path = pathlib.Path(__file__).resolve().parent.parent / "BENCH_GENERATE.json"
    hist = []
    if path.exists():
        prev = json.loads(path.read_text())
        hist = prev.get("runs", [prev] if "model" in prev else [])
    hist.append(out)
    path.write_text(json.dumps({"runs": hist}, indent=2) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
