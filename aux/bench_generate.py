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

Weights are random bf16 — decode cost depends on shapes, not values.
Factor ranks are set directly (rank = min//denom) rather than running a
full dwain walk: the serving cost model depends only on the factor
shapes.

Measured speculative reality on this chip (r3): at 1.1B/batch-8 decode
steps are LATENCY-bound, not weight-streaming-bound — a c=0.145 draft's
single step (3.54ms) costs the same as the dense step (3.39ms), so
speculative decoding measures 0.5-0.6x despite 92-96% acceptance.  r4
adds (a) the auto-gate's measured-cost prediction for every speculative
row (serving.estimate_speculative_speedup — the number the generate
CLI's speculative_auto_gate acts on), and (b) the regime the technique
exists for: a 3B-class target whose decode step is genuinely
weight-streaming-bound at small batch, where drafting must pay
(speculative_3b rows).

Persists BENCH_GENERATE.json (run history).  Run on TPU:
    python aux/bench_generate.py
"""

import json
import pathlib
import sys
import time
from typing import Any

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from ptdeco_tpu import engine, models, nn, serving, utils  # noqa: E402
from ptdeco_tpu.utils.cache import enable_compilation_cache  # noqa: E402

BATCH = 8
PROMPT = 128
NEW_TOKENS = 128
VOCAB = 32000


def decompose_for_serving(lm, denom: int = 4, lm_head: bool = False) -> tuple:
    """Factor-pair surgery on every attention/MLP projection at
    rank = min(in, out) // denom (denom=4 ≈ 0.5 proportion on square
    sites); random factors — decode cost depends on shapes.  lm_head=True
    also decomposes the output head (for DRAFT models: in decode the
    65M-param head is streamed every step, a large floor on draft cost)."""
    names = [
        n
        for n in engine.get_decomposeable_submodule_names(lm)
        if (n != "lm_head" or lm_head) and "embed" not in n
    ]
    key = jax.random.PRNGKey(42)
    n_sites = 0
    for name in names:
        site = engine.get_site(lm, name)
        kern = engine.get_site_kernel2d(lm, site)
        d_in, d_out = kern.shape
        rank = min(d_in, d_out) // denom
        key, k1k, k2k = jax.random.split(key, 3)
        k1 = (jax.random.normal(k1k, (d_in, rank)) * 0.02).astype(kern.dtype)
        k2 = (jax.random.normal(k2k, (rank, d_out)) * 0.02).astype(kern.dtype)
        lm = nn.replace_submodule(
            lm, name, engine.build_decomposed_module(lm, site, k1, k2)
        )
        n_sites += 1
    return lm, n_sites


def densify(deco) -> Any:
    """Dense twin of a decomposed model: each factor pair fused to one
    dense kernel.  Function-identical to the decomposed model (up to bf16
    rounding), at full dense weight-streaming cost — the honest target for
    the speculative bench: acceptance measures only the machinery + bf16
    rounding, the regime a well-recovered compression approaches.

    Walks ``named_modules`` for the Sequential factor pairs directly:
    ``get_decomposeable_submodule_names`` on a decomposed model yields
    the SUB-linear names (``site.0``/``site.1``), never the pair — the
    earlier version keyed on it and silently fused NOTHING, so every
    pre-r4 speculative row measured the draft drafting for itself
    (acceptance ~1 by construction, target costs equal to the draft's).
    A fused-count assert now keeps this honest."""
    out = deco
    n_fused = 0
    for name, m in list(nn.named_modules(deco)):
        if (
            isinstance(m, nn.Sequential)
            and len(m.layers) == 2
            and all(type(l) is nn.Linear for l in m.layers)
        ):
            dense = nn.Linear(
                kernel=m.layers[0].kernel @ m.layers[1].kernel,
                bias=m.layers[1].bias,
            )
            out = nn.replace_submodule(out, name, dense)
            n_fused += 1
    assert n_fused > 0, "densify fused nothing — not a decomposed model"
    return out


def time_speculative(target, draft, prompt, k: int) -> tuple[float, dict]:
    out, stats = serving.generate_speculative(
        target, draft, prompt, NEW_TOKENS, k=k, return_stats=True
    )
    jax.device_get(out)
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        jax.block_until_ready(
            serving.generate_speculative(target, draft, prompt, NEW_TOKENS, k=k)
        )
        times.append(time.perf_counter() - t0)
    return min(times), stats


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


def time_beam(lm, prompt, m: int = 4) -> float:
    """Seconds for prefill + NEW_TOKENS of beam search at width m (all
    b*m beams decode as one fused cached batch)."""
    out = serving.generate_beam(lm, prompt, NEW_TOKENS, num_beams=m)
    jax.device_get(out)
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        jax.block_until_ready(
            serving.generate_beam(lm, prompt, NEW_TOKENS, num_beams=m)
        )
        times.append(time.perf_counter() - t0)
    return min(times)


def time_long_prefill(lm, s_p: int = 2048) -> float:
    """Seconds for a LONG prompt prefill (+1 decode step) — the regime
    where computing the vocab head on only each row's last position
    matters (the full (b, s_p, vocab) head/logits would be ~2 GB f32 at
    these shapes)."""
    prompt = jax.random.randint(
        jax.random.PRNGKey(7), (BATCH, s_p), 0, VOCAB, jnp.int32
    )
    out = serving.generate(lm, prompt, 1)
    jax.device_get(out)
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        jax.block_until_ready(serving.generate(lm, prompt, 1))
        times.append(time.perf_counter() - t0)
    return min(times)


def time_continuous_batching(lm) -> tuple[float, float]:
    """tokens/s of REQUESTED tokens for a mixed-length 16-request stream:
    the slot-pool continuous batcher (8 slots, chunked decode) vs the
    lockstep alternative (two ragged generate batches of 8, each padded
    to its longest prompt and run for its LARGEST budget — the waste a
    server without continuous batching pays)."""
    import numpy as np

    from ptdeco_tpu.serving_batcher import ContinuousBatcher

    rng = np.random.default_rng(11)
    reqs = []
    for _ in range(16):
        plen = int(rng.integers(96, 257))
        budget = int(rng.integers(16, 129))
        reqs.append(
            (rng.integers(0, VOCAB, size=plen).astype(np.int32), budget)
        )
    total_new = sum(b for _, b in reqs)

    def run_engine():
        eng = ContinuousBatcher(
            lm, n_slots=8, max_len=512, decode_chunk=16,
            prefill_buckets=(128, 256),
        )
        for p, b in reqs:
            eng.submit(p, b)
        done = eng.run()
        assert len(done) == 16
        assert sum(len(f.tokens) for f in done) == total_new

    run_engine()  # compiles: one decode chunk + one prefill per bucket
    t0 = time.perf_counter()
    run_engine()
    engine_s = time.perf_counter() - t0

    def run_lockstep():
        for i in range(0, 16, 8):
            chunk = reqs[i : i + 8]
            smax = max(p.size for p, _ in chunk)
            bmax = max(b for _, b in chunk)
            batch = np.zeros((8, smax), np.int32)
            lens = np.zeros((8,), np.int32)
            for j, (p, _) in enumerate(chunk):
                batch[j, : p.size] = p
                lens[j] = p.size
            jax.block_until_ready(
                serving.generate(
                    lm,
                    jnp.asarray(batch),
                    bmax,
                    prompt_lens=jnp.asarray(lens),
                    max_len=512,
                )
            )

    run_lockstep()
    t0 = time.perf_counter()
    run_lockstep()
    lock_s = time.perf_counter() - t0
    return total_new / engine_s, total_new / lock_s


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

    # beam-4: the fused-batch design means width-4 search costs one
    # batch-4x decode, not 4 sequential decodes
    beam_s = time_beam(lm, prompt, m=4)

    prefill_s = time_long_prefill(lm)

    cb_tok_s, lockstep_tok_s = time_continuous_batching(lm)

    # weight-only int8: halves the bytes streamed per decode step vs bf16
    from ptdeco_tpu import quant

    qlm = quant.quantize_for_serving(lm)
    int8_s = time_generate(qlm, prompt)
    int8_tok_s = BATCH * NEW_TOKENS / int8_s

    # speculative: the decomposed model drafts for its own dense twin
    # (function-identical target, full dense streaming cost) — output is
    # exactly the twin's greedy continuation; the twin's dense-only
    # decode is the baseline the speedup is against.  Two draft depths:
    # the serving-form c~0.44 draft (measured 0.56x in r3 — too expensive
    # per draft step to pay at k=4) and a deep c~0.13 draft incl. the
    # lm_head (the regime speculative exists for).
    spec = {}
    for tag, denom in (("c44", 4), ("c13", 16)):
        draft, _ = decompose_for_serving(
            models.CausalLM.create(jax.random.PRNGKey(0), cfg),
            denom=denom,
            lm_head=(denom == 16),
        )
        twin = densify(draft)
        twin_s = time_generate(twin, prompt)
        twin_tok_s = BATCH * NEW_TOKENS / twin_s
        spec_s, spec_stats = time_speculative(twin, draft, prompt, k=4)
        spec_tok_s = BATCH * NEW_TOKENS / spec_s
        # the gate's DEFAULT basis: a timed probe of the real loop vs
        # plain decode (gate_measured_speedup — what the serving CLI
        # acts on); the analytic step-cost estimate is recorded for
        # comparison (r5 finding: even with measured acceptance it
        # predicted 1.27x where reality was 0.76x — the round-cost
        # model misses per-round bookkeeping in latency-bound regimes)
        tprobe = serving.measure_speculative_speedup_probe(
            twin, draft, prompt, k=4, probe_tokens=32
        )
        est = serving.estimate_speculative_speedup(
            twin, draft, BATCH, k=4, acceptance=tprobe["acceptance"]
        )
        spec[tag] = {
            "gate_measured_speedup": tprobe["measured_speedup"],
            "gate_slope_speedup": tprobe["slope_speedup"],
            "gate_full_time_speedup": tprobe["full_time_speedup"],
            "gate_probe_acceptance": tprobe["acceptance"],
            "draft_params_proportion": round(
                utils.get_num_params(draft) / n_params_dense, 4
            ),
            "speculative_tok_s": round(spec_tok_s, 1),
            "target_dense_tok_s": round(twin_tok_s, 1),
            "speedup_vs_dense": round(spec_tok_s / twin_tok_s, 3),
            "acceptance": round(
                spec_stats["accepted"] / max(spec_stats["drafted"], 1), 4
            ),
            # the auto-gate's measured-cost prediction for this regime —
            # at 1.1B shapes it should predict <1 (and generate CLI's
            # speculative_auto_gate would fall back to dense here)
            "analytic_expected_speedup": est["expected_speedup"],
            "analytic_step_costs_ms": {
                "target": round(est["target_step_s"] * 1e3, 3),
                "verify": round(est["target_verify_s"] * 1e3, 3),
                "draft": round(est["draft_step_s"] * 1e3, 3),
            },
        }

    # free the 1.1B-era buffers before the 3B models go up (HBM is 16GB;
    # the 3B twin + draft alone are ~7.4GB bf16)
    del lm, lm_deco, qlm, draft, twin

    # The regime speculative EXISTS for: a weight-streaming-bound target.
    # 1.1B decode steps on this chip are floored by in-program small-op
    # latency (~3.4ms/step regardless of weight bytes — r3 finding), so
    # no draft can pay there.  At 3B shapes the dense step is dominated
    # by streaming ~6.5GB of bf16 weights, leaving room under it for the
    # c~0.1 draft's op-floor step; small batches keep the target
    # latency-per-token high.  Same honest twin construction: the target
    # is the draft's densified (function-identical) twin.
    spec_3b = {"shapes": "llama3b-class d=3200 L=26 ffn=8640"}
    cfg3 = models.TransformerConfig(
        vocab_size=VOCAB,
        dim=3200,
        n_layers=26,
        n_heads=32,
        n_kv_heads=32,
        hidden_dim=8640,
        dtype=jnp.bfloat16,
    )
    draft3, _ = decompose_for_serving(
        models.CausalLM.create(jax.random.PRNGKey(2), cfg3),
        denom=16,
        lm_head=True,
    )
    twin3 = densify(draft3)
    spec_3b["draft_params_proportion"] = round(
        utils.get_num_params(draft3) / utils.get_num_params(twin3), 4
    )
    for bsz in (1, 4):
        p3 = jax.random.randint(
            jax.random.PRNGKey(3), (bsz, PROMPT), 0, VOCAB, jnp.int32
        )
        twin3_s = time_generate(twin3, p3)
        twin3_tok_s = bsz * NEW_TOKENS / twin3_s
        s3, st3 = time_speculative(twin3, draft3, p3, k=4)
        s3_tok_s = bsz * NEW_TOKENS / s3
        tprobe3 = serving.measure_speculative_speedup_probe(
            twin3, draft3, p3, k=4, probe_tokens=32
        )
        est3 = serving.estimate_speculative_speedup(
            twin3, draft3, bsz, k=4, acceptance=tprobe3["acceptance"]
        )
        spec_3b[f"b{bsz}"] = {
            "gate_measured_speedup": tprobe3["measured_speedup"],
            "gate_slope_speedup": tprobe3["slope_speedup"],
            "gate_full_time_speedup": tprobe3["full_time_speedup"],
            "gate_probe_acceptance": tprobe3["acceptance"],
            "speculative_tok_s": round(s3_tok_s, 1),
            "target_dense_tok_s": round(twin3_tok_s, 1),
            "speedup_vs_dense": round(s3_tok_s / twin3_tok_s, 3),
            "acceptance": round(
                st3["accepted"] / max(st3["drafted"], 1), 4
            ),
            "analytic_expected_speedup": est3["expected_speedup"],
            "analytic_step_costs_ms": {
                "target": round(est3["target_step_s"] * 1e3, 3),
                "verify": round(est3["target_verify_s"] * 1e3, 3),
                "draft": round(est3["draft_step_s"] * 1e3, 3),
            },
        }
    del twin3, draft3

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
        # tokens/s of the SELECTED sequences (b * new_tokens / wall);
        # the interesting number is the cost ratio vs greedy — width-4
        # search costs one batch-4x decode, not 4 sequential decodes
        "beam4_tok_s": round(BATCH * NEW_TOKENS / beam_s, 1),
        "beam4_cost_vs_greedy": round(beam_s / dense_s, 3),
        "int8_tok_s": round(int8_tok_s, 1),
        "int8_speedup_vs_dense": round(int8_tok_s / dense_tok_s, 3),
        "prefill_2048_s": round(prefill_s, 4),
        "prefill_2048_tok_s": round(BATCH * 2048 / prefill_s, 1),
        # mixed-length 16-request stream, REQUESTED tokens per second
        "continuous_batching_tok_s": round(cb_tok_s, 1),
        "lockstep_batches_tok_s": round(lockstep_tok_s, 1),
        "continuous_batching_win": round(cb_tok_s / lockstep_tok_s, 3),
        "speculative_k": 4,
        "speculative": spec,
        "speculative_3b": spec_3b,
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
