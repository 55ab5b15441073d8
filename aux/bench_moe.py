"""MoE dispatch benchmark: the ragged_dot grouped fast path vs the
zero-masked dense path (models/transformer.py MoEMLP).

The dense path is the calibration/tap-capture path and pays expert FLOPs
proportional to n_experts; the grouped path sorts (token, slot) pairs by
expert and runs the three expert matmuls as MXU-native grouped matmuls,
paying only top_k — so the ideal separation is n_experts/top_k.  The
reference has no MoE support at all (its builder defers to
AutoModelForCausalLM and eager torch routing loops,
/root/reference/examples/trainer_llm/builder.py:97-107).

Timing methodology per NOTES_ROUND3 hardware ground truth: multi-iteration
lax.scan inside ONE jit (the ~5ms per-dispatch tunnel floor would swamp a
per-call measurement), device_get queue drain after warmup.

Persists BENCH_MOE.json.  Run on TPU:  python aux/bench_moe.py
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from ptdeco_tpu import models

ITERS = 30
CASES = [
    # (dim, moe_hidden, n_experts, top_k, n_tokens) — qwen3-moe-30b-ish
    # and mixtral-8x7b-ish layer shapes at calibration batch sizes
    (2048, 768, 64, 8, 4096),
    (2048, 768, 8, 2, 4096),
    (4096, 14336 // 4, 8, 2, 2048),
    # decode-shaped: batch-16 single-token step — weight-streaming-bound,
    # the regime the int8 grouped kernel exists for (it reads only the
    # TOUCHED experts' int8 grids; prefill-shaped rows above are
    # compute-bound so int8's byte saving cannot show there)
    (4096, 14336 // 4, 8, 2, 16),
]


def check_gmm_parity() -> dict:
    """Numeric pin for the TPU-only megablox path: CPU tests exercise only
    the ragged_dot branch, so the gmm kernel (and its m-tile row padding
    for token counts not divisible by 512) is asserted here against the
    zero-masked dense path on the device itself.  977 tokens * top_k 3 =
    2931 rows — deliberately not a multiple of the 512 m-tile."""
    cfg = models.TransformerConfig(
        vocab_size=32,
        dim=256,
        n_layers=1,
        n_heads=4,
        n_kv_heads=4,
        hidden_dim=192,
        n_experts=8,
        n_experts_per_tok=3,
        moe_hidden_dim=192,
        dtype=jnp.bfloat16,
    )
    moe = models.MoEMLP.create(jax.random.PRNGKey(2), cfg)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 977, 256), jnp.bfloat16)
    y_g = jax.jit(lambda m, x: m._grouped(x, None))(moe, x)
    y_d = jax.jit(lambda m, x: m._dense_masked(x, None))(moe, x)
    err = float(
        jnp.max(jnp.abs(y_g.astype(jnp.float32) - y_d.astype(jnp.float32)))
    )
    scale = float(jnp.max(jnp.abs(y_d.astype(jnp.float32)))) or 1.0
    rel = err / scale
    assert rel < 0.05, f"grouped vs dense mismatch: rel={rel}"
    return {"gmm_parity_max_rel_err": round(rel, 5), "tokens": 977}


def bench_case(dim, hidden, n_experts, top_k, n_tokens):
    cfg = models.TransformerConfig(
        vocab_size=32,
        dim=dim,
        n_layers=1,
        n_heads=8,
        n_kv_heads=8,
        hidden_dim=hidden,
        n_experts=n_experts,
        n_experts_per_tok=top_k,
        moe_hidden_dim=hidden,
        dtype=jnp.bfloat16,
    )
    moe = models.MoEMLP.create(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(
        jax.random.PRNGKey(1), (1, n_tokens, dim), jnp.bfloat16
    )

    def run_many(fn, model=moe):
        @jax.jit
        def prog(moe, x):
            def body(carry, _):
                # chain the input on the carry so the body has a serial
                # data dependency — otherwise XLA hoists the loop-invariant
                # expert computation out of the scan and the "ITERS
                # iterations" measure one
                y = fn(moe, x + carry.astype(x.dtype))
                return (1e-6 * y.sum()).astype(jnp.float32), None

            acc, _ = jax.lax.scan(
                body, jnp.zeros((), jnp.float32), None, length=ITERS
            )
            return acc

        acc = prog(model, x)  # compile + warm
        float(jax.device_get(acc))  # drain the queue
        t0 = time.perf_counter()
        float(jax.device_get(prog(model, x)))
        return (time.perf_counter() - t0) / ITERS

    t_grouped = run_many(lambda m, x: m._grouped(x, None))
    t_dense = run_many(lambda m, x: m._dense_masked(x, None))

    # int8 rows (VERDICT r3 #3): the same layer in the weight-only int8
    # serving form through the in-kernel-dequant grouped Pallas kernel
    # (ops/gmm_int8.py) vs (a) the bf16 grouped path and (b) the
    # dequantize-into-megablox alternative the kernel replaces.
    from ptdeco_tpu import quant

    qmoe = jax.tree_util.tree_map(lambda x: x, moe)  # structural copy
    from ptdeco_tpu import nn as _nn

    for i, e in enumerate(moe.experts):
        for pname in ("gate_proj", "up_proj", "down_proj"):
            qmoe = _nn.replace_submodule(
                qmoe, f"experts.{i}.{pname}",
                quant.quantize_linear(getattr(e, pname)),
            )
    t_int8_kernel = run_many(lambda m, x: m._grouped_int8(x, None), qmoe)
    t_int8_dequant = run_many(lambda m, x: m._grouped(x, None), qmoe)

    # device-side parity of the int8 kernel vs the dense reference on the
    # SAME quantized weights, at this (non-tile-aligned) token count
    y_k = jax.jit(lambda m, x: m._grouped_int8(x, None))(qmoe, x)
    y_d = jax.jit(lambda m, x: m._dense_masked(x, None))(qmoe, x)
    err = float(jnp.max(jnp.abs(
        y_k.astype(jnp.float32) - y_d.astype(jnp.float32)
    )))
    sc = float(jnp.max(jnp.abs(y_d.astype(jnp.float32)))) or 1.0
    assert err / sc < 0.05, f"int8 kernel vs dense mismatch: {err / sc}"

    # expert matmul FLOPs actually required (routed): 3 matmuls x top_k
    flops = 2 * 3 * n_tokens * top_k * dim * hidden
    return {
        "dim": dim,
        "moe_hidden": hidden,
        "n_experts": n_experts,
        "top_k": top_k,
        "n_tokens": n_tokens,
        "grouped_ms": round(t_grouped * 1e3, 3),
        "dense_masked_ms": round(t_dense * 1e3, 3),
        "speedup": round(t_dense / t_grouped, 2),
        "ideal_separation": round(n_experts / top_k, 1),
        "grouped_tflops_routed": round(flops / t_grouped / 1e12, 1),
        "int8_kernel_ms": round(t_int8_kernel * 1e3, 3),
        "int8_dequant_gmm_ms": round(t_int8_dequant * 1e3, 3),
        "int8_kernel_vs_bf16_grouped": round(t_grouped / t_int8_kernel, 2),
        "int8_kernel_vs_dequant": round(t_int8_dequant / t_int8_kernel, 2),
        "int8_parity_max_rel_err": round(err / sc, 5),
    }


def main() -> None:
    parity = check_gmm_parity()
    print(json.dumps(parity))
    rows = []
    for case in CASES:
        row = bench_case(*case)
        rows.append(row)
        print(json.dumps(row))
    out = {
        "metric": "moe_dispatch",
        "note": (
            "grouped = sorted-by-expert dispatch via the megablox gmm "
            "Pallas kernel with a vmem-budgeted (512, k, n) tiling (the "
            "default 128^3 tiling measured 10 TF/s, the budgeted tiling "
            "41 TF/s raw = 83% of a dense matmul of the same narrow-n "
            "shape; lax.ragged_dot sits at 37).  dense_masked = "
            "zero-masked all-experts path (calibration/tap path, FLOPs "
            "∝ n_experts).  speedup is measured wall-clock; the gap to "
            "ideal_separation = n_experts/top_k is the gather/sort/"
            "scatter routing overhead plus the dense path's near-peak "
            "matmul efficiency.  grouped_tflops_routed counts only the "
            "ROUTED expert matmul flops (2*3*T*k*d*h)."
        ),
        "rows": rows,
        "parity": parity,
        "device": str(jax.devices()[0]),
        "measured_on": time.strftime("%Y-%m-%d"),
    }
    path = pathlib.Path(__file__).resolve().parent.parent / "BENCH_MOE.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps({"written": str(path)}))


if __name__ == "__main__":
    main()
