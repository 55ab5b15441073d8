"""Eigendecomposition scaling benchmark: randomized top-k (device sketch +
small host Rayleigh-Ritz) vs the reference's exact host-f64 LAPACK eigh
(/root/reference/src/ptdeco/dwain/decomposition.py:155-163) across Gram
sizes up to Llama-3-8B shapes (up_proj/gate_proj Grams are 14336²; their
full_rank is min(4096, 14336) so the rank search consumes top_k=2048).

The exact path is O(d³) on ONE host core — the scaling wall BASELINE.md's
stretch tier names.  The randomized path does its O(d² m) work on the MXU
and only eighs the (m, m) Rayleigh-Ritz matrix on host.  Also validates
projector agreement vs LAPACK at sizes where the exact path is feasible.

Persists BENCH_EVD.json.  Run on TPU:  python aux/bench_evd.py
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from ptdeco_tpu import engine

# (d, top_k): top_k = full_rank * reduction_factor as dwain's ladder uses.
# 4096/14336 are the Llama-3-8B q_proj / up_proj output sizes.
SIZES = [(2048, 1024), (4096, 2048), (8192, 2048), (14336, 2048)]
EXACT_LIMIT = 4096  # exact host-f64 eigh measured only up to here


def make_gram(d: int, rank: int = 256) -> jax.Array:
    key = jax.random.PRNGKey(d)
    a = jax.random.normal(key, (4096, rank), jnp.float32)
    b = jax.random.normal(jax.random.fold_in(key, 1), (rank, d), jnp.float32)
    y = a @ b + 0.01 * jax.random.normal(
        jax.random.fold_in(key, 2), (4096, d), jnp.float32
    )
    return (y.T @ y) / y.shape[0]


def main() -> None:
    rows = []
    for d, top_k in SIZES:
        g = make_gram(d)
        jax.block_until_ready(g)

        # randomized: device sketch + host RR eigh (m = top_k + 64)
        u = engine.randomized_topk_eigenvectors(g, top_k)  # compile warm
        jax.block_until_ready(u)
        t0 = time.perf_counter()
        u = engine.randomized_topk_eigenvectors(
            g, top_k, key=jax.random.PRNGKey(7)
        )
        jax.block_until_ready(u)
        t_rand = time.perf_counter() - t0

        # distributed: shard_map subspace iteration, CholeskyQR3 instead of
        # the single-device Householder QR (on one chip this isolates the
        # orthonormalization cost: CholeskyQR is matmul-only and MXU-bound,
        # blocked Householder QR on TPU is not).  Queue-drain before timing
        # (block_until_ready right after a compile does not drain the
        # tunnel backlog on this box).
        from ptdeco_tpu import parallel

        u_d = parallel.distributed_topk_eigenvectors(g, top_k)
        float(jax.device_get(jnp.sum(u_d)))
        t0 = time.perf_counter()
        u_d = parallel.distributed_topk_eigenvectors(
            g, top_k, key=jax.random.PRNGKey(7)
        )
        jax.block_until_ready(u_d)
        t_dist = time.perf_counter() - t0

        row = {
            "d": d,
            "top_k": top_k,
            "randomized_s": round(t_rand, 2),
            "distributed_1dev_s": round(t_dist, 2),
        }

        if d <= EXACT_LIMIT:
            g_host = np.asarray(g, np.float64)
            t0 = time.perf_counter()
            w, v = np.linalg.eigh(g_host)
            t_exact = time.perf_counter() - t0
            row["exact_f64_host_s"] = round(t_exact, 2)
            row["speedup"] = round(t_exact / t_rand, 1)
            # projector agreement at a cut inside the spectral gap
            r = 128
            pe = v[:, -r:] @ v[:, -r:].T
            ur = np.asarray(u[:, -r:], np.float64)
            row["projector_max_err_at_r128"] = float(
                np.abs(ur @ ur.T - pe).max()
            )
        else:
            # extrapolate the d^3 wall from the largest measured exact size
            base = next(r for r in rows if r["d"] == EXACT_LIMIT)
            est = base["exact_f64_host_s"] * (d / EXACT_LIMIT) ** 3
            row["exact_f64_host_s_extrapolated"] = round(est, 1)
            row["speedup_vs_extrapolated"] = round(est / t_rand, 1)
        rows.append(row)
        print(json.dumps(row))

    out = {
        "metric": "eigendecomposition_scaling",
        "note": (
            "randomized = engine.randomized_topk_eigenvectors (device "
            "subspace sketch in f32 + host f64 Rayleigh-Ritz of the "
            "(top_k+64)^2 projection); distributed_1dev = "
            "parallel.distributed_topk_eigenvectors on a 1-device mesh "
            "(shard_map + CholeskyQR3 — multi-chip scaling path, timed "
            "here for its single-chip overhead vs the Householder-QR "
            "sketch); exact = numpy.linalg.eigh f64 on one "
            "host core (the reference's only path, dwain:155-163).  d=14336 "
            "is the Llama-3-8B up_proj Gram."
        ),
        "rows": rows,
        "device": str(jax.devices()[0]),
        "measured_on": time.strftime("%Y-%m-%d"),
    }
    path = pathlib.Path(__file__).resolve().parent.parent / "BENCH_EVD.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps({"written": str(path)}))


if __name__ == "__main__":
    main()
