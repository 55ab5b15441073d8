"""Microbenchmarks of the Pallas kernels vs XLA on the real TPU.

Run standalone (one JAX process at a time on this host):
    python aux/bench_kernels.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from ptdeco_tpu import ops


def timeit(fn, make_args, iters=8):
    # vary inputs per iteration: the tunnel runtime memoizes identical
    # (executable, args) executions, which fakes sub-hardware-peak timings
    arg_sets = [make_args(i) for i in range(iters)]
    # materialize inputs before timing (they are lazy jax computations)
    float(sum(jnp.sum(a) for args in arg_sets for a in args))
    out = fn(*arg_sets[0])
    float(jnp.sum(out))  # block_until_ready is unreliable over the tunnel:
    t0 = time.perf_counter()  # force completion by pulling a scalar
    outs = [fn(*a) for a in arg_sets]
    acc = float(sum(jnp.sum(o) for o in outs))
    assert acc == acc
    return (time.perf_counter() - t0) / iters


def main() -> None:
    print(f"device: {jax.devices()[0]}")
    key = jax.random.PRNGKey(0)

    for d, n in [(2048, 8192), (4096, 8192)]:
        for dtype in (jnp.bfloat16, jnp.float32):
            ys = None

            def mk(i, n=n, d=d, dtype=dtype):
                return ((jax.random.normal(jax.random.PRNGKey(i), (n, d)) * 0.1).astype(dtype),)

            t_xla = timeit(jax.jit(ops.gram_xla), mk)
            t_syrk = timeit(jax.jit(ops.syrk_gram), mk)
            flops = n * d * d  # syrk effective
            print(
                f"gram d={d} n={n} {dtype.__name__}: xla {t_xla*1e3:.2f}ms "
                f"({2*flops/t_xla/1e12:.1f} TF/s) | syrk {t_syrk*1e3:.2f}ms "
                f"({2*flops/t_syrk/1e12:.1f} TF/s eq) | "
                f"speedup {t_xla/t_syrk:.2f}x"
            )

    for (n, d_in, r, d_out) in [
        (8192, 4096, 256, 4096),
        (8192, 2048, 128, 2048),
        (1024, 4096, 256, 4096),
    ]:
        k1 = (jax.random.normal(key, (d_in, r)) * 0.1).astype(jnp.bfloat16)
        k2 = (jax.random.normal(key, (r, d_out)) * 0.1).astype(jnp.bfloat16)
        b = jnp.zeros((d_out,), jnp.bfloat16)

        def mk(i, n=n, d_in=d_in, k1=k1, k2=k2, b=b):
            x = (jax.random.normal(jax.random.PRNGKey(i), (n, d_in)) * 0.1).astype(jnp.bfloat16)
            return (x, k1, k2, b)

        t_xla = timeit(jax.jit(ops.lowrank_xla), mk)
        t_pl = timeit(jax.jit(ops.lowrank_matmul), mk)
        fl = 2 * n * r * (d_in + d_out)
        print(
            f"lowrank n={n} in={d_in} r={r} out={d_out} bf16: "
            f"xla {t_xla*1e3:.2f}ms ({fl/t_xla/1e12:.1f} TF/s) | "
            f"pallas {t_pl*1e3:.2f}ms ({fl/t_pl/1e12:.1f} TF/s) | "
            f"speedup {t_xla/t_pl:.2f}x"
        )


if __name__ == "__main__":
    main()
