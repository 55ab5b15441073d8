"""Multi-host (multi-process) bring-up: a REAL 2-process jax.distributed
grid (2 processes x 2 virtual CPU devices = 4-device dp mesh) running the
DP gram accumulation and matching the serial result bit-for-bit.  This
exercises parallel.initialize_distributed end-to-end — the layer the
reference has no equivalent of (SURVEY.md §2.7) — not just a mock."""

import pathlib
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = str(pathlib.Path(__file__).resolve().parent.parent)

WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_enable_async_dispatch", False)
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    import numpy as np
    sys.path.insert(0, {repo!r})
    from ptdeco_tpu import engine, nn, parallel

    pid = int(sys.argv[1])
    parallel.initialize_distributed(
        {addr!r}, num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2
    mesh = parallel.make_mesh(dp=4, tp=1)

    class Net(nn.Module):
        fc1: nn.Linear
        fc2: nn.Linear
        def __call__(self, x, ctx=None):
            return self.fc2(jax.nn.relu(self.fc1(x, ctx)), ctx)

    k = jax.random.split(jax.random.PRNGKey(0), 2)
    net = Net(fc1=nn.Linear.create(k[0], 16, 24),
              fc2=nn.Linear.create(k[1], 24, 8))
    net = parallel.replicate(net, mesh)

    rng = np.random.RandomState(0)
    batches_np = [rng.randn(8, 16).astype(np.float32) for _ in range(4)]
    it = iter([parallel.shard_batch(jnp.asarray(b), mesh) for b in batches_np])
    grams, _ = engine.compute_output_grams(net, ["fc1"], it, 4)
    rep = parallel.replicated_sharding(mesh)
    g = np.asarray(jax.device_get(jax.device_put(grams["fc1"], rep)))

    w1 = np.asarray(jax.device_get(jax.device_put(net.fc1.kernel, rep)))
    acc = np.zeros((24, 24), np.float64)
    for b in batches_np:
        y = b @ w1
        acc += (y.T @ y) / y.shape[0]
    acc /= 4
    np.testing.assert_allclose(g, acc, atol=1e-5)
    print(f"proc {{pid}} OK", flush=True)
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_grid_gram_parity(tmp_path):
    addr = f"localhost:{_free_port()}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=REPO, addr=addr))
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=200)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("2-process grid timed out on this host")
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert f"proc {i} OK" in out