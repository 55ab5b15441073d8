import os
import sys
import zlib

import pytest

# Tests run on a virtual 8-device CPU mesh (SURVEY.md §4): multi-chip
# sharding logic is exercised without TPU hardware.  Must be set before jax
# initializes its backends.
os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell may preset axon/tpu
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The jaxtyping pytest plugin imports jax BEFORE this conftest, freezing the
# env-var defaults; jax.config.update still works until a backend initializes.
jax.config.update("jax_platforms", "cpu")

# This environment's CPU backend defaults to bf16-precision matmuls/convs
# (TPU-emulating); exactness tests (full-rank reconstruction < 1e-6, torch
# golden comparison) need true f32 — mirrors the reference tests'
# torch.set_float32_matmul_precision("highest").
jax.config.update("jax_default_matmul_precision", "highest")
# Async dispatch has been observed to deadlock on this single-core box.
jax.config.update("jax_cpu_enable_async_dispatch", False)

# torch (CPU wheel, used for .pt interop) and XLA deadlock when both spin up
# OpenMP thread pools on this single-core box; pin torch to one thread.
try:
    import torch

    torch.set_num_threads(1)
except ImportError:
    torch = None


@pytest.fixture(autouse=True)
def _seed_torch_rng(request):
    """Pin torch's GLOBAL RNG per test, keyed on the test id.

    The torch-pairing parity tests construct live HF/torch oracles whose
    random weights otherwise come from wherever the previous test left
    the global stream — so a test's weights (and thus its numerical
    margins, e.g. near MoE routing-selection ties) depended on SUITE
    ORDER.  Seeding per test makes every run of a test see identical
    weights, whether it runs alone or in the full suite."""
    if torch is not None:
        torch.manual_seed(zlib.crc32(request.node.nodeid.encode()))
