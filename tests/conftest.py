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


# ---------------------------------------------------------------------------
# Suite tiering (VERDICT r3 #9): `-m quick` is the ~5-minute core-contract
# subset (decomposition engine + algorithms, module system, serving, mesh
# shardings, checkpoint/compat contracts); everything else — the live-torch
# parity sweeps, CLI e2e drives, multi-process tests — is `full`.  Run
# `make test-quick` per change, the full suite nightly/per-round.
_QUICK_MODULES = {
    "test_aux_tools",
    "test_block_pruning",
    "test_compat_reference",
    "test_deco_primitives_dwain",
    "test_deco_primitives_falor",
    "test_dwain_deferred",
    "test_dwain_e2e",
    "test_dwain_resume",
    "test_example_configs",
    "test_falor_e2e",
    "test_fuse",
    "test_lockd",
    "test_moe_stack",
    "test_nn_module",
    "test_parallel",
    "test_pipeline",
    "test_quant",
    "test_randomized_evd",
    "test_serving_batcher",
    "test_statedict_bf16",
    "test_tp_decompose",
    "test_train_ckpt",
    "test_transformer",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.nodeid.split("::", 1)[0].rsplit("/", 1)[-1]
        mod = mod.removesuffix(".py")
        item.add_marker(
            pytest.mark.quick if mod in _QUICK_MODULES else pytest.mark.full
        )


@pytest.fixture(autouse=True)
def _guard_leaked_trace(request):
    """Fail the POISONING test when a jax trace leaks (VERDICT r3 #8).

    One round-3 full-suite run failed 25 tests from one point onward with
    the same signature: eager ops suddenly saw stale ``JitTracer``s and
    pjit cache lookups crashed comparing tracer metadata — i.e. some
    earlier test (or a background thread racing the process-global trace
    context) left ``jax.core.trace_ctx`` below top level and poisoned the
    jit cache.  This guard converts that cascade into a ONE-test,
    root-cause-naming failure: after each test, if the trace state is not
    clean, reset it, drop the (possibly tracer-keyed) compilation caches
    so subsequent tests run unpoisoned, and fail the test that leaked."""
    yield
    import jax._src.core as _core

    if not _core.trace_state_clean():
        leaked = repr(_core.trace_ctx.trace)
        _core.reset_trace_state()
        jax.clear_caches()
        pytest.fail(
            f"leaked jax trace state after this test: trace_ctx held "
            f"{leaked} instead of the top-level EvalTrace.  This is the "
            f"poisoning event behind the round-3 cascade flake "
            f"(NOTES_ROUND3.md); caches were cleared so later tests are "
            f"unaffected."
        )


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
