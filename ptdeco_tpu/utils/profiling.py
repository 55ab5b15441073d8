"""Profiling / tracing utilities.

The reference has no profiler integration — only perf_counter timing and
GPU reserved-memory logging (SURVEY.md §5; dwain:700,797-799,
utils/common.py:46-55).  TPU equivalents here:

  * ``timed`` — perf_counter block timer that blocks on device work so the
    measurement is honest under async dispatch;
  * ``trace`` — jax.profiler trace context (view with TensorBoard/XProf);
  * ``static_flops`` — forward-pass FLOPs from XLA's compiled cost analysis
    (replaces fvcore's MACs x2, trainer_vision/builder.py:13-37);
  * ``device_memory_gb`` — live HBM usage where the backend reports it.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Any, Callable, Iterator, Optional

import jax

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def timed(label: str, result: Optional[Any] = None) -> Iterator[dict]:
    """Context timer; pass the output pytree via ``out['result'] = ...`` or
    the ``result`` arg to block on it before stopping the clock."""
    out: dict[str, Any] = {"result": result}
    t0 = time.perf_counter()
    try:
        yield out
    finally:
        if out.get("result") is not None:
            jax.block_until_ready(out["result"])
        out["seconds"] = time.perf_counter() - t0
        logger.info(f"{label}: {out['seconds']:.3f}s")


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """jax.profiler trace (TensorBoard / xprof viewable)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info(f"Profile written to {log_dir}")


def static_flops(fn: Callable, *args: Any) -> float:
    """Total FLOPs of jit(fn)(*args) from the compiled cost analysis."""
    cost = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float(cost.get("flops", 0.0))


def device_memory_gb() -> float:
    from .common import get_device_memory_gb

    return get_device_memory_gb()


def _unused_device_memory_gb() -> float:  # pragma: no cover - replaced
    total = 0
    for d in jax.local_devices():
        try:
            stats = d.memory_stats()
            if stats:
                total += stats.get("bytes_in_use", 0)
        except Exception:  # pragma: no cover - backend dependent
            pass
    return total / 1024**3
