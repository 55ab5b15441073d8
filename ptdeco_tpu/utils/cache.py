"""Persistent XLA compilation cache helper.

dwain's whole-model loop recompiles its metric/gram programs whenever the
model structure changes (a site becomes a factor pair).  Sites with equal
shapes lower to identical HLO, so the persistent cache dedupes those
compilations across sites AND across runs — a large win for the many-layer
LLM configs (the reference, eager torch, has no compile cost to amortize)."""

from __future__ import annotations

import logging
import os

import jax

logger = logging.getLogger(__name__)


def enable_compilation_cache(path: str = "") -> None:
    path = path or os.environ.get(
        "PTDECO_TPU_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".cache", "xla"),
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        logger.info(f"XLA compilation cache at {path}")
    except Exception as e:  # pragma: no cover - config name drift
        logger.warning(f"Could not enable compilation cache: {e}")
