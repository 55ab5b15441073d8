"""Optional TensorBoard scalar emission (reference TensorboardCallBack,
run_decompose_lockd.py:84-131, and KdClassificationModel's writer,
run_finetune.py:107-133).  metrics.jsonl remains the primary sink; this
mirrors the per-layer scalars into tensorboard event files when
``tensorboard: true`` is configured and torch's writer is importable
(torch is a host-side dependency only — the writer never touches JAX
arrays, callers pass floats)."""

from __future__ import annotations

import logging
import pathlib
from typing import Any, Mapping, Optional

logger = logging.getLogger(__name__)


class TBWriter:
    """SummaryWriter wrapper that degrades to a no-op when torch (or the
    tensorboard package) is unavailable."""

    def __init__(self, log_dir: pathlib.Path, enabled: bool) -> None:
        self._w: Optional[Any] = None
        if not enabled:
            return
        try:
            import torch

            torch.set_num_threads(1)  # JAX+multithreaded-torch deadlocks
            from torch.utils.tensorboard import SummaryWriter

            self._w = SummaryWriter(log_dir=str(log_dir))
            logger.info(f"TensorBoard events -> {log_dir}")
        except Exception as e:  # noqa: BLE001 - optional dependency
            logger.warning(f"tensorboard writer unavailable: {e}")

    def scalars(self, step: int, values: Mapping[str, float]) -> None:
        if self._w is None:
            return
        for tag, v in values.items():
            self._w.add_scalar(tag, v, step)

    def close(self) -> None:
        if self._w is not None:
            self._w.flush()
            self._w.close()
