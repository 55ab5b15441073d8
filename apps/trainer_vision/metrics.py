"""Vision metrics (reference /root/reference/examples/trainer_vision/metrics.py:
top-1 accuracy over a pipeline, under a single jitted eval step)."""

from __future__ import annotations

import logging
import time
from typing import Any, Iterable

import jax
import jax.numpy as jnp

from ptdeco_tpu import nn

logger = logging.getLogger(__name__)


@jax.jit
def _acc_step(model: nn.Module, inputs: jax.Array, targets: jax.Array):
    logits = model(inputs)
    pred = jnp.argmax(logits, axis=-1)
    true = jnp.argmax(targets, axis=-1)
    return jnp.sum(pred == true), pred.shape[0]


def calc_accuracy(
    model: nn.Module, pipeline: Iterable[dict[str, Any]], max_batches=None
) -> float:
    t0 = time.perf_counter()
    correct, total = 0.0, 0
    for i, batch in enumerate(pipeline):
        if max_batches is not None and i >= max_batches:
            break
        c, n = _acc_step(model, jnp.asarray(batch["inputs"]), jnp.asarray(batch["targets"]))
        correct += float(c)
        total += int(n)
    acc = correct / max(total, 1)
    logger.info(
        f"accuracy={acc:.4f} over {total} samples "
        f"({time.perf_counter() - t0:.1f}s)"
    )
    return acc
