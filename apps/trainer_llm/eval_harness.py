"""Offline zero-shot evaluation harness (lm_eval-style loglikelihood tasks).

The reference shells out to EleutherAI's lm_eval
(/root/reference/examples/trainer_llm/metrics.py:81-107), which is not in
this image and needs network access for task data.  This harness implements
the core mechanism lm_eval uses for multiple-choice tasks — rank answer
choices by total continuation log-likelihood — over local JSONL task files:

    {"query": "...", "choices": ["...", "..."], "gold": 0}

Reports acc (argmax loglik) and acc_norm (loglik / continuation byte length,
lm_eval's normalization).  Scoring runs as one jitted step over padded
batches.
"""

from __future__ import annotations

import json
import logging
import pathlib
from typing import Any, Sequence

import numpy as np

from ptdeco_tpu import nn

logger = logging.getLogger(__name__)

__all__ = ["load_task", "evaluate_loglikelihood_task"]


def load_task(path: str) -> list[dict[str, Any]]:
    rows = []
    for line in pathlib.Path(path).read_text().splitlines():
        if line.strip():
            rows.append(json.loads(line))
    return rows


def evaluate_loglikelihood_task(
    model: nn.Module,
    tokenizer: Any,
    rows: Sequence[dict[str, Any]],
    max_len: int = 256,
    batch_size: int = 8,
) -> dict[str, float]:
    """Accuracy of gold-choice ranking by continuation log-likelihood."""
    # scoring delegates to the lm_eval adapter's core (one implementation
    # of the left-truncate/mask/teacher-forcing subtleties for both the
    # offline and the lm_eval paths)
    from .lm_eval_adapter import score_pairs

    pairs: list[tuple[list[int], list[int]]] = []
    meta: list[tuple[int, int, int]] = []  # (row_idx, choice_idx, byte_len)
    for ri, row in enumerate(rows):
        q_ids = tokenizer(row["query"], add_special_tokens=False)["input_ids"]
        for ci, choice in enumerate(row["choices"]):
            c_ids = tokenizer(choice, add_special_tokens=False)["input_ids"]
            pairs.append((list(q_ids), list(c_ids)))
            meta.append((ri, ci, max(len(choice.encode()), 1)))

    results = score_pairs(model, pairs, max_len=max_len, batch_size=batch_size)
    scores: dict[tuple[int, int], tuple[float, int]] = {}
    for (ri, ci, nbytes), (ll, _) in zip(meta, results):
        scores[(ri, ci)] = (ll, nbytes)

    correct = correct_norm = 0
    for ri, row in enumerate(rows):
        lls = [scores[(ri, ci)] for ci in range(len(row["choices"]))]
        pred = int(np.argmax([s for s, _ in lls]))
        pred_norm = int(np.argmax([s / nb for s, nb in lls]))
        correct += pred == row["gold"]
        correct_norm += pred_norm == row["gold"]
    n = max(len(rows), 1)
    res = {"acc": correct / n, "acc_norm": correct_norm / n, "n": float(n)}
    logger.info(f"zero-shot eval: {res}")
    return res
