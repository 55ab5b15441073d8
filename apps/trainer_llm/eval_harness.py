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

import jax
import jax.numpy as jnp
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


def _score_step_factory():
    @jax.jit
    def step(model: nn.Module, ids: jax.Array, cont_mask: jax.Array,
             attn_mask: jax.Array):
        logits = model({"input_ids": ids, "attention_mask": attn_mask})
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
        tok_lp = jnp.take_along_axis(logp, ids[:, 1:, None], axis=-1)[..., 0]
        return jnp.sum(tok_lp * cont_mask[:, 1:], axis=-1)

    return step


def evaluate_loglikelihood_task(
    model: nn.Module,
    tokenizer: Any,
    rows: Sequence[dict[str, Any]],
    max_len: int = 256,
    batch_size: int = 8,
) -> dict[str, float]:
    """Accuracy of gold-choice ranking by continuation log-likelihood."""
    requests = []  # (row_idx, choice_idx, ids, cont_len, byte_len)
    for ri, row in enumerate(rows):
        q_ids = tokenizer(row["query"], add_special_tokens=False)["input_ids"]
        for ci, choice in enumerate(row["choices"]):
            c_ids = tokenizer(choice, add_special_tokens=False)["input_ids"]
            ids = (list(q_ids) + list(c_ids))[-max_len:]
            cont_len = min(len(c_ids), len(ids))
            requests.append(
                (ri, ci, ids, cont_len, max(len(choice.encode()), 1))
            )

    step = _score_step_factory()
    scores: dict[tuple[int, int], tuple[float, int]] = {}
    for start in range(0, len(requests), batch_size):
        chunk = requests[start : start + batch_size]
        pad = batch_size - len(chunk)
        ids_arr = np.zeros((batch_size, max_len), np.int32)
        cont = np.zeros((batch_size, max_len), np.float32)
        attn = np.zeros((batch_size, max_len), np.int32)
        for bi, (_, _, ids, cont_len, _) in enumerate(chunk):
            # left-align; mask the continuation tail
            ids_arr[bi, : len(ids)] = ids
            attn[bi, : len(ids)] = 1
            cont[bi, len(ids) - cont_len : len(ids)] = 1.0
        lls = np.asarray(
            step(model, jnp.asarray(ids_arr), jnp.asarray(cont),
                 jnp.asarray(attn))
        )
        for bi, (ri, ci, _, _, nbytes) in enumerate(chunk):
            scores[(ri, ci)] = (float(lls[bi]), nbytes)
        del pad

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
