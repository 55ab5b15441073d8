"""Offline loglikelihood harness: a deterministic next-token model must rank
its own preferred continuation first."""

import jax
import jax.numpy as jnp

from apps.trainer_llm.eval_harness import evaluate_loglikelihood_task
from ptdeco_tpu import nn


class IncrementLM(nn.Module):
    """Puts all probability mass on token (prev + 1) mod vocab."""

    table: jax.Array  # dummy param so the pytree is non-empty
    vocab: int = nn.static_field(default=32)

    def __call__(self, batch, ctx=None):
        ids = batch["input_ids"]
        nxt = (ids + 1) % self.vocab
        return 20.0 * jax.nn.one_hot(nxt, self.vocab)


class IdTokenizer:
    def __call__(self, text, add_special_tokens=False):
        return {"input_ids": [int(t) for t in text.split()]}


def test_harness_ranks_consistent_continuation_first():
    model = IncrementLM(table=jnp.zeros((1,)), vocab=32)
    rows = [
        {"query": "1 2 3", "choices": ["4 5 6", "9 9 9"], "gold": 0},
        {"query": "7 8", "choices": ["1 1", "9 10"], "gold": 1},
        {"query": "5", "choices": ["6 7 8 9", "6 9"], "gold": 0},
    ]
    res = evaluate_loglikelihood_task(
        model, IdTokenizer(), rows, max_len=16, batch_size=4
    )
    assert res["acc"] == 1.0
    assert res["n"] == 3.0
    assert 0.0 <= res["acc_norm"] <= 1.0
