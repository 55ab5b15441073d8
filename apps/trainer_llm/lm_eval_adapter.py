"""EleutherAI lm-evaluation-harness adapter for our JAX CausalLM.

The reference calls ``lm_eval.simple_evaluate`` with an HF torch model
(/root/reference/examples/trainer_llm/metrics.py:81-107).  Our models are
(pytree, apply_fn) pairs, so this module provides:

  * the SCORING CORE (`score_pairs`, `rolling_nll`) — plain functions over
    token-id lists, jitted per padded shape, importable and testable
    without lm_eval;
  * `PtdecoTpuLM` — an ``lm_eval.api.model.LM`` subclass built on that
    core, constructed lazily so the module imports fine when lm_eval is
    absent (this image does not ship it);
  * an OFFLINE named-task registry: ``<tasks_dir>/<task>.jsonl`` snapshots
    (export real task data with aux/make_task_snapshots.py on a machine
    with lm_eval + network, check them in, and named tasks evaluate
    offline through eval_harness).
"""

from __future__ import annotations

import functools
import logging
import os
import pathlib
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ptdeco_tpu import nn

logger = logging.getLogger(__name__)

TASKS_DIR_ENV = "PTDECO_TPU_LM_EVAL_TASKS_DIR"
DEFAULT_TASKS_DIR = pathlib.Path(__file__).parent / "tasks"


# ---------------------------------------------------------------------------
# Scoring core (no lm_eval dependency)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=1)
def _score_step_factory():
    # cached: a fresh jit closure per call would recompile the full model
    # forward per scored batch shape AND per call site (rolling_nll calls
    # score_pairs once per window)
    @jax.jit
    def step(model: nn.Module, ids, cont_mask, attn_mask):
        logits = model({"input_ids": ids, "attention_mask": attn_mask})
        logits = logits[:, :-1].astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        targets = ids[:, 1:]
        tok_lp = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        mask = cont_mask[:, 1:]
        ll = jnp.sum(tok_lp * mask, axis=-1)
        greedy = jnp.argmax(logits, axis=-1) == targets
        is_greedy = jnp.all(jnp.where(mask > 0, greedy, True), axis=-1)
        return ll, is_greedy

    return step


def _pad_pow2(n: int, lo: int = 64) -> int:
    m = lo
    while m < n:
        m *= 2
    return m


def score_pairs(
    model: nn.Module,
    pairs: Sequence[tuple[list[int], list[int]]],
    max_len: int = 2048,
    batch_size: int = 8,
) -> list[tuple[float, bool]]:
    """lm_eval ``loglikelihood`` semantics for (context_ids,
    continuation_ids) pairs: total continuation log-prob under teacher
    forcing, plus whether the continuation is the greedy decode.  Sequences
    are truncated LEFT to ``max_len`` (keeping the full continuation when
    possible, like lm_eval's HFLM)."""
    step = _score_step_factory()
    out: list[tuple[float, bool]] = [(0.0, False)] * len(pairs)
    order = sorted(range(len(pairs)), key=lambda i: -(len(pairs[i][0]) + len(pairs[i][1])))
    for start in range(0, len(order), batch_size):
        sel = order[start : start + batch_size]
        longest = max(len(pairs[i][0]) + len(pairs[i][1]) for i in sel)
        # clamp: _pad_pow2 may overshoot a non-power-of-two max_len, which
        # would feed the model sequences past its context length
        pad_len = min(_pad_pow2(min(longest, max_len)), max_len)
        ids = np.zeros((batch_size, pad_len), np.int32)
        cont = np.zeros((batch_size, pad_len), np.float32)
        attn = np.zeros((batch_size, pad_len), np.int32)
        for bi, i in enumerate(sel):
            ctx, c = pairs[i]
            seq = (list(ctx) + list(c))[-pad_len:]
            cont_len = min(len(c), len(seq) - 1)  # ≥1 context token stays
            ids[bi, : len(seq)] = seq
            attn[bi, : len(seq)] = 1
            cont[bi, len(seq) - cont_len : len(seq)] = 1.0
        ll, greedy = step(
            model, jnp.asarray(ids), jnp.asarray(cont), jnp.asarray(attn)
        )
        ll = np.asarray(ll)
        greedy = np.asarray(greedy)
        for bi, i in enumerate(sel):
            out[i] = (float(ll[bi]), bool(greedy[bi]))
    return out


def rolling_nll(
    model: nn.Module,
    token_ids: list[int],
    prefix_token: int,
    max_len: int = 2048,
) -> float:
    """lm_eval ``loglikelihood_rolling`` semantics: total log-likelihood of
    a whole document, every token scored exactly once, in windows of
    ``max_len`` each prefixed by the previous window's last token (or
    ``prefix_token`` for the first window)."""
    total = 0.0
    pos = 0
    prev = prefix_token
    while pos < len(token_ids):
        window = token_ids[pos : pos + max_len - 1]
        ctx = [prev]
        (ll, _), = score_pairs(model, [(ctx, window)], max_len=max_len,
                               batch_size=1)
        total += ll
        prev = window[-1]
        pos += len(window)
    return total


# ---------------------------------------------------------------------------
# lm_eval LM subclass (constructed only when lm_eval is importable)
# ---------------------------------------------------------------------------


def make_lm_eval_model(
    model: nn.Module,
    tokenizer: Any,
    max_len: int = 2048,
    batch_size: int = 8,
):
    """Build an lm_eval.api.model.LM wrapping our CausalLM.  Raises
    ImportError when lm_eval is not installed."""
    from lm_eval.api.model import LM

    def _tok(s: str) -> list[int]:
        return tokenizer(s, add_special_tokens=False)["input_ids"]

    prefix_token = getattr(tokenizer, "bos_token_id", None)
    if prefix_token is None:  # explicit: bos_token_id == 0 is a valid id
        prefix_token = getattr(tokenizer, "eos_token_id", None)
    if prefix_token is None:
        prefix_token = 0

    class PtdecoTpuLM(LM):
        def loglikelihood(self, requests) -> list[tuple[float, bool]]:
            pairs = []
            for req in requests:
                context, continuation = req.args
                ctx_ids = _tok(context) if context else [prefix_token]
                pairs.append((ctx_ids, _tok(continuation)))
            return score_pairs(model, pairs, max_len, batch_size)

        def loglikelihood_rolling(self, requests) -> list[float]:
            return [
                rolling_nll(model, _tok(req.args[0]), prefix_token, max_len)
                for req in requests
            ]

        def generate_until(self, requests) -> list[str]:
            outs = []
            for req in requests:
                context, gen_kwargs = req.args
                until = (gen_kwargs or {}).get("until", [])
                max_new = (gen_kwargs or {}).get("max_gen_toks", 128)
                ids = _tok(context)[-(max_len - max_new):]
                text = _greedy_generate(
                    model, tokenizer, ids, max_new, until, max_len
                )
                outs.append(text)
            return outs

    return PtdecoTpuLM()


def _greedy_generate(
    model: nn.Module,
    tokenizer: Any,
    ids: list[int],
    max_new: int,
    until: list[str],
    max_len: int,
) -> str:
    """Greedy decoding, one jitted step per emitted token (adequate for the
    few generate-style tasks; loglikelihood tasks dominate the suites the
    reference runs)."""
    step = _argmax_step_factory()
    out_ids: list[int] = []
    cur = list(ids)
    for _ in range(max_new):
        pad_len = min(_pad_pow2(min(len(cur), max_len)), max_len)
        arr = np.zeros((1, pad_len), np.int32)
        arr[0, : len(cur)] = cur[-pad_len:]
        attn = np.zeros((1, pad_len), np.int32)
        attn[0, : len(cur)] = 1
        nxt = int(step(model, jnp.asarray(arr), len(cur) - 1))
        out_ids.append(nxt)
        cur.append(nxt)
        text = tokenizer.decode(out_ids)
        if any(u in text for u in until):
            for u in until:
                if u in text:
                    text = text.split(u)[0]
            return text
    return tokenizer.decode(out_ids)


@functools.lru_cache(maxsize=1)
def _argmax_step_factory():
    @jax.jit
    def step(model: nn.Module, ids, pos):
        logits = model(
            {"input_ids": ids, "attention_mask": (ids * 0 + 1)}
        )
        return jnp.argmax(logits[0, pos].astype(jnp.float32))

    return step


# ---------------------------------------------------------------------------
# Offline named-task snapshots
# ---------------------------------------------------------------------------


def resolve_offline_task(task: str) -> Optional[pathlib.Path]:
    """A named task resolves offline if ``<tasks_dir>/<task>.jsonl`` exists
    (snapshots exported by aux/make_task_snapshots.py)."""
    tasks_dir = pathlib.Path(os.environ.get(TASKS_DIR_ENV, DEFAULT_TASKS_DIR))
    path = tasks_dir / f"{task}.jsonl"
    return path if path.exists() else None
