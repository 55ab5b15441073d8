"""LLM metrics: masked perplexity, param count, FLOPs.

Reference: /root/reference/examples/trainer_llm/metrics.py — perplexity over
a dataloader (:38-78), fvcore FLOPs with the MACs x2 correction (:118-141).
TPU equivalents: one jitted eval step reused across batches; static FLOPs
from XLA's compiled cost analysis (no fvcore).
"""

from __future__ import annotations

import functools
import logging
import time
from typing import Any, Iterable, Optional

import jax
import jax.numpy as jnp

from ptdeco_tpu import engine, nn, utils

logger = logging.getLogger(__name__)


@functools.lru_cache(maxsize=4)
def _ppl_step_factory(apply_fn=engine.default_apply):
    # cached by apply_fn: a fresh jit closure per calc_perplexity call
    # would recompile the model eval step for the before/after evals
    @jax.jit
    def step(model: nn.Module, batch: dict[str, jax.Array]):
        logits = apply_fn(model, batch, None)
        labels = batch["input_ids"][:, 1:]
        mask = batch["attention_mask"][:, 1:].astype(jnp.float32)
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
        ll = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        return -jnp.sum(ll * mask), jnp.sum(mask)

    return step


def calc_perplexity(
    model: nn.Module,
    dataloader: Iterable[dict[str, Any]],
    max_batches: Optional[int] = None,
) -> float:
    """exp(total masked NLL / total tokens) over the loader."""
    step = _ppl_step_factory()
    t0 = time.perf_counter()
    nll, ntok = 0.0, 0.0
    for i, batch in enumerate(dataloader):
        if max_batches is not None and i >= max_batches:
            break
        b_nll, b_n = step(model, batch)
        nll += float(b_nll)
        ntok += float(b_n)
    if ntok == 0:
        raise ValueError(
            "calc_perplexity saw zero tokens: empty dataloader "
            "(batch_size > nsamples, or max_batches=0?)"
        )
    ppl = float(jnp.exp(nll / ntok))
    logger.info(
        f"Perplexity = {ppl:.4f} over {ntok:.0f} tokens "
        f"({time.perf_counter() - t0:.1f}s)"
    )
    return ppl


def get_params_m(model: nn.Module) -> float:
    return utils.get_num_params(model) / 1.0e6


def get_giga_flops(
    model: nn.Module,
    batch: dict[str, Any],
    apply_fn=engine.default_apply,
) -> float:
    """Static forward GFLOPs from XLA cost analysis (replaces fvcore MACs x2,
    reference metrics.py:118-141)."""
    lowered = jax.jit(lambda m, b: apply_fn(m, b, None)).lower(model, batch)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    return flops / 1.0e9


def calc_lm_eval_metrics(
    model: nn.Module, tokenizer: Any, tasks: list[str]
) -> Optional[dict[str, Any]]:
    """Task-suite evaluation (reference metrics.py:81-107 shells out to
    EleutherAI's lm_eval).  Resolution order per task:

      1. a literal ``.jsonl`` path -> the built-in offline loglikelihood
         harness (eval_harness.py);
      2. a named task with a bundled snapshot
         (``apps/trainer_llm/tasks/<name>.jsonl``, see
         aux/make_task_snapshots.py) -> same offline harness;
      3. a named task with ``lm_eval`` installed -> ``simple_evaluate``
         over the JAX LM adapter (lm_eval_adapter.make_lm_eval_model);
      4. otherwise the task is skipped with a warning."""
    from . import eval_harness, lm_eval_adapter

    results: dict[str, Any] = {}
    named: list[str] = []
    for task in tasks:
        if task.endswith(".jsonl"):
            rows = eval_harness.load_task(task)
            results[task] = eval_harness.evaluate_loglikelihood_task(
                model, tokenizer, rows
            )
            continue
        snapshot = lm_eval_adapter.resolve_offline_task(task)
        if snapshot is not None:
            logger.info(f"Evaluating {task} from offline snapshot {snapshot}")
            rows = eval_harness.load_task(str(snapshot))
            results[task] = eval_harness.evaluate_loglikelihood_task(
                model, tokenizer, rows
            )
        else:
            named.append(task)
    if named:
        try:
            import lm_eval

            lm = lm_eval_adapter.make_lm_eval_model(model, tokenizer)
            ev = lm_eval.simple_evaluate(model=lm, tasks=named)
            if ev is not None:
                for task, res in ev.get("results", {}).items():
                    results[task] = res
        except ImportError:
            logger.warning(
                f"lm_eval not installed and no offline snapshot for "
                f"{named}; skipping (export snapshots with "
                "aux/make_task_snapshots.py)"
            )
    return results or None
