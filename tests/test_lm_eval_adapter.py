"""lm_eval adapter (apps/trainer_llm/lm_eval_adapter.py): scoring-core
correctness against a direct numpy computation, rolling-window semantics,
offline named-task snapshot resolution, and the live lm_eval wiring
exercised through a mock lm_eval module (the real package is absent in
this image; reference integration point:
/root/reference/examples/trainer_llm/metrics.py:81-107)."""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apps.trainer_llm import metrics
from apps.trainer_llm.builder import ByteTokenizer
from apps.trainer_llm.lm_eval_adapter import (
    resolve_offline_task,
    rolling_nll,
    score_pairs,
)
from ptdeco_tpu import models
from ptdeco_tpu.models.transformer import TransformerConfig


@pytest.fixture(scope="module")
def model():
    return models.CausalLM.create(jax.random.PRNGKey(0), TransformerConfig.tiny())


@pytest.fixture(scope="module")
def tokenizer():
    return ByteTokenizer(256)


def _direct_ll(model, ctx, cont):
    """Reference computation: full-precision log-softmax over the whole
    sequence, summed over continuation positions."""
    ids = np.asarray(ctx + cont, np.int32)[None, :]
    logits = np.asarray(
        model({"input_ids": jnp.asarray(ids),
               "attention_mask": jnp.ones_like(jnp.asarray(ids))}),
        np.float32,
    )[0]
    logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    logp = np.asarray(logp)
    total = 0.0
    n = len(ctx) + len(cont)
    for pos in range(len(ctx), n):
        total += logp[pos - 1, ids[0, pos]]
    return total


def test_score_pairs_matches_direct(model):
    pairs = [
        ([5, 6, 7], [8, 9]),
        ([1], [2, 3, 4, 5]),
        ([10, 11, 12, 13, 14], [15]),
    ]
    got = score_pairs(model, pairs, max_len=64, batch_size=2)
    for (ll, _), (ctx, cont) in zip(got, pairs):
        np.testing.assert_allclose(ll, _direct_ll(model, ctx, cont), atol=2e-3)


def test_score_pairs_greedy_flag(model):
    """is_greedy must be True exactly when the continuation is the argmax
    decode under teacher forcing."""
    ctx = [5, 6, 7]
    ids = np.asarray(ctx, np.int32)[None, :]
    logits = np.asarray(
        model({"input_ids": jnp.asarray(ids),
               "attention_mask": jnp.ones_like(jnp.asarray(ids))}),
        np.float32,
    )[0]
    greedy_next = int(np.argmax(logits[-1]))
    (ll_g, is_g), (ll_b, is_b) = score_pairs(
        model,
        [(ctx, [greedy_next]), (ctx, [(greedy_next + 1) % 256])],
        max_len=64,
    )
    assert is_g is True
    assert is_b is False
    assert ll_g > ll_b


def test_rolling_nll_windows(model):
    """Windowed rolling NLL must equal the single-window score when the
    doc fits, and must score every token exactly once when it does not."""
    doc = list(range(3, 20))
    single = rolling_nll(model, doc, prefix_token=0, max_len=64)
    (expect, _), = score_pairs(model, [([0], doc)], max_len=64, batch_size=1)
    np.testing.assert_allclose(single, expect, atol=2e-3)

    # force 3 windows; total token count scored must still be len(doc)
    multi = rolling_nll(model, doc, prefix_token=0, max_len=8)
    assert np.isfinite(multi)
    # windows of 7 tokens: [0..6], [7..13], [14..16] — scores differ from
    # the single window (shorter contexts) but must be in a sane range
    assert multi == pytest.approx(single, rel=0.5)


def test_named_task_offline_snapshot(model, tokenizer):
    assert resolve_offline_task("synthetic_copy") is not None
    assert resolve_offline_task("no_such_task_xyz") is None
    res = metrics.calc_lm_eval_metrics(model, tokenizer, ["synthetic_copy"])
    assert res is not None and "synthetic_copy" in res
    assert 0.0 <= res["synthetic_copy"]["acc"] <= 1.0


def test_named_task_via_mock_lm_eval(model, tokenizer, monkeypatch):
    """With lm_eval importable, unresolved named tasks go through
    simple_evaluate over our LM adapter; the mock drives loglikelihood and
    loglikelihood_rolling through the adapter end-to-end."""

    class _Req:
        def __init__(self, *args):
            self.args = args

    calls = {}

    def simple_evaluate(model=None, tasks=None):
        lls = model.loglikelihood(
            [_Req("alpha alpha ", "alpha"), _Req("alpha alpha ", "bravo")]
        )
        roll = model.loglikelihood_rolling([_Req("charlie charlie charlie")])
        gens = model.generate_until(
            [_Req("alpha alpha ", {"until": ["\n"], "max_gen_toks": 3})]
        )
        calls["lls"] = lls
        calls["roll"] = roll
        calls["gen"] = gens
        return {
            "results": {t: {"acc": 0.5, "n": 2} for t in tasks},
        }

    lm_eval_mod = types.ModuleType("lm_eval")
    lm_eval_mod.simple_evaluate = simple_evaluate
    api_mod = types.ModuleType("lm_eval.api")
    model_mod = types.ModuleType("lm_eval.api.model")

    class LM:
        pass

    model_mod.LM = LM
    api_mod.model = model_mod
    lm_eval_mod.api = api_mod
    monkeypatch.setitem(sys.modules, "lm_eval", lm_eval_mod)
    monkeypatch.setitem(sys.modules, "lm_eval.api", api_mod)
    monkeypatch.setitem(sys.modules, "lm_eval.api.model", model_mod)

    res = metrics.calc_lm_eval_metrics(model, tokenizer, ["mock_task"])
    assert res == {"mock_task": {"acc": 0.5, "n": 2}}
    (ll_a, _), (ll_b, _) = calls["lls"]
    assert np.isfinite(ll_a) and np.isfinite(ll_b)
    assert np.isfinite(calls["roll"][0])
    assert isinstance(calls["gen"][0], str)  # generate_until path driven