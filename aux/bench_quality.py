"""Quality at compression, measured end-to-end on a GENUINELY TRAINED
model (BASELINE.md target tier "Quality at equal compression" — previously
unmeasurable in this zero-egress sandbox because no pretrained weights are
available; this closes the gap with what IS available: local English
prose).

Recipe:
  1. harvest the package-description/docstring prose corpus
     (aux/make_doc_tasks.harvest_paragraphs — the same text the offline
     doc_* eval tasks are built from, split train/held-out here),
  2. train a byte-level CausalLM (4 layers, dim 256, ~6M params) on TPU
     until held-out ppl is far below chance,
  3. dwain-decompose at production-ish thresholds (nsr 0.05,
     trade_off 0.5, min_rank 16) with and without interleaved recovery
     finetuning,
  4. report held-out perplexity + doc_lambada/doc_continuation accuracy
     before and after, with the achieved parameter fraction.

Honesty note: the doc_* task items are built from the SAME corpus the
model trains on (a 6M-param model over 84kB memorizes much of it), so the
task accuracies measure DEGRADATION UNDER COMPRESSION of a capable model,
not held-out generalization; the held-out perplexity (disjoint paragraphs)
is the generalization-grade number.

Persists BENCH_QUALITY.json.  Run on TPU:  python aux/bench_quality.py
(~10-20 min incl. training).
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ptdeco_tpu import dwain, finetune, models
from ptdeco_tpu.utils.cache import enable_compilation_cache

SEQLEN = 256
BATCH = 32
TRAIN_STEPS = 3000
LR = 3e-4
VOCAB = 256
SEED = 0

NSR_THRESHOLD = 0.05
TRADE_OFF = 0.5
MIN_RANK = 16
MAX_PPL_DIFF = 0.1


def corpus() -> tuple[np.ndarray, np.ndarray]:
    """(train_tokens, heldout_tokens) — encoded with the SAME ByteTokenizer
    mapping the offline task harness uses, so task evaluation and training
    share one token space."""
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
    from make_doc_tasks import harvest_paragraphs

    from apps.trainer_llm.builder import ByteTokenizer

    tok = ByteTokenizer(VOCAB)
    paras = harvest_paragraphs()
    rng = np.random.RandomState(SEED)
    order = rng.permutation(len(paras))
    held = set(order[: max(8, len(paras) // 10)].tolist())
    train = "\n\n".join(paras[i] for i in range(len(paras)) if i not in held)
    ho = "\n\n".join(paras[i] for i in range(len(paras)) if i in held)
    return (
        np.asarray(tok(train)["input_ids"], np.int32),
        np.asarray(tok(ho)["input_ids"], np.int32),
    )


def batches_from(tokens: np.ndarray, rng: np.random.RandomState):
    """Infinite random crops of SEQLEN+0 (causal LM batches)."""
    n = len(tokens) - SEQLEN - 1
    while True:
        idx = rng.randint(0, n, BATCH)
        x = np.stack([tokens[i : i + SEQLEN] for i in idx]).astype(np.int32)
        yield {"input_ids": jnp.asarray(x)}


def heldout_batches(tokens: np.ndarray) -> list:
    """Deterministic non-overlapping heldout windows."""
    out = []
    for start in range(0, len(tokens) - SEQLEN - 1, SEQLEN):
        out.append(tokens[start : start + SEQLEN].astype(np.int32))
        if len(out) >= 64:
            break
    arr = np.stack(out)
    return [
        {"input_ids": jnp.asarray(arr[i : i + BATCH])}
        for i in range(0, len(arr), BATCH)
    ]


def eval_ppl(model, batches) -> float:
    @jax.jit
    def nll(model, batch):
        return models.ce_loss(batch, model(batch))

    losses = [float(nll(model, b)) for b in batches]
    return float(np.exp(np.mean(losses)))


def eval_tasks(model) -> dict:
    from apps.trainer_llm import metrics
    from apps.trainer_llm.builder import ByteTokenizer

    res = metrics.calc_lm_eval_metrics(
        model, ByteTokenizer(VOCAB), ["doc_lambada", "doc_continuation"]
    )
    return {k: {"acc": v["acc"], "n": v["n"]} for k, v in res.items()}


def main() -> None:
    import logging

    logging.basicConfig(level=logging.INFO, format="%(message)s")
    enable_compilation_cache()

    train_toks, held_toks = corpus()
    print(f"corpus: train {len(train_toks)/1e3:.0f}kB, heldout {len(held_toks)/1e3:.0f}kB")

    cfg = models.TransformerConfig(
        vocab_size=VOCAB,
        dim=256,
        n_layers=4,
        n_heads=4,
        n_kv_heads=4,
        hidden_dim=1024,
        dtype=jnp.float32,
    )
    model = models.CausalLM.create(jax.random.PRNGKey(SEED), cfg)

    tx = optax.adamw(
        optax.warmup_cosine_decay_schedule(0.0, LR, 100, TRAIN_STEPS)
    )
    opt = tx.init(model)

    @jax.jit
    def step(model, opt, batch):
        loss, grads = jax.value_and_grad(
            lambda m: models.ce_loss(batch, m(batch))
        )(model)
        updates, opt = tx.update(grads, opt, model)
        return optax.apply_updates(model, updates), opt, loss

    it = batches_from(train_toks, np.random.RandomState(1))
    t0 = time.perf_counter()
    for i in range(TRAIN_STEPS):
        model, opt, loss = step(model, opt, next(it))
        if i % 500 == 0:
            print(f"step {i}: loss {float(loss):.3f}")
    jax.block_until_ready(jax.tree_util.tree_leaves(model))
    t_train = time.perf_counter() - t0

    hb = heldout_batches(held_toks)
    ppl0 = eval_ppl(model, hb)
    tasks0 = eval_tasks(model)
    from ptdeco_tpu import utils as _utils

    params0 = _utils.get_num_params(model)
    print(f"trained: heldout ppl {ppl0:.2f} (chance 256), tasks {tasks0}")

    # weight-only int8 serving form on the UNCOMPRESSED model: the
    # quality cost of halving decode HBM traffic, on a genuinely
    # trained model
    from ptdeco_tpu import quant

    q0 = quant.quantize_for_serving(model)
    ppl_q0 = eval_ppl(q0, hb)
    int8_baseline = {
        "heldout_ppl": round(ppl_q0, 3),
        "delta_ppl_vs_fp": round(ppl_q0 - ppl0, 3),
        "tasks": eval_tasks(q0),
    }
    print("int8 baseline", int8_baseline)

    results = {}
    for mode in ("no_ft", "with_ft"):
        ft_fn = None
        if mode == "with_ft":
            ft_it = batches_from(train_toks, np.random.RandomState(2))
            ft_fn = finetune.make_finetune_fn(
                mode="full",
                ft_iterator=ft_it,
                loss_fn=models.ce_loss,
                num_last_modules_to_finetune=8,
                num_steps=40,
                lr=1e-4,
            )
        deco, deco_cfg = dwain.decompose(
            module=model,
            data_iterator=batches_from(train_toks, np.random.RandomState(3)),
            loss_fn=models.ce_loss,
            num_data_steps=16,
            metric_iterator=batches_from(train_toks, np.random.RandomState(4)),
            num_metric_steps=4,
            nsr_final_threshold=NSR_THRESHOLD,
            min_rank=MIN_RANK,
            trade_off_factor=TRADE_OFF,
            reduction_factor=0.5,
            max_accepted_ppl_diff=MAX_PPL_DIFF,
            decompose_in_float64=True,
            blacklisted_module_names=["lm_head"],
            finetune_fn=ft_fn,
        )
        params1 = _utils.get_num_params(deco)
        ppl1 = eval_ppl(deco, hb)
        tasks1 = eval_tasks(deco)
        # low-rank x int8: quantize the decomposed factor pairs too
        ppl_q1 = eval_ppl(quant.quantize_for_serving(deco), hb)
        results[mode] = {
            "n_decomposed": len(deco_cfg),
            "mparams_frac_pct": round(100.0 * params1 / params0, 2),
            "heldout_ppl": round(ppl1, 3),
            "delta_ppl": round(ppl1 - ppl0, 3),
            "tasks": tasks1,
            "int8_heldout_ppl": round(ppl_q1, 3),
            "int8_delta_ppl_vs_fp": round(ppl_q1 - ppl1, 3),
        }
        print(mode, results[mode])

    out = {
        "metric": "quality_at_compression_trained_bytelm",
        "model": "CausalLM dim=256 x4 layers, byte vocab, ~6M params",
        "corpus": "local package/docstring English prose (aux/make_doc_tasks)",
        "note": "doc_* tasks overlap the training corpus: they measure degradation under compression, not generalization; heldout_ppl is the generalization-grade number",
        "train": {
            "steps": TRAIN_STEPS,
            "batch": BATCH,
            "seqlen": SEQLEN,
            "wall_s": round(t_train, 1),
        },
        "thresholds": {
            "nsr_final_threshold": NSR_THRESHOLD,
            "trade_off_factor": TRADE_OFF,
            "min_rank": MIN_RANK,
            "max_accepted_ppl_diff": MAX_PPL_DIFF,
        },
        "baseline": {
            "heldout_ppl": round(ppl0, 3),
            "tasks": tasks0,
            "mparams": round(params0 / 1e6, 3),
        },
        "int8_baseline": int8_baseline,
        "decomposed": results,
        "device": str(jax.devices()[0]),
        "measured_on": time.strftime("%Y-%m-%d"),
    }
    path = pathlib.Path(__file__).resolve().parent.parent / "BENCH_QUALITY.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
