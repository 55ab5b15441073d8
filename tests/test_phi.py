"""Phi-2 family: forward, sites, dwain on a tiny phi, config round-trip."""

import jax
import jax.numpy as jnp
import numpy as np

from ptdeco_tpu import dwain, engine, models, utils


def tiny_phi(key=0):
    cfg = models.PhiConfig.tiny(vocab_size=96)
    return models.PhiCausalLM.create(jax.random.PRNGKey(key), cfg), cfg


def batch_iter(key, bs=2, s=12, vocab=96):
    while True:
        key, sub = jax.random.split(key)
        yield {
            "input_ids": jax.random.randint(sub, (bs, s), 0, vocab),
            "attention_mask": jnp.ones((bs, s), jnp.int32),
        }


def test_phi_forward_and_sites():
    model, cfg = tiny_phi()
    b = next(batch_iter(jax.random.PRNGKey(0)))
    logits = jax.jit(lambda m, b: m(b))(model, b)
    assert logits.shape == (2, 12, 96)
    assert np.isfinite(float(models.ce_loss(b, logits)))
    names = engine.get_decomposeable_submodule_names(model)
    assert "model.layers.0.self_attn.dense" in names
    assert "model.layers.1.mlp.fc1" in names
    # 2 layers * 6 projections + lm_head
    assert len(names) == 2 * 6 + 1


def test_phi_dwain_roundtrip():
    model, cfg = tiny_phi()
    names = engine.get_decomposeable_submodule_names(model)
    keep = {"model.layers.0.mlp.fc1"}
    blacklist = [n for n in names if n not in keep]
    new_model, config = dwain.decompose(
        module=model,
        data_iterator=batch_iter(jax.random.PRNGKey(1)),
        loss_fn=models.ce_loss,
        num_data_steps=2,
        metric_iterator=batch_iter(jax.random.PRNGKey(2)),
        num_metric_steps=1,
        nsr_final_threshold=1e9,
        blacklisted_module_names=blacklist,
        min_rank=4,
        trade_off_factor=1e9,
        max_accepted_ppl_diff=1e9,
    )
    assert set(config.keys()) == keep
    # the biased fc1: factor pair carries the bias on the second factor
    entry = config["model.layers.0.mlp.fc1"]
    assert entry["modules"]["0"]["bias"] is False
    assert entry["modules"]["1"]["bias"] is True

    sd = utils.state_dict(new_model)
    model2, _ = tiny_phi(key=9)
    model2 = utils.apply_decompose_config(model2, config)
    model2 = utils.load_state_dict(model2, sd)
    b = next(batch_iter(jax.random.PRNGKey(3)))
    np.testing.assert_allclose(
        np.asarray(new_model(b)), np.asarray(model2(b)), atol=2e-5
    )


def test_phi_decompose_via_cli(tmp_path):
    """phi family end-to-end through the trainer CLI driver (reference
    headline workload decompose_dwain_phi2.yaml, scaled to phi-tiny), with
    gradient checkpointing (remat) enabled — VERDICT item 7."""
    import json

    from apps.trainer_llm import run_decompose_dwain

    data = tmp_path / "data.jsonl"
    rows = [
        {"text": " ".join(["token"] * 30)},
        {"text": " ".join(["words go here"] * 12)},
    ] * 16
    data.write_text("\n".join(json.dumps(r) for r in rows))

    cfg = dict(
        task="decompose_dwain",
        decomposed_model_name="phi-tiny",
        decomposed_model_dtype="float32",
        decomposed_model_enable_gradient_checkpointing=True,
        decomposition_data_name=str(data),
        decomposition_data_separator="\n\n",
        decomposition_data_max_length=32,
        decomposition_data_batch_size=2,
        perplexity_data_name=str(data),
        perplexity_data_separator="",
        perplexity_data_max_length=32,
        perplexity_data_batch_size=2,
        num_data_steps=2,
        num_metric_steps=1,
        trade_off_factor=1000.0,
        reduction_factor=0.5,
        max_accepted_ppl_diff=1.0,
        nsr_final_threshold=0.9,
        min_rank=2,
        decompose_in_float64=True,
        blacklisted_modules=["lm_head"],
        finetuning_run=False,
        finetuning_use_lora=False,
    )
    out = tmp_path / "out"
    run_decompose_dwain.main(cfg, out)
    summary = json.loads((out / "summary.json").read_text())
    assert summary["mparams_frac"] < 100.0  # percent (reference convention)
    config = json.loads((out / "decompose_config.json").read_text())
    assert len(config) >= 1

    # reload through the public API onto a fresh phi
    model2, _ = tiny_phi()
    model2 = utils.apply_decompose_config(model2, config)
    sd = utils.load_state_dict_pt(str(out / "decompose_state_dict.pt"))
    model2 = utils.load_state_dict(model2, sd)
    b = next(batch_iter(jax.random.PRNGKey(3)))
    assert np.all(np.isfinite(np.asarray(model2(b))))


def test_phi_remat_matches_no_remat():
    """remat must be numerically transparent on the phi forward/backward."""
    model, cfg = tiny_phi()
    model_r = model.replace(model=model.model.replace(remat=True))
    b = next(batch_iter(jax.random.PRNGKey(1)))

    def loss(m):
        return jnp.mean(jnp.square(m(b).astype(jnp.float32)))

    l1, g1 = jax.value_and_grad(loss)(model)
    l2, g2 = jax.value_and_grad(loss)(model_r)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    flat1 = jax.tree_util.tree_leaves(g1)
    flat2 = jax.tree_util.tree_leaves(g2)
    for a, c in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-5)
