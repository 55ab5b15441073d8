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
