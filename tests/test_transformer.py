"""Flagship CausalLM: forward, loss, dwain decomposition, TP shardings, and
the driver entry points."""

import jax
import jax.numpy as jnp
import numpy as np

from ptdeco_tpu import dwain, engine, models, nn, parallel, utils
from ptdeco_tpu.parallel import shardings as sh


def tiny_model(key=0):
    cfg = models.TransformerConfig.tiny(vocab_size=128)
    return models.CausalLM.create(jax.random.PRNGKey(key), cfg), cfg


def batch_iter(key, bs=2, s=16, vocab=128):
    while True:
        key, sub = jax.random.split(key)
        ids = jax.random.randint(sub, (bs, s), 0, vocab)
        yield {"input_ids": ids, "attention_mask": jnp.ones((bs, s), jnp.int32)}


def test_forward_and_loss():
    model, cfg = tiny_model()
    b = next(batch_iter(jax.random.PRNGKey(0)))
    logits = jax.jit(lambda m, b: m(b))(model, b)
    assert logits.shape == (2, 16, 128)
    loss = models.ce_loss(b, logits)
    assert np.isfinite(float(loss))
    # untrained model: loss near log(vocab)
    assert abs(float(loss) - np.log(128)) < 1.0


def test_site_discovery_names():
    model, cfg = tiny_model()
    names = engine.get_decomposeable_submodule_names(model)
    assert "model.layers.0.self_attn.q_proj" in names
    assert "model.layers.1.mlp.down_proj" in names
    assert "lm_head" in names
    # 2 layers * 7 projections + lm_head
    assert len(names) == 2 * 7 + 1


def test_dwain_on_transformer_and_roundtrip():
    model, cfg = tiny_model()
    names = engine.get_decomposeable_submodule_names(model)
    keep = {"model.layers.1.mlp.up_proj", "model.layers.1.self_attn.q_proj"}
    blacklist = [n for n in names if n not in keep]

    data_it = batch_iter(jax.random.PRNGKey(1))
    metric_it = batch_iter(jax.random.PRNGKey(2))
    new_model, config = dwain.decompose(
        module=model,
        data_iterator=data_it,
        loss_fn=models.ce_loss,
        num_data_steps=2,
        metric_iterator=metric_it,
        num_metric_steps=1,
        nsr_final_threshold=1e9,  # force acceptance: exercise the machinery
        blacklisted_module_names=blacklist,
        min_rank=4,
        trade_off_factor=1e9,
        max_accepted_ppl_diff=1e9,
    )
    assert set(config.keys()) == keep
    sd = utils.state_dict(new_model)
    model2, _ = tiny_model(key=3)
    model2 = utils.apply_decompose_config(model2, config)
    model2 = utils.load_state_dict(model2, sd)
    b = next(metric_it)
    np.testing.assert_allclose(
        np.asarray(new_model(b)), np.asarray(model2(b)), atol=2e-5
    )


def test_tp_sharding_rules():
    model, cfg = tiny_model()
    mesh = parallel.make_mesh(dp=4, tp=2)
    sharded = sh.shard_params(model, mesh)
    q = nn.get_submodule(sharded, "model.layers.0.self_attn.q_proj").kernel
    assert q.sharding.spec == jax.sharding.PartitionSpec(None, "tp")
    o = nn.get_submodule(sharded, "model.layers.0.self_attn.o_proj").kernel
    assert o.sharding.spec == jax.sharding.PartitionSpec("tp", None)
    b = next(batch_iter(jax.random.PRNGKey(0), bs=8))
    y1 = jax.jit(lambda m, b: m(b))(sharded, b)
    y0 = jax.jit(lambda m, b: m(b))(model, b)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=2e-5)


def test_graft_entry_and_dryrun():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == 2
    ge.dryrun_multichip(8)


def test_remat_forward_grad_and_decompose():
    """remat=True: forward matches non-remat, gradients flow, and the
    engine's tap capture still works (taps suppress remat via Ctx)."""
    cfg = models.TransformerConfig.tiny(vocab_size=64)
    cfg_r = models.TransformerConfig(
        **{**cfg.__dict__, "remat": True}
    )
    model = models.CausalLM.create(jax.random.PRNGKey(0), cfg)
    model_r = model.replace(model=model.model.replace(remat=True))
    b = next(batch_iter(jax.random.PRNGKey(1), vocab=64))

    y0 = model(b)
    y1 = model_r(b)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-5)

    def loss(m):
        return models.ce_loss(b, m(b))

    g = jax.grad(loss)(model_r)
    gn = jnp.sqrt(
        sum(jnp.sum(jnp.square(x)) for x in jax.tree_util.tree_leaves(g))
    )
    assert float(gn) > 0

    # tap capture path (gram) under a remat model
    grams, _ = engine.compute_output_grams(
        model_r,
        ["model.layers.0.self_attn.q_proj"],
        batch_iter(jax.random.PRNGKey(2), vocab=64),
        num_data_steps=1,
    )
    assert np.all(np.isfinite(np.asarray(grams["model.layers.0.self_attn.q_proj"])))
