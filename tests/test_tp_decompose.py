"""Whole dwain decomposition with TENSOR-PARALLEL sharded parameters on the
virtual 8-device mesh — the Llama-scale calibration path (BASELINE.md
stretch config: sharded covariance on a mesh).  Verifies the engine's taps,
Gram psum, candidate ladder and factor construction all compose with
NamedSharding'd kernels, and that results match the unsharded run."""

import jax
import jax.numpy as jnp
import numpy as np

from ptdeco_tpu import dwain, engine, models, parallel
from ptdeco_tpu.parallel import shardings as sh


def batch_iter(key, bs=8, s=16, vocab=128):
    while True:
        key, sub = jax.random.split(key)
        yield {
            "input_ids": jax.random.randint(sub, (bs, s), 0, vocab),
            "attention_mask": jnp.ones((bs, s), jnp.int32),
        }


def _decompose(model, mesh=None):
    data_it = batch_iter(jax.random.PRNGKey(1))
    metric_it = batch_iter(jax.random.PRNGKey(2))
    if mesh is not None:
        data_it = (parallel.shard_batch(b, mesh) for b in data_it)
        metric_it = (parallel.shard_batch(b, mesh) for b in metric_it)
    names = engine.get_decomposeable_submodule_names(model)
    keep = {"model.layers.0.mlp.up_proj", "model.layers.0.self_attn.o_proj"}
    blacklist = [n for n in names if n not in keep]
    return dwain.decompose(
        module=model,
        data_iterator=data_it,
        loss_fn=models.ce_loss,
        num_data_steps=2,
        metric_iterator=metric_it,
        num_metric_steps=1,
        nsr_final_threshold=1e9,
        blacklisted_module_names=blacklist,
        min_rank=4,
        trade_off_factor=1e9,
        max_accepted_ppl_diff=1e9,
    )


def test_tp_sharded_decompose_matches_unsharded():
    cfg = models.TransformerConfig.tiny(vocab_size=128)
    model = models.CausalLM.create(jax.random.PRNGKey(0), cfg)

    m_plain, cfg_plain = _decompose(model)

    mesh = parallel.make_mesh(dp=4, tp=2)
    sharded = sh.shard_params(model, mesh)
    m_tp, cfg_tp = _decompose(sharded, mesh)

    # identical decisions and factor shapes
    assert set(cfg_plain.keys()) == set(cfg_tp.keys())
    for k in cfg_plain:
        e1 = {a: b for a, b in cfg_plain[k].items() if a != "__meta__"}
        e2 = {a: b for a, b in cfg_tp[k].items() if a != "__meta__"}
        assert e1 == e2
        np.testing.assert_allclose(
            cfg_plain[k]["__meta__"]["proportion"],
            cfg_tp[k]["__meta__"]["proportion"],
        )

    # identical outputs (same data, same math; sharding is exact)
    b = next(batch_iter(jax.random.PRNGKey(3)))
    np.testing.assert_allclose(
        np.asarray(m_plain(b)), np.asarray(m_tp(b)), atol=5e-5
    )
