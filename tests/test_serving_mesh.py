"""Multi-chip serving: generation with tensor-parallel sharded parameters
and data-parallel sharded prompt batches on the virtual 8-device mesh.

The cached attention path is pure jnp (einsums, dynamic_update_slice,
where-masks), so GSPMD propagates the Megatron layouts through the cache:
q/k/v projections shard over heads -> the K/V caches shard over their
head axis per device; the decode contraction runs per-shard with no
gather.  These tests pin that generate() under a mesh produces EXACTLY
the single-device tokens — multi-chip serving is a layout change, not a
numerics change."""

import jax
import jax.numpy as jnp
import numpy as np

from ptdeco_tpu import dwain, engine, models, parallel, serving
from ptdeco_tpu.parallel import shardings as sh


def make_lm(key=0, **overrides):
    base = dict(
        vocab_size=64,
        dim=32,
        n_layers=2,
        n_heads=4,
        n_kv_heads=2,
        hidden_dim=48,
        dtype=jnp.float32,
    )
    base.update(overrides)
    cfg = models.TransformerConfig(**base)
    return models.CausalLM.create(jax.random.PRNGKey(key), cfg)


def test_generate_with_tp_sharded_params():
    lm = make_lm(key=1)
    prompt = jax.random.randint(jax.random.PRNGKey(2), (4, 6), 0, 64)
    want = serving.generate(lm, prompt, 6)

    mesh = parallel.make_mesh(dp=4, tp=2)
    sharded = sh.shard_params(lm, mesh)
    got = serving.generate(sharded, prompt, 6)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_beam_with_tp_sharded_params():
    """Beam search on a TP mesh: the per-step batch-axis gather that
    reorders caches to surviving parents must compose with head-axis
    cache sharding — tokens exactly equal the single-device beam walk."""
    lm = make_lm(key=11)
    prompt = jax.random.randint(jax.random.PRNGKey(12), (4, 5), 0, 64)
    want = serving.generate_beam(lm, prompt, 5, num_beams=3)

    mesh = parallel.make_mesh(dp=4, tp=2)
    sharded = sh.shard_params(lm, mesh)
    got = serving.generate_beam(sharded, prompt, 5, num_beams=3)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_generate_with_dp_sharded_prompt():
    lm = make_lm(key=3)
    prompt = jax.random.randint(jax.random.PRNGKey(4), (8, 5), 0, 64)
    want = serving.generate(lm, prompt, 5)

    mesh = parallel.make_mesh(dp=8)
    sharded_prompt = parallel.shard_batch(
        {"input_ids": prompt}, mesh
    )["input_ids"]
    got = serving.generate(lm, sharded_prompt, 5)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_generate_decomposed_on_mesh():
    """Factor pairs inherit TP layouts (sh.shard_params knows the
    factor-pair rules); cached decode on the mesh must match."""
    lm = make_lm(key=5)
    names = engine.get_decomposeable_submodule_names(lm)
    keep = {
        "model.layers.0.mlp.up_proj",
        "model.layers.1.self_attn.q_proj",
    }

    def data_iter(key):
        while True:
            key, sub = jax.random.split(key)
            yield {"input_ids": jax.random.randint(sub, (2, 8), 0, 64)}

    deco, config = dwain.decompose(
        module=lm,
        data_iterator=data_iter(jax.random.PRNGKey(6)),
        loss_fn=models.ce_loss,
        num_data_steps=1,
        metric_iterator=data_iter(jax.random.PRNGKey(7)),
        num_metric_steps=1,
        nsr_final_threshold=1e9,
        blacklisted_module_names=[n for n in names if n not in keep],
        min_rank=4,
        trade_off_factor=1e9,
        max_accepted_ppl_diff=1e9,
    )
    assert set(config.keys()) == keep
    prompt = jax.random.randint(jax.random.PRNGKey(8), (4, 5), 0, 64)
    want = serving.generate(deco, prompt, 5)

    mesh = parallel.make_mesh(dp=4, tp=2)
    sharded = sh.shard_params(deco, mesh)
    got = serving.generate(sharded, prompt, 5)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_speculative_on_mesh():
    lm = make_lm(key=9)
    draft = make_lm(key=9)  # identical: exercises full-acceptance rounds
    prompt = jax.random.randint(jax.random.PRNGKey(10), (4, 4), 0, 64)
    want = serving.generate(lm, prompt, 6)

    mesh = parallel.make_mesh(dp=4, tp=2)
    t_sh = sh.shard_params(lm, mesh)
    d_sh = sh.shard_params(draft, mesh)
    got = serving.generate_speculative(t_sh, d_sh, prompt, 6, k=2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
