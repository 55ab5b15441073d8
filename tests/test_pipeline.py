"""Pipeline parallelism (parallel/pipeline.py): exactness, grads, guards.

``pipeline_logits`` runs the decoder layer stack as a GPipe fill-drain
pipeline over a ``pp`` mesh axis with layer parameters REALLY sharded
(L/pp layers per device) and microbatched activations ppermuted between
stages.  These tests pin bit-level forward parity with the unpipelined
model, gradient parity through jax.value_and_grad (pipelined training is
exact, not approximate), dp composition, masked batches, and the
homogeneity/divisibility guards.  The reference is strictly single-GPU
(SURVEY.md §2.7) — no analogue.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ptdeco_tpu import models, nn, parallel
from ptdeco_tpu.parallel import pipeline as pl

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def _lm(n_layers=4, dim=32, **kw):
    cfg = models.TransformerConfig(
        vocab_size=64,
        dim=dim,
        n_layers=n_layers,
        n_heads=4,
        n_kv_heads=2,
        hidden_dim=48,
        dtype=jnp.float32,
        **kw,
    )
    return models.CausalLM.create(jax.random.PRNGKey(0), cfg)


def _batch(b=4, s=8, mask=False):
    ids = jnp.arange(b * s, dtype=jnp.int32).reshape(b, s) % 64
    out = {"input_ids": ids}
    if mask:
        m = jnp.ones((b, s), jnp.int32)
        m = m.at[0, -3:].set(0).at[1, -1:].set(0)
        out["attention_mask"] = m
    return out


def _close(a, b, atol=1e-5):
    np.testing.assert_allclose(
        np.asarray(a, np.float32), np.asarray(b, np.float32),
        atol=atol, rtol=1e-5,
    )


def test_forward_parity_pp_only():
    lm = _lm(n_layers=4)
    batch = _batch(b=6)
    mesh = parallel.make_mesh(dp=1, pp=4, devices=jax.devices()[:4])
    out = pl.pipeline_logits(lm, batch, mesh, n_microbatches=3)
    _close(out, lm(batch))


def test_forward_parity_pp_dp_and_mask():
    lm = _lm(n_layers=4)
    batch = _batch(b=8, mask=True)
    mesh = parallel.make_mesh(dp=2, pp=4)
    assert mesh.axis_names == ("dp", "pp", "tp")
    out = pl.pipeline_logits(lm, batch, mesh, n_microbatches=2)
    _close(out, lm(batch))


def test_layer_params_really_sharded():
    # each stage stores L/pp layers: the stacked leaves' addressable
    # shards have leading dim L/pp
    lm = _lm(n_layers=4)
    mesh = parallel.make_mesh(dp=2, pp=4)
    _, stacked = pl.stack_block_params(lm.model.layers)
    w = jax.device_put(
        stacked[0],
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("pp")),
    )
    assert w.shape[0] == 4
    assert w.addressable_shards[0].data.shape[0] == 1


def test_grad_parity():
    lm = _lm(n_layers=2)
    batch = _batch(b=4)
    mesh = parallel.make_mesh(dp=1, pp=2, devices=jax.devices()[:2])

    def loss_pipe(m):
        return models.ce_loss(
            batch, pl.pipeline_logits(m, batch, mesh, n_microbatches=2)
        )

    def loss_ref(m):
        return models.ce_loss(batch, m(batch))

    lp, gp = jax.value_and_grad(loss_pipe)(lm)
    lr, gr = jax.value_and_grad(loss_ref)(lm)
    _close(lp, lr)
    gp_leaves = dict(nn.named_parameters(gp))
    gr_leaves = dict(nn.named_parameters(gr))
    assert gp_leaves.keys() == gr_leaves.keys()
    for k in (
        "model.layers.0.self_attn.q_proj.kernel",
        "model.layers.1.mlp.down_proj.kernel",
        "model.embed_tokens.table",
        "lm_head.kernel",
    ):
        _close(gp_leaves[k], gr_leaves[k], atol=1e-5)


def test_jitted_pipeline_step():
    lm = _lm(n_layers=4)
    batch = _batch(b=4)
    mesh = parallel.make_mesh(dp=1, pp=4, devices=jax.devices()[:4])

    @jax.jit
    def step(m, b):
        return pl.pipeline_logits(m, b, mesh, n_microbatches=2)

    _close(step(lm, batch), lm(batch))


def test_guards():
    lm = _lm(n_layers=4)
    mesh = parallel.make_mesh(dp=1, pp=4, devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="does not divide into"):
        pl.pipeline_logits(lm, _batch(b=5), mesh, n_microbatches=3)
    lm3 = _lm(n_layers=3)
    with pytest.raises(ValueError, match="layers do not divide"):
        pl.pipeline_logits(lm3, _batch(), mesh, n_microbatches=2)
    nopp = parallel.make_mesh(dp=2, tp=1, devices=jax.devices()[:2])
    with pytest.raises(ValueError, match="no 'pp' axis"):
        pl.pipeline_logits(lm, _batch(), nopp, n_microbatches=2)


def test_heterogeneous_stack_refused():
    # a hybrid stack (one block replaced by a decomposed variant) must
    # refuse loudly rather than silently mis-stack
    lm = _lm(n_layers=4)
    site = "model.layers.1.mlp.up_proj"
    k = nn.get_submodule(lm, site).kernel
    pair = nn.Sequential(
        layers=(
            nn.Linear(kernel=k[:, :4], bias=None),
            nn.Linear(kernel=jnp.zeros((4, k.shape[1]), k.dtype), bias=None),
        )
    )
    lm = nn.replace_submodule(lm, site, pair)
    mesh = parallel.make_mesh(dp=1, pp=4, devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="structure differs"):
        pl.pipeline_logits(lm, _batch(), mesh, n_microbatches=2)


def test_grad_parity_with_remat():
    # the pipeline honors TransformerConfig.remat inside the stage scan
    # (same jax.checkpoint semantics as Decoder.__call__)
    lm = _lm(n_layers=2, remat=True)
    assert lm.model.remat
    batch = _batch(b=4)
    mesh = parallel.make_mesh(dp=1, pp=2, devices=jax.devices()[:2])

    def loss_pipe(m):
        return models.ce_loss(
            batch, pl.pipeline_logits(m, batch, mesh, n_microbatches=2)
        )

    def loss_ref(m):
        return models.ce_loss(batch, m(batch))

    lp, gp = jax.value_and_grad(loss_pipe)(lm)
    lr, gr = jax.value_and_grad(loss_ref)(lm)
    _close(lp, lr)
    gp_leaves = dict(nn.named_parameters(gp))
    gr_leaves = dict(nn.named_parameters(gr))
    for k in (
        "model.layers.0.self_attn.q_proj.kernel",
        "model.layers.1.mlp.down_proj.kernel",
    ):
        _close(gp_leaves[k], gr_leaves[k], atol=1e-5)
