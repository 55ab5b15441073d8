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


def test_finetune_cli_mesh_pp(tmp_path):
    """End-to-end LLM finetune CLI with mesh_pp (VERDICT r3 #5): a
    decomposed checkpoint (same site in EVERY layer, keeping the stack
    homogeneous) LoRA-finetunes with its forward scheduled as a dp x pp
    x tp GPipe pipeline, and the run exports a normal checkpoint +
    summary.  Reference analogue: run_finetune.py is single-GPU
    (/root/reference/examples/trainer_llm/run_finetune.py); the pp mesh
    axis is TPU-new capability."""
    import json as _json

    from apps.trainer_llm import run_finetune
    from ptdeco_tpu import dwain, engine, utils

    def mk():
        cfg = models.TransformerConfig(
            vocab_size=256, dim=32, n_layers=2, n_heads=4, n_kv_heads=2,
            hidden_dim=64, dtype=jnp.float32,
        )
        return models.CausalLM.create(jax.random.PRNGKey(0), cfg)

    lm = mk()

    def batches():
        key = jax.random.PRNGKey(3)
        while True:
            key, sub = jax.random.split(key)
            yield {"input_ids": jax.random.randint(sub, (2, 8), 0, 256)}

    names = engine.get_decomposeable_submodule_names(lm)
    keep = {f"model.layers.{i}.self_attn.o_proj" for i in range(2)}
    deco, deco_cfg = dwain.decompose(
        module=lm,
        data_iterator=batches(),
        loss_fn=models.ce_loss,
        num_data_steps=2,
        metric_iterator=batches(),
        num_metric_steps=1,
        nsr_final_threshold=0.9,
        trade_off_factor=1000.0,
        max_accepted_ppl_diff=10.0,
        min_rank=4,
        blacklisted_module_names=[n for n in names if n not in keep],
        decompose_in_float64=False,
    )
    # both layers decomposed at the same rank -> stack stays homogeneous
    assert set(deco_cfg) == keep
    ranks = {
        nn.get_submodule(deco, f"{n}.0").out_features for n in keep
    }
    assert len(ranks) == 1, ranks
    (tmp_path / "decompose_config.json").write_text(_json.dumps(deco_cfg))
    utils.save_state_dict_pt(
        utils.state_dict(deco), str(tmp_path / "decompose_state_dict.pt")
    )

    builder_py = tmp_path / "builder_tiny.py"
    builder_py.write_text(
        "import jax, jax.numpy as jnp\n"
        "from ptdeco_tpu import models\n"
        "def make_model_and_tokenizer(config):\n"
        "    from apps.trainer_llm.builder import ByteTokenizer\n"
        "    cfg = models.TransformerConfig(\n"
        "        vocab_size=256, dim=32, n_layers=2, n_heads=4,\n"
        "        n_kv_heads=2, hidden_dim=64, dtype=jnp.float32)\n"
        "    return (models.CausalLM.create(jax.random.PRNGKey(0), cfg),\n"
        "            ByteTokenizer(256))\n"
    )
    data = tmp_path / "data.jsonl"
    data.write_text(
        "\n".join(
            _json.dumps({"text": f"the quick brown fox {i} jumps"})
            for i in range(24)
        )
    )
    raw = {
        "task": "finetune",
        "decomposed_model_name": "tiny-pp",
        "decomposed_model_custom_builder_path": str(builder_py),
        "decomposed_model_dtype": "float32",
        "decompose_config": str(tmp_path / "decompose_config.json"),
        "decompose_state_dict": str(tmp_path / "decompose_state_dict.pt"),
        "perplexity_data_name": str(data),
        "perplexity_data_separator": "",
        "perplexity_data_max_length": 16,
        "perplexity_data_batch_size": 4,
        "train_data_name": str(data),
        "train_data_separator": "",
        "train_data_max_length": 16,
        "train_data_batch_size": 4,
        "train_data_n_samples": 8,
        "test_data_name": str(data),
        "test_data_separator": "",
        "test_data_max_length": 16,
        "test_data_batch_size": 4,
        "test_data_n_samples": 4,
        "num_train_epochs": 1,
        "eval_steps": 2,
        "logging_steps": 1,
        "num_warmup_steps": 1,
        "mesh_dp": 2,
        "mesh_tp": 2,
        "mesh_pp": 2,
    }
    out = tmp_path / "out"
    run_finetune.main(raw, out)

    summary = _json.loads((out / "summary.json").read_text())
    assert np.isfinite(summary["ppl_after"])
    sd = utils.load_state_dict_pt(str(out / "finetuned_state_dict.pt"))
    # LoRA merged back into the factor pairs: plain decomposed checkpoint
    assert any("o_proj.0.weight" in k for k in sd)
    assert not any("lora" in k for k in sd)


def test_finetune_cli_mesh_pp_refuses_heterogeneous(tmp_path):
    """mesh_pp with a stack whose layers differ structurally (only layer
    0 decomposed) must fail fast with the homogeneity ValueError, before
    any training."""
    import json as _json

    from apps.trainer_llm import run_finetune
    from ptdeco_tpu import dwain, engine, utils

    cfg = models.TransformerConfig(
        vocab_size=256, dim=32, n_layers=2, n_heads=4, n_kv_heads=2,
        hidden_dim=64, dtype=jnp.float32,
    )
    lm = models.CausalLM.create(jax.random.PRNGKey(0), cfg)

    def batches():
        key = jax.random.PRNGKey(3)
        while True:
            key, sub = jax.random.split(key)
            yield {"input_ids": jax.random.randint(sub, (2, 8), 0, 256)}

    names = engine.get_decomposeable_submodule_names(lm)
    keep = "model.layers.0.self_attn.o_proj"
    deco, deco_cfg = dwain.decompose(
        module=lm,
        data_iterator=batches(),
        loss_fn=models.ce_loss,
        num_data_steps=2,
        metric_iterator=batches(),
        num_metric_steps=1,
        nsr_final_threshold=0.9,
        trade_off_factor=1000.0,
        max_accepted_ppl_diff=10.0,
        min_rank=4,
        blacklisted_module_names=[n for n in names if n != keep],
        decompose_in_float64=False,
    )
    assert keep in deco_cfg
    (tmp_path / "decompose_config.json").write_text(_json.dumps(deco_cfg))
    utils.save_state_dict_pt(
        utils.state_dict(deco), str(tmp_path / "decompose_state_dict.pt")
    )
    builder_py = tmp_path / "builder_tiny.py"
    builder_py.write_text(
        "import jax, jax.numpy as jnp\n"
        "from ptdeco_tpu import models\n"
        "def make_model_and_tokenizer(config):\n"
        "    from apps.trainer_llm.builder import ByteTokenizer\n"
        "    cfg = models.TransformerConfig(\n"
        "        vocab_size=256, dim=32, n_layers=2, n_heads=4,\n"
        "        n_kv_heads=2, hidden_dim=64, dtype=jnp.float32)\n"
        "    return (models.CausalLM.create(jax.random.PRNGKey(0), cfg),\n"
        "            ByteTokenizer(256))\n"
    )
    data = tmp_path / "data.jsonl"
    data.write_text(_json.dumps({"text": "some text"}))
    raw = {
        "task": "finetune",
        "decomposed_model_name": "tiny-pp-het",
        "decomposed_model_custom_builder_path": str(builder_py),
        "decomposed_model_dtype": "float32",
        "decompose_config": str(tmp_path / "decompose_config.json"),
        "decompose_state_dict": str(tmp_path / "decompose_state_dict.pt"),
        "perplexity_data_name": str(data),
        "perplexity_data_separator": "",
        "perplexity_data_max_length": 16,
        "perplexity_data_batch_size": 4,
        "train_data_name": str(data),
        "train_data_separator": "",
        "train_data_max_length": 16,
        "train_data_batch_size": 4,
        "train_data_n_samples": 4,
        "test_data_name": str(data),
        "test_data_separator": "",
        "test_data_max_length": 16,
        "test_data_batch_size": 4,
        "test_data_n_samples": 4,
        "num_train_epochs": 1,
        "mesh_pp": 2,
    }
    with pytest.raises(ValueError, match="homogeneous"):
        run_finetune.main(raw, tmp_path / "out")
