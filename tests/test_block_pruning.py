"""Block pruning (models.prune_blocks + the bp custom-builder example;
native analogue of the reference's examples_builder/bp_*_builder.py, which
delegate to an external llm_pipelines package)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ptdeco_tpu import engine, models, utils


def _tiny():
    cfg = models.TransformerConfig.tiny()
    return models.CausalLM.create(jax.random.PRNGKey(0), cfg), cfg


def test_prune_blocks_params_and_forward():
    model, cfg = _tiny()
    n0 = utils.get_num_params(model)
    pruned = models.prune_blocks(model, attn_indices=[0], mlp_indices=[1])
    assert utils.get_num_params(pruned) < n0
    assert isinstance(pruned.model.layers[0].self_attn, models.PrunedSublayer)
    assert isinstance(pruned.model.layers[1].mlp, models.PrunedSublayer)
    batch = {"input_ids": jnp.ones((2, 16), jnp.int32)}
    y = jax.jit(lambda m, b: m(b))(pruned, batch)
    assert y.shape == (2, 16, cfg.vocab_size)
    assert np.isfinite(np.asarray(y)).all()


def test_pruned_sublayer_is_identity_skip():
    """Pruning a sublayer must equal zeroing its contribution: the block's
    residual carries the input through unchanged."""
    model, _ = _tiny()
    pruned = models.prune_blocks(model, attn_indices=[], mlp_indices=[0])
    blk = pruned.model.layers[0]
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, model.model.embed_tokens.table.shape[1]))
    pos = jnp.broadcast_to(jnp.arange(8)[None], (2, 8))
    h_attn = x + blk.self_attn(blk.input_layernorm(x), None, positions=pos)
    np.testing.assert_allclose(
        np.asarray(blk(x, positions=pos)), np.asarray(h_attn), atol=1e-6
    )


def test_prune_blocks_index_validation():
    model, _ = _tiny()
    with pytest.raises(ValueError, match="out of range"):
        models.prune_blocks(model, attn_indices=[99], mlp_indices=[])


def test_pruned_sites_not_decomposeable():
    model, _ = _tiny()
    pruned = models.prune_blocks(model, attn_indices=[0], mlp_indices=[])
    names = engine.get_decomposeable_submodule_names(pruned)
    assert not any(n.startswith("model.layers.0.self_attn") for n in names)
    assert any(n.startswith("model.layers.0.mlp") for n in names)
    assert any(n.startswith("model.layers.1.self_attn") for n in names)


def test_bp_builder_example():
    import importlib.util
    import pathlib

    path = (
        pathlib.Path(__file__).parent.parent
        / "apps/trainer_llm/examples_builder/bp_indices_builder.py"
    )
    spec = importlib.util.spec_from_file_location("bp_builder", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    model, tok = mod.make_model_and_tokenizer(
        {"bp_attn_indices": [1], "bp_mlp_indices": [0], "seed": 3}
    )
    assert isinstance(model.model.layers[1].self_attn, models.PrunedSublayer)
    ids = jnp.asarray([tok("hello")["input_ids"]])
    y = model({"input_ids": ids})
    assert np.isfinite(np.asarray(y)).all()


def test_pruned_model_state_dict_roundtrip():
    """Pruned-model state dicts exclude removed sublayers and reload into a
    freshly pruned twin (the bp_state_dict path of the builder example)."""
    model, _ = _tiny()
    pruned = models.prune_blocks(model, attn_indices=[0], mlp_indices=[1])
    sd = utils.state_dict(pruned)
    assert not any(k.startswith("model.layers.0.self_attn") for k in sd)
    twin, _ = _tiny()
    twin = models.prune_blocks(twin, attn_indices=[0], mlp_indices=[1])
    twin = utils.load_state_dict(twin, sd)
    batch = {"input_ids": jnp.ones((1, 8), jnp.int32)}
    np.testing.assert_allclose(
        np.asarray(pruned(batch)), np.asarray(twin(batch)), atol=1e-6
    )


def test_bp_checkpoint_builder_example(tmp_path):
    """The bp_checkpoint_builder example recreates a pruned model from a
    pruned-checkpoint directory (bp_config.json + state_dict.safetensors)
    and loads its weights exactly — analogue of the reference's
    examples_builder/bp_checkpoint_builder.py, self-contained instead of
    depending on the non-vendored llm_pipelines package."""
    import importlib.util
    import json
    import pathlib

    # produce a pruned checkpoint
    model, _ = _tiny()
    pruned = models.prune_blocks(model, attn_indices=[1], mlp_indices=[0])
    sd = utils.state_dict(pruned)
    utils.save_state_dict_safetensors(
        sd, str(tmp_path / "state_dict.safetensors")
    )
    (tmp_path / "bp_config.json").write_text(
        json.dumps({"attn_indices": [1], "mlp_indices": [0]})
    )

    path = (
        pathlib.Path(__file__).parent.parent
        / "apps/trainer_llm/examples_builder/bp_checkpoint_builder.py"
    )
    spec = importlib.util.spec_from_file_location("bp_ckpt_builder", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    model2, tok = mod.make_model_and_tokenizer(
        {"bp_model_path": str(tmp_path), "seed": 9}
    )
    assert isinstance(model2.model.layers[1].self_attn, models.PrunedSublayer)
    batch = {"input_ids": jnp.ones((1, 8), jnp.int32)}
    np.testing.assert_allclose(
        np.asarray(pruned(batch)), np.asarray(model2(batch)), atol=1e-6
    )

    # bp_load_state_dict=False keeps the fresh init (different output)
    model3, _ = mod.make_model_and_tokenizer(
        {"bp_model_path": str(tmp_path), "seed": 9, "bp_load_state_dict": False}
    )
    assert not np.allclose(
        np.asarray(pruned(batch)), np.asarray(model3(batch))
    )
