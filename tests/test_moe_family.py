"""MoE family (Mixtral / Qwen3-MoE) parity and decomposition tests.

The native MoEMLP runs dense dispatch with zero-masked expert inputs
(models/transformer.py), which must be numerically the same computation as
the HF routed index-add (MixtralSparseMoeBlock / Qwen3MoeSparseMoeBlock) —
pinned here against the live torch implementations on shared weights.
Reference coverage analogue: AutoModelForCausalLM accepts MoE checkpoints
(/root/reference/examples/trainer_llm/builder.py:97-107); the reference
never exercises one, so this is coverage beyond its test surface.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import dataclasses

from ptdeco_tpu import dwain, engine, models, utils
from ptdeco_tpu.models import hf_loader

torch.set_num_threads(1)


def _hf_sd(hf_model):
    return {
        k: v.detach().to(torch.float32).numpy()
        for k, v in hf_model.state_dict().items()
        if not k.endswith("rotary_emb.inv_freq")
    }


def _compare(hf_model, native, vocab, atol):
    rng = np.random.RandomState(0)
    ids = rng.randint(0, vocab, (2, 12))
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(ids)).logits.to(torch.float32).numpy()
    out = np.asarray(native({"input_ids": jnp.asarray(ids)}), np.float32)
    assert np.allclose(out, ref, atol=atol), np.abs(out - ref).max()


def _mixtral_cfg(**kw):
    base = dict(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_local_experts=4,
        num_experts_per_tok=2,
        max_position_embeddings=64,
    )
    base.update(kw)
    return transformers.MixtralConfig(**base)


def test_mixtral_logits_match_hf():
    cfg = _mixtral_cfg()
    hf = transformers.MixtralForCausalLM(cfg).eval()
    ncfg = models.TransformerConfig.from_hf_config(
        cfg.to_dict(), dtype=jnp.float32
    )
    assert ncfg.n_experts == 4 and ncfg.n_experts_per_tok == 2
    assert ncfg.norm_topk_prob  # mixtral always renormalizes top-k
    native = models.CausalLM.create(jax.random.PRNGKey(0), ncfg)
    sd = hf_loader.translate_mixtral_state_dict(_hf_sd(hf))
    native = utils.load_state_dict(native, sd, strict=False)
    assert isinstance(native.model.layers[0].mlp, models.MoEMLP)
    _compare(hf, native, 128, atol=2e-4)


def test_qwen3_moe_logits_match_hf():
    """norm_topk_prob=True plus the sparse-layer selection rule: layer 0 is
    forced dense via mlp_only_layers and must build a plain MLP."""
    cfg = transformers.Qwen3MoeConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        moe_intermediate_size=48,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=8,
        num_experts=4,
        num_experts_per_tok=2,
        norm_topk_prob=True,
        decoder_sparse_step=1,
        mlp_only_layers=[0],
        max_position_embeddings=64,
    )
    hf = transformers.Qwen3MoeForCausalLM(cfg).eval()
    ncfg = models.TransformerConfig.from_hf_config(
        cfg.to_dict(), dtype=jnp.float32
    )
    assert ncfg.qk_norm and ncfg.moe_hidden_dim == 48
    native = models.CausalLM.create(jax.random.PRNGKey(0), ncfg)
    native = utils.load_state_dict(native, _hf_sd(hf), strict=False)
    assert isinstance(native.model.layers[0].mlp, models.TransformerMLP)
    assert isinstance(native.model.layers[1].mlp, models.MoEMLP)
    _compare(hf, native, 128, atol=2e-4)


def test_qwen3_moe_unnormalized_topk_matches_hf():
    cfg = transformers.Qwen3MoeConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        moe_intermediate_size=48,
        num_hidden_layers=1,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=8,
        num_experts=4,
        num_experts_per_tok=2,
        norm_topk_prob=False,
        max_position_embeddings=64,
    )
    hf = transformers.Qwen3MoeForCausalLM(cfg).eval()
    ncfg = models.TransformerConfig.from_hf_config(
        cfg.to_dict(), dtype=jnp.float32
    )
    assert not ncfg.norm_topk_prob
    native = models.CausalLM.create(jax.random.PRNGKey(0), ncfg)
    native = utils.load_state_dict(native, _hf_sd(hf), strict=False)
    _compare(hf, native, 128, atol=2e-4)


def test_qwen2_moe_logits_match_hf():
    """qwen2_moe arm: qkv bias (qwen2 layout), unnormalized top-k by
    default, and the always-on sigmoid-gated shared expert."""
    cfg = transformers.Qwen2MoeConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        moe_intermediate_size=48,
        shared_expert_intermediate_size=80,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_experts=4,
        num_experts_per_tok=2,
        max_position_embeddings=64,
    )
    hf = transformers.Qwen2MoeForCausalLM(cfg).eval()
    ncfg = models.TransformerConfig.from_hf_config(
        cfg.to_dict(), dtype=jnp.float32
    )
    assert ncfg.qkv_bias and not ncfg.norm_topk_prob
    assert ncfg.shared_expert_hidden_dim == 80
    native = models.CausalLM.create(jax.random.PRNGKey(0), ncfg)
    moe = native.model.layers[0].mlp
    assert isinstance(moe, models.MoEMLP)
    assert moe.shared_expert is not None
    native = utils.load_state_dict(native, _hf_sd(hf), strict=False)
    _compare(hf, native, 128, atol=2e-4)


def test_grouped_and_dense_dispatch_agree():
    """The ragged_dot grouped fast path and the zero-masked dense path are
    the same routed computation; pristine experts must take the fast path,
    and any non-Linear expert projection must force the dense fallback."""
    cfg = models.TransformerConfig(
        vocab_size=64, dim=16, n_layers=1, n_heads=2, n_kv_heads=2,
        hidden_dim=32, n_experts=4, n_experts_per_tok=2,
        norm_topk_prob=True, dtype=jnp.float32,
    )
    moe = models.MoEMLP.create(jax.random.PRNGKey(0), cfg)
    assert moe._experts_are_pristine()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 16), jnp.float32)
    y_fast = np.asarray(moe(x))
    y_dense = np.asarray(moe._dense_masked(x, None))
    np.testing.assert_allclose(y_fast, y_dense, atol=1e-5)
    # the two paths agree under jit as well (grouped path has gather /
    # scatter-add / bincount that must trace)
    y_jit = np.asarray(jax.jit(moe)(x))
    np.testing.assert_allclose(y_jit, y_dense, atol=1e-5)
    # tap-wrapping one projection statically disables the grouped path
    store: dict = {}
    tapped = engine._wrap_taps(moe, ["experts.1.gate_proj"], store)
    assert not tapped._experts_are_pristine()
    np.testing.assert_allclose(np.asarray(tapped(x)), y_dense, atol=1e-5)
    assert "experts.1.gate_proj" in store


def test_builder_mixtral_checkpoint_path(tmp_path):
    """End-to-end: a Mixtral snapshot dir loads through the generic family
    path with the w1/w2/w3 -> gate/down/up key translation applied."""
    import safetensors.numpy

    from apps.trainer_llm import builder

    cfg = _mixtral_cfg()
    hf = transformers.MixtralForCausalLM(cfg).eval()
    (tmp_path / "config.json").write_text(cfg.to_json_string())
    sd = {k: v.copy() for k, v in _hf_sd(hf).items()}
    safetensors.numpy.save_file(sd, tmp_path / "model.safetensors")
    model, _ = builder.make_model_and_tokenizer(
        model_name="someorg/tiny-mixtral",
        dtype="float32",
        checkpoint_path=str(tmp_path),
    )
    _compare(hf, model, 128, atol=2e-4)


def test_moe_tap_captures_routed_tokens_only():
    """The zero-masked dense dispatch must hand the engine's tap capture
    exactly the ROUTED token set per expert: unrouted rows are zero (and so
    contribute nothing to an input Gram), routed rows are the true inputs."""
    cfg = models.TransformerConfig(
        vocab_size=64, dim=16, n_layers=1, n_heads=2, n_kv_heads=2,
        hidden_dim=32, n_experts=4, n_experts_per_tok=1, dtype=jnp.float32,
    )
    moe = models.MoEMLP.create(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 16), jnp.float32)
    top1 = np.asarray(
        jnp.argmax(jnp.dot(x, moe.gate.kernel), axis=-1)
    ).reshape(-1)
    store: dict = {}
    tapped = engine._wrap_taps(
        moe, [f"experts.{e}.gate_proj" for e in range(4)], store
    )
    _ = tapped(x)
    xf = np.asarray(x).reshape(-1, 16)
    for e in range(4):
        rows = np.asarray(store[f"experts.{e}.gate_proj"])
        routed = top1 == e
        assert np.allclose(rows[routed], xf[routed])
        assert np.all(rows[~routed] == 0.0)
    assert top1.min() >= 0 and len(set(top1.tolist())) > 1  # non-degenerate


def test_moe_decompose_and_roundtrip():
    """dwain surgery + modconfig round-trip on expert projections: MoE
    expert Linears are first-class decomposition sites."""
    from ptdeco_tpu import dwain

    cfg = models.TransformerConfig.from_hf_config(
        _mixtral_cfg(
            vocab_size=64, num_hidden_layers=2, num_local_experts=2
        ).to_dict(),
        dtype=jnp.float32,
    )
    model = models.CausalLM.create(jax.random.PRNGKey(0), cfg)

    def batches(seed):
        key = jax.random.PRNGKey(seed)
        while True:
            key, sub = jax.random.split(key)
            yield {"input_ids": jax.random.randint(sub, (2, 12), 0, 64)}

    names = engine.get_decomposeable_submodule_names(model)
    keep = {
        "model.layers.0.mlp.experts.1.gate_proj",
        "model.layers.1.mlp.experts.0.down_proj",
    }
    assert keep <= set(names)
    # the router itself is discoverable (it is a Linear) but blacklisted
    assert "model.layers.0.mlp.gate" in names
    model2, deco_cfg = dwain.decompose(
        module=model,
        data_iterator=batches(1),
        loss_fn=models.ce_loss,
        num_data_steps=2,
        metric_iterator=batches(2),
        num_metric_steps=1,
        nsr_final_threshold=1e9,
        blacklisted_module_names=[n for n in names if n not in keep],
        min_rank=2,
        trade_off_factor=1e9,
        max_accepted_ppl_diff=1e9,
    )
    assert set(deco_cfg.keys()) == keep

    fresh = models.CausalLM.create(jax.random.PRNGKey(9), cfg)
    fresh = utils.apply_decompose_config(fresh, deco_cfg)
    fresh = utils.load_state_dict(fresh, utils.state_dict(model2))
    b = next(batches(3))
    np.testing.assert_allclose(
        np.asarray(model2(b)), np.asarray(fresh(b)), atol=2e-5
    )


def test_deepseek_routing_grouped_and_dense_agree():
    """The grouped ragged_dot fast path must honor the full deepseek_v3
    routing flavor (sigmoid scores, selection-only correction bias,
    group-limited choice, routed scaling) identically to the dense path."""
    cfg = models.TransformerConfig(
        vocab_size=64, dim=16, n_layers=1, n_heads=2, n_kv_heads=2,
        hidden_dim=32, n_experts=8, n_experts_per_tok=3,
        router_score_func="sigmoid", router_n_group=4, router_topk_group=2,
        router_group_top2_sum=True, router_correction_bias=True,
        routed_scaling_factor=2.5, norm_topk_prob=True,
        moe_hidden_dim=16, dtype=jnp.float32,
    )
    moe = models.MoEMLP.create(jax.random.PRNGKey(0), cfg)
    moe = dataclasses.replace(
        moe,
        gate_correction_bias=jax.random.normal(
            jax.random.PRNGKey(9), (8,), jnp.float32
        ),
    )
    assert moe._experts_are_pristine()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 16), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(moe(x)), np.asarray(moe._dense_masked(x, None)), atol=1e-5
    )


def test_deepseek_style_decompose_roundtrip():
    """A native MLA + deepseek-MoE model walks through dwain end-to-end:
    MLA projections and expert/shared-expert projections are sites, the
    decomposed model round-trips through config + state dict (including
    the gate_correction_bias leaf)."""
    cfg = models.TransformerConfig(
        vocab_size=64, dim=32, n_layers=2, n_heads=4, n_kv_heads=4,
        hidden_dim=48, kv_lora_rank=16, q_lora_rank=24,
        qk_rope_head_dim=4, qk_nope_head_dim=8, v_head_dim=8,
        n_experts=4, n_experts_per_tok=2, router_score_func="sigmoid",
        router_n_group=2, router_topk_group=1, router_group_top2_sum=True,
        router_correction_bias=True, routed_scaling_factor=2.5,
        shared_expert_hidden_dim=32, shared_expert_gated=False,
        moe_hidden_dim=16, mlp_only_layers=(0,), norm_topk_prob=True,
        dtype=jnp.float32,
    )
    model = models.CausalLM.create(jax.random.PRNGKey(0), cfg)

    def data_iter():
        key = jax.random.PRNGKey(1)
        while True:
            key, sub = jax.random.split(key)
            yield {
                "input_ids": jax.random.randint(sub, (2, 16), 0, 64),
            }

    it = data_iter()
    new_model, dconfig = dwain.decompose(
        module=model,
        data_iterator=it,
        loss_fn=models.ce_loss,
        num_data_steps=2,
        metric_iterator=it,
        num_metric_steps=1,
        nsr_final_threshold=0.9,
        min_rank=2,
        trade_off_factor=1000.0,
        max_accepted_ppl_diff=10.0,
        blacklisted_module_names=["lm_head"],
    )
    assert dconfig, "nothing decomposed"
    # MLA sites participate
    assert any(".self_attn." in k for k in dconfig)
    sd = utils.state_dict(new_model)
    assert "model.layers.1.mlp.gate_correction_bias" in sd
    model2 = models.CausalLM.create(jax.random.PRNGKey(7), cfg)
    model2 = utils.apply_decompose_config(model2, dconfig)
    model2 = utils.load_state_dict(model2, sd)
    batch = next(it)
    np.testing.assert_allclose(
        np.asarray(new_model(batch)), np.asarray(model2(batch)), atol=1e-5
    )


def test_gpt_oss_biased_experts_grouped_and_dense_agree():
    """Biased clamped-swiglu experts (gpt_oss) must produce identical
    results through the ragged_dot grouped path (per-row bias gathers)
    and the zero-masked dense fallback (bias leakage on unrouted tokens
    is cancelled by the zero combine weight)."""
    cfg = models.TransformerConfig(
        vocab_size=64, dim=16, n_layers=1, n_heads=2, n_kv_heads=2,
        hidden_dim=24, n_experts=4, n_experts_per_tok=2,
        moe_clamp_limit=7.0, router_bias=True,
        router_softmax_after_topk=True, dtype=jnp.float32,
    )
    moe = models.MoEMLP.create(jax.random.PRNGKey(0), cfg)
    assert moe._experts_are_pristine()
    assert moe.experts[0].act == "gptoss_glu"
    assert moe.experts[0].down_proj.bias is not None
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 16), jnp.float32)
    y_fast = np.asarray(moe(x))
    y_dense = np.asarray(moe._dense_masked(x, None))
    np.testing.assert_allclose(y_fast, y_dense, atol=1e-5)
    # tap-wrapping forces the dense path and captures only routed inputs
    store: dict = {}
    tapped = engine._wrap_taps(moe, ["experts.2.gate_proj"], store)
    assert not tapped._experts_are_pristine()
    np.testing.assert_allclose(np.asarray(tapped(x)), y_dense, atol=1e-5)
