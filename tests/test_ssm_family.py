"""Mamba-family parity: the TPU-native selective-scan (mamba1) and
chunked-SSD (mamba2) mixers must reproduce transformers' reference
implementations (MambaMixer.slow_forward / Mamba2Mixer.torch_forward /
FalconMambaMixer.slow_forward) on shared weights.  Reference coverage
analogue: AutoModelForCausalLM (trainer_llm/builder.py:97-107) — these
are the non-transformer compute graphs of that coverage."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from ptdeco_tpu import models, utils
from ptdeco_tpu.models import hf_loader

torch.set_num_threads(1)


def _to_native(hf_model, hf_cfg_dict):
    sd = {
        k: v.detach().to(torch.float32).numpy()
        for k, v in hf_model.state_dict().items()
    }
    sd = hf_loader.make_mamba_translator(hf_cfg_dict)(sd)
    cfg = models.MambaConfig.from_hf_config(hf_cfg_dict, dtype=jnp.float32)
    native = models.MambaLM.create(jax.random.PRNGKey(0), cfg)
    return utils.load_state_dict(native, sd, strict=False), cfg


def _compare(hf_model, native, vocab, atol, seqlen=12):
    rng = np.random.RandomState(0)
    ids = rng.randint(0, vocab, (2, seqlen))
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(ids)).logits.to(torch.float32).numpy()
    out = np.asarray(native({"input_ids": jnp.asarray(ids)}), np.float32)
    assert np.allclose(out, ref, atol=atol), np.abs(out - ref).max()


def test_mamba_logits_match_hf():
    """mamba1: selective scan via jax.lax.associative_scan vs the HF
    per-step loop (66th family)."""
    cfg = transformers.MambaConfig(
        vocab_size=128,
        hidden_size=32,
        num_hidden_layers=2,
        state_size=8,
        conv_kernel=4,
        expand=2,
        time_step_rank=4,
        use_conv_bias=True,
        use_bias=False,
    )
    hf = transformers.MambaForCausalLM(cfg).eval()
    native, ncfg = _to_native(hf, cfg.to_dict())
    assert ncfg.version == 1 and ncfg.d_inner == 64 and ncfg.dt_rank == 4
    _compare(hf, native, 128, atol=3e-5)


def test_mamba_untied_and_biases_match_hf():
    """mamba1 with untied head and use_bias on the in/out projections."""
    cfg = transformers.MambaConfig(
        vocab_size=128,
        hidden_size=32,
        num_hidden_layers=1,
        state_size=8,
        time_step_rank=4,
        use_bias=True,
        tie_word_embeddings=False,
    )
    hf = transformers.MambaForCausalLM(cfg).eval()
    native, ncfg = _to_native(hf, cfg.to_dict())
    assert not ncfg.tie_embeddings and ncfg.proj_bias
    _compare(hf, native, 128, atol=3e-5)


def test_falcon_mamba_logits_match_hf():
    """falcon_mamba: mamba1 plus affine-free RMS over the dt/B/C
    selection streams (67th family)."""
    cfg = transformers.FalconMambaConfig(
        vocab_size=128,
        hidden_size=32,
        num_hidden_layers=2,
        state_size=8,
        time_step_rank=4,
        mixer_rms_eps=1e-6,
    )
    hf = transformers.FalconMambaForCausalLM(cfg).eval()
    native, ncfg = _to_native(hf, cfg.to_dict())
    assert ncfg.mixer_rms_eps == 1e-6
    _compare(hf, native, 128, atol=3e-5)


def test_mamba2_logits_match_hf():
    """mamba2: chunked SSD in f32 einsums vs HF torch_forward, with a
    seqlen that is NOT a chunk multiple so the padding path runs (68th
    family)."""
    cfg = transformers.Mamba2Config(
        vocab_size=128,
        hidden_size=32,
        num_hidden_layers=2,
        state_size=8,
        num_heads=4,
        head_dim=16,
        n_groups=2,
        expand=2,
        chunk_size=8,
        conv_kernel=4,
    )
    hf = transformers.Mamba2ForCausalLM(cfg).eval()
    native, ncfg = _to_native(hf, cfg.to_dict())
    assert ncfg.version == 2 and ncfg.n_heads == 4 and ncfg.n_groups == 2
    assert ncfg.d_inner == 64
    # 12 % chunk_size(8) != 0 -> exercises chunk padding; 20 spans 3 chunks
    _compare(hf, native, 128, atol=3e-5, seqlen=12)
    _compare(hf, native, 128, atol=3e-5, seqlen=20)


def test_mamba2_multichunk_state_carry():
    """The inter-chunk recurrence must carry states across >2 chunks:
    a long constant prefix then a distinctive token — last-position
    logits must match HF exactly."""
    cfg = transformers.Mamba2Config(
        vocab_size=64,
        hidden_size=16,
        num_hidden_layers=1,
        state_size=4,
        num_heads=2,
        head_dim=16,
        n_groups=1,
        chunk_size=4,
    )
    hf = transformers.Mamba2ForCausalLM(cfg).eval()
    native, _ = _to_native(hf, cfg.to_dict())
    ids = np.full((1, 19), 7, np.int64)
    ids[0, -1] = 33
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).logits.float().numpy()
    out = np.asarray(native({"input_ids": jnp.asarray(ids)}), np.float32)
    assert np.allclose(out, ref, atol=3e-5), np.abs(out - ref).max()


def test_builder_generic_mamba_snapshot(tmp_path):
    """A mamba2 HF snapshot dir builds + loads through the generic
    trainer builder path (the AutoModelForCausalLM analogue for SSMs)."""
    import safetensors.numpy

    from apps.trainer_llm import builder

    cfg = transformers.Mamba2Config(
        vocab_size=128,
        hidden_size=32,
        num_hidden_layers=1,
        state_size=8,
        num_heads=4,
        head_dim=16,
        n_groups=1,
        chunk_size=8,
    )
    hf = transformers.Mamba2ForCausalLM(cfg).eval()
    (tmp_path / "config.json").write_text(cfg.to_json_string())
    sd = {
        k: v.detach().to(torch.float32).numpy().copy()
        for k, v in hf.state_dict().items()
    }
    safetensors.numpy.save_file(sd, tmp_path / "model.safetensors")
    model, tokenizer = builder.make_model_and_tokenizer(
        model_name="someorg/a-novel-mamba2",
        dtype="float32",
        checkpoint_path=str(tmp_path),
    )
    _compare(hf, model, 128, atol=3e-5)


def test_mamba_decompose_and_roundtrip():
    """dwain surgery + modconfig round-trip on the SSM graph: the
    in/x/dt/out projections are ordinary decomposable sites."""
    from ptdeco_tpu import dwain, engine

    cfg = models.MambaConfig(
        vocab_size=64,
        dim=32,
        n_layers=2,
        d_inner=64,
        d_state=8,
        dt_rank=4,
        dtype=jnp.float32,
    )
    model = models.MambaLM.create(jax.random.PRNGKey(0), cfg)

    def batches(seed):
        key = jax.random.PRNGKey(seed)
        while True:
            key, sub = jax.random.split(key)
            yield {"input_ids": jax.random.randint(sub, (2, 12), 0, 64)}

    names = engine.get_decomposeable_submodule_names(model)
    keep = {
        "backbone.layers.0.mixer.in_proj",
        "backbone.layers.1.mixer.out_proj",
    }
    assert keep <= set(names)
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

    fresh = models.MambaLM.create(jax.random.PRNGKey(9), cfg)
    fresh = utils.apply_decompose_config(fresh, deco_cfg)
    fresh = utils.load_state_dict(fresh, utils.state_dict(model2))
    b = next(batches(3))
    np.testing.assert_allclose(
        np.asarray(model2(b)), np.asarray(fresh(b)), atol=2e-5
    )


def _compare_t(hf_model, native, vocab, atol, seqlen=12):
    _compare(hf_model, native, vocab, atol, seqlen)


def _to_native_transformer(hf_model, hf_cfg_dict):
    sd = {
        k: v.detach().to(torch.float32).numpy()
        for k, v in hf_model.state_dict().items()
        if not k.endswith("rotary_emb.inv_freq")
    }
    tr = hf_loader.translator_for(hf_cfg_dict)
    if tr is not None:
        sd = tr(sd)
    cfg = models.TransformerConfig.from_hf_config(
        hf_cfg_dict, dtype=jnp.float32
    )
    native = models.CausalLM.create(jax.random.PRNGKey(0), cfg)
    return utils.load_state_dict(native, sd, strict=False), cfg


def test_bamba_hybrid_logits_match_hf():
    """bamba: hybrid mamba2/attention layers sharing the llama MLP —
    the first hybrid family (69th).  Seqlen crosses chunk boundaries and
    the attention layer uses partial rotary."""
    if not hasattr(transformers, "BambaForCausalLM"):
        pytest.skip("transformers without bamba")
    cfg = transformers.BambaConfig(
        vocab_size=128,
        hidden_size=32,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=2,
        intermediate_size=48,
        mamba_n_heads=4,
        mamba_d_state=8,
        mamba_d_head=16,
        mamba_chunk_size=8,
        attn_layer_indices=[1],
        pad_token_id=0,
    )
    hf = transformers.BambaForCausalLM(cfg).eval()
    native, ncfg = _to_native_transformer(hf, cfg.to_dict())
    assert ncfg.layer_types == ("mamba", "attention", "mamba")
    assert ncfg.mamba is not None and ncfg.mamba.version == 2
    assert ncfg.rope_partial_factor == 0.5
    _compare_t(hf, native, 128, atol=3e-5, seqlen=12)


def test_granitemoehybrid_logits_match_hf():
    """granitemoehybrid: granitemoeshared's fused MoE + scalar
    multipliers with per-layer mamba2/NoPE-attention selection (70th
    family)."""
    if not hasattr(transformers, "GraniteMoeHybridForCausalLM"):
        pytest.skip("transformers without granitemoehybrid")
    cfg = transformers.GraniteMoeHybridConfig(
        vocab_size=128,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        intermediate_size=48,
        num_local_experts=4,
        num_experts_per_tok=2,
        shared_intermediate_size=48,
        mamba_n_heads=4,
        mamba_d_state=8,
        mamba_d_head=16,
        mamba_chunk_size=8,
        layer_types=["mamba", "attention"],
        embedding_multiplier=3.0,
        residual_multiplier=0.5,
        attention_multiplier=0.25,
        logits_scaling=2.0,
        pad_token_id=0,
    )
    hf = transformers.GraniteMoeHybridForCausalLM(cfg).eval()
    native, ncfg = _to_native_transformer(hf, cfg.to_dict())
    assert ncfg.layer_types == ("mamba", "attention")
    assert not ncfg.use_rope  # NoPE unless position_embedding_type=rope
    assert ncfg.mamba is not None and ncfg.mamba.version == 2
    _compare_t(hf, native, 128, atol=3e-5, seqlen=12)


def test_jamba_logits_match_hf():
    """jamba: mamba1 mixers with AFFINE dt/b/c stream norms, periodic
    NoPE attention, periodic mixtral-routing MoE without top-k
    renormalization (71st family)."""
    if not hasattr(transformers, "JambaForCausalLM"):
        pytest.skip("transformers without jamba")
    cfg = transformers.JambaConfig(
        vocab_size=128,
        hidden_size=32,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        intermediate_size=48,
        num_experts=4,
        num_experts_per_tok=2,
        expert_layer_period=2,
        expert_layer_offset=1,
        attn_layer_period=4,
        attn_layer_offset=2,
        mamba_d_state=8,
        mamba_dt_rank=4,
        use_mamba_kernels=False,
        pad_token_id=0,
    )
    hf = transformers.JambaForCausalLM(cfg).eval()
    # the stream norms must be non-unit so a dropped norm cannot hide
    with torch.no_grad():
        for n, p in hf.named_parameters():
            if "layernorm" in n and ("dt_" in n or "b_" in n or "c_" in n):
                p.copy_(torch.rand_like(p) + 0.5)
    native, ncfg = _to_native_transformer(hf, cfg.to_dict())
    assert ncfg.layer_types == ("mamba", "mamba", "attention", "mamba")
    assert ncfg.mlp_only_layers == (0, 2)
    assert ncfg.mamba is not None and ncfg.mamba.version == 1
    assert ncfg.mamba.stream_norms and not ncfg.norm_topk_prob
    _compare_t(hf, native, 128, atol=3e-5, seqlen=12)


def test_falcon_h1_logits_match_hf():
    """falcon_h1: EVERY layer runs mamba2 IN PARALLEL with rotary GQA
    attention; all nine mup multipliers set to distinctive non-unit
    values and folded into weights / existing knobs on load (72nd
    family)."""
    if not hasattr(transformers, "FalconH1ForCausalLM"):
        pytest.skip("transformers without falcon_h1")
    cfg = transformers.FalconH1Config(
        vocab_size=128,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        intermediate_size=48,
        mamba_n_heads=4,
        mamba_d_state=8,
        mamba_d_head="auto",
        mamba_expand=2,
        mamba_chunk_size=8,
        embedding_multiplier=2.0,
        lm_head_multiplier=0.5,
        attention_in_multiplier=1.5,
        attention_out_multiplier=0.75,
        key_multiplier=1.25,
        mlp_multipliers=[1.3, 0.7],
        ssm_multipliers=[1.1, 0.9, 1.2, 0.8, 1.4],
        ssm_in_multiplier=0.6,
        ssm_out_multiplier=1.7,
        pad_token_id=0,
    )
    hf = transformers.FalconH1ForCausalLM(cfg).eval()
    native, ncfg = _to_native_transformer(hf, cfg.to_dict())
    assert ncfg.parallel_ssm and ncfg.mamba is not None
    assert not ncfg.mamba.gated_norm  # mamba_rms_norm defaults False
    assert ncfg.embedding_multiplier == 2.0 and ncfg.logit_scale == 0.5
    _compare_t(hf, native, 128, atol=5e-5, seqlen=12)


def test_lfm2_logits_match_hf():
    """lfm2: gated short-conv mixers hybridized with per-head-qk-norm
    GQA attention; final norm is the checkpoint's 'embedding_norm'
    (74th family)."""
    if not hasattr(transformers, "Lfm2ForCausalLM"):
        pytest.skip("transformers without lfm2")
    cfg = transformers.Lfm2Config(
        vocab_size=128,
        hidden_size=32,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=2,
        intermediate_size=48,
        conv_L_cache=3,
        layer_types=["conv", "full_attention", "conv"],
        pad_token_id=0,
    )
    hf = transformers.Lfm2ForCausalLM(cfg).eval()
    native, ncfg = _to_native_transformer(hf, cfg.to_dict())
    assert ncfg.layer_types == ("conv", "full_attention", "conv")
    assert ncfg.conv_mixer == (3, False) and ncfg.qk_norm
    _compare_t(hf, native, 128, atol=3e-5, seqlen=12)


def test_minimax_logits_match_hf():
    """minimax: lightning linear attention (block-decayed KᵀV scan)
    hybridized with rotary full attention over a mixtral MoE, using the
    norm-first scaled-residual wiring with non-unit factors (75th
    family).  block_size 4 < seqlen 12 exercises the inter-block
    recurrence."""
    if not hasattr(transformers, "MiniMaxForCausalLM"):
        pytest.skip("transformers without minimax")
    cfg = transformers.MiniMaxConfig(
        vocab_size=128,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        intermediate_size=48,
        num_local_experts=4,
        num_experts_per_tok=2,
        layer_types=["linear_attention", "full_attention"],
        block_size=4,
        full_attn_alpha_factor=0.9,
        full_attn_beta_factor=1.1,
        linear_attn_alpha_factor=1.2,
        linear_attn_beta_factor=0.8,
        mlp_alpha_factor=1.05,
        mlp_beta_factor=0.95,
        pad_token_id=0,
    )
    hf = transformers.MiniMaxForCausalLM(cfg).eval()
    native, ncfg = _to_native_transformer(hf, cfg.to_dict())
    assert ncfg.layer_types == ("linear_attention", "full_attention")
    assert ncfg.minimax_residual_factors == (0.9, 1.1, 1.2, 0.8, 1.05, 0.95)
    assert ncfg.lightning_block_size == 4
    _compare_t(hf, native, 128, atol=3e-5, seqlen=12)


def test_qwen3_next_logits_match_hf():
    """qwen3_next: gated-DeltaNet linear attention (chunked delta rule
    via a unit-triangular solve + lax.scan over chunks) hybridized with
    gated full attention (fused sigmoid output gate in q_proj, per-head
    (1+w) qk norms, partial split-half rotary) over a qwen3 MoE with a
    gated shared expert (77th family).  chunk crossing: seqlen 12 with
    delta-rule chunk size 64 uses one padded chunk; a second compare at
    seqlen 20 exercises nothing new there but crosses the conv window."""
    if not hasattr(transformers, "Qwen3NextForCausalLM"):
        pytest.skip("transformers without qwen3_next")
    cfg = transformers.Qwen3NextConfig(
        vocab_size=128,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=8,
        intermediate_size=48,
        num_experts=4,
        num_experts_per_tok=2,
        moe_intermediate_size=32,
        shared_expert_intermediate_size=32,
        decoder_sparse_step=1,
        linear_num_key_heads=2,
        linear_num_value_heads=4,
        linear_key_head_dim=8,
        linear_value_head_dim=8,
        linear_conv_kernel_dim=3,
        layer_types=["linear_attention", "full_attention"],
        partial_rotary_factor=0.25,
        pad_token_id=0,
    )
    hf = transformers.Qwen3NextForCausalLM(cfg).eval()
    native, ncfg = _to_native_transformer(hf, cfg.to_dict())
    assert ncfg.gdn == (2, 4, 8, 8, 3) and ncfg.attn_gate
    assert ncfg.norm_plus_one and ncfg.rope_partial_factor == 0.25
    assert ncfg.shared_expert_hidden_dim == 32
    _compare_t(hf, native, 128, atol=5e-5, seqlen=12)
    # the delta-rule chunk size is fixed at 64 on both sides: seqlen 80
    # crosses a chunk boundary, exercising the inter-chunk state scan
    _compare_t(hf, native, 128, atol=1e-4, seqlen=80)


def test_recurrent_gemma_logits_match_hf():
    """recurrent_gemma (Griffin): RG-LRU temporal blocks (block-diagonal
    sigmoid gates, sqrt(1-a^2) input scaling, associative-scan
    recurrence) cycling with sliding-window attention (biased o_proj,
    partial split-half rotary), gemma-style scaling/norms/soft cap
    (78th family).  HF enforces the attention window only on the decode cache — prefill is plain causal, matched here."""
    if not hasattr(transformers, "RecurrentGemmaForCausalLM"):
        pytest.skip("transformers without recurrent_gemma")
    cfg = transformers.RecurrentGemmaConfig(
        vocab_size=128,
        hidden_size=32,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=8,
        intermediate_size=96,
        lru_width=32,
        conv1d_width=3,
        attention_window_size=4,
        block_types=["recurrent", "attention"],
        logits_soft_cap=30.0,
        pad_token_id=0,
        # HF's cached prefill slices keys to the last `window` while the
        # mask keeps its first columns — early queries get misaligned
        # masks (verified here).  use_cache=False is the coherent
        # training/eval forward: plain causal, which we match.
        use_cache=False,
    )
    hf = transformers.RecurrentGemmaForCausalLM(cfg).eval()
    native, ncfg = _to_native_transformer(hf, cfg.to_dict())
    assert ncfg.layer_types == (
        "recurrent", "full_attention", "recurrent",
    )
    assert ncfg.rglru == (32, 3, 4) and ncfg.hidden_dim == 48
    assert ncfg.o_proj_bias and ncfg.mlp_bias and ncfg.norm_plus_one
    assert ncfg.final_logit_softcap == 30.0 and ncfg.scale_embeddings
    _compare_t(hf, native, 128, atol=5e-5, seqlen=12)


def test_rwkv_logits_match_hf():
    """rwkv v4 (117th family): the WKV max-stabilized recurrence as a
    lax.scan (elementwise carry; all projections are whole-sequence
    matmuls) vs HF's rwkv_linear_attention_cpu per-step loop."""
    cfg = transformers.RwkvConfig(
        vocab_size=128,
        hidden_size=32,
        num_hidden_layers=2,
        attention_hidden_size=32,
        intermediate_size=112,
        context_length=64,
    )
    hf = transformers.RwkvForCausalLM(cfg).eval()
    sd = {
        k: v.detach().to(torch.float32).numpy()
        for k, v in hf.state_dict().items()
    }
    sd = hf_loader.make_rwkv_translator(cfg.to_dict())(sd)
    ncfg = models.RwkvConfig.from_hf_config(cfg.to_dict(), dtype=jnp.float32)
    assert ncfg.hidden_dim == 112 and ncfg.attn_dim == 32
    native = models.RwkvLM.create(jax.random.PRNGKey(0), ncfg)
    native = utils.load_state_dict(native, sd, strict=False)
    rng = np.random.RandomState(0)
    ids = rng.randint(0, 128, (2, 12))
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).logits.to(torch.float32).numpy()
    out = np.asarray(native({"input_ids": jnp.asarray(ids)}), np.float32)
    assert np.allclose(out, ref, atol=3e-4), np.abs(out - ref).max()


def test_rwkv_decomposes():
    """rwkv's projections are plain nn.Linear sites — a dwain round-trip
    on the channel-mix key/value works like any transformer MLP."""
    ncfg = models.RwkvConfig(
        vocab_size=64, dim=16, n_layers=1, hidden_dim=64, attn_dim=16,
    )
    native = models.RwkvLM.create(jax.random.PRNGKey(0), ncfg)
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 64, (2, 10)))
    logits = native({"input_ids": ids})
    assert np.isfinite(np.asarray(logits)).all()
    from ptdeco_tpu import nn

    names = [
        n for n, m in nn.named_modules(native) if isinstance(m, nn.Linear)
    ]
    assert "blocks.0.feed_forward.key" in names


def test_zamba_logits_match_hf():
    """zamba v1 (119th family): multi-head mamba1 backbone (interleaved
    (x, gate) in_proj pairs, block-diagonal per-head B/C selections) with
    the SHARED concat-input transformer block — rope-free attention at
    scale (head_dim/2)^-0.5, no internal residuals, linear-projected into
    the mamba stream."""
    cfg = transformers.ZambaConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=8,
        num_attention_heads=4,
        num_key_value_heads=4,
        attention_head_dim=16,
        mamba_expand=2,
        mamba_d_state=4,
        mamba_d_conv=4,
        mamba_dt_rank=2,
        n_mamba_heads=2,
        attn_layer_period=3,
        attn_layer_offset=2,
        max_position_embeddings=64,
        use_mamba_kernels=False,
    )
    hf = transformers.ZambaForCausalLM(cfg).eval()
    sd = {
        k: v.detach().to(torch.float32).numpy()
        for k, v in hf.state_dict().items()
    }
    sd = hf_loader.make_zamba_translator(cfg.to_dict())(sd)
    ncfg = models.ZambaConfig.from_hf_config(cfg.to_dict(), dtype=jnp.float32)
    assert ncfg.layers_block_type.count("hybrid") == 2
    native = models.ZambaLM.create(jax.random.PRNGKey(0), ncfg)
    native = utils.load_state_dict(native, sd, strict=False)
    rng = np.random.RandomState(0)
    ids = rng.randint(0, 128, (2, 12))
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).logits.to(torch.float32).numpy()
    out = np.asarray(native({"input_ids": jnp.asarray(ids)}), np.float32)
    assert np.allclose(out, ref, atol=3e-4), np.abs(out - ref).max()


def test_zamba2_logits_match_hf():
    """zamba2 (120th family): mamba2 (SSD) mixers, rotary on the shared
    concat-input attention (use_mem_rope), and per-hybrid-layer LoRA
    adapters on the shared gate_up / q/k/v projections FOLDED exactly
    into dense per-layer weights on load."""
    cfg = transformers.Zamba2Config(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=8,
        num_attention_heads=4,
        num_key_value_heads=4,
        attention_head_dim=16,
        mamba_expand=2,
        mamba_d_state=4,
        mamba_d_conv=4,
        mamba_ngroups=1,
        mamba_headdim=8,
        n_mamba_heads=8,
        layers_block_type=[
            "mamba", "mamba", "hybrid", "mamba",
            "mamba", "hybrid", "mamba", "mamba",
        ],
        max_position_embeddings=64,
        use_mem_rope=True,
        use_shared_attention_adapter=True,
        adapter_rank=8,
        chunk_size=4,
    )
    hf = transformers.Zamba2ForCausalLM(cfg).eval()
    sd = {
        k: v.detach().to(torch.float32).numpy()
        for k, v in hf.state_dict().items()
    }
    sd = hf_loader.make_zamba_translator(cfg.to_dict())(sd)
    ncfg = models.ZambaConfig.from_hf_config(cfg.to_dict(), dtype=jnp.float32)
    assert ncfg.version == 2 and ncfg.use_mem_rope
    native = models.ZambaLM.create(jax.random.PRNGKey(0), ncfg)
    native = utils.load_state_dict(native, sd, strict=False)
    rng = np.random.RandomState(0)
    ids = rng.randint(0, 128, (2, 12))
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).logits.to(torch.float32).numpy()
    out = np.asarray(native({"input_ids": jnp.asarray(ids)}), np.float32)
    # 8 stacked chunked-SSD mixers accumulate f32 reduction-order noise
    # (max |diff| ~4e-4); structural breaks show up at ~0.1+
    assert np.allclose(out, ref, atol=1e-3), np.abs(out - ref).max()
