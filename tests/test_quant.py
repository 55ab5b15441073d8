"""Weight-only int8 serving quantization (ptdeco_tpu/quant.py): grid
error bounds, idempotence, whole-model swap, composition with factor-pair
decomposition, and serving-cache compatibility.

No reference analogue: the reference stores f32/bf16 torch checkpoints
and has no serving path (deployment ends at lm_eval loglikelihood
scoring, /root/reference/examples/trainer_llm/metrics.py:81-107)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ptdeco_tpu import nn, quant, serving, utils

from tests.test_serving import make_lm, naive_greedy


def test_quantize_error_bound_and_forward():
    lin = nn.Linear.create(jax.random.PRNGKey(0), 32, 48)
    q = quant.quantize_linear(lin)
    assert q.w_q.dtype == jnp.int8 and q.w_q.shape == (32, 48)
    deq = np.asarray(q.w_q, np.float32) * np.asarray(q.scale)[None, :]
    err = np.abs(deq - np.asarray(lin.kernel))
    # symmetric absmax grid: rounding error <= scale/2 per channel
    assert (err <= np.asarray(q.scale)[None, :] * 0.5 + 1e-8).all()
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32))
    got, want = np.asarray(q(x)), np.asarray(lin(x))
    assert np.abs(got - want).mean() < 0.05 * np.abs(want).mean() + 1e-3


def test_quantization_idempotent_on_grid():
    """Each channel's absmax weight lands exactly on +-127, so
    quantize(dequantize(q)) must reproduce (w_q, scale) EXACTLY."""
    lin = nn.Linear.create(jax.random.PRNGKey(2), 16, 24)
    q = quant.quantize_linear(lin)
    q2 = quant.quantize_linear(quant.dequantize_linear(q))
    np.testing.assert_array_equal(np.asarray(q2.w_q), np.asarray(q.w_q))
    np.testing.assert_array_equal(np.asarray(q2.scale), np.asarray(q.scale))


def test_zero_channel_safe():
    lin = nn.Linear(kernel=jnp.zeros((8, 4)), bias=None)
    q = quant.quantize_linear(lin)
    assert (np.asarray(q.scale) == 1.0).all()
    np.testing.assert_array_equal(np.asarray(q(jnp.ones((2, 8)))), 0.0)


def test_quantize_whole_model_and_restore():
    lm, _ = make_lm(key=30)
    n_lin = sum(
        1 for _, m in nn.named_modules(lm) if type(m) is nn.Linear
    )
    qlm = quant.quantize_for_serving(lm)
    n_q = sum(
        1 for _, m in nn.named_modules(qlm) if type(m) is quant.QuantLinear
    )
    assert n_q == n_lin > 0
    assert not any(
        type(m) is nn.Linear for _, m in nn.named_modules(qlm)
    )
    ids = jax.random.randint(jax.random.PRNGKey(31), (2, 6), 0, 64)
    ref = np.asarray(lm({"input_ids": ids}))
    got = np.asarray(qlm({"input_ids": ids}))
    # lossy but close: int8 weight grid on a tiny random model
    assert np.abs(got - ref).mean() < 0.05 * np.abs(ref).mean() + 1e-2
    # restore: every site back to a plain Linear, kernels on the grid
    back = quant.dequantize_for_serving(qlm)
    assert not any(
        type(m) is quant.QuantLinear for _, m in nn.named_modules(back)
    )
    assert set(utils.state_dict(back)) == set(utils.state_dict(lm))


def test_quantized_model_decodes_through_cache():
    """The serving path must treat QuantLinear projections like any
    Linear: cached generate == naive uncached greedy on the SAME
    quantized model (bit-exact decisions)."""
    lm, _ = make_lm(key=32)
    qlm = quant.quantize_for_serving(lm)
    prompt = jax.random.randint(jax.random.PRNGKey(33), (2, 4), 0, 64)
    want = naive_greedy(qlm, prompt, 6)
    got = serving.generate(qlm, prompt, 6)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_quantize_composes_with_factor_pairs():
    """Decomposed sites are Sequential pairs of plain Linears — int8
    quantization hits each factor, multiplying low-rank (fewer weights)
    with int8 (fewer bytes per weight)."""
    from ptdeco_tpu import engine

    lm, _ = make_lm(key=34)
    name = "model.layers.0.mlp.up_proj"
    site = engine.get_site(lm, name)
    kern = engine.get_site_kernel2d(lm, site)
    k1 = (kern[:, :4] * 0.5).astype(kern.dtype)
    k2 = jnp.ones((4, kern.shape[1]), kern.dtype) * 0.1
    deco = nn.replace_submodule(
        lm, name, engine.build_decomposed_module(lm, site, k1, k2)
    )
    qlm = quant.quantize_for_serving(deco)
    pair = nn.get_submodule(qlm, name)
    assert all(
        type(layer) is quant.QuantLinear for layer in pair.layers
    )
    prompt = jax.random.randint(jax.random.PRNGKey(35), (1, 4), 0, 64)
    want = naive_greedy(qlm, prompt, 4)
    got = serving.generate(qlm, prompt, 4)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_skip_names_and_min_features():
    lm, _ = make_lm(key=36)
    qlm = quant.quantize_for_serving(
        lm, skip_names=("lm_head",), min_features=20
    )
    assert type(nn.get_submodule(qlm, "lm_head")) is nn.Linear
    # k_proj is 32 -> 16 (GQA): min dim below 20, left dense
    assert (
        type(nn.get_submodule(qlm, "model.layers.0.self_attn.k_proj"))
        is nn.Linear
    )
    # q_proj is 32 -> 32: quantized
    assert (
        type(nn.get_submodule(qlm, "model.layers.0.self_attn.q_proj"))
        is quant.QuantLinear
    )


def test_quantize_conv2d_bound_idempotence_and_groups():
    conv = nn.Conv2d.create(
        jax.random.PRNGKey(40), 8, 16, 3, stride=2, padding=1, groups=2
    )
    q = quant.quantize_conv2d(conv)
    assert q.w_q.dtype == jnp.int8 and q.w_q.shape == conv.kernel.shape
    deq = np.asarray(q.w_q, np.float32) * np.asarray(q.scale)
    err = np.abs(deq - np.asarray(conv.kernel))
    assert (err <= np.asarray(q.scale) * 0.5 + 1e-8).all()
    x = jax.random.normal(jax.random.PRNGKey(41), (2, 8, 8, 8))
    got, want = np.asarray(q(x)), np.asarray(conv(x))
    assert np.abs(got - want).mean() < 0.05 * np.abs(want).mean() + 1e-3
    q2 = quant.quantize_conv2d(quant.dequantize_conv2d(q))
    np.testing.assert_array_equal(np.asarray(q2.w_q), np.asarray(q.w_q))
    np.testing.assert_array_equal(np.asarray(q2.scale), np.asarray(q.scale))
    # statics survive the round trip
    back = quant.dequantize_conv2d(q)
    assert back.stride == conv.stride and back.groups == conv.groups
    assert back.padding == conv.padding


def test_quantize_vision_model():
    """quantize_for_serving covers Conv2d sites: a resnet-style model
    quantizes whole, forward stays close, restore is exact-typed."""
    from ptdeco_tpu import models

    model = models.resnet18(jax.random.PRNGKey(42), num_classes=10)
    n_sites = sum(
        1
        for _, m in nn.named_modules(model)
        if type(m) in (nn.Linear, nn.Conv2d)
    )
    qm = quant.quantize_for_serving(model)
    n_q = sum(
        1
        for _, m in nn.named_modules(qm)
        if type(m) in (quant.QuantLinear, quant.QuantConv2d)
    )
    assert n_q == n_sites > 0
    x = jax.random.normal(jax.random.PRNGKey(43), (2, 32, 32, 3)) * 0.5
    want = np.asarray(model(x))
    got = np.asarray(qm(x))
    assert np.abs(got - want).mean() < 0.1 * np.abs(want).mean() + 5e-2
    back = quant.dequantize_for_serving(qm)
    assert set(utils.state_dict(back)) == set(utils.state_dict(model))


def test_quantized_generate_with_tp_sharded_params():
    """int8 TP: w_q shards like kernel, the per-channel scale follows the
    out dim (column sites shard it, row sites replicate) — each shard
    dequantizes its own columns locally, and mesh generate must produce
    EXACTLY the single-device tokens."""
    from ptdeco_tpu import parallel
    from ptdeco_tpu.parallel import shardings as sh

    lm, _ = make_lm(key=38)
    qlm = quant.quantize_for_serving(lm)
    prompt = jax.random.randint(jax.random.PRNGKey(39), (4, 5), 0, 64)
    want = serving.generate(qlm, prompt, 5)
    mesh = parallel.make_mesh(dp=4, tp=2)
    sharded = sh.shard_params(qlm, mesh)
    up = nn.get_submodule(sharded, "model.layers.0.mlp.up_proj")
    assert up.w_q.sharding.spec == jax.sharding.PartitionSpec(None, "tp")
    assert up.scale.sharding.spec == jax.sharding.PartitionSpec("tp")
    down = nn.get_submodule(sharded, "model.layers.0.mlp.down_proj")
    assert down.w_q.sharding.spec == jax.sharding.PartitionSpec("tp", None)
    got = serving.generate(sharded, prompt, 5)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_quantized_moe_takes_grouped_path():
    """Quantized (QuantLinear) tuple-form MoE experts pass the grouped
    path's pristine check under ``allow_quant`` — FLOPs stay ∝ top_k and
    the stacked int8 grid dequantizes into the activation dtype — while
    ``stack_moe_experts`` (which must read ``.kernel``) still refuses
    them.  Cached generate must equal the uncached quantized model, and
    the grouped forward must equal the zero-masked dense reference."""
    from ptdeco_tpu import models
    from ptdeco_tpu.models.moe_stack import StackedMoEMLP, stack_moe_experts

    cfg = models.TransformerConfig(
        vocab_size=64, dim=32, n_layers=2, n_heads=4, n_kv_heads=2,
        hidden_dim=48, n_experts=4, n_experts_per_tok=2,
        moe_hidden_dim=48,
    )
    lm = models.CausalLM.create(jax.random.PRNGKey(44), cfg)
    qlm = quant.quantize_for_serving(lm)
    gate = nn.get_submodule(
        qlm, "model.layers.0.mlp.experts.0.gate_proj"
    )
    assert type(gate) is quant.QuantLinear
    moe = nn.get_submodule(qlm, "model.layers.0.mlp")
    assert not moe._experts_are_pristine()  # strict: stacking refuses
    assert moe._experts_are_pristine(allow_quant=True)
    st = stack_moe_experts(qlm)
    assert not any(
        type(m) is StackedMoEMLP for _, m in nn.named_modules(st)
    )
    # grouped forward == zero-masked dense reference on the same weights
    x = jax.random.normal(jax.random.PRNGKey(46), (2, 5, 32))
    np.testing.assert_allclose(
        np.asarray(moe._grouped(x, None)),
        np.asarray(moe._dense_masked(x, None)),
        atol=1e-5,
    )
    prompt = jax.random.randint(jax.random.PRNGKey(45), (2, 4), 0, 64)
    want = naive_greedy(qlm, prompt, 4)
    got = serving.generate(qlm, prompt, 4)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_mixed_quantized_moe_falls_back_to_dense():
    """A slot with MIXED Linear/QuantLinear across experts (e.g. one
    expert skipped via skip_names) must refuse the grouped path — the
    stacked dequant assumes slot-uniform types."""
    from ptdeco_tpu import models

    cfg = models.TransformerConfig(
        vocab_size=64, dim=32, n_layers=1, n_heads=4, n_kv_heads=2,
        hidden_dim=48, n_experts=4, n_experts_per_tok=2,
        moe_hidden_dim=48,
    )
    lm = models.CausalLM.create(jax.random.PRNGKey(47), cfg)
    qlm = quant.quantize_for_serving(
        lm, skip_names=("model.layers.0.mlp.experts.0.gate_proj",)
    )
    moe = nn.get_submodule(qlm, "model.layers.0.mlp")
    assert not moe._experts_are_pristine(allow_quant=True)
    # still exact through the dense path
    prompt = jax.random.randint(jax.random.PRNGKey(48), (2, 4), 0, 64)
    want = naive_greedy(qlm, prompt, 3)
    got = serving.generate(qlm, prompt, 3)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def _moe_lm(key=46, n_experts=4, dim=32, hidden=64):
    from ptdeco_tpu import models

    cfg = models.TransformerConfig(
        vocab_size=64, dim=dim, n_layers=2, n_heads=4, n_kv_heads=2,
        hidden_dim=hidden, n_experts=n_experts, n_experts_per_tok=2,
        moe_hidden_dim=hidden,
    )
    return models.CausalLM.create(jax.random.PRNGKey(key), cfg)


def test_quantize_stacked_moe():
    """int8 stacked experts: quantize_for_serving fills the scale_*
    fields in place of new module types, the router gate stays full
    precision, the fused-dequant forward equals the materialized-dequant
    forward, and unstacking int8 is refused loudly."""
    from ptdeco_tpu import models

    lm = _moe_lm()
    stacked = models.stack_moe_experts(lm)
    q = quant.quantize_for_serving(stacked)
    moe = nn.get_submodule(q, "model.layers.0.mlp")
    assert moe.w_gate.dtype == jnp.int8 and moe.scale_gate is not None
    assert moe.scale_gate.shape == (4, 64)
    # router gate auto-skipped (routing-decision-critical)
    assert type(moe.gate) is nn.Linear
    batch = {"input_ids": jnp.arange(12, dtype=jnp.int32).reshape(2, 6) % 64}
    deq = quant.dequantize_for_serving(q)
    dmoe = nn.get_submodule(deq, "model.layers.0.mlp")
    assert dmoe.scale_gate is None and dmoe.w_gate.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(q(batch)), np.asarray(deq(batch)), atol=1e-5
    )
    # int8 error stays small vs the fp stacked model
    ref = np.asarray(stacked(batch))
    got = np.asarray(q(batch))
    assert np.abs(got - ref).mean() < 0.05 * np.abs(ref).mean() + 1e-2
    with pytest.raises(ValueError, match="dequantize_for_serving"):
        models.unstack_moe_experts(q)
    # dequantize first -> unstack round-trips to tuple-of-expert MLPs
    back = models.unstack_moe_experts(deq)
    assert type(nn.get_submodule(back, "model.layers.0.mlp")).__name__ == (
        "MoEMLP"
    )
    # idempotent: a second pass leaves the quantized layer alone
    q2 = quant.quantize_for_serving(q)
    np.testing.assert_array_equal(
        np.asarray(nn.get_submodule(q2, "model.layers.0.mlp").w_gate),
        np.asarray(moe.w_gate),
    )


@pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)
def test_quantized_stacked_moe_ep_sharding():
    """The int8 expert tensors keep their ep x tp placement and the
    (E, out) scales follow (ep on the expert axis, tp on the out dim for
    gate/up, replicated for down); mesh forward matches single-device."""
    from ptdeco_tpu import models, parallel
    from ptdeco_tpu.parallel import shardings as sh

    lm = _moe_lm(key=47, hidden=64)
    q = quant.quantize_for_serving(models.stack_moe_experts(lm))
    batch = {"input_ids": jnp.arange(32, dtype=jnp.int32).reshape(4, 8) % 64}
    ref = np.asarray(q(batch))
    mesh = parallel.make_mesh(dp=2, ep=2, tp=2)
    sharded = sh.shard_params(q, mesh)
    params = dict(nn.named_parameters(sharded))
    wq = params["model.layers.0.mlp.w_gate"]
    assert wq.sharding.spec[0] == "ep" and wq.sharding.spec[2] == "tp"
    assert wq.addressable_shards[0].data.shape[0] == 2  # E/ep experts
    sg = params["model.layers.0.mlp.scale_gate"]
    assert sg.sharding.spec == jax.sharding.PartitionSpec("ep", "tp")
    sd = params["model.layers.0.mlp.scale_down"]
    assert sd.sharding.spec == jax.sharding.PartitionSpec("ep", None)
    out = jax.jit(lambda m, b: m(b))(
        sharded, parallel.shard_batch(batch, mesh)
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_moa_router_gate_skipped():
    """JetMoE mixture-of-attention routers are routing-decision-critical
    like MoE routers: quantize_for_serving must leave MoAttention.gate
    full precision while quantizing the expert projections."""
    lm, _ = make_lm(
        key=48, moa=True, n_experts=4, n_experts_per_tok=2,
        n_kv_heads=2, moe_hidden_dim=16,
    )
    qlm = quant.quantize_for_serving(lm)
    moa = nn.get_submodule(qlm, "model.layers.0.self_attn")
    assert type(moa.gate) is nn.Linear
    assert all(
        type(e) is quant.QuantLinear for e in moa.input_experts
    )
    prompt = jax.random.randint(jax.random.PRNGKey(49), (1, 4), 0, 64)
    want = naive_greedy(qlm, prompt, 4)
    got = serving.generate(qlm, prompt, 4)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_partially_quantized_stacked_moe_guarded():
    """A hand-built stacked layer with only one scale set must refuse to
    unstack, dequantize the quantized tensor only, and not re-quantize
    int8 data."""
    from ptdeco_tpu import models

    stacked = models.stack_moe_experts(_moe_lm(key=50))
    moe = nn.get_submodule(stacked, "model.layers.0.mlp")
    wq, su = quant._quantize_stacked_tensor(moe.w_up)
    partial = moe.replace(w_up=wq, scale_up=su)
    with pytest.raises(ValueError, match="dequantize_for_serving"):
        models.unstack_moe_experts(
            nn.replace_submodule(stacked, "model.layers.0.mlp", partial)
        )
    # idempotence guard: quantize_stacked_moe leaves partial state alone
    assert quant.quantize_stacked_moe(partial) is partial
    deq = quant.dequantize_stacked_moe(partial)
    assert deq.scale_up is None and deq.w_up.dtype == jnp.float32
    np.testing.assert_array_equal(  # untouched tensors pass through
        np.asarray(deq.w_gate), np.asarray(moe.w_gate)
    )


def test_state_dict_export_warns(caplog):
    import logging

    lm, _ = make_lm(key=37)
    qlm = quant.quantize_for_serving(lm)
    with caplog.at_level(logging.WARNING):
        utils.state_dict(qlm)
    assert any("serving-form" in r.getMessage() for r in caplog.records)

def test_int8_grouped_kernel_parity_interpret():
    """ops/gmm_int8.grouped_matmul_int8 (interpret mode) vs the dense
    per-expert reference: random group sizes including an EMPTY group and
    a non-tile-aligned total row count."""
    from ptdeco_tpu.ops.gmm_int8 import (
        grouped_matmul_int8,
        pad_groups_for_tiles,
    )

    rng = np.random.default_rng(0)
    e, k, d_out, bm = 4, 160, 96, 128
    sizes = np.asarray([37, 0, 129, 61], np.int32)  # non-aligned + empty
    m = int(sizes.sum())
    lhs = rng.standard_normal((m, k), np.float32)
    w_q = rng.integers(-127, 128, size=(e, k, d_out)).astype(np.int8)
    scale = (0.01 + rng.random((e, d_out))).astype(np.float32)

    n_tiles = -(-m // bm) + e
    dst, tile_expert, row_expert = pad_groups_for_tiles(
        jnp.asarray(sizes), m, n_tiles, bm
    )
    # layout invariants: dst positions land inside their expert's padded
    # span and tile_expert matches the expert of every real row's tile
    dst_np = np.asarray(dst)
    te_np = np.asarray(tile_expert)
    re_np = np.asarray(row_expert)
    offs = np.concatenate([[0], np.cumsum(((sizes + bm - 1) // bm) * bm)])
    eid = np.repeat(np.arange(e), sizes)
    assert (dst_np >= offs[eid]).all() and (dst_np < offs[eid + 1]).all()
    assert (te_np[dst_np // bm] == eid).all()
    assert (re_np[dst_np] == eid).all()

    xp = jnp.zeros((n_tiles * bm, k), jnp.float32).at[dst].set(lhs)
    got = np.asarray(
        grouped_matmul_int8(
            xp, jnp.asarray(w_q), jnp.asarray(scale), tile_expert,
            bm=bm, interpret=True,
        )
    )[np.asarray(dst)]
    want = np.empty((m, d_out), np.float32)
    start = 0
    for ei, sz in enumerate(sizes):
        wd = w_q[ei].astype(np.float32) * scale[ei][None, :]
        want[start:start + sz] = lhs[start:start + sz] @ wd
        start += sz
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-3)


def test_quantized_moe_int8_kernel_path(monkeypatch):
    """VERDICT r3 #3: the int8 grouped Pallas path (forced through
    interpret mode on CPU) must match the zero-masked dense reference at
    a non-tile-aligned token count, with and without expert biases
    (gpt_oss-style), and through cached generate."""
    from ptdeco_tpu import models
    from ptdeco_tpu.models import transformer as tf

    monkeypatch.setattr(tf, "_INT8_GMM_INTERPRET", True)

    for biased, act in ((False, "silu"), (True, "gptoss_glu")):
        cfg = models.TransformerConfig(
            vocab_size=64, dim=32, n_layers=1, n_heads=4, n_kv_heads=2,
            hidden_dim=48, n_experts=4, n_experts_per_tok=2,
            moe_hidden_dim=48,
            **(
                dict(moe_clamp_limit=7.0) if biased else {}
            ),
        )
        lm = models.CausalLM.create(jax.random.PRNGKey(50), cfg)
        qlm = quant.quantize_for_serving(lm)
        moe = nn.get_submodule(qlm, "model.layers.0.mlp")
        assert type(moe.experts[0].gate_proj) is quant.QuantLinear
        # 2 x 9 tokens * top_k 2 = 36 rows — far from the 128 m-tile
        x = jax.random.normal(jax.random.PRNGKey(51), (2, 9, 32))
        got = moe._grouped_int8(x, None, interpret=True)
        want = moe._dense_masked(x, None)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5
        )
        # dispatch goes through the kernel branch under the forced flag
        np.testing.assert_allclose(
            np.asarray(moe(x)), np.asarray(want), atol=2e-5
        )

    # cached generate through the whole model stays exact vs uncached
    prompt = jax.random.randint(jax.random.PRNGKey(52), (2, 4), 0, 64)
    want_toks = naive_greedy(qlm, prompt, 4)
    got_toks = serving.generate(qlm, prompt, 4)
    np.testing.assert_array_equal(np.asarray(got_toks), np.asarray(want_toks))
