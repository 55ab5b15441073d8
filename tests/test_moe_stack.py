"""Stacked (expert-parallel) MoE form: parity, round-trip, ep sharding.

``models.stack_moe_experts`` converts the tuple-of-expert ``MoEMLP`` into
``StackedMoEMLP`` whose (E, ...) tensors shard over an ``ep`` mesh axis
(parallel/shardings.py rules) — the serving/finetune form for MoE models
whose experts don't fit one chip.  The reference has no parallel layer at
all (SURVEY.md §2.7); these tests pin that the transform is exact, that
it round-trips, that it refuses non-pristine experts, and that the ep
sharding both places the expert axis and preserves the forward.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ptdeco_tpu import models, nn
from ptdeco_tpu.models.transformer import MoEMLP
from ptdeco_tpu.parallel import mesh as pmesh
from ptdeco_tpu.parallel import shardings as psh


def _moe(key=0, n_experts=4, top_k=2, dim=32, hidden=48, **replace):
    cfg = models.TransformerConfig(
        vocab_size=64,
        dim=dim,
        n_layers=1,
        n_heads=4,
        n_kv_heads=2,
        hidden_dim=hidden,
        n_experts=n_experts,
        n_experts_per_tok=top_k,
        moe_hidden_dim=hidden,
    )
    m = MoEMLP.create(jax.random.PRNGKey(key), cfg)
    if replace:
        m = dataclasses.replace(m, **replace)
    return m


def _x(key=1, b=2, s=6, dim=32):
    return jax.random.normal(jax.random.PRNGKey(key), (b, s, dim), jnp.float32)


def _stack_one(m):
    stacked = models.stack_moe_experts(m)
    assert type(stacked) is models.StackedMoEMLP, type(stacked)
    return stacked


def _assert_close(a, b, atol=1e-5):
    np.testing.assert_allclose(
        np.asarray(a, np.float32), np.asarray(b, np.float32), atol=atol,
        rtol=1e-5,
    )


class TestParity:
    def test_softmax_topk(self):
        m = _moe()
        x = _x()
        _assert_close(_stack_one(m)(x), m._dense_masked(x, None))
        # and against the module's real dispatch (grouped path)
        _assert_close(_stack_one(m)(x), m(x), atol=1e-4)

    def test_sigmoid_groups_correction_bias(self):
        # deepseek_v3-flavor routing: sigmoid scores, selection-only
        # correction bias, group-limited choice, routed scaling
        m = _moe(n_experts=8, top_k=2)
        m = dataclasses.replace(
            m,
            score_func="sigmoid",
            gate_correction_bias=jnp.linspace(-0.2, 0.3, 8, dtype=jnp.float32),
            n_group=4,
            topk_group=2,
            group_top2_sum=True,
            routed_scaling=2.5,
        )
        x = _x()
        _assert_close(_stack_one(m)(x), m._dense_masked(x, None))

    def test_gptoss_biased_clamped(self):
        # gpt_oss-flavor: biased projections, clamped-swiglu act,
        # softmax over just the top-k logits
        m = _moe()
        key = jax.random.PRNGKey(7)

        def bias_expert(e, k):
            ks = jax.random.split(k, 3)
            def with_bias(lin, kk):
                return dataclasses.replace(
                    lin, bias=0.1 * jax.random.normal(
                        kk, (lin.kernel.shape[1],), jnp.float32
                    )
                )
            return dataclasses.replace(
                e,
                act="gptoss_glu",
                clamp_limit=3.0,
                gate_proj=with_bias(e.gate_proj, ks[0]),
                up_proj=with_bias(e.up_proj, ks[1]),
                down_proj=with_bias(e.down_proj, ks[2]),
            )

        experts = tuple(
            bias_expert(e, k)
            for e, k in zip(m.experts, jax.random.split(key, len(m.experts)))
        )
        m = dataclasses.replace(m, experts=experts, softmax_after_topk=True)
        x = _x()
        s = _stack_one(m)
        assert s.b_gate is not None and s.b_down is not None
        _assert_close(s(x), m._dense_masked(x, None))

    def test_shared_expert_gated(self):
        # qwen2_moe-flavor: always-on shared expert, sigmoid-gated
        m = _moe()
        shared = dataclasses.replace(m.experts[0])
        gate = nn.Linear.create(jax.random.PRNGKey(9), 32, 1, False, jnp.float32)
        m = dataclasses.replace(
            m, shared_expert=shared, shared_expert_gate=gate
        )
        x = _x()
        # shared-expert addition lives in __call__ (not _dense_masked),
        # so compare against the module's real dispatch
        _assert_close(_stack_one(m)(x), m(x), atol=1e-4)

    def test_scale_expert_input(self):
        # llama4-flavor: sigmoid(top-k) weights scale the expert INPUTS
        m = _moe(top_k=1)
        m = dataclasses.replace(
            m, topk_then_sigmoid=True, scale_expert_input=True
        )
        x = _x()
        _assert_close(_stack_one(m)(x), m._dense_masked(x, None))


class TestRoundTrip:
    def test_unstack_restores_exact_tree(self):
        m = _moe()
        back = models.unstack_moe_experts(models.stack_moe_experts(m))
        assert type(back) is MoEMLP
        orig = dict(nn.named_parameters(m))
        rt = dict(nn.named_parameters(back))
        assert orig.keys() == rt.keys()
        for k in orig:
            np.testing.assert_array_equal(
                np.asarray(orig[k]), np.asarray(rt[k]), err_msg=k
            )
        for e0, e1 in zip(m.experts, back.experts):
            assert e0.act == e1.act and e0.clamp_limit == e1.clamp_limit

    def test_whole_model_stack_unstack(self):
        cfg = models.TransformerConfig(
            vocab_size=64, dim=32, n_layers=2, n_heads=4, n_kv_heads=2,
            hidden_dim=48, n_experts=4, n_experts_per_tok=2,
            moe_hidden_dim=48,
        )
        lm = models.CausalLM.create(jax.random.PRNGKey(0), cfg)
        stacked = models.stack_moe_experts(lm)
        names = [
            n for n, sm in nn.named_modules(stacked)
            if type(sm) is models.StackedMoEMLP
        ]
        assert len(names) == 2, names
        batch = {"input_ids": jnp.arange(12, dtype=jnp.int32).reshape(2, 6) % 64}
        _assert_close(stacked(batch), lm(batch), atol=1e-4)
        back = models.unstack_moe_experts(stacked)
        a = dict(nn.named_parameters(lm))
        b = dict(nn.named_parameters(back))
        assert a.keys() == b.keys()
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


class TestEligibility:
    def test_skips_decomposed_experts(self):
        m = _moe()
        # a decomposed site: up_proj replaced by a rank-4 factor pair
        e0 = m.experts[0]
        k = e0.up_proj.kernel
        pair = nn.Sequential(
            layers=(
                nn.Linear(kernel=k[:, :4], bias=None),
                nn.Linear(kernel=jnp.zeros((4, k.shape[1]), k.dtype), bias=None),
            )
        )
        m = dataclasses.replace(
            m,
            experts=(dataclasses.replace(e0, up_proj=pair),) + m.experts[1:],
        )
        out = models.stack_moe_experts(m)
        assert type(out) is MoEMLP  # left untouched

    def test_skips_mixed_act(self):
        m = _moe()
        m = dataclasses.replace(
            m,
            experts=(dataclasses.replace(m.experts[0], act="gelu_tanh"),)
            + m.experts[1:],
        )
        assert type(models.stack_moe_experts(m)) is MoEMLP


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
class TestExpertParallel:
    def test_ep_mesh_axes(self):
        mesh = pmesh.make_mesh(dp=2, ep=2, tp=2)
        assert mesh.axis_names == ("dp", "ep", "tp")
        assert mesh.shape["ep"] == 2

    def test_ep_sharded_forward_parity_and_placement(self):
        cfg = models.TransformerConfig(
            vocab_size=64, dim=32, n_layers=2, n_heads=4, n_kv_heads=2,
            hidden_dim=64, n_experts=4, n_experts_per_tok=2,
            moe_hidden_dim=64,
        )
        lm = models.CausalLM.create(jax.random.PRNGKey(0), cfg)
        stacked = models.stack_moe_experts(lm)
        batch = {
            "input_ids": jnp.arange(32, dtype=jnp.int32).reshape(4, 8) % 64
        }
        ref = stacked(batch)

        mesh = pmesh.make_mesh(dp=2, ep=2, tp=2)
        sharded = psh.shard_params(stacked, mesh)
        # the expert axis is REALLY placed over ep: each device holds
        # E/ep = 2 experts' slabs
        w = dict(nn.named_parameters(sharded))[
            "model.layers.0.mlp.w_gate"
        ]
        spec = w.sharding.spec
        assert spec[0] == "ep", spec
        local = w.addressable_shards[0].data.shape
        assert local[0] == cfg.n_experts // 2, local
        # tp composes on the per-expert hidden axis
        assert spec[2] == "tp", spec

        sbatch = pmesh.shard_batch(batch, mesh)
        out = jax.jit(lambda m, b: m(b))(sharded, sbatch)
        _assert_close(out, ref, atol=1e-4)

    def test_ep_train_step(self):
        # one jitted grad step on the stacked form under dp x ep x tp —
        # grads flow through the stacked einsums and the psum
        import optax

        cfg = models.TransformerConfig(
            vocab_size=64, dim=32, n_layers=1, n_heads=4, n_kv_heads=2,
            hidden_dim=64, n_experts=4, n_experts_per_tok=2,
            moe_hidden_dim=64,
        )
        lm = models.stack_moe_experts(
            models.CausalLM.create(jax.random.PRNGKey(0), cfg)
        )
        mesh = pmesh.make_mesh(dp=2, ep=2, tp=2)
        lm = psh.shard_params(lm, mesh)
        tx = optax.sgd(1e-2)
        opt = tx.init(lm)
        batch = pmesh.shard_batch(
            {"input_ids": jnp.arange(32, dtype=jnp.int32).reshape(4, 8) % 64},
            mesh,
        )

        @jax.jit
        def step(m, o, b):
            loss, grads = jax.value_and_grad(
                lambda mm: models.ce_loss(b, mm(b))
            )(m)
            up, o2 = tx.update(grads, o, m)
            return optax.apply_updates(m, up), o2, loss

        lm2, _, loss = step(lm, opt, batch)
        assert jnp.isfinite(loss)
        # params remain ep-sharded after the update
        w2 = dict(nn.named_parameters(lm2))["model.layers.0.mlp.w_gate"]
        assert w2.sharding.spec[0] == "ep", w2.sharding.spec


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_finetune_cli_mesh_ep(tmp_path):
    """End-to-end LLM finetune CLI with mesh_ep: a decomposed tiny-MoE
    checkpoint finetunes with its MoE layers stacked + ep-sharded, and the
    exported state dict is back in the tuple-of-expert (checkpoint) form.

    Reference analogue: run_finetune.py drives a single-GPU
    transformers.Trainer (/root/reference/examples/trainer_llm/
    run_finetune.py); the ep mesh axis is TPU-new capability."""
    import json as _json

    from apps.trainer_llm import run_finetune
    from ptdeco_tpu import dwain, engine, utils

    cfg = models.TransformerConfig(
        vocab_size=256, dim=32, n_layers=2, n_heads=4, n_kv_heads=2,
        hidden_dim=64, n_experts=4, n_experts_per_tok=2, moe_hidden_dim=64,
        dtype=jnp.float32,
    )
    lm = models.CausalLM.create(jax.random.PRNGKey(0), cfg)

    # decompose ONE attention site so the finetune has a LoRA target and
    # every MoE layer stays pristine (stackable)
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

    # the custom builder rebuilds the ORIGINAL model deterministically
    builder_py = tmp_path / "builder_moe.py"
    builder_py.write_text(
        "import jax, jax.numpy as jnp\n"
        "from ptdeco_tpu import models\n"
        "import sys, pathlib\n"
        "sys.path.insert(0, str(pathlib.Path(__file__).resolve()"
        ".parents[0]))\n"
        "def make_model_and_tokenizer(config):\n"
        "    from apps.trainer_llm.builder import ByteTokenizer\n"
        "    cfg = models.TransformerConfig(\n"
        "        vocab_size=256, dim=32, n_layers=2, n_heads=4,\n"
        "        n_kv_heads=2, hidden_dim=64, n_experts=4,\n"
        "        n_experts_per_tok=2, moe_hidden_dim=64,\n"
        "        dtype=jnp.float32)\n"
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
        "decomposed_model_name": "tiny-moe",
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
        "mesh_ep": 2,
    }
    out = tmp_path / "out"
    run_finetune.main(raw, out)

    summary = _json.loads((out / "summary.json").read_text())
    assert np.isfinite(summary["ppl_after"])
    sd = utils.load_state_dict_pt(str(out / "finetuned_state_dict.pt"))
    keys = set(sd)
    # exported in the tuple-of-expert checkpoint form, not the stacked one
    assert any("experts.0.gate_proj" in k for k in keys), sorted(keys)[:8]
    assert not any(".w_gate" in k for k in keys)
