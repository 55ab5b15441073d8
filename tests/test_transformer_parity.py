"""Transformer-scale + finetune + strided-conv DECISION parity vs the torch
reference (VERDICT r2 items 2 and 3).

Fixtures in tests/golden/{gqa,resstage}_* come from
aux/make_transformer_goldens.py running the LIVE reference
`dwain.decompose_in_place` on (a) a 2-block GQA llama
(transformers.LlamaForCausalLM at reduced width — the TinyLlama site mix)
with thresholds placed NEAR the accept boundary, (b) the same walk with a
REAL interleaved SGD recovery finetune, and (c) a strided-conv ResNet stage
in eval mode.  These tests feed OUR walk the identical weights and streams
and assert identical rank decisions, matching configs, and close outputs.

Documented reference divergence covered here: the reference's conv1x1
factor builder drops the original stride
(/root/reference/src/ptdeco/dwain/decomposition.py:123-137), which breaks
strided downsamples outright; the goldens were generated with a
stride-preserving repair (see the generator), matching our factor
semantics, and the config comparison asserts OUR stride field equals the
ORIGINAL conv's stride."""

import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ptdeco_tpu import dwain, models, nn, utils

GOLDEN = pathlib.Path(__file__).parent / "golden"

pytestmark = pytest.mark.skipif(
    not (GOLDEN / "transformer_goldens_hparams.json").exists(),
    reason="transformer goldens not generated",
)


def _hparams():
    with open(GOLDEN / "transformer_goldens_hparams.json") as f:
        return json.load(f)


def lm_ce(batch, logits):
    ids = batch["input_ids"]
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    ll = jnp.take_along_axis(logp, ids[:, 1:, None], axis=-1)[..., 0]
    return -jnp.mean(ll)


def ce_cls(batch, logits):
    return optax.softmax_cross_entropy_with_integer_labels(
        logits, batch["labels"]
    ).mean()


def _load(stem):
    data = np.load(GOLDEN / f"{stem}_data.npz")
    init_sd = {
        k[len("init__") :]: data[k] for k in data.files if k.startswith("init__")
    }
    return data, init_sd


def make_gqa(init_sd):
    with open(GOLDEN / "gqa_hf_config.json") as f:
        hf_cfg = json.load(f)
    cfg = models.TransformerConfig.from_hf_config(hf_cfg, dtype=jnp.float32)
    m = models.CausalLM.create(jax.random.PRNGKey(0), cfg)
    return utils.load_state_dict(m, init_sd)


class ResStage(nn.Module):
    """NHWC twin of the generator's strided-conv torch stage."""

    stem: nn.Conv2d
    bn_stem: nn.BatchNorm2d
    conv_a: nn.Conv2d
    bn_a: nn.BatchNorm2d
    conv_b: nn.Conv2d
    bn_b: nn.BatchNorm2d
    down: nn.Conv2d
    bn_down: nn.BatchNorm2d
    fc: nn.Linear

    def __call__(self, batch, ctx=None):
        x = batch["inp"] if isinstance(batch, dict) else batch
        x = jax.nn.relu(self.bn_stem(self.stem(x, ctx), ctx))
        h = jax.nn.relu(self.bn_a(self.conv_a(x, ctx), ctx))
        h = self.bn_b(self.conv_b(h, ctx), ctx)
        x = jax.nn.relu(h + self.bn_down(self.down(x, ctx), ctx))
        return self.fc(jnp.mean(x, axis=(1, 2)), ctx)


def make_resstage(init_sd):
    k = jax.random.split(jax.random.PRNGKey(0), 5)
    m = ResStage(
        stem=nn.Conv2d.create(k[0], 3, 16, kernel_size=3, padding=1),
        bn_stem=nn.BatchNorm2d.create(16),
        conv_a=nn.Conv2d.create(k[1], 16, 32, kernel_size=1, stride=2),
        bn_a=nn.BatchNorm2d.create(32),
        conv_b=nn.Conv2d.create(k[2], 32, 32, kernel_size=1),
        bn_b=nn.BatchNorm2d.create(32),
        down=nn.Conv2d.create(k[3], 16, 32, kernel_size=1, stride=2),
        bn_down=nn.BatchNorm2d.create(32),
        fc=nn.Linear.create(k[4], 32, 10),
    )
    return utils.load_state_dict(m, init_sd)


def _cycle_ids(pool):
    i = 0
    while True:
        yield {"input_ids": jnp.asarray(pool[i % len(pool)].astype(np.int32))}
        i += 1


def _cycle_imgs(xs, ys):
    i = 0
    while True:
        yield {
            "inp": jnp.asarray(xs[i % len(xs)].transpose(0, 2, 3, 1)),
            "labels": jnp.asarray(ys[i % len(ys)]),
        }
        i += 1


def make_native_sgd_finetune(ft_ids, last_n, lr, steps):
    """Mirror of the generator's torch SGD recovery FT: last_n decomposed
    factor pairs trainable, plain SGD, fixed pool restarted each call."""

    def ft(module, decomposed_names):
        names = decomposed_names[-last_n:]
        if not names:
            return module
        paths = nn.tree_paths_of(module, names)
        trainable, frozen = nn.partition(
            module, lambda p, leaf: jax.tree_util.keystr(p) in paths
        )
        tx = optax.sgd(lr)
        opt = tx.init(trainable)
        for i in range(steps):
            batch = {
                "input_ids": jnp.asarray(ft_ids[i % len(ft_ids)].astype(np.int32))
            }

            def loss_fn(tr):
                return lm_ce(batch, nn.combine(tr, frozen)(batch))

            _, grads = jax.value_and_grad(loss_fn)(trainable)
            updates, opt = tx.update(grads, opt, trainable)
            trainable = optax.apply_updates(trainable, updates)
        return nn.combine(trainable, frozen)

    return ft


def _decompose_gqa(data, hp, finetune_fn=None):
    _, init_sd = _load("gqa")
    model = make_gqa(init_sd)
    return dwain.decompose(
        module=model,
        data_iterator=_cycle_ids(data["calib_ids"]),
        loss_fn=lm_ce,
        metric_iterator=_cycle_ids(data["metric_ids"]),
        finetune_fn=finetune_fn,
        blacklisted_module_names=["lm_head"],
        num_data_steps=hp["num_data_steps"],
        num_metric_steps=hp["num_metric_steps"],
        nsr_final_threshold=hp["nsr_final_threshold"],
        min_rank=hp["min_rank"],
        trade_off_factor=hp["trade_off_factor"],
        reduction_factor=hp["reduction_factor"],
        max_accepted_ppl_diff=hp["max_accepted_ppl_diff"],
        decompose_in_float64=hp["decompose_in_float64"],
    )


def assert_decisions(ours_config, stem, check_meta_values=True):
    with open(GOLDEN / f"{stem}_config.json") as f:
        ref_config = json.load(f)
    assert set(ours_config.keys()) == set(ref_config.keys())
    for name in ref_config:
        ref_entry = {
            k: v for k, v in ref_config[name].items() if k != "__meta__"
        }
        our_entry = {
            k: v for k, v in ours_config[name].items() if k != "__meta__"
        }
        assert our_entry == ref_entry, f"structural mismatch at {name}"
        assert (
            ours_config[name]["__meta__"]["proportion"]
            == ref_config[name]["__meta__"]["proportion"]
        ), name
        if check_meta_values:
            for key in ("nsr_final", "ppl_final"):
                if key in ref_config[name]["__meta__"]:
                    np.testing.assert_allclose(
                        ours_config[name]["__meta__"][key],
                        ref_config[name]["__meta__"][key],
                        rtol=0.05,
                        atol=1e-4,
                        err_msg=f"{name}.{key}",
                    )
    return ref_config


def test_gqa_near_boundary_decision_parity():
    """2-block GQA llama, thresholds within a few percent of the accepted
    candidates' NSR (layer-1 k_proj margin +5.5%) — accumulated-numerics
    divergence between the stacks would flip a rank here."""
    hp = _hparams()["gqa"]
    data, _ = _load("gqa")
    model2, config = _decompose_gqa(data, hp)
    assert_decisions(config, "gqa")

    probe = jnp.asarray(data["probe_ids"].astype(np.int32))
    y = model2({"input_ids": probe})
    np.testing.assert_allclose(np.asarray(y), data["y_gqa"], atol=2e-3)

    # state-dict key/shape parity with the reference's final model
    ref_sd = dict(np.load(GOLDEN / "gqa_sd.npz").items())
    ours_sd = utils.state_dict(model2)
    assert set(ours_sd.keys()) == set(ref_sd.keys())
    for k in ref_sd:
        assert tuple(ours_sd[k].shape) == tuple(ref_sd[k].shape), k


def test_gqa_interleaved_finetune_decision_parity():
    """Same walk with the REAL interleaved SGD recovery finetune on both
    sides (reference dwain:782-786): identical decisions and a matching
    final model — the cross-implementation pin of the recovery-FT path."""
    hp = _hparams()["gqa"]
    ft = _hparams()["ft"]
    data, _ = _load("gqa")
    finetune_fn = make_native_sgd_finetune(
        data["ft_ids"], ft["last_n"], ft["lr"], ft["steps"]
    )
    model2, config = _decompose_gqa(data, hp, finetune_fn=finetune_fn)
    # FT perturbs metric values slightly run-to-run across frameworks;
    # decisions and structure must still be identical
    assert_decisions(config, "gqa_ft", check_meta_values=False)

    probe = jnp.asarray(data["probe_ids"].astype(np.int32))
    y = model2({"input_ids": probe})
    # 14 sites x 4 SGD steps of f32 cross-framework drift: band, not bits
    np.testing.assert_allclose(np.asarray(y), data["y_gqa_ft"], atol=2e-2)


def test_resstage_strided_conv_decision_parity():
    hp = _hparams()["resstage"]
    data, init_sd = _load("resstage")
    model = make_resstage(init_sd)
    model2, config = dwain.decompose(
        module=model,
        data_iterator=_cycle_imgs(data["calib_x"], data["calib_y"]),
        loss_fn=ce_cls,
        metric_iterator=_cycle_imgs(data["metric_x"], data["metric_y"]),
        num_data_steps=hp["num_data_steps"],
        num_metric_steps=hp["num_metric_steps"],
        nsr_final_threshold=hp["nsr_final_threshold"],
        min_rank=hp["min_rank"],
        trade_off_factor=hp["trade_off_factor"],
        reduction_factor=hp["reduction_factor"],
        max_accepted_ppl_diff=hp["max_accepted_ppl_diff"],
        decompose_in_float64=hp["decompose_in_float64"],
    )
    assert_decisions(config, "resstage")

    # the strided sites' factor pairs must carry the ORIGINAL stride on
    # factor 0 (the semantics the reference's stride-dropping builder
    # breaks; its goldens were generated with the documented repair)
    for name in ("conv_a", "down"):
        assert config[name]["modules"]["0"]["stride"] == [2, 2] or config[
            name
        ]["modules"]["0"]["stride"] == (2, 2), config[name]["modules"]["0"]

    probe = jnp.asarray(data["probe"].transpose(0, 2, 3, 1))
    y = model2({"inp": probe})
    np.testing.assert_allclose(np.asarray(y), data["y"], atol=1e-3)


def test_resstage_falor_decision_parity():
    """falor on the strided-conv stage: identical accept decisions
    (proportion = rank_best/full_rank).  Structural comparison corrects the
    reference's last-tried-rank factor bug (falor:340-391, documented
    divergence) exactly as tests/test_whole_model_parity.py does."""
    import json as _json

    from ptdeco_tpu import falor

    hp = _hparams()["resstage_falor"]
    data, init_sd = _load("resstage")
    model = make_resstage(init_sd)

    def tensors(xs):
        i = 0
        while True:
            yield jnp.asarray(xs[i % len(xs)].transpose(0, 2, 3, 1))
            i += 1

    model2, config = falor.decompose(
        module=model,
        data_iterator=tensors(data["calib_x"]),
        proportion_threshold=hp["proportion_threshold"],
        nsr_final_threshold=hp["nsr_final_threshold"],
        kl_final_threshold=hp["kl_final_threshold"],
        num_data_steps=hp["num_data_steps"],
        num_metric_steps=hp["num_metric_steps"],
        use_float64=hp["use_float64"],
        use_mean=hp["use_mean"],
        use_damping=hp["use_damping"],
    )
    with open(GOLDEN / "resstage_falor_config.json") as f:
        ref_config = _json.load(f)
    assert set(config.keys()) == set(ref_config.keys())

    def entry_rank(entry):
        m0 = entry["modules"]["0"]
        return m0.get("out_features", m0.get("out_channels"))

    def full_rank(entry):
        m0, m1 = entry["modules"]["0"], entry["modules"]["1"]
        d_in = m0.get("in_features", m0.get("in_channels"))
        d_out = m1.get("out_features", m1.get("out_channels"))
        return min(d_in, d_out)

    for name in ref_config:
        ref_meta = ref_config[name]["__meta__"]
        our_meta = config[name]["__meta__"]
        assert our_meta["proportion"] == ref_meta["proportion"], name
        ref_entry = {
            k: v for k, v in ref_config[name].items() if k != "__meta__"
        }
        # OUR factors are built at the accepted rank (the reference builds
        # the last binary-search probe's rank — its documented bug)
        rank_best = round(ref_meta["proportion"] * full_rank(ref_entry))
        assert entry_rank(
            {k: v for k, v in config[name].items() if k != "__meta__"}
        ) == rank_best, name
    # strided factors keep the original stride
    for name in ("conv_a", "down"):
        assert tuple(config[name]["modules"]["0"]["stride"]) == (2, 2)
