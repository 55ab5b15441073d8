"""Whole-model DECISION parity vs the torch reference.

Fixtures in tests/golden/whole_* were produced by
aux/make_whole_model_goldens.py running the ACTUAL reference
`dwain.decompose_in_place` (/root/reference/src/ptdeco/dwain/decomposition.py:677-800)
and `falor.decompose_in_place` (falor/decomposition.py:424-511) end-to-end
on seeded toy models.  These tests feed OUR decompose the identical weights
and data streams and assert we pick the SAME RANKS per site, emit a
byte-identical config (modulo float meta), export a torch-loadable state
dict with identical keys/shapes, and produce outputs within float
tolerance.  This is the regression pin for the acceptance-rule semantics
(rank ladder, 3-way rejection, params-drop bookkeeping, binary search)."""

import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ptdeco_tpu import dwain, falor, nn, utils

GOLDEN = pathlib.Path(__file__).parent / "golden"

pytestmark = pytest.mark.skipif(
    not (GOLDEN / "whole_model_hparams.json").exists(),
    reason="whole-model goldens not generated",
)


def _hparams():
    with open(GOLDEN / "whole_model_hparams.json") as f:
        return json.load(f)


class MLP(nn.Module):
    fc1: nn.Linear
    fc2: nn.Linear
    fc3: nn.Linear

    def __call__(self, batch, ctx=None):
        x = batch["inp"] if isinstance(batch, dict) else batch
        x = jax.nn.relu(self.fc1(x, ctx))
        x = jax.nn.relu(self.fc2(x, ctx))
        return self.fc3(x, ctx)


class CNN(nn.Module):
    """NHWC twin of the generator's NCHW torch CNN."""

    conv1: nn.Conv2d
    conv2: nn.Conv2d
    conv3: nn.Conv2d
    fc: nn.Linear

    def __call__(self, batch, ctx=None):
        x = batch["inp"] if isinstance(batch, dict) else batch
        x = jax.nn.relu(self.conv1(x, ctx))
        x = jax.nn.relu(self.conv2(x, ctx))
        x = jax.nn.relu(self.conv3(x, ctx))
        x = jnp.mean(x, axis=(1, 2))
        return self.fc(x, ctx)


class Attn(nn.Module):
    """Twin of the generator's single-head attention toy (LLM-shaped sites:
    q/k/v/o feeding softmax attention + MLP + head)."""

    ln1: nn.LayerNorm
    q: nn.Linear
    k: nn.Linear
    v: nn.Linear
    o: nn.Linear
    ln2: nn.LayerNorm
    fc1: nn.Linear
    fc2: nn.Linear
    head: nn.Linear

    def __call__(self, batch, ctx=None):
        x = batch["inp"] if isinstance(batch, dict) else batch
        h = self.ln1(x, ctx)
        q, k, v = self.q(h, ctx), self.k(h, ctx), self.v(h, ctx)
        a = jax.nn.softmax(
            q @ jnp.swapaxes(k, -2, -1) / (48.0 ** 0.5), axis=-1
        )
        x = x + self.o(a @ v, ctx)
        h = self.ln2(x, ctx)
        x = x + self.fc2(jax.nn.relu(self.fc1(h, ctx)), ctx)
        return self.head(jnp.mean(x, axis=1), ctx)


def _load_family(stem):
    data = np.load(GOLDEN / f"{stem}_data.npz")
    init_sd = {
        k[len("init__") :]: data[k] for k in data.files if k.startswith("init__")
    }
    return data, init_sd


def make_mlp(init_sd):
    k = jax.random.split(jax.random.PRNGKey(0), 3)
    m = MLP(
        fc1=nn.Linear.create(k[0], 64, 96),
        fc2=nn.Linear.create(k[1], 96, 48),
        fc3=nn.Linear.create(k[2], 48, 10),
    )
    return utils.load_state_dict(m, init_sd)


def make_cnn(init_sd):
    k = jax.random.split(jax.random.PRNGKey(0), 4)
    m = CNN(
        conv1=nn.Conv2d.create(k[0], 3, 16, kernel_size=3, padding=1),
        conv2=nn.Conv2d.create(k[1], 16, 32, kernel_size=1),
        conv3=nn.Conv2d.create(k[2], 32, 24, kernel_size=1),
        fc=nn.Linear.create(k[3], 24, 10),
    )
    return utils.load_state_dict(m, init_sd)


def make_attn(init_sd):
    k = jax.random.split(jax.random.PRNGKey(0), 7)
    m = Attn(
        ln1=nn.LayerNorm.create(48),
        q=nn.Linear.create(k[0], 48, 48),
        k=nn.Linear.create(k[1], 48, 48),
        v=nn.Linear.create(k[2], 48, 48),
        o=nn.Linear.create(k[3], 48, 48),
        ln2=nn.LayerNorm.create(48),
        fc1=nn.Linear.create(k[4], 48, 96),
        fc2=nn.Linear.create(k[5], 96, 48),
        head=nn.Linear.create(k[6], 48, 10),
    )
    return utils.load_state_dict(m, init_sd)


_MAKERS = {"mlp": make_mlp, "cnn": make_cnn, "attn": make_attn}


def _cycle_dicts(xs, ys, nhwc=False):
    i = 0
    while True:
        x = xs[i % len(xs)]
        if nhwc:
            x = x.transpose(0, 2, 3, 1)
        yield {
            "inp": jnp.asarray(x),
            "labels": jnp.asarray(ys[i % len(ys)]),
        }
        i += 1


def _cycle_tensors(xs, nhwc=False):
    i = 0
    while True:
        x = xs[i % len(xs)]
        if nhwc:
            x = x.transpose(0, 2, 3, 1)
        yield jnp.asarray(x)
        i += 1


def ce_loss(batch, logits):
    return optax.softmax_cross_entropy_with_integer_labels(
        logits, batch["labels"]
    ).mean()


def _squeeze2d(w):
    """torch factor weight -> 2d (out, in): squeeze conv 1x1 trailing dims."""
    return w.reshape(w.shape[0], w.shape[1])


def _entry_rank(entry):
    m0 = entry["modules"]["0"]
    return m0.get("out_features", m0.get("out_channels"))


def _entry_full_rank(entry):
    m0, m1 = entry["modules"]["0"], entry["modules"]["1"]
    d_in = m0.get("in_features", m0.get("in_channels"))
    d_out = m1.get("out_features", m1.get("out_channels"))
    return min(d_in, d_out)


def _rewrite_rank(entry, rank):
    """Return a copy of a Sequential factor-pair config entry with the
    inner rank rewritten (used to express the reference's config as it
    WOULD be without its last-tried-rank bug, see docs/design.md)."""
    e = json.loads(json.dumps(entry))
    m0, m1 = e["modules"]["0"], e["modules"]["1"]
    for d, key in ((m0, "out_features"), (m0, "out_channels"),
                   (m1, "in_features"), (m1, "in_channels")):
        if key in d:
            d[key] = rank
    return e


def assert_parity(
    ours_config, ours_model, stem, data, out_key, atol_out,
    ref_builds_last_tried_rank=False,
):
    """ref_builds_last_tried_rank: the reference falor builds factors from
    the LAST binary-search probe's U/V instead of the accepted rank_best
    (reference falor/decomposition.py:346-386, a documented bug our
    implementation fixes).  Decision parity (meta proportions = rank_best)
    is asserted exactly either way; structural/factor/output comparisons
    are rank-corrected or restricted to sites where the ranks agree."""
    with open(GOLDEN / f"{stem}_config.json") as f:
        ref_config = json.load(f)
    ref_sd = dict(np.load(GOLDEN / f"{stem}_sd.npz").items())

    # 1. identical decomposition DECISIONS: same sites, same ranks
    assert set(ours_config.keys()) == set(ref_config.keys())
    rank_agrees = {}
    for name in ref_config:
        ref_entry = {k: v for k, v in ref_config[name].items() if k != "__meta__"}
        our_entry = {k: v for k, v in ours_config[name].items() if k != "__meta__"}
        ref_meta = ref_config[name]["__meta__"]
        our_meta = ours_config[name]["__meta__"]
        rank_best = round(ref_meta["proportion"] * _entry_full_rank(ref_entry))
        if ref_builds_last_tried_rank:
            # ours must have built the ACCEPTED rank; rewrite the ref
            # entry's (possibly bugged) rank before structural comparison
            assert _entry_rank(our_entry) == rank_best, name
            ref_entry = _rewrite_rank(ref_entry, rank_best)
        assert our_entry == ref_entry, f"structural mismatch at {name}"
        rank_agrees[name] = _entry_rank(
            {k: v for k, v in ref_config[name].items() if k != "__meta__"}
        ) == _entry_rank(our_entry)
        assert set(our_meta.keys()) == set(ref_meta.keys()), name
        assert our_meta["proportion"] == ref_meta["proportion"], name
        if "drop_in_params" in ref_meta:
            assert our_meta["drop_in_params"] == ref_meta["drop_in_params"], name
        for key in ref_meta:
            if key in ("proportion", "drop_in_params"):
                continue
            np.testing.assert_allclose(
                our_meta[key], ref_meta[key], rtol=0.05, atol=1e-4,
                err_msg=f"{name}.{key}",
            )

    # 2. torch-loadable state dict: identical keys (and shapes where ranks
    # agree; at rank-corrected sites only the factor shapes lawfully differ)
    ours_sd = utils.state_dict(ours_model)
    assert set(ours_sd.keys()) == set(ref_sd.keys())
    for k in ref_sd:
        site = k.rsplit(".", 2)[0]
        if rank_agrees.get(site, True) or k.endswith(".1.bias"):
            assert tuple(ours_sd[k].shape) == tuple(ref_sd[k].shape), k

    # 3. factor numerics: composed product (sign-invariant) per site + bias
    for name in ref_config:
        if rank_agrees[name]:
            p_ref = _squeeze2d(ref_sd[f"{name}.1.weight"]) @ _squeeze2d(
                ref_sd[f"{name}.0.weight"]
            )
            p_our = _squeeze2d(
                np.asarray(ours_sd[f"{name}.1.weight"])
            ) @ _squeeze2d(np.asarray(ours_sd[f"{name}.0.weight"]))
            np.testing.assert_allclose(p_our, p_ref, atol=1e-4, err_msg=name)
        np.testing.assert_allclose(
            np.asarray(ours_sd[f"{name}.1.bias"]),
            ref_sd[f"{name}.1.bias"],
            atol=1e-6,
            err_msg=name,
        )

    # 4. final model output matches the reference's final model (only
    # meaningful when every site was built at the same rank)
    if all(rank_agrees.values()):
        probe = data["probe"]
        if probe.ndim == 4:  # NCHW -> NHWC
            probe = probe.transpose(0, 2, 3, 1)
        y = ours_model(jnp.asarray(probe))
        np.testing.assert_allclose(np.asarray(y), data[out_key], atol=atol_out)


@pytest.mark.parametrize("family", ["mlp", "cnn", "attn"])
def test_dwain_whole_model_decision_parity(family):
    hp = _hparams()["dwain"]
    data, init_sd = _load_family(f"whole_{family}")
    nhwc = family == "cnn"
    model = _MAKERS[family](init_sd)
    model2, config = dwain.decompose(
        module=model,
        data_iterator=_cycle_dicts(data["calib_x"], data["calib_y"], nhwc),
        loss_fn=ce_loss,
        metric_iterator=_cycle_dicts(data["metric_x"], data["metric_y"], nhwc),
        num_data_steps=hp["num_data_steps"],
        num_metric_steps=hp["num_metric_steps"],
        nsr_final_threshold=hp["nsr_final_threshold"],
        min_rank=hp["min_rank"],
        trade_off_factor=hp["trade_off_factor"],
        reduction_factor=hp["reduction_factor"],
        max_accepted_ppl_diff=hp["max_accepted_ppl_diff"],
        decompose_in_float64=hp["decompose_in_float64"],
    )
    assert_parity(config, model2, f"whole_dwain_{family}", data, "y_dwain", 5e-4)


def test_dwain_precompute_whole_model_decision_parity():
    """Same parity pin for the PRECOMPUTED covariance mode (reference
    dwain:580-674; splits=2 exercises the chunked single-pass gram path and
    our pipelined eigh provider)."""
    if not (GOLDEN / "whole_dwain_mlp_pre_config.json").exists():
        pytest.skip("precompute golden not generated")
    hp = _hparams()["dwain"]
    data, init_sd = _load_family("whole_mlp")
    model = make_mlp(init_sd)
    model2, config = dwain.decompose(
        module=model,
        data_iterator=_cycle_dicts(data["calib_x"], data["calib_y"]),
        loss_fn=ce_loss,
        metric_iterator=_cycle_dicts(data["metric_x"], data["metric_y"]),
        num_data_steps=hp["num_data_steps"],
        num_metric_steps=hp["num_metric_steps"],
        nsr_final_threshold=hp["nsr_final_threshold"],
        min_rank=hp["min_rank"],
        trade_off_factor=hp["trade_off_factor"],
        reduction_factor=hp["reduction_factor"],
        max_accepted_ppl_diff=hp["max_accepted_ppl_diff"],
        decompose_in_float64=hp["decompose_in_float64"],
        precomputing_covariance_num_splits=2,
    )
    assert_parity(
        config, model2, "whole_dwain_mlp_pre", data, "y_dwain_pre", 5e-4
    )


def test_lockd_whole_walk_numeric_parity():
    """lockd whole walk on BIT-IDENTICAL student factors: import the
    reference's wrapped (pre-decompose) state dict into our wrapped model,
    decompose with the same forced gates, and require an identical config,
    numerically identical sliced state dict, and matching outputs
    (reference lockd/decomposition.py:304-459; gate TRAINING parity is
    RNG-bound — torch vs jax Gumbel streams — hence the forced-gate stand-in,
    same device as the reference's own tests)."""
    from ptdeco_tpu import lockd

    if not (GOLDEN / "whole_lockd_wrapped_sd.npz").exists():
        pytest.skip("lockd whole-walk golden not generated")
    wrapped_sd = dict(np.load(GOLDEN / "whole_lockd_wrapped_sd.npz").items())
    ref_sd = dict(np.load(GOLDEN / "whole_lockd_sd.npz").items())
    with open(GOLDEN / "whole_lockd_config.json") as f:
        ref_config = json.load(f)
    io = np.load(GOLDEN / "whole_lockd_io.npz")

    _, init_sd = _load_family("whole_cnn")  # same CNN architecture/weights
    model = make_cnn(init_sd)
    wrapped = lockd.wrap(model, jax.random.PRNGKey(0))
    wrapped = utils.load_state_dict(wrapped, wrapped_sd)
    model2, config = lockd.decompose(wrapped, proportion_threshold=0.9)

    assert set(config.keys()) == set(ref_config.keys())
    for name in ref_config:
        ref_entry = {k: v for k, v in ref_config[name].items() if k != "__meta__"}
        our_entry = {k: v for k, v in config[name].items() if k != "__meta__"}
        assert our_entry == ref_entry, f"structural mismatch at {name}"
        assert (
            config[name]["__meta__"]["proportion"]
            == ref_config[name]["__meta__"]["proportion"]
        ), name

    ours_sd = utils.state_dict(model2)
    assert set(ours_sd.keys()) == set(ref_sd.keys())
    for k in ref_sd:
        np.testing.assert_allclose(
            np.asarray(ours_sd[k]), ref_sd[k], atol=1e-6, err_msg=k
        )

    probe = jnp.asarray(io["probe"].transpose(0, 2, 3, 1))
    y = model2(probe)
    np.testing.assert_allclose(np.asarray(y), io["y"], atol=1e-5)


@pytest.mark.parametrize("family", ["mlp", "cnn", "attn"])
def test_falor_whole_model_decision_parity(family):
    hp = _hparams()["falor"]
    data, init_sd = _load_family(f"whole_{family}")
    nhwc = family == "cnn"
    model = _MAKERS[family](init_sd)
    model2, config = falor.decompose(
        module=model,
        data_iterator=_cycle_tensors(data["calib_x"], nhwc),
        proportion_threshold=hp["proportion_threshold"],
        nsr_final_threshold=hp["nsr_final_threshold"],
        kl_final_threshold=hp["kl_final_threshold"],
        num_data_steps=hp["num_data_steps"],
        num_metric_steps=hp["num_metric_steps"],
        use_float64=hp["use_float64"],
        use_mean=hp["use_mean"],
        use_damping=hp["use_damping"],
    )
    assert_parity(
        config, model2, f"whole_falor_{family}", data, "y_falor", 5e-4,
        ref_builds_last_tried_rank=True,
    )
