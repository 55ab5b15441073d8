"""End-to-end vision trainer tasks on the synthetic pipeline (tiny model).
The reference has no driver-level tests at all (SURVEY.md §4); these close
that gap."""

import json
import pathlib

import jax
import pytest

from apps.trainer_vision import builder, datasets_image
from ptdeco_tpu import nn


class TinyCNN(nn.Module):
    conv1: nn.Conv2d
    bn1: nn.BatchNorm2d
    conv2: nn.Conv2d  # 1x1 site
    fc: nn.Linear

    def __call__(self, x, ctx=None):
        import jax.numpy as jnp

        x = jax.nn.relu(self.bn1(self.conv1(x, ctx), ctx))
        x = jax.nn.relu(self.conv2(x, ctx))
        x = jnp.mean(x, axis=(1, 2))
        return self.fc(x, ctx)


def _tiny_cnn(key, num_classes=1000):
    ks = jax.random.split(key, 3)
    return TinyCNN(
        conv1=nn.Conv2d.create(ks[0], 3, 8, 3, padding=1, use_bias=False),
        bn1=nn.BatchNorm2d.create(8, stat_id=0),
        conv2=nn.Conv2d.create(ks[1], 8, 16, 1),
        fc=nn.Linear.create(ks[2], 16, num_classes),
    )


builder.register_model("tinycnn", _tiny_cnn)

DATA_CFG = dict(
    imagenet_root_dir="/nonexistent",
    trn_imagenet_classes_fname="/nonexistent",
    val_imagenet_classes_fname="/nonexistent",
    batch_size=4,
    normalization="imagenet",
    input_h_w=(16, 16),
)


def _pipelines():
    train = datasets_image.SyntheticImagePipeline(4, (16, 16), 1000, 4, seed=0)
    val = datasets_image.SyntheticImagePipeline(4, (16, 16), 1000, 2, seed=1)
    return train, val


def test_falor_driver(tmp_path: pathlib.Path):
    from apps.trainer_vision import run_decompose_falor

    cfg = dict(
        task="decompose_falor",
        decompose_model_name="tinycnn",
        proportion_threshold=1.1,  # accept any reduction the search finds
        nsr_final_threshold=10.0,
        kl_final_threshold=100.0,
        num_data_steps=2,
        num_metric_steps=1,
        use_float64=True,
        blacklisted_modules=[],
        **DATA_CFG,
    )
    train, val = _pipelines()
    run_decompose_falor.main(cfg, tmp_path, train, val)
    summary = json.loads((tmp_path / "summary.json").read_text())
    assert summary["n_decomposed"] >= 1
    assert (tmp_path / "decompose_config.json").exists()
    assert (tmp_path / "decompose_state_dict.pt").exists()


def test_lockd_driver(tmp_path: pathlib.Path):
    from apps.trainer_vision import run_decompose_lockd

    cfg = dict(
        task="decompose_lockd",
        decompose_model_name="tinycnn",
        proportion_threshold=0.99,
        blacklisted_modules=[],
        lmbda=10.0,  # strong size pressure so gates move in 6 steps
        nsr_threshold=0.05,
        finetune_only_decomposed=True,
        lr=0.5,
        lr_t_warmup="1ba",
        lr_scheduler="fixed",
        max_duration="6ba",
        optimizer="SGD",
        precision=None,
        alg_gradient_clipping_type=None,
        alg_gradient_clipping_threshold=None,
        mesh_dp=None,
        **DATA_CFG,
    )
    train, val = _pipelines()
    run_decompose_lockd.main(cfg, tmp_path, train, val)
    summary = json.loads((tmp_path / "summary.json").read_text())
    assert (tmp_path / "metrics.jsonl").exists()
    rec = json.loads(
        (tmp_path / "metrics.jsonl").read_text().splitlines()[0]
    )
    assert "per_layer_nsr" in rec and rec["per_layer_nsr"]
    assert summary["n_decomposed"] >= 1  # lmbda high + lr high -> gates close


def test_dwain_driver_with_reverting_ft(tmp_path: pathlib.Path):
    from apps.trainer_vision import run_decompose_dwain

    cfg = dict(
        task="decompose_dwain",
        decompose_model_name="tinycnn",
        num_data_steps=2,
        num_metric_steps=1,
        trade_off_factor=1e6,
        reduction_factor=0.5,
        max_accepted_ppl_diff=10.0,
        nsr_final_threshold=10.0,
        min_rank=2,
        decompose_in_float64=True,
        precomputing_covariance_num_splits=None,
        blacklisted_modules=["fc"],
        finetuning_run=True,
        finetuning_lr=1e-4,
        finetuning_optimizer="AdamW",
        finetuning_reverting=True,
        finetuning_batch_norms_in_eval=True,
        finetuning_num_steps=2,
        finetuning_num_log_steps=1,
        finetuning_num_last_finetuned_modules=8,
        **DATA_CFG,
    )
    train, val = _pipelines()
    run_decompose_dwain.main(cfg, tmp_path, train, val)
    summary = json.loads((tmp_path / "summary.json").read_text())
    dc = json.loads((tmp_path / "decompose_config.json").read_text())
    assert "conv2" in dc  # prefix stripped back to raw names
    assert summary["mparams_final"] < summary["mparams_initial"]


def test_kd_finetune_driver(tmp_path: pathlib.Path):
    from apps.trainer_vision import run_decompose_falor, run_finetune

    # first produce a decomposed checkpoint
    deco_dir = tmp_path / "deco"
    cfg = dict(
        task="decompose_falor",
        decompose_model_name="tinycnn",
        proportion_threshold=1.1,
        nsr_final_threshold=10.0,
        kl_final_threshold=100.0,
        num_data_steps=2,
        num_metric_steps=1,
        use_float64=True,
        blacklisted_modules=[],
        **DATA_CFG,
    )
    train, val = _pipelines()
    run_decompose_falor.main(cfg, deco_dir, train, val)

    ft_cfg = dict(
        task="finetune",
        decompose_model_name="tinycnn",
        decompose_config=str(deco_dir / "decompose_config.json"),
        decompose_state_dict=str(deco_dir / "decompose_state_dict.pt"),
        proportion_threshold=1.0,
        blacklisted_modules=[],
        finetune_only_decomposed=True,
        lr=1e-4,
        lr_t_warmup="1ba",
        lr_scheduler="cosine",
        max_duration="4ba",
        optimizer="AdamW",
        precision=None,
        alg_gradient_clipping_type="norm",
        alg_gradient_clipping_threshold=1.0,
        mesh_dp=None,
        **DATA_CFG,
    )
    run_finetune.main(ft_cfg, tmp_path / "ft", train, val)
    summary = json.loads((tmp_path / "ft" / "summary.json").read_text())
    assert (tmp_path / "ft" / "finetuned_state_dict.pt").exists()
    assert summary["n_decomposed"] >= 1


def test_fpops_dict_analytic_counts():
    """Per-module FLOPs dict (reference get_fpops_dict semantics,
    builder.py:63-91): analytic MACs x2, aggregated up the module tree."""
    model = _tiny_cnn(jax.random.PRNGKey(0), num_classes=10)
    d = builder.get_fpops_dict(model, (1, 16, 16, 3), units="gflops")
    # conv1: 3x3x3 -> 8ch over 16x16 output
    macs_conv1 = 16 * 16 * 8 * 3 * 3 * 3
    assert d["conv1"] == pytest.approx(2 * macs_conv1 / 1e9)
    # conv2: 1x1 8->16 over 16x16
    macs_conv2 = 16 * 16 * 16 * 8
    assert d["conv2"] == pytest.approx(2 * macs_conv2 / 1e9)
    # fc: 16 -> 10
    assert d["fc"] == pytest.approx(2 * 16 * 10 / 1e9)
    # root aggregates every counted module
    assert d[""] == pytest.approx(d["conv1"] + d["conv2"] + d["fc"])
    k = builder.get_fpops_dict(model, (1, 16, 16, 3), units="kmapps")
    assert k["conv1"] == pytest.approx(macs_conv1 / (16 * 16) / 1024.0)


def test_decomposeable_stats_and_sd_overlap():
    model = _tiny_cnn(jax.random.PRNGKey(0), num_classes=10)
    stats = builder.get_decomposeable_model_stats(model, (1, 16, 16, 3))
    # decomposeable = conv2 (1x1) + fc, NOT conv1 (3x3)
    macs = 16 * 16 * 16 * 8 + 16 * 10
    assert stats["gflops_decomposeable"] == pytest.approx(2 * macs / 1e9)
    assert stats["mparams_decomposeable"] == pytest.approx(
        (8 * 16 + 16 + 16 * 10 + 10) / 1e6
    )
    from ptdeco_tpu import utils

    sd = utils.state_dict(model)
    partial = {k: v for k, v in list(sd.items())[:3]}
    partial["bogus"] = next(iter(sd.values()))
    n = builder.log_state_dict_keys_stats("test:", model, partial)
    assert n == 3


def test_lockd_driver_bf16_precision(tmp_path: pathlib.Path):
    """precision: bf16 runs the amp-style compute cast path end-to-end
    (the knob was once accepted-but-ignored; this pins that it executes)."""
    from apps.trainer_vision import run_decompose_lockd

    cfg = dict(
        task="decompose_lockd",
        decompose_model_name="tinycnn",
        proportion_threshold=0.99,
        blacklisted_modules=[],
        lmbda=10.0,
        nsr_threshold=0.05,
        finetune_only_decomposed=True,
        lr=0.5,
        lr_t_warmup="1ba",
        lr_scheduler="fixed",
        max_duration="3ba",
        optimizer="AdamW",
        precision="bf16",
        alg_gradient_clipping_type=None,
        alg_gradient_clipping_threshold=None,
        mesh_dp=None,
        **DATA_CFG,
    )
    train, val = _pipelines()
    run_decompose_lockd.main(cfg, tmp_path, train, val)
    summary = json.loads((tmp_path / "summary.json").read_text())
    assert "n_decomposed" in summary
    rec = json.loads((tmp_path / "metrics.jsonl").read_text().splitlines()[0])
    import math

    assert all(math.isfinite(v) for v in rec["per_layer_nsr"].values())


def test_kd_finetune_trains_bn_running_stats(tmp_path: pathlib.Path):
    """The reference KD finetune runs the student in TRAIN mode
    (KdClassificationModel eval_mode=False default, reference
    run_finetune.py:54,341): BatchNorm running stats must refresh during
    KD; finetune_eval_mode=True freezes them."""
    from apps.trainer_vision import run_decompose_falor, run_finetune

    deco_dir = tmp_path / "deco"
    cfg = dict(
        task="decompose_falor",
        decompose_model_name="tinycnn",
        proportion_threshold=1.1,
        nsr_final_threshold=10.0,
        kl_final_threshold=100.0,
        num_data_steps=2,
        num_metric_steps=1,
        use_float64=True,
        blacklisted_modules=[],
        **DATA_CFG,
    )
    train, val = _pipelines()
    import numpy as np

    from ptdeco_tpu import utils

    run_decompose_falor.main(cfg, deco_dir, train, val)
    sd0 = utils.load_state_dict_pt(str(deco_dir / "decompose_state_dict.pt"))

    base_ft = dict(
        task="finetune",
        decompose_model_name="tinycnn",
        decompose_config=str(deco_dir / "decompose_config.json"),
        decompose_state_dict=str(deco_dir / "decompose_state_dict.pt"),
        proportion_threshold=1.0,
        blacklisted_modules=[],
        finetune_only_decomposed=True,
        lr=1e-4,
        lr_t_warmup="1ba",
        lr_scheduler="cosine",
        max_duration="4ba",
        optimizer="AdamW",
        precision=None,
        alg_gradient_clipping_type=None,
        alg_gradient_clipping_threshold=None,
        mesh_dp=None,
        **DATA_CFG,
    )
    run_finetune.main(dict(base_ft), tmp_path / "ft_train", train, val)
    sd_train = utils.load_state_dict_pt(
        str(tmp_path / "ft_train" / "finetuned_state_dict.pt")
    )
    assert not np.allclose(
        sd_train["bn1.running_mean"], sd0["bn1.running_mean"]
    ), "train-mode KD must refresh BN running stats"

    run_finetune.main(
        dict(base_ft, finetune_eval_mode=True), tmp_path / "ft_eval", train, val
    )
    sd_eval = utils.load_state_dict_pt(
        str(tmp_path / "ft_eval" / "finetuned_state_dict.pt")
    )
    np.testing.assert_allclose(
        sd_eval["bn1.running_mean"], sd0["bn1.running_mean"]
    )


def test_tensorboard_events_emitted(tmp_path: pathlib.Path):
    """tensorboard: true mirrors the per-layer scalars into event files
    (reference TensorboardCallBack parity); absent/false stays jsonl-only."""
    pytest.importorskip("torch.utils.tensorboard")
    from apps.trainer_vision import run_decompose_lockd

    cfg = dict(
        task="decompose_lockd",
        decompose_model_name="tinycnn",
        proportion_threshold=1.1,
        blacklisted_modules=[],
        lmbda=0.5,
        nsr_threshold=0.1,
        lr=1e-3,
        lr_t_warmup="1ba",
        lr_scheduler="fixed",
        max_duration="2ba",
        optimizer="SGD",
        precision=None,
        tensorboard=True,
        **DATA_CFG,
    )
    train, val = _pipelines()
    run_decompose_lockd.main(cfg, tmp_path / "out", train, val)
    events = list((tmp_path / "out" / "tensorboard").glob("events.out.*"))
    assert events and events[0].stat().st_size > 0
