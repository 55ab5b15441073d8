"""dwain checkpoint/resume: a restarted run replays completed sites from the
checkpoint dir and produces identical results (feature the reference lacks,
SURVEY.md §5 "Decomposition itself is not resumable mid-run")."""

import json
import pathlib

import jax
import numpy as np

from ptdeco_tpu import dwain
from tests.test_dwain_e2e import loss_fn, lowrank_data_iter, make_mlp


def _decompose(model, tmp, **kw):
    return dwain.decompose(
        module=model,
        data_iterator=lowrank_data_iter(jax.random.PRNGKey(0), 16, 64),
        loss_fn=loss_fn,
        num_data_steps=2,
        metric_iterator=lowrank_data_iter(jax.random.PRNGKey(1), 16, 64),
        num_metric_steps=1,
        nsr_final_threshold=0.2,
        blacklisted_module_names=["head"],
        min_rank=2,
        trade_off_factor=1000.0,
        max_accepted_ppl_diff=1.0,
        checkpoint_dir=str(tmp),
        **kw,
    )


def test_resume_replays_completed_sites(tmp_path: pathlib.Path):
    model = make_mlp(64)
    m1, cfg1 = _decompose(model, tmp_path / "ckpt")
    progress = (tmp_path / "ckpt" / "progress.jsonl").read_text().splitlines()
    assert len(progress) == 2  # fc1, fc2 processed (head blacklisted)

    # "restart": fresh original model, same checkpoint dir -> all sites replay
    m2, cfg2 = _decompose(make_mlp(64), tmp_path / "ckpt")
    assert cfg2 == cfg1
    batch = next(lowrank_data_iter(jax.random.PRNGKey(9), 8, 64))
    np.testing.assert_allclose(
        np.asarray(m1(batch)), np.asarray(m2(batch)), atol=1e-6
    )


def test_checkpoint_records_skips(tmp_path: pathlib.Path):
    model = make_mlp(16)

    def it(key):
        while True:
            key, sub = jax.random.split(key)
            yield {"inp": jax.random.normal(sub, (32, 16))}

    _, cfg = dwain.decompose(
        module=model,
        data_iterator=it(jax.random.PRNGKey(0)),
        loss_fn=loss_fn,
        num_data_steps=1,
        metric_iterator=it(jax.random.PRNGKey(1)),
        num_metric_steps=1,
        nsr_final_threshold=1e-9,  # everything rejected
        min_rank=2,
        trade_off_factor=0.5,
        max_accepted_ppl_diff=1e-9,
        checkpoint_dir=str(tmp_path / "c2"),
    )
    assert cfg == {}
    recs = [
        json.loads(line)
        for line in (tmp_path / "c2" / "progress.jsonl").read_text().splitlines()
    ]
    assert all(r["config"] is None for r in recs)
    assert len(recs) == 3  # fc1, fc2, head all processed, none decomposed
