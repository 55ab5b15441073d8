"""Deferred substitution mode: the structure-preserving dwain walk makes the
same decisions and produces (numerically equivalent) final models as the
direct pair-substitution mode — while keeping the working model's pytree
structure constant (no per-site recompiles)."""

import jax
import numpy as np

from ptdeco_tpu import dwain, nn
from tests.test_dwain_e2e import loss_fn, lowrank_data_iter, make_mlp


def _run(defer: bool, finetune=None):
    model = make_mlp(64)
    return dwain.decompose(
        module=model,
        data_iterator=lowrank_data_iter(jax.random.PRNGKey(0), 16, 64),
        loss_fn=loss_fn,
        num_data_steps=3,
        metric_iterator=lowrank_data_iter(jax.random.PRNGKey(1), 16, 64),
        num_metric_steps=1,
        nsr_final_threshold=0.2,
        finetune_fn=finetune,
        blacklisted_module_names=["head"],
        min_rank=2,
        trade_off_factor=1000.0,
        max_accepted_ppl_diff=1.0,
        defer_substitution=defer,
    )


def test_deferred_matches_direct():
    m_def, cfg_def = _run(defer=True)
    m_dir, cfg_dir = _run(defer=False)
    assert set(cfg_def) == set(cfg_dir) == {"fc1", "fc2"}
    for k in cfg_def:
        e1 = {a: b for a, b in cfg_def[k].items() if a != "__meta__"}
        e2 = {a: b for a, b in cfg_dir[k].items() if a != "__meta__"}
        assert e1 == e2
    # final structures identical; outputs equal up to product-rounding
    assert isinstance(nn.get_submodule(m_def, "fc1"), nn.Sequential)
    batch = next(lowrank_data_iter(jax.random.PRNGKey(5), 8, 64))
    np.testing.assert_allclose(
        np.asarray(m_def(batch)), np.asarray(m_dir(batch)), atol=1e-4
    )


def test_deferred_finetune_updates_survive():
    """The user's finetune_fn sees a real pair-structured model, and its
    factor updates flow back into the deferred state."""
    seen_structures = []

    def ft(model, names):
        sub = nn.get_submodule(model, names[-1])
        seen_structures.append(isinstance(sub, nn.Sequential))
        # emulate training: nudge the first factor of the newest pair
        k1 = sub[0].kernel
        return nn.replace_submodule(model, f"{names[-1]}.0.kernel", k1 + 0.5)

    m, cfg = _run(defer=True, finetune=ft)
    assert seen_structures and all(seen_structures)
    # the nudge is present in the final materialized pairs
    for name in cfg:
        pair = nn.get_submodule(m, name)
        assert isinstance(pair, nn.Sequential)
    # run a forward to ensure consistency
    batch = next(lowrank_data_iter(jax.random.PRNGKey(6), 4, 64))
    assert np.all(np.isfinite(np.asarray(m(batch))))


def test_deferred_structure_constant_during_walk():
    """The treedef of the model passed into gram/metric steps never changes
    across sites (the whole point: one compile per program)."""
    from ptdeco_tpu import engine as engine_mod

    treedefs = []
    orig_compute = engine_mod.compute_output_grams

    def spy(root, *a, **k):
        treedefs.append(jax.tree_util.tree_structure(root))
        return orig_compute(root, *a, **k)

    engine_mod.compute_output_grams = spy
    try:
        _run(defer=True)
    finally:
        engine_mod.compute_output_grams = orig_compute
    assert len(treedefs) >= 2
    assert all(t == treedefs[0] for t in treedefs)


def test_shared_metric_step_matches_fused():
    """The structure-shared metric path (one compile for all sites) must
    reproduce the fused per-site ladder's decisions exactly."""
    from tests.test_dwain_e2e import loss_fn as lf, lowrank_data_iter as ldi
    from tests.test_dwain_e2e import make_mlp as mk

    def run(threshold, indexed=False):
        return dwain.decompose(
            module=mk(64),
            data_iterator=ldi(jax.random.PRNGKey(0), 16, 64),
            loss_fn=lf,
            num_data_steps=2,
            metric_iterator=ldi(jax.random.PRNGKey(1), 16, 64),
            num_metric_steps=2,
            nsr_final_threshold=0.2,
            blacklisted_module_names=["head"],
            min_rank=2,
            trade_off_factor=1000.0,
            max_accepted_ppl_diff=1.0,
            shared_metric_threshold=threshold,
            use_indexed_ladder=indexed,
        )

    m_fused, cfg_fused = run(threshold=100)  # fused ladder path
    m_shared, cfg_shared = run(threshold=0)  # shared-step path
    m_idx, cfg_idx = run(threshold=100, indexed=True)  # position-indexed
    assert cfg_fused.keys() == cfg_shared.keys() == cfg_idx.keys()
    for k in cfg_fused:
        assert cfg_fused[k]["modules"] == cfg_shared[k]["modules"]
        assert cfg_fused[k]["modules"] == cfg_idx[k]["modules"]
    b = next(lowrank_data_iter(jax.random.PRNGKey(7), 8, 64))
    np.testing.assert_allclose(
        np.asarray(m_fused(b)), np.asarray(m_shared(b)), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(m_fused(b)), np.asarray(m_idx(b)), atol=1e-5
    )


def test_indexed_ladder_matches_fused_falor():
    """falor's binary search through the position-indexed program must
    reproduce the fused per-site path's decisions exactly."""
    from ptdeco_tpu import falor
    from tests.test_dwain_e2e import lowrank_data_iter as ldi
    from tests.test_dwain_e2e import make_mlp as mk

    def run(indexed):
        return falor.decompose(
            module=mk(64),
            data_iterator=(b["inp"] for b in ldi(jax.random.PRNGKey(0), 16, 64)),
            proportion_threshold=1.1,
            nsr_final_threshold=0.2,
            kl_final_threshold=10.0,
            num_data_steps=2,
            num_metric_steps=2,
            blacklisted_module_names=["head"],
            use_indexed_ladder=indexed,
        )

    m_fused, cfg_fused = run(False)
    m_idx, cfg_idx = run(True)
    assert cfg_fused.keys() == cfg_idx.keys() and len(cfg_fused) >= 1
    for k in cfg_fused:
        assert cfg_fused[k]["modules"] == cfg_idx[k]["modules"]
    b = next(ldi(jax.random.PRNGKey(7), 8, 64))["inp"]
    np.testing.assert_allclose(
        np.asarray(m_fused(b)), np.asarray(m_idx(b)), atol=1e-5
    )
