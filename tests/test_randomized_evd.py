"""Randomized top-k EVD (engine.randomized_topk_eigenvectors): LAPACK-
validated accuracy and decision parity with the exact host-f64 path that
mirrors the reference (dwain/decomposition.py:155-163)."""

import jax
import jax.numpy as jnp
import numpy as np

from ptdeco_tpu import dwain, engine
from tests.test_dwain_e2e import loss_fn, lowrank_data_iter, make_mlp


def _make_gram(d=256, rank=16, noise=1e-2, seed=0):
    rng = np.random.RandomState(seed)
    a = rng.randn(d, rank) / np.sqrt(rank)
    y = rng.randn(4096, rank) @ a.T + noise * rng.randn(4096, d)
    g = (y.T @ y / y.shape[0]).astype(np.float32)
    return jnp.asarray(g)


def test_projector_matches_lapack_inside_spectral_gap():
    """At cut points inside the well-separated part of the spectrum the
    rank-k projector is unique, so randomized and exact must agree."""
    g = _make_gram()
    u_exact = engine.eigenvectors_from_gram(g, in_float64=True)
    u_rand = engine.randomized_topk_eigenvectors(g, top_k=128)
    for rank in (4, 8, 16):
        pe = u_exact[:, -rank:] @ u_exact[:, -rank:].T
        ur = np.asarray(u_rand[:, -rank:])
        pr = ur @ ur.T
        np.testing.assert_allclose(pr, pe, atol=5e-4)


def test_reconstruction_quality_matches_lapack():
    """Beyond the gap the projector is not unique, but the reconstruction
    error ||G - P G P|| the decomposition actually optimizes must match."""
    g = np.asarray(_make_gram(), np.float64)
    u_exact = engine.eigenvectors_from_gram(jnp.asarray(g, jnp.float32))
    u_rand = np.asarray(
        engine.randomized_topk_eigenvectors(jnp.asarray(g, jnp.float32), 128),
        np.float64,
    )
    for rank in (8, 32, 64, 128):
        pe = u_exact[:, -rank:] @ u_exact[:, -rank:].T
        pr = u_rand[:, -rank:] @ u_rand[:, -rank:].T
        err_e = np.linalg.norm(g - pe @ g @ pe)
        err_r = np.linalg.norm(g - pr @ g @ pr)
        # at the sketch edge (rank == top_k) the cut falls inside the flat
        # noise spectrum; a few % extra error deep in the noise floor is the
        # method's documented trade
        assert err_r <= err_e * 1.10 + 1e-6, (rank, err_r, err_e)


def test_split_phases_match_fused_helper():
    """sketch_for_randomized_eigh + finish_randomized_eigh (the pipelined
    split) must equal randomized_topk_eigenvectors exactly."""
    g = _make_gram(seed=3)
    u1 = engine.randomized_topk_eigenvectors(g, top_k=64)
    q, b = engine.sketch_for_randomized_eigh(g, 64)
    v = np.linalg.eigh(b)[1]
    u2 = engine.finish_randomized_eigh(q, v, 64)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), atol=1e-6)


def _run_decompose(eigh_method, precompute=None):
    return dwain.decompose(
        module=make_mlp(64),
        data_iterator=lowrank_data_iter(jax.random.PRNGKey(0), 16, 64),
        loss_fn=loss_fn,
        num_data_steps=3,
        metric_iterator=lowrank_data_iter(jax.random.PRNGKey(1), 16, 64),
        num_metric_steps=2,
        nsr_final_threshold=0.2,
        blacklisted_module_names=["head"],
        min_rank=2,
        trade_off_factor=1000.0,
        max_accepted_ppl_diff=1.0,
        eigh_method=eigh_method,
        precomputing_covariance_num_splits=precompute,
    )


def test_dwain_decision_parity_randomized_vs_exact():
    """Whole-walk rank decisions must be identical on a model whose
    low-rank structure dominates (the regime the method targets)."""
    _, cfg_exact = _run_decompose("exact")
    _, cfg_rand = _run_decompose("randomized")
    assert cfg_exact.keys() == cfg_rand.keys() and len(cfg_exact) == 2
    for k in cfg_exact:
        assert cfg_exact[k]["modules"] == cfg_rand[k]["modules"]


def test_dwain_randomized_pipelined_precompute_matches():
    """The async pipelined precompute (worker-thread eigh) must reproduce
    the non-precomputed randomized walk's decisions."""
    _, cfg_direct = _run_decompose("randomized")
    _, cfg_pipe = _run_decompose("randomized", precompute=1)
    assert cfg_direct.keys() == cfg_pipe.keys()
    for k in cfg_direct:
        assert cfg_direct[k]["modules"] == cfg_pipe[k]["modules"]


def test_dwain_exact_pipelined_precompute_deterministic():
    """The async pipelined exact-f64 precompute is deterministic and makes
    the same decisions as the per-site exact path.  (Factor VALUES lawfully
    differ from the non-precomputed walk — precomputed grams come from the
    original model, per reference semantics dwain:580-674; value-level
    parity vs the reference's precompute mode is pinned by the whole-model
    golden, tests/test_whole_model_parity.py.)"""
    m1, cfg1 = _run_decompose("exact", precompute=1)
    m2, cfg2 = _run_decompose("exact", precompute=1)
    _, cfg_serial = _run_decompose("exact")
    assert cfg1.keys() == cfg2.keys() == cfg_serial.keys()
    for k in cfg1:
        assert cfg1[k]["modules"] == cfg2[k]["modules"]
    b = next(lowrank_data_iter(jax.random.PRNGKey(7), 8, 64))
    np.testing.assert_allclose(
        np.asarray(m1(b)), np.asarray(m2(b)), atol=1e-7
    )


def test_randomized_evd_on_sharded_gram():
    """Distributed EVD path (SURVEY §2.7 "sharded linear algebra"): the
    subspace-iteration matmuls accept a mesh-SHARDED Gram — XLA partitions
    G @ Q row-wise and gathers only the thin (d, m) iterate for QR, so the
    d x d Gram never needs to live on one device (the Llama-8B down_proj
    Gram is 14336^2).  Correctness: projector equality with the exact path
    on the 8-device mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ptdeco_tpu import parallel

    g = _make_gram(d=512, rank=24, seed=7)
    mesh = parallel.make_mesh(dp=8, tp=1)
    g_sharded = jax.device_put(
        g, NamedSharding(mesh, P("dp", None))
    )
    assert len(g_sharded.sharding.device_set) == 8
    u_sharded = engine.randomized_topk_eigenvectors(g_sharded, top_k=128)
    u_exact = engine.eigenvectors_from_gram(g, in_float64=True)
    for rank in (8, 16, 24):
        pe = u_exact[:, -rank:] @ u_exact[:, -rank:].T
        ur = np.asarray(u_sharded[:, -rank:])
        np.testing.assert_allclose(ur @ ur.T, pe, atol=5e-4)
