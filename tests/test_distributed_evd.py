"""Distributed EVD (parallel/evd.py): shard_map subspace iteration with
shifted CholeskyQR — the gather-free upgrade of the randomized path for
Grams too wide for a single-device QR (SURVEY §2.7 "sharded linear
algebra").  Correctness is pinned three ways: orthonormality of the
distributed Q, projector equality with exact LAPACK, and whole-walk
decision parity through dwain.  The reference has no analogue (host-serial
f64 LAPACK on the full Gram, dwain/decomposition.py:155-163)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ptdeco_tpu import dwain, engine, parallel
from tests.test_dwain_e2e import loss_fn, lowrank_data_iter, make_mlp
from tests.test_randomized_evd import _make_gram


def test_distributed_projector_matches_lapack():
    """Inside the spectral gap the rank-k projector is unique: the
    distributed path must agree with exact host LAPACK, and its basis must
    be orthonormal to f32 roundoff (CholeskyQR3's guarantee)."""
    g = _make_gram(d=512, rank=24, seed=7)
    mesh = parallel.make_mesh(dp=8, tp=1)
    g_sharded = jax.device_put(g, NamedSharding(mesh, P("dp", None)))
    u = parallel.distributed_topk_eigenvectors(g_sharded, top_k=128)
    un = np.asarray(u)
    np.testing.assert_allclose(un.T @ un, np.eye(128), atol=2e-5)
    u_exact = engine.eigenvectors_from_gram(g, in_float64=True)
    for rank in (8, 16, 24):
        pe = u_exact[:, -rank:] @ u_exact[:, -rank:].T
        pr = un[:, -rank:] @ un[:, -rank:].T
        np.testing.assert_allclose(pr, pe, atol=5e-4)


def test_distributed_result_stays_row_sharded():
    """No stage materializes anything tall on one device: the returned u is
    row-sharded over the full mesh (the consuming ladder re-shards as its
    own computation requires)."""
    g = _make_gram(d=512, rank=24, seed=3)
    mesh = parallel.make_mesh(dp=4, tp=2)
    g_sharded = jax.device_put(
        g, NamedSharding(mesh, P(("dp", "tp"), None))
    )
    u = parallel.distributed_topk_eigenvectors(g_sharded, top_k=64)
    assert len(u.sharding.device_set) == 8
    # row (dim-0) sharded: a per-device shard holds all columns, d/8 rows
    shard_shape = u.sharding.shard_shape(u.shape)
    assert shard_shape == (512 // 8, 64)


def test_distributed_handles_rank_deficient_gram():
    """A Gram with NO noise floor (exactly rank-r, r < sketch width) makes
    the iterate numerically rank-deficient — the regime where plain
    CholeskyQR's factor goes indefinite.  The shifted first pass must keep
    the walk finite and the top-r projector exact."""
    d, r = 256, 8
    rng = np.random.RandomState(0)
    a = rng.randn(d, r).astype(np.float32)
    g = jnp.asarray(a @ a.T)  # exactly rank 8, sketch m = 64+64 >> 8
    mesh = parallel.make_mesh(dp=8, tp=1)
    g_sharded = jax.device_put(g, NamedSharding(mesh, P("dp", None)))
    u = parallel.distributed_topk_eigenvectors(g_sharded, top_k=64)
    un = np.asarray(u)
    assert np.isfinite(un).all()
    u_exact = engine.eigenvectors_from_gram(g, in_float64=True)
    pe = u_exact[:, -r:] @ u_exact[:, -r:].T
    pr = un[:, -r:] @ un[:, -r:].T
    np.testing.assert_allclose(pr, pe, atol=5e-4)


def test_distributed_indivisible_width_falls_back():
    """d not divisible by the device count cannot form even shard_map row
    blocks: the documented fallback runs the same algorithm on a 1-device
    mesh rather than crashing."""
    g = _make_gram(d=250, rank=16, seed=1)  # 250 % 8 != 0
    u = parallel.distributed_topk_eigenvectors(g, top_k=64)
    un = np.asarray(u)
    np.testing.assert_allclose(un.T @ un, np.eye(64), atol=2e-5)


def _make_linear_net(d=64):
    """Purely linear stack: with exactly-rank-4 inputs every site's output
    Gram is exactly rank 4, so nsr(rank>=4) ~ roundoff and the accepted
    rank is unambiguously 4 for ANY correct eigensolver — decisions are
    far from every threshold, the regime where parity between two
    approximate methods is a fair contract (the ReLU MLP's rank-2
    boundary sits ON the threshold and flips on roundoff)."""
    from ptdeco_tpu import nn

    class LinNet(nn.Module):
        fc1: nn.Linear
        fc2: nn.Linear
        head: nn.Linear

        def __call__(self, batch, ctx=None):
            x = batch["inp"] if isinstance(batch, dict) else batch
            return self.head(self.fc2(self.fc1(x, ctx), ctx), ctx)

    k = jax.random.split(jax.random.PRNGKey(5), 3)
    return LinNet(
        fc1=nn.Linear.create(k[0], d, d),
        fc2=nn.Linear.create(k[1], d, d),
        head=nn.Linear.create(k[2], d, 8),
    )


def test_dwain_decision_parity_distributed_vs_exact():
    """Whole-walk rank decisions through dwain with eigh_method
    'distributed' must match the exact path — pinned in the clean linear
    regime where the data rank is the unambiguous answer."""

    def run(method):
        return dwain.decompose(
            module=_make_linear_net(64),
            data_iterator=lowrank_data_iter(jax.random.PRNGKey(0), 16, 64),
            loss_fn=loss_fn,
            num_data_steps=3,
            metric_iterator=lowrank_data_iter(jax.random.PRNGKey(1), 16, 64),
            num_metric_steps=2,
            nsr_final_threshold=0.2,
            blacklisted_module_names=["head"],
            min_rank=4,
            trade_off_factor=1000.0,
            max_accepted_ppl_diff=1.0,
            eigh_method=method,
        )

    _, cfg_exact = run("exact")
    _, cfg_dist = run("distributed")
    assert cfg_exact.keys() == cfg_dist.keys() and len(cfg_exact) == 2
    for k in cfg_exact:
        assert cfg_exact[k]["modules"] == cfg_dist[k]["modules"]
        # the data rank IS the decision
        assert cfg_exact[k]["modules"]["0"]["out_features"] == 4


def test_dwain_distributed_precompute_pipelined():
    """The pipelined precompute path (sketch on device, eigh of B on a
    worker thread) must reproduce the per-site distributed decisions."""

    def run(precompute):
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
            eigh_method="distributed",
            precomputing_covariance_num_splits=precompute,
        )

    _, cfg_direct = run(None)
    _, cfg_pipe = run(1)
    assert cfg_direct.keys() == cfg_pipe.keys()
    for k in cfg_direct:
        assert cfg_direct[k]["modules"] == cfg_pipe[k]["modules"]


def test_unknown_eigh_method_rejected():
    import pytest

    with pytest.raises(ValueError, match="eigh_method"):
        dwain.decompose(
            module=make_mlp(32),
            data_iterator=lowrank_data_iter(jax.random.PRNGKey(0), 8, 32),
            loss_fn=loss_fn,
            num_data_steps=1,
            metric_iterator=lowrank_data_iter(jax.random.PRNGKey(1), 8, 32),
            num_metric_steps=1,
            nsr_final_threshold=0.2,
            min_rank=2,
            trade_off_factor=1000.0,
            max_accepted_ppl_diff=1.0,
            eigh_method="quantum",
        )
