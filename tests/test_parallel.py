"""Data-parallel calibration on a virtual 8-device mesh: sharded Gram
accumulation must match the single-device result (the TPU-native feature the
reference lacks, SURVEY.md §2.7)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ptdeco_tpu import engine, nn, parallel


class Net(nn.Module):
    mod: nn.Linear

    def __call__(self, x, ctx=None):
        return self.mod(x, ctx)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_sharded_gram_matches_serial():
    d_in, d_out = 32, 24
    net = Net(mod=nn.Linear.create(jax.random.PRNGKey(0), d_in, d_out))
    batches = [
        jax.random.normal(jax.random.PRNGKey(i), (16, d_in)) for i in range(4)
    ]

    # serial
    g_serial, _ = engine.compute_output_grams(
        net, ["mod"], iter(batches), num_data_steps=4
    )

    # dp-sharded over the full 8-device mesh
    mesh = parallel.local_mesh()
    net_r = parallel.replicate(net, mesh)
    sharded = [parallel.shard_batch(b, mesh) for b in batches]
    g_sharded, _ = engine.compute_output_grams(
        net_r, ["mod"], iter(sharded), num_data_steps=4
    )

    np.testing.assert_allclose(
        np.asarray(g_serial["mod"]),
        np.asarray(g_sharded["mod"]),
        rtol=1e-5,
        atol=1e-5,
    )


def test_sharded_batch_layout():
    mesh = parallel.local_mesh()
    x = jnp.ones((16, 4))
    xs = parallel.shard_batch({"inp": x}, mesh)["inp"]
    assert xs.sharding.spec == jax.sharding.PartitionSpec("dp")


def test_mesh_shapes():
    mesh = parallel.make_mesh(dp=4, tp=2)
    assert mesh.shape == {"dp": 4, "tp": 2}
    # explicit dp smaller than the host takes a device subset
    mesh6 = parallel.make_mesh(dp=3, tp=2)
    assert mesh6.shape == {"dp": 3, "tp": 2}
    # overshooting the host still fails loudly
    with pytest.raises(AssertionError):
        parallel.make_mesh(dp=5, tp=2)


def test_seq_parallel_gram_matches_serial():
    """Sequence-parallel calibration: (B, S, d) batches sharded over
    (dp, sp) produce the same Gram as serial — the honest "long context /
    sequence parallel" property for this workload (SURVEY.md §5): taps
    flatten to (B*S, d) rows and the Gram is a row-sum, so sequence
    sharding is exact.  The model forward under a sharded S is handled by
    GSPMD-inserted collectives."""

    class SeqNet(nn.Module):
        mod: nn.Linear

        def __call__(self, x, ctx=None):
            return self.mod(x, ctx)  # (B, S, d_out)

    d_in, d_out = 32, 24
    net = SeqNet(mod=nn.Linear.create(jax.random.PRNGKey(0), d_in, d_out))
    batches = [
        jax.random.normal(jax.random.PRNGKey(10 + i), (4, 8, d_in))
        for i in range(3)
    ]
    g_serial, _ = engine.compute_output_grams(
        net, ["mod"], iter(batches), num_data_steps=3
    )

    mesh = parallel.make_mesh(dp=2, sp=2, tp=2)
    assert mesh.shape == {"dp": 2, "sp": 2, "tp": 2}
    net_r = parallel.replicate(net, mesh)
    sharded = [parallel.shard_batch_seq(b, mesh) for b in batches]
    assert sharded[0].sharding.spec == jax.sharding.PartitionSpec("dp", "sp")
    g_sp, _ = engine.compute_output_grams(
        net_r, ["mod"], iter(sharded), num_data_steps=3
    )
    np.testing.assert_allclose(
        np.asarray(g_serial["mod"]), np.asarray(g_sp["mod"]),
        rtol=1e-5, atol=1e-5,
    )


def test_shard_batch_seq_on_dict_batches():
    mesh = parallel.make_mesh(dp=2, sp=2, tp=2)
    batch = {
        "input_ids": jnp.ones((4, 8), jnp.int32),
        "attention_mask": jnp.ones((4, 8), jnp.int32),
        "scalar": jnp.float32(1.0),
    }
    out = parallel.shard_batch_seq(batch, mesh)
    assert out["input_ids"].sharding.spec == jax.sharding.PartitionSpec(
        "dp", "sp"
    )
    # sp==1 mesh falls back to plain dp sharding
    mesh2 = parallel.make_mesh(dp=4, tp=2)
    out2 = parallel.shard_batch_seq(batch, mesh2)
    assert out2["input_ids"].sharding.spec == jax.sharding.PartitionSpec("dp")


def test_chunk_slices_balanced():
    """Balanced chunking caps compiled shapes at 2 (usually 1): a naive
    trailing chunk would recompile the whole-model program."""
    from ptdeco_tpu.engine import _chunk_slices

    def sizes(total, mx):
        return [s.stop - s.start for s in _chunk_slices(total, mx)]

    assert sizes(12, 8) == [6, 6]  # even split, ONE compiled shape
    assert sizes(13, 8) == [7, 6]  # at most two shapes, differ by 1
    assert sizes(8, 8) == [8]
    assert sizes(3, 8) == [3]
    assert sizes(0, 8) == []
    for total in range(1, 40):
        for mx in range(1, 12):
            ss = sizes(total, mx)
            assert sum(ss) == total
            assert max(ss) <= mx
            assert len(set(ss)) <= 2


def test_prefetch_to_device_preserves_order_and_shards():
    import numpy as np

    from ptdeco_tpu import parallel, utils

    batches = [{"inputs": np.full((8, 2), i, np.float32)} for i in range(5)]
    mesh = parallel.local_mesh(4)
    out = list(
        utils.prefetch_to_device(
            iter(batches), size=2, sharding=parallel.batch_sharding(mesh)
        )
    )
    assert len(out) == 5
    for i, b in enumerate(out):
        assert float(b["inputs"][0, 0]) == i
        assert b["inputs"].sharding.spec == parallel.batch_sharding(mesh).spec

    # no sharding: plain device arrays, same order
    out2 = list(utils.prefetch_to_device(iter(batches)))
    assert [float(b["inputs"][0, 0]) for b in out2] == [0, 1, 2, 3, 4]
