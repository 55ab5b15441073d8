"""Pallas kernels, run in interpreter mode on CPU (SURVEY.md §4 strategy);
the TPU-compiled path is exercised by bench.py on hardware."""

import jax
import jax.numpy as jnp
import numpy as np

from ptdeco_tpu import ops


def test_syrk_matches_xla_small_fallback():
    y = jax.random.normal(jax.random.PRNGKey(0), (64, 96))
    g = ops.syrk_gram(y)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(ops.gram_xla(y)), rtol=1e-5, atol=1e-5
    )


def test_syrk_interpret_matches_xla_padded():
    # d=512 -> 2x2 tiles of 256: triangle path; N=100 needs padding
    y = jax.random.normal(jax.random.PRNGKey(1), (100, 512)) * 0.1
    g = ops.syrk_gram(y, interpret=True)
    ref = ops.gram_xla(y)
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref), rtol=1e-4, atol=1e-4)
    # symmetry exact
    np.testing.assert_array_equal(np.asarray(g), np.asarray(g).T)


def test_syrk_interpret_bf16_input():
    y = (jax.random.normal(jax.random.PRNGKey(2), (256, 512)) * 0.1).astype(
        jnp.bfloat16
    )
    g = ops.syrk_gram(y, interpret=True)
    ref = ops.gram_xla(y)
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_auto_dispatch_actually_fires_with_bf16_activations():
    """INTEGRATION spy: under use_pallas='auto' the engine must route a
    bf16-activation site through syrk_gram with a bf16 input.  (The first
    auto implementation keyed on y.dtype — always f32 — and was dead code;
    this test pins the wiring, with the rule itself forced open.)"""
    import unittest.mock as mock

    from ptdeco_tpu import engine, nn
    from ptdeco_tpu.ops import gram_pallas

    class Net(nn.Module):
        mod: nn.Linear

        def __call__(self, x, ctx=None):
            return self.mod(x, ctx)

    net = Net(mod=nn.Linear.create(jax.random.PRNGKey(0), 64, 64))
    net = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if hasattr(a, "dtype") else a, net
    )
    seen = {}

    def spy(y):
        seen["dtype"] = y.dtype
        return ops.gram_xla(y)

    batches = [
        (jax.random.normal(jax.random.PRNGKey(i), (16, 64)) * 0.1).astype(
            jnp.bfloat16
        )
        for i in range(2)
    ]
    with mock.patch.object(
        gram_pallas, "should_use_syrk", return_value=True
    ), mock.patch.object(gram_pallas, "syrk_gram", side_effect=spy):
        g, _ = engine.compute_output_grams(
            net, ["mod"], iter(batches), num_data_steps=2
        )
    assert seen["dtype"] == jnp.bfloat16  # routed, with activation dtype
    ref, _ = engine.compute_output_grams(
        net, ["mod"], iter(batches), num_data_steps=2, use_pallas=False
    )
    np.testing.assert_allclose(
        np.asarray(g["mod"]), np.asarray(ref["mod"]), rtol=1e-2, atol=1e-2
    )


def test_should_use_syrk_auto_rule():
    """The engine's use_pallas=None auto dispatch: TPU + bf16 + tileable d
    (measured win on v5e, see should_use_syrk docstring).  Device count no
    longer gates the rule: the engine routes through
    syrk_gram_partitioned, whose custom_partitioning lowering runs the
    kernel per shard + psum on meshes."""
    assert ops.should_use_syrk(jnp.bfloat16, 2048, backend="tpu")
    assert not ops.should_use_syrk(jnp.float32, 2048, backend="tpu")
    assert not ops.should_use_syrk(jnp.bfloat16, 256, backend="tpu")
    assert not ops.should_use_syrk(jnp.bfloat16, 2048, backend="cpu")
    # ambient default on this host is cpu -> off
    assert not ops.should_use_syrk(jnp.bfloat16, 2048)


def test_syrk_gram_sharded_matches_einsum_on_mesh():
    """shard_map-wrapped SYRK on dp-sharded rows == the replicated einsum
    Gram (per-shard kernel + psum — the GSPMD-compatible path a bare
    pallas_call cannot express).  Interpreter mode on the virtual mesh."""
    from ptdeco_tpu import parallel
    from ptdeco_tpu.ops.gram_pallas import gram_xla, syrk_gram_sharded

    mesh = parallel.local_mesh(4)
    n, d = 64, 512  # d >= 2*TILE so the kernel path runs (not the fallback)
    y = jax.random.normal(jax.random.PRNGKey(0), (n, d), jnp.float32)
    y_sharded = jax.device_put(y, parallel.batch_sharding(mesh))

    g = syrk_gram_sharded(y_sharded, mesh, row_axes=("dp",), interpret=True)
    ref = gram_xla(y)
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref), atol=1e-4)


def test_syrk_gram_partitioned_mesh_exact():
    """custom_partitioning SYRK under a mesh: rows sharded over dp (and
    over a ('dp','sp') tuple) produce the exact replicated Gram — each
    device grams its LOCAL rows and the partials psum, so the engine's
    auto SYRK path is now mesh-legal (should_use_syrk no longer gates on
    device_count).  d below the tile threshold so the CPU lowering takes
    the gram_xla fallback inside the same partitioned op."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ptdeco_tpu import parallel
    from ptdeco_tpu.ops.gram_pallas import gram_xla, syrk_gram_partitioned

    y = jax.random.normal(jax.random.PRNGKey(0), (64, 96), jnp.float32)
    ref = gram_xla(y)

    mesh = parallel.local_mesh(8)
    ys = jax.device_put(y, parallel.batch_sharding(mesh))
    out = jax.jit(syrk_gram_partitioned)(ys)
    assert out.sharding.spec == P(), out.sharding.spec
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    mesh2 = parallel.make_mesh(dp=2, sp=4)
    ys2 = jax.device_put(y, NamedSharding(mesh2, P(("dp", "sp"))))
    out2 = jax.jit(syrk_gram_partitioned)(ys2)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), atol=1e-4)


def test_syrk_gram_partitioned_single_device():
    from ptdeco_tpu.ops.gram_pallas import gram_xla, syrk_gram_partitioned

    y = jax.random.normal(jax.random.PRNGKey(1), (32, 48), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(syrk_gram_partitioned(y)),
        np.asarray(gram_xla(y)),
        atol=1e-5,
    )
