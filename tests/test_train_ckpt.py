"""Training checkpointer: save/autoresume round-trip on module pytrees with
partition None-placeholders (orbax-backed)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ptdeco_tpu import nn
from ptdeco_tpu.utils.train_ckpt import TrainCheckpointer


class Net(nn.Module):
    fc1: nn.Linear
    fc2: nn.Linear

    def __call__(self, x, ctx=None):
        return self.fc2(jax.nn.relu(self.fc1(x, ctx)), ctx)


def test_save_and_autoresume(tmp_path):
    k = jax.random.split(jax.random.PRNGKey(0), 2)
    net = Net(fc1=nn.Linear.create(k[0], 4, 8), fc2=nn.Linear.create(k[1], 8, 2))
    paths = nn.tree_paths_of(net, ["fc2"])
    trainable, frozen = nn.partition(
        net, lambda p, leaf: jax.tree_util.keystr(p) in paths
    )
    tx = optax.adam(1e-2)
    opt_state = tx.init(trainable)

    ckpt = TrainCheckpointer(str(tmp_path / "ck"), save_interval_steps=1)
    tr0, os0, start = ckpt.restore_or(trainable, opt_state)
    assert start == 0

    # one update so state differs from init
    g = jax.tree_util.tree_map(lambda a: jnp.ones_like(a), trainable)
    upd, opt_state = tx.update(g, opt_state, trainable)
    trainable = optax.apply_updates(trainable, upd)
    ckpt.maybe_save(0, trainable, opt_state)
    ckpt.close()

    # "restart"
    ckpt2 = TrainCheckpointer(str(tmp_path / "ck"), save_interval_steps=1)
    tr1, os1, start1 = ckpt2.restore_or(tr0, os0)
    assert start1 == 1
    np.testing.assert_allclose(
        np.asarray(tr1.fc2.kernel), np.asarray(trainable.fc2.kernel)
    )
    assert tr1.fc1.kernel is None  # placeholder structure preserved
    ckpt2.close()


def test_chunked_save_covers_unaligned_intervals(tmp_path):
    """steps_per_dispatch=8 with save_interval_steps=100: chunk tails land
    on 7, 15, ..., never on a multiple of 100, so plain maybe_save NEVER
    checkpoints (ADVICE r4 high).  maybe_save_chunk must save at the tail
    of every chunk that covers a multiple — and only those."""
    spd, interval = 8, 100
    ckpt = TrainCheckpointer(str(tmp_path / "ck"), save_interval_steps=interval)
    payload = {"w": jnp.arange(4.0)}
    for start in range(0, 240, spd):
        ckpt.maybe_save_chunk(start, spd, payload, {"o": jnp.zeros(())})
    ckpt.close()

    ckpt2 = TrainCheckpointer(str(tmp_path / "ck"), save_interval_steps=interval)
    steps = sorted(ckpt2._mgr.all_steps())
    # chunks [0..7] (covers 0), [96..103] (covers 100), [200..207] (covers
    # 200) save at their true tail steps; max_to_keep=2 keeps the last two
    assert steps == [103, 207], steps
    _, _, resume = ckpt2.restore_or(payload, {"o": jnp.zeros(())})
    assert resume == 208  # exact resume, no replayed steps
    ckpt2.close()


def test_disabled_checkpointer_is_noop(tmp_path):
    ckpt = TrainCheckpointer(None, save_interval_steps=0)
    a, b, s = ckpt.restore_or(1, 2)
    assert (a, b, s) == (1, 2, 0)
    ckpt.maybe_save(0, 1, 2)
    ckpt.close()
