"""LOCKD gate-training distributional parity vs the live torch reference.

Exact trajectory parity is impossible (the Gumbel noise streams of torch
and JAX cannot be aligned), so this pins the DISTRIBUTION: both
implementations train the same wrapped model (identical original weights,
identical random student-factor init copied from torch, identical data
batches, identical Adam hyperparameters) for the same number of
steps, and must arrive at matching gate statistics — per-module expected
proportion and the number of open gates (which channels close is
exchangeable under symmetric init, so the COUNT is the meaningful
statistic).  Reference loss recipe: nsr + lambda * proportion
(/root/reference/examples/trainer_vision/run_decompose_lockd.py:58-64).
"""

import pathlib
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

torch = pytest.importorskip("torch")

from ptdeco_tpu import lockd, nn, utils

torch.set_num_threads(1)

_REF = pathlib.Path("/root/reference/src")

D_IN, D_HID, D_OUT, DATA_RANK = 16, 16, 8, 3
N_STEPS, LR, LMBDA, NSR_THRESHOLD = 1500, 0.02, 2.0, 0.1


def _batches(n, bs=32, seed=0):
    """Deterministic rank-limited inputs shared by both frameworks."""
    rng = np.random.RandomState(seed)
    proj = rng.randn(DATA_RANK, D_IN).astype(np.float32)
    for _ in range(n):
        z = rng.randn(bs, DATA_RANK).astype(np.float32)
        yield z @ proj


def _stats_native(wrapped):
    props, counts = {}, {}
    for name, m in lockd.named_wrapped_modules(wrapped):
        logits = np.asarray(m.logits)
        props[name] = float(
            np.mean(1.0 / (1.0 + np.exp(-np.clip(logits, -30, 30))))
        )
        counts[name] = int((logits > 0).sum())
    return props, counts


@pytest.mark.skipif(not _REF.exists(), reason="reference not mounted")
def test_lockd_gate_training_distributional_parity():
    if str(_REF) not in sys.path:
        sys.path.insert(0, str(_REF))
    import ptdeco  # the torch reference

    torch.manual_seed(0)
    tmodel = torch.nn.Sequential()
    tmodel.add_module("fc1", torch.nn.Linear(D_IN, D_HID))
    tmodel.add_module("act", torch.nn.ReLU())
    tmodel.add_module("fc2", torch.nn.Linear(D_HID, D_OUT))
    ptdeco.lockd.wrap_in_place(tmodel)
    tsd = {k: v.detach().clone() for k, v in tmodel.state_dict().items()}

    # --- torch side: Adam over the wrapped modules' trainables ---------
    params = []
    for m in tmodel.modules():
        if isinstance(m, ptdeco.lockd.decomposition.WrappedLOCKDModule):
            params += m.parameters_trainable()
    opt = torch.optim.Adam(params, lr=LR)
    for x in _batches(N_STEPS, seed=0):
        xt = torch.from_numpy(x)
        tmodel(xt)
        loss = ptdeco.lockd.get_nsr_loss(
            tmodel, NSR_THRESHOLD
        ) + LMBDA * ptdeco.lockd.get_proportion_loss(tmodel)
        opt.zero_grad()
        loss.backward()
        opt.step()
    t_props, t_counts = {}, {}
    for name, m in tmodel.named_modules():
        if isinstance(m, ptdeco.lockd.decomposition.WrappedLOCKDModule):
            logits = m.get_logits().detach().numpy()
            t_props[name] = float(
                np.mean(1.0 / (1.0 + np.exp(-np.clip(logits, -30, 30))))
            )
            t_counts[name] = int((logits > 0).sum())

    # --- native side: same init (copied from torch), same data/recipe ---
    class MLP(nn.Module):
        fc1: nn.Linear
        fc2: nn.Linear

        def __call__(self, x, ctx=None):
            return self.fc2(jax.nn.relu(self.fc1(x, ctx)), ctx)

    k = jax.random.split(jax.random.PRNGKey(0), 2)
    native = MLP(
        fc1=nn.Linear.create(k[0], D_IN, D_HID),
        fc2=nn.Linear.create(k[1], D_HID, D_OUT),
    )
    wrapped = lockd.wrap(native, jax.random.PRNGKey(1))
    # identical starting point: torch wrapper state dict straight in
    wrapped = utils.load_state_dict(
        wrapped, {kk: vv.numpy() for kk, vv in tsd.items()}
    )
    trainable, frozen = lockd.trainable_partition(wrapped)
    tx = optax.adam(LR)
    opt_state = tx.init(trainable)

    @jax.jit
    def step(tr, opt_state, x, key):
        def loss_fn(tr):
            m = nn.combine(tr, frozen)
            ctx = nn.Ctx(key=key, train=False)
            m(x, ctx=ctx)
            nsr_sink = ctx.sink.get("nsr", {})
            return lockd.get_nsr_loss(
                nsr_sink, NSR_THRESHOLD
            ) + LMBDA * lockd.get_proportion_loss(m)

        loss, grads = jax.value_and_grad(loss_fn)(tr)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(tr, updates), opt_state, loss

    key = jax.random.PRNGKey(42)  # deliberately unrelated noise stream
    for x in _batches(N_STEPS, seed=0):
        key, sub = jax.random.split(key)
        trainable, opt_state, _ = step(
            trainable, opt_state, jnp.asarray(x), sub
        )
    wrapped = nn.combine(trainable, frozen)
    n_props, n_counts = _stats_native(wrapped)

    assert set(t_props) == set(n_props)
    for name in t_props:
        # expected-gate proportion distribution must match
        assert abs(t_props[name] - n_props[name]) < 0.15, (
            name, t_props[name], n_props[name],
        )
        # and the effective rank (open-gate count): data rank is 3, both
        # sides must agree to within 2 channels of each other
        assert abs(t_counts[name] - n_counts[name]) <= 2, (
            name, t_counts[name], n_counts[name],
        )
    # the training actually did something: gates moved off the 0.95 init
    assert any(p < 0.8 for p in n_props.values())
