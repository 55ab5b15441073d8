"""LoRA attach -> train -> merge parity vs LIVE peft (VERDICT r2 item 2b).

The reference's recovery finetune attaches peft LoRA to the decomposed
factor pairs and merges with ``merge_and_unload``
(/root/reference/examples/trainer_llm/dwain_wrapper_module.py:150-265,
LoraConfig r=16 alpha=8, rank_pattern rank//16 / alpha_pattern rank//32).
These tests pin our LoRALinear's adapter math, training update, and merge
against peft on IDENTICAL adapter values — so scale/transpose/merge
conventions can't silently drift."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
peft = pytest.importorskip("peft")

from ptdeco_tpu import finetune, nn

torch.set_num_threads(1)

IN, RANK, OUT = 32, 8, 24


class TorchPair(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.pair = torch.nn.Sequential(
            torch.nn.Linear(IN, RANK, bias=False),
            torch.nn.Linear(RANK, OUT),
        )

    def forward(self, x):
        return self.pair(x)


def _build_both(r, alpha, rng):
    """(peft_model, our_model) with identical base weights AND identical
    nonzero adapter values on pair.0 and pair.1."""
    tm = TorchPair().eval()
    with torch.no_grad():
        tm.pair[0].weight.copy_(torch.from_numpy(rng.randn(RANK, IN).astype(np.float32) / 5))
        tm.pair[1].weight.copy_(torch.from_numpy(rng.randn(OUT, RANK).astype(np.float32) / 3))
        tm.pair[1].bias.copy_(torch.from_numpy(rng.randn(OUT).astype(np.float32) / 10))

    cfg = peft.LoraConfig(
        r=r,
        target_modules=["pair.0", "pair.1"],
        lora_alpha=alpha,
        lora_dropout=0.0,
        bias="none",
    )
    pm = peft.get_peft_model(TorchPair(), cfg)
    pm.base_model.model.pair[0].base_layer.load_state_dict(
        tm.pair[0].state_dict()
    )
    pm.base_model.model.pair[1].base_layer.load_state_dict(
        tm.pair[1].state_dict()
    )
    # nonzero adapters (peft inits B to zero; zero would hide merge bugs)
    a0 = rng.randn(r, IN).astype(np.float32) / 7
    b0 = rng.randn(RANK, r).astype(np.float32) / 9
    a1 = rng.randn(r, RANK).astype(np.float32) / 6
    b1 = rng.randn(OUT, r).astype(np.float32) / 8
    with torch.no_grad():
        pm.base_model.model.pair[0].lora_A["default"].weight.copy_(torch.from_numpy(a0))
        pm.base_model.model.pair[0].lora_B["default"].weight.copy_(torch.from_numpy(b0))
        pm.base_model.model.pair[1].lora_A["default"].weight.copy_(torch.from_numpy(a1))
        pm.base_model.model.pair[1].lora_B["default"].weight.copy_(torch.from_numpy(b1))
    pm.eval()

    class Pair(nn.Module):
        m0: nn.Module
        m1: nn.Module

        def __call__(self, x, ctx=None):
            return self.m1(self.m0(x, ctx), ctx)

    k = jax.random.split(jax.random.PRNGKey(0), 2)
    base0 = nn.Linear(
        kernel=jnp.asarray(tm.pair[0].weight.detach().numpy().T), bias=None
    )
    base1 = nn.Linear(
        kernel=jnp.asarray(tm.pair[1].weight.detach().numpy().T),
        bias=jnp.asarray(tm.pair[1].bias.detach().numpy()),
    )
    l0 = finetune.LoRALinear.attach(k[0], base0, r, alpha, dropout=0.0)
    l1 = finetune.LoRALinear.attach(k[1], base1, r, alpha, dropout=0.0)
    # overwrite with peft's exact adapter values (peft stores A as (r, in),
    # B as (out, r); ours are (in, r) / (r, out))
    l0 = l0.replace(lora_a=jnp.asarray(a0.T), lora_b=jnp.asarray(b0.T))
    l1 = l1.replace(lora_a=jnp.asarray(a1.T), lora_b=jnp.asarray(b1.T))
    ours = Pair(m0=l0, m1=l1)
    return pm, ours


@pytest.mark.parametrize(
    "r,alpha",
    [
        (16, 8),  # reference defaults (LoraConfig r=16, lora_alpha=8)
        (4, 2),  # rank_pattern regime: rank//16, alpha rank//32 at rank 64
    ],
)
def test_lora_forward_and_merge_match_peft(r, alpha):
    rng = np.random.RandomState(0)
    pm, ours = _build_both(r, alpha, rng)
    x = rng.randn(5, IN).astype(np.float32)

    # adapter-active forward parity
    with torch.no_grad():
        y_ref = pm(torch.from_numpy(x)).numpy()
    y_ours = np.asarray(ours(jnp.asarray(x)))
    np.testing.assert_allclose(y_ours, y_ref, atol=1e-5)

    # merge parity vs merge_and_unload
    merged_ref = pm.merge_and_unload()
    merged_ours = finetune.merge_lora(ours)
    np.testing.assert_allclose(
        np.asarray(merged_ours.m0.kernel).T,
        merged_ref.pair[0].weight.detach().numpy(),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(merged_ours.m1.kernel).T,
        merged_ref.pair[1].weight.detach().numpy(),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(merged_ours.m1.bias),
        merged_ref.pair[1].bias.detach().numpy(),
        atol=1e-6,
    )
    # merged modules are plain Linear again (peft unloads, we merge())
    assert isinstance(merged_ours.m0, nn.Linear)

    # merged forward == adapter-active forward
    with torch.no_grad():
        y_merged = merged_ref(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(y_merged, y_ref, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(merged_ours(jnp.asarray(x))), y_merged, atol=1e-5
    )


def test_lora_training_updates_match_peft_sgd():
    """Two SGD steps on the adapters only, identical data: parameter-for-
    parameter trajectory match proves gradient flow + trainable-set parity
    (base weights frozen on both sides)."""
    rng = np.random.RandomState(1)
    pm, ours = _build_both(16, 8, rng)
    x = rng.randn(6, IN).astype(np.float32)
    tgt = rng.randn(6, OUT).astype(np.float32)

    params = [p for p in pm.parameters() if p.requires_grad]
    assert len(params) == 4  # A/B for each of the two factor linears
    opt = torch.optim.SGD(params, lr=0.1)
    base_before = pm.base_model.model.pair[0].base_layer.weight.detach().clone()
    for _ in range(2):
        loss = ((pm(torch.from_numpy(x)) - torch.from_numpy(tgt)) ** 2).mean()
        opt.zero_grad()
        loss.backward()
        opt.step()
    assert torch.equal(
        base_before, pm.base_model.model.pair[0].base_layer.weight.detach()
    )

    import optax

    lora_leaves = ["m0.lora_a", "m0.lora_b", "m1.lora_a", "m1.lora_b"]
    paths = nn.tree_paths_of(ours, lora_leaves)
    trainable, frozen = nn.partition(
        ours, lambda p, leaf: jax.tree_util.keystr(p) in paths
    )
    tx = optax.sgd(0.1)
    opt_state = tx.init(trainable)
    for _ in range(2):

        def loss_fn(tr):
            y = nn.combine(tr, frozen)(jnp.asarray(x))
            return jnp.mean((y - jnp.asarray(tgt)) ** 2)

        _, grads = jax.value_and_grad(loss_fn)(trainable)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
    ours2 = nn.combine(trainable, frozen)

    np.testing.assert_allclose(
        np.asarray(ours2.m0.lora_a).T,
        pm.base_model.model.pair[0].lora_A["default"].weight.detach().numpy(),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ours2.m1.lora_b).T,
        pm.base_model.model.pair[1].lora_B["default"].weight.detach().numpy(),
        atol=1e-5,
    )
    with torch.no_grad():
        y_ref = pm(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(
        np.asarray(ours2(jnp.asarray(x))), y_ref, atol=1e-5
    )
