"""Whole-model DECISION-PARITY goldens: run the actual torch reference
(/root/reference, read-only oracle) `dwain.decompose_in_place` and
`falor.decompose_in_place` end-to-end on seeded toy models and record

  * the full decompose_config (incl. ``__meta__``),
  * the final state dict (torch format),
  * the exact calibration/metric data streams,
  * the final model output on a probe batch,

so tests/test_whole_model_parity.py can assert that OUR walk, fed the same
streams, picks the SAME RANKS per site, emits a matching config, and
produces outputs within float tolerance.  This converts "semantics match by
reading" into a regression-tested fact (reference call targets:
dwain/decomposition.py:677-800, falor/decomposition.py:424-511).

Run once (pure torch, no JAX):  python aux/make_whole_model_goldens.py
Outputs are checked into tests/golden/.
"""

import json
import pathlib
import sys

import numpy as np
import torch
import torch.nn.functional as F

torch.set_num_threads(1)
torch.set_float32_matmul_precision("highest")

sys.path.insert(0, "/root/reference/src")
import ptdeco  # noqa: E402
import ptdeco.falor  # noqa: E402  (not re-exported at top level)

GOLDEN = pathlib.Path(__file__).resolve().parent.parent / "tests" / "golden"
SEED = 20260816

# Hyperparameters frozen into the goldens (mirrored by the test).  Chosen so
# every accept/reject decision has a wide margin to its threshold — the
# generator prints the per-candidate metrics; margins were inspected before
# freezing.
DWAIN_KW = dict(
    num_data_steps=8,
    num_metric_steps=4,
    nsr_final_threshold=0.02,
    min_rank=2,
    trade_off_factor=2.0,
    reduction_factor=0.5,
    max_accepted_ppl_diff=0.1,
    decompose_in_float64=True,
)
FALOR_KW = dict(
    proportion_threshold=0.9,
    nsr_final_threshold=0.02,
    kl_final_threshold=0.01,
    num_data_steps=8,
    num_metric_steps=4,
    use_float64=True,
    use_mean=False,
    use_damping=True,
)


def lowrank_weight(rng, d_out, d_in, rank, noise=0.01):
    a = rng.randn(d_out, rank).astype(np.float64)
    b = rng.randn(rank, d_in).astype(np.float64)
    w = a @ b / np.sqrt(rank * d_in)
    w += noise * rng.randn(d_out, d_in) / np.sqrt(d_in)
    return w.astype(np.float32)


class MLP(torch.nn.Module):
    """3 linear sites; fc1/fc2 near-low-rank (accept deep ranks), fc3
    full-rank head (reject).  Accepts dict batches (dwain convention) or
    plain tensors (falor convention)."""

    def __init__(self):
        super().__init__()
        self.fc1 = torch.nn.Linear(64, 96)
        self.fc2 = torch.nn.Linear(96, 48)
        self.fc3 = torch.nn.Linear(48, 10)

    def forward(self, batch):
        x = batch["inp"] if isinstance(batch, dict) else batch
        x = torch.relu(self.fc1(x))
        x = torch.relu(self.fc2(x))
        return self.fc3(x)


class CNN(torch.nn.Module):
    """conv1 (3x3: not decomposeable), two 1x1 convs (sites), linear head
    (site).  NCHW on the torch side; the JAX twin is NHWC."""

    def __init__(self):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, 16, kernel_size=3, padding=1)
        self.conv2 = torch.nn.Conv2d(16, 32, kernel_size=1)
        self.conv3 = torch.nn.Conv2d(32, 24, kernel_size=1)
        self.fc = torch.nn.Linear(24, 10)

    def forward(self, batch):
        x = batch["inp"] if isinstance(batch, dict) else batch
        x = torch.relu(self.conv1(x))
        x = torch.relu(self.conv2(x))
        x = torch.relu(self.conv3(x))
        x = x.mean(dim=(2, 3))
        return self.fc(x)


class Attn(torch.nn.Module):
    """Single-head attention block + MLP + head: the LLM-shaped site mix
    (qkv/o/fc sites feeding softmax attention).  Near-low-rank q/k/v/o and
    fc1/fc2 (accept), full-rank head (reject)."""

    def __init__(self):
        super().__init__()
        self.ln1 = torch.nn.LayerNorm(48)
        self.q = torch.nn.Linear(48, 48)
        self.k = torch.nn.Linear(48, 48)
        self.v = torch.nn.Linear(48, 48)
        self.o = torch.nn.Linear(48, 48)
        self.ln2 = torch.nn.LayerNorm(48)
        self.fc1 = torch.nn.Linear(48, 96)
        self.fc2 = torch.nn.Linear(96, 48)
        self.head = torch.nn.Linear(48, 10)

    def forward(self, batch):
        x = batch["inp"] if isinstance(batch, dict) else batch
        h = self.ln1(x)
        q, k, v = self.q(h), self.k(h), self.v(h)
        a = torch.softmax(q @ k.transpose(-2, -1) / (48.0 ** 0.5), dim=-1)
        x = x + self.o(a @ v)
        h = self.ln2(x)
        x = x + self.fc2(torch.relu(self.fc1(h)))
        return self.head(x.mean(dim=1))


def make_attn(rng):
    m = Attn()
    with torch.no_grad():
        for lin, (do, di, r) in {
            m.q: (48, 48, 6), m.k: (48, 48, 6), m.v: (48, 48, 5),
            m.o: (48, 48, 6), m.fc1: (96, 48, 8), m.fc2: (48, 96, 6),
        }.items():
            lin.weight.copy_(torch.from_numpy(lowrank_weight(rng, do, di, r)))
        m.head.weight.copy_(
            torch.from_numpy(
                (rng.randn(10, 48) / np.sqrt(48)).astype(np.float32)
            )
        )
        for lin in (m.q, m.k, m.v, m.o, m.fc1, m.fc2, m.head):
            lin.bias.copy_(
                torch.from_numpy(
                    (0.1 * rng.randn(lin.bias.shape[0])).astype(np.float32)
                )
            )
    return m


def make_mlp(rng):
    m = MLP()
    with torch.no_grad():
        m.fc1.weight.copy_(torch.from_numpy(lowrank_weight(rng, 96, 64, 10)))
        m.fc2.weight.copy_(torch.from_numpy(lowrank_weight(rng, 48, 96, 6)))
        m.fc3.weight.copy_(
            torch.from_numpy(
                (rng.randn(10, 48) / np.sqrt(48)).astype(np.float32)
            )
        )
        for lin in (m.fc1, m.fc2, m.fc3):
            lin.bias.copy_(
                torch.from_numpy(
                    (0.1 * rng.randn(lin.bias.shape[0])).astype(np.float32)
                )
            )
    return m


def make_cnn(rng):
    m = CNN()
    with torch.no_grad():
        m.conv1.weight.copy_(
            torch.from_numpy(
                (rng.randn(16, 3, 3, 3) / 5.0).astype(np.float32)
            )
        )
        w2 = lowrank_weight(rng, 32, 16, 4)
        w3 = lowrank_weight(rng, 24, 32, 5)
        m.conv2.weight.copy_(torch.from_numpy(w2[:, :, None, None]))
        m.conv3.weight.copy_(torch.from_numpy(w3[:, :, None, None]))
        m.fc.weight.copy_(
            torch.from_numpy(
                (rng.randn(10, 24) / np.sqrt(24)).astype(np.float32)
            )
        )
        for mod in (m.conv1, m.conv2, m.conv3, m.fc):
            mod.bias.copy_(
                torch.from_numpy(
                    (0.1 * rng.randn(mod.bias.shape[0])).astype(np.float32)
                )
            )
    return m


def cycle_dicts(pool_x, pool_y):
    i = 0
    while True:
        yield {
            "inp": torch.from_numpy(pool_x[i % len(pool_x)]),
            "labels": torch.from_numpy(pool_y[i % len(pool_y)]),
        }
        i += 1


def cycle_tensors(pool_x):
    i = 0
    while True:
        yield torch.from_numpy(pool_x[i % len(pool_x)])
        i += 1


def ce_loss(input_dict, output):
    return F.cross_entropy(output, input_dict["labels"])


def identity_finetune(module, device, decomposed_names):
    return module


def save_sd_npz(path, model):
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    np.savez(path, **sd)


def run_dwain(name, model, calib_x, calib_y, metric_x, metric_y, probe,
              num_splits=None):
    dc = ptdeco.dwain.decompose_in_place(
        module=model,
        device=torch.device("cpu"),
        data_iterator=cycle_dicts(calib_x, calib_y),
        loss_fn=ce_loss,
        metric_iterator=cycle_dicts(metric_x, metric_y),
        finetune_fn=identity_finetune,
        precomputing_covariance_num_splits=num_splits,
        **DWAIN_KW,
    )
    model.eval()
    with torch.no_grad():
        y = model({"inp": torch.from_numpy(probe)})
    with open(GOLDEN / f"{name}_config.json", "w") as f:
        json.dump(dc, f, indent=2, sort_keys=True)
    save_sd_npz(GOLDEN / f"{name}_sd.npz", model)
    ranks = {
        k: v["__meta__"]["proportion"] for k, v in dc.items()
    }
    print(f"{name}: decomposed {sorted(dc.keys())} proportions={ranks}")
    return y.numpy()


def run_falor(name, model, calib_x, probe):
    dc = ptdeco.falor.decompose_in_place(
        module=model,
        device=torch.device("cpu"),
        data_iterator=cycle_tensors(calib_x),
        **FALOR_KW,
    )
    model.eval()
    with torch.no_grad():
        y = model(torch.from_numpy(probe))
    with open(GOLDEN / f"{name}_config.json", "w") as f:
        json.dump(dc, f, indent=2, sort_keys=True)
    save_sd_npz(GOLDEN / f"{name}_sd.npz", model)
    ranks = {k: v["__meta__"]["proportion"] for k, v in dc.items()}
    print(f"{name}: decomposed {sorted(dc.keys())} proportions={ranks}")
    return y.numpy()


def set_half_logits(module):
    for child in module.modules():
        if isinstance(child, ptdeco.lockd.WrappedLOCKDModule):
            with torch.no_grad():
                logits = child.get_logits()
                new_logits = -10 * torch.ones_like(logits)
                new_logits[::2] = 10.0
                logits.copy_(new_logits)


def run_lockd(rng):
    """lockd whole-walk numeric parity: wrap -> (deterministically forced
    gates, standing in for the RNG-bound Gumbel training) -> decompose.
    Saves the WRAPPED state dict so our test can run the same slicing on
    bit-identical student factors (reference lockd/decomposition.py:304-459)."""
    model = make_cnn(rng)
    probe = rng.randn(4, 3, 8, 8).astype(np.float32)
    ptdeco.lockd.wrap_in_place(model)
    # student factors get torch-RNG init; reseed deterministically anyway
    torch.manual_seed(SEED)
    for p in model.parameters():
        if p.requires_grad:
            pass  # keep torch's init; the sd snapshot is the contract
    set_half_logits(model)
    wrapped_sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    np.savez(GOLDEN / "whole_lockd_wrapped_sd.npz", **wrapped_sd)
    dc = ptdeco.lockd.decompose_in_place(model, proportion_threshold=0.9)
    model.eval()
    with torch.no_grad():
        y = model(torch.from_numpy(probe))
    with open(GOLDEN / "whole_lockd_config.json", "w") as f:
        json.dump(dc, f, indent=2, sort_keys=True)
    save_sd_npz(GOLDEN / "whole_lockd_sd.npz", model)
    np.savez(GOLDEN / "whole_lockd_io.npz", probe=probe, y=y.numpy())
    print(f"whole_lockd: decomposed {sorted(dc.keys())}")


def main():
    GOLDEN.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(SEED)

    # --- MLP family -------------------------------------------------------
    mlp_init = make_mlp(rng)
    calib_x = rng.randn(8, 16, 64).astype(np.float32)
    calib_y = rng.randint(0, 10, size=(8, 16)).astype(np.int64)
    metric_x = rng.randn(16, 16, 64).astype(np.float32)
    metric_y = rng.randint(0, 10, size=(16, 16)).astype(np.int64)
    probe = rng.randn(16, 64).astype(np.float32)

    init_sd = {k: v.detach().numpy().copy() for k, v in mlp_init.state_dict().items()}

    import copy

    y_dwain = run_dwain(
        "whole_dwain_mlp", copy.deepcopy(mlp_init), calib_x, calib_y,
        metric_x, metric_y, probe,
    )
    y_falor = run_falor("whole_falor_mlp", copy.deepcopy(mlp_init), calib_x, probe)
    # precompute mode (splits=2 exercises the chunked single-pass gram path)
    y_dwain_pre = run_dwain(
        "whole_dwain_mlp_pre", copy.deepcopy(mlp_init), calib_x, calib_y,
        metric_x, metric_y, probe, num_splits=2,
    )
    np.savez(
        GOLDEN / "whole_mlp_data.npz",
        calib_x=calib_x, calib_y=calib_y, metric_x=metric_x,
        metric_y=metric_y, probe=probe, y_dwain=y_dwain, y_falor=y_falor,
        y_dwain_pre=y_dwain_pre,
        **{f"init__{k}": v for k, v in init_sd.items()},
    )

    # --- CNN family -------------------------------------------------------
    cnn_init = make_cnn(rng)
    ccalib_x = rng.randn(8, 8, 3, 8, 8).astype(np.float32)
    ccalib_y = rng.randint(0, 10, size=(8, 8)).astype(np.int64)
    cmetric_x = rng.randn(16, 8, 3, 8, 8).astype(np.float32)
    cmetric_y = rng.randint(0, 10, size=(16, 8)).astype(np.int64)
    cprobe = rng.randn(8, 3, 8, 8).astype(np.float32)
    cinit_sd = {k: v.detach().numpy().copy() for k, v in cnn_init.state_dict().items()}

    cy_dwain = run_dwain(
        "whole_dwain_cnn", copy.deepcopy(cnn_init), ccalib_x, ccalib_y,
        cmetric_x, cmetric_y, cprobe,
    )
    cy_falor = run_falor("whole_falor_cnn", copy.deepcopy(cnn_init), ccalib_x, cprobe)
    np.savez(
        GOLDEN / "whole_cnn_data.npz",
        calib_x=ccalib_x, calib_y=ccalib_y, metric_x=cmetric_x,
        metric_y=cmetric_y, probe=cprobe, y_dwain=cy_dwain, y_falor=cy_falor,
        **{f"init__{k}": v for k, v in cinit_sd.items()},
    )

    run_lockd(rng)

    # --- Attention family (after lockd: keeps earlier RNG draws, and hence
    # all previously generated goldens, bit-identical) --------------------
    attn_init = make_attn(rng)
    acalib_x = rng.randn(8, 4, 8, 48).astype(np.float32)
    acalib_y = rng.randint(0, 10, size=(8, 4)).astype(np.int64)
    ametric_x = rng.randn(16, 4, 8, 48).astype(np.float32)
    ametric_y = rng.randint(0, 10, size=(16, 4)).astype(np.int64)
    aprobe = rng.randn(4, 8, 48).astype(np.float32)
    ainit_sd = {
        k: v.detach().numpy().copy() for k, v in attn_init.state_dict().items()
    }

    import copy

    ay_dwain = run_dwain(
        "whole_dwain_attn", copy.deepcopy(attn_init), acalib_x, acalib_y,
        ametric_x, ametric_y, aprobe,
    )
    ay_falor = run_falor(
        "whole_falor_attn", copy.deepcopy(attn_init), acalib_x, aprobe
    )
    np.savez(
        GOLDEN / "whole_attn_data.npz",
        calib_x=acalib_x, calib_y=acalib_y, metric_x=ametric_x,
        metric_y=ametric_y, probe=aprobe, y_dwain=ay_dwain, y_falor=ay_falor,
        **{f"init__{k}": v for k, v in ainit_sd.items()},
    )

    with open(GOLDEN / "whole_model_hparams.json", "w") as f:
        json.dump({"dwain": DWAIN_KW, "falor": FALOR_KW, "seed": SEED}, f, indent=2)
    print("goldens written to", GOLDEN)


if __name__ == "__main__":
    import logging

    logging.basicConfig(level=logging.INFO, format="%(message)s")
    main()
