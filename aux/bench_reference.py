"""Measure the REFERENCE implementation (torch ptdeco, /root/reference/src)
on the standard bench workload, to produce the vs_baseline constant used by
bench.py.

ptdeco publishes no benchmark numbers (BASELINE.md), so the baseline must be
measured.  This box has no GPU; the reference runs on torch-CPU.  Record the
result + environment in BASELINE_MEASURED.md.

Workload (identical to bench.py): dwain decomposition of a 4-layer d=768
MLP, synthetic Gaussian low-rank calibration data, num_data_steps=8,
num_metric_steps=2, min_rank=32, reduction_factor=0.5, fp64 eigh.
"""

import sys
import time

import torch

torch.set_num_threads(1)
sys.path.insert(0, "/root/reference/src")
import ptdeco  # noqa: E402

D = 2048
DEPTH = 4
BATCH = 256
RANK = 64  # intrinsic rank of synthetic inputs
NUM_DATA_STEPS = 8
NUM_METRIC_STEPS = 2


class MLP(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.blocks = torch.nn.ModuleList(
            [torch.nn.Linear(D, D) for _ in range(DEPTH)]
        )
        self.head = torch.nn.Linear(D, 16)

    def forward(self, batch):
        x = batch["inp"] if isinstance(batch, dict) else batch
        for b in self.blocks:
            x = torch.relu(b(x))
        return self.head(x)


def data_iterator():
    gen = torch.Generator().manual_seed(123)
    proj = torch.randn(RANK, D, generator=gen)
    while True:
        z = torch.randn(BATCH, RANK, generator=gen)
        yield {"inp": z @ proj}


def loss_fn(batch, out):
    return 0.01 * out.square().mean()


def finetune_fn(module, device, names):
    return module


def run(precompute: bool) -> float:
    torch.manual_seed(0)
    model = MLP()
    model.eval()
    device = torch.device("cpu")
    it = data_iterator()
    t0 = time.perf_counter()
    config = ptdeco.dwain.decompose_in_place(
        module=model,
        device=device,
        data_iterator=it,
        loss_fn=loss_fn,
        num_data_steps=NUM_DATA_STEPS,
        metric_iterator=it,
        num_metric_steps=NUM_METRIC_STEPS,
        nsr_final_threshold=0.5,
        finetune_fn=finetune_fn,
        min_rank=32,
        trade_off_factor=1000.0,
        reduction_factor=0.5,
        max_accepted_ppl_diff=1.0,
        decompose_in_float64=True,
        blacklisted_module_names=["head"],
        precomputing_covariance_num_splits=1 if precompute else None,
    )
    elapsed = time.perf_counter() - t0
    assert len(config) == DEPTH
    for name, entry in config.items():
        p = entry["__meta__"]["proportion"]
        assert p == 32 / D, f"{name}: unexpected proportion {p}"
    mode = "precompute" if precompute else "serial"
    n_params = ptdeco.utils.get_num_params(model)
    print(
        f"reference dwain [{mode}] wall-clock: {elapsed:.2f}s "
        f"({len(config)} sites decomposed, {n_params/1e6:.3f}M params)"
    )
    return elapsed


def main() -> None:
    import argparse
    import json

    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--repeats",
        type=int,
        default=1,
        help="runs per mode; the reported number is the min (bench.py "
        "passes 2, mirroring its own min-of-two-hot-runs policy)",
    )
    args = parser.parse_args()
    serial = min(run(precompute=False) for _ in range(args.repeats))
    pre = min(run(precompute=True) for _ in range(args.repeats))
    print(
        json.dumps(
            {"dwain_mlp_wall_s": round(serial, 2),
             "dwain_mlp_precompute_wall_s": round(pre, 2)}
        )
    )


if __name__ == "__main__":
    main()
