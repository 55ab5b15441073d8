"""Measure the REFERENCE falor (torch ptdeco, /root/reference/src) on a
resnet18-class conv workload, for bench.py's live falor comparison.

falor carries the reference's ONLY published quantitative perf claim
("Model decomposition lasts < 1 GPU hour", /root/reference/README.md:44-46)
and is "Tested on vision models" — so the comparison workload is a conv
tower at resnet18 stage widths (64->128->256->512 1x1 convs + a 1000-way
linear head; falor decomposes exactly these two layer types,
/root/reference/src/ptdeco/falor/decomposition.py:37-47).

Both sides construct the SAME model weights and the SAME calibration batch
from one numpy RandomState recipe (no artifact files), run falor with the
same hyperparameters, and must produce the same per-site accept decisions
and proportions — asserted in bench.py against the JSON this prints.

The calibration pool is ONE fixed batch (cycled): the reference consumes a
single continuous data iterator across its per-site walk, so any
multi-batch pool would make each site's data depend on site ORDER, which
this comparison must not assume is identical across implementations.
"""

import argparse
import json
import sys
import time

import numpy as np
import torch

torch.set_num_threads(1)
sys.path.insert(0, "/root/reference/src")
import ptdeco.falor  # noqa: E402

SEED = 2024
BATCH = 32
IMG = 64
N_CLASSES = 1000
# (c_in, c_out, pool_after) for the 1x1 conv tower — resnet18 stage widths
CONV_PLAN = [
    (64, 64, False),
    (64, 64, True),
    (64, 128, False),
    (128, 128, True),
    (128, 256, False),
    (256, 256, True),
    (256, 512, False),
    (512, 512, False),
]
FALOR_KW = dict(
    proportion_threshold=0.95,
    nsr_final_threshold=0.02,
    kl_final_threshold=0.05,
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


class FalorNet(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.stem = torch.nn.Conv2d(3, 64, 3, stride=2, padding=1)
        self.convs = torch.nn.ModuleList(
            [torch.nn.Conv2d(ci, co, 1) for ci, co, _ in CONV_PLAN]
        )
        self.fc = torch.nn.Linear(512, N_CLASSES)

    def forward(self, x):
        x = torch.relu(self.stem(x))
        for conv, (_, _, pool) in zip(self.convs, CONV_PLAN):
            x = torch.relu(conv(x))
            if pool:
                x = torch.nn.functional.avg_pool2d(x, 2)
        return self.fc(x.mean(dim=(2, 3)))


def shared_arrays():
    """The (weights, calibration batch) recipe shared with bench.py —
    keep in lockstep with bench.py::_falor_shared_arrays."""
    rng = np.random.RandomState(SEED)
    weights = {"stem.weight": (rng.randn(64, 3, 3, 3) / 5.0).astype(np.float32)}
    weights["stem.bias"] = (0.1 * rng.randn(64)).astype(np.float32)
    for i, (ci, co, _) in enumerate(CONV_PLAN):
        w = lowrank_weight(rng, co, ci, max(min(ci, co) // 8, 4))
        weights[f"convs.{i}.weight"] = w[:, :, None, None]
        weights[f"convs.{i}.bias"] = (0.1 * rng.randn(co)).astype(np.float32)
    weights["fc.weight"] = lowrank_weight(rng, N_CLASSES, 512, 64)
    weights["fc.bias"] = (0.1 * rng.randn(N_CLASSES)).astype(np.float32)
    calib = rng.randn(BATCH, 3, IMG, IMG).astype(np.float32)
    return weights, calib


def run() -> tuple[float, dict]:
    weights, calib = shared_arrays()
    model = FalorNet()
    model.load_state_dict({k: torch.from_numpy(v) for k, v in weights.items()})
    model.eval()
    batch = torch.from_numpy(calib)

    def it():
        while True:
            yield batch

    t0 = time.perf_counter()
    config = ptdeco.falor.decompose_in_place(
        module=model,
        device=torch.device("cpu"),
        data_iterator=it(),
        **FALOR_KW,
    )
    elapsed = time.perf_counter() - t0
    decisions = {
        name: entry["__meta__"]["proportion"]
        for name, entry in config.items()
    }
    return elapsed, decisions


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--repeats", type=int, default=1)
    args = parser.parse_args()
    best, decisions = None, None
    for _ in range(args.repeats):
        elapsed, decisions = run()
        print(f"reference falor wall-clock: {elapsed:.2f}s", file=sys.stderr)
        best = elapsed if best is None else min(best, elapsed)
    print(
        json.dumps(
            {"falor_wall_s": round(best, 2), "decisions": decisions}
        )
    )


if __name__ == "__main__":
    main()
