"""Measure the REFERENCE lockd stage-0 gate-training step (torch ptdeco,
/root/reference/src) on a small conv workload, for bench_lockd.py's live
vs-reference comparison (VERDICT r3 #4: lockd had our-side throughput but
no vs-reference number).

The reference drives this loop through a composer Trainer
(/root/reference/examples/trainer_vision/run_decompose_lockd.py:206-228);
this measures the BARE step — wrapped forward, nsr + lmbda * proportion
loss, backward, SGD on the trainable subset — which is the fastest the
reference can possibly run it (no Trainer overhead), i.e. the harder
honest baseline.  torch-CPU single thread (no GPU in this image;
BASELINE_MEASURED.md policy).

Workload: the 6-site convnet below (3x3 convs, groups=1, + one Linear),
batch 32 at 64x64 — identical architecture on the native side
(aux/bench_lockd.py::make_small_convnet).  Wall-clock only; gate training
is stochastic so decisions are not compared (the distributional parity of
the METHOD is pinned separately in tests/test_lockd_parity.py).
"""

import argparse
import json
import sys
import time

import torch

torch.set_num_threads(1)
sys.path.insert(0, "/root/reference/src")
import ptdeco.lockd  # noqa: E402

BATCH = 32
IMG = 64
LMBDA = 0.4
NSR_THRESHOLD = 0.05


class SmallConvNet(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.stem = torch.nn.Conv2d(3, 32, 3, stride=2, padding=1)
        self.c1 = torch.nn.Conv2d(32, 64, 3, padding=1)
        self.c2 = torch.nn.Conv2d(64, 64, 3, padding=1)
        self.c3 = torch.nn.Conv2d(64, 128, 3, padding=1)
        self.c4 = torch.nn.Conv2d(128, 128, 3, padding=1)
        self.fc = torch.nn.Linear(128, 100)

    def forward(self, x):
        x = torch.relu(self.stem(x))
        x = torch.relu(self.c1(x))
        x = torch.nn.functional.avg_pool2d(torch.relu(self.c2(x)), 2)
        x = torch.relu(self.c3(x))
        x = torch.nn.functional.avg_pool2d(torch.relu(self.c4(x)), 2)
        return self.fc(x.mean(dim=(2, 3)))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=10)
    args = parser.parse_args()

    torch.manual_seed(0)
    model = SmallConvNet()
    model.eval()  # reference runs gate training in eval mode
    ptdeco.lockd.wrap_in_place(model)
    trainable = [
        p
        for name, p in model.named_parameters()
        if any(t in name for t in ("lin_0", "lin_1", "conv_1", "conv_2", "logits"))
    ]
    assert trainable
    opt = torch.optim.SGD(trainable, lr=1e-3, momentum=0.9)
    x = torch.randn(BATCH, 3, IMG, IMG)

    def step():
        opt.zero_grad()
        _ = model(x)
        nsr = ptdeco.lockd.get_nsr_loss(model, NSR_THRESHOLD)
        prop = ptdeco.lockd.get_proportion_loss(model)
        loss = nsr + LMBDA * prop
        loss.backward()
        opt.step()
        return float(loss)

    for _ in range(2):  # warmup
        step()
    t0 = time.perf_counter()
    last = 0.0
    for _ in range(args.steps):
        last = step()
    dt = (time.perf_counter() - t0) / args.steps
    assert last == last and last != float("inf")
    print(
        json.dumps(
            {
                "lockd_small_step_s": round(dt, 4),
                "steps_per_s": round(1.0 / dt, 2),
                "images_per_s": round(BATCH / dt, 1),
                "final_loss": round(last, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
