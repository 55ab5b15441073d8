"""Generate golden compatibility fixtures by running the *reference* torch
implementation (read-only at /root/reference) as an oracle.

Run once on a machine where the reference is mounted; the outputs are
checked into tests/golden/ and consumed by tests/test_compat_reference.py.
This script is tooling, not part of the library.

Produces (for a small conv+linear net):
  * lockd_smallnet_config.json   — reference decompose_config
  * lockd_smallnet_sd.pt         — reference state dict (torch format)
  * lockd_smallnet_io.npz        — input batch (NCHW) + reference output
"""

import json
import pathlib
import sys

import numpy as np
import torch

sys.path.insert(0, "/root/reference/src")
import ptdeco  # noqa: E402  (the reference library)

GOLDEN = pathlib.Path(__file__).resolve().parent.parent / "tests" / "golden"


class SmallNet(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, 16, kernel_size=3, padding=1)
        self.conv2 = torch.nn.Conv2d(16, 32, kernel_size=1)
        self.fc1 = torch.nn.Linear(32, 64)
        self.fc2 = torch.nn.Linear(64, 10)

    def forward(self, x):
        x = torch.relu(self.conv1(x))
        x = torch.relu(self.conv2(x))
        x = x.mean(dim=(2, 3))
        x = torch.relu(self.fc1(x))
        return self.fc2(x)


def set_half_logits(module):
    for child in module.modules():
        if isinstance(child, ptdeco.lockd.WrappedLOCKDModule):
            with torch.no_grad():
                logits = child.get_logits()
                new_logits = -10 * torch.ones_like(logits)
                new_logits[::2] = 10.0
                logits.copy_(new_logits)


def main() -> None:
    torch.manual_seed(20260816)
    GOLDEN.mkdir(parents=True, exist_ok=True)

    model = SmallNet()
    ptdeco.lockd.wrap_in_place(model)
    set_half_logits(model)
    dc = ptdeco.lockd.decompose_in_place(model, proportion_threshold=0.9)
    model.eval()

    x = torch.rand(3, 3, 8, 8, generator=torch.Generator().manual_seed(7))
    with torch.no_grad():
        y = model(x)

    with open(GOLDEN / "lockd_smallnet_config.json", "w") as f:
        json.dump(dc, f, indent=2)
    torch.save(model.state_dict(), GOLDEN / "lockd_smallnet_sd.pt")
    np.savez(
        GOLDEN / "lockd_smallnet_io.npz",
        x=x.numpy(),
        y=y.numpy(),
    )
    print("wrote goldens to", GOLDEN)
    print(json.dumps(dc, indent=2)[:500])


if __name__ == "__main__":
    main()
