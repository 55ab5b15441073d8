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


def make_dwain_golden() -> None:
    """Numerical parity fixture for the covariance -> eigh -> truncate ->
    factor path: run the reference's primitives at a REDUCED rank on fixed
    numpy data; our implementation must reproduce the truncated model output
    (the rank-8 projector is unique for generic data, so implementations
    agree up to float noise)."""
    sys.path.insert(0, "/root/reference/src")
    from ptdeco.dwain.decomposition import (  # noqa: E402
        _compute_covariance_matrix_decomposition,
        _unwrap_in_place,
        _wrap_in_place,
    )

    rng = np.random.RandomState(20260816)
    d_in, d_out, rank = 64, 32, 8
    weight = rng.randn(d_out, d_in).astype(np.float32) * 0.1
    bias = rng.randn(d_out).astype(np.float32) * 0.1
    batches = rng.randn(8, 16, d_in).astype(np.float32)
    x0 = rng.randn(16, d_in).astype(np.float32)

    class Net(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.mod = torch.nn.Linear(d_in, d_out)

        def forward(self, d):
            return self.mod(d["inp"])

    net = Net()
    with torch.no_grad():
        net.mod.weight.copy_(torch.from_numpy(weight))
        net.mod.bias.copy_(torch.from_numpy(bias))

    def data_iter():
        for b in batches:
            yield {"inp": torch.from_numpy(b)}
        while True:  # not reached
            yield {"inp": torch.from_numpy(batches[-1])}

    _wrap_in_place(net, "mod")
    orig_weight = net.mod.get_weight_copy()
    with torch.no_grad():
        u = _compute_covariance_matrix_decomposition(
            root_module=net,
            decomposed_submodule_name="mod",
            data_iterator=data_iter(),
            weight=orig_weight,
            num_data_steps=8,
            device=torch.device("cpu"),
            decompose_in_float64=True,
        )
        uk = u[:, u.shape[1] - rank :].to(torch.float)
        U, V = orig_weight.T @ uk, uk.T
        new_mod = net.mod.get_decomposed_module(u=U.T, v=V.T)
    _unwrap_in_place(net, "mod")
    net.mod = new_mod
    net.eval()
    with torch.no_grad():
        y1 = net({"inp": torch.from_numpy(x0)})

    np.savez(
        GOLDEN / "dwain_linear_rank8.npz",
        weight=weight,
        bias=bias,
        batches=batches,
        x0=x0,
        y1=y1.numpy(),
        rank=np.asarray(rank),
    )
    print("wrote dwain golden, y1[0,:4] =", y1.numpy()[0, :4])


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
    make_dwain_golden()


if __name__ == "__main__":
    main()
