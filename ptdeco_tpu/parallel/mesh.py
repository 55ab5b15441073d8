"""Device-mesh and sharding helpers.

The reference is strictly single-process single-GPU (SURVEY.md §2.7; device
pick at /root/reference/examples/trainer_llm/run_decompose_dwain.py:144-147).
This module is the TPU-native layer it lacks: a named mesh over ICI with
``dp`` (data/batch) and ``tp`` (tensor) axes, and helpers to shard
calibration batches and model parameters so XLA inserts the collectives.

Key property exploited everywhere: the Gram/covariance accumulators are
batch-sums, so data-parallel sharding of calibration batches is *exact* —
the psum that XLA inserts under the contraction reproduces the serial
accumulation bit-for-bit (up to reduction order).
"""

from __future__ import annotations

import logging
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
    "local_mesh",
    "initialize_distributed",
]

DP_AXIS = "dp"
SP_AXIS = "sp"
EP_AXIS = "ep"
PP_AXIS = "pp"
TP_AXIS = "tp"


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up: jax.distributed.initialize (auto-detected on
    TPU pods when args are None).  After this, ``jax.devices()`` spans the
    pod and the same mesh helpers produce pod-wide meshes — the multi-host
    layer the reference has no equivalent of (SURVEY.md §2.7)."""
    import jax.distributed

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(
    dp: Optional[int] = None,
    tp: int = 1,
    sp: int = 1,
    ep: int = 1,
    pp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a (dp[, sp][, ep][, pp], tp) mesh.  With dp=None, use all
    devices/(tp*sp*ep*pp).

    ``sp`` (sequence parallel) adds a mesh axis for sharding the SEQUENCE
    dimension of calibration batches (see ``shard_batch_seq``).  The Gram
    accumulators are sums over flattened (B*S) rows, so sequence sharding
    is exact for calibration, the honest sp story for this workload
    (SURVEY.md §5 "long-context").

    ``ep`` (expert parallel) adds a mesh axis for sharding the leading
    expert dimension of stacked MoE tensors
    (``models.stack_moe_experts``; rules in parallel/shardings.py) —
    each device stores and computes E/ep experts.

    ``pp`` (pipeline parallel) adds a mesh axis for sharding the LAYER
    dimension of a stacked homogeneous block stack
    (``parallel.pipeline_logits``) — each device stores and runs L/pp
    layers, with microbatched activations ppermuted between stages.

    Axes with extent 1 are omitted so existing 2-axis (dp, tp) consumers
    keep working unchanged."""
    devices = list(devices if devices is not None else jax.devices())
    model = tp * sp * ep * pp
    if dp is None:
        dp = len(devices) // model
    elif dp * model < len(devices):
        # an explicit dp requests that many data-parallel groups — use the
        # first dp*sp*ep*pp*tp devices rather than failing on larger
        # hosts; say so, or a typo'd dp leaves devices idle with no signal
        logging.getLogger(__name__).warning(
            "make_mesh(dp=%d, sp=%d, ep=%d, pp=%d, tp=%d) uses %d of %d "
            "devices (%d left idle)",
            dp, sp, ep, pp, tp, dp * model, len(devices),
            len(devices) - dp * model,
        )
        devices = devices[: dp * model]
    assert dp * model == len(devices), (dp, sp, ep, pp, tp, len(devices))
    dims = [(DP_AXIS, dp)]
    if sp > 1:
        dims.append((SP_AXIS, sp))
    if ep > 1:
        dims.append((EP_AXIS, ep))
    if pp > 1:
        dims.append((PP_AXIS, pp))
    dims.append((TP_AXIS, tp))
    arr = np.asarray(devices).reshape([n for _, n in dims])
    return Mesh(arr, tuple(a for a, _ in dims))


def local_mesh(n: Optional[int] = None) -> Mesh:
    """Pure-dp mesh over the first n local devices (tests, calibration)."""
    devices = jax.devices()[: n or len(jax.devices())]
    return make_mesh(dp=len(devices), tp=1, devices=devices)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DP_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Shard the leading (batch) axis of every array in a batch over dp."""
    sharding = batch_sharding(mesh)

    def put(x):
        if hasattr(x, "shape") and getattr(x, "ndim", 0) >= 1:
            return jax.device_put(x, sharding)
        return x

    return jax.tree_util.tree_map(put, batch)


def shard_batch_seq(batch: Any, mesh: Mesh) -> Any:
    """Shard batch over dp AND sequence (second axis) over sp — exact for
    Gram calibration, which flattens to (B*S, d) rows before the row-sum.
    Arrays without a sequence axis shard over dp only."""
    if SP_AXIS not in mesh.axis_names:
        return shard_batch(batch, mesh)
    dp_sp = NamedSharding(mesh, P(DP_AXIS, SP_AXIS))
    dp_only = NamedSharding(mesh, P(DP_AXIS))

    def put(x):
        if not hasattr(x, "shape") or getattr(x, "ndim", 0) < 1:
            return x
        if x.ndim >= 2 and x.shape[1] % mesh.shape[SP_AXIS] == 0:
            return jax.device_put(x, dp_sp)
        return jax.device_put(x, dp_only)

    return jax.tree_util.tree_map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = replicated_sharding(mesh)

    def put(x):
        if hasattr(x, "shape"):
            return jax.device_put(x, sharding)
        return x

    return jax.tree_util.tree_map(put, tree)
