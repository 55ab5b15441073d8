"""General helpers (JAX analogues of /root/reference/src/ptdeco/utils/common.py)."""

from __future__ import annotations

import logging
from typing import Any, Optional, TypeVar, Union

import jax
import jax.numpy as jnp
import numpy as np

from .. import nn

__all__ = [
    "resolve_subdir",
    "to_device",
    "get_num_params",
    "get_device_memory_gb",
    "is_compound_module",
    "get_type_name",
    "split_module_parent_child_name",
    "get_default_dtype",
]

logger = logging.getLogger(__name__)

T = TypeVar("T")


def resolve_subdir(base: Any, maybe_relative: Optional[str]) -> Optional[str]:
    """Resolve a possibly-relative directory under a base path (used by the
    trainers for checkpoint dirs; keeps the resolution rule in one place)."""
    import pathlib

    if not maybe_relative:
        return maybe_relative
    p = pathlib.Path(maybe_relative)
    return str(p) if p.is_absolute() else str(pathlib.Path(base) / p)


def to_device(
    o: Union[jax.Array, dict[str, Any]], device: Optional[jax.Device] = None
) -> Any:
    """Move an array or a dict of arrays to a device (reference
    common.py:25-36).  Non-array dict values pass through unchanged."""

    def put(v: Any) -> Any:
        if isinstance(v, (jax.Array, np.ndarray)):
            return jax.device_put(v, device)
        return v

    if isinstance(o, dict):
        return {k: put(v) for k, v in o.items()}
    return put(o)


def prefetch_to_device(
    iterator: Any, size: int = 2, sharding: Optional[Any] = None
) -> Any:
    """Wrap a host batch iterator so the NEXT ``size`` batches' host->device
    transfers are already in flight while the current step computes —
    the standard TPU input-overlap idiom (device_put is async; issuing it
    ahead keeps the H2D DMA busy under the jitted step instead of
    serializing transfer-then-compute).  ``sharding`` places batches
    directly into a mesh layout (e.g. ``parallel.batch_sharding(mesh)``).

    The reference gets this overlap from DALI's GPU pipeline + torch's
    pinned-memory loaders; here it is one generator around any of the
    pipelines (vision ImageNetPipeline, LLM loaders, synthetic)."""
    import collections
    import itertools

    def put(b: Any) -> Any:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding)
            if isinstance(x, (jax.Array, np.ndarray))
            else x,
            b,
        )

    it = iter(iterator)
    queue: Any = collections.deque()
    for b in itertools.islice(it, size):
        queue.append(put(b))
    while queue:
        out = queue.popleft()
        for b in itertools.islice(it, 1):
            queue.append(put(b))
        yield out


def get_num_params(module: nn.Module, only_trainable: bool = False) -> int:
    """Parameter count deduplicated by array identity (reference
    common.py:58-63 dedupes by data_ptr; shared/tied arrays count once).

    Matches torch's ``parameters()`` scope: BatchNorm running statistics
    and integer-typed buffers (index tables) are excluded — counting them
    would inflate the ``drop_in_params / num_params`` fraction that drives
    dwain's acceptance rule relative to the reference.  ``only_trainable``
    has no meaning here (trainability is a partition, not a leaf flag) and
    must be left False."""
    if only_trainable:
        raise NotImplementedError(
            "trainability is external (nn.partition) — count the "
            "partitioned trainable tree instead"
        )
    buffer_ids: set[int] = set()
    for _, m in nn.named_modules(module):
        if isinstance(m, nn.BatchNorm2d):
            buffer_ids.add(id(m.running_mean))
            buffer_ids.add(id(m.running_var))
    leaves = jax.tree_util.tree_leaves(module)
    unique: dict[int, Any] = {}
    for leaf in leaves:
        if hasattr(leaf, "size") and hasattr(leaf, "dtype"):
            if jnp.issubdtype(leaf.dtype, jnp.floating) and id(leaf) not in buffer_ids:
                unique[id(leaf)] = leaf
    return int(sum(v.size for v in unique.values()))


def get_device_memory_gb(device: Optional[jax.Device] = None) -> float:
    """Best-effort live device memory (GB); reference common.py:39-43 reports
    CUDA reserved memory.  On TPU/axon memory_stats may be unavailable."""
    try:
        devices = [device] if device is not None else jax.local_devices()
        total = 0
        for d in devices:
            stats = d.memory_stats()
            if stats:
                total += stats.get("bytes_in_use", 0)
        return total / (1024.0**3)
    except Exception:  # pragma: no cover - backend dependent
        return 0.0


def is_compound_module(m: nn.Module) -> bool:
    return any(isinstance(c, nn.Module) for _, c in m._name_children())


def get_type_name(o: Any) -> str:
    to = type(o)
    return to.__module__ + "." + to.__name__


def split_module_parent_child_name(target: str) -> tuple[str, str]:
    *parent, name = target.rsplit(".", 1)
    return parent[0] if parent else "", name


def get_default_dtype(module: nn.Module) -> Any:
    for leaf in jax.tree_util.tree_leaves(module):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf.dtype
    return jnp.float32
