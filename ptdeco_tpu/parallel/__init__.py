from .mesh import (
    DP_AXIS,
    TP_AXIS,
    batch_sharding,
    local_mesh,
    make_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "DP_AXIS",
    "TP_AXIS",
    "batch_sharding",
    "local_mesh",
    "make_mesh",
    "replicate",
    "replicated_sharding",
    "shard_batch",
]
