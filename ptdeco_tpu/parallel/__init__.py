from .mesh import (
    DP_AXIS,
    EP_AXIS,
    PP_AXIS,
    SP_AXIS,
    TP_AXIS,
    batch_sharding,
    initialize_distributed,
    local_mesh,
    make_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
    shard_batch_seq,
)
from . import shardings  # noqa: F401
from .evd import (
    distributed_sketch_for_eigh,
    distributed_topk_eigenvectors,
    finish_distributed_eigh,
)
from .pipeline import pipeline_logits, stack_block_params

__all__ = [
    "DP_AXIS",
    "SP_AXIS",
    "EP_AXIS",
    "PP_AXIS",
    "TP_AXIS",
    "batch_sharding",
    "local_mesh",
    "make_mesh",
    "replicate",
    "replicated_sharding",
    "shard_batch",
    "shard_batch_seq",
    "initialize_distributed",
    "distributed_sketch_for_eigh",
    "distributed_topk_eigenvectors",
    "finish_distributed_eigh",
    "pipeline_logits",
    "stack_block_params",
]
