from .mesh import (
    batch_sharding,
    data_mesh,
    is_main_process,
    local_shard_indices,
    replicate_tree,
    replicated,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "data_mesh",
    "is_main_process",
    "local_shard_indices",
    "replicate_tree",
    "replicated",
    "shard_batch",
]
