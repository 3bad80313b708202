from confignet_tpu.parallel.mesh import (
    create_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    process_slice,
    replicate,
    maybe_initialize_distributed,
)

__all__ = [
    "create_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "process_slice",
    "replicate",
    "maybe_initialize_distributed",
]
