from .mesh import (  # noqa: F401
    assemble_batch,
    batch_sharding,
    create_hybrid_mesh,
    create_mesh,
    local_batch_size,
    per_process_seed,
    replicate,
    replicated_sharding,
    shard_batch,
)
