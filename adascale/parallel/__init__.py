from .mesh import (  # noqa: F401
    create_hybrid_mesh,
    create_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
)
