from vivqa_tpu.parallel.mesh import (
    MeshConfig,
    create_mesh,
    batch_sharding,
    replicated,
    logical_to_mesh,
    shard_pytree_by_rules,
    DEFAULT_PARTITION_RULES,
)

__all__ = [
    "MeshConfig",
    "create_mesh",
    "batch_sharding",
    "replicated",
    "logical_to_mesh",
    "shard_pytree_by_rules",
    "DEFAULT_PARTITION_RULES",
]
