"""Device-mesh data parallelism (the TPU-native replacement for the
reference's single-process ``nn.DataParallel``, SURVEY.md sections 2.3/5.8)."""

from .mesh import (
    create_mesh,
    create_mesh_multihost,
    create_mesh_spatial,
    spatial_batch_sharding,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate_state,
    per_replica_state,
    make_sharded_train_step,
)

__all__ = [
    "create_mesh",
    "create_mesh_multihost",
    "create_mesh_spatial",
    "spatial_batch_sharding",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate_state",
    "per_replica_state",
    "make_sharded_train_step",
]
