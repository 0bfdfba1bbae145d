"""Multi-chip parallelism: meshes, data-parallel training, graph partitioning."""

from chgnet_tpu.parallel.dp import (
    make_dp_train_step,
    make_single_device_train_step,
    stack_batches,
    stack_targets,
)
from chgnet_tpu.parallel.graph_sharded import (
    ShardedGraphBatch,
    compute_batch_sharded,
    make_graph_sharded_train_step,
    shard_batch,
    shard_targets,
    unshard_atoms,
)
from chgnet_tpu.parallel.mesh import batch_sharding, make_mesh, replicated

__all__ = [
    "ShardedGraphBatch",
    "batch_sharding",
    "compute_batch_sharded",
    "make_dp_train_step",
    "make_graph_sharded_train_step",
    "make_mesh",
    "make_single_device_train_step",
    "replicated",
    "shard_batch",
    "shard_targets",
    "stack_batches",
    "stack_targets",
    "unshard_atoms",
]
