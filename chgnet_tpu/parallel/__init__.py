"""Multi-chip parallelism: meshes, data-parallel training, graph partitioning."""

from chgnet_tpu.parallel.dp import (
    make_dp_train_step,
    make_single_device_train_step,
    stack_batches,
    stack_targets,
)
from chgnet_tpu.parallel.graph_sharded import (
    HaloBatch,
    ShardedGraphBatch,
    compute_batch_sharded,
    compute_batch_sharded_halo,
    make_graph_sharded_train_step,
    shard_batch,
    shard_batch_halo,
    shard_targets,
    unshard_atoms,
)
from chgnet_tpu.parallel.distributed import initialize, make_hybrid_mesh
from chgnet_tpu.parallel.md_sharded import md_chunk_sharded
from chgnet_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
from chgnet_tpu.parallel.relax_sharded import fire_chunk_sharded

__all__ = [
    "HaloBatch",
    "ShardedGraphBatch",
    "batch_sharding",
    "compute_batch_sharded",
    "compute_batch_sharded_halo",
    "fire_chunk_sharded",
    "initialize",
    "make_dp_train_step",
    "make_graph_sharded_train_step",
    "make_hybrid_mesh",
    "make_mesh",
    "md_chunk_sharded",
    "make_single_device_train_step",
    "replicated",
    "shard_batch",
    "shard_batch_halo",
    "shard_targets",
    "stack_batches",
    "stack_targets",
    "unshard_atoms",
]
