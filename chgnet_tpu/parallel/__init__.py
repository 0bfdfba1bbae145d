"""Multi-chip parallelism: meshes, data-parallel training, graph partitioning."""

from chgnet_tpu.parallel.mesh import batch_sharding, make_mesh, replicated

__all__ = ["batch_sharding", "make_mesh", "replicated"]
