"""Device-mesh helpers for multi-chip execution.

The reference is single-device (SURVEY §2.6: no DDP/NCCL/MPI anywhere);
multi-chip scaling is a first-class new capability here, built on
``jax.sharding.Mesh`` + ``shard_map`` with XLA collectives over ICI.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(
    n_devices: int | None = None, axis_name: str = "data"
) -> Mesh:
    """A 1-D device mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(
            f"requested {n_devices} devices but only {len(devices)} present"
        )
    return Mesh(np.array(devices[:n_devices]), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (device) axis of stacked batches."""
    return NamedSharding(mesh, PartitionSpec(axis_name))
