"""Multi-host initialization and mesh construction.

The reference has no distributed runtime at all (SURVEY §2.6). On TPU
pods, JAX processes coordinate through ``jax.distributed.initialize``;
this module wraps it with the framework's conventions and builds meshes
spanning all hosts' devices (DP over DCN x graph-partitioning over ICI).
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Bring up the multi-host runtime (no-op on a single process).

    On Cloud TPU the arguments are auto-detected from the environment;
    pass them explicitly elsewhere. Must run before any device work.
    """
    if num_processes == 1:
        return
    if (
        coordinator_address is None
        and num_processes is None
        and process_id is None
        and not any(
            key in os.environ
            for key in (
                "JAX_COORDINATOR_ADDRESS",
                "COORDINATOR_ADDRESS",
                "MEGASCALE_COORDINATOR_ADDRESS",
            )
        )
    ):
        # nothing explicit requested and no multi-process environment
        # advertised: stay single-process. (Deliberately avoids probing
        # jax.process_count(), which would itself initialize the backend
        # and always reports 1 pre-init.)
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_hybrid_mesh(
    data: int | None = None,
    graph: int = 1,
    *,
    axis_names: tuple[str, str] = ("data", "graph"),
) -> Mesh:
    """A 2-D (data, graph) mesh over all global devices.

    Lay the graph-partitioning axis innermost so its all-gather feature
    exchanges ride ICI within a host/slice, while data-parallel psum of
    gradients crosses DCN only once per step.
    """
    devices = np.asarray(jax.devices())
    if data is None:
        if len(devices) % graph:
            raise ValueError(
                f"{len(devices)} devices not divisible by {graph=}"
            )
        data = len(devices) // graph
    if data * graph != len(devices):
        raise ValueError(
            f"mesh {data}x{graph} != {len(devices)} global devices"
        )
    return Mesh(devices.reshape(data, graph), axis_names)
