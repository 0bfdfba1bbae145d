"""Graph-partitioned scaling harness: edges/s vs mesh size.

Measures the sharded forward (E+F+S) of one large structure across 1, 2,
4, ... devices and reports scaling efficiency (the BASELINE.json north
star targets >= 80% to a v5p-16 slice). On the single-chip dev
environment run it with virtual CPU devices to validate the trend:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/bench_sharded.py

(CPU numbers validate the communication pattern, not absolute speed.)
"""

from __future__ import annotations

import json

import os

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/chgnet_tpu_jax_cache")
if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the environment may pin its own platform programmatically; honor
    # the explicit request for virtual CPU devices (like tests/conftest)
    jax.config.update("jax_platforms", "cpu")

from chgnet_tpu import ROOT  # noqa: E402
from chgnet_tpu.core.structure import Structure  # noqa: E402
from chgnet_tpu.graph.batching import batch_graphs  # noqa: E402
from chgnet_tpu.models.chgnet import CHGNet  # noqa: E402
from chgnet_tpu.parallel import (  # noqa: E402
    compute_batch_sharded,
    make_mesh,
    shard_batch,
)
from chgnet_tpu.utils import timeit  # noqa: E402


def main() -> None:
    if jax.default_backend() == "tpu":
        model = CHGNet(seed=0)
    else:
        # virtual-device runs validate the communication pattern; the
        # full 412k-param sharded graph OOMs host-CPU XLA compilation
        model = CHGNet(
            seed=0, atom_fea_dim=16, bond_fea_dim=16, angle_fea_dim=16,
            num_radial=9, num_angular=9, n_conv=2, mlp_hidden_dims=(16,),
            atom_conv_hidden_dim=16, bond_conv_hidden_dim=16,
        )
    struct = Structure.from_file(
        f"{ROOT}/examples/mp-18767-LiMnO2.cif"
    ).make_supercell((4, 4, 2))
    graph = model.graph_converter(struct)
    batch = batch_graphs([graph])
    n_edges = graph.n_directed

    n_avail = len(jax.devices())
    results = {}
    n_dev = 1
    while n_dev <= n_avail:
        mesh = make_mesh(n_dev, axis_name="graph")
        sbatch = shard_batch(batch, n_dev)
        run = lambda: compute_batch_sharded(  # noqa: B023
            model.params,
            sbatch,
            config=model.config,
            mesh=mesh,
            compute_force=True,
            compute_stress=True,
        )
        sec = timeit(run, iters=5, repeats=2)["seconds_per_iter"]
        results[n_dev] = n_edges / sec
        base = results[1]
        line = {
            "metric": f"sharded edges/s @ {n_dev} devices",
            "value": round(results[n_dev], 1),
            "unit": "directed edges/s",
            "scaling_efficiency": round(results[n_dev] / (base * n_dev), 4),
            "n_atoms": len(struct),
        }
        if jax.default_backend() != "tpu":
            # virtual devices share one host CPU: correctness of the
            # communication pattern only, efficiency is meaningless
            line["note"] = "virtual devices; efficiency not meaningful"
        print(json.dumps(line))
        n_dev *= 2


if __name__ == "__main__":
    main()
