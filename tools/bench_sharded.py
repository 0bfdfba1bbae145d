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

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root for direct runs

import json

import os

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/chgnet_tpu_jax_cache")
if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the environment may pin its own platform programmatically; honor
    # the explicit request for virtual CPU devices (like tests/conftest)
    jax.config.update("jax_platforms", "cpu")

import re  # noqa: E402

from chgnet_tpu import ROOT  # noqa: E402
from chgnet_tpu.core.structure import Structure  # noqa: E402
from chgnet_tpu.graph.batching import batch_graphs  # noqa: E402
from chgnet_tpu.models.chgnet import CHGNet  # noqa: E402
from chgnet_tpu.parallel import (  # noqa: E402
    compute_batch_sharded,
    compute_batch_sharded_halo,
    make_mesh,
    shard_batch,
    shard_batch_halo,
)
from chgnet_tpu.utils import timeit  # noqa: E402

_ITEM_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
               "s64": 8, "u64": 8, "s8": 1, "u8": 1, "pred": 1}


def collective_wire_bytes(fn, n_dev: int) -> dict[str, int]:
    """Per-device per-iteration bytes each collective moves over the
    interconnect, parsed from the COMPILED (SPMD, per-device shapes) HLO.

    Conventions (ring algorithms): all-gather / reduce-scatter /
    all-to-all move (d-1)/d of the result/operand; all-reduce moves
    2(d-1)/d; collective-permute moves its full operand."""
    txt = jax.jit(fn).lower().compile().as_text()
    out: dict[str, int] = {}
    # result may be a bare shape or a tuple of shapes:
    #   %x = f32[8,128]{...} all-gather(...)
    #   %y = (f32[1,72,16]{...}, f32[1,72,16]{...}) all-to-all(...)
    pat = re.compile(
        r"= (\([^)]*\)|\w+\[[0-9,]*\][^ ]*)\s+"
        r"(all-gather|all-to-all|all-reduce|reduce-scatter|collective-permute)"
        r"[-.\w]*\("
    )
    for shapes_str, op in pat.findall(txt):
        size = 0
        for dtype, dims in re.findall(r"(\w+)\[([0-9,]*)\]", shapes_str):
            if dtype not in _ITEM_BYTES:
                continue
            n = 1
            for v in dims.split(","):
                if v:
                    n *= int(v)
            size += n * _ITEM_BYTES[dtype]
        factor = (
            2.0 * (n_dev - 1) / n_dev if op == "all-reduce"
            else 1.0 if op == "collective-permute"
            else (n_dev - 1) / n_dev
        )
        out[op] = out.get(op, 0) + int(size * factor)
    out["total"] = sum(out.values())
    return out


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

        if n_dev > 1:
            # halo variant: time it AND compare bytes-on-wire per layer
            # (compiled-HLO accounting; round-1 review asked for this)
            sbatch_h, halo = shard_batch_halo(batch, n_dev)
            run_h = lambda: compute_batch_sharded_halo(  # noqa: B023
                model.params,
                sbatch_h,
                halo,
                config=model.config,
                mesh=mesh,
                compute_force=True,
                compute_stress=True,
            )
            sec_h = timeit(run_h, iters=5, repeats=2)["seconds_per_iter"]
            bytes_ag = collective_wire_bytes(run, n_dev)
            bytes_h = collective_wire_bytes(run_h, n_dev)
            print(
                json.dumps(
                    {
                        "metric": f"halo vs all-gather @ {n_dev} devices",
                        "halo_edges_per_s": round(n_edges / sec_h, 1),
                        "allgather_edges_per_s": round(results[n_dev], 1),
                        "wire_bytes_per_iter_allgather": bytes_ag["total"],
                        "wire_bytes_per_iter_halo": bytes_h["total"],
                        "halo_comm_fraction": round(
                            bytes_h["total"] / max(bytes_ag["total"], 1), 4
                        ),
                        "detail_allgather": bytes_ag,
                        "detail_halo": bytes_h,
                    }
                )
            )
        n_dev *= 2


if __name__ == "__main__":
    main()
