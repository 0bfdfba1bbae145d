"""Differential component timing for the production inference path.

Times the bench workload under config ablations (forward-only, no angle
path, no bond path, fp32, dense-K, remat) and prints one JSON line per
variant. Differences between variants attribute milliseconds to
components honestly on the real chip — the remote tunnel makes
per-op profiler traces awkward, but steady-state wall deltas with forced
completion are trustworthy (see utils/profiling.timeit).

Usage: python tools/profile_components.py [n_structs]
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root for direct runs

import json
import os
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/chgnet_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from chgnet_tpu import ROOT  # noqa: E402
from chgnet_tpu.core.structure import Structure  # noqa: E402
from chgnet_tpu.graph.batching import batch_graphs  # noqa: E402
from chgnet_tpu.models.chgnet import CHGNet, compute_batch  # noqa: E402
from chgnet_tpu.utils.profiling import timeit, wait_for_tpu  # noqa: E402


VARIANTS = [
    # (name, model kwargs, compute kwargs)
    ("efsm bf16 (bench config)", {}, {}),
    ("efsm fp32", {"compute_dtype": "float32", "matmul_precision": "highest"}, {}),
    ("e only (no backward)", {}, {"compute_force": False, "compute_stress": False, "compute_magmom": False}),
    ("ef (no stress/magmom)", {}, {"compute_stress": False, "compute_magmom": False}),
    ("efs (no magmom)", {}, {"compute_magmom": False}),
    ("efsm no AngleUpdate", {"update_angle": False}, {}),
    ("efsm no BondConv/AngleUpdate", {"update_bond": False, "update_angle": False}, {}),
    ("efsm remat", {"remat": True}, {}),
]


def main() -> None:
    if not wait_for_tpu(
        float(os.environ.get("CHGNET_TPU_PROBE_BUDGET_S", 900))
    ):
        raise SystemExit("device backend unreachable")
    n_structs = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    struct = Structure.from_file(f"{ROOT}/examples/mp-18767-LiMnO2.cif")

    base_model = CHGNet(seed=0)
    graphs = [
        base_model.graph_converter(
            struct.make_supercell(3).perturb(0.05, seed=seed),
            graph_id=str(seed),
        )
        for seed in range(n_structs)
    ]
    n_edges = sum(g.n_directed for g in graphs)
    n_angles = sum(g.n_angles for g in graphs)
    batch = jax.device_put(batch_graphs(graphs))
    print(json.dumps({"n_edges": n_edges, "n_angles": n_angles}))

    for name, mkw, ckw in VARIANTS:
        kwargs = {
            "compute_dtype": "bfloat16",
            "matmul_precision": "default",
            **mkw,
        }
        model = CHGNet(seed=0, **kwargs)
        compute = {
            "compute_force": True,
            "compute_stress": True,
            "compute_magmom": True,
            **ckw,
        }

        def run():
            return compute_batch(
                model.params, batch, config=model.config, **compute
            )

        try:
            res = timeit(run, iters=10, repeats=3)
        except Exception as exc:  # noqa: BLE001 - keep ablating
            print(json.dumps({"variant": name, "error": str(exc)[:200]}))
            continue
        ms = res["seconds_per_iter"] * 1e3
        print(
            json.dumps(
                {
                    "variant": name,
                    "ms_per_iter": round(ms, 2),
                    "edges_per_s": round(n_edges / res["seconds_per_iter"], 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
