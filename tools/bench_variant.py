"""bench.py workload under arbitrary CHGNetConfig overrides.

Usage: python tools/bench_variant.py '{"fused_kernels": true}' [n_structs]
Prints one JSON line like bench.py (same workload, same timing rules).
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


def main() -> None:
    if not wait_for_tpu(
        float(os.environ.get("CHGNET_TPU_PROBE_BUDGET_S", 900))
    ):
        raise SystemExit("device backend unreachable")
    overrides = json.loads(sys.argv[1]) if len(sys.argv) > 1 else {}
    n_structs = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    kwargs = {
        "compute_dtype": "bfloat16",
        "matmul_precision": "default",
        **overrides,
    }
    model = CHGNet(seed=0, **kwargs)
    struct = Structure.from_file(f"{ROOT}/examples/mp-18767-LiMnO2.cif")
    graphs = [
        model.graph_converter(
            struct.make_supercell(3).perturb(0.05, seed=seed), graph_id=str(seed)
        )
        for seed in range(n_structs)
    ]
    n_edges = sum(g.n_directed for g in graphs)
    batch = jax.device_put(batch_graphs(graphs))

    def run():
        return compute_batch(
            model.params, batch, config=model.config,
            compute_force=True, compute_stress=True, compute_magmom=True,
        )

    res = timeit(run, iters=20, repeats=5)
    s = res["seconds_per_iter"]
    print(
        json.dumps(
            {
                "overrides": overrides,
                "ms_per_iter": round(s * 1e3, 2),
                "edges_per_s": round(n_edges / s, 1),
                "vs_baseline": round(n_edges / s / 1e6, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
