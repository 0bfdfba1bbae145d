"""On-chip A/B: halo-tiled neighbor stream vs XLA row gathers at MD scale.

Times the jitted E+F evaluation (the MD step's model part: bf16, fused
kernels, remat off) on one large spatially-sorted supercell, with the
GraphBatch built untiled vs halo-tiled (``batch_graphs(tile=T)``).
Forced-completion timing per CLAUDE.md (host scalar fetch).

Usage: python tools/bench_tile.py [n_atoms] [T ...]
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root for direct runs

import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/chgnet_tpu_jax_cache")

from chgnet_tpu.utils.profiling import wait_for_tpu  # noqa: E402

if not wait_for_tpu(300):
    raise SystemExit("no tpu")

from chgnet_tpu import ROOT  # noqa: E402
from chgnet_tpu.core.structure import Structure  # noqa: E402
from chgnet_tpu.graph.batching import batch_graphs  # noqa: E402
from chgnet_tpu.models.chgnet import CHGNet, compute_batch  # noqa: E402
import dataclasses  # noqa: E402
import json  # noqa: E402


def main() -> None:
    n_atoms = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
    tiles = [int(t) for t in sys.argv[2:]] or [0, 64, 128]
    base = Structure.from_file(f"{ROOT}/examples/mp-18767-LiMnO2.cif")
    cells = max(n_atoms // 8, 1)
    a = max(round(cells ** (1 / 3)), 1)
    b = max(round((cells / a) ** 0.5), 1)
    c = max(cells // (a * b), 1)
    struct = base.make_supercell((a, b, c)).perturb(0.03, seed=0)
    struct = struct.spatial_sort()

    model = CHGNet(seed=0)
    cfg = dataclasses.replace(
        model.config, compute_dtype="bfloat16", remat=False
    )
    g = model.graph_converter(struct)

    for T in tiles:
        batch = batch_graphs([g], tile=T if T else False)
        fn = jax.jit(
            lambda p, b: compute_batch(
                p, b, config=cfg, compute_force=True
            )
        )
        out = fn(model.params, batch)
        float(np.asarray(out["e"])[0])  # compile + force
        reps = 5
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn(model.params, batch)
            float(np.asarray(out["e"])[0])
            best = min(best, (time.perf_counter() - t0) / reps)
        n_e = int(np.asarray(batch.edge_mask).sum())
        print(json.dumps({
            "tile": T,
            "n_atoms": n_atoms,
            "ms_per_ef": round(best * 1e3, 1),
            "edges_per_s": round(n_e / best),
            "expansion": round(
                batch.exp_map.shape[0] / batch.atomic_numbers.shape[0], 2
            ) if T else 1.0,
        }))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
