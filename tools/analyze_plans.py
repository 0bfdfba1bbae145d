"""Host-only diagnostic: per-stream GatherPlan quality of a GraphBatch.

For every index stream the conv pass consumes, reports which streaming
paths the plan enables (raw block plan / gather window / sorted) and the
chunk-visit ratio vs the minimal sequential pass — the number that
decides whether the stream rides the Pallas kernels or falls back to
XLA's row-at-a-time gather emitter. Run at bench scale (many small
graphs) and MD scale (one large supercell) to see which streams the
spatial tiling work must fix.

Usage: python tools/analyze_plans.py [n_atoms ...]
  n_atoms 0 -> the 32x216-atom bench workload
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root for direct runs

import json
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from chgnet_tpu import ROOT  # noqa: E402
from chgnet_tpu.core.structure import Structure  # noqa: E402
from chgnet_tpu.graph.batching import batch_graphs  # noqa: E402
from chgnet_tpu.graph.converter import CrystalGraphConverter  # noqa: E402
from chgnet_tpu.ops import stream_ops as so  # noqa: E402


def plan_row(name: str, plan, n_rows: int) -> dict:
    min_chunks = max(n_rows // so.C, 1)
    row = {
        "stream": name,
        "mode": (
            "sorted" if plan.perm.shape[0] == 0 and plan.blk_lo.shape[0]
            else "raw-local" if plan.raw.shape[0]
            else "perm" if plan.perm.shape[0]
            else "none"
        ),
        "segsum_kernel": bool(plan.blk_lo.shape[0]),
        "gather_window": bool(plan.g_lo.shape[0]),
    }
    if plan.blk_lo.shape[0]:
        row["segsum_visit_ratio"] = round(
            float(np.asarray(plan.blk_cnt).sum()) / min_chunks, 2
        )
    if plan.g_lo.shape[0]:
        row["gather_visit_ratio"] = round(
            float(np.asarray(plan.g_cnt).sum()) / (n_rows // so.BO), 2
        )
    return row


def analyze(tag: str, batch) -> None:
    E = batch.atom_graph.shape[0]
    U = batch.undirected2directed.shape[0]
    A = batch.bond_graph.shape[0]
    N = batch.atomic_numbers.shape[0]
    print(f"# {tag}: N={N} E={E} U={U} A={A}")
    streams = [
        ("center (scatter+gather)", batch.plan_center, E),
        ("nbr", batch.plan_nbr, E),
        ("d2u", batch.plan_d2u, E),
        ("u2d", batch.plan_u2d, U),
        ("u2d2 (und_second)", batch.plan_u2d2, U),
        ("ang_vi (dir_i)", batch.plan_ang_vi, A),
        ("ang_vj (dir_j)", batch.plan_ang_vj, A),
        ("ang_c (center)", batch.plan_ang_c, A),
    ]
    for name, plan, n_rows in streams:
        print(json.dumps(plan_row(name, plan, n_rows)))
    # twin has no plan; report its block-locality directly
    twin = np.asarray(batch.twin).astype(np.int64)
    ok = np.asarray(batch.edge_mask) > 0
    gp = so.build_gather_plan(twin, ok, E)
    visits = gp[2] if gp else -1
    print(json.dumps({
        "stream": "twin (involution)",
        "window_visit_ratio": round(visits / max(E // so.C, 1), 2)
        if gp else None,
    }))
    sys.stdout.flush()


def md_structure(n_atoms: int) -> Structure:
    base = Structure.from_file(f"{ROOT}/examples/mp-18767-LiMnO2.cif")
    cells = max(n_atoms // 8, 1)
    a = max(round(cells ** (1 / 3)), 1)
    b = max(round((cells / a) ** 0.5), 1)
    c = max(cells // (a * b), 1)
    return base.make_supercell((a, b, c)).perturb(0.03, seed=0)


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [0, 10240]
    conv = CrystalGraphConverter()
    for n in sizes:
        if n == 0:
            base = Structure.from_file(
                f"{ROOT}/examples/mp-18767-LiMnO2.cif"
            ).make_supercell((3, 3, 3))
            rng = np.random.default_rng(0)
            graphs = [
                conv(base.perturb(0.03, seed=i)) for i in range(8)
            ]
            analyze("bench-like 8x216", batch_graphs(graphs))
            del rng
        else:
            s = md_structure(n)
            analyze(f"site-major {n}", batch_graphs([conv(s)]))
            analyze(
                f"morton {n}", batch_graphs([conv(s.spatial_sort())])
            )
            tb = batch_graphs([conv(s.spatial_sort())], tile=True)
            analyze(f"morton+halo-tiled {n}", tb)
            n_x = tb.exp_map.shape[0]
            n_cap = tb.atomic_numbers.shape[0]
            rows = [
                plan_row("exp_map", tb.plan_exp, n_x),
                plan_row("nbr_x", tb.plan_nbr_x, tb.nbr_x.shape[0]),
            ]
            for r in rows:
                print(json.dumps(r))
            print(json.dumps({
                "expansion_factor": round(n_x / n_cap, 3),
            }))


if __name__ == "__main__":
    main()
