"""Host-only analysis: what would spatial graph TILING buy the gathers?

Round-4 established that the neighbor stream is the last structurally
non-window-local gather family (chunk-visit dispersion 17x site-major,
10x Morton at 10k atoms — docs/performance.md), and that the named fix
is partitioning atoms into spatial tiles so most edges become
tile-local. This script quantifies that WITHOUT building anything
device-side: it reorders atoms by spatial cells sized to the streaming
kernels' chunk grid, splits edges into intra-tile and boundary sets,
and reports the plan quality each set would see.

Usage: python tools/experiment_tiling.py [n_atoms]
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


def tile_order(struct: Structure, target: int = 256) -> np.ndarray:
    """Atom order by spatial cells of ~``target`` atoms (cell-major,
    Morton over cells), so a tile of ``target`` consecutive atoms is a
    compact spatial box."""
    frac = struct.frac_coords % 1.0
    n = len(struct)
    cells_total = max(n // target, 1)
    per_axis = max(int(round(cells_total ** (1 / 3))), 1)
    q = np.minimum((frac * per_axis).astype(np.int64), per_axis - 1)
    # Morton over the cell grid keeps adjacent cells near in index
    code = np.zeros(n, dtype=np.int64)
    bits = max(per_axis - 1, 1).bit_length()
    for b in range(bits):
        for axis in range(3):
            code |= ((q[:, axis] >> b) & 1) << (3 * b + axis)
    return np.argsort(code, kind="stable")


def analyze(name: str, struct: Structure, conv) -> dict:
    batch = batch_graphs([conv(struct)])
    n_cap = batch.atomic_numbers.shape[0]
    nbr = np.asarray(batch.atom_graph[:, 1])
    valid = np.asarray(batch.edge_mask) > 0
    gp = so.build_gather_plan(nbr, np.ones_like(valid), n_cap)
    visits = gp[2] if gp else -1
    min_chunks = max(nbr.shape[0] // so.C, 1)
    # tile-locality: fraction of valid edges whose neighbor lies within
    # +-W rows of the block's window start (what a paired-window kernel
    # could serve); the rest would stay on XLA's row gather
    blocks = nbr.reshape(-1, so.BO)
    okb = valid.reshape(-1, so.BO)
    lo = np.where(okb, blocks, np.iinfo(np.int64).max).min(axis=1)
    lo = np.where(lo == np.iinfo(np.int64).max, 0, lo)
    wlo = np.maximum(np.minimum(lo // so.W, n_cap // so.W - 2), 0)
    inside = okb & (blocks >= (wlo * so.W)[:, None]) & (
        blocks < (wlo * so.W + 2 * so.W)[:, None]
    )
    frac_local = float(inside.sum() / max(okb.sum(), 1))
    return {
        "order": name,
        "visit_ratio": round(visits / min_chunks, 1),
        "frac_edges_in_paired_window": round(frac_local, 3),
    }


def main() -> None:
    n_atoms = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
    base = Structure.from_file(f"{ROOT}/examples/mp-18767-LiMnO2.cif")
    cells = max(n_atoms // 8, 1)
    a = max(round(cells ** (1 / 3)), 1)
    b = max(round((cells / a) ** 0.5), 1)
    c = max(cells // (a * b), 1)
    struct = base.make_supercell((a, b, c)).perturb(0.03, seed=0)
    conv = CrystalGraphConverter(
        atom_graph_cutoff=6.1, bond_graph_cutoff=3.1
    )
    orders = {
        "site-major (supercell default)": struct,
        "morton (Structure.spatial_sort)": struct.spatial_sort(),
    }
    for target in (256, 512, 1024):
        order = tile_order(struct, target)
        tiled = Structure(
            struct.lattice,
            np.asarray(struct.atomic_numbers)[order].tolist(),
            struct.frac_coords[order],
        )
        orders[f"tiled target={target}"] = tiled
    for name, s in orders.items():
        print(json.dumps(analyze(name, s, conv)))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
