"""Static-shape padded graph batching.

The reference batches graphs by ragged concatenation at forward time
(``/root/reference/chgnet/model/model.py:792-913``), which implies dynamic
shapes — hostile to XLA. Here a batch is a fixed-size ``GraphBatch`` of
flat arrays padded to bucketed capacities:

* padding *gather* indices point at the last valid row (always in range;
  results are masked), with padded edges given image (1, 0, 0) so their bond length is
  one lattice vector — strictly positive, keeping norms/acos and their
  gradients finite (no NaN can leak through masked lanes),
* padding *scatter* indices point one-past-the-end, so XLA's drop-out-of-
  bounds scatter semantics discard them with no mask multiply, and the
  scatter stays sorted (edges are canonically ordered by center atom,
  angles by undirected bond) — letting segment sums use
  ``indices_are_sorted=True``.

Bucketing rounds capacities to a geometric grid so repeated conversions
reuse compiled programs instead of recompiling per shape.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Sequence

import numpy as np

from chgnet_tpu.graph.crystalgraph import CrystalGraph
from chgnet_tpu.ops.scatter import GatherPlan, make_plan
from chgnet_tpu.utils.native.hostops import gather_col, stable_argsort_i32
from chgnet_tpu.ops.stream_ops import C as _STREAM_CHUNK

_NO_PLAN = GatherPlan(np.zeros(0, np.int32), np.zeros(0, np.int32))


class GraphBatch(NamedTuple):
    """A batch of crystal graphs as padded flat arrays (a JAX pytree).

    Shapes: B graphs, N padded atoms, E padded directed edges, U = E // 2
    padded undirected edges, A padded angles.
    """

    atomic_numbers: np.ndarray  # i32 [N] (0 = padding)
    frac_coords: np.ndarray  # f32 [N, 3]
    lattices: np.ndarray  # f32 [B, 3, 3]
    atom_owner: np.ndarray  # i32 [N] graph index (0 for padding; masked)
    atom_mask: np.ndarray  # f32 [N]
    atom_graph: np.ndarray  # i32 [E, 2] gather indices (center, neighbor)
    edge_scatter: np.ndarray  # i32 [E] center or N (drop) for scatter
    edge_owner: np.ndarray  # i32 [E] graph index per edge
    images: np.ndarray  # f32 [E, 3] periodic image (padding: (1,0,0))
    directed2undirected: np.ndarray  # i32 [E] gather index
    edge_mask: np.ndarray  # f32 [E]
    undirected2directed: np.ndarray  # i32 [U] gather index (first directed)
    und_second: np.ndarray  # i32 [U] the bond's SECOND directed edge
    und_mask: np.ndarray  # f32 [U]
    # reverse-edge involution: twin[e] is the other directed edge of
    # e's undirected bond (padding -> self). Drives the directed-native
    # bond path (CHGNetConfig.directed_bonds): the [A]->[E] BondConv
    # partial sums reduce per bond as partial + partial[twin], and the
    # undirected bond table (plus its dispersed d2u expansions) never
    # exists. twin is its own inverse, so the gather's transpose is the
    # same gather (ops/scatter.py involution_gather).
    twin: np.ndarray  # i32 [E]
    bond_graph: np.ndarray  # i32 [A, 5] gather indices (dir_i-sorted rows)
    angle_scatter: np.ndarray  # i32 [A] undirected bond i or U (drop)
    angle_scatter_dir: np.ndarray  # i32 [A] directed bond i or E (drop)
    angle_mask: np.ndarray  # f32 [A]
    # optional dense per-atom edge layout (built with dense_k=True):
    # regularizes AtomConv so the scatter becomes a sum over the K axis
    # and the center gather becomes a broadcast
    dense_nbr: np.ndarray = np.zeros((0, 0), np.int32)  # i32 [N, K]
    dense_bond: np.ndarray = np.zeros((0, 0), np.int32)  # i32 [N, K]
    dense_mask: np.ndarray = np.zeros((0, 0), np.float32)  # f32 [N, K]
    # optional HALO-TILED neighbor layout (built with tile=True/int):
    # atoms partition into index tiles of T rows; the expanded table
    # [tile0_own | tile0_halo | tile1_own | ...] duplicates each tile's
    # remote neighbors next to it, so the per-edge neighbor gather
    # (`nbr_x` into the expanded axis) is window-local at ANY structure
    # size — the one stream that loses its gather window on large single
    # structures (XLA's row gather at 17-58 GB/s, session-dependent).
    # The per-layer price is one small [N_x] expansion gather
    # (`exp_map`, backward = its planned segment sum). Requires a
    # spatially sorted atom order (Structure.spatial_sort) to keep halos
    # small.
    exp_map: np.ndarray = np.zeros(0, np.int32)  # i32 [N_x] source atom
    nbr_x: np.ndarray = np.zeros(0, np.int32)  # i32 [E] expanded nbr ref
    # backward gather plans (ops/scatter.py): turn every grad-of-gather
    # scatter into a permutation gather + SORTED segment sum
    plan_nbr: GatherPlan = _NO_PLAN  # atom_graph[:, 1] -> atom table
    plan_d2u: GatherPlan = _NO_PLAN  # directed2undirected -> bond table
    plan_u2d: GatherPlan = _NO_PLAN  # undirected2directed -> edge stream
    plan_u2d2: GatherPlan = _NO_PLAN  # und_second -> edge stream
    # angle rows are dir_i-sorted, so plan_ang_vi is the sorted plan that
    # also drives the [A] -> [E] BondConv partial-sum (dst equals
    # angle_scatter_dir); vj/center are window-local
    plan_ang_vi: GatherPlan = _NO_PLAN  # bond_graph[:, 2] -> edge stream
    plan_ang_vj: GatherPlan = _NO_PLAN  # bond_graph[:, 4] -> edge stream
    plan_ang_c: GatherPlan = _NO_PLAN  # bond_graph[:, 0] -> atom table
    # forward-scatter plans (sorted by construction): dst equals
    # edge_scatter, block plans feed the streaming kernel
    plan_center: GatherPlan = _NO_PLAN  # atom_graph[:, 0]; dst == edge_scatter
    plan_exp: GatherPlan = _NO_PLAN  # exp_map -> atom table
    plan_nbr_x: GatherPlan = _NO_PLAN  # nbr_x -> expanded table

    @property
    def n_graphs(self) -> int:
        return self.lattices.shape[0]

    @property
    def n_atoms_padded(self) -> int:
        return self.atomic_numbers.shape[0]


def _build_halo_tiles(
    atom_graph: np.ndarray,  # i32 [E, 2] padded (center, neighbor)
    e_valid: np.ndarray,  # bool [E]
    cap_n: int,
    T: int,
    min_cap: int = 0,  # monotone N_x capacity (simulation rebuild loops)
) -> dict:
    """Halo-tiled neighbor layout (see GraphBatch field docs).

    Tiles are index blocks of ``T`` rows over the (spatially sorted,
    padded) atom axis. The expanded table interleaves each tile's own
    rows with its sorted remote-neighbor halo, so every edge's neighbor
    reference lands inside its center tile's contiguous region — the
    windows ``make_plan`` needs are then 1-2 regions wide regardless of
    structure size. Exactness: ``exp_map[nbr_x] == atom_graph[:, 1]``
    for every valid edge (asserted), so gathering through the expansion
    is a row-for-row restatement of the direct gather.
    """
    centers = atom_graph[:, 0].astype(np.int64)
    nbrs = atom_graph[:, 1].astype(np.int64)
    tc = centers // T
    tn = nbrs // T
    n_tiles = -(-cap_n // T)
    remote = (tc != tn) & e_valid
    # per-tile sorted unique remote neighbors via one packed-key unique
    keys = np.unique(tc[remote] * cap_n + nbrs[remote])
    halo_tile = (keys // cap_n).astype(np.int64)
    halo_atom = (keys % cap_n).astype(np.int64)
    halo_counts = np.bincount(halo_tile, minlength=n_tiles)
    halo_starts = np.concatenate([[0], np.cumsum(halo_counts)])[:-1]
    region_sizes = T + halo_counts
    region_off = np.concatenate([[0], np.cumsum(region_sizes)])[:-1]
    n_x = int(region_sizes.sum())
    n_x_cap = max(-(-n_x // _STREAM_CHUNK) * _STREAM_CHUNK, min_cap)

    # padded tail rows point at the LAST atom row (batching convention —
    # keeps tail-block gather windows near the table end); they are
    # never referenced by nbr_x and plan_exp drops them in the backward
    exp_map = np.full(n_x_cap, cap_n - 1, np.int32)
    own_rows = region_off[:, None] + np.arange(T)[None, :]
    exp_map[own_rows.ravel()] = np.minimum(
        np.arange(n_tiles * T), cap_n - 1
    )
    halo_rows = region_off[halo_tile] + T + (
        np.arange(len(halo_atom)) - halo_starts[halo_tile]
    )
    exp_map[halo_rows] = halo_atom

    local = region_off[tc] + (nbrs - tc * T)
    halo_pos = np.searchsorted(keys, tc * cap_n + nbrs)
    remote_rows = region_off[tc] + T + (
        np.clip(halo_pos, 0, max(len(keys) - 1, 0))
        - halo_starts[np.minimum(tc, n_tiles - 1)]
    )
    nbr_x = np.where(remote, remote_rows, local).astype(np.int32)
    check = e_valid & (exp_map[nbr_x] != atom_graph[:, 1])
    if check.any():
        raise AssertionError("halo tiling broke the neighbor map")
    # plans are built by the caller's thread pool alongside the other
    # eight — these two (over [N_x] and [E]) would otherwise serialize
    # exactly the stage the pool was added to shorten
    return {
        "exp_map": exp_map,
        "nbr_x": nbr_x,
        "_exp_valid": np.arange(n_x_cap) < n_x,
        "_n_x_cap": n_x_cap,
    }


def round_up(n: int, *, base: int = 32, growth: float = 1.25) -> int:
    """Round ``n`` up onto a geometric bucket grid (multiples of ``base``)."""
    n = max(n, 1)
    bucket = base
    while bucket < n:
        bucket = int(math.ceil(bucket * growth / base) * base)
    return bucket


def batch_graphs(
    graphs: Sequence[CrystalGraph],
    *,
    bucket: bool = True,
    capacities: tuple[int, int, int] | None = None,
    dense_k: bool | int = False,
    tile: bool | int = False,
    tile_cap: int = 0,
) -> GraphBatch:
    """Assemble CrystalGraphs into one padded GraphBatch.

    Args:
        graphs: the graphs to batch.
        bucket: round padded capacities up to a geometric grid (recommended
            under jit to bound recompiles).
        capacities: optional explicit (n_atoms, n_directed, n_angles)
            capacities; wins over ``bucket``.
        dense_k: also build the dense per-atom edge layout ([N, K] slots;
            True buckets K to the max neighbor count, an int pins it) for
            ``CHGNetConfig.dense_atom_conv``.
        tile: build the halo-tiled neighbor layout (``GraphBatch.exp_map``
            / ``nbr_x``) with tiles of ``int(tile)`` atoms (True = 512).
            Gives the neighbor gather a streaming window at any structure
            size; atoms should be spatially sorted
            (``Structure.spatial_sort``) so halos stay small.
    """
    n_graphs = len(graphs)
    if n_graphs == 0:
        raise ValueError("cannot batch zero graphs")

    tot_atoms = sum(g.n_atoms for g in graphs)
    tot_edges = sum(g.n_directed for g in graphs)
    tot_angles = sum(g.n_angles for g in graphs)

    if capacities is not None:
        cap_n, cap_e, cap_a = capacities
    elif bucket:
        cap_n = round_up(tot_atoms)
        cap_e = round_up(tot_edges)
        cap_a = round_up(max(tot_angles, 1))
    else:
        cap_n, cap_e, cap_a = tot_atoms, tot_edges, max(tot_angles, 1)
    if capacities is not None or bucket:
        # align stream capacities to the streaming-kernel chunk size so
        # the E/U/A streams are Pallas-eligible (ops/stream_ops.py):
        # E and A multiples of 2C keep U = E/2 and A on the C grid
        chunk = 2 * _STREAM_CHUNK
        cap_e = -(-cap_e // chunk) * chunk
        cap_a = -(-cap_a // chunk) * chunk
    if bucket and cap_n >= _STREAM_CHUNK:
        # large atom tables also land on the C grid, making center/
        # neighbor window-gathers kernel-eligible (the fused first-layer
        # multi-gather needs >= 2 windowed parts). Explicit capacities
        # are honored verbatim — simulation runtimes pin per-atom state
        # arrays to them (GraphRuntime aligns its own pin).
        cap_n = -(-cap_n // _STREAM_CHUNK) * _STREAM_CHUNK
    cap_e += cap_e % 2  # keep U = E / 2 exact
    cap_u = cap_e // 2
    if cap_n < tot_atoms or cap_e < tot_edges or cap_a < tot_angles:
        raise ValueError(
            f"capacities {(cap_n, cap_e, cap_a)} < actual "
            f"{(tot_atoms, tot_edges, tot_angles)}"
        )

    atomic_numbers = np.zeros(cap_n, dtype=np.int32)
    frac_coords = np.zeros((cap_n, 3), dtype=np.float32)
    atom_owner = np.zeros(cap_n, dtype=np.int32)
    atom_mask = np.zeros(cap_n, dtype=np.float32)
    lattices = np.zeros((n_graphs, 3, 3), dtype=np.float32)

    atom_graph = np.zeros((cap_e, 2), dtype=np.int32)
    edge_scatter = np.full(cap_e, cap_n, dtype=np.int32)  # default: drop
    edge_owner = np.zeros(cap_e, dtype=np.int32)
    images = np.zeros((cap_e, 3), dtype=np.float32)
    images[:, 0] = 1.0  # padded bond = one lattice vector, length > 0
    directed2undirected = np.zeros(cap_e, dtype=np.int32)
    edge_mask = np.zeros(cap_e, dtype=np.float32)

    undirected2directed = np.zeros(cap_u, dtype=np.int32)
    und_second = np.zeros(cap_u, dtype=np.int32)
    und_mask = np.zeros(cap_u, dtype=np.float32)
    twin = np.arange(cap_e, dtype=np.int32)  # padding: self (involution)

    bond_graph = np.zeros((cap_a, 5), dtype=np.int32)
    angle_scatter = np.full(cap_a, cap_u, dtype=np.int32)  # default: drop
    angle_mask = np.zeros(cap_a, dtype=np.float32)

    a_off = e_off = u_off = an_off = 0
    for gi, g in enumerate(graphs):
        n, e, u, a = g.n_atoms, g.n_directed, g.n_undirected, g.n_angles
        sl_a = slice(a_off, a_off + n)
        atomic_numbers[sl_a] = g.atomic_number
        frac_coords[sl_a] = g.atom_frac_coord
        atom_owner[sl_a] = gi
        atom_mask[sl_a] = 1.0
        lattices[gi] = g.lattice

        sl_e = slice(e_off, e_off + e)
        atom_graph[sl_e] = g.atom_graph + a_off
        edge_scatter[sl_e] = g.atom_graph[:, 0] + a_off
        edge_owner[sl_e] = gi
        images[sl_e] = g.neighbor_image
        directed2undirected[sl_e] = g.directed2undirected + u_off
        edge_mask[sl_e] = 1.0

        sl_u = slice(u_off, u_off + u)
        undirected2directed[sl_u] = g.undirected2directed + e_off
        # each bond's OTHER directed edge: stable-sort edges by their
        # undirected id; the two rows per id are (first, second)
        pair_order = stable_argsort_i32(
            np.ascontiguousarray(g.directed2undirected, dtype=np.int32)
        )
        pairs = pair_order.reshape(-1, 2)
        d2u_g = np.asarray(g.directed2undirected)
        if not (d2u_g[pairs[:, 0]] == d2u_g[pairs[:, 1]]).all():
            raise ValueError(
                "graph invariant violated: an undirected bond does not "
                "have exactly two directed edges"
            )
        und_second[sl_u] = pairs[:, 1] + e_off
        und_mask[sl_u] = 1.0
        twin_local = np.empty(e, np.int32)
        twin_local[pairs[:, 0]] = pairs[:, 1]
        twin_local[pairs[:, 1]] = pairs[:, 0]
        twin[sl_e] = twin_local + e_off

        if a:
            sl_an = slice(an_off, an_off + a)
            bg = g.bond_graph.astype(np.int64)
            bond_graph[sl_an, 0] = bg[:, 0] + a_off
            bond_graph[sl_an, 1] = bg[:, 1] + u_off
            bond_graph[sl_an, 2] = bg[:, 2] + e_off
            bond_graph[sl_an, 3] = bg[:, 3] + u_off
            bond_graph[sl_an, 4] = bg[:, 4] + e_off
            angle_scatter[sl_an] = bg[:, 1] + u_off
            angle_mask[sl_an] = 1.0

        a_off += n
        e_off += e
        u_off += u
        an_off += a

    # padded GATHER indices point at the LAST valid row (in range, masked,
    # and window-friendly for the streaming gather kernel: tail blocks'
    # source windows stay near the table end instead of spanning to row 0;
    # both atoms of a padded edge coincide, so with image (1,0,0) its bond
    # vector is exactly -lattice_row — norm finite, gradients zero)
    atom_graph[e_off:] = max(a_off - 1, 0)
    directed2undirected[e_off:] = max(u_off - 1, 0)
    undirected2directed[u_off:] = max(e_off - 1, 0)
    und_second[u_off:] = max(e_off - 1, 0)
    # padded angle rows point at the LAST valid directed edge (cols 2/4);
    # cols 0/1/3 are DERIVED from it exactly the way valid rows relate
    # (center / d2u of that edge) so the device-side lean expansion
    # (graph/leanship.py) reproduces these arrays bit-for-bit
    last_e = max(e_off - 1, 0)
    bond_graph[an_off:, 0] = atom_graph[last_e, 0]
    bond_graph[an_off:, 1] = directed2undirected[last_e]
    bond_graph[an_off:, 3] = directed2undirected[last_e]
    bond_graph[an_off:, 2] = last_e
    bond_graph[an_off:, 4] = last_e

    # DIRECTED angle-stream layout: sort angle rows by their directed
    # bond-i edge (pads keyed one-past-the-end stay at the tail). Every
    # row's dir_i AND dir_j share the row's center atom, so afterwards all
    # angle-side gathers are sorted (dir_i) or window-local (dir_j,
    # center) — streaming-kernel eligible — and BondConv partial-sums into
    # the sorted directed stream before reducing to undirected bonds via
    # d2u. Und-sorted rows would reference first-appearance bond ids,
    # which profile as whole-table random gathers on TPU.
    a_key = np.where(angle_mask > 0, bond_graph[:, 2], cap_e).astype(
        np.int32
    )
    if not bool((np.diff(a_key) >= 0).all()):
        a_order = stable_argsort_i32(a_key)
        bond_graph = gather_col(bond_graph, None, a_order)
        angle_scatter = gather_col(angle_scatter, None, a_order)
        angle_mask = gather_col(angle_mask, None, a_order)
    angle_scatter_dir = np.where(
        angle_mask > 0, bond_graph[:, 2], cap_e
    ).astype(np.int32)

    dense = {}
    if dense_k:
        counts = np.bincount(
            edge_scatter[edge_mask > 0], minlength=cap_n
        )[:cap_n]
        max_k = int(counts.max()) if counts.size else 1
        cap_k = max_k if dense_k is True else int(dense_k)
        if cap_k < max_k:
            raise ValueError(f"dense_k={cap_k} < max neighbors {max_k}")
        cap_k = round_up(max(cap_k, 1), base=8)
        dense_nbr = np.zeros((cap_n, cap_k), np.int32)
        dense_bond = np.zeros((cap_n, cap_k), np.int32)
        dense_mask = np.zeros((cap_n, cap_k), np.float32)
        # edges are center-sorted, so the K slot of each edge is its
        # running index within its center's contiguous run (vectorized)
        valid = np.nonzero(edge_mask > 0)[0]
        v_centers = edge_scatter[valid]
        v_counts = np.bincount(v_centers, minlength=cap_n)
        starts = np.concatenate([[0], np.cumsum(v_counts)[:-1]])
        slots = np.arange(len(valid)) - np.repeat(starts, v_counts)
        dense_nbr[v_centers, slots] = atom_graph[valid, 1]
        dense_bond[v_centers, slots] = directed2undirected[valid]
        dense_mask[v_centers, slots] = 1.0
        dense = {
            "dense_nbr": dense_nbr,
            "dense_bond": dense_bond,
            "dense_mask": dense_mask,
        }

    e_valid = edge_mask > 0
    a_valid = angle_mask > 0
    halo = {}
    if tile:
        halo = _build_halo_tiles(
            atom_graph,
            e_valid,
            cap_n,
            512 if tile is True else int(tile),
            min_cap=tile_cap,
        )
    # plan builds are independent (pure numpy + GIL-releasing native
    # sorts): run them on a small pool — the batch stage is the rebuild
    # pipeline's pole at the 10k-atom scale (docs/performance.md), and
    # this roughly halves it on the 4-core dev host
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=4) as pool:
        if halo:
            exp_valid = halo.pop("_exp_valid")
            n_x_cap = halo.pop("_n_x_cap")
            halo_futs = {
                "plan_exp": pool.submit(
                    make_plan, halo["exp_map"], exp_valid, cap_n
                ),
                "plan_nbr_x": pool.submit(
                    make_plan, halo["nbr_x"], e_valid, n_x_cap
                ),
            }
        plan_futs = {
            "plan_nbr": pool.submit(
                make_plan, atom_graph[:, 1], e_valid, cap_n
            ),
            "plan_d2u": pool.submit(
                make_plan, directed2undirected, e_valid, cap_u
            ),
            # undirected2directed is sorted by construction (undirected
            # ids assigned by first appearance along center-sorted
            # edges); angle rows are sorted only in bond_i
            "plan_u2d": pool.submit(
                make_plan, undirected2directed, und_mask > 0, cap_e,
                assume_sorted=True,
            ),
            "plan_u2d2": pool.submit(
                make_plan, und_second, und_mask > 0, cap_e
            ),
            "plan_ang_vi": pool.submit(
                make_plan, bond_graph[:, 2], a_valid, cap_e,
                assume_sorted=True,
            ),
            "plan_ang_vj": pool.submit(
                make_plan, bond_graph[:, 4], a_valid, cap_e
            ),
            "plan_ang_c": pool.submit(
                make_plan, bond_graph[:, 0], a_valid, cap_n
            ),
            "plan_center": pool.submit(
                make_plan, atom_graph[:, 0], e_valid, cap_n,
                assume_sorted=True,
            ),
        }
        plans = {k: f.result() for k, f in plan_futs.items()}
        if halo:
            halo.update({k: f.result() for k, f in halo_futs.items()})
    return GraphBatch(
        **halo,
        **plans,
        atomic_numbers=atomic_numbers,
        frac_coords=frac_coords,
        lattices=lattices,
        atom_owner=atom_owner,
        atom_mask=atom_mask,
        atom_graph=atom_graph,
        edge_scatter=edge_scatter,
        edge_owner=edge_owner,
        images=images,
        directed2undirected=directed2undirected,
        edge_mask=edge_mask,
        undirected2directed=undirected2directed,
        und_second=und_second,
        und_mask=und_mask,
        twin=twin,
        bond_graph=bond_graph,
        angle_scatter=angle_scatter,
        angle_scatter_dir=angle_scatter_dir,
        angle_mask=angle_mask,
        **dense,
    )
