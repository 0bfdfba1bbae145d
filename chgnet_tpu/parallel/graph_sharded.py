"""Graph-partitioned multi-chip forward: one (batch of) crystal graph(s)
spread across a device mesh.

This is the sequence/context-parallel analog for crystal GNNs (SURVEY
§2.6): the reference has nothing like it — its capacity ceiling is one
GPU. Here:

* atoms are block-partitioned over the mesh axis; every directed edge
  lives on the device that owns its CENTER atom (message scatter is then
  local); every undirected bond lives on ONE of its two endpoints'
  devices, chosen by a weighted waterfill that balances per-device angle
  load (``_balance_bond_devices``), and angle rows follow their bond_i,
* each conv layer exchanges boundary features by all-gathering the 64-dim
  atom (and bond) feature tables over ICI — gather-based halo exchange;
  message computation and segment-sum stay local,
* energies psum over the mesh; forces/stress flow through the collective
  transposes (all_gather -> psum-scatter) under ``jax.grad``.

Capacities per device are static, so the whole thing jits once. The CPU
test suite runs this on 8 virtual devices and asserts numerical identity
with the single-device forward.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from chgnet_tpu.graph.batching import GraphBatch, round_up
from chgnet_tpu.utils import hostmem
from chgnet_tpu.utils.native.hostops import (
    fast_gather,
    gather_col,
    gather_col_into,
    stable_argsort_i32,
)
from chgnet_tpu.models import basis
from chgnet_tpu.models.chgnet import EV_A3_TO_GPA, CHGNetConfig
from chgnet_tpu.models.functions import (
    layer_norm_apply,
    linear_apply,
    mlp_apply,
    segment_sum,
)
from chgnet_tpu.models.layers import (
    angle_update_apply,
    atom_conv_apply,
    bond_conv_apply,
)
from chgnet_tpu.ops.scatter import plan_gather


class ShardedGraphBatch(NamedTuple):
    """A GraphBatch re-laid-out for D devices (leading axis D everywhere
    except the replicated lattices). Atom ids stay GLOBAL (block layout:
    device d owns [d * n_loc, (d+1) * n_loc)); undirected bonds get NEW
    global ids ``d * u_loc + slot`` matching the all-gather layout."""

    # atoms (block-partitioned, global ids preserved)
    atomic_numbers: np.ndarray  # i32 [D, N_loc]
    frac_coords: np.ndarray  # f32 [D, N_loc, 3]
    atom_owner: np.ndarray  # i32 [D, N_loc] graph id
    atom_mask: np.ndarray  # f32 [D, N_loc]
    lattices: np.ndarray  # f32 [B, 3, 3] replicated
    # directed edges (on center's device)
    edge_center: np.ndarray  # i32 [D, E_loc] global atom id
    edge_neighbor: np.ndarray  # i32 [D, E_loc] global atom id
    edge_image: np.ndarray  # f32 [D, E_loc, 3]
    edge_owner: np.ndarray  # i32 [D, E_loc] graph id
    edge_bond: np.ndarray  # i32 [D, E_loc] new global undirected id
    edge_mask: np.ndarray  # f32 [D, E_loc]
    # undirected bonds (on one endpoint's device, load-balanced)
    und_center: np.ndarray  # i32 [D, U_loc] global atom id
    und_neighbor: np.ndarray  # i32 [D, U_loc] global atom id
    und_image: np.ndarray  # f32 [D, U_loc, 3]
    und_owner: np.ndarray  # i32 [D, U_loc] graph id
    und_mask: np.ndarray  # f32 [D, U_loc]
    # angle rows (on bond_i's device)
    ang_center: np.ndarray  # i32 [D, A_loc] global atom id
    ang_nbr_i: np.ndarray  # i32 [D, A_loc] global atom id (bond_i neighbor)
    ang_img_i: np.ndarray  # f32 [D, A_loc, 3]
    ang_nbr_j: np.ndarray  # i32 [D, A_loc]
    ang_img_j: np.ndarray  # f32 [D, A_loc, 3]
    ang_bond_i_local: np.ndarray  # i32 [D, A_loc] local scatter slot (or U_loc)
    ang_bond_i: np.ndarray  # i32 [D, A_loc] new global undirected id
    ang_bond_j: np.ndarray  # i32 [D, A_loc] new global undirected id
    ang_owner: np.ndarray  # i32 [D, A_loc] graph id
    ang_mask: np.ndarray  # f32 [D, A_loc]
    # per-device GatherPlans (ops/scatter.py), stacked on the device axis
    # with uniform leaf shapes: backward scatters run as permuted sorted
    # segment sums / streaming kernels instead of XLA's row-at-a-time
    # scatter emitter. Keys: e_center / e_nbr / e_bond (edge streams into
    # the global atom/bond tables), ang_bi / ang_bj / ang_c (angle
    # streams). ``None`` disables (shard_batch(plans=False)).
    plans: dict | None = None

    @property
    def n_devices(self) -> int:
        return self.atomic_numbers.shape[0]

    @property
    def n_graphs(self) -> int:
        return self.lattices.shape[0]


def _device_order(dev: np.ndarray) -> np.ndarray | None:
    """Stable device-major ordering of rows; ``None`` if already sorted.

    Replaces the round-1 per-row Python loops (minutes of interpreter time
    at the 100k-atom / 10M-edge BASELINE scale). Batched edges are center-
    sorted with graph offsets, so ``dev`` is almost always non-decreasing
    already and the argsort is skipped entirely."""
    if dev.size == 0 or bool((np.diff(dev) >= 0).all()):
        return None
    if dev.dtype == np.int32:
        return stable_argsort_i32(dev)
    return np.argsort(dev, kind="stable")


class _Packer:
    """Pack device-major-sorted rows into padded [D, cap, ...] arrays.

    ``pack_gather`` is the fused primitive: it gathers source rows (or one
    column) STRAIGHT into each device's padded slice via the native
    threaded gather — the intermediate "gathered then packed" array never
    exists. On the dev host's slow-fault kernel that fusion (plus
    pre-populated output pages, see utils/hostmem.py) is the difference
    between ~23 s and ~1 s of prep at the BASELINE 100k-atom scale."""

    def __init__(self, counts: np.ndarray, cap: int, alloc=None) -> None:
        self.counts = [int(c) for c in counts]
        self.starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        self.cap = cap
        self.d = len(self.counts)
        self.alloc = alloc or hostmem.populated_empty

    def slots(self) -> np.ndarray:
        """Per-row global slot id ``dev * cap + within-device index`` for
        rows in device-major order (int32: padded tables stay < 2^31)."""
        out = self.alloc(int(np.sum(self.counts)), np.int32)
        pos = 0
        for i, c in enumerate(self.counts):
            out[pos: pos + c] = np.arange(
                i * self.cap, i * self.cap + c, dtype=np.int32
            )
            pos += c
        return out

    def pack(self, vals: np.ndarray, fill=0, dtype=None) -> np.ndarray:
        # pre-populated pages + targeted fills: the dev host's per-page
        # fault path runs at ~0.13 GB/s, so np.empty/np.full first-touch
        # dominates prep time at the 100k-atom scale
        out = self.alloc(
            (self.d, self.cap) + vals.shape[1:], dtype or vals.dtype
        )
        pos = 0
        for i, c in enumerate(self.counts):
            out[i, :c] = vals[pos: pos + c]
            if c < self.cap:
                out[i, c:] = fill
            pos += c
        return out

    def pack_gather(
        self, src: np.ndarray, idx: np.ndarray, col: int | None = None,
        fill=0,
    ) -> np.ndarray:
        """``pack(src[idx, col])`` without materializing the gather:
        ``idx`` (int32, device-major order) is gathered per device slice
        directly into the padded output."""
        tail = src.shape[1:] if col is None else ()
        out = self.alloc((self.d, self.cap) + tail, src.dtype)
        pos = 0
        for i, c in enumerate(self.counts):
            seg = idx[pos: pos + c]
            if not gather_col_into(src, col, seg, out[i, :c]):
                out[i, :c] = src[seg] if col is None else src[seg, col]
            if c < self.cap:
                out[i, c:] = fill
            pos += c
        return out

    def pack_gather_img(self, src: np.ndarray, idx: np.ndarray) -> np.ndarray:
        """pack_gather for [*, 3] image rows; padded rows get (1, 0, 0)
        so padded bond lengths stay finite."""
        out = self.pack_gather(src, idx)
        for i, c in enumerate(self.counts):
            out[i, c:, 0] = 1.0
        return out

    def mask(self) -> np.ndarray:
        out = self.alloc((self.d, self.cap), np.float32)
        for i, c in enumerate(self.counts):
            out[i, :c] = 1.0
            out[i, c:] = 0.0
        return out


def _pvary(x, axis: str):
    """Mark a replicated value as device-varying (pvary -> pcast rename)."""
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(x, (axis,), to="varying")
    return jax.lax.pvary(x, (axis,))


def _sbatch_spec(sbatch: ShardedGraphBatch, axis: str) -> ShardedGraphBatch:
    """shard_map spec tree for this batch: every leaf device-sharded on
    ``axis`` except the replicated lattices. Derived from the instance so
    optional subtrees (the ``plans`` dict) follow automatically."""
    spec = jax.tree.map(lambda _: P(axis), sbatch)
    return spec._replace(lattices=P())


def _strip(sbatch_l, sharded_spec, axis: str):
    """Drop the leading device axis shard_map leaves keep on P(axis)."""
    return jax.tree.map(
        lambda leaf, spec: leaf[0] if spec == P(axis) else leaf,
        sbatch_l,
        sharded_spec,
    )


def _fill_tail_with_last(arr: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Point each device row's padded tail at its last valid value.

    Gather-index streams pad with 0 by default; a row-0 reference drags
    every gather window back to chunk 0 and defeats the window-locality
    cost gate in ``make_plan`` (batching convention: padded gather indices
    point at the last valid row — masked later either way)."""
    for i, c in enumerate(counts):
        if 0 < c < arr.shape[1]:
            arr[i, c:] = arr[i, c - 1]
    return arr


def _balance_bond_devices(
    dev_c: np.ndarray,  # [U_valid] device of first endpoint
    dev_n: np.ndarray,  # [U_valid] device of second endpoint
    weights: np.ndarray,  # [U_valid] angle rows carried by this bond
    d: int,
) -> np.ndarray:
    """Assign each bond to one of its two endpoint devices, balancing the
    total per-device weight. Same-device bonds are forced; free bonds are
    split per (dev_c, dev_n) class with a cumsum waterfill against the
    running loads — O(U) with D^2 vectorized classes."""
    forced = dev_c == dev_n
    load = np.bincount(
        dev_c[forced], weights=weights[forced], minlength=d
    ).astype(np.float64)
    u_dev = dev_c.copy()
    free = np.nonzero(~forced)[0]
    if free.size == 0:
        return u_dev
    ckey = dev_c[free].astype(np.int64) * d + dev_n[free]
    order = np.argsort(ckey, kind="stable")
    fo = free[order]
    bounds = np.searchsorted(ckey[order], np.arange(d * d + 1))
    classes = [
        (c, fo[bounds[c]: bounds[c + 1]])
        for c in range(d * d)
        if bounds[c + 1] > bounds[c]
    ]
    # float64 cumsums: searchsorted against a float needle would silently
    # PROMOTE (copy) an int array per call (see stream_ops.py:57-60)
    cumw = {
        c: np.cumsum(weights[rows], dtype=np.float64)
        for c, rows in classes
    }
    to_i = {c: 0.0 for c, _ in classes}
    k_of = {c: 0 for c, _ in classes}
    # seed the running loads consistently with to_i == 0 (all on j)
    for c, _ in classes:
        load[c % d] += float(cumw[c][-1])
    # a single greedy pass mis-balances when a big class is processed
    # before the inflow that should have pushed it elsewhere (e.g. the
    # (Li, O) classes land on O's device before the heavy O-O classes
    # arrive) — iterate: each class re-splits against the current loads
    # with its own contribution removed; converges in a few rounds
    for _ in range(4):
        for c, rows in classes:
            i, j = divmod(c, d)
            cw = cumw[c]
            total = float(cw[-1])
            load[i] -= to_i[c]
            load[j] -= total - to_i[c]
            x = min(max((load[j] - load[i] + total) / 2.0, 0.0), total)
            k = int(np.searchsorted(cw, x))
            xw = float(cw[k - 1]) if k > 0 else 0.0
            to_i[c] = xw
            k_of[c] = k
            load[i] += xw
            load[j] += total - xw
    for c, rows in classes:
        i, j = divmod(c, d)
        k = k_of[c]
        u_dev[rows[:k]] = i
        u_dev[rows[k:]] = j
    return u_dev


def _stacked_plans(spec: dict[str, tuple]) -> dict:
    """Per-device GatherPlans for several streams at once, threaded.

    ``spec``: name -> (keys [D, cap], masks [D, cap], n_out,
    assume_sorted). The D x len(spec) ``make_plan`` calls are independent
    and dominated by native radix argsorts (GIL-released ctypes), so a
    thread pool recovers most of the cost at the 100k-atom scale."""
    import os
    from concurrent.futures import ThreadPoolExecutor

    from chgnet_tpu.ops.scatter import make_plan, stack_plans

    with ThreadPoolExecutor(
        max_workers=min(8, os.cpu_count() or 1)
    ) as pool:
        futures = {
            name: [
                pool.submit(
                    make_plan, keys[i], masks[i] > 0, n_out,
                    assume_sorted=assume_sorted,
                )
                for i in range(keys.shape[0])
            ]
            for name, (keys, masks, n_out, assume_sorted) in spec.items()
        }
        return {
            name: stack_plans([f.result() for f in futs])
            for name, futs in futures.items()
        }


def shard_batch(
    batch: GraphBatch,
    n_devices: int,
    *,
    plans: bool = True,
    min_caps: tuple[int, int, int] | None = None,
) -> ShardedGraphBatch:
    """Host-side re-layout of a padded GraphBatch onto D devices.

    ``min_caps`` = (e_loc, u_loc, a_loc) floors for the per-device
    edge/bond/angle capacities: simulation loops re-shard after every
    topology rebuild, and monotone capacities keep the jitted step from
    recompiling (read the previous sbatch's shapes to carry them over).
    """
    d = n_devices
    cap_n = batch.n_atoms_padded
    n_loc = round_up(-(-cap_n // d), base=8)
    n_glob = n_loc * d

    atomic_numbers = np.zeros(n_glob, np.int32)
    atomic_numbers[:cap_n] = batch.atomic_numbers
    frac = np.zeros((n_glob, 3), np.float32)
    frac[:cap_n] = batch.frac_coords
    atom_owner = np.zeros(n_glob, np.int32)
    atom_owner[:cap_n] = batch.atom_owner
    atom_mask = np.zeros(n_glob, np.float32)
    atom_mask[:cap_n] = batch.atom_mask

    # Everything below runs on int32 index streams through the fused
    # native gather (gather_col / pack_gather): intermediate "gathered
    # rows" tables are never materialized.

    # --- directed edges -> device of center atom
    e_valid = np.nonzero(batch.edge_mask > 0)[0].astype(np.int32)
    centers = gather_col(batch.atom_graph, 0, e_valid)
    e_dev = centers // n_loc
    e_counts = np.bincount(e_dev, minlength=d)
    e_loc = round_up(int(e_counts.max()), base=8)
    if min_caps is not None:
        e_loc = max(e_loc, int(min_caps[0]))

    # --- undirected bonds -> one of their two endpoints' devices, chosen
    # to BALANCE per-device angle load. Bonds carry very different angle
    # weights by species, and always picking the first edge's center
    # skews badly when atom order correlates with species (a site-major
    # supercell put 32x more angle rows on device 0 than 7). Weighted
    # waterfill over the D^2 endpoint-device classes gets within a class
    # granule of even; angle rows follow their bond_i's device.
    u_valid = np.nonzero(batch.und_mask > 0)[0].astype(np.int32)
    u_first_dir = gather_col(batch.undirected2directed, None, u_valid)
    u_center = gather_col(batch.atom_graph, 0, u_first_dir)
    u_nbr = gather_col(batch.atom_graph, 1, u_first_dir)
    a_valid = np.nonzero(batch.angle_mask > 0)[0].astype(np.int32)
    bond_i = gather_col(batch.bond_graph, 1, a_valid)
    u_dev = _balance_bond_devices(
        (u_center // n_loc).astype(np.int32),
        (u_nbr // n_loc).astype(np.int32),
        # +1: the bond-table rows themselves also spread
        np.bincount(bond_i, minlength=batch.und_mask.shape[0])[u_valid]
        + 1,
        d,
    )
    u_counts = np.bincount(u_dev, minlength=d)
    u_loc = round_up(int(u_counts.max()), base=8)
    if min_caps is not None:
        u_loc = max(u_loc, int(min_caps[1]))
    # new global id for each old undirected id: slot = running count within
    # its device, preserving original order
    u_order = _device_order(u_dev)
    u_pack = _Packer(u_counts, u_loc)
    new_uid = np.full(batch.undirected2directed.shape[0], -1, np.int32)
    u_valid_sorted = u_valid if u_order is None else gather_col(u_valid, None, u_order)
    new_uid[u_valid_sorted] = u_pack.slots()
    u_src = u_first_dir if u_order is None else gather_col(u_first_dir, None, u_order)

    # --- angle rows -> device of bond_i (a_valid/bond_i computed above)
    uid_unsorted = gather_col(new_uid, None, bond_i)
    a_dev = uid_unsorted // u_loc
    a_counts = np.bincount(a_dev, minlength=d)
    a_loc = round_up(int(max(a_counts.max(), 1)), base=8)
    if min_caps is not None:
        a_loc = max(a_loc, int(min_caps[2]))

    # All output caps are now known: start populating one slab for every
    # packed output (and the index streams below) in a BACKGROUND thread
    # while the index gathers run — page supply is the remaining cost on
    # the dev host (see utils/hostmem.py).
    n_ang = int(np.sum(a_counts))
    slab = hostmem.get_slab(
        d * (e_loc * 32 + u_loc * 28 + a_loc * 56)
        + (3 * n_ang + e_valid.shape[0]) * 4
        + (1 << 22)
    )
    u_pack.alloc = slab.carve

    def _carve_gather(src, col, idx):
        shape = idx.shape + (src.shape[1:] if col is None else ())
        out = slab.carve(shape, src.dtype)
        if not gather_col_into(src, col, idx, out):
            out[...] = src[idx] if col is None else src[idx, col]
        return out

    e_order = _device_order(e_dev)
    e_src = e_valid if e_order is None else gather_col(e_valid, None, e_order)
    e_pack = _Packer(e_counts, e_loc, alloc=slab.carve)
    a_order = _device_order(a_dev)
    a_src = a_valid if a_order is None else gather_col(a_valid, None, a_order)
    a_pack = _Packer(a_counts, a_loc, alloc=slab.carve)
    uid_i = uid_unsorted if a_order is None else gather_col(uid_unsorted, None, a_order)
    dir_i = _carve_gather(batch.bond_graph, 2, a_src)
    dir_j = _carve_gather(batch.bond_graph, 4, a_src)
    bond_j = _carve_gather(batch.bond_graph, 3, a_src)
    d2u_e = _carve_gather(batch.directed2undirected, None, e_src)

    ang_bond_i = a_pack.pack(uid_i)
    # local scatter slot (pad = one-past-the-end drop): derived in place
    # from the packed global id — global // u_loc == own device by layout
    ang_bond_i_local = slab.carve(ang_bond_i.shape, np.int32)
    np.mod(ang_bond_i, u_loc, out=ang_bond_i_local)
    for i, c in enumerate(a_pack.counts):
        ang_bond_i_local[i, c:] = u_loc

    out = ShardedGraphBatch(
        atomic_numbers=atomic_numbers.reshape(d, n_loc),
        frac_coords=frac.reshape(d, n_loc, 3),
        atom_owner=atom_owner.reshape(d, n_loc),
        atom_mask=atom_mask.reshape(d, n_loc),
        lattices=np.asarray(batch.lattices, np.float32),
        edge_center=e_pack.pack_gather(batch.atom_graph, e_src, col=0),
        edge_neighbor=e_pack.pack_gather(batch.atom_graph, e_src, col=1),
        edge_image=e_pack.pack_gather_img(batch.images, e_src),
        edge_owner=e_pack.pack_gather(batch.edge_owner, e_src),
        edge_bond=e_pack.pack_gather(new_uid, d2u_e),
        edge_mask=e_pack.mask(),
        und_center=u_pack.pack_gather(batch.atom_graph, u_src, col=0),
        und_neighbor=u_pack.pack_gather(batch.atom_graph, u_src, col=1),
        und_image=u_pack.pack_gather_img(batch.images, u_src),
        und_owner=u_pack.pack_gather(batch.edge_owner, u_src),
        und_mask=u_pack.mask(),
        ang_center=a_pack.pack_gather(batch.atom_graph, dir_i, col=0),
        ang_nbr_i=a_pack.pack_gather(batch.atom_graph, dir_i, col=1),
        ang_img_i=a_pack.pack_gather_img(batch.images, dir_i),
        ang_nbr_j=a_pack.pack_gather(batch.atom_graph, dir_j, col=1),
        ang_img_j=a_pack.pack_gather_img(batch.images, dir_j),
        ang_bond_i_local=ang_bond_i_local,
        ang_bond_i=ang_bond_i,
        ang_bond_j=a_pack.pack_gather(new_uid, bond_j),
        ang_owner=a_pack.pack_gather(batch.edge_owner, dir_i),
        ang_mask=a_pack.mask(),
    )
    if plans:
        u_glob = u_loc * d
        for arr, counts in (
            (out.edge_center, e_pack.counts),
            (out.edge_neighbor, e_pack.counts),
            (out.edge_bond, e_pack.counts),
            (out.ang_bond_i, a_pack.counts),
            (out.ang_bond_j, a_pack.counts),
            (out.ang_center, a_pack.counts),
        ):
            _fill_tail_with_last(arr, counts)
        out = out._replace(
            plans=_stacked_plans(
                {
                    # edges are device-major center-sorted, so the center
                    # scatter/backward stream is sorted per device
                    "e_center": (
                        out.edge_center, out.edge_mask, n_glob, True
                    ),
                    "e_nbr": (
                        out.edge_neighbor, out.edge_mask, n_glob, False
                    ),
                    "e_bond": (
                        out.edge_bond, out.edge_mask, u_glob, False
                    ),
                    "ang_bi": (out.ang_bond_i, out.ang_mask, u_glob, False),
                    "ang_bj": (out.ang_bond_j, out.ang_mask, u_glob, False),
                    "ang_c": (out.ang_center, out.ang_mask, n_glob, False),
                }
            )
        )
    return out


class _AllGatherComm:
    """Row-exchange strategy: all-gather full feature tables each layer.

    The unified energy core (:func:`_energy_sharded_core`) is written
    against this small interface; the halo variant (:class:`_HaloComm`)
    implements the same surface with boundary all_to_all exchanges, so the
    conv stack exists exactly once for both wire protocols.
    """

    def __init__(self, sb: ShardedGraphBatch, axis: str):
        self.axis = axis
        self._dev = jax.lax.axis_index(axis)
        d = jax.lax.axis_size(axis)
        self.n_loc = sb.atomic_numbers.shape[0]
        self.u_loc = sb.und_mask.shape[0]
        self.n_atom_rows = self.n_loc * d  # table length == drop target
        self.n_bond_rows = self.u_loc * d
        self.plans = sb.plans or {}
        # index arrays into the exchanged tables (GLOBAL block ids here)
        self.edge_center = sb.edge_center  # scatter target AND gather idx
        self.edge_neighbor = sb.edge_neighbor
        self.edge_bond = sb.edge_bond
        self.und_center = sb.und_center
        self.und_neighbor = sb.und_neighbor
        self.ang_center = sb.ang_center
        self.ang_nbr_i = sb.ang_nbr_i
        self.ang_nbr_j = sb.ang_nbr_j
        self.ang_bond_i = sb.ang_bond_i  # scatter target AND gather idx
        self.ang_bond_j = sb.ang_bond_j

    def atoms(self, local: jnp.ndarray) -> jnp.ndarray:
        """Local [n_loc, F] -> exchanged table the atom indices address."""
        return jax.lax.all_gather(local, self.axis, tiled=True)

    def bonds(self, local: jnp.ndarray) -> jnp.ndarray:
        return jax.lax.all_gather(local, self.axis, tiled=True)

    def own_atoms(self, table: jnp.ndarray) -> jnp.ndarray:
        """Slice this device's atom block back out of a conv output."""
        return jax.lax.dynamic_slice_in_dim(
            table, self._dev * self.n_loc, self.n_loc
        )

    def own_bonds(self, table: jnp.ndarray) -> jnp.ndarray:
        return jax.lax.dynamic_slice_in_dim(
            table, self._dev * self.u_loc, self.u_loc
        )


class _HaloComm:
    """Row-exchange strategy: send only referenced boundary rows
    (``jax.lax.all_to_all``); index arrays arrive pre-remapped to the
    [own block | halo slots] layout (see :func:`shard_batch_halo`)."""

    def __init__(self, sb: ShardedGraphBatch, hb: HaloBatch, axis: str):
        self.axis = axis
        d = jax.lax.axis_size(axis)
        self.n_loc = sb.atomic_numbers.shape[0]
        self.u_loc = sb.und_mask.shape[0]
        self.n_atom_rows = self.n_loc + d * hb.atom_send.shape[1]
        self.n_bond_rows = self.u_loc + d * hb.bond_send.shape[1]
        self.plans = hb.plans or {}
        self._atom_send = hb.atom_send
        self._bond_send = hb.bond_send
        self.edge_center = hb.edge_center_local
        self.edge_neighbor = hb.edge_neighbor_h
        self.edge_bond = hb.edge_bond_h
        self.und_center = hb.und_center_h
        self.und_neighbor = hb.und_neighbor_h
        self.ang_center = hb.ang_center_h
        self.ang_nbr_i = hb.ang_nbr_i_h
        self.ang_nbr_j = hb.ang_nbr_j_h
        self.ang_bond_i = sb.ang_bond_i_local
        self.ang_bond_j = hb.ang_bond_j_h

    def atoms(self, local: jnp.ndarray) -> jnp.ndarray:
        return jnp.concatenate(
            [local, _halo_exchange(local, self._atom_send, self.axis)]
        )

    def bonds(self, local: jnp.ndarray) -> jnp.ndarray:
        return jnp.concatenate(
            [local, _halo_exchange(local, self._bond_send, self.axis)]
        )

    def own_atoms(self, table: jnp.ndarray) -> jnp.ndarray:
        return table[: self.n_loc]

    def own_bonds(self, table: jnp.ndarray) -> jnp.ndarray:
        return table[: self.u_loc]


def _energy_sharded_core(
    params,
    cfg: CHGNetConfig,
    sb: ShardedGraphBatch,
    comm,  # _AllGatherComm | _HaloComm
    cart: jnp.ndarray,  # [N_loc, 3] undeformed local cartesians (diff var)
    strains: jnp.ndarray,  # [B, 3, 3] replicated
    *,
    dynamic_cutoff: bool = False,
):
    """Per-device energy partial, parameterized by a row-exchange strategy.

    Runs INSIDE shard_map: sb leaves arrive with the leading device axis
    stripped. Returns (local_energy_partial [B] — NOT psum'ed, so it can
    sit inside jax.grad without D-fold cotangent inflation; cross-device
    force terms flow through the collective transposes — and an aux dict
    of local arrays).

    ``dynamic_cutoff`` restores exact-cutoff semantics for skin-built
    topologies (simulation loops): edge/angle validity masks are
    recomputed from the CURRENT positions at the model cutoffs, mirroring
    ``simulation.runtime.apply_dynamic_cutoff``."""
    n_graphs = sb.lattices.shape[0]

    eye = jnp.eye(3, dtype=cart.dtype)
    deform = eye[None] + strains  # [B, 3, 3]
    lat = jnp.einsum("bij,bjk->bik", sb.lattices, deform)

    # positions of every row the local streams reference (the one
    # geometry exchange per evaluation)
    cart_loc = jnp.einsum("ni,nij->nj", cart, deform[sb.atom_owner])
    pos = comm.atoms(cart_loc)

    def bond_vec(center, neighbor, image, owner):
        return (
            pos[center]
            - pos[neighbor]
            - jnp.einsum("ei,eij->ej", image, lat[owner])
        )

    # undirected bond bases (local bonds)
    und_vec = bond_vec(
        comm.und_center, comm.und_neighbor, sb.und_image, sb.und_owner
    )
    und_dist = jnp.linalg.norm(und_vec, axis=1)
    rbf_ag = basis.radial_bessel(
        und_dist, params["bond_basis"]["freq_ag"],
        cfg.atom_graph_cutoff, cfg.cutoff_coeff,
    )
    rbf_bg = basis.radial_bessel(
        und_dist, params["bond_basis"]["freq_bg"],
        cfg.bond_graph_cutoff, cfg.cutoff_coeff,
    )

    # angle basis from per-row bond vectors (no directed-edge exchange)
    vec_i = bond_vec(
        comm.ang_center, comm.ang_nbr_i, sb.ang_img_i, sb.ang_owner
    )
    vec_j = bond_vec(
        comm.ang_center, comm.ang_nbr_j, sb.ang_img_j, sb.ang_owner
    )
    unit_i = vec_i / jnp.linalg.norm(vec_i, axis=1, keepdims=True)
    unit_j = vec_j / jnp.linalg.norm(vec_j, axis=1, keepdims=True)
    cos_ij = jnp.sum(unit_i * unit_j, axis=1) * (1 - 1e-6)
    angle_bases = basis.fourier(jnp.arccos(cos_ij), params["angle_basis"]["freq"])

    if dynamic_cutoff:
        # exact-cutoff masks from the current geometry (the topology was
        # built with skin-enlarged cutoffs): edges stay valid while their
        # UNDIRECTED bond is inside atom_graph_cutoff (the per-bond flag
        # travels to edge rows through one bond-table exchange — edges may
        # sit on a different device than their bond), angle rows while
        # bond i is within (<=) and directed bond j strictly within (<)
        # the bond-graph cutoff. Mirrors apply_dynamic_cutoff's
        # comparisons; padded rows keep mask 0 via the multiplication.
        tol = 1e-8
        und_ok = (und_dist <= cfg.atom_graph_cutoff + tol).astype(
            sb.und_mask.dtype
        )
        und_ok_t = comm.bonds(und_ok[:, None])[:, 0]
        edge_mask_dyn = sb.edge_mask * und_ok_t[comm.edge_bond]
        dist_i = jnp.linalg.norm(vec_i, axis=1)
        dist_j = jnp.linalg.norm(vec_j, axis=1)
        ang_ok = (dist_i <= cfg.bond_graph_cutoff + tol) & (
            dist_j < cfg.bond_graph_cutoff - tol
        )
        sb = sb._replace(
            edge_mask=edge_mask_dyn,
            ang_mask=sb.ang_mask * ang_ok.astype(sb.ang_mask.dtype),
            und_mask=sb.und_mask * und_ok,
        )

    # embeddings (local)
    z_index = jnp.clip(sb.atomic_numbers - 1, 0, cfg.max_num_elements - 1)
    atom_feas = params["atom_embedding"]["weight"][z_index]  # [N_loc, d]
    bond_feas = linear_apply(params["bond_embedding"], rbf_ag)  # [U_loc, d]
    bw_ag = linear_apply(params["bond_weights_ag"], rbf_ag)
    bw_bg = linear_apply(params["bond_weights_bg"], rbf_bg)
    angle_feas = linear_apply(params["angle_embedding"], angle_bases)

    # weight tables change only with geometry: exchange once, reuse per layer
    bw_ag_t = comm.bonds(bw_ag)
    bw_bg_t = comm.bonds(bw_bg)

    edge_scatter = jnp.where(
        sb.edge_mask > 0, comm.edge_center, comm.n_atom_rows
    ).astype(jnp.int32)
    atom_graph = jnp.stack([comm.edge_center, comm.edge_neighbor], axis=1)
    ang_scatter = jnp.where(
        sb.ang_mask > 0, comm.ang_bond_i, comm.n_bond_rows
    ).astype(jnp.int32)
    bond_graph = jnp.stack(
        [comm.ang_center, comm.ang_bond_i, jnp.zeros_like(comm.ang_bond_i),
         comm.ang_bond_j, jnp.zeros_like(comm.ang_bond_j)],
        axis=1,
    )

    # per-device streaming/backward plans (built by shard_batch[_halo]):
    # scatters and gather-backwards ride sorted segment sums / kernels
    pl = comm.plans
    conv_plans = (
        pl.get("e_center"), pl.get("e_bond"), pl.get("e_nbr"),
    )
    ang_plans = (pl.get("ang_bi"), pl.get("ang_bj"), pl.get("ang_c"))

    # loop-invariant weight streams: the bond-weight tables never change
    # across conv layers, so their edge/angle expansions are gathered ONCE
    # instead of per layer (forward gather + backward scatter dedup)
    weights_e_h = plan_gather(bw_ag_t, comm.edge_bond, conv_plans[1])
    weights_a_h = (
        plan_gather(bw_bg_t, bond_graph[:, 1], ang_plans[0])
        * plan_gather(bw_bg_t, bond_graph[:, 3], ang_plans[1])
    ) if cfg.update_bond else None

    act = cfg.non_linearity
    atom_feas_mid = atom_feas

    def atom_step(atom_p, atom_t, bond_t):
        return comm.own_atoms(
            atom_conv_apply(
                atom_p,
                atom_t,
                bond_t,
                bw_ag_t,
                atom_graph,
                edge_scatter,
                comm.edge_bond,
                sb.edge_mask,
                activation=act, fused=cfg.fused_kernels,
                plans=conv_plans,
                weights_e=weights_e_h,
            )
        )

    def bond_step(bond_p, atom_feas, bond_t, angle_feas):
        return comm.own_bonds(
            bond_conv_apply(
                bond_p,
                comm.atoms(atom_feas),
                bond_t,
                bw_bg_t,
                angle_feas,
                bond_graph,
                ang_scatter,
                sb.ang_mask,
                activation=act, fused=cfg.fused_kernels,
                plans=ang_plans,
                weights_a=weights_a_h,
            )
        )

    def angle_step(angle_p, atom_feas, bond_feas, angle_feas):
        return angle_update_apply(
            angle_p,
            comm.atoms(atom_feas),
            comm.bonds(bond_feas),
            angle_feas,
            bond_graph,
            activation=act, fused=cfg.fused_kernels,
            plans=ang_plans,
        )

    # rematerialization, mirroring _energy_core: "all" checkpoints every
    # layer, "angle" only the angle-stream layers (BondConv/AngleUpdate)
    # whose [A_loc, *] temps dominate the backward's peak. Without this
    # the mesh path kept EVERY layer's activations live — at 50k+ atoms
    # on 8 devices that alone exceeds a 125 GB host (virtual-device
    # proof) or any real chip's HBM.
    remat_mode = (
        cfg.remat if isinstance(cfg.remat, str)
        else ("all" if cfg.remat else "")
    )
    if remat_mode not in ("", "all", "angle"):
        raise ValueError(
            f"remat={cfg.remat!r}: use False, True/'all', or 'angle'"
        )
    if remat_mode:
        if remat_mode == "all":
            atom_step = jax.checkpoint(atom_step)
        bond_step = jax.checkpoint(bond_step)
        angle_step = jax.checkpoint(angle_step)

    for idx in range(cfg.n_conv - 1):
        bond_t = comm.bonds(bond_feas)
        atom_feas = atom_step(
            params["atom_convs"][idx], comm.atoms(atom_feas), bond_t
        )
        if cfg.update_bond:
            bond_feas = bond_step(
                params["bond_convs"][idx], atom_feas, bond_t, angle_feas
            )
        if cfg.update_angle:
            angle_feas = angle_step(
                params["angle_updates"][idx], atom_feas, bond_feas,
                angle_feas,
            )
        if idx == cfg.n_conv - 2:
            atom_feas_mid = atom_feas

    atom_feas = atom_step(
        params["atom_convs"][cfg.n_conv - 1],
        comm.atoms(atom_feas),
        comm.bonds(bond_feas),
    )
    if "readout_norm" in params:
        atom_feas = layer_norm_apply(params["readout_norm"], atom_feas)

    atom_scatter = jnp.where(sb.atom_mask > 0, sb.atom_owner, n_graphs).astype(
        jnp.int32
    )
    atoms_per_graph_local = segment_sum(
        sb.atom_mask[:, None], atom_scatter, n_graphs
    ).reshape(-1)
    if not cfg.mlp_first:
        raise NotImplementedError(
            "graph-sharded forward supports mlp_first readout only"
        )
    site_energies = mlp_apply(params["mlp"], atom_feas, activation=act)
    site_energies = site_energies * sb.atom_mask[:, None]
    energy_partial = segment_sum(site_energies, atom_scatter, n_graphs).reshape(
        -1
    )
    aux = {
        "atoms_per_graph_local": atoms_per_graph_local,
        "atom_feas_mid": atom_feas_mid,
        "site_energies": site_energies.reshape(-1),
        # local partial of the pooled crystal feature (psum for the full
        # [B, d] vector -- compute_batch's mlp_first crystal_fea)
        "crystal_fea_local": segment_sum(
            atom_feas * sb.atom_mask[:, None], atom_scatter, n_graphs
        ),
    }
    return energy_partial, aux


def _energy_sharded(
    params,
    cfg: CHGNetConfig,
    sb: ShardedGraphBatch,
    cart: jnp.ndarray,
    strains: jnp.ndarray,
    axis: str,
    *,
    dynamic_cutoff: bool = False,
):
    """All-gather row exchange (see :func:`_energy_sharded_core`)."""
    return _energy_sharded_core(
        params, cfg, sb, _AllGatherComm(sb, axis), cart, strains,
        dynamic_cutoff=dynamic_cutoff,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "config", "mesh", "axis",
        "compute_force", "compute_stress", "compute_magmom",
        "dynamic_cutoff",
    ),
)
def compute_batch_sharded(
    params,
    sbatch: ShardedGraphBatch,
    halo: HaloBatch | None = None,
    *,
    config: CHGNetConfig,
    mesh: Mesh,
    axis: str = "graph",
    compute_force: bool = False,
    compute_stress: bool = False,
    compute_magmom: bool = False,
    dynamic_cutoff: bool = False,
) -> dict[str, jnp.ndarray]:
    """Graph-partitioned prediction over a device mesh.

    Returns: e [B] (eV/atom if intensive), f [D, N_loc, 3], s [B, 3, 3]
    GPa, m [D, N_loc] — per-atom outputs keep the sharded block layout
    (``unshard_atoms`` flattens them back). ``dynamic_cutoff`` recomputes
    edge/angle masks at the model cutoffs from the current positions
    (skin-built topologies, see ``simulation.runtime``). ``halo`` (from
    :func:`shard_batch_halo`) switches the per-layer row exchange from
    full-table all-gathers to boundary all_to_all.
    """
    cfg = config
    n_graphs = sbatch.n_graphs

    sharded_spec = _sbatch_spec(sbatch, axis)
    halo_spec = jax.tree.map(lambda _: P(axis), halo)

    def local_fn(params, sbatch_l, halo_l, frac_l, strains):
        # leading device axis is stripped by shard_map on P(axis) leaves
        sb = _strip(sbatch_l, sharded_spec, axis)

        def energy_of(cart, strains):
            with jax.default_matmul_precision(cfg.matmul_precision):
                if halo_l is not None:
                    hb = jax.tree.map(lambda leaf: leaf[0], halo_l)
                    e_partial, aux = _energy_sharded_halo(
                        params, cfg, sb, hb, cart, strains, axis,
                        dynamic_cutoff=dynamic_cutoff,
                    )
                else:
                    e_partial, aux = _energy_sharded(
                        params, cfg, sb, cart, strains, axis,
                        dynamic_cutoff=dynamic_cutoff,
                    )
            return e_partial.sum(), (e_partial, aux)

        frac = frac_l[0]
        # undeformed local cartesians are the differentiation variable,
        # exactly like compute_batch (model.py:517-535 semantics)
        cart0 = jnp.einsum("ni,nij->nj", frac, sb.lattices[sb.atom_owner])
        # pvary: strains arrive replicated; each device differentiates
        # its OWN partial energy wrt them, so the cotangent must stay
        # per-device (the virial psum below does the cross-device sum).
        # Without this, check_vma's transpose inserts an extra psum and
        # the stress comes out D-fold inflated.
        strains0 = _pvary(strains, axis)
        out = {}
        if compute_force or compute_stress:
            argnums = (0, 1) if compute_stress else (0,)
            (_, (e_partial, aux)), grads = jax.value_and_grad(
                energy_of, argnums=argnums, has_aux=True
            )(cart0, strains0)
            if compute_force:
                # local direct terms + cross-device terms via the
                # all_gather transpose (psum-scatter) = full local force
                out["f"] = -grads[0][None]
            if compute_stress:
                volumes = jnp.abs(jnp.linalg.det(sb.lattices))
                # each device's grad covers its local strain uses; the
                # full virial is their sum over the mesh
                virial = jax.lax.psum(grads[-1], axis)
                out["s"] = virial * EV_A3_TO_GPA / volumes[:, None, None]
        else:
            _, (e_partial, aux) = energy_of(cart0, strains0)

        e_ext = jax.lax.psum(e_partial, axis)
        atoms_per_graph = jax.lax.psum(aux["atoms_per_graph_local"], axis)
        safe = jnp.maximum(atoms_per_graph, 1.0)
        energy = e_ext / safe if cfg.is_intensive else e_ext
        if "composition" in params:
            site_ref = params["composition"]["weight"][
                jnp.clip(sb.atomic_numbers - 1, 0, cfg.max_num_elements - 1)
            ] * sb.atom_mask
            atom_scatter = jnp.where(
                sb.atom_mask > 0, sb.atom_owner, n_graphs
            ).astype(jnp.int32)
            comp_ext = jax.lax.psum(
                segment_sum(site_ref[:, None], atom_scatter, n_graphs
                            ).reshape(-1),
                axis,
            )
            energy = energy + (
                comp_ext / safe if cfg.atom_ref_is_intensive else comp_ext
            )
        out["e"] = energy
        out["atoms_per_graph"] = atoms_per_graph
        if compute_magmom:
            out["m"] = (
                jnp.abs(
                    linear_apply(params["site_wise"], aux["atom_feas_mid"])
                ).reshape(-1)
                * sb.atom_mask
            )[None]
        return out

    out_specs = {"e": P(), "atoms_per_graph": P()}
    if compute_force:
        out_specs["f"] = P(axis)
    if compute_stress:
        out_specs["s"] = P()
    if compute_magmom:
        out_specs["m"] = P(axis)

    fn = shard_map(
        functools.partial(local_fn),
        mesh=mesh,
        in_specs=(P(), sharded_spec, halo_spec, P(axis), P()),
        out_specs=out_specs,
        check_vma=True,
    )
    strains0 = jnp.zeros((n_graphs, 3, 3), jnp.float32)
    return fn(
        params,
        jax.tree.map(jnp.asarray, sbatch),
        jax.tree.map(jnp.asarray, halo),
        jnp.asarray(sbatch.frac_coords),
        strains0,
    )


def unshard_atoms(arr: np.ndarray) -> np.ndarray:
    """[D, N_loc, ...] -> [D * N_loc, ...] global block layout."""
    arr = np.asarray(arr)
    return arr.reshape(arr.shape[0] * arr.shape[1], *arr.shape[2:])


# ------------------------------------------------------------- training step
def shard_targets(
    targets: dict, sbatch: ShardedGraphBatch
) -> dict:
    """Re-layout padded training targets onto the sharded atom blocks.

    ``e`` [B] and ``graph_mask`` [B] stay replicated; per-atom targets
    (``f`` [N_pad, 3], ``m`` [N_pad]) are zero-padded to the D * N_loc
    global block layout and reshaped to [D, N_loc, ...] (NaN-padding for
    the new rows so the masking matches missing labels).
    """
    d, n_loc = sbatch.atomic_numbers.shape
    out = {k: np.asarray(v) for k, v in targets.items() if k in ("e", "graph_mask", "s")}
    for key, width in (("f", (3,)), ("m", ())):
        if key in targets:
            src = np.asarray(targets[key], dtype=np.float32)
            full = np.full((d * n_loc, *width), np.nan, dtype=np.float32)
            full[: src.shape[0]] = src
            out[key] = full.reshape(d, n_loc, *width)
    return out


def make_graph_sharded_train_step(
    *,
    config: CHGNetConfig,
    optimizer,
    mesh: Mesh,
    axis: str = "graph",
    targets: str = "ef",
    energy_loss_ratio: float = 1.0,
    force_loss_ratio: float = 1.0,
    stress_loss_ratio: float = 0.1,
    mag_loss_ratio: float = 0.1,
    halo: bool = False,
):
    """Training over the graph-partitioned forward: per-device loss terms
    with psum'ed reductions, parameter gradients via shard_map autodiff
    (VMA-checked, so the collective transposes insert the required psums),
    replicated optimizer update.

    Step signature: (params, opt_state, sbatch, sharded_targets) ->
    (params, opt_state, metrics) — or with ``halo=True``:
    (params, opt_state, (sbatch, halo_batch), sharded_targets), using the
    boundary halo exchange instead of all-gathers for the feature flow.
    Targets come from :func:`shard_targets`.
    Loss = weighted MSE over the requested targets ("ef"/"efs"/"efsm",
    like the reference CombinedLoss) with NaN-masked labels; stress flows
    through the strain gradient (psum'ed virial), magmoms through the
    site-wise head on local atom blocks.
    """
    # Force training is grad-of-grad, and the fused Pallas tails'
    # second-order fallback (differentiating their hand backward) trips
    # check_vma's cotangent vma matching inside shard_map on real TPU
    # backends (replicated params vs varying activations). The unfused
    # XLA composition differentiates cleanly at any order — and the
    # tails' win is a few percent of the FORWARD only, noise for a train
    # step. Inference/MD mesh paths (first-order) keep the kernels.
    import dataclasses

    if config.fused_kernels:
        import warnings

        warnings.warn(
            "make_graph_sharded_train_step: fused_kernels=True is "
            "overridden to False for sharded training (second-order "
            "check_vma limitation); numerics/perf follow the unfused "
            "path",
            stacklevel=2,
        )
    cfg = dataclasses.replace(config, fused_kernels=False)

    def local_loss(params, sb, hb, tgt):
        n_graphs = sb.lattices.shape[0]
        targets_e = tgt["e"]
        graph_mask = tgt["graph_mask"]
        targets_f = tgt["f"][0]
        frac = sb.frac_coords
        cart0 = jnp.einsum("ni,nij->nj", frac, sb.lattices[sb.atom_owner])
        strains0 = jnp.zeros((n_graphs, 3, 3), jnp.float32)

        def e_of(cart, strains):
            with jax.default_matmul_precision(cfg.matmul_precision):
                if hb is not None:
                    e_partial, aux = _energy_sharded_halo(
                        params, cfg, sb, hb, cart, strains, axis
                    )
                else:
                    e_partial, aux = _energy_sharded(
                        params, cfg, sb, cart, strains, axis
                    )
            return e_partial.sum(), (e_partial, aux)

        argnums = (0, 1) if "s" in targets else (0,)
        (_, (e_partial, aux)), grads_geom = jax.value_and_grad(
            e_of, argnums=argnums, has_aux=True
        )(cart0, strains0)
        forces = -grads_geom[0]

        e_ext = jax.lax.psum(e_partial, axis)
        atoms = jnp.maximum(
            jax.lax.psum(aux["atoms_per_graph_local"], axis), 1.0
        )
        energy = e_ext / atoms if cfg.is_intensive else e_ext
        if "composition" in params:
            site_ref = params["composition"]["weight"][
                jnp.clip(sb.atomic_numbers - 1, 0, cfg.max_num_elements - 1)
            ] * sb.atom_mask
            atom_scatter = jnp.where(
                sb.atom_mask > 0, sb.atom_owner, n_graphs
            ).astype(jnp.int32)
            comp_ext = jax.lax.psum(
                segment_sum(site_ref[:, None], atom_scatter, n_graphs
                            ).reshape(-1),
                axis,
            )
            energy = energy + (
                comp_ext / atoms if cfg.atom_ref_is_intensive else comp_ext
            )

        # energy loss (replicated): NaN-masked MSE over valid graphs
        e_valid = (graph_mask > 0) & ~jnp.isnan(targets_e)
        safe_e = jnp.where(e_valid, targets_e, 0.0)
        e_count = jnp.maximum(e_valid.sum(), 1.0)
        e_err = jnp.where(e_valid, energy - safe_e, 0.0)
        e_loss = (e_err**2).sum() / e_count
        e_mae = jnp.abs(e_err).sum() / e_count

        # force loss: local squared errors, psum'ed reduction
        f_valid = (sb.atom_mask[:, None] > 0) & ~jnp.isnan(targets_f)
        safe_f = jnp.where(f_valid, targets_f, 0.0)
        f_err = jnp.where(f_valid, forces - safe_f, 0.0)
        f_count = jnp.maximum(
            jax.lax.psum(f_valid.sum(), axis).astype(jnp.float32), 1.0
        )
        f_loss = jax.lax.psum((f_err**2).sum(), axis) / f_count
        f_mae = jax.lax.psum(jnp.abs(f_err).sum(), axis) / f_count

        loss = energy_loss_ratio * e_loss + force_loss_ratio * f_loss
        metrics = {"e_MAE": e_mae, "f_MAE": f_mae}

        if "s" in targets:
            volumes = jnp.abs(jnp.linalg.det(sb.lattices))
            # under VMA-checked shard_map the strain cotangent is already
            # summed over the mesh by the collective transposes (unlike
            # the check_vma=False inference path, which psums explicitly)
            virial = grads_geom[1]
            stress = virial * EV_A3_TO_GPA / volumes[:, None, None]
            targets_s = tgt["s"]
            s_valid = (
                (graph_mask[:, None, None] > 0)
                & ~jnp.isnan(targets_s)
            )
            safe_s = jnp.where(s_valid, targets_s, 0.0)
            s_err = jnp.where(s_valid, stress - safe_s, 0.0)
            s_count = jnp.maximum(s_valid.sum().astype(jnp.float32), 1.0)
            loss = loss + stress_loss_ratio * (s_err**2).sum() / s_count
            metrics["s_MAE"] = jnp.abs(s_err).sum() / s_count

        if "m" in targets:
            magmom = jnp.abs(
                linear_apply(params["site_wise"], aux["atom_feas_mid"])
            ).reshape(-1) * sb.atom_mask
            targets_m = tgt["m"][0]
            m_valid = (sb.atom_mask > 0) & ~jnp.isnan(targets_m)
            safe_m = jnp.where(m_valid, targets_m, 0.0)
            m_err = jnp.where(m_valid, magmom - safe_m, 0.0)
            m_count = jnp.maximum(
                jax.lax.psum(m_valid.sum(), axis).astype(jnp.float32), 1.0
            )
            loss = loss + mag_loss_ratio * jax.lax.psum(
                (m_err**2).sum(), axis
            ) / m_count
            metrics["m_MAE"] = jax.lax.psum(
                jnp.abs(m_err).sum(), axis
            ) / m_count

        metrics["loss"] = loss
        return loss, metrics

    target_spec = {"e": P(), "graph_mask": P(), "f": P(axis)}
    if "s" in targets:
        target_spec["s"] = P()
    if "m" in targets:
        target_spec["m"] = P(axis)

    def build(sharded_spec, halo_spec):
        """shard_map'd step for one batch spec tree (the plans subtrees
        are instance-dependent, so specs derive from the first batch)."""

        def local_step(params, opt_state, batch_l, tgt):
            if halo:
                sb = _strip(batch_l[0], sharded_spec, axis)
                hb = jax.tree.map(lambda leaf: leaf[0], batch_l[1])
            else:
                sb = _strip(batch_l, sharded_spec, axis)
                hb = None
            grads, metrics = jax.grad(
                lambda p: local_loss(p, sb, hb, tgt), has_aux=True
            )(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

        batch_spec = (sharded_spec, halo_spec) if halo else sharded_spec
        fn = shard_map(
            local_step,
            mesh=mesh,
            in_specs=(P(), P(), batch_spec, target_spec),
            out_specs=(P(), P(), P()),
        )
        return jax.jit(fn)

    cache: dict = {}

    def step(params, opt_state, batch, tgt):
        sb_in = batch[0] if halo else batch
        halo_spec = (
            jax.tree.map(lambda _: P(axis), batch[1]) if halo else None
        )
        key = (
            sb_in.plans is not None,
            halo and batch[1].plans is not None,
        )
        if key not in cache:
            cache[key] = build(_sbatch_spec(sb_in, axis), halo_spec)
        return cache[key](params, opt_state, batch, tgt)

    return step


# ----------------------------------------------------- halo-exchange variant
class HaloBatch(NamedTuple):
    """Boundary-exchange metadata for the halo variant of the sharded
    forward: instead of all-gathering full feature tables each layer,
    every device sends only the rows its peers actually reference
    (`jax.lax.all_to_all` over the mesh — the boundary atom/bond feature
    exchange of the BASELINE north star). All leaves carry the leading
    device axis; index arrays are pre-remapped into the
    [own block | halo slots] layout."""

    # which of MY local rows to send to each peer (padding -> row 0)
    atom_send: np.ndarray  # i32 [D, D, Ha]
    bond_send: np.ndarray  # i32 [D, D, Hb]
    # consumer index arrays remapped to local+halo positions
    edge_center_local: np.ndarray  # i32 [D, E_loc] scatter target (< n_loc)
    edge_neighbor_h: np.ndarray  # i32 [D, E_loc]
    edge_bond_h: np.ndarray  # i32 [D, E_loc]
    und_center_h: np.ndarray  # i32 [D, U_loc]
    und_neighbor_h: np.ndarray  # i32 [D, U_loc]
    ang_center_h: np.ndarray  # i32 [D, A_loc]
    ang_nbr_i_h: np.ndarray  # i32 [D, A_loc]
    ang_nbr_j_h: np.ndarray  # i32 [D, A_loc]
    ang_bond_j_h: np.ndarray  # i32 [D, A_loc]
    # per-device GatherPlans over the [own | halo] table layouts (same
    # roles as ShardedGraphBatch.plans, n_out = local + halo rows)
    plans: dict | None = None


def shard_batch_halo(
    batch: GraphBatch,
    n_devices: int,
    *,
    plans: bool = True,
    min_caps: tuple[int, int, int] | None = None,
    min_halo: tuple[int, int] | None = None,
) -> tuple[ShardedGraphBatch, HaloBatch]:
    """shard_batch plus precomputed boundary-exchange index plans.

    ``min_caps`` floors the per-device stream capacities (see
    :func:`shard_batch`); ``min_halo`` = (atom halo cap, bond halo cap)
    floors the per-peer halo slot counts — simulation loops grow both
    monotonically so rebuilds keep stable trace shapes."""
    # the halo forward never reads the global-layout plans; skip them
    sb = shard_batch(batch, n_devices, plans=False, min_caps=min_caps)
    d = n_devices
    n_loc = sb.atomic_numbers.shape[1]
    u_loc = sb.und_mask.shape[1]

    def build_plan(ref_arrays, masks, block_size, h_floor):
        """Remap global-id references into [own | halo] positions and build
        per-peer send lists. ``ref_arrays``/``masks`` are parallel lists of
        stacked [D, cap_k] arrays (block layout: owner = id // block_size).
        Returns (send [D, D, H], remapped [D, cap_k] arrays in order)."""
        needed = []
        for dev in range(d):
            refs = np.concatenate(
                [arr[dev][m[dev]] for arr, m in zip(ref_arrays, masks)]
            ) if ref_arrays else np.zeros(0, np.int64)
            remote = refs[(refs // block_size) != dev]
            needed.append(np.unique(remote))
        h_cap = max(
            [1, int(h_floor)]
            + [
                int(np.bincount(ids // block_size, minlength=d).max())
                for ids in needed
                if ids.size
            ]
        )
        h_cap = round_up(h_cap, base=8)
        send = np.zeros((d, d, h_cap), np.int32)
        # recv layout on dev: halo pos = block_size + p * h_cap + slot.
        # Vectorized global-id -> local/halo position via one lookup table
        # per device (replaces the former per-element Python loop).
        own = np.tile(np.arange(block_size, dtype=np.int32), d)
        lookup = np.empty((d, d * block_size), np.int32)
        for dev in range(d):
            lookup[dev] = own  # own rows: gid - dev * block_size
            for p in range(d):
                if p == dev:
                    continue
                ids = needed[dev][(needed[dev] // block_size) == p]
                send[p, dev, : len(ids)] = ids - p * block_size
                lookup[dev, ids] = block_size + p * h_cap + np.arange(
                    len(ids), dtype=np.int32
                )

        remapped = []
        for arr, m in zip(ref_arrays, masks):
            out = np.empty(arr.shape, np.int32)
            for dev in range(d):
                out[dev] = np.where(
                    m[dev], fast_gather(lookup[dev], arr[dev].ravel()), 0
                )
            remapped.append(out)
        return send, remapped

    e_mask = sb.edge_mask > 0
    u_mask = sb.und_mask > 0
    a_mask = sb.ang_mask > 0
    atom_send, atom_remapped = build_plan(
        [sb.edge_neighbor, sb.und_center, sb.und_neighbor,
         sb.ang_center, sb.ang_nbr_i, sb.ang_nbr_j],
        [e_mask, u_mask, u_mask, a_mask, a_mask, a_mask],
        n_loc,
        min_halo[0] if min_halo else 0,
    )
    bond_send, bond_remapped = build_plan(
        [sb.edge_bond, sb.ang_bond_j], [e_mask, a_mask], u_loc,
        min_halo[1] if min_halo else 0,
    )

    halo = HaloBatch(
        atom_send=atom_send,
        bond_send=bond_send,
        edge_center_local=np.where(
            e_mask,
            sb.edge_center - (np.arange(d) * n_loc)[:, None],
            n_loc,
        ).astype(np.int32),
        edge_neighbor_h=atom_remapped[0],
        und_center_h=atom_remapped[1],
        und_neighbor_h=atom_remapped[2],
        ang_center_h=atom_remapped[3],
        ang_nbr_i_h=atom_remapped[4],
        ang_nbr_j_h=atom_remapped[5],
        edge_bond_h=bond_remapped[0],
        ang_bond_j_h=bond_remapped[1],
    )
    if plans:
        atom_rows = n_loc + d * halo.atom_send.shape[2]
        bond_rows = u_loc + d * halo.bond_send.shape[2]
        e_counts = e_mask.sum(axis=1)
        a_counts = a_mask.sum(axis=1)
        for arr, counts in (
            (halo.edge_neighbor_h, e_counts),
            (halo.edge_bond_h, e_counts),
            (halo.ang_center_h, a_counts),
            (halo.ang_bond_j_h, a_counts),
        ):
            _fill_tail_with_last(arr, counts)
        halo = halo._replace(
            plans=_stacked_plans(
                {
                    "e_center": (
                        halo.edge_center_local, sb.edge_mask, atom_rows,
                        True,
                    ),
                    "e_nbr": (
                        halo.edge_neighbor_h, sb.edge_mask, atom_rows,
                        False,
                    ),
                    "e_bond": (
                        halo.edge_bond_h, sb.edge_mask, bond_rows, False
                    ),
                    "ang_bi": (
                        sb.ang_bond_i_local, sb.ang_mask, bond_rows, False
                    ),
                    "ang_bj": (
                        halo.ang_bond_j_h, sb.ang_mask, bond_rows, False
                    ),
                    "ang_c": (
                        halo.ang_center_h, sb.ang_mask, atom_rows, False
                    ),
                }
            )
        )
    return sb, halo


def _halo_exchange(local_rows, send_idx, axis):
    """Send my referenced rows to each peer; return the halo table
    [D * H, F] in peer-major order (matching the remap layout)."""
    payload = local_rows[send_idx]  # [D, H, F]
    received = jax.lax.all_to_all(
        payload, axis, split_axis=0, concat_axis=0, tiled=True
    )  # [D, H, F]: received[p] = rows sent by peer p
    return received.reshape(-1, local_rows.shape[-1])


def _energy_sharded_halo(
    params,
    cfg: CHGNetConfig,
    sb: ShardedGraphBatch,
    hb: HaloBatch,
    cart: jnp.ndarray,
    strains: jnp.ndarray,
    axis: str,
    *,
    dynamic_cutoff: bool = False,
):
    """Boundary halo-exchange row transport (all_to_all of only the
    referenced border rows — 47% of the all-gather wire bytes at D=8,
    improving with D). Same math and contract as :func:`_energy_sharded`:
    both are one :func:`_energy_sharded_core` under different comm
    strategies."""
    return _energy_sharded_core(
        params, cfg, sb, _HaloComm(sb, hb, axis), cart, strains,
        dynamic_cutoff=dynamic_cutoff,
    )


def compute_batch_sharded_halo(
    params,
    sbatch: ShardedGraphBatch,
    halo: HaloBatch,
    *,
    config: CHGNetConfig,
    mesh: Mesh,
    axis: str = "graph",
    compute_force: bool = False,
    compute_stress: bool = False,
    compute_magmom: bool = False,
    dynamic_cutoff: bool = False,
) -> dict[str, jnp.ndarray]:
    """Graph-partitioned prediction with boundary halo exchange
    (all_to_all of referenced border rows) instead of full all-gathers.
    Same outputs as :func:`compute_batch_sharded` (of which this is now a
    thin alias — the halo batch just selects the comm strategy)."""
    return compute_batch_sharded(
        params,
        sbatch,
        halo,
        config=config,
        mesh=mesh,
        axis=axis,
        compute_force=compute_force,
        compute_stress=compute_stress,
        compute_magmom=compute_magmom,
        dynamic_cutoff=dynamic_cutoff,
    )
