"""Lean topology shipping: transfer the minimal index streams — packed
into ONE buffer — and derive the rest of the :class:`GraphBatch` on device.

Simulation loops (``simulation/runtime.py``) rebuild topology on the host
every time drift exhausts the Verlet skin budget and ship the padded batch
to the device. Most of a ``GraphBatch`` is *derivable* from a small primary
set, because padding is strictly tail-contiguous and every secondary array
is an elementwise/masked/gathered function of the primary streams:

* masks           = ``arange < n_valid`` (one scalar per stream),
* ``edge_scatter``/``edge_owner``  from ``atom_graph`` + the edge count,
* ``bond_graph`` cols 0/1/3        from cols 2/4 via ``atom_graph``/``d2u``
  (``batch_graphs`` pads cols 2/4 with the last valid edge and derives the
  padded 0/1/3 entries the same way, so the expansion is bit-exact),
* ``angle_scatter``/``angle_scatter_dir`` from col 2 masked,
* every ``GatherPlan``'s ``dst``/``raw`` = the masked key stream; raw-mode
  plans drop their host permutation entirely (the streaming kernel consumes
  ``raw`` directly; ``ops/scatter.py`` keeps a correct unsorted-segment-sum
  fallback for kernel-ineligible call sites).

Further derivations shrink the primary set itself: sorted index columns
(edge center, angle dir_i) ship as run counts and expand with one device
``repeat``; ``undirected2directed``/``und_second`` come back as segment
min/max of the edge index over ``d2u``; perm-mode plans rebuild their
permutation with an on-device stable argsort. At the 10,240-atom MD
scale the per-rebuild host->device ship drops from ~188 MB to ~25 MB,
packed into a SINGLE int32 blob (f32 fields bit-cast, the int8 image
offsets byte-packed) because the dev tunnel charges a fixed per-transfer
latency that dominates many small puts. The reference has no analog (it
rebuilds and re-uploads its graph every step,
``/root/reference/chgnet/model/dynamics.py:156-158``).

Shapes are static per (capacity, plan-mode) signature, so the expansion
jit caches across rebuilds; capacities only grow on the bucket grid.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from chgnet_tpu.graph.batching import GraphBatch
from chgnet_tpu.ops.scatter import GatherPlan
from chgnet_tpu.utils import hostmem

_PLAN_FIELDS = ("nbr", "d2u", "u2d", "u2d2", "ang_vi", "ang_vj", "ang_c",
                "center")


class LeanMeta(NamedTuple):
    """Static (hashable) expansion signature.

    ``modes``: per-plan mode in {'sorted', 'perm', 'raw'} following the
    host plan's shape pattern. ``layout``: the blob packing — one
    ``(name, int32-offset, shape, dtype)`` entry per primary field.
    """

    modes: tuple[str, ...]
    layout: tuple[tuple[str, int, tuple[int, ...], str], ...]


def _mode(plan: GatherPlan) -> str:
    if plan.perm.shape[0] == 0:
        return "sorted"  # sorted by construction; dst is the key stream
    if plan.raw.shape[0] > 0:
        return "raw"  # block-local: kernel consumes raw, perm dropped
    return "perm"  # unsorted, non-local: permutation must ship


def _i32_len(arr: np.ndarray) -> int:
    if arr.nbytes % 4:
        raise ValueError(
            f"field of {arr.nbytes} bytes does not pack into int32 words"
        )
    return arr.nbytes // 4


def make_lean(batch: GraphBatch) -> tuple[np.ndarray, LeanMeta]:
    """Pack the minimal primary arrays into one int32 blob.

    The batch must come from ``batch_graphs`` (all plans built, CSR
    layout — the dense-K fields must be empty, as simulation runtimes
    guarantee).
    """
    if batch.dense_nbr.size:
        raise ValueError("lean shipping is defined for the CSR layout only")
    images = np.asarray(batch.images)
    if not (np.abs(images) <= 127).all():
        raise ValueError("periodic image offsets exceed int8 range")
    n_e = int(np.asarray(batch.edge_mask).sum())
    n_u = int(np.asarray(batch.und_mask).sum())
    n_a = int(np.asarray(batch.angle_mask).sum())
    modes = tuple(_mode(getattr(batch, f"plan_{n}")) for n in _PLAN_FIELDS)

    # sorted index columns ship as RUN COUNTS and come back as a device
    # `repeat` (edges are center-sorted, angle rows dir_i-sorted); the
    # undirected maps come back as segment min/max of the edge index over
    # d2u (first/second directed edge of each bond); perm-mode plans
    # rebuild their permutation with an on-device stable argsort
    edge_scatter = np.asarray(batch.edge_scatter)
    cap_n = np.asarray(batch.atomic_numbers).shape[0]
    deg_counts = np.bincount(
        edge_scatter, minlength=cap_n + 1
    )[:cap_n].astype(np.int32)
    col2 = np.asarray(batch.bond_graph)[:, 2]
    cap_e = np.asarray(batch.atom_graph).shape[0]
    a_mask = np.asarray(batch.angle_mask) > 0
    ang_counts = np.bincount(
        col2[a_mask], minlength=cap_e
    )[:cap_e].astype(np.int32)
    n_n = int(np.asarray(batch.atom_mask).sum())
    fields: list[tuple[str, np.ndarray]] = [
        ("counts", np.asarray([n_e, n_u, n_a, n_n], np.int32)),
        ("atomic_numbers", np.asarray(batch.atomic_numbers)),
        ("frac_coords", np.asarray(batch.frac_coords)),
        ("lattices", np.asarray(batch.lattices)),
        ("atom_owner", np.asarray(batch.atom_owner)),
        ("atom_mask", np.asarray(batch.atom_mask)),
        ("deg_counts", deg_counts),
        ("nbr", np.ascontiguousarray(np.asarray(batch.atom_graph)[:, 1])),
        # int8 image offsets ride a 4-wide row so every field packs into
        # whole int32 words regardless of the edge capacity's parity
        ("images_i8", np.concatenate(
            [images.astype(np.int8),
             np.zeros((images.shape[0], 1), np.int8)], axis=1,
        )),
        ("d2u", np.asarray(batch.directed2undirected)),
        ("ang_counts", ang_counts),
        ("col4", np.ascontiguousarray(np.asarray(batch.bond_graph)[:, 4])),
    ]
    if np.asarray(batch.exp_map).shape[0]:
        # halo-tiled neighbor layout: exp_map/nbr_x are topology data
        # (cheap to ship: [N_x] + [E] int32); their plans follow the
        # standard mode machinery below. The VALID exp row count rides
        # along so the device can rebuild plan_exp's masked key stream
        # (plan_exp drops the padded tail in the backward).
        exp_map = np.asarray(batch.exp_map)
        n_x_valid = int((np.asarray(batch.plan_exp.dst) < cap_n).sum())
        fields.append(("exp_counts", np.asarray([n_x_valid], np.int32)))
        fields.append(("exp_map", exp_map))
        fields.append(("nbr_x", np.asarray(batch.nbr_x)))
        modes = modes + tuple(
            _mode(p) for p in (batch.plan_exp, batch.plan_nbr_x)
        )
        for name, plan in (("exp", batch.plan_exp),
                           ("nbr_x", batch.plan_nbr_x)):
            for small in ("blk_lo", "blk_cnt", "g_lo", "g_cnt", "pw"):
                fields.append(
                    (f"{name}.{small}", np.asarray(getattr(plan, small)))
                )

    for name, mode in zip(_PLAN_FIELDS, modes):
        plan: GatherPlan = getattr(batch, f"plan_{name}")
        for small in ("blk_lo", "blk_cnt", "g_lo", "g_cnt", "pw"):
            fields.append((f"{name}.{small}", np.asarray(getattr(plan, small))))

    layout = []
    off = 0
    for name, arr in fields:
        layout.append((name, off, tuple(arr.shape), str(arr.dtype)))
        off += _i32_len(arr)
    blob = hostmem.get_slab(off * 4).carve((max(off, 1),), np.int32)
    for (name, arr), (_, start, _, _) in zip(fields, layout):
        n = _i32_len(arr)
        if n:
            blob[start:start + n] = (
                np.ascontiguousarray(arr).view(np.int32).reshape(-1)
            )
    return blob, LeanMeta(modes, tuple(layout))


def _unpack(blob: jnp.ndarray, meta: LeanMeta) -> dict:
    out = {}
    for name, off, shape, dtype in meta.layout:
        size = int(np.prod(shape, dtype=np.int64))
        if size == 0:
            out[name] = jnp.zeros(shape, jnp.dtype(dtype))
            continue
        words = size * np.dtype(dtype).itemsize // 4
        sliced = jax.lax.slice(blob, (off,), (off + words,))
        if dtype == "int8":
            arr = jax.lax.bitcast_convert_type(sliced, jnp.int8)
        elif dtype == "float32":
            arr = jax.lax.bitcast_convert_type(sliced, jnp.float32)
        else:
            arr = sliced
        out[name] = arr.reshape(shape)
    return out


@functools.partial(jax.jit, static_argnames=("meta",))
def expand_lean(blob: jnp.ndarray, meta: LeanMeta) -> GraphBatch:
    """Derive the full padded :class:`GraphBatch` from the packed blob.

    Every output array equals the host-built one bit-for-bit except
    raw-mode plans, whose dropped permutation comes back empty and whose
    (unread) ``dst`` aliases ``raw`` — the TPU streaming kernel consumes
    ``raw`` directly, and the XLA fallback in ``ops/scatter.py`` sums
    over ``raw`` too.
    """
    lean = _unpack(blob, meta)
    d2u = lean["d2u"]
    nbr = lean["nbr"]
    col4 = lean["col4"]
    cap_n = lean["atomic_numbers"].shape[0]
    cap_e = nbr.shape[0]
    cap_u = cap_e // 2
    cap_a = col4.shape[0]
    counts = lean["counts"]
    n_e, n_u, n_a, n_n = counts[0], counts[1], counts[2], counts[3]

    e_valid = jnp.arange(cap_e, dtype=jnp.int32) < n_e
    u_valid = jnp.arange(cap_u, dtype=jnp.int32) < n_u
    a_valid = jnp.arange(cap_a, dtype=jnp.int32) < n_a
    last_atom = jnp.maximum(n_n - 1, 0)
    last_edge = jnp.maximum(n_e - 1, 0)

    # center column: edges are center-sorted, so the run counts expand
    # back with one repeat; the padded tail matches batch_graphs' fill
    center = jnp.where(
        e_valid,
        jnp.repeat(
            jnp.arange(cap_n, dtype=jnp.int32),
            lean["deg_counts"],
            total_repeat_length=cap_e,
        ),
        last_atom,
    )
    atom_graph = jnp.stack([center, nbr], axis=1)
    edge_scatter = jnp.where(e_valid, center, cap_n).astype(jnp.int32)
    edge_owner = jnp.where(
        e_valid, lean["atom_owner"][center], 0
    ).astype(jnp.int32)
    # first/second directed edge of each undirected bond = segment
    # min/max of the edge index over d2u (exactly two edges per bond;
    # "first" = construction order = the smaller index)
    key_d2u = jnp.where(e_valid, d2u, cap_u).astype(jnp.int32)
    eidx = jnp.arange(cap_e, dtype=jnp.int32)
    u2d = jnp.where(
        u_valid,
        jax.ops.segment_min(eidx, key_d2u, num_segments=cap_u),
        last_edge,
    ).astype(jnp.int32)
    und_second = jnp.where(
        u_valid,
        jax.ops.segment_max(eidx, key_d2u, num_segments=cap_u),
        last_edge,
    ).astype(jnp.int32)
    # reverse-edge involution: the OTHER directed edge of e's bond is
    # (first + second - e); padding maps to self (batch_graphs invariant)
    twin = jnp.where(
        e_valid, u2d[d2u] + und_second[d2u] - eidx, eidx
    ).astype(jnp.int32)
    # angle rows are dir_i-sorted: col2 expands from per-edge run counts
    col2 = jnp.where(
        a_valid,
        jnp.repeat(
            eidx, lean["ang_counts"], total_repeat_length=cap_a
        ),
        last_edge,
    )
    col0 = atom_graph[col2, 0]
    col1 = d2u[col2]
    col3 = d2u[col4]
    bond_graph = jnp.stack([col0, col1, col2, col3, col4], axis=1)
    angle_scatter = jnp.where(a_valid, col1, cap_u).astype(jnp.int32)
    angle_scatter_dir = jnp.where(a_valid, col2, cap_e).astype(jnp.int32)

    keys = {
        "nbr": jnp.where(e_valid, atom_graph[:, 1], cap_n),
        "d2u": jnp.where(e_valid, d2u, cap_u),
        "u2d": jnp.where(u_valid, u2d, cap_e),
        "u2d2": jnp.where(u_valid, und_second, cap_e),
        "ang_vi": angle_scatter_dir,
        "ang_vj": jnp.where(a_valid, col4, cap_e),
        "ang_c": jnp.where(a_valid, col0, cap_n),
        "center": edge_scatter,
    }
    tiled = "exp_map" in lean
    plan_names = _PLAN_FIELDS + (("exp", "nbr_x") if tiled else ())
    if tiled:
        n_x_cap = lean["exp_map"].shape[0]
        x_valid = (
            jnp.arange(n_x_cap, dtype=jnp.int32) < lean["exp_counts"][0]
        )
        keys["exp"] = jnp.where(x_valid, lean["exp_map"], cap_n)
        keys["nbr_x"] = jnp.where(e_valid, lean["nbr_x"], n_x_cap)

    empty = jnp.zeros(0, jnp.int32)
    plans = {}
    for name, mode in zip(plan_names, meta.modes):
        key = keys[name].astype(jnp.int32)
        if mode == "sorted":
            perm, dst, raw = empty, key, empty
        elif mode == "raw":
            perm, dst, raw = empty, key, key
        else:  # perm: rebuilt on device (stable argsort == the host's)
            perm = jnp.argsort(key, stable=True).astype(jnp.int32)
            dst, raw = key[perm], empty
        plans[name] = GatherPlan(
            perm=perm, dst=dst, blk_lo=lean[f"{name}.blk_lo"],
            blk_cnt=lean[f"{name}.blk_cnt"], raw=raw,
            g_lo=lean[f"{name}.g_lo"], g_cnt=lean[f"{name}.g_cnt"],
            pw=lean[f"{name}.pw"],
        )
    tiled_kw = {}
    if tiled:
        tiled_kw = {
            "exp_map": lean["exp_map"],
            "nbr_x": lean["nbr_x"],
            "plan_exp": plans["exp"],
            "plan_nbr_x": plans["nbr_x"],
        }

    return GraphBatch(
        **tiled_kw,
        atomic_numbers=lean["atomic_numbers"],
        frac_coords=lean["frac_coords"],
        lattices=lean["lattices"],
        atom_owner=lean["atom_owner"],
        atom_mask=lean["atom_mask"],
        atom_graph=atom_graph,
        edge_scatter=edge_scatter,
        edge_owner=edge_owner,
        images=lean["images_i8"][:, :3].astype(jnp.float32),
        directed2undirected=d2u,
        edge_mask=e_valid.astype(jnp.float32),
        undirected2directed=u2d,
        und_second=und_second,
        und_mask=u_valid.astype(jnp.float32),
        twin=twin,
        bond_graph=bond_graph,
        angle_scatter=angle_scatter,
        angle_scatter_dir=angle_scatter_dir,
        angle_mask=a_valid.astype(jnp.float32),
        plan_nbr=plans["nbr"],
        plan_d2u=plans["d2u"],
        plan_u2d=plans["u2d"],
        plan_u2d2=plans["u2d2"],
        plan_ang_vi=plans["ang_vi"],
        plan_ang_vj=plans["ang_vj"],
        plan_ang_c=plans["ang_c"],
        plan_center=plans["center"],
    )


def ship_lean(batch: GraphBatch) -> GraphBatch:
    """One-call lean transfer: host batch -> device-resident full batch.

    Ships ~7x fewer bytes than ``jax.device_put(batch)`` at MD scales —
    in ONE transfer — and derives the remainder on device. Returns a
    fully-populated device ``GraphBatch`` interchangeable with the
    direct transfer (raw-mode plans come back without their host
    permutation — see :func:`expand_lean`).
    """
    blob, meta = make_lean(batch)
    blob_dev = jax.device_put(blob)
    return expand_lean(blob_dev, meta)
