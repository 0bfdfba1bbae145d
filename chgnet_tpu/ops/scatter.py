"""Gathers and segment sums with host-precomputed streaming plans.

The hot loop gathers rows from small tables into long edge/angle streams
(``layers.py``, ``chgnet.py:_energy_core``) and scatter-sums them back.
Under ``jax.grad`` each gather transposes to a scatter-add with the SAME
index array. XLA's TPU gather/scatter emitter runs row-at-a-time (~12-15
GB/s physical, two orders below HBM), so both directions need structure
(the reference hits the same wall through torch ``index_add_``,
``/root/reference/chgnet/model/functions.py:10-40``).

Indices are host-built constants per batch, so the structure is free at
trace time. Each stream carries a :class:`GatherPlan`:

* ``perm``/``dst`` — the stable permutation sorting the stream by
  destination id and the sorted ids (padding mapped >= ``num_segments``).
  The backward then runs as a permutation gather + SORTED segment sum —
  no random scatter anywhere.
* ``blk_lo``/``blk_cnt`` — a block plan for the Pallas streaming
  segment-sum kernel (``ops/stream_ops.py``): per output block, the input
  chunk range to stream through one-hot MXU reductions. On TPU this
  replaces the XLA scatter emitter entirely.
* ``raw`` — when the UNSORTED stream is block-local (destinations of a
  contiguous stream segment land in few output blocks — true for
  center/neighbor/d2u/angle-center streams because edges and angles are
  graph- and center-sorted), the kernel consumes the raw stream directly
  and the block plan covers the per-block chunk RANGE. This skips the
  backward permutation gather too. ``raw`` non-empty selects this mode;
  off-TPU the ``perm`` fallback keeps bit-identical CPU numerics.

``GatherPlan`` rides inside ``GraphBatch`` (see ``graph/batching.py``).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from chgnet_tpu.ops import stream_ops


class GatherPlan(NamedTuple):
    """Backward/streaming plan for one index stream (host-precomputed).

    ``perm.shape == (0,)`` means the stream is sorted by construction and
    ``dst`` is the key stream itself. ``blk_lo/blk_cnt`` empty disables
    the streaming kernel. ``raw`` non-empty holds the unsorted key stream
    and marks the block plan as covering it (block-local mode).
    """

    perm: np.ndarray  # i32 [L] or [0]
    dst: np.ndarray  # i32 [L] sorted keys (padding >= num_segments)
    blk_lo: np.ndarray = np.zeros(0, np.int32)  # i32 [n_blocks] or [0]
    blk_cnt: np.ndarray = np.zeros(0, np.int32)  # i32 [n_blocks] or [0]
    raw: np.ndarray = np.zeros(0, np.int32)  # i32 [L] or [0]
    # forward-gather window plan (ops/stream_ops.py streaming gather):
    # per BO-row stream block, the source chunk window covering every
    # valid row's index. Empty disables the forward kernel.
    g_lo: np.ndarray = np.zeros(0, np.int32)  # i32 [L // BO] or [0]
    g_cnt: np.ndarray = np.zeros(0, np.int32)  # i32 [L // BO] or [0]
    # paired-window pipelined gather plan (stream_ops v2): per BO-row
    # stream block, the W-aligned source block index whose TWO
    # consecutive W-row blocks contain every valid index. Empty disables.
    pw: np.ndarray = np.zeros(0, np.int32)  # i32 [L // BO] or [0]


_EMPTY = np.zeros(0, np.int32)


def _opt(arr):
    """Plan field -> kernel operand: empty means absent."""
    return arr if getattr(arr, "shape", (0,))[0] else None

# accept the block-local plan when its chunk-visit total is within this
# factor of the minimum sequential pass (it removes a whole permutation
# gather from the backward, so a modest over-read still wins). Shared
# with stream_ops: the v2 kernel's static visit capacity derives from it.
_LOCAL_VISIT_FACTOR = stream_ops.LOCAL_VISIT_FACTOR


def make_plan(
    idx: np.ndarray,
    valid: np.ndarray,
    num_segments: int,
    *,
    assume_sorted: bool = False,
) -> GatherPlan:
    """Build a GatherPlan for stream ``idx`` with validity mask ``valid``.

    ``assume_sorted`` marks streams sorted BY CONSTRUCTION (identity
    permutation, checked); other streams always carry a full permutation
    so CPU-fallback numerics and plan shapes stay stable. Block plans are
    attached whenever the stream length is kernel-aligned
    (``L % stream_ops.C == 0``).
    """
    idx = np.asarray(idx)
    key = np.where(valid, idx, num_segments).astype(np.int32)
    aligned = key.shape[0] > 0 and key.shape[0] % stream_ops.C == 0

    def gather_window() -> dict:
        """Forward-gather window plan, kept only when the stream is
        window-local (a random stream would stream the whole table per
        block and must stay on XLA's gather). Windows cover EVERY row —
        padded gather indices point at the last valid row (batching
        convention), so the kernel output is bit-identical to XLA's
        gather on padded rows too. Also attaches the paired-window
        pipelined plan (``pw``) when every block's span fits two W-row
        source blocks."""
        out: dict = {}
        if stream_ops.stream_v2_enabled():
            # paired-window plans serve only the opt-in v2 gather; don't
            # spend host time on them in the rebuild pipeline otherwise.
            # Use the REAL validity mask: scatter-style streams pad with
            # num_segments (one-past-the-end), which would inflate the
            # block span and disqualify the plan; the kernels zero
            # out-of-window rows and every consumer masks padding.
            pw = stream_ops.build_pw_plan(
                idx, np.asarray(valid, dtype=bool), num_segments
            )
            if pw is not None:
                out["pw"] = pw
        gp = stream_ops.build_gather_plan(
            idx, np.ones(idx.shape[0], dtype=bool), num_segments
        )
        if gp is None:
            return out
        g_lo, g_cnt, visits = gp
        min_chunks = max(key.shape[0] // stream_ops.C, 1)
        if visits <= max(_LOCAL_VISIT_FACTOR * min_chunks, min_chunks + 16):
            out.update(g_lo=g_lo, g_cnt=g_cnt)
        return out

    if assume_sorted:
        if not bool((np.diff(key) >= 0).all()):
            raise ValueError("assume_sorted plan over an unsorted stream")
        if not aligned:
            return GatherPlan(perm=_EMPTY, dst=key)
        blk_lo, blk_cnt = stream_ops.build_block_plan(key, num_segments)
        return GatherPlan(
            perm=_EMPTY, dst=key, blk_lo=blk_lo, blk_cnt=blk_cnt,
            **gather_window(),
        )
    from chgnet_tpu.utils.native.hostops import stable_argsort_i32

    perm = stable_argsort_i32(key)
    dst = key[perm]
    if not aligned:
        return GatherPlan(perm=perm, dst=dst)
    gw = gather_window()
    lo_l, cnt_l, visits = stream_ops.build_block_plan_local(
        key, perm, num_segments
    )
    min_chunks = max(int(np.count_nonzero(key < num_segments)) // stream_ops.C, 1)
    if visits <= max(_LOCAL_VISIT_FACTOR * min_chunks, min_chunks + 16):
        return GatherPlan(
            perm=perm, dst=dst, blk_lo=lo_l, blk_cnt=cnt_l, raw=key, **gw
        )
    blk_lo, blk_cnt = stream_ops.build_block_plan(dst, num_segments)
    return GatherPlan(
        perm=perm, dst=dst, blk_lo=blk_lo, blk_cnt=blk_cnt, **gw
    )


def _stream_eligible(x, plan_blk_lo, n_out: int) -> bool:
    return stream_ops.stream_segsum_ok(x, plan_blk_lo, n_out)


def _planned_segsum(ct, perm, dst, blk_lo, blk_cnt, raw, num_segments):
    """Segment-sum of stream cotangents into ``num_segments`` rows,
    picking the fastest correct path for this plan at trace time."""
    if raw.shape[0] > 0 and _stream_eligible(ct, blk_lo, num_segments):
        return stream_ops.segment_sum_sorted(
            ct, raw, blk_lo, blk_cnt, num_segments, None, None, None, True
        )
    if perm.shape[0] == 0 and raw.shape[0] > 0:
        # lean plans (graph/leanship.py device expansion) drop the host
        # permutation for raw-mode streams; when the kernel is not
        # eligible the unsorted raw stream is the only correct key
        return jax.ops.segment_sum(ct, raw, num_segments)
    if perm.shape[0] > 0:
        ct = ct[perm]
    if raw.shape[0] == 0 and _stream_eligible(ct, blk_lo, num_segments):
        return stream_ops.segment_sum_sorted(
            ct, dst, blk_lo, blk_cnt, num_segments
        )
    return jax.ops.segment_sum(
        ct, dst, num_segments, indices_are_sorted=True
    )


def _gather_fwd_impl(table, idx, g_lo, g_cnt, pw):
    """Forward gather: the paired-window pipelined kernel when the plan
    carries ``pw``, else the v1 streaming window kernel on ``g_lo``, else
    XLA's gather. NOTE the kernels zero rows whose index falls outside
    the window — only masked/padded rows by plan construction, and every
    consumer masks."""
    if stream_ops.stream_gather_v2_ok(table, idx.shape[0], pw):
        return stream_ops._gather_v2_pallas(table, idx, pw)
    if stream_ops.stream_gather_ok(table, idx.shape[0], g_lo):
        return stream_ops._gather_pallas(table, idx, g_lo, g_cnt)
    return table[idx]


@functools.partial(jax.custom_vjp, nondiff_argnums=(10,))
def _gather_planned(
    table, idx, perm, dst, blk_lo, blk_cnt, raw, g_lo, g_cnt, pw,
    num_segments,
):
    return _gather_fwd_impl(table, idx, g_lo, g_cnt, pw)


def _gather_planned_fwd(
    table, idx, perm, dst, blk_lo, blk_cnt, raw, g_lo, g_cnt, pw,
    num_segments,
):
    # recurse through the custom op: higher-order autodiff differentiates
    # this fwd itself, and the raw windowed-gather pallas_call has no JVP
    out = _gather_planned(
        table, idx, perm, dst, blk_lo, blk_cnt, raw, g_lo, g_cnt, pw,
        num_segments,
    )
    return out, (perm, dst, blk_lo, blk_cnt, raw)


def _gather_planned_bwd(num_segments, res, ct):
    perm, dst, blk_lo, blk_cnt, raw = res
    dtable = _planned_segsum(ct, perm, dst, blk_lo, blk_cnt, raw, num_segments)
    return (dtable,) + (None,) * 9


_gather_planned.defvjp(_gather_planned_fwd, _gather_planned_bwd)


def plan_gather(
    table: jnp.ndarray, idx: jnp.ndarray, plan: GatherPlan | None
) -> jnp.ndarray:
    """``table[idx]`` whose forward rides the streaming window-gather
    kernel (when the plan carries a gather window) and whose backward
    follows ``plan`` (sorted segment sum / streaming kernel).

    ``plan=None`` (or an empty plan) falls back to the plain gather with
    XLA's default scatter-add transpose.
    """
    if plan is None or plan.dst.shape[0] == 0:
        return table[idx]
    return _gather_planned(
        table, idx, plan.perm, plan.dst, plan.blk_lo, plan.blk_cnt,
        plan.raw, plan.g_lo, plan.g_cnt, plan.pw, table.shape[0],
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _segsum_perm(
    data, ids, perm, dst, blk_lo, blk_cnt, raw, num_segments
):
    return _planned_segsum(
        data, perm, dst, blk_lo, blk_cnt, raw, num_segments
    )


def _segsum_perm_fwd(
    data, ids, perm, dst, blk_lo, blk_cnt, raw, num_segments
):
    out = _planned_segsum(
        data, perm, dst, blk_lo, blk_cnt, raw, num_segments
    )
    return out, ids


def _segsum_perm_bwd(num_segments, ids, ct):
    # d data[i] = ct[ids[i]]; dropped rows (ids >= num_segments) get zero.
    # Routing the transpose through a GATHER here (instead of letting XLA
    # transpose the forward's permutation gather into a scatter-add) is
    # the point of the custom vjp.
    safe = jnp.minimum(ids, num_segments - 1)
    d = jnp.take(ct, safe, axis=0)
    d = jnp.where((ids < num_segments)[:, None], d, 0)
    return (d.astype(ct.dtype),) + (None,) * 6


_segsum_perm.defvjp(_segsum_perm_fwd, _segsum_perm_bwd)


def plan_segment_sum_perm(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    plan: GatherPlan | None,
) -> jnp.ndarray:
    """Segment-sum of an UNSORTED stream through its permutation plan
    (permute-then-sorted-kernel forward, gather backward). ``segment_ids``
    padding maps to ``num_segments`` (dropped). Falls back to
    ``jax.ops.segment_sum`` without a plan."""
    if plan is None or (
        plan.perm.shape[0] == 0 and plan.raw.shape[0] == 0
    ):
        return jax.ops.segment_sum(data, segment_ids, num_segments)
    return _segsum_perm(
        data, segment_ids, plan.perm, plan.dst, plan.blk_lo, plan.blk_cnt,
        plan.raw, num_segments,
    )


# -------------------------------------------------- involution gather
@jax.custom_vjp
def involution_gather(x: jnp.ndarray, inv: jnp.ndarray) -> jnp.ndarray:
    """``x[inv]`` for a self-inverse permutation ``inv`` (inv[inv] == id).

    The transpose of a permutation gather is the gather by its inverse —
    for an involution, the SAME gather. The custom vjp keeps both
    directions on XLA's row-gather emitter (near random-access
    speed-of-light for dispersed permutations) instead of letting the
    backward lower to a scatter-add. Used for the reverse-edge ``twin``
    stream of the directed-native bond path (graph/batching.py).
    """
    return jnp.take(x, inv, axis=0)


def _involution_fwd(x, inv):
    return jnp.take(x, inv, axis=0), inv


def _involution_bwd(inv, ct):
    # recurse through involution_gather so grad-of-grad (the force-loss
    # training path) also rides gathers instead of scatter-add transposes
    return (involution_gather(ct, inv), None)


involution_gather.defvjp(_involution_fwd, _involution_bwd)


# ----------------------------------------------------- fused gather-sum
def _gather_sum_impl(tables, idxs, plans):
    """Fused kernel: sum of window-gathered parts (+ aligned streams)."""
    streams = [t for t, i in zip(tables, idxs) if i is None]
    win_tabs = [t for t, i in zip(tables, idxs) if i is not None]
    win_idxs = [i for i in idxs if i is not None]
    win_plans = [p for i, p in zip(idxs, plans) if i is not None]
    stream = None
    if streams:
        stream = streams[0]
        for s in streams[1:]:
            stream = stream + s
    return stream_ops._multi_gather_pallas(
        win_tabs,
        win_idxs,
        [p.g_lo for p in win_plans],
        [p.g_cnt for p in win_plans],
        stream,
        has_stream=stream is not None,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _gather_sum_planned(tables, idxs, plans, num_segments):
    return _gather_sum_impl(tables, idxs, plans)


def _gather_sum_fwd(tables, idxs, plans, num_segments):
    # recurse through the custom op (see _gather_planned_fwd)
    out = _gather_sum_planned(tables, idxs, plans, num_segments)
    return out, (idxs, plans)


def _pair_stream_keys(plan: GatherPlan):
    """Row-aligned key stream of a plan (for one-sweep pairing), or
    ``(None, False)`` when the plan only carries permuted keys. Returns
    ``(keys, raw_mode)``."""
    if plan.raw.shape[0] > 0:
        return plan.raw, True
    if plan.perm.shape[0] == 0:
        return plan.dst, False
    return None, False


def paired_cotangent_sums(ct, plans, n_outs, skip=()):
    """Per-plan segment sums of one cotangent stream, with same-capacity
    kernel-eligible streams PAIRED into two-output sweeps
    (``stream_ops.segment_sum_pair``) — e.g. the dir_i + dir_j
    reductions of the angle stream, or AtomConv's center + neighbor
    reductions of the edge stream: one read of ``ct`` instead of two.
    Positions in ``skip`` come back as None (the caller fills them)."""
    sums: list = [None] * len(plans)
    if not os.environ.get("CHGNET_TPU_NO_STREAM_PAIR"):
        cand = [
            k
            for k, (p, n_seg) in enumerate(zip(plans, n_outs))
            if k not in skip
            and p is not None
            and _stream_eligible(ct, p.blk_lo, n_seg)
            and _pair_stream_keys(p)[0] is not None
        ]
        while len(cand) >= 2:
            a = cand.pop(0)
            b = next((c for c in cand if n_outs[c] == n_outs[a]), None)
            if b is None:
                continue
            cand.remove(b)
            pa, pb = plans[a], plans[b]
            keys_a, raw_a = _pair_stream_keys(pa)
            keys_b, raw_b = _pair_stream_keys(pb)
            ulo, ucnt = stream_ops.union_block_plan(
                pa.blk_lo, pa.blk_cnt, pb.blk_lo, pb.blk_cnt
            )
            aux_a = (pa.blk_lo, pa.blk_cnt, _opt(pa.g_lo), _opt(pa.g_cnt),
                     _opt(pa.pw))
            aux_b = (pb.blk_lo, pb.blk_cnt, _opt(pb.g_lo), _opt(pb.g_cnt),
                     _opt(pb.pw))
            sums[a], sums[b] = stream_ops.segment_sum_pair(
                ct, keys_a, keys_b, ulo, ucnt, aux_a, aux_b,
                n_outs[a], raw_a, raw_b,
            )
    for k, (p, n_seg) in enumerate(zip(plans, n_outs)):
        if sums[k] is None and k not in skip and p is not None:
            sums[k] = _planned_segsum(
                ct, p.perm, p.dst, p.blk_lo, p.blk_cnt, p.raw, n_seg
            )
    return sums


def _gather_sum_bwd(num_segments, res, ct):
    idxs, plans = res
    skip = tuple(k for k, idx in enumerate(idxs) if idx is None)
    sums = paired_cotangent_sums(ct, plans, num_segments, skip=skip)
    dtables = tuple(
        ct if k in skip else sums[k] for k in range(len(idxs))
    )
    return (dtables, None, None)


_gather_sum_planned.defvjp(_gather_sum_fwd, _gather_sum_bwd)


def gather_sum(parts) -> jnp.ndarray:
    """``sum_k (table_k[idx_k] if idx_k is not None else table_k)`` with
    the window-gathers FUSED into one streaming kernel where possible.

    ``parts``: sequence of ``(table [S_k, d], idx [L] | None, plan)``.
    Parts whose plan lacks a gather window (or that are not
    kernel-aligned) are gathered individually and added outside the
    kernel; with fewer than two fusable members the whole sum falls back
    to the plain path — which keeps CPU numerics bit-identical to the
    historical per-part form (same add order).
    """
    import os

    if os.environ.get("CHGNET_TPU_NO_FUSED_GATHER_SUM"):
        acc = None
        for table, idx, plan in parts:
            g = table if idx is None else plan_gather(table, idx, plan)
            acc = g if acc is None else acc + g
        return acc
    fusable, rest = [], []
    first = parts[0][0]
    L = next(
        (i.shape[0] for _, i, _ in parts if i is not None),
        first.shape[0],
    )
    for table, idx, plan in parts:
        ok = table.shape[1] == first.shape[1] and (
            (idx is None and table.shape[0] == L and L % stream_ops.BO == 0)
            or (
                idx is not None
                and plan is not None
                and stream_ops.stream_gather_ok(table, L, plan.g_lo)
            )
        )
        (fusable if ok else rest).append((table, idx, plan))
    n_windowed = sum(1 for _, i, _ in fusable if i is not None)
    n_streams = len(fusable) - n_windowed
    # fuse whenever the kernel absorbs at least one add boundary: >= 2
    # windowed parts, or one windowed part + an aligned stream (the
    # directed-bond AtomConv shape: center window + native bond stream)
    if n_windowed < 1 or n_windowed + min(n_streams, 1) < 2 or not stream_ops.tpu_backend():
        # plain path, original order
        acc = None
        for table, idx, plan in parts:
            g = table if idx is None else plan_gather(table, idx, plan)
            acc = g if acc is None else acc + g
        return acc
    tables = tuple(t for t, _, _ in fusable)
    idxs = tuple(i for _, i, _ in fusable)
    plans = tuple(p for _, _, p in fusable)
    acc = _gather_sum_planned(
        tables, idxs, plans, tuple(t.shape[0] for t in tables)
    )
    for table, idx, plan in rest:
        g = table if idx is None else plan_gather(table, idx, plan)
        acc = acc + g
    return acc


# ------------------------------------------------------- twin reduce
@jax.custom_vjp
def _twin_reduce(partial, u2d, und2, d2u, plan_u2d, plan_u2d2, plan_d2u):
    return gather_sum([(partial, u2d, plan_u2d), (partial, und2, plan_u2d2)])


def _twin_reduce_fwd(partial, u2d, und2, d2u, plan_u2d, plan_u2d2, plan_d2u):
    out = _twin_reduce(partial, u2d, und2, d2u, plan_u2d, plan_u2d2, plan_d2u)
    return out, (d2u, plan_d2u)


def _twin_reduce_bwd(res, ct):
    d2u, plan_d2u = res
    # each directed edge is the FIRST or SECOND directed edge of exactly
    # its own bond, so the transpose of gather(u2d) + gather(und_second)
    # is one row gather by d2u — no segment sum at all. Padded edge rows
    # pick up their (in-range) padded-d2u bond's cotangent, which is
    # harmless: the partial stream's only other consumer is the dir_i
    # segment-sum backward, whose expansion zeroes dropped rows.
    return (plan_gather(ct, d2u, plan_d2u),) + (None,) * 6


_twin_reduce.defvjp(_twin_reduce_fwd, _twin_reduce_bwd)


def twin_reduce(partial, u2d, und2, d2u, plan_u2d, plan_u2d2, plan_d2u):
    """``partial[u2d] + partial[und_second]`` — the [E] -> [U] reduction
    of per-directed-edge partial sums to undirected bonds — with the
    backward rewritten as ONE ``d2u`` row gather instead of two
    [U] -> [E] segment-sum transposes (they sum disjoint indicator sets
    that tile the edge axis exactly once). Forward unchanged (the fused
    window kernel when plans qualify)."""
    if os.environ.get("CHGNET_TPU_NO_TWIN_REDUCE"):
        return gather_sum(
            [(partial, u2d, plan_u2d), (partial, und2, plan_u2d2)]
        )
    return _twin_reduce(
        partial, u2d, und2, d2u, plan_u2d, plan_u2d2, plan_d2u
    )


def harmonize_plans(plans: list[GatherPlan]) -> list[GatherPlan]:
    """Give a group of GatherPlans identical leaf shapes so they can be
    stacked on a leading axis (DP device batches, per-device shards).

    ``make_plan`` attaches streaming fields (``raw``, ``g_lo``/``g_cnt``)
    behind DATA-dependent cost gates, so same-capacity streams can
    legally disagree. Degrade per FIELD GROUP, not wholesale — one
    member failing only the gather-window gate must not cost the whole
    group its streaming segment-sum kernel:

    * ``g_lo``/``g_cnt`` disagree -> drop the gather window everywhere
      (forward gathers fall back to XLA; backward unaffected).
    * ``raw`` disagrees -> drop ``raw`` AND ``blk_lo``/``blk_cnt``
      everywhere. Mixed presence means mixed MODES: local-mode block
      plans cover the raw stream while sorted-mode ones cover ``dst``,
      and the block shapes coincide — keeping blocks while dropping raw
      would silently mis-sum the local-mode members.
    * ``perm`` disagrees (sorted-by-construction mixed with not) ->
      expand empty perms to the identity.
    """
    if len({tuple(np.shape(x) for x in p) for p in plans}) <= 1:
        return list(plans)
    out = list(plans)

    def differs(field: str) -> bool:
        return len({np.shape(getattr(p, field)) for p in out}) > 1

    if differs("g_lo") or differs("g_cnt"):
        out = [p._replace(g_lo=_EMPTY, g_cnt=_EMPTY) for p in out]
    if differs("pw"):
        out = [p._replace(pw=_EMPTY) for p in out]
    if differs("raw"):
        out = [
            p._replace(raw=_EMPTY, blk_lo=_EMPTY, blk_cnt=_EMPTY)
            for p in out
        ]
    if differs("perm"):
        out = [
            p._replace(
                perm=p.perm
                if p.perm.shape[0]
                else np.arange(p.dst.shape[0], dtype=np.int32)
            )
            for p in out
        ]
    return out


def stack_plans(plans: list[GatherPlan], alloc=None) -> GatherPlan:
    """Stack harmonized GatherPlans on a new leading axis (one row per
    device); pair with a ``P(axis)``-sharded spec tree under shard_map.

    The stacked arrays total hundreds of MB at the 100k-atom scale and
    are written exactly once, so they come from pre-populated pages
    (``hostmem.populated_empty`` — the dev host's per-page fault path is
    ~20x slower than a warm copy) or a caller-provided allocator
    (e.g. a recycled ``hostmem.Slab``)."""
    from chgnet_tpu.utils.hostmem import populated_empty

    plans = harmonize_plans(plans)
    if alloc is None:
        alloc = populated_empty
    fields = []
    for i in range(len(GatherPlan._fields)):
        arrs = [p[i] for p in plans]
        out = alloc((len(arrs),) + arrs[0].shape, arrs[0].dtype)
        for j, a in enumerate(arrs):
            out[j] = a
        fields.append(out)
    return GatherPlan(*fields)


# ------------------------------------------------------- forward scatters
def plan_segment_sum(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    plan: GatherPlan | None,
    *,
    indices_are_sorted: bool = True,
) -> jnp.ndarray:
    """Sorted scatter-sum of ``data`` by ``segment_ids`` (padding mapped to
    ``num_segments``, dropped), through the streaming kernel when ``plan``
    carries an aligned sorted block plan. ``plan.dst`` must equal
    ``segment_ids`` (it does for the center/dir-i scatter plans built in
    ``graph/batching.py``). Callers whose stream is NOT sorted by
    construction must pass ``indices_are_sorted=False`` — on TPU the XLA
    fallback exploits the hint and silently mis-sums otherwise."""
    if (
        plan is not None
        and plan.perm.shape[0] == 0
        and plan.raw.shape[0] == 0
        and _stream_eligible(data, plan.blk_lo, num_segments)
    ):
        # the plan's gather window (when present) routes the backward's
        # ct[dst] expansion through the streaming window-gather kernels
        g_lo = plan.g_lo if plan.g_lo.shape[0] else None
        g_cnt = plan.g_cnt if g_lo is not None else None
        pw = plan.pw if plan.pw.shape[0] else None
        return stream_ops.segment_sum_sorted(
            data, plan.dst, plan.blk_lo, plan.blk_cnt, num_segments,
            g_lo, g_cnt, pw,
        )
    return jax.ops.segment_sum(
        data, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )
