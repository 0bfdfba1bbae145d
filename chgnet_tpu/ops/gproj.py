"""Union-window gather-project kernel: the first conv-layer sum in one
narrow-table sweep.

Every conv layer's first gated-MLP Linear is a sum of per-part
projections over gathered rows (``models/functions.py``
``gated_mlp_gather_apply``; reference
``/root/reference/chgnet/model/layers.py:112-125``):

    acc[l] = sum_p  T_{tab(p)}[idx_p[l]] @ W_p   (+ aligned stream)

The round-3/4 form projects each part's table FIRST (matmul rows drop to
the table size) and window-gathers the projected [S, 2D] tables — but
the hot layers gather the SAME narrow table through TWO index streams
whose per-block windows nearly coincide (dir_i/dir_j over the directed
bond table; center/neighbor over the atom table), so the projected form
streams two 2D-wide windows where ONE dt-wide window of the raw table
carries the same information (the projections are rank-dt). This kernel:

* DMAs the UNION window of all participating index streams ONCE per
  source table (double-buffered, like ``stream_ops._gather_kernel``),
* expands each index stream with one-hot MXU matmuls — one one-hot per
  index stream, shared by every table that stream touches,
* applies the per-pair first-layer weights [dt, K] to the gathered
  [BO, dt] blocks in-kernel (MXU, negligible FLOPs),
* adds the aligned (pre-projected) stream block and writes [BO, K].

Per angle-side layer this replaces two 2D-wide window sweeps (plus the
folded atom part riding one of them) with two dt-wide sweeps; per
AtomConv layer, two 2D-wide sweeps with one dt-wide union sweep.

bf16 numerics: each gathered block is rounded to bf16 before its weight
matmul (default MXU precision), matching the projected path's
materialized-bf16-table rounding per row; f32 uses HIGHEST throughout.

Backward (custom vjp, arbitrary-order): d_table/d_W ride per-index
segment sums of the cotangent — at most one :func:`stream_ops.
segment_sum_pair` sweep (index streams are deduplicated first), then
cheap [S, K] x [K, dt] matmuls.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from chgnet_tpu.ops import stream_ops
from chgnet_tpu.ops.stream_ops import BO, C, out_vma


def _precision(dtype) -> jax.lax.Precision:
    return (
        jax.lax.Precision.HIGHEST
        if dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def _gproj_kernel(*refs, n_tab, n_idx, pairs, S, dt, K, has_stream, prec,
                  round_bf16):
    """One [BO, K] output block. refs layout (after 2 prefetch scalars
    ulo/ucnt): idx_all [n_blocks, Ki_pad, BO] (HBM), tab_0..tab_{n_tab-1}
    (HBM, P-packed [S//P, P*dt]), W [n_pairs * dt, K] (VMEM), (stream
    block?), out, then scratch: sbuf_k x n_tab, ibuf, g (one per pair),
    ssem x n_tab, isem."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ulo_ref, ucnt_ref = refs[0], refs[1]
    pos = 2
    idx_hbm = refs[pos]; pos += 1
    tabs = refs[pos: pos + n_tab]; pos += n_tab
    w_ref = refs[pos]; pos += 1
    stream = None
    if has_stream:
        stream = refs[pos]; pos += 1
    out_ref = refs[pos]; pos += 1
    sbufs = refs[pos: pos + n_tab]; pos += n_tab
    ibuf = refs[pos]; pos += 1
    gbufs = refs[pos: pos + len(pairs)]; pos += len(pairs)
    ssems = refs[pos: pos + n_tab]; pos += n_tab
    isem = refs[pos]

    P = max(128 // dt, 1)
    C2 = C // P
    j = pl.program_id(0)

    def idma():
        return pltpu.make_async_copy(idx_hbm.at[pl.ds(j, 1)], ibuf, isem)

    idma().start()
    for g in gbufs:
        g[...] = jnp.zeros_like(g)
    lo = ulo_ref[j]
    n_chunks = ucnt_ref[j]
    lo2 = lo // P
    n2 = S // P

    def dma(t, slot, k):
        start2 = pl.multiple_of(jnp.minimum(lo2 + k * C2, n2 - C2), C2)
        return pltpu.make_async_copy(
            tabs[t].at[pl.ds(start2, C2), :], sbufs[t].at[slot],
            ssems[t].at[slot],
        )

    @pl.when(n_chunks > 0)
    def _():
        for t in range(n_tab):
            dma(t, 0, 0).start()

    idma().wait()
    iall = ibuf[0]  # [Ki_pad, BO] i32

    def body(k, _):
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < n_chunks)
        def _():
            for t in range(n_tab):
                dma(t, 1 - slot, k + 1).start()

        for t in range(n_tab):
            dma(t, slot, k).wait()
        start2 = jnp.minimum(lo2 + k * C2, n2 - C2)
        row2 = jax.lax.broadcasted_iota(jnp.int32, (C2, 1), 0) + start2
        # int-side re-read mask (sentinel -2; see _gather_kernel)
        row2 = jnp.where(row2 >= (lo2 + k * C2), row2, -2)
        for p in range(P):
            # one-hot per INDEX stream, shared across the tables it feeds
            ohs = {}
            for i in range(n_idx):
                idx = iall[i: i + 1, :]  # [1, BO]
                want = jnp.where(idx % P == p, idx // P, -1)
                ohs[i] = row2 == want  # [C2, BO] bool
            for g, (t, i, _w) in zip(gbufs, pairs):
                g[p] += jax.lax.dot_general(
                    ohs[i].astype(sbufs[t].dtype),
                    sbufs[t][slot],
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0, unroll=False)

    acc = None
    for g, (t, i, w) in zip(gbufs, pairs):
        tot = g[0][:, :dt]
        for p in range(1, P):
            tot = tot + g[p][:, p * dt: (p + 1) * dt]  # [BO, dt] f32
        if round_bf16:
            # match the projected path: each part's table was materialized
            # in bf16 before its (default-precision) projection matmul
            tot = tot.astype(jnp.bfloat16)
        y = jax.lax.dot_general(
            tot,
            w_ref[w * dt: (w + 1) * dt, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        acc = y if acc is None else acc + y
    if stream is not None:
        acc = acc + stream[...].astype(jnp.float32)
    out_ref[...] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("pairs", "has_stream", "interpret")
)
def _gproj_pallas(
    tables, idxs, ws, ulo, ucnt, stream=None, *, pairs, has_stream=False,
    interpret=False,
):
    """``sum_p tables[pairs[p][0]][idxs[pairs[p][1]]] @ ws[p]``
    (+ ``stream``), one union-window sweep. All tables share the source
    axis S and width dt; every W is [dt, K]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_tab = len(tables)
    n_idx = len(idxs)
    S, dt = tables[0].shape
    K = ws[0].shape[1]
    L = idxs[0].shape[0]
    P = max(128 // dt, 1)
    C2 = C // P
    n_blocks = L // BO
    dtype = tables[0].dtype
    prec = _precision(dtype)
    round_bf16 = dtype == jnp.bfloat16
    tabps = [t.reshape(S // P, P * dt) for t in tables]
    w_cat = jnp.concatenate(list(ws), axis=0)  # [n_pairs * dt, K]
    # pairs reference ws by position: normalize to (tab, idx, w_slot)
    pairs = tuple((t, i, k) for k, (t, i) in enumerate(pairs))
    Ki = -(-n_idx // 8) * 8  # sublane-multiple padding (see multi-gather)
    idx_all = jnp.stack(
        [i.reshape(n_blocks, BO) for i in idxs]
        + [jnp.zeros((n_blocks, BO), jnp.int32)] * (Ki - n_idx),
        axis=1,
    )  # [n_blocks, Ki, BO]
    in_specs = (
        [pl.BlockSpec(memory_space=pl.ANY)]  # idx_all
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in range(n_tab)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)]  # w_cat
    )
    operands = [idx_all] + tabps + [w_cat]
    if has_stream:
        in_specs.append(pl.BlockSpec((BO, K), lambda j, *_: (j, 0)))
        operands.append(stream)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BO, K), lambda j, *_: (j, 0)),
        scratch_shapes=(
            [pltpu.VMEM((2, C2, P * dt), dtype) for _ in range(n_tab)]
            + [pltpu.VMEM((1, Ki, BO), jnp.int32)]
            + [pltpu.VMEM((P, BO, P * dt), jnp.float32) for _ in pairs]
            + [pltpu.SemaphoreType.DMA((2,)) for _ in range(n_tab)]
            + [pltpu.SemaphoreType.DMA]
        ),
    )
    out_dtype = (
        stream.dtype if has_stream and stream is not None else dtype
    )
    vma_args = list(tables) + list(idxs) + list(ws)
    if has_stream and stream is not None:
        vma_args.append(stream)
    return pl.pallas_call(
        functools.partial(
            _gproj_kernel,
            n_tab=n_tab,
            n_idx=n_idx,
            pairs=pairs,
            S=S,
            dt=dt,
            K=K,
            has_stream=has_stream,
            prec=prec,
            round_bf16=round_bf16,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (L, K), out_dtype, vma=out_vma(*vma_args)
        ),
        interpret=interpret,
    )(ulo, ucnt, *operands)


def union_gather_plan(plans):
    """Union (chunk_lo, n_chunks) window over the plans' gather windows
    (``GatherPlan.g_lo/g_cnt`` units: row starts multiple of C, counts in
    C-chunks). Works on host numpy or device arrays (lean plans)."""
    lo, cnt = plans[0].g_lo, plans[0].g_cnt
    for p in plans[1:]:
        lo, cnt = stream_ops.union_block_plan(lo, cnt, p.g_lo, p.g_cnt)
    return jnp.asarray(lo), jnp.asarray(cnt)


def _bwd_sums(ct, idxs, plans, n_out):
    """Per-index segment sums of ``ct`` into [n_out, K] — the shared
    backward ingredient, via the pairing machinery in ``ops.scatter``
    (one two-output sweep when two kernel-eligible streams exist)."""
    from chgnet_tpu.ops.scatter import paired_cotangent_sums

    return paired_cotangent_sums(ct, plans, [n_out] * len(plans))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _gproj_op(tables, idxs, ws, upair, stream, plans, pairs):
    ulo, ucnt = upair
    return _gproj_pallas(
        tables, idxs, ws, ulo, ucnt, stream,
        pairs=pairs, has_stream=stream is not None,
    )


def _gproj_fwd(tables, idxs, ws, upair, stream, plans, pairs):
    # recurse through the custom op: higher-order autodiff differentiates
    # this fwd itself and the raw pallas_call has no JVP rule
    out = _gproj_op(tables, idxs, ws, upair, stream, plans, pairs)
    return out, (tables, idxs, ws, plans, stream is None)


def _gproj_bwd(pairs, res, ct):
    tables, idxs, ws, plans, no_stream = res
    S = tables[0].shape[0]
    # one segment sum of ct per DISTINCT index stream
    sums = _bwd_sums(ct, idxs, plans, S)
    d_tables = [None] * len(tables)
    d_ws = []
    for (t, i), w in zip(pairs, ws):
        # d T_t += S_i @ W^T ; d W = T_t^T @ S_i  (cheap [S,K] matmuls)
        s_i = sums[i]
        contrib = jax.lax.dot_general(
            s_i, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_precision(w.dtype),
        ).astype(tables[t].dtype)
        d_tables[t] = (
            contrib if d_tables[t] is None else d_tables[t] + contrib
        )
        d_ws.append(
            jax.lax.dot_general(
                tables[t], s_i, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_precision(w.dtype),
            ).astype(w.dtype)
        )
    d_tables = tuple(
        jnp.zeros_like(tb) if d is None else d
        for tb, d in zip(tables, d_tables)
    )
    return (d_tables, None, tuple(d_ws), None, None if no_stream else ct,
            None)


_gproj_op.defvjp(_gproj_fwd, _gproj_bwd)


def gproj_enabled() -> bool:
    return not os.environ.get("CHGNET_TPU_NO_GPROJ")


def gproj_eligible(parts, L: int) -> bool:
    """Trace-time gate: TPU backend, every WINDOWED part carries a v1
    gather window over one shared (source-axis, width, dtype) table
    group, >= 2 windowed references (else the plain path is already
    minimal), aligned parts stream-shaped."""
    if not (gproj_enabled() and stream_ops.tpu_backend() and L % BO == 0):
        return False
    n_win = 0
    shapes = set()
    for table, idx, plan in parts:
        if idx is None:
            if table.shape[0] != L:
                return False
            continue
        if plan is None or not stream_ops.stream_gather_ok(
            table, L, plan.g_lo
        ):
            return False
        if table.shape[1] not in (32, 64) and table.shape[1] % 128:
            return False
        shapes.add((table.shape[0], table.shape[1], table.dtype))
        n_win += 1
    return n_win >= 2 and len(shapes) == 1


def gather_project_sum(parts, ws, b1, aligned_w=None):
    """First-layer accumulator over raw tables:

        acc = sum_windowed T_p[idx_p] @ ws[p]
            + sum_aligned  A_k @ aligned_w[k]  (+ b1)

    ``parts``: [(table [S, dt] | aligned [L, da], idx [L] | None, plan)].
    ``ws``: per-WINDOWED-part weights [dt, K] (in parts order).
    ``aligned_w``: per-ALIGNED-part weights [da, K] (in parts order).
    The aligned projections and bias run outside the kernel (XLA fuses
    them into one matmul epilogue); the windowed parts ride ONE
    union-window kernel sweep. Callers must have checked
    :func:`gproj_eligible`."""
    win_tabs, win_idxs, win_plans, win_ws = [], [], [], []
    stream = None
    k_al = 0
    wi = 0
    for table, idx, plan in parts:
        if idx is None:
            proj = jnp.dot(
                table,
                aligned_w[k_al],
                precision=_precision(table.dtype),
            ).astype(table.dtype)
            k_al += 1
            stream = proj if stream is None else stream + proj
        else:
            win_tabs.append(table)
            win_idxs.append(idx)
            win_plans.append(plan)
            win_ws.append(ws[wi])
            wi += 1
    if b1 is not None:
        stream = b1.astype(stream.dtype) + stream if stream is not None \
            else jnp.broadcast_to(b1, (win_idxs[0].shape[0], b1.shape[0]))
    # deduplicate tables (object identity) and index streams (identity)
    tab_ids: list = []
    tab_map = []
    for t in win_tabs:
        for k, t2 in enumerate(tab_ids):
            if t is t2:
                tab_map.append(k)
                break
        else:
            tab_map.append(len(tab_ids))
            tab_ids.append(t)
    idx_ids: list = []
    idx_map = []
    plan_by_idx: list = []
    for i, p in zip(win_idxs, win_plans):
        for k, i2 in enumerate(idx_ids):
            if i is i2:
                idx_map.append(k)
                break
        else:
            idx_map.append(len(idx_ids))
            idx_ids.append(i)
            plan_by_idx.append(p)
    pairs = tuple(zip(tab_map, idx_map))
    upair = union_gather_plan([plan_by_idx[k] for k in set(idx_map)])
    return _gproj_op(
        tuple(tab_ids),
        tuple(idx_ids),
        tuple(win_ws),
        upair,
        stream,
        tuple(plan_by_idx),
        pairs,
    )
