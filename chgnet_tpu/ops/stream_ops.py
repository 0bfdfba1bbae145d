"""Streaming Pallas kernels for SORTED gather/segment-sum streams.

XLA's TPU gather/scatter emitter processes ~one row per step (~15 ns/row
measured on v5e: a [808k,128] bf16 sorted segment-sum runs at ~12 GB/s
physical, two orders below HBM). But every hot scatter in this model is a
SORTED segment sum (``ops/scatter.py`` plans guarantee it), and a sorted
stream needs no scatter at all: input rows for each output block form a
contiguous range. The kernel streams input chunks HBM->VMEM with
double-buffered DMA and reduces each chunk with a one-hot MXU matmul

    acc[BO, d] += (iota[BO,1] == dst[1,C]) @ x[C, d]

so the whole op is sequential DMA + a few matmul FLOPs — no per-row
control flow anywhere. Out-of-block and padding rows (dst out of range)
match no one-hot row and drop out for free, which also makes the
chunk-alignment overlap at stream tails self-masking.

The reference hits the same wall through torch ``index_add_``
(``/root/reference/chgnet/model/functions.py:10-40``); this kernel is the
TPU-native answer.

Host-side: ``build_block_plan`` precomputes, per output block, the first
input chunk and chunk count (numpy searchsorted over the sorted dst ids —
the ids are host-built batch constants, so this is free at trace time).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

import os

C = int(os.environ.get("CHGNET_TPU_STREAM_C", 512))  # input chunk rows per DMA
BO = int(os.environ.get("CHGNET_TPU_STREAM_BO", 512))  # output block rows per grid step

# Block-local ("raw") plans are accepted when their chunk-visit total is
# within this factor of the minimal sequential pass (ops/scatter.py
# gates on it; the v2 kernel sizes its STATIC visit capacity from the
# same constant — keep them tied or v2 silently drops visits).
LOCAL_VISIT_FACTOR = 3.0


def out_vma(*arrays) -> frozenset:
    """Union of the operands' varying-mesh-axes. Pallas outputs must
    declare ``vma`` on their ShapeDtypeStruct when the call is traced
    inside ``shard_map(check_vma=True)`` (the sharded paths run the
    kernels per device); outside shard_map this is the empty set and a
    no-op. CPU tests cannot catch a missing vma — the kernels gate off
    the CPU backend — so every pallas wrapper here threads it."""
    vma: frozenset = frozenset()
    for a in arrays:
        v = getattr(jax.typeof(a), "vma", None)
        if v:
            vma |= v
    return vma


def tpu_backend() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - backend probing
        return False


def build_block_plan(
    dst: np.ndarray, n_out: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per output block of ``BO`` rows: first input chunk start (multiple
    of ``C``) and number of ``C``-chunks overlapping the block's input
    range. ``dst`` must be sorted with padding mapped >= ``n_out``
    (the padded tail is excluded from every block's range)."""
    dst = np.asarray(dst)
    n_blocks = -(-n_out // BO)
    # match the key dtype: a mixed-dtype searchsorted silently PROMOTES
    # (i.e. copies) the whole sorted array per call — ~0.2 s per call on
    # 10M-row streams
    edges = np.minimum(np.arange(n_blocks + 1) * BO, n_out).astype(dst.dtype)
    bounds = np.searchsorted(dst, edges, side="left")
    starts, ends = bounds[:-1], bounds[1:]
    chunk_lo = (starts // C) * C
    n_chunks = np.where(ends > starts, -(-(ends - chunk_lo) // C), 0)
    return chunk_lo.astype(np.int32), n_chunks.astype(np.int32)


def build_block_plan_local(
    key: np.ndarray,  # [L] UNSORTED destination ids, padding >= n_out
    perm: np.ndarray,  # [L] stable argsort of key (reused from GatherPlan)
    n_out: int,
) -> tuple[np.ndarray, np.ndarray, int]:
    """Block plan over an UNSORTED destination stream.

    For each output block, covers the contiguous chunk RANGE
    [min row, max row] whose rows land in the block — correct for any
    order (the kernel's one-hot match drops out-of-block rows for free),
    and cheap when the stream is block-local (graph-sorted batches are:
    rows targeting one output block come from a few graphs' contiguous
    stream segments). Returns ``(chunk_lo, n_chunks, total_visits)`` so
    the caller can cost it against the sorted-permutation path.
    """
    key = np.asarray(key)
    n_blocks = -(-n_out // BO)
    key_sorted = key[perm]
    n_valid = int(
        np.searchsorted(key_sorted, key.dtype.type(n_out), side="left")
    )
    edges = np.minimum(np.arange(n_blocks + 1) * BO, n_out).astype(key.dtype)
    bounds = np.searchsorted(key_sorted, edges, side="left")
    starts, ends = bounds[:-1], np.minimum(bounds[1:], n_valid)
    chunk_lo = np.zeros(n_blocks, np.int64)
    n_chunks = np.zeros(n_blocks, np.int64)
    nonempty = ends > starts
    if nonempty.any():
        pv = perm[:n_valid]
        # min/max original row per block via reduceat over the sorted view
        s = starts[nonempty]
        lo_rows = np.minimum.reduceat(pv, s)
        hi_rows = np.maximum.reduceat(pv, s)
        # reduceat segments run to the next start (or array end): trim
        # each to its own block by re-reducing is unnecessary — starts of
        # CONSECUTIVE nonempty blocks partition pv exactly, and the final
        # segment ends at n_valid by construction of pv.
        chunk_lo[nonempty] = (lo_rows // C) * C
        n_chunks[nonempty] = -(-(hi_rows + 1 - chunk_lo[nonempty]) // C)
    return (
        chunk_lo.astype(np.int32),
        n_chunks.astype(np.int32),
        int(n_chunks.sum()),
    )


def _segsum_kernel(chunk_lo_ref, n_chunks_ref, dstp_ref, xp_hbm, out_ref,
                   xbuf, dbuf, acc, xsem, dsem, *, n_rows, d, prec):
    """One output block of BO rows. Packed layout: P = 128 // d logical
    rows per 128-lane physical row, so every DMA slice is lane-aligned
    (Mosaic requires minor dims in multiples of 128). ``xp_hbm`` is
    ``x.reshape(L // P, P * d)``; ``dstp_ref`` is ``dst`` as [P, L // P].
    Chunk geometry: C logical rows == C2 = C // P packed rows per DMA."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P = max(128 // d, 1)
    C2 = C // P
    j = pl.program_id(0)
    acc[...] = jnp.zeros_like(acc)
    lo = chunk_lo_ref[j]  # logical row, multiple of C
    n_chunks = n_chunks_ref[j]
    lo2 = lo // P
    n2 = n_rows // P

    def dmas(slot, k):
        start2 = pl.multiple_of(jnp.minimum(lo2 + k * C2, n2 - C2), C2)
        return (
            pltpu.make_async_copy(
                xp_hbm.at[pl.ds(start2, C2), :], xbuf.at[slot], xsem.at[slot]
            ),
            pltpu.make_async_copy(
                dstp_ref.at[:, pl.ds(start2, C2)], dbuf.at[slot], dsem.at[slot]
            ),
        )

    @pl.when(n_chunks > 0)
    def _():
        for dma in dmas(0, 0):
            dma.start()

    def body(k, _):
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < n_chunks)
        def _():
            for dma in dmas(1 - slot, k + 1):
                dma.start()

        for dma in dmas(slot, k):
            dma.wait()

        start2 = jnp.minimum(lo2 + k * C2, n2 - C2)
        # tail chunks re-read earlier rows; mask them out of the one-hot
        row_ok = (
            jax.lax.broadcasted_iota(jnp.int32, (1, C2), 1) + start2
        ) >= (lo2 + k * C2)
        iota = jax.lax.broadcasted_iota(jnp.int32, (BO, 1), 0)
        for p in range(P):
            local = jnp.where(row_ok, dbuf[slot][p : p + 1, :] - j * BO, -1)
            onehot = (iota == local).astype(xbuf.dtype)  # [BO, C2]
            acc[p] += jax.lax.dot_general(
                onehot,
                xbuf[slot],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0, unroll=False)
    # each packed lane group [p*d:(p+1)*d] of acc[p] holds the sums of
    # logical rows with (row % P) == p; combine once per block
    total = acc[0][:, :d]
    for p in range(1, P):
        total = total + acc[p][:, p * d : (p + 1) * d]
    out_ref[...] = total.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_out", "interpret"))
def _segsum_pallas(x, dst, chunk_lo, n_chunks, *, n_out, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_rows, d = x.shape
    if d < 128 and 128 % d:
        raise ValueError(f"feature dim {d} must divide 128")
    if d > 128 and d % 128:
        raise ValueError(f"wide feature dim {d} must be a multiple of 128")
    P = max(128 // d, 1)
    C2 = C // P
    n_blocks = -(-n_out // BO)
    # exact f32 sums need full-precision MXU passes (default TPU matmul
    # precision is one bf16 pass, which would quantize every summand);
    # bf16 streams are exact either way and the op is DMA-bound
    prec = (
        jax.lax.Precision.HIGHEST
        if x.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    xp = x.reshape(n_rows // P, P * d)
    dstp = dst.reshape(n_rows // P, P).T  # [P, L // P]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # dstp [P, L // P]
            pl.BlockSpec(memory_space=pl.ANY),  # xp [L // P, 128]
        ],
        out_specs=pl.BlockSpec((BO, d), lambda j, *_: (j, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, C2, P * d), x.dtype),
            pltpu.VMEM((2, P, C2), jnp.int32),
            pltpu.VMEM((P, BO, P * d), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_segsum_kernel, n_rows=n_rows, d=d, prec=prec),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_out, d), x.dtype, vma=out_vma(x, dst)
        ),
        interpret=interpret,
    )(chunk_lo, n_chunks, dstp, xp)


def _segsum2_kernel(chunk_lo_ref, n_chunks_ref, dap_ref, dbp_ref, xp_hbm,
                    out_a_ref, out_b_ref, xbuf, abuf, bbuf, acc_a, acc_b,
                    xsem, asem, bsem, *, n_rows, d, prec):
    """TWO segment sums over ONE input sweep (see ``_segsum_kernel``):
    the union chunk range serves two key streams — e.g. the dir_i and
    dir_j cotangent reductions of the angle stream, whose per-block
    ranges overlap almost completely (both lie within the block's
    centers' edge spans). One extra one-hot matmul and a 4-byte-per-row
    key DMA replace an entire second pass over ``x``."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P = max(128 // d, 1)
    C2 = C // P
    j = pl.program_id(0)
    acc_a[...] = jnp.zeros_like(acc_a)
    acc_b[...] = jnp.zeros_like(acc_b)
    lo = chunk_lo_ref[j]  # logical row, multiple of C
    n_chunks = n_chunks_ref[j]
    lo2 = lo // P
    n2 = n_rows // P

    def dmas(slot, k):
        start2 = pl.multiple_of(jnp.minimum(lo2 + k * C2, n2 - C2), C2)
        return (
            pltpu.make_async_copy(
                xp_hbm.at[pl.ds(start2, C2), :], xbuf.at[slot], xsem.at[slot]
            ),
            pltpu.make_async_copy(
                dap_ref.at[:, pl.ds(start2, C2)], abuf.at[slot], asem.at[slot]
            ),
            pltpu.make_async_copy(
                dbp_ref.at[:, pl.ds(start2, C2)], bbuf.at[slot], bsem.at[slot]
            ),
        )

    @pl.when(n_chunks > 0)
    def _():
        for dma in dmas(0, 0):
            dma.start()

    def body(k, _):
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < n_chunks)
        def _():
            for dma in dmas(1 - slot, k + 1):
                dma.start()

        for dma in dmas(slot, k):
            dma.wait()

        start2 = jnp.minimum(lo2 + k * C2, n2 - C2)
        # tail chunks re-read earlier rows; mask them out of the one-hot
        row_ok = (
            jax.lax.broadcasted_iota(jnp.int32, (1, C2), 1) + start2
        ) >= (lo2 + k * C2)
        iota = jax.lax.broadcasted_iota(jnp.int32, (BO, 1), 0)
        for p in range(P):
            la = jnp.where(row_ok, abuf[slot][p : p + 1, :] - j * BO, -1)
            acc_a[p] += jax.lax.dot_general(
                (iota == la).astype(xbuf.dtype),
                xbuf[slot],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )
            lb = jnp.where(row_ok, bbuf[slot][p : p + 1, :] - j * BO, -1)
            acc_b[p] += jax.lax.dot_general(
                (iota == lb).astype(xbuf.dtype),
                xbuf[slot],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0, unroll=False)
    ta = acc_a[0][:, :d]
    tb = acc_b[0][:, :d]
    for p in range(1, P):
        ta = ta + acc_a[p][:, p * d : (p + 1) * d]
        tb = tb + acc_b[p][:, p * d : (p + 1) * d]
    out_a_ref[...] = ta.astype(out_a_ref.dtype)
    out_b_ref[...] = tb.astype(out_b_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_out", "interpret"))
def _segsum2_pallas(x, dst_a, dst_b, chunk_lo, n_chunks, *, n_out,
                    interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_rows, d = x.shape
    if d < 128 and 128 % d:
        raise ValueError(f"feature dim {d} must divide 128")
    if d > 128 and d % 128:
        raise ValueError(f"wide feature dim {d} must be a multiple of 128")
    P = max(128 // d, 1)
    C2 = C // P
    n_blocks = -(-n_out // BO)
    prec = (
        jax.lax.Precision.HIGHEST
        if x.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    xp = x.reshape(n_rows // P, P * d)
    dap = dst_a.reshape(n_rows // P, P).T  # [P, L // P]
    dbp = dst_b.reshape(n_rows // P, P).T
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # dap [P, L // P]
            pl.BlockSpec(memory_space=pl.ANY),  # dbp [P, L // P]
            pl.BlockSpec(memory_space=pl.ANY),  # xp [L // P, 128]
        ],
        out_specs=[
            pl.BlockSpec((BO, d), lambda j, *_: (j, 0)),
            pl.BlockSpec((BO, d), lambda j, *_: (j, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, C2, P * d), x.dtype),
            pltpu.VMEM((2, P, C2), jnp.int32),
            pltpu.VMEM((2, P, C2), jnp.int32),
            pltpu.VMEM((P, BO, P * d), jnp.float32),
            pltpu.VMEM((P, BO, P * d), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    vma = out_vma(x, dst_a, dst_b)
    shape = jax.ShapeDtypeStruct((n_out, d), x.dtype, vma=vma)
    return pl.pallas_call(
        functools.partial(_segsum2_kernel, n_rows=n_rows, d=d, prec=prec),
        grid_spec=grid_spec,
        out_shape=[shape, shape],
        interpret=interpret,
    )(chunk_lo, n_chunks, dap, dbp, xp)


def union_block_plan(lo_a, cnt_a, lo_b, cnt_b):
    """Per-output-block chunk range covering BOTH block plans (empty
    blocks do not extend the union). Inputs may be host numpy or device
    arrays (lean-shipped plans); chunk starts are multiples of ``C``."""
    big = 2 ** 30
    lo_ae = jnp.where(cnt_a > 0, lo_a, big)
    lo_be = jnp.where(cnt_b > 0, lo_b, big)
    hi = jnp.maximum(
        jnp.where(cnt_a > 0, lo_a + cnt_a * C, 0),
        jnp.where(cnt_b > 0, lo_b + cnt_b * C, 0),
    )
    lo = jnp.minimum(lo_ae, lo_be)
    cnt = jnp.maximum(hi - jnp.minimum(lo, hi), 0) // C
    lo = jnp.where(cnt > 0, lo, 0)
    return lo.astype(jnp.int32), cnt.astype(jnp.int32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def segment_sum_pair(x, dst_a, dst_b, ulo, ucnt, aux_a, aux_b, n_out,
                     raw_a=False, raw_b=False):
    """Two segment sums of ``x`` (same ``n_out``) in ONE streaming sweep.

    ``dst_a``/``dst_b`` are row-aligned key streams (padding >= n_out);
    ``(ulo, ucnt)`` their union block plan (:func:`union_block_plan`);
    ``aux_* = (blk_lo, blk_cnt, g_lo, g_cnt, pw)`` each stream's OWN plan
    fields, used by the backward's per-stream ``ct[dst]`` expansions.
    ``raw_*`` mark unsorted block-local streams (see
    :func:`segment_sum_sorted`). Differentiable to arbitrary order via
    the expand_rows/segment_sum_sorted custom-vjp recursion."""
    return tuple(_segsum2_pallas(x, dst_a, dst_b, ulo, ucnt, n_out=n_out))


def _segsum_pair_fwd(x, dst_a, dst_b, ulo, ucnt, aux_a, aux_b, n_out,
                     raw_a=False, raw_b=False):
    # recurse through the custom op (higher-order autodiff differentiates
    # this fwd itself; the raw pallas_call has no JVP rule)
    out = segment_sum_pair(
        x, dst_a, dst_b, ulo, ucnt, aux_a, aux_b, n_out, raw_a, raw_b
    )
    return out, (dst_a, dst_b, aux_a, aux_b)


def _segsum_pair_bwd(n_out, raw_a, raw_b, res, cts):
    dst_a, dst_b, aux_a, aux_b = res
    ct_a, ct_b = cts
    d_x = expand_rows(
        ct_a, dst_a, *aux_a, n_out, raw_a
    ) + expand_rows(ct_b, dst_b, *aux_b, n_out, raw_b)
    return (d_x, None, None, None, None, None, None)


segment_sum_pair.defvjp(_segsum_pair_fwd, _segsum_pair_bwd)


def _segsum_impl(x, dst, blk_lo, blk_cnt, n_out, raw_mode):
    """Kernel selector. Measured round 4 (bench-scale, one v5e):
    narrow streams (d < 128) run ~27% faster on the v2 input-stationary
    pipelined kernel — it consumes (C, d) blocks directly where v1 must
    P-pack rows into 128-lane pairs — while at d = 128 the two are equal
    (both ~80% of the pipelined-copy ceiling; per-grid-step overhead
    dominates, so v2's finer blocks buy nothing). Keep v1 for full-width
    streams, v2 for narrow ones; CHGNET_TPU_NO_STREAM_V2 kills v2."""
    if stream_v2_enabled() and x.shape[1] < 128:
        if raw_mode and isinstance(blk_cnt, np.ndarray):
            # v2's raw-mode visit capacity is STATIC (LOCAL_VISIT_FACTOR
            # x the minimal pass, mirroring make_plan's gate). A plan
            # built elsewhere can exceed it; visits past capacity get no
            # slots and their blocks would never flush — wrong sums with
            # no error. Raw plans are host numpy in practice, so check
            # here (trace time) and keep such streams on v1.
            need = int(np.maximum(blk_cnt, 1).sum())
            n_blocks = -(-n_out // BO)
            cap = int(LOCAL_VISIT_FACTOR * (x.shape[0] // C)) + 16
            if need > cap + n_blocks:
                return _segsum_pallas(x, dst, blk_lo, blk_cnt, n_out=n_out)
        return _segsum_v2_pallas(
            x, dst, blk_lo, blk_cnt, n_out=n_out, raw_mode=raw_mode
        )
    return _segsum_pallas(x, dst, blk_lo, blk_cnt, n_out=n_out)


V2_BO = int(os.environ.get("CHGNET_TPU_STREAM_V2_BO", 512))


def _device_block_plan(dst, n_out: int, bo: int):
    """Per-``bo``-row output block chunk ranges of a SORTED dst stream,
    computed ON DEVICE (a searchsorted over [n_blocks] keys — the finer
    v2 grain needs no host plan; padding >= n_out sits at the tail)."""
    n_blocks = -(-n_out // bo)
    edges = jnp.minimum(
        jnp.arange(n_blocks + 1, dtype=jnp.int32) * bo, n_out
    ).astype(dst.dtype)
    bounds = jnp.searchsorted(dst, edges, side="left").astype(jnp.int32)
    starts, ends = bounds[:-1], bounds[1:]
    chunk_lo = (starts // C) * C
    cnt = jnp.where(
        ends > starts, (ends - chunk_lo + C - 1) // C, 0
    )
    return chunk_lo.astype(jnp.int32), cnt.astype(jnp.int32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 8))
def segment_sum_sorted(
    x: jnp.ndarray,
    dst: jnp.ndarray,  # [L] block-plannable, padding >= n_out
    blk_lo: jnp.ndarray,  # [ceil(n_out/BO)] from build_block_plan[_local]
    blk_cnt: jnp.ndarray,
    n_out: int,
    g_lo: jnp.ndarray | None = None,  # optional gather-window plan over
    g_cnt: jnp.ndarray | None = None,  # dst (GatherPlan.g_lo/g_cnt)
    pw: jnp.ndarray | None = None,  # paired-window plan over dst (v2)
    raw_mode: bool = False,  # dst is an UNSORTED block-local stream
) -> jnp.ndarray:
    """Segment sum via the streaming kernel.

    Caller guarantees: ``(blk_lo, blk_cnt)`` is a block plan covering all
    rows of ``dst`` with values ``< n_out`` (sorted streams via
    :func:`build_block_plan`, block-local unsorted streams via
    :func:`build_block_plan_local`), padded rows map ``>= n_out``, and
    ``x.shape[0] % C == 0`` (graph batching aligns stream capacities; see
    ``graph/batching.py``). Differentiable in ``x`` (training does
    grad-of-grad through the force backward).

    ``g_lo``/``g_cnt``, when given, are the forward-GATHER window plan of
    the same index stream (``GatherPlan.g_lo/g_cnt``): the backward's
    ``ct[dst]`` expansion then rides the streaming window-gather kernel
    instead of XLA's row-at-a-time gather. Rows outside their window —
    only padded rows, whose clipped index may fall anywhere — are zeroed
    by the kernel or the trailing validity mask either way.
    """
    return _segsum_impl(x, dst, blk_lo, blk_cnt, n_out, raw_mode)


def _segsum_sorted_fwd(
    x, dst, blk_lo, blk_cnt, n_out, g_lo=None, g_cnt=None, pw=None,
    raw_mode=False,
):
    # recurse through the custom op (NOT the raw pallas_call): higher-order
    # autodiff differentiates this fwd function itself, and the
    # scalar-prefetch pallas_call has no JVP rule — the recursive call
    # keeps every order inside custom-vjp ops
    out = segment_sum_sorted(
        x, dst, blk_lo, blk_cnt, n_out, g_lo, g_cnt, pw, raw_mode
    )
    return out, (dst, blk_lo, blk_cnt, g_lo, g_cnt, pw)


def _segsum_sorted_bwd(n_out, raw_mode, res, ct):
    # d x[i] = ct[dst[i]]; dropped rows (dst >= n_out) get zero. Routed
    # through expand_rows (a custom-vjp op) so grad-of-grad — the force
    # training path differentiates this backward — sees a transpose rule
    # (the raw _gather_pallas pallas_call has none).
    dst, blk_lo, blk_cnt, g_lo, g_cnt, pw = res
    d_x = expand_rows(
        ct, dst, blk_lo, blk_cnt, g_lo, g_cnt, pw, n_out, raw_mode
    )
    return (d_x, None, None, None, None, None, None)


segment_sum_sorted.defvjp(_segsum_sorted_fwd, _segsum_sorted_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def expand_rows(ct, dst, blk_lo, blk_cnt, g_lo, g_cnt, pw, n_out,
                raw_mode=False):
    """``ct[dst]`` with dropped rows (``dst >= n_out``) zeroed — the
    transpose of a segment sum by ``dst``. The forward rides the
    streaming window-gather kernel when ``g_lo`` carries a window plan;
    the custom vjp closes the recursion for arbitrary-order autodiff:
    this op's transpose is :func:`segment_sum_sorted` over the SAME block
    plan, whose transpose is this op again. ``raw_mode`` marks ``dst``
    as an unsorted block-local stream (sizes the transpose's v2 visit
    capacity)."""
    safe = jnp.minimum(dst, n_out - 1)
    if stream_gather_v2_ok(ct, dst.shape[0], pw):
        d_x = _gather_v2_pallas(ct, safe, pw)
    elif stream_gather_ok(ct, dst.shape[0], g_lo):
        d_x = _gather_pallas(ct, safe, g_lo, g_cnt)
    else:
        d_x = jnp.take(ct, safe, axis=0)
    return jnp.where((dst < n_out)[:, None], d_x, 0).astype(ct.dtype)


def _expand_rows_fwd(ct, dst, blk_lo, blk_cnt, g_lo, g_cnt, pw, n_out,
                     raw_mode=False):
    out = expand_rows(
        ct, dst, blk_lo, blk_cnt, g_lo, g_cnt, pw, n_out, raw_mode
    )
    return out, (dst, blk_lo, blk_cnt, g_lo, g_cnt, pw)


def _expand_rows_bwd(n_out, raw_mode, res, g):
    dst, blk_lo, blk_cnt, g_lo, g_cnt, pw = res
    if stream_segsum_ok(g, blk_lo, n_out):
        d_ct = segment_sum_sorted(
            g, dst, blk_lo, blk_cnt, n_out, g_lo, g_cnt, pw, raw_mode
        )
    else:
        # dst may be the RAW (unsorted) key stream of a block-local plan:
        # never claim sortedness here (XLA exploits the hint on TPU)
        d_ct = jax.ops.segment_sum(g, dst, n_out)
    return (d_ct, None, None, None, None, None, None)


expand_rows.defvjp(_expand_rows_fwd, _expand_rows_bwd)


def build_gather_plan(
    idx: np.ndarray,  # [L] source-row ids per stream row
    valid: np.ndarray,  # [L] bool, False rows are ignored (masked later)
    n_src: int,
) -> tuple[np.ndarray, np.ndarray, int] | None:
    """Per stream block of ``BO`` rows: the source chunk window
    [chunk_lo, chunk_lo + n_chunks * C) covering every VALID row's index.
    Returns ``(chunk_lo, n_chunks, total_visits)`` — or None when the
    stream is not kernel-aligned. The caller cost-gates on total_visits
    (a window-LOCAL stream visits ~1-2 chunks per block; a random stream
    would visit the whole table and must stay on XLA's gather)."""
    idx = np.asarray(idx)
    L = idx.shape[0]
    if L == 0 or L % BO or n_src < C:
        return None
    # the kernels' int-side re-read mask (sentinel -2) requires
    # non-negative indices: an index in [-2P, -P-1] would alias a masked
    # re-read row and silently gather a wrong row (see _gather_kernel)
    ok_rows = np.asarray(valid)
    if (idx[ok_rows] < 0).any():
        raise ValueError("gather-plan indices must be non-negative")
    # int64 throughout: a max-int sentinel would WRAP to -1 under numpy's
    # weak promotion against an int32 block array
    blocks = idx.reshape(-1, BO).astype(np.int64)
    ok = np.asarray(valid).reshape(-1, BO)
    lo = np.where(ok, blocks, np.iinfo(np.int64).max).min(axis=1)
    hi = np.where(ok, blocks, -1).max(axis=1)
    empty = hi < 0
    lo = np.where(empty, 0, lo)
    hi = np.where(empty, 0, hi)
    chunk_lo = (lo // C) * C
    n_chunks = np.where(empty, 0, -(-(hi + 1 - chunk_lo) // C))
    return (
        chunk_lo.astype(np.int32),
        n_chunks.astype(np.int32),
        int(n_chunks.sum()),
    )


def _gather_kernel(chunk_lo_ref, n_chunks_ref, idxb_hbm, src_hbm, out_ref,
                   sbuf, ibuf, acc, ssem, isem, *, n_src, d, prec):
    """One output block of BO gathered rows: DMA the block's source chunk
    window HBM->VMEM (double-buffered) and expand rows with one-hot MXU
    matmuls — the exact dual of ``_segsum_kernel``. Rows whose index
    falls outside the window (only masked/padded rows, by plan
    construction) come out zero. PRECONDITION: gather indices are
    non-negative (enforced by ``build_gather_plan``) — the re-read mask
    uses sentinel -2 on the int side, so an index in [-2P, -P-1] would
    alias a masked re-read row and silently gather a wrong row.
    The block's [1, BO] index row rides a
    small DMA (a blocked (1, BO) spec fails Mosaic's sublane-multiple-
    of-8 rule; same reason ``_segsum_kernel`` DMAs ``dstp``)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P = max(128 // d, 1)
    C2 = C // P
    j = pl.program_id(0)

    def idma():
        # idxb rides as [n_blocks, 1, BO]: a dim-0 slice of a >=3-D
        # memref needs no sublane alignment (a [n_blocks, BO] row slice
        # would need the sliced dim to be a multiple of the 8-row tile)
        return pltpu.make_async_copy(
            idxb_hbm.at[pl.ds(j, 1)], ibuf, isem
        )

    idma().start()
    acc[...] = jnp.zeros_like(acc)
    lo = chunk_lo_ref[j]
    n_chunks = n_chunks_ref[j]
    lo2 = lo // P
    n2 = n_src // P

    def dma(slot, k):
        start2 = pl.multiple_of(jnp.minimum(lo2 + k * C2, n2 - C2), C2)
        return pltpu.make_async_copy(
            src_hbm.at[pl.ds(start2, C2), :], sbuf.at[slot], ssem.at[slot]
        )

    @pl.when(n_chunks > 0)
    def _():
        dma(0, 0).start()

    idma().wait()
    idx = ibuf[0]  # [1, BO] i32 source-row ids (lane orientation)

    def body(k, _):
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < n_chunks)
        def _():
            dma(1 - slot, k + 1).start()

        dma(slot, k).wait()
        start2 = jnp.minimum(lo2 + k * C2, n2 - C2)
        # tail chunks re-read earlier source rows; a row would match twice
        # (earlier chunk + re-read) without masking the re-read range out,
        # exactly like the segsum kernel. The one-hot rides TRANSPOSED
        # [C2, BO] so both operands stay in natural lane orientation (iota
        # on sublanes, idx block on lanes) — no Mosaic transposes; the
        # matmul contracts the sublane dim.
        row2 = jax.lax.broadcasted_iota(jnp.int32, (C2, 1), 0) + start2
        # mask re-read rows on the INT side (sentinel -2 so they can't
        # match the -1 wrong-lane sentinel in `want`); a bool
        # jnp.where here lowers to an i8->i1 trunci Mosaic rejects
        row2 = jnp.where(row2 >= (lo2 + k * C2), row2, -2)
        for p in range(P):
            want = jnp.where(idx % P == p, idx // P, -1)  # [1, BO]
            onehot_t = (row2 == want).astype(sbuf.dtype)  # [C2, BO]
            acc[p] += jax.lax.dot_general(
                onehot_t,
                sbuf[slot],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0, unroll=False)
    total = acc[0][:, :d]
    for p in range(1, P):
        total = total + acc[p][:, p * d : (p + 1) * d]
    out_ref[...] = total.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gather_pallas(src, idx, chunk_lo, n_chunks, *, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_src, d = src.shape
    L = idx.shape[0]
    P = max(128 // d, 1)
    C2 = C // P
    n_blocks = L // BO
    prec = (
        jax.lax.Precision.HIGHEST
        if src.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    srcp = src.reshape(n_src // P, P * d)
    idxb = idx.reshape(n_blocks, 1, BO)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # idxb [n_blocks, BO]
            pl.BlockSpec(memory_space=pl.ANY),  # srcp [S // P, P * d]
        ],
        out_specs=pl.BlockSpec((BO, d), lambda j, *_: (j, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, C2, P * d), src.dtype),
            pltpu.VMEM((1, 1, BO), jnp.int32),
            pltpu.VMEM((P, BO, P * d), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_gather_kernel, n_src=n_src, d=d, prec=prec),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (L, d), src.dtype, vma=out_vma(src, idx)
        ),
        interpret=interpret,
    )(chunk_lo, n_chunks, idxb, srcp)


def _multi_gather_kernel(*refs, K, has_stream, n_srcs, d, prec):
    """One output block of BO rows: the SUM of K window-gathered parts
    (each the exact body of ``_gather_kernel``) plus an optional aligned
    stream block. Fusing the K gathers removes the K-1 materialized
    [L, d] intermediates and their add passes — pallas_call boundaries
    block XLA fusion, so the unfused form pays ~2(K-1) extra HBM passes
    over the stream axis per call."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # refs layout (after 2K scalar-prefetch args):
    #   [chunk_lo_k, n_chunks_k] * K,
    #   idx_all [n_blocks, K, BO] (HBM), [srcp_k] * K, (stream block?),
    #   out, [sbuf_k] * K, ibuf, acc, [ssem_k] * K, isem
    scalars = refs[: 2 * K]
    pos = 2 * K
    idx_hbm = refs[pos]; pos += 1
    srcs = refs[pos: pos + K]; pos += K
    stream = None
    if has_stream:
        stream = refs[pos]; pos += 1
    out_ref = refs[pos]; pos += 1
    sbufs = refs[pos: pos + K]; pos += K
    ibuf = refs[pos]; pos += 1
    acc = refs[pos]; pos += 1
    ssems = refs[pos: pos + K]; pos += K
    isem = refs[pos]

    P = max(128 // d, 1)
    C2 = C // P
    j = pl.program_id(0)

    def idma():
        return pltpu.make_async_copy(
            idx_hbm.at[pl.ds(j, 1)], ibuf, isem
        )

    idma().start()
    acc[...] = jnp.zeros_like(acc)
    idma().wait()
    iall = ibuf[0]  # [K, BO] i32 source-row ids (lane orientation)

    for k in range(K):
        lo = scalars[2 * k][j]
        n_chunks = scalars[2 * k + 1][j]
        lo2 = lo // P
        n2 = n_srcs[k] // P
        idx = iall[k : k + 1, :]  # [1, BO]
        src_hbm = srcs[k]
        sbuf = sbufs[k]
        ssem = ssems[k]

        def dma(slot, step, lo2=lo2, n2=n2, src_hbm=src_hbm, sbuf=sbuf,
                ssem=ssem):
            start2 = pl.multiple_of(
                jnp.minimum(lo2 + step * C2, n2 - C2), C2
            )
            return pltpu.make_async_copy(
                src_hbm.at[pl.ds(start2, C2), :], sbuf.at[slot],
                ssem.at[slot],
            )

        @pl.when(n_chunks > 0)
        def _():
            dma(0, 0).start()

        def body(step, _, lo2=lo2, n2=n2, idx=idx, dma=dma, sbuf=sbuf):
            slot = jax.lax.rem(step, 2)

            @pl.when(step + 1 < n_chunks)
            def _():
                dma(1 - slot, step + 1).start()

            dma(slot, step).wait()
            start2 = jnp.minimum(lo2 + step * C2, n2 - C2)
            row2 = jax.lax.broadcasted_iota(jnp.int32, (C2, 1), 0) + start2
            # int-side re-read mask; see _gather_kernel
            row2 = jnp.where(row2 >= (lo2 + step * C2), row2, -2)
            for p in range(P):
                want = jnp.where(idx % P == p, idx // P, -1)  # [1, BO]
                onehot_t = (row2 == want).astype(sbuf.dtype)  # [C2, BO]
                acc[p] += jax.lax.dot_general(
                    onehot_t,
                    sbuf[slot],
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )
            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0, unroll=False)

    total = acc[0][:, :d]
    for p in range(1, P):
        total = total + acc[p][:, p * d : (p + 1) * d]
    if stream is not None:
        total = total + stream[...].astype(jnp.float32)
    out_ref[...] = total.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("has_stream", "interpret")
)
def _multi_gather_pallas(
    srcs, idxs, chunk_los, chunk_cnts, stream=None, *,
    has_stream=False, interpret=False,
):
    """Fused sum of K streaming window-gathers (+ optional aligned
    stream): ``sum_k srcs[k][idxs[k]] (+ stream)``. All parts share the
    feature width; every part needs a window plan."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K = len(srcs)
    n_rows, d = srcs[0].shape
    L = idxs[0].shape[0]
    P = max(128 // d, 1)
    C2 = C // P
    n_blocks = L // BO
    dtype = srcs[0].dtype
    prec = (
        jax.lax.Precision.HIGHEST
        if dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    scalars = []
    for lo, cnt in zip(chunk_los, chunk_cnts):
        scalars += [lo, cnt]
    srcps = [s.reshape(s.shape[0] // P, P * d) for s in srcs]
    # The per-block index DMA copies idx_all[j] -> ibuf, a [1, Kp, BO]
    # window. The dim-0 (j) slice itself needs no alignment (see
    # _gather_kernel), but Mosaic requires the SUBLANE dim of the copied
    # window — Kp here — to be 1 or a multiple of the 8-row i32 tile;
    # K in 2..7 fails to lower on real TPU without this padding.
    Kp = -(-K // 8) * 8
    idx_all = jnp.stack(
        [i.reshape(n_blocks, BO) for i in idxs]
        + [jnp.zeros((n_blocks, BO), jnp.int32)] * (Kp - K),
        axis=1,
    )  # [n_blocks, Kp, BO]
    in_specs = (
        [pl.BlockSpec(memory_space=pl.ANY)]  # idx_all
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in range(K)]
    )
    operands = [idx_all] + srcps
    if has_stream:
        in_specs.append(pl.BlockSpec((BO, d), lambda j, *_: (j, 0)))
        operands.append(stream)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 * K,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BO, d), lambda j, *_: (j, 0)),
        scratch_shapes=(
            [pltpu.VMEM((2, C2, P * d), dtype) for _ in range(K)]
            + [pltpu.VMEM((1, Kp, BO), jnp.int32)]
            + [pltpu.VMEM((P, BO, P * d), jnp.float32)]
            + [pltpu.SemaphoreType.DMA((2,)) for _ in range(K)]
            + [pltpu.SemaphoreType.DMA]
        ),
    )
    return pl.pallas_call(
        functools.partial(
            _multi_gather_kernel,
            K=K,
            has_stream=has_stream,
            n_srcs=tuple(s.shape[0] for s in srcs),
            d=d,
            prec=prec,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (L, d), dtype, vma=out_vma(*srcs, *idxs)
        ),
        interpret=interpret,
    )(*scalars, *operands)


# ================================================================= v2
# BlockSpec-pipelined kernels. The manual-DMA double-buffered loop above
# tops out at ~70 GB/s on this chip regardless of compute (round-4
# ablations: stripping the one-hot/matmul barely moves it), while
# pallas's automatic BlockSpec pipelining streams at ~130 GB/s — the
# same machinery XLA's own fusions ride. The v2 kernels are
# INPUT-STATIONARY: the grid walks a host-derivable VISIT list of
# (input chunk, output block) overlaps; inputs arrive as pipelined
# BlockSpec blocks indexed by prefetch scalars, outputs accumulate in a
# VMEM scratch and flush once per block. Consecutive visits that reuse a
# chunk (sorted streams at block boundaries) hit pallas's block cache —
# no re-fetch, so sorted streams read each row exactly once.


def _visit_plan(blk_lo, blk_cnt, n_chunks_tot: int, n_blocks: int):  # noqa: D417
    """Flatten the per-block chunk ranges (the EXISTING block plan) into
    the visit list [(chunk, block)] sorted by (block, chunk), padded to
    the STATIC capacity ``n_chunks_tot + n_blocks`` (each chunk visited
    once per overlapping block: at most one extra visit per block
    boundary, plus one dummy per empty block). Pure jnp over [n_blocks]
    arrays — runs on device at trace time, no new plan fields.

    Returns (vchunk, vblk, vfirst, vlast) i32 [cap]. Dummy visits pair an
    arbitrary chunk with a block none of its rows target (zero one-hot
    contribution) and have vfirst/vlast = 0 except the required
    first/last marks of empty blocks."""
    cap = n_chunks_tot + n_blocks
    cnt = jnp.maximum(blk_cnt, 1)  # empty blocks get one dummy visit
    offsets = jnp.cumsum(cnt)  # [n_blocks], end offset per block
    starts = offsets - cnt
    total = offsets[-1]
    s = jnp.arange(cap, dtype=jnp.int32)
    # block of each visit slot; slots past `total` park on the last block
    b = jnp.searchsorted(offsets, s, side="right").astype(jnp.int32)
    b = jnp.minimum(b, n_blocks - 1)
    k = s - starts[b]  # chunk ordinal within the block
    chunk = blk_lo[b] // C + jnp.minimum(k, cnt[b] - 1)
    # dummy visits (empty block, or tail padding) contribute zero via the
    # block mismatch in the kernel's one-hot; mark first/last correctly
    vfirst = (k == 0) & (s < total)
    vlast = (k == cnt[b] - 1) & (s < total)
    # tail slots: park on the final block with no first/last marks
    return (
        chunk.astype(jnp.int32),
        b,
        vfirst.astype(jnp.int32),
        vlast.astype(jnp.int32),
    )


def _segsum_v2_kernel(vchunk_ref, vblk_ref, vfirst_ref, vlast_ref,
                      x_ref, dst_ref, out_ref, acc, *, prec, bo):
    from jax.experimental import pallas as pl

    s = pl.program_id(0)

    @pl.when(vfirst_ref[s] == 1)
    def _():
        acc[...] = jnp.zeros_like(acc)

    blk = vblk_ref[s]
    local = dst_ref[0].astype(jnp.int32) - blk * bo  # [1, C]
    iota = jax.lax.broadcasted_iota(jnp.int32, (bo, 1), 0)
    onehot = (iota == local).astype(x_ref.dtype)  # [BO, C]
    acc[...] += jax.lax.dot_general(
        onehot,
        x_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )

    @pl.when(vlast_ref[s] == 1)
    def _():
        out_ref[...] = acc[...].astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("n_out", "raw_mode", "interpret")
)
def _segsum_v2_pallas(
    x, dst, blk_lo, blk_cnt, *, n_out, raw_mode=False, interpret=False
):
    """Input-stationary streaming segment sum (see module comment).

    Works for SORTED streams and for unsorted block-local ("raw") ones:
    the one-hot match keeps only rows whose dst lands in the visit's
    block either way, and the visit list is ordered by block so output
    revisits are consecutive. ``raw_mode`` sizes the static visit
    capacity for the overlapping chunk ranges local-mode plans carry
    (bounded by make_plan's _LOCAL_VISIT_FACTOR gate); sorted plans
    partition rows, so each block adds at most one boundary re-visit."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_rows, d = x.shape
    n_chunks = n_rows // C
    prec = (
        jax.lax.Precision.HIGHEST
        if x.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    if raw_mode:
        # raw plans exist only at the host grain (min/max row per block
        # over an unsorted stream); visit capacity from the SAME
        # LOCAL_VISIT_FACTOR gate make_plan applies (+16 slack,
        # +n_blocks empty-block dummies). Callers bypassing make_plan
        # must respect that bound: visits past the static capacity get
        # no slots and their blocks would never flush.
        bo = BO
        n_blocks = -(-n_out // bo)
        n_chunks_tot = int(LOCAL_VISIT_FACTOR * n_chunks) + 16
        plo, pcnt = jnp.asarray(blk_lo), jnp.asarray(blk_cnt)
    else:
        bo = min(V2_BO, BO)
        n_blocks = -(-n_out // bo)
        n_chunks_tot = n_chunks
        if bo == BO:
            # the host block plan is already at this grain — reuse it
            # (jnp.searchsorted over the full stream is NOT cheap on TPU;
            # recomputing per call measurably regressed the bench)
            plo, pcnt = jnp.asarray(blk_lo), jnp.asarray(blk_cnt)
        else:
            # finer grain (experiments only): device recompute
            plo, pcnt = _device_block_plan(dst, n_out, bo)
    vchunk, vblk, vfirst, vlast = _visit_plan(
        plo, pcnt, n_chunks_tot, n_blocks
    )
    dst3d = dst.reshape(n_rows // C, 1, C)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(vchunk.shape[0],),
        in_specs=[
            pl.BlockSpec((C, d), lambda s, vc, vb, vf, vl: (vc[s], 0)),
            pl.BlockSpec(
                (1, 1, C), lambda s, vc, vb, vf, vl: (vc[s], 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (bo, d), lambda s, vc, vb, vf, vl: (vb[s], 0)
        ),
        scratch_shapes=[pltpu.VMEM((bo, d), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_segsum_v2_kernel, prec=prec, bo=bo),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_out, d), x.dtype, vma=out_vma(x, dst)
        ),
        interpret=interpret,
    )(vchunk, vblk, vfirst, vlast, x, dst3d)


W = C  # paired-window gather: source window = two W-row BlockSpec blocks


def _gather_v2_kernel(wlo_ref, idx_ref, slo_ref, shi_ref, out_ref, *,
                      prec):
    from jax.experimental import pallas as pl

    j = pl.program_id(0)
    base = wlo_ref[j] * W
    idx = idx_ref[0].astype(jnp.int32)  # [1, BO]
    local = idx - base
    rows = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
    oh_lo = (rows == local).astype(slo_ref.dtype)  # [W, BO]
    oh_hi = ((rows + W) == local).astype(shi_ref.dtype)
    acc = jax.lax.dot_general(
        oh_lo, slo_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    acc += jax.lax.dot_general(
        oh_hi, shi_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    out_ref[...] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gather_v2_pallas(src, idx, wlo, *, interpret=False):
    """Paired-window pipelined gather: per BO-row output block, the
    source window rides as TWO consecutive W-row BlockSpec blocks of the
    same table (index maps driven by the per-block ``wlo`` scalar), so
    pallas pipelines the fetches. Requires every block's indices inside
    [wlo*W, wlo*W + 2W) — guaranteed by ``build_pw_plan``. Out-of-window
    rows (only masked/padded, by plan construction) come out zero."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_src, d = src.shape
    L = idx.shape[0]
    n_blocks = L // BO
    prec = (
        jax.lax.Precision.HIGHEST
        if src.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    idx3d = idx.reshape(n_blocks, 1, BO)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1, BO), lambda j, wlo: (j, 0, 0)),
            pl.BlockSpec((W, d), lambda j, wlo: (wlo[j], 0)),
            pl.BlockSpec((W, d), lambda j, wlo: (wlo[j] + 1, 0)),
        ],
        out_specs=pl.BlockSpec((BO, d), lambda j, wlo: (j, 0)),
    )
    return pl.pallas_call(
        functools.partial(_gather_v2_kernel, prec=prec),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (L, d), src.dtype, vma=out_vma(src, idx)
        ),
        interpret=interpret,
    )(wlo, idx3d, src, src)


def build_pw_plan(
    idx: np.ndarray, valid: np.ndarray, n_src: int
) -> np.ndarray | None:
    """Per BO-row stream block: the W-aligned source block index ``wlo``
    with every VALID row's index inside [wlo*W, wlo*W + 2W) — the
    paired-window pipelined gather's plan. None when any block's span
    exceeds the paired window, the stream is unaligned, or the source
    table is too small for two W-blocks."""
    idx = np.asarray(idx)
    L = idx.shape[0]
    if L == 0 or L % BO or n_src < 2 * W or n_src % W:
        return None
    blocks = idx.reshape(-1, BO).astype(np.int64)
    ok = np.asarray(valid).reshape(-1, BO)
    lo = np.where(ok, blocks, np.iinfo(np.int64).max).min(axis=1)
    hi = np.where(ok, blocks, -1).max(axis=1)
    empty = hi < 0
    lo = np.where(empty, 0, lo)
    hi = np.where(empty, 0, hi)
    wlo = np.minimum(lo // W, n_src // W - 2)
    if ((lo < wlo * W) | (hi >= wlo * W + 2 * W)).any():
        return None
    return wlo.astype(np.int32)


def stream_v2_enabled() -> bool:
    """v2 pipelined kernels: OPT-IN (CHGNET_TPU_STREAM_V2=anything).

    Round-4 model-level A/B: despite microbench wins (+27% on synthetic
    d=64 fan-in-2 streams; robust paired-window gathers), the full
    E+F+S+M bench ran 3-4% SLOWER with v2 on (1.82M -> 1.75-1.76M
    edges/s). The v1 manual-DMA kernels amortize grid-step overhead over
    long chunk loops, which wins on the model's high-fan-in streams
    (center scatter: ~80 chunks per output block), and session noise
    covers the narrow-stream gain. Kept as measured infrastructure —
    the dispatch, plans, and tests all exercise it."""
    return bool(os.environ.get("CHGNET_TPU_STREAM_V2")) and not os.environ.get(
        "CHGNET_TPU_NO_STREAM_V2"
    )


def stream_gather_v2_ok(src: jnp.ndarray, n_rows: int, pw) -> bool:
    """Static eligibility for the paired-window pipelined gather."""
    return (
        stream_v2_enabled()
        and not os.environ.get("CHGNET_TPU_NO_PW_GATHER")
        and not os.environ.get("CHGNET_TPU_NO_STREAM_GATHER")
        and pw is not None
        and getattr(pw, "shape", (0,))[0] == n_rows // BO
        and src.ndim == 2
        and n_rows % BO == 0
        and src.shape[0] % W == 0
        and src.shape[0] >= 2 * W
        and tpu_backend()
    )


def stream_gather_ok(src: jnp.ndarray, n_rows: int, g_lo) -> bool:
    """Static eligibility for the streaming gather kernel."""
    return (
        not os.environ.get("CHGNET_TPU_NO_STREAM_GATHER")
        and g_lo is not None
        and getattr(g_lo, "shape", (0,))[0] == n_rows // BO
        and src.ndim == 2
        and n_rows % BO == 0
        and src.shape[0] % C == 0
        and src.shape[0] >= C
        and (src.shape[1] in (32, 64) or src.shape[1] % 128 == 0)
        and tpu_backend()
    )


def stream_segsum_ok(x: jnp.ndarray, blk_lo, n_out: int) -> bool:
    """Static eligibility: kernel-aligned stream + nonempty block plan.

    ``d`` must divide 128 with packed chunks no narrower than one lane
    tile (d >= 32 keeps the dst DMA minor at >= 128 columns)."""
    return (
        blk_lo is not None
        and getattr(blk_lo, "shape", (0,))[0] == -(-n_out // BO)
        and x.ndim == 2
        and x.shape[0] % C == 0
        and (x.shape[1] in (32, 64) or x.shape[1] % 128 == 0)
        and tpu_backend()
    )
