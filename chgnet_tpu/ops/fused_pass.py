"""Mono-kernel conv-layer pass: K streaming window-gathers + gated-MLP
tail in ONE Pallas kernel.

Every conv layer's hot path used to be two custom calls with an HBM
round trip between them:

    acc [L, 2D] = multi_gather(projected parts)        (ops/stream_ops.py)
    out [L, D]  = gated tail(acc) * weights * mask     (ops/gated_message.py)

pallas_call boundaries block XLA fusion, so ``acc`` — the widest stream
in the model, [L, 128] per layer — was written to HBM by the first
kernel and read back by the second. This kernel computes the tail on the
accumulator while it is still in VMEM: per BO-row block, DMA the K
source windows, reduce them with one-hot MXU matmuls (exact
``_multi_gather_kernel`` body), add the aligned streams and first-layer
bias, then apply silu -> block-diagonal W2 -> per-half layer norms ->
silu * sigmoid gating -> optional per-row weights / mask / resnet — and
write only the final [BO, D] block.

Shapes follow the lane-packed convention (``models/functions.py``): the
core|gate branches ride one 2D = 128-lane accumulator; single-Linear
branches (AngleUpdate's default) skip the W2 stage.

Backward: a second hand-fused kernel (``_bwd_kernel``) that recomputes
the accumulator from the source windows in VMEM (same shared gather
body), applies the tail's hand gradients, and emits the d_total stream
+ d_weights + per-tile param grads in one pass; the windowed tables'
cotangents then ride the planned streaming segment sums over d_total.
Grad-of-grad (the force-training trace) falls back to differentiating
the unfused custom-op composition (``_pass_grads``'s own vjp), so
autodiff works at any order. The reference hot loop this replaces:
``/root/reference/chgnet/model/layers.py:112-137, 237-263, 321-363``
(gather-concat-matmul per layer).

Ships OPT-IN (``CHGNET_TPU_FUSED_PASS=1``): measured round 4, fusing
the tail into the manual-DMA gather core is a net model-level loss —
see docs/performance.md "Round-4 findings".
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from chgnet_tpu.ops import stream_ops
from chgnet_tpu.ops.stream_ops import BO, C, out_vma


def _tail_math(acc, p2, weights, mask, resnet, out_dtype):
    """Post-accumulator math in f32 (shared: kernel body + reference)."""
    f32 = jnp.float32
    dim = p2["nc_scale"].shape[-1]
    y = acc
    if "w2" in p2:
        y = (
            jnp.dot(
                jax.nn.silu(acc),
                p2["w2"].astype(f32),
                preferred_element_type=f32,
            )
            + p2["b2"].astype(f32)
        )

    def ln(x, scale, bias, eps=1e-5):
        mean = x.mean(axis=-1, keepdims=True)
        var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + eps) * scale.astype(
            f32
        ) + bias.astype(f32)

    core = ln(y[:, :dim], p2["nc_scale"], p2["nc_bias"])
    gate = ln(y[:, dim:], p2["ng_scale"], p2["ng_bias"])
    out = jax.nn.silu(core) * jax.nn.sigmoid(gate)
    if weights is not None:
        out = out * weights.astype(f32)
    if mask is not None:
        out = out * mask.astype(f32).reshape(-1, 1)
    if resnet is not None:
        out = out + resnet.astype(f32)
    return out.astype(out_dtype)


def _gather_windows_into_acc(scalars, idx_hbm, srcs, sbufs, ssems, ibuf,
                             isem, acc, *, K, n_srcs, prec):
    """Shared gather body of the forward and backward kernels: fetch the
    per-block index rows, DMA each of the K source windows
    (double-buffered), and reduce them into ``acc[0]`` ([BO, 2D] f32)
    with one-hot MXU matmuls — the exact
    ``stream_ops._multi_gather_kernel`` body (int-side re-read mask,
    tail clamping). ONE copy here prevents forward/backward divergence
    in the mono-kernel path."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C2 = C  # feature width is 2D = 128: P == 1, no row packing
    j = pl.program_id(0)

    def idma():
        return pltpu.make_async_copy(idx_hbm.at[pl.ds(j, 1)], ibuf, isem)

    idma().start()
    acc[...] = jnp.zeros_like(acc)
    idma().wait()
    iall = ibuf[0]  # [Kp, BO]

    for k in range(K):
        lo = scalars[2 * k][j]
        n_chunks = scalars[2 * k + 1][j]
        n2 = n_srcs[k]
        idx = iall[k: k + 1, :]
        src_hbm = srcs[k]
        sbuf = sbufs[k]
        ssem = ssems[k]

        def dma(slot, step, lo=lo, n2=n2, src_hbm=src_hbm, sbuf=sbuf,
                ssem=ssem):
            start2 = pl.multiple_of(
                jnp.minimum(lo + step * C2, n2 - C2), C2
            )
            return pltpu.make_async_copy(
                src_hbm.at[pl.ds(start2, C2), :], sbuf.at[slot],
                ssem.at[slot],
            )

        @pl.when(n_chunks > 0)
        def _():
            dma(0, 0).start()

        def body(step, _, lo=lo, n2=n2, idx=idx, dma=dma, sbuf=sbuf):
            slot = jax.lax.rem(step, 2)

            @pl.when(step + 1 < n_chunks)
            def _():
                dma(1 - slot, step + 1).start()

            dma(slot, step).wait()
            start2 = jnp.minimum(lo + step * C2, n2 - C2)
            row2 = jax.lax.broadcasted_iota(jnp.int32, (C2, 1), 0) + start2
            row2 = jnp.where(row2 >= (lo + step * C2), row2, -2)
            onehot_t = (row2 == idx).astype(sbuf.dtype)  # [C2, BO]
            acc[0] += jax.lax.dot_general(
                onehot_t,
                sbuf[slot],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )
            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0, unroll=False)


def _kernel(*refs, K, n_aligned, has_w2, has_weights, has_resnet,
            n_srcs, d2, dim, prec):
    """One output block: K window-gathers + aligned streams + bias, then
    the gated tail — all in VMEM. Gather body mirrors
    ``stream_ops._multi_gather_kernel`` (int-side re-read mask etc.)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    scalars = refs[: 2 * K]
    pos = 2 * K
    idx_hbm = refs[pos]; pos += 1
    srcs = refs[pos: pos + K]; pos += K
    aligned = refs[pos: pos + n_aligned]; pos += n_aligned
    b1_ref = refs[pos]; pos += 1
    p2 = {}
    if has_w2:
        p2["w2"] = refs[pos]; pos += 1
        p2["b2"] = refs[pos]; pos += 1
    p2["nc_scale"] = refs[pos]; pos += 1
    p2["nc_bias"] = refs[pos]; pos += 1
    p2["ng_scale"] = refs[pos]; pos += 1
    p2["ng_bias"] = refs[pos]; pos += 1
    weights_ref = None
    if has_weights:
        weights_ref = refs[pos]; pos += 1
    resnet_ref = None
    if has_resnet:
        resnet_ref = refs[pos]; pos += 1
    out_ref = refs[pos]; pos += 1
    sbufs = refs[pos: pos + K]; pos += K
    ibuf = refs[pos]; pos += 1
    acc = refs[pos]; pos += 1
    ssems = refs[pos: pos + K]; pos += K
    isem = refs[pos]

    _gather_windows_into_acc(
        scalars, idx_hbm, srcs, sbufs, ssems, ibuf, isem, acc,
        K=K, n_srcs=n_srcs, prec=prec,
    )

    total = acc[0]  # [BO, 2D] f32
    for a in aligned:
        total = total + a[...].astype(jnp.float32)
    total = total + b1_ref[...].astype(jnp.float32)

    p2v = {k: v[...] for k, v in p2.items()}
    out_ref[...] = _tail_math(
        total,
        p2v,
        weights_ref[...] if weights_ref is not None else None,
        None,
        resnet_ref[...] if resnet_ref is not None else None,
        out_ref.dtype,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_aligned", "has_w2", "has_weights", "has_resnet", "interpret",
    ),
)
def _fused_pass_pallas(
    srcs, idxs, chunk_los, chunk_cnts, aligned, b1, p2, weights,
    resnet, *, n_aligned, has_w2, has_weights, has_resnet,
    interpret=False,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K = len(srcs)
    d2 = srcs[0].shape[1] if K else aligned[0].shape[1]
    dim = d2 // 2
    L = idxs[0].shape[0] if K else aligned[0].shape[0]
    n_blocks = L // BO
    dtype = srcs[0].dtype if K else aligned[0].dtype
    prec = (
        jax.lax.Precision.HIGHEST
        if dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    scalars = []
    for lo, cnt in zip(chunk_los, chunk_cnts):
        scalars += [lo, cnt]
    # per-block index rows, Kp padded to the 8-row i32 tile (see
    # _multi_gather_pallas)
    Kp = -(-max(K, 1) // 8) * 8
    idx_all = jnp.stack(
        [i.reshape(n_blocks, BO) for i in idxs]
        + [jnp.zeros((n_blocks, BO), jnp.int32)] * (Kp - K),
        axis=1,
    )  # [n_blocks, Kp, BO]

    row_spec = pl.BlockSpec((BO, d2), lambda j, *_: (j, 0))
    out_spec = pl.BlockSpec((BO, dim), lambda j, *_: (j, 0))
    vecd_spec = pl.BlockSpec((dim,), lambda j, *_: (0,))
    vec2d_spec = pl.BlockSpec((d2,), lambda j, *_: (0,))
    mat_spec = pl.BlockSpec((d2, d2), lambda j, *_: (0, 0))

    in_specs = (
        [pl.BlockSpec(memory_space=pl.ANY)]  # idx_all
        + [pl.BlockSpec(memory_space=pl.ANY)] * K  # src tables
        + [row_spec] * n_aligned
        + [vec2d_spec]  # b1
    )
    operands = [idx_all] + list(srcs) + list(aligned) + [b1]
    if has_w2:
        in_specs += [mat_spec, vec2d_spec]
        operands += [p2["w2"], p2["b2"]]
    in_specs += [vecd_spec] * 4
    operands += [
        p2["nc_scale"], p2["nc_bias"], p2["ng_scale"], p2["ng_bias"]
    ]
    if has_weights:
        in_specs.append(out_spec)
        operands.append(weights)
    if has_resnet:
        in_specs.append(out_spec)
        operands.append(resnet)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 * K,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=(
            [pltpu.VMEM((2, C, d2), dtype) for _ in range(K)]
            + [pltpu.VMEM((1, Kp, BO), jnp.int32)]
            + [pltpu.VMEM((1, BO, d2), jnp.float32)]
            + [pltpu.SemaphoreType.DMA((2,)) for _ in range(K)]
            + [pltpu.SemaphoreType.DMA]
        ),
    )
    return pl.pallas_call(
        functools.partial(
            _kernel,
            K=K,
            n_aligned=n_aligned,
            has_w2=has_w2,
            has_weights=has_weights,
            has_resnet=has_resnet,
            n_srcs=tuple(s.shape[0] for s in srcs),
            d2=d2,
            dim=dim,
            prec=prec,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (L, dim), dtype, vma=out_vma(*srcs, *aligned, *idxs)
        ),
        interpret=interpret,
    )(*scalars, *operands)


# ------------------------------------------------------------ public op
def _reference_pass(tables, idxs, plans, b1, p2, weights, mask, resnet):
    """Unfused composition (custom-vjp building blocks): the math the
    kernel must match, and the path the backward recomputes through."""
    from chgnet_tpu.models.functions import fold_bias_into_stream
    from chgnet_tpu.ops.gated_message import (
        fused_gated_message,
        fused_gated_update,
    )
    from chgnet_tpu.ops.scatter import gather_sum

    parts, b1_rest = fold_bias_into_stream(
        list(zip(tables, idxs, plans)), b1
    )
    acc = gather_sum(parts)
    if b1_rest is not None:
        acc = acc + b1_rest
    if weights is not None:
        # message shape (AtomConv / BondConv); mask may be pre-folded
        # into weights (the mono-kernel path does this outside the op)
        out = fused_gated_message(
            acc,
            weights,
            mask if mask is not None else jnp.ones(acc.shape[0], acc.dtype),
            p2,
        )
        if resnet is not None:
            out = out + resnet
        return out
    # update shape (AngleUpdate): no weights/mask, resnet folded in
    if mask is not None:
        raise NotImplementedError("mask without weights is unsupported")
    resnet_in = (
        resnet
        if resnet is not None
        else jnp.zeros((acc.shape[0], p2["nc_scale"].shape[-1]), acc.dtype)
    )
    return fused_gated_update(acc, resnet_in, p2)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _fused_pass_op(tables, idxs, plans, b1, p2, weights, resnet):
    win = [i is not None for i in idxs]
    srcs = tuple(t for t, w in zip(tables, win) if w)
    widxs = tuple(i for i in idxs if i is not None)
    wplans = tuple(p for p, w in zip(plans, win) if w)
    aligned = tuple(t for t, w in zip(tables, win) if not w)
    return _fused_pass_pallas(
        srcs,
        widxs,
        tuple(p.g_lo for p in wplans),
        tuple(p.g_cnt for p in wplans),
        aligned,
        b1,
        p2,
        weights,
        resnet,
        n_aligned=len(aligned),
        has_w2="w2" in p2,
        has_weights=weights is not None,
        has_resnet=resnet is not None,
        interpret=jax.default_backend() != "tpu",
    )


def _fused_pass_fwd(tables, idxs, plans, b1, p2, weights, resnet):
    out = _fused_pass_op(tables, idxs, plans, b1, p2, weights, resnet)
    return out, (tables, idxs, plans, b1, p2, weights, resnet)


def _fused_pass_bwd(res, ct):
    tables, idxs, plans, b1, p2, weights, resnet = res
    d_tables, d_b1, d_p2, d_weights, d_resnet = _pass_grads(
        tables, idxs, plans, b1, p2, weights, resnet, ct
    )
    return (d_tables, None, None, d_b1, d_p2, d_weights, d_resnet)


_fused_pass_op.defvjp(_fused_pass_fwd, _fused_pass_bwd)


# ----------------------------------------------------- hand-fused backward
def _bwd_kernel(*refs, K, n_aligned, has_w2, has_weights, n_srcs, d2, dim,
                prec):
    """One block of the pass BACKWARD: recompute the accumulator from the
    source windows (same gather body as the forward), then the tail's
    hand gradients — emitting d_total [BO, 2D], optional d_weights
    [BO, D], and per-tile param-grad accumulators. The accumulator never
    touches HBM in either direction."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from chgnet_tpu.ops.gated_message import (
        _ln_bwd,
        _ln_parts,
        _silu_grad,
    )

    scalars = refs[: 2 * K]
    pos = 2 * K
    idx_hbm = refs[pos]; pos += 1
    srcs = refs[pos: pos + K]; pos += K
    aligned = refs[pos: pos + n_aligned]; pos += n_aligned
    b1_ref = refs[pos]; pos += 1
    p2 = {}
    if has_w2:
        p2["w2"] = refs[pos]; pos += 1
        p2["b2"] = refs[pos]; pos += 1
    p2["nc_scale"] = refs[pos]; pos += 1
    p2["nc_bias"] = refs[pos]; pos += 1
    p2["ng_scale"] = refs[pos]; pos += 1
    p2["ng_bias"] = refs[pos]; pos += 1
    weights_ref = None
    if has_weights:
        weights_ref = refs[pos]; pos += 1
    g_ref = refs[pos]; pos += 1
    # outputs
    d_total_ref = refs[pos]; pos += 1
    d_weights_ref = None
    if has_weights:
        d_weights_ref = refs[pos]; pos += 1
    db1_ref = refs[pos]; pos += 1
    if has_w2:
        dw2_ref = refs[pos]; pos += 1
        db2_ref = refs[pos]; pos += 1
    dncs_ref = refs[pos]; pos += 1
    dncb_ref = refs[pos]; pos += 1
    dngs_ref = refs[pos]; pos += 1
    dngb_ref = refs[pos]; pos += 1
    sbufs = refs[pos: pos + K]; pos += K
    ibuf = refs[pos]; pos += 1
    acc = refs[pos]; pos += 1
    ssems = refs[pos: pos + K]; pos += K
    isem = refs[pos]

    _gather_windows_into_acc(
        scalars, idx_hbm, srcs, sbufs, ssems, ibuf, isem, acc,
        K=K, n_srcs=n_srcs, prec=prec,
    )

    f32 = jnp.float32
    total = acc[0]
    for a in aligned:
        total = total + a[...].astype(f32)
    total = total + b1_ref[...].astype(f32)

    p2v = {k: v[...].astype(f32) for k, v in p2.items()}
    g = g_ref[...].astype(f32)
    if has_w2:
        h = jax.nn.silu(total)
        y = jnp.dot(h, p2v["w2"], preferred_element_type=f32) + p2v["b2"]
    else:
        y = total
    zc, invc = _ln_parts(y[:, :dim])
    zg, invg = _ln_parts(y[:, dim:])
    cn = zc * p2v["nc_scale"] + p2v["nc_bias"]
    gn = zg * p2v["ng_scale"] + p2v["ng_bias"]
    silu_cn = jax.nn.silu(cn)
    sig_gn = jax.nn.sigmoid(gn)
    out_pre = silu_cn * sig_gn
    if has_weights:
        w = weights_ref[...].astype(f32)
        d_weights_ref[...] = (g * out_pre).astype(d_weights_ref.dtype)
        m = g * w
    else:
        m = g
    d_cn = m * sig_gn * _silu_grad(cn)
    d_gn = m * silu_cn * sig_gn * (1.0 - sig_gn)
    d_y = jnp.concatenate(
        [
            _ln_bwd(d_cn, zc, invc, p2v["nc_scale"]),
            _ln_bwd(d_gn, zg, invg, p2v["ng_scale"]),
        ],
        axis=-1,
    )
    if has_w2:
        d_h = jnp.dot(d_y, p2v["w2"].T, preferred_element_type=f32)
        d_total = d_h * _silu_grad(total)
    else:
        d_total = d_y
    d_total_ref[...] = d_total.astype(d_total_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        db1_ref[...] = jnp.zeros_like(db1_ref)
        if has_w2:
            dw2_ref[...] = jnp.zeros_like(dw2_ref)
            db2_ref[...] = jnp.zeros_like(db2_ref)
        dncs_ref[...] = jnp.zeros_like(dncs_ref)
        dncb_ref[...] = jnp.zeros_like(dncb_ref)
        dngs_ref[...] = jnp.zeros_like(dngs_ref)
        dngb_ref[...] = jnp.zeros_like(dngb_ref)

    db1_ref[...] += d_total.sum(axis=0).reshape(1, -1).astype(db1_ref.dtype)
    if has_w2:
        dw2_ref[...] += jnp.dot(
            h.T, d_y, preferred_element_type=f32
        ).astype(dw2_ref.dtype)
        db2_ref[...] += d_y.sum(axis=0).reshape(1, -1).astype(db2_ref.dtype)
    dncs_ref[...] += (d_cn * zc).sum(axis=0).reshape(1, -1).astype(
        dncs_ref.dtype
    )
    dncb_ref[...] += d_cn.sum(axis=0).reshape(1, -1).astype(dncb_ref.dtype)
    dngs_ref[...] += (d_gn * zg).sum(axis=0).reshape(1, -1).astype(
        dngs_ref.dtype
    )
    dngb_ref[...] += d_gn.sum(axis=0).reshape(1, -1).astype(dngb_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_aligned", "has_w2", "has_weights", "interpret",
    ),
)
def _pass_bwd_pallas(
    srcs, idxs, chunk_los, chunk_cnts, aligned, b1, p2, weights, g, *,
    n_aligned, has_w2, has_weights, interpret=False,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K = len(srcs)
    d2 = srcs[0].shape[1] if K else aligned[0].shape[1]
    dim = d2 // 2
    L = idxs[0].shape[0] if K else aligned[0].shape[0]
    n_blocks = L // BO
    dtype = srcs[0].dtype if K else aligned[0].dtype
    prec = (
        jax.lax.Precision.HIGHEST
        if dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    scalars = []
    for lo, cnt in zip(chunk_los, chunk_cnts):
        scalars += [lo, cnt]
    Kp = -(-max(K, 1) // 8) * 8
    idx_all = jnp.stack(
        [i.reshape(n_blocks, BO) for i in idxs]
        + [jnp.zeros((n_blocks, BO), jnp.int32)] * (Kp - K),
        axis=1,
    )

    row_spec = pl.BlockSpec((BO, d2), lambda j, *_: (j, 0))
    dim_spec = pl.BlockSpec((BO, dim), lambda j, *_: (j, 0))
    vecd_spec = pl.BlockSpec((dim,), lambda j, *_: (0,))
    vec2d_spec = pl.BlockSpec((d2,), lambda j, *_: (0,))
    mat_spec = pl.BlockSpec((d2, d2), lambda j, *_: (0, 0))
    row2d_spec = pl.BlockSpec((1, d2), lambda j, *_: (0, 0))
    rowd_spec = pl.BlockSpec((1, dim), lambda j, *_: (0, 0))

    in_specs = (
        [pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * K
        + [row_spec] * n_aligned
        + [vec2d_spec]
    )
    operands = [idx_all] + list(srcs) + list(aligned) + [b1]
    if has_w2:
        in_specs += [mat_spec, vec2d_spec]
        operands += [p2["w2"], p2["b2"]]
    in_specs += [vecd_spec] * 4
    operands += [
        p2["nc_scale"], p2["nc_bias"], p2["ng_scale"], p2["ng_bias"]
    ]
    if has_weights:
        in_specs.append(dim_spec)
        operands.append(weights)
    in_specs.append(dim_spec)
    operands.append(g)

    vma = out_vma(*srcs, *aligned, *idxs, g)
    out_specs = [row_spec]
    out_shape = [jax.ShapeDtypeStruct((L, d2), dtype, vma=vma)]
    if has_weights:
        out_specs.append(dim_spec)
        out_shape.append(
            jax.ShapeDtypeStruct((L, dim), weights.dtype, vma=vma)
        )
    out_specs.append(row2d_spec)
    out_shape.append(jax.ShapeDtypeStruct((1, d2), jnp.float32, vma=vma))
    if has_w2:
        out_specs += [mat_spec, row2d_spec]
        out_shape += [
            jax.ShapeDtypeStruct((d2, d2), p2["w2"].dtype, vma=vma),
            jax.ShapeDtypeStruct((1, d2), p2["b2"].dtype, vma=vma),
        ]
    out_specs += [rowd_spec] * 4
    out_shape += [
        jax.ShapeDtypeStruct((1, dim), p2["nc_scale"].dtype, vma=vma),
        jax.ShapeDtypeStruct((1, dim), p2["nc_bias"].dtype, vma=vma),
        jax.ShapeDtypeStruct((1, dim), p2["ng_scale"].dtype, vma=vma),
        jax.ShapeDtypeStruct((1, dim), p2["ng_bias"].dtype, vma=vma),
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 * K,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=(
            [pltpu.VMEM((2, C, d2), dtype) for _ in range(K)]
            + [pltpu.VMEM((1, Kp, BO), jnp.int32)]
            + [pltpu.VMEM((1, BO, d2), jnp.float32)]
            + [pltpu.SemaphoreType.DMA((2,)) for _ in range(K)]
            + [pltpu.SemaphoreType.DMA]
        ),
    )
    return pl.pallas_call(
        functools.partial(
            _bwd_kernel,
            K=K,
            n_aligned=n_aligned,
            has_w2=has_w2,
            has_weights=has_weights,
            n_srcs=tuple(s.shape[0] for s in srcs),
            d2=d2,
            dim=dim,
            prec=prec,
        ),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(*scalars, *operands)


def _pass_grads_reference(tables, idxs, plans, b1, p2, weights, resnet, ct):
    """Input cotangents via jax.vjp of the unfused composition (every
    block a custom-vjp op — the arbitrarily-differentiable path)."""
    diff = (tables, b1, p2, weights, resnet)

    def f(diff_args):
        tables_, b1_, p2_, weights_, resnet_ = diff_args
        return _reference_pass(
            tables_, idxs, plans, b1_, p2_, weights_, None, resnet_
        )

    _, vjp = jax.vjp(f, diff)
    return vjp(ct)[0]


@jax.custom_vjp
def _pass_grads(tables, idxs, plans, b1, p2, weights, resnet, ct):
    """(d_tables, d_b1, d_p2, d_weights, d_resnet) of the fused pass.

    Primal = the hand-fused backward kernel: the accumulator is
    recomputed from the source windows INSIDE the kernel (never hitting
    HBM), the tail gradients come out per tile, and the windowed tables'
    cotangents ride the planned streaming segment sums over the single
    emitted d_total stream. Its own vjp (grad-of-grad, the force-training
    trace) falls back to differentiating the unfused custom-op
    composition."""
    from chgnet_tpu.ops.scatter import _planned_segsum

    win = [i is not None for i in idxs]
    srcs = tuple(t for t, w in zip(tables, win) if w)
    widxs = tuple(i for i in idxs if i is not None)
    wplans = tuple(p for p, w in zip(plans, win) if w)
    aligned = tuple(t for t, w in zip(tables, win) if not w)
    outs = _pass_bwd_pallas(
        srcs,
        widxs,
        tuple(p.g_lo for p in wplans),
        tuple(p.g_cnt for p in wplans),
        aligned,
        b1,
        p2,
        weights,
        ct,
        n_aligned=len(aligned),
        has_w2="w2" in p2,
        has_weights=weights is not None,
        interpret=jax.default_backend() != "tpu",
    )
    pos = 0
    d_total = outs[pos]; pos += 1
    d_weights = None
    if weights is not None:
        d_weights = outs[pos]; pos += 1
    d_b1 = outs[pos][0]; pos += 1
    d_p2 = {}
    if "w2" in p2:
        d_p2["w2"] = outs[pos]; pos += 1
        d_p2["b2"] = outs[pos][0]; pos += 1
    d_p2["nc_scale"] = outs[pos][0]; pos += 1
    d_p2["nc_bias"] = outs[pos][0]; pos += 1
    d_p2["ng_scale"] = outs[pos][0]; pos += 1
    d_p2["ng_bias"] = outs[pos][0]; pos += 1

    d_tables = []
    for idx, plan, table in zip(idxs, plans, tables):
        if idx is None:
            d_tables.append(d_total.astype(table.dtype))
        else:
            d_tables.append(
                _planned_segsum(
                    d_total, plan.perm, plan.dst, plan.blk_lo,
                    plan.blk_cnt, plan.raw, table.shape[0],
                ).astype(table.dtype)
            )
    d_resnet = None if resnet is None else ct.astype(resnet.dtype)
    return (
        tuple(d_tables),
        d_b1.astype(b1.dtype),
        d_p2,
        d_weights,
        d_resnet,
    )


def _pass_grads_fwd(tables, idxs, plans, b1, p2, weights, resnet, ct):
    out = _pass_grads(tables, idxs, plans, b1, p2, weights, resnet, ct)
    return out, (tables, idxs, plans, b1, p2, weights, resnet, ct)


def _pass_grads_bwd(res, cts):
    tables, idxs, plans, b1, p2, weights, resnet, ct = res

    def ref_grads(args):
        tables_, b1_, p2_, weights_, resnet_, ct_ = args
        return _pass_grads_reference(
            tables_, idxs, plans, b1_, p2_, weights_, resnet_, ct_
        )

    _, vjp = jax.vjp(
        ref_grads, (tables, b1, p2, weights, resnet, ct)
    )
    d_tables, d_b1, d_p2, d_weights, d_resnet, d_ct = vjp(cts)[0]
    return (d_tables, None, None, d_b1, d_p2, d_weights, d_resnet, d_ct)


_pass_grads.defvjp(_pass_grads_fwd, _pass_grads_bwd)


def fused_layer_pass(
    parts,  # [(projected table [S, 2D], idx [L] | None, plan)]
    b1: jnp.ndarray,  # [2D] joint first-layer bias (zeros if none)
    p2: dict,  # gated_mlp_fused_pack params (w2/b2 optional, norms)
    *,
    weights: jnp.ndarray | None = None,  # [L, D] per-row scale
    mask: jnp.ndarray | None = None,  # [L]
    resnet: jnp.ndarray | None = None,  # [L, D] residual added at the end
) -> jnp.ndarray:
    """One conv-layer pass — first-layer gather-sum plus gated tail — in
    a single Pallas kernel when every part qualifies, else the unfused
    custom-op composition (bit-comparable math either way).

    Qualification: >= 1 windowed part whose plan carries a gather window
    (``stream_ops.stream_gather_ok``), all parts 2D-wide and aligned to
    the block grid, TPU backend, and no kill switch
    (``CHGNET_TPU_NO_FUSED_PASS``). On the kernel path the mask is folded
    into ``weights`` OUTSIDE the op (XLA fuses the multiply into the
    weights producer; a blocked 1-D bf16 mask operand trips Mosaic's
    layout verifier — XLA tiles 1-D bf16 at T(1024) vs the (BO,)
    block); the fallback keeps the historical separate-mask order for
    bit-stable CPU numerics."""
    tables = tuple(t for t, _, _ in parts)
    idxs = tuple(i for _, i, _ in parts)
    plans = tuple(p for _, _, p in parts)
    L = next(
        (i.shape[0] for i in idxs if i is not None), tables[0].shape[0]
    )
    d2 = tables[0].shape[1]
    n_windowed = 0
    # OPT-IN for now (CHGNET_TPU_FUSED_PASS=1): measured round 4, the
    # mono-kernel's manual-DMA gather core streams at ~70 GB/s vs the
    # ~130 GB/s BlockSpec-pipelined path, so fusing the tail into it is
    # a net LOSS until the gather core is rebuilt on the pipelined
    # architecture (bench 1.75M -> 1.54M edges/s with it on). The
    # interpret-mode tests keep exercising it meanwhile.
    ok = (
        bool(os.environ.get("CHGNET_TPU_FUSED_PASS"))
        and not os.environ.get("CHGNET_TPU_NO_FUSED_PASS")
        and stream_ops.tpu_backend()
        and L % BO == 0
        and d2 % 128 == 0
    )
    if ok:
        for t, i, p in parts:
            if t.shape[1] != d2:
                ok = False
                break
            if i is None:
                if t.shape[0] != L:
                    ok = False
                    break
            else:
                if p is None or not stream_ops.stream_gather_ok(
                    t, L, p.g_lo
                ):
                    ok = False
                    break
                n_windowed += 1
    if not ok or n_windowed < 1:
        return _reference_pass(
            tables, idxs, plans, b1, p2, weights, mask, resnet
        )
    if mask is not None:
        if weights is None:
            raise NotImplementedError("mask without weights is unsupported")
        weights = weights * mask[:, None]
    return _fused_pass_op(tables, idxs, plans, b1, p2, weights, resnet)
