"""Pallas TPU kernel: fused gated message computation (lane-packed).

The per-edge tail of every conv layer, with the core and gate branches
lane-packed into one [E, 2D] stream (TPU tiles are (8, 128) lanes, so a
64-wide f32 tensor pads 2x in HBM — packing keeps every stream
full-width):

    y   = silu(acc_both) @ blockdiag(W2c, W2g) + [b2c | b2g]
    msg = silu(LN(y[:, :D])) * sigmoid(LN(y[:, D:])) * weights * mask

Under plain XLA the matmul forces materialization boundaries, costing
several [E, *] HBM round-trips; this kernel streams each edge tile
through VMEM once — activation, the MXU matmul, both per-half norms,
gating, weighting and masking fused.

Backward is supplied via ``jax.custom_vjp`` (recompute-from-inputs, plain
XLA): correctness-first, and the forward is the inference/MD hot path.
The kernel runs in interpret mode on CPU so the test suite validates it
everywhere; enable in the model with ``CHGNetConfig.fused_kernels``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from chgnet_tpu.ops import stream_ops
from chgnet_tpu.ops.stream_ops import out_vma

TILE = 1024


def _ln(x, scale, bias, eps=1e-5):
    mean = x.mean(axis=-1, keepdims=True)
    var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _tail(y, weights, mask, p2, dim):
    """Shared post-matmul math (used by the kernel and the XLA path)."""
    core = _ln(y[:, :dim], p2["nc_scale"], p2["nc_bias"])
    gate = _ln(y[:, dim:], p2["ng_scale"], p2["ng_bias"])
    return (
        jax.nn.silu(core)
        * jax.nn.sigmoid(gate)
        * weights
        * mask.reshape(-1, 1)
    )


def _kernel(acc_ref, weights_ref, mask_ref, w2_ref, b2_ref,
            ncs_ref, ncb_ref, ngs_ref, ngb_ref, out_ref):
    # streams may be bf16 in HBM; ALL in-kernel math runs in f32 (Mosaic
    # rejects bf16 1-D broadcasts / keepdims reductions, and f32 VMEM
    # compute is numerically better anyway)
    f32 = jnp.float32
    dim = out_ref.shape[1]
    h = jax.nn.silu(acc_ref[:].astype(f32))
    y = (
        jnp.dot(h, w2_ref[:].astype(f32), preferred_element_type=f32)
        + b2_ref[:].astype(f32)
    )
    p2 = {
        "nc_scale": ncs_ref[:].astype(f32), "nc_bias": ncb_ref[:].astype(f32),
        "ng_scale": ngs_ref[:].astype(f32), "ng_bias": ngb_ref[:].astype(f32),
    }
    out_ref[:] = _tail(
        y, weights_ref[:].astype(f32), mask_ref[:].astype(f32), p2, dim
    ).astype(out_ref.dtype)


def _forward(acc_both, weights, mask, p2, *, interpret):
    n_rows, two_dim = acc_both.shape
    dim = two_dim // 2
    n_tiles = pl.cdiv(n_rows, TILE)
    pad = n_tiles * TILE - n_rows
    if pad:
        acc_both = jnp.pad(acc_both, ((0, pad), (0, 0)))
        weights = jnp.pad(weights, ((0, pad), (0, 0)))
        mask = jnp.pad(mask, (0, pad))

    acc_spec = pl.BlockSpec(
        (TILE, two_dim), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    w_spec = pl.BlockSpec(
        (TILE, dim), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    vec_spec = pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec(
        (two_dim, two_dim), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    b_spec = pl.BlockSpec((two_dim,), lambda i: (0,), memory_space=pltpu.VMEM)
    d_spec = pl.BlockSpec((dim,), lambda i: (0,), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _kernel,
        grid=(n_tiles,),
        in_specs=[
            acc_spec, w_spec, vec_spec,
            mat_spec, b_spec, d_spec, d_spec, d_spec, d_spec,
        ],
        out_specs=w_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_tiles * TILE, dim), acc_both.dtype,
            vma=out_vma(acc_both, weights, mask),
        ),
        interpret=interpret,
    )(
        acc_both, weights, mask,
        p2["w2"], p2["b2"],
        p2["nc_scale"], p2["nc_bias"], p2["ng_scale"], p2["ng_bias"],
    )
    return out[:n_rows]


def _reference(acc_both, weights, mask, p2):
    """Plain-XLA composition (identical math; used for backward and as
    the fallback path)."""
    dim = acc_both.shape[1] // 2
    y = jnp.dot(jax.nn.silu(acc_both), p2["w2"]) + p2["b2"]
    return _tail(y, weights, mask, p2, dim)


# ---------------------------------------------------------------- backward
def _silu_grad(x):
    s = jax.nn.sigmoid(x)
    return s * (1.0 + x * (1.0 - s))


def _ln_parts(x, eps=1e-5):
    mean = x.mean(axis=-1, keepdims=True)
    var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    return (x - mean) * inv, inv


def _ln_bwd(g_out, z, inv, scale):
    """d x for out = z * scale + bias with z = (x - mu) / sigma."""
    gz = g_out * scale
    return (
        gz - gz.mean(axis=-1, keepdims=True)
        - z * (gz * z).mean(axis=-1, keepdims=True)
    ) * inv


def _bwd_math(acc, weights, mask, p2, g):
    """Recompute-forward + hand-derived gradients (shared by the Pallas
    backward kernel and the interpret/CPU path). Returns per-row grads
    (d_acc, d_weights, d_mask) and per-tile param grad contributions."""
    dim = weights.shape[-1]
    h = jax.nn.silu(acc)
    y = jnp.dot(h, p2["w2"], preferred_element_type=jnp.float32) + p2["b2"]
    zc, invc = _ln_parts(y[:, :dim])
    zg, invg = _ln_parts(y[:, dim:])
    cn = zc * p2["nc_scale"] + p2["nc_bias"]
    gn = zg * p2["ng_scale"] + p2["ng_bias"]
    silu_cn = jax.nn.silu(cn)
    sig_gn = jax.nn.sigmoid(gn)
    mask_col = mask.reshape(-1, 1)

    stuff = silu_cn * sig_gn * weights  # out = stuff * mask
    d_weights = g * silu_cn * sig_gn * mask_col
    d_mask = (g * stuff).sum(axis=-1)
    m = g * weights * mask_col
    d_cn = m * sig_gn * _silu_grad(cn)
    d_gn = m * silu_cn * sig_gn * (1.0 - sig_gn)
    d_y = jnp.concatenate(
        [_ln_bwd(d_cn, zc, invc, p2["nc_scale"]),
         _ln_bwd(d_gn, zg, invg, p2["ng_scale"])],
        axis=-1,
    )
    d_h = jnp.dot(d_y, p2["w2"].T, preferred_element_type=jnp.float32)
    d_acc = d_h * _silu_grad(acc)

    param_grads = {
        "w2": jnp.dot(h.T, d_y, preferred_element_type=jnp.float32),
        "b2": d_y.sum(axis=0),
        "nc_scale": (d_cn * zc).sum(axis=0),
        "nc_bias": d_cn.sum(axis=0),
        "ng_scale": (d_gn * zg).sum(axis=0),
        "ng_bias": d_gn.sum(axis=0),
    }
    return d_acc, d_weights, d_mask, param_grads


def _bwd_kernel(acc_ref, w_ref, mask_ref, g_ref,
                w2_ref, b2_ref, ncs_ref, ncb_ref, ngs_ref, ngb_ref,
                dacc_ref, dw_ref, dmask_ref,
                dw2_ref, db2_ref, dncs_ref, dncb_ref, dngs_ref, dngb_ref):
    p2 = {
        "w2": w2_ref[:], "b2": b2_ref[:],
        "nc_scale": ncs_ref[:], "nc_bias": ncb_ref[:],
        "ng_scale": ngs_ref[:], "ng_bias": ngb_ref[:],
    }
    f32 = jnp.float32
    p2 = {k: v.astype(f32) for k, v in p2.items()}
    d_acc, d_w, d_mask, pg = _bwd_math(
        acc_ref[:].astype(f32),
        w_ref[:].astype(f32),
        mask_ref[:].astype(f32),
        p2,
        g_ref[:].astype(f32),
    )
    dacc_ref[:] = d_acc.astype(dacc_ref.dtype)
    dw_ref[:] = d_w.astype(dw_ref.dtype)
    # vector outputs are 2-D (Mosaic rejects 1-D bf16 stores)
    dmask_ref[:] = d_mask.reshape(-1, 1).astype(dmask_ref.dtype)

    # param grads accumulate across the sequential grid
    @pl.when(pl.program_id(0) == 0)
    def _zero():
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)
        dncs_ref[:] = jnp.zeros_like(dncs_ref)
        dncb_ref[:] = jnp.zeros_like(dncb_ref)
        dngs_ref[:] = jnp.zeros_like(dngs_ref)
        dngb_ref[:] = jnp.zeros_like(dngb_ref)

    dw2_ref[:] += pg["w2"].astype(dw2_ref.dtype)
    db2_ref[:] += pg["b2"].reshape(1, -1).astype(db2_ref.dtype)
    dncs_ref[:] += pg["nc_scale"].reshape(1, -1).astype(dncs_ref.dtype)
    dncb_ref[:] += pg["nc_bias"].reshape(1, -1).astype(dncb_ref.dtype)
    dngs_ref[:] += pg["ng_scale"].reshape(1, -1).astype(dngs_ref.dtype)
    dngb_ref[:] += pg["ng_bias"].reshape(1, -1).astype(dngb_ref.dtype)


def _backward(acc_both, weights, mask, p2, g, *, interpret):
    vma = out_vma(acc_both, weights, mask, g)
    n_rows, two_dim = acc_both.shape
    dim = two_dim // 2
    n_tiles = pl.cdiv(n_rows, TILE)
    pad = n_tiles * TILE - n_rows
    if pad:
        acc_both = jnp.pad(acc_both, ((0, pad), (0, 0)))
        weights = jnp.pad(weights, ((0, pad), (0, 0)))
        g = jnp.pad(g, ((0, pad), (0, 0)))
        mask = jnp.pad(mask, (0, pad))

    acc_spec = pl.BlockSpec(
        (TILE, two_dim), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    w_spec = pl.BlockSpec(
        (TILE, dim), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    vec_spec = pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec(
        (TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    mat_spec = pl.BlockSpec(
        (two_dim, two_dim), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    b_spec = pl.BlockSpec((two_dim,), lambda i: (0,), memory_space=pltpu.VMEM)
    d_spec = pl.BlockSpec((dim,), lambda i: (0,), memory_space=pltpu.VMEM)
    row2_spec = pl.BlockSpec(
        (1, two_dim), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    row1_spec = pl.BlockSpec(
        (1, dim), lambda i: (0, 0), memory_space=pltpu.VMEM
    )

    outs = pl.pallas_call(
        _bwd_kernel,
        grid=(n_tiles,),
        in_specs=[
            acc_spec, w_spec, vec_spec, w_spec,
            mat_spec, b_spec, d_spec, d_spec, d_spec, d_spec,
        ],
        out_specs=[
            acc_spec, w_spec, col_spec,
            mat_spec, row2_spec, row1_spec, row1_spec, row1_spec, row1_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct(
                (n_tiles * TILE, two_dim), acc_both.dtype, vma=vma
            ),
            jax.ShapeDtypeStruct(
                (n_tiles * TILE, dim), weights.dtype, vma=vma
            ),
            jax.ShapeDtypeStruct((n_tiles * TILE, 1), mask.dtype, vma=vma),
            # cotangent dtypes must match the p2 primal dtypes; vector
            # outputs carried as 2-D rows (Mosaic-friendly for bf16)
            jax.ShapeDtypeStruct((two_dim, two_dim), p2["w2"].dtype, vma=vma),
            jax.ShapeDtypeStruct((1, two_dim), p2["b2"].dtype, vma=vma),
            jax.ShapeDtypeStruct((1, dim), p2["nc_scale"].dtype, vma=vma),
            jax.ShapeDtypeStruct((1, dim), p2["nc_bias"].dtype, vma=vma),
            jax.ShapeDtypeStruct((1, dim), p2["ng_scale"].dtype, vma=vma),
            jax.ShapeDtypeStruct((1, dim), p2["ng_bias"].dtype, vma=vma),
        ],
        interpret=interpret,
    )(
        acc_both, weights, mask, g,
        p2["w2"], p2["b2"],
        p2["nc_scale"], p2["nc_bias"], p2["ng_scale"], p2["ng_bias"],
    )
    d_acc, d_w, d_mask, dw2, db2, dncs, dncb, dngs, dngb = outs
    d_p2 = {
        "w2": dw2, "b2": db2.reshape(-1),
        "nc_scale": dncs.reshape(-1), "nc_bias": dncb.reshape(-1),
        "ng_scale": dngs.reshape(-1), "ng_bias": dngb.reshape(-1),
    }
    return d_acc[:n_rows], d_w[:n_rows], d_mask[:n_rows, 0], d_p2


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused(acc_both, weights, mask, p2, interpret):
    return _forward(acc_both, weights, mask, p2, interpret=interpret)


def _fused_fwd(acc_both, weights, mask, p2, interpret):
    # recurse through the custom op, NOT the raw pallas_call: training
    # takes grad-of-grad through this fwd, and differentiating the raw
    # kernel rides pallas's generic JVP rule — which fails inside
    # shard_map(check_vma=True) on mixed varying/replicated operands
    # (and needlessly re-derives gradients the hand bwd already has)
    out = _fused(acc_both, weights, mask, p2, interpret)
    return out, (acc_both, weights, mask, p2)


def _fused_bwd(interpret, residuals, g):
    acc_both, weights, mask, p2 = residuals
    return _fused_grads(acc_both, weights, mask, p2, g, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused_grads(acc_both, weights, mask, p2, g, interpret):
    """(d_acc, d_weights, d_mask, d_p2) of the fused message tail.

    Primal = the hand backward kernel; its OWN vjp (grad-of-grad — the
    force-training trace differentiates the inner force gradient)
    differentiates the plain-XLA reference composition instead, so the
    raw pallas_call is never JVP'd (pallas's generic JVP rule fails
    inside shard_map(check_vma=True) and re-derives what the hand
    kernel already computes)."""
    return _backward(acc_both, weights, mask, p2, g, interpret=interpret)


def _fused_grads_fwd(acc_both, weights, mask, p2, g, interpret):
    out = _fused_grads(acc_both, weights, mask, p2, g, interpret)
    return out, (acc_both, weights, mask, p2, g)


def _fused_grads_bwd(interpret, res, cts):
    acc_both, weights, mask, p2, g = res

    def ref_grads(args):
        acc_, w_, m_, p2_, g_ = args
        _, vjp = jax.vjp(_reference, acc_, w_, m_, p2_)
        return vjp(g_)

    _, vjp2 = jax.vjp(ref_grads, (acc_both, weights, mask, p2, g))
    d_args = vjp2(cts)[0]
    return d_args


_fused_grads.defvjp(_fused_grads_fwd, _fused_grads_bwd)


_fused.defvjp(_fused_fwd, _fused_bwd)


# ------------------------------------------------- fused message-reduce
# The tail's output is immediately segment-summed in AtomConv (messages
# -> center atoms) and BondConv (updates -> directed partial sums). The
# separate composition materializes the [L, D] message stream in HBM
# (write + re-read, plus the P-packing relayout the segsum kernel's
# operand needs). This kernel fuses the reduction into the tail: an
# input-stationary sweep over the message stream (the stream_ops v2
# visit-list pattern — the dst keys are SORTED, so output-block revisits
# are consecutive), with the per-block one-hot MXU reduction applied to
# the freshly computed messages in VMEM and the [BO, D] accumulator
# flushed once per output block.


def _reduce_kernel(vchunk_ref, vblk_ref, vfirst_ref, vlast_ref,
                   acc_ref, weights_ref, mask_ref, dst_ref,
                   w2_ref, b2_ref, ncs_ref, ncb_ref, ngs_ref, ngb_ref,
                   out_ref, oacc, *, bo):
    # The mask multiplies the ONE-HOT on its lane axis instead of the
    # message rows: no [1,C] -> [C,1] relayout, and — crucially — it is
    # NOT redundant with the dst-drop convention: the simulation loops'
    # dynamic-cutoff masks (apply_dynamic_cutoff) zero masks of edges
    # that drift past the exact cutoff WITHOUT touching the static plan
    # dst streams, so masked rows can carry in-range dst.
    f32 = jnp.float32
    s = pl.program_id(0)
    dim = out_ref.shape[1]

    @pl.when(vfirst_ref[s] == 1)
    def _():
        oacc[...] = jnp.zeros_like(oacc)

    h = jax.nn.silu(acc_ref[:].astype(f32))
    y = (
        jnp.dot(h, w2_ref[:].astype(f32), preferred_element_type=f32)
        + b2_ref[:].astype(f32)
    )
    core = _ln(y[:, :dim], ncs_ref[:].astype(f32), ncb_ref[:].astype(f32))
    gate = _ln(y[:, dim:], ngs_ref[:].astype(f32), ngb_ref[:].astype(f32))
    msg = (
        jax.nn.silu(core)
        * jax.nn.sigmoid(gate)
        * weights_ref[:].astype(f32)
    )  # [C, D] f32
    blk = vblk_ref[s]
    local = dst_ref[0].astype(jnp.int32) - blk * bo  # [1, C]
    iota = jax.lax.broadcasted_iota(jnp.int32, (bo, 1), 0)
    onehot = (iota == local).astype(f32) * mask_ref[0].astype(f32)
    oacc[...] += jax.lax.dot_general(
        onehot,  # [BO, C], masked
        msg,
        (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
        precision=jax.lax.Precision.HIGHEST,
    )

    @pl.when(vlast_ref[s] == 1)
    def _():
        out_ref[...] = oacc[...].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_out", "interpret"))
def _reduce_pallas(acc_both, weights, mask, dst, blk_lo, blk_cnt, p2,
                   *, n_out, interpret=False):
    from chgnet_tpu.ops.stream_ops import BO, C, _visit_plan

    n_rows, two_dim = acc_both.shape
    dim = two_dim // 2
    n_chunks = n_rows // C
    n_blocks = -(-n_out // BO)
    vchunk, vblk, vfirst, vlast = _visit_plan(
        jnp.asarray(blk_lo), jnp.asarray(blk_cnt), n_chunks, n_blocks
    )
    # mask and dst ride as [n_chunks, 1, C] (dim-0 blocks need no
    # sublane alignment; a blocked 1-D bf16 operand at 512 trips Mosaic)
    mask3d = mask.reshape(n_chunks, 1, C)
    dst3d = dst.reshape(n_chunks, 1, C)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(vchunk.shape[0],),
        in_specs=[
            pl.BlockSpec((C, two_dim), lambda s, vc, vb, vf, vl: (vc[s], 0)),
            pl.BlockSpec((C, dim), lambda s, vc, vb, vf, vl: (vc[s], 0)),
            pl.BlockSpec(
                (1, 1, C), lambda s, vc, vb, vf, vl: (vc[s], 0, 0)
            ),
            pl.BlockSpec(
                (1, 1, C), lambda s, vc, vb, vf, vl: (vc[s], 0, 0)
            ),
            pl.BlockSpec(
                (two_dim, two_dim), lambda s, vc, vb, vf, vl: (0, 0)
            ),
            pl.BlockSpec((two_dim,), lambda s, vc, vb, vf, vl: (0,)),
            pl.BlockSpec((dim,), lambda s, vc, vb, vf, vl: (0,)),
            pl.BlockSpec((dim,), lambda s, vc, vb, vf, vl: (0,)),
            pl.BlockSpec((dim,), lambda s, vc, vb, vf, vl: (0,)),
            pl.BlockSpec((dim,), lambda s, vc, vb, vf, vl: (0,)),
        ],
        out_specs=pl.BlockSpec(
            (BO, dim), lambda s, vc, vb, vf, vl: (vb[s], 0)
        ),
        scratch_shapes=[pltpu.VMEM((BO, dim), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_reduce_kernel, bo=BO),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_out, dim), acc_both.dtype,
            vma=out_vma(acc_both, weights, mask, dst),
        ),
        interpret=interpret,
    )(
        vchunk, vblk, vfirst, vlast,
        acc_both, weights, mask3d, dst3d,
        p2["w2"], p2["b2"],
        p2["nc_scale"], p2["nc_bias"], p2["ng_scale"], p2["ng_bias"],
    )


def _reduce_reference(acc_both, weights, mask, dst, n_out, p2):
    msg = _reference(acc_both, weights, mask, p2)
    return jax.ops.segment_sum(
        msg, dst, num_segments=n_out, indices_are_sorted=True
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 10))
def _msg_reduce(acc_both, weights, mask, dst, blk, n_out, p2,
                g_lo, g_cnt, pw, interpret):
    blk_lo, blk_cnt = blk
    return _reduce_pallas(
        acc_both, weights, mask, dst, blk_lo, blk_cnt, p2,
        n_out=n_out, interpret=interpret,
    )


def _msg_reduce_fwd(acc_both, weights, mask, dst, blk, n_out, p2,
                    g_lo, g_cnt, pw, interpret):
    out = _msg_reduce(
        acc_both, weights, mask, dst, blk, n_out, p2, g_lo, g_cnt, pw,
        interpret,
    )
    return out, (acc_both, weights, mask, dst, blk, p2, g_lo, g_cnt, pw)


def _msg_reduce_bwd(n_out, interpret, res, ct):
    from chgnet_tpu.ops.stream_ops import expand_rows

    acc_both, weights, mask, dst, blk, p2, g_lo, g_cnt, pw = res
    blk_lo, blk_cnt = blk
    # per-row cotangent: ct[dst] with dropped (padded) rows zeroed —
    # rides the streaming window-gather when the plan carries one; then
    # the tail's hand backward (an established custom op, second-order
    # safe) turns it into (d_acc, d_weights, d_mask, d_p2)
    ct_rows = expand_rows(
        ct, dst, blk_lo, blk_cnt, g_lo, g_cnt, pw, n_out, False
    )
    d_acc, d_w, d_mask, d_p2 = _fused_grads(
        acc_both, weights, mask, p2, ct_rows, interpret
    )
    return (d_acc, d_w, d_mask, None, None, d_p2, None, None, None)


_msg_reduce.defvjp(_msg_reduce_fwd, _msg_reduce_bwd)


def msg_reduce_ok(acc_both, plan, n_out: int) -> bool:
    """Trace-time eligibility for the fused message-reduce: TPU, a
    sorted-stream block plan over ``dst`` (``plan.dst`` IS the scatter
    key stream with padding >= n_out), kernel-aligned shapes.

    OPT-IN (``CHGNET_TPU_MSG_REDUCE=<any non-empty value>``): the round-5
    same-session bench A/B measured the fused sweep at 1.734 vs_baseline
    against 1.842 with it disabled (-5.9% E+F+S+M), so per its sunset
    rule it is demoted from default-on (see docs/performance.md)."""
    import os

    from chgnet_tpu.ops import stream_ops

    return (
        bool(os.environ.get("CHGNET_TPU_MSG_REDUCE"))
        and not os.environ.get("CHGNET_TPU_NO_MSG_REDUCE")
        and plan is not None
        and plan.perm.shape[0] == 0
        and plan.raw.shape[0] == 0
        and plan.blk_lo.shape[0] == -(-n_out // stream_ops.BO)
        and acc_both.ndim == 2
        and acc_both.shape[0] % stream_ops.C == 0
        and acc_both.shape[1] % 128 == 0
        and n_out % stream_ops.BO == 0
        and stream_ops.tpu_backend()
    )


def fused_gated_message_reduce(
    acc_both: jnp.ndarray,  # [L, 2D] joint first-layer sums
    weights: jnp.ndarray,  # [L, D]
    mask: jnp.ndarray,  # [L]
    p2: dict,
    plan,  # GatherPlan of the SORTED dst stream (dst == scatter keys)
    n_out: int,
) -> jnp.ndarray:
    """``segment_sum(fused_gated_message(...), plan.dst, n_out)`` in one
    kernel sweep (callers must check :func:`msg_reduce_ok`)."""
    interpret = jax.default_backend() != "tpu"
    g_lo = plan.g_lo if plan.g_lo.shape[0] else None
    g_cnt = plan.g_cnt if g_lo is not None else None
    pw = plan.pw if plan.pw.shape[0] else None
    return _msg_reduce(
        acc_both, weights, mask, jnp.asarray(plan.dst),
        (jnp.asarray(plan.blk_lo), jnp.asarray(plan.blk_cnt)), n_out, p2,
        g_lo, g_cnt, pw, interpret,
    )


def fused_gated_message(
    acc_both: jnp.ndarray,  # [E, 2D] joint first-layer sums (core | gate)
    weights: jnp.ndarray,  # [E, D] per-edge scale (bond weights)
    mask: jnp.ndarray,  # [E]
    p2: dict,  # w2 (block-diag [2D,2D]), b2 [2D], nc_*/ng_* norm params
    *,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Fused gated message tail; falls back to plain XLA off-TPU and for
    off-TPU; streams may be bf16 — in-kernel
    math runs in f32."""
    if use_pallas is None:
        use_pallas = stream_ops.tpu_backend()  # monkeypatchable in tests
    if not use_pallas:
        return _reference(acc_both, weights, mask, p2)
    interpret = jax.default_backend() != "tpu"
    return _fused(acc_both, weights, mask, p2, interpret)


# ------------------------------------------- weights-free tail (AngleUpdate)
# Two shapes: ``w2`` present = 2-Linear branches (silu + block-diag matmul
# before the norms); ``w2`` absent = single-Linear branches (the default
# AngleUpdate: angle_layer_hidden_dim=0, so ``acc`` IS ``y`` — no
# activation, no matmul; see gated_mlp_gather_apply's n_layers==1 path).
def _tail_nw(y, dim, p2):
    core = _ln(y[:, :dim], p2["nc_scale"], p2["nc_bias"])
    gate = _ln(y[:, dim:], p2["ng_scale"], p2["ng_bias"])
    return jax.nn.silu(core) * jax.nn.sigmoid(gate)


def _y_of_acc(acc, p2):
    if "w2" not in p2:
        return acc
    return (
        jnp.dot(
            jax.nn.silu(acc), p2["w2"], preferred_element_type=jnp.float32
        )
        + p2["b2"]
    )


def _kernel_nw(*refs, has_w2):
    if has_w2:
        (acc_ref, res_ref, w2_ref, b2_ref,
         ncs_ref, ncb_ref, ngs_ref, ngb_ref, out_ref) = refs
    else:
        (acc_ref, res_ref,
         ncs_ref, ncb_ref, ngs_ref, ngb_ref, out_ref) = refs
    f32 = jnp.float32
    dim = out_ref.shape[1]
    p2 = {
        "nc_scale": ncs_ref[:].astype(f32), "nc_bias": ncb_ref[:].astype(f32),
        "ng_scale": ngs_ref[:].astype(f32), "ng_bias": ngb_ref[:].astype(f32),
    }
    if has_w2:
        p2["w2"] = w2_ref[:].astype(f32)
        p2["b2"] = b2_ref[:].astype(f32)
    y = _y_of_acc(acc_ref[:].astype(f32), p2)
    out_ref[:] = (
        _tail_nw(y, dim, p2) + res_ref[:].astype(f32)
    ).astype(out_ref.dtype)


def _forward_nw(acc_both, resnet, p2, *, interpret):
    n_rows, two_dim = acc_both.shape
    dim = two_dim // 2
    has_w2 = "w2" in p2
    n_tiles = pl.cdiv(n_rows, TILE)
    pad = n_tiles * TILE - n_rows
    if pad:
        acc_both = jnp.pad(acc_both, ((0, pad), (0, 0)))
        resnet = jnp.pad(resnet, ((0, pad), (0, 0)))
    acc_spec = pl.BlockSpec(
        (TILE, two_dim), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    w_spec = pl.BlockSpec(
        (TILE, dim), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    mat_spec = pl.BlockSpec(
        (two_dim, two_dim), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    b_spec = pl.BlockSpec((two_dim,), lambda i: (0,), memory_space=pltpu.VMEM)
    d_spec = pl.BlockSpec((dim,), lambda i: (0,), memory_space=pltpu.VMEM)
    in_specs = [acc_spec, w_spec]
    operands = [acc_both, resnet]
    if has_w2:
        in_specs += [mat_spec, b_spec]
        operands += [p2["w2"], p2["b2"]]
    in_specs += [d_spec, d_spec, d_spec, d_spec]
    operands += [
        p2["nc_scale"], p2["nc_bias"], p2["ng_scale"], p2["ng_bias"]
    ]
    out = pl.pallas_call(
        functools.partial(_kernel_nw, has_w2=has_w2),
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=w_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_tiles * TILE, dim), acc_both.dtype,
            vma=out_vma(acc_both, resnet),
        ),
        interpret=interpret,
    )(*operands)
    return out[:n_rows]


def _reference_nw(acc_both, resnet, p2):
    dim = acc_both.shape[1] // 2
    return _tail_nw(_y_of_acc(acc_both, p2), dim, p2) + resnet


def _bwd_math_nw(acc, p2, g):
    """Recompute + hand gradients for the weights-free tail (the resnet
    add's gradient is g itself, handled by the caller)."""
    dim = g.shape[-1]
    has_w2 = "w2" in p2
    if has_w2:
        h = jax.nn.silu(acc)
        y = (
            jnp.dot(h, p2["w2"], preferred_element_type=jnp.float32)
            + p2["b2"]
        )
    else:
        y = acc
    zc, invc = _ln_parts(y[:, :dim])
    zg, invg = _ln_parts(y[:, dim:])
    cn = zc * p2["nc_scale"] + p2["nc_bias"]
    gn = zg * p2["ng_scale"] + p2["ng_bias"]
    silu_cn = jax.nn.silu(cn)
    sig_gn = jax.nn.sigmoid(gn)
    d_cn = g * sig_gn * _silu_grad(cn)
    d_gn = g * silu_cn * sig_gn * (1.0 - sig_gn)
    d_y = jnp.concatenate(
        [_ln_bwd(d_cn, zc, invc, p2["nc_scale"]),
         _ln_bwd(d_gn, zg, invg, p2["ng_scale"])],
        axis=-1,
    )
    param_grads = {
        "nc_scale": (d_cn * zc).sum(axis=0),
        "nc_bias": d_cn.sum(axis=0),
        "ng_scale": (d_gn * zg).sum(axis=0),
        "ng_bias": d_gn.sum(axis=0),
    }
    if has_w2:
        d_h = jnp.dot(d_y, p2["w2"].T, preferred_element_type=jnp.float32)
        d_acc = d_h * _silu_grad(acc)
        param_grads["w2"] = jnp.dot(
            h.T, d_y, preferred_element_type=jnp.float32
        )
        param_grads["b2"] = d_y.sum(axis=0)
    else:
        d_acc = d_y
    return d_acc, param_grads


def _bwd_kernel_nw(*refs, has_w2):
    if has_w2:
        (acc_ref, g_ref,
         w2_ref, b2_ref, ncs_ref, ncb_ref, ngs_ref, ngb_ref,
         dacc_ref,
         dw2_ref, db2_ref, dncs_ref, dncb_ref, dngs_ref, dngb_ref) = refs
    else:
        (acc_ref, g_ref,
         ncs_ref, ncb_ref, ngs_ref, ngb_ref,
         dacc_ref,
         dncs_ref, dncb_ref, dngs_ref, dngb_ref) = refs
    f32 = jnp.float32
    p2 = {
        "nc_scale": ncs_ref[:].astype(f32), "nc_bias": ncb_ref[:].astype(f32),
        "ng_scale": ngs_ref[:].astype(f32), "ng_bias": ngb_ref[:].astype(f32),
    }
    if has_w2:
        p2["w2"] = w2_ref[:].astype(f32)
        p2["b2"] = b2_ref[:].astype(f32)
    d_acc, pg = _bwd_math_nw(
        acc_ref[:].astype(f32), p2, g_ref[:].astype(f32)
    )
    dacc_ref[:] = d_acc.astype(dacc_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        if has_w2:
            dw2_ref[:] = jnp.zeros_like(dw2_ref)
            db2_ref[:] = jnp.zeros_like(db2_ref)
        dncs_ref[:] = jnp.zeros_like(dncs_ref)
        dncb_ref[:] = jnp.zeros_like(dncb_ref)
        dngs_ref[:] = jnp.zeros_like(dngs_ref)
        dngb_ref[:] = jnp.zeros_like(dngb_ref)

    if has_w2:
        dw2_ref[:] += pg["w2"].astype(dw2_ref.dtype)
        db2_ref[:] += pg["b2"].reshape(1, -1).astype(db2_ref.dtype)
    dncs_ref[:] += pg["nc_scale"].reshape(1, -1).astype(dncs_ref.dtype)
    dncb_ref[:] += pg["nc_bias"].reshape(1, -1).astype(dncb_ref.dtype)
    dngs_ref[:] += pg["ng_scale"].reshape(1, -1).astype(dngs_ref.dtype)
    dngb_ref[:] += pg["ng_bias"].reshape(1, -1).astype(dngb_ref.dtype)


def _backward_nw(acc_both, p2, g, *, interpret):
    n_rows, two_dim = acc_both.shape
    dim = two_dim // 2
    has_w2 = "w2" in p2
    n_tiles = pl.cdiv(n_rows, TILE)
    pad = n_tiles * TILE - n_rows
    if pad:
        acc_both = jnp.pad(acc_both, ((0, pad), (0, 0)))
        g = jnp.pad(g, ((0, pad), (0, 0)))
    acc_spec = pl.BlockSpec(
        (TILE, two_dim), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    w_spec = pl.BlockSpec(
        (TILE, dim), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    mat_spec = pl.BlockSpec(
        (two_dim, two_dim), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    b_spec = pl.BlockSpec((two_dim,), lambda i: (0,), memory_space=pltpu.VMEM)
    d_spec = pl.BlockSpec((dim,), lambda i: (0,), memory_space=pltpu.VMEM)
    row2_spec = pl.BlockSpec(
        (1, two_dim), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    row1_spec = pl.BlockSpec(
        (1, dim), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [acc_spec, w_spec]
    operands = [acc_both, g]
    if has_w2:
        in_specs += [mat_spec, b_spec]
        operands += [p2["w2"], p2["b2"]]
    in_specs += [d_spec, d_spec, d_spec, d_spec]
    operands += [
        p2["nc_scale"], p2["nc_bias"], p2["ng_scale"], p2["ng_bias"]
    ]
    vma = out_vma(acc_both, g)
    out_specs = [acc_spec]
    out_shape = [
        jax.ShapeDtypeStruct(
            (n_tiles * TILE, two_dim), acc_both.dtype, vma=vma
        )
    ]
    if has_w2:
        out_specs += [mat_spec, row2_spec]
        out_shape += [
            jax.ShapeDtypeStruct((two_dim, two_dim), p2["w2"].dtype, vma=vma),
            jax.ShapeDtypeStruct((1, two_dim), p2["b2"].dtype, vma=vma),
        ]
    out_specs += [row1_spec] * 4
    out_shape += [
        jax.ShapeDtypeStruct((1, dim), p2["nc_scale"].dtype, vma=vma),
        jax.ShapeDtypeStruct((1, dim), p2["nc_bias"].dtype, vma=vma),
        jax.ShapeDtypeStruct((1, dim), p2["ng_scale"].dtype, vma=vma),
        jax.ShapeDtypeStruct((1, dim), p2["ng_bias"].dtype, vma=vma),
    ]
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel_nw, has_w2=has_w2),
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*operands)
    d_acc = outs[0]
    rest = list(outs[1:])
    d_p2 = {}
    if has_w2:
        d_p2["w2"] = rest.pop(0)
        d_p2["b2"] = rest.pop(0).reshape(-1)
    d_p2["nc_scale"] = rest.pop(0).reshape(-1)
    d_p2["nc_bias"] = rest.pop(0).reshape(-1)
    d_p2["ng_scale"] = rest.pop(0).reshape(-1)
    d_p2["ng_bias"] = rest.pop(0).reshape(-1)
    return d_acc[:n_rows], d_p2


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_nw(acc_both, resnet, p2, interpret):
    return _forward_nw(acc_both, resnet, p2, interpret=interpret)


def _fused_nw_fwd(acc_both, resnet, p2, interpret):
    # recurse through the custom op (see _fused_fwd)
    out = _fused_nw(acc_both, resnet, p2, interpret)
    return out, (acc_both, p2)


def _fused_nw_bwd(interpret, residuals, g):
    acc_both, p2 = residuals
    d_acc, d_p2 = _fused_nw_grads(acc_both, p2, g, interpret)
    # the resnet add is linear: d_resnet = g (cast to the resnet dtype)
    return d_acc, g.astype(acc_both.dtype), d_p2


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_nw_grads(acc_both, p2, g, interpret):
    """(d_acc, d_p2) of the weights-free tail (see _fused_grads)."""
    return _backward_nw(acc_both, p2, g, interpret=interpret)


def _fused_nw_grads_fwd(acc_both, p2, g, interpret):
    out = _fused_nw_grads(acc_both, p2, g, interpret)
    return out, (acc_both, p2, g)


def _fused_nw_grads_bwd(interpret, res, cts):
    acc_both, p2, g = res

    def ref_grads(args):
        acc_, p2_, g_ = args
        dim = acc_.shape[1] // 2

        def fwd_nw(a, pp):
            return _tail_nw(_y_of_acc(a, pp), dim, pp)

        _, vjp = jax.vjp(fwd_nw, acc_, p2_)
        return vjp(g_)

    _, vjp2 = jax.vjp(ref_grads, (acc_both, p2, g))
    return vjp2(cts)[0]


_fused_nw_grads.defvjp(_fused_nw_grads_fwd, _fused_nw_grads_bwd)


_fused_nw.defvjp(_fused_nw_fwd, _fused_nw_bwd)


def fused_gated_update(
    acc_both: jnp.ndarray,  # [A, 2D] joint first-layer sums (core | gate)
    resnet: jnp.ndarray,  # [A, D] residual stream added to the output
    p2: dict,  # gated_mlp_fused_pack params
    *,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Weights-free fused gated-MLP tail with the resnet add folded in —
    the AngleUpdate shape (``/root/reference/chgnet/model/layers.py:321-363``:
    no aggregation, no bond-weight scaling). Same fallback rules as
    :func:`fused_gated_message`."""
    if use_pallas is None:
        use_pallas = stream_ops.tpu_backend()  # monkeypatchable in tests
    if not use_pallas:
        return _reference_nw(acc_both, resnet, p2)
    interpret = jax.default_backend() != "tpu"
    return _fused_nw(acc_both, resnet, p2, interpret)
