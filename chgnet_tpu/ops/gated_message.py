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
    dim = out_ref.shape[1]
    h = jax.nn.silu(acc_ref[:])
    y = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:]
    p2 = {
        "nc_scale": ncs_ref[:], "nc_bias": ncb_ref[:],
        "ng_scale": ngs_ref[:], "ng_bias": ngb_ref[:],
    }
    out_ref[:] = _tail(y, weights_ref[:], mask_ref[:], p2, dim).astype(
        out_ref.dtype
    )


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
        out_shape=jax.ShapeDtypeStruct((n_tiles * TILE, dim), acc_both.dtype),
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused(acc_both, weights, mask, p2, interpret):
    return _forward(acc_both, weights, mask, p2, interpret=interpret)


def _fused_fwd(acc_both, weights, mask, p2, interpret):
    out = _forward(acc_both, weights, mask, p2, interpret=interpret)
    return out, (acc_both, weights, mask, p2)


def _fused_bwd(interpret, residuals, g):
    acc_both, weights, mask, p2 = residuals
    _, vjp = jax.vjp(_reference, acc_both, weights, mask, p2)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_gated_message(
    acc_both: jnp.ndarray,  # [E, 2D] joint first-layer sums (core | gate)
    weights: jnp.ndarray,  # [E, D] per-edge scale (bond weights)
    mask: jnp.ndarray,  # [E]
    p2: dict,  # w2 (block-diag [2D,2D]), b2 [2D], nc_*/ng_* norm params
    *,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Fused gated message tail; falls back to plain XLA off-TPU."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not use_pallas:
        return _reference(acc_both, weights, mask, p2)
    interpret = jax.default_backend() != "tpu"
    return _fused(acc_both, weights, mask, p2, interpret)
