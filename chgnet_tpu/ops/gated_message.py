"""Pallas TPU kernel: fused gated message computation.

The per-edge tail of every conv layer is

    msg = silu(LN(silu(acc_core) @ W2c + b2c))
        * sigmoid(LN(silu(acc_gate) @ W2g + b2g))
        * weights * mask

(the first gated-MLP layer is already decomposed onto the node tables by
``gated_mlp_gather_apply``). Under plain XLA the two [E, D] x [D, D]
matmuls force materialization boundaries, so the chain costs ~6 HBM
round-trips of [E, D] tensors; this kernel streams each edge tile through
VMEM once — activations, both MXU matmuls, norms, gating, weighting and
masking fused — for ~3 reads + 1 write.

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


def _kernel(
    acc_core_ref,
    acc_gate_ref,
    weights_ref,
    mask_ref,
    w2c_ref,
    b2c_ref,
    w2g_ref,
    b2g_ref,
    nc_scale_ref,
    nc_bias_ref,
    ng_scale_ref,
    ng_bias_ref,
    out_ref,
):
    act = jax.nn.silu
    core = act(acc_core_ref[:])
    core = (
        jnp.dot(core, w2c_ref[:], preferred_element_type=jnp.float32)
        + b2c_ref[:]
    )
    core = _ln(core, nc_scale_ref[:], nc_bias_ref[:])
    gate = act(acc_gate_ref[:])
    gate = (
        jnp.dot(gate, w2g_ref[:], preferred_element_type=jnp.float32)
        + b2g_ref[:]
    )
    gate = _ln(gate, ng_scale_ref[:], ng_bias_ref[:])
    out_ref[:] = (
        act(core)
        * jax.nn.sigmoid(gate)
        * weights_ref[:]
        * mask_ref[:].reshape(-1, 1)
    )


def _forward(acc_core, acc_gate, weights, mask, p2, *, interpret):
    n_rows, dim = acc_core.shape
    n_tiles = pl.cdiv(n_rows, TILE)
    pad = n_tiles * TILE - n_rows
    if pad:
        acc_core, acc_gate, weights = (
            jnp.pad(x, ((0, pad), (0, 0)))
            for x in (acc_core, acc_gate, weights)
        )
        mask = jnp.pad(mask, (0, pad))

    row_spec = pl.BlockSpec(
        (TILE, dim), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    vec_spec = pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM)
    full_mat = pl.BlockSpec(
        (dim, dim), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    full_vec = pl.BlockSpec((dim,), lambda i: (0,), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _kernel,
        grid=(n_tiles,),
        in_specs=[
            row_spec, row_spec, row_spec, vec_spec,
            full_mat, full_vec, full_mat, full_vec,
            full_vec, full_vec, full_vec, full_vec,
        ],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * TILE, dim), acc_core.dtype),
        interpret=interpret,
    )(
        acc_core, acc_gate, weights, mask,
        p2["w2c"], p2["b2c"], p2["w2g"], p2["b2g"],
        p2["nc_scale"], p2["nc_bias"], p2["ng_scale"], p2["ng_bias"],
    )
    return out[:n_rows]


def _reference(acc_core, acc_gate, weights, mask, p2):
    """Plain-XLA composition (identical math; used for backward and as
    the fallback path)."""
    act = jax.nn.silu
    core = jnp.dot(act(acc_core), p2["w2c"]) + p2["b2c"]
    core = _ln(core, p2["nc_scale"], p2["nc_bias"])
    gate = jnp.dot(act(acc_gate), p2["w2g"]) + p2["b2g"]
    gate = _ln(gate, p2["ng_scale"], p2["ng_bias"])
    return act(core) * jax.nn.sigmoid(gate) * weights * mask[:, None]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused(acc_core, acc_gate, weights, mask, p2, interpret):
    return _forward(acc_core, acc_gate, weights, mask, p2, interpret=interpret)


def _fused_fwd(acc_core, acc_gate, weights, mask, p2, interpret):
    out = _forward(acc_core, acc_gate, weights, mask, p2, interpret=interpret)
    return out, (acc_core, acc_gate, weights, mask, p2)


def _fused_bwd(interpret, residuals, g):
    acc_core, acc_gate, weights, mask, p2 = residuals
    _, vjp = jax.vjp(_reference, acc_core, acc_gate, weights, mask, p2)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_gated_message(
    acc_core: jnp.ndarray,  # [E, D] first-layer core sum (pre-activation)
    acc_gate: jnp.ndarray,  # [E, D]
    weights: jnp.ndarray,  # [E, D] per-edge scale (bond weights)
    mask: jnp.ndarray,  # [E]
    p2: dict,  # second-layer + norm params (w2c/b2c/w2g/b2g/nc_*/ng_*)
    *,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Fused gated message tail; falls back to plain XLA off-TPU."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not use_pallas:
        return _reference(acc_core, acc_gate, weights, mask, p2)
    interpret = jax.default_backend() != "tpu"
    return _fused(acc_core, acc_gate, weights, mask, p2, interpret)
