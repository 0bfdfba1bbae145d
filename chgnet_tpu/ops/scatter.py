"""Gathers with sorted-scatter backward plans.

The hot loop gathers rows from small tables into long edge/angle streams
(``layers.py``, ``chgnet.py:_energy_core``). Under ``jax.grad`` each gather
transposes to a scatter-add with the SAME index array — and for the
neighbor / bond-j / d2u streams those indices are unsorted, which on TPU
lowers to a serialized random-RMW scatter that dominates the E+F+S+M
backward (the reference hits the same wall through torch ``index_add_``,
``/root/reference/chgnet/model/functions.py:10-40``).

Indices are host-built constants per batch, so the fix is free at trace
time: precompute, per index stream, the stable permutation that sorts it.
The custom-VJP gather then backpropagates as

    dtable = segment_sum(ct[perm], idx_sorted, N, indices_are_sorted=True)

i.e. one bandwidth-bound permutation gather plus one SORTED segment sum —
no random scatter anywhere. Padded rows keep the sorted invariant by
mapping to ``num_segments`` (dropped by XLA's out-of-bounds scatter
semantics), and their cotangents are exactly zero anyway (masked tails).

``GatherPlan`` rides inside ``GraphBatch`` (see ``graph/batching.py``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class GatherPlan(NamedTuple):
    """Backward plan for one gather stream (host-precomputed).

    ``perm`` stably sorts the stream by destination id; ``dst`` is the
    sorted destination ids with padding mapped out-of-range (dropped).
    ``perm.shape == (0,)`` means the stream is already sorted and only
    ``dst`` is needed (identity permutation).
    """

    perm: np.ndarray  # i32 [L] or [0]
    dst: np.ndarray  # i32 [L]


_EMPTY = np.zeros(0, np.int32)


def make_plan(
    idx: np.ndarray,
    valid: np.ndarray,
    num_segments: int,
    *,
    assume_sorted: bool = False,
) -> GatherPlan:
    """Build a GatherPlan for stream ``idx`` with validity mask ``valid``.

    ``assume_sorted`` marks streams sorted BY CONSTRUCTION (identity
    permutation, checked); other streams always carry a full permutation so
    plan shapes are data-independent (stable jit caches / DP stacking).
    """
    idx = np.asarray(idx)
    key = np.where(valid, idx, num_segments)
    if assume_sorted:
        if not bool((np.diff(key) >= 0).all()):
            raise ValueError("assume_sorted plan over an unsorted stream")
        return GatherPlan(perm=_EMPTY, dst=key.astype(np.int32))
    perm = np.argsort(key, kind="stable")
    return GatherPlan(
        perm=perm.astype(np.int32), dst=key[perm].astype(np.int32)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _gather_perm(table, idx, perm, dst, num_segments):
    return table[idx]


def _gather_perm_fwd(table, idx, perm, dst, num_segments):
    return table[idx], (idx, perm, dst)


def _gather_perm_bwd(num_segments, res, ct):
    idx, perm, dst = res
    dtable = jax.ops.segment_sum(
        ct[perm], dst, num_segments, indices_are_sorted=True
    )
    return (dtable, None, None, None)


_gather_perm.defvjp(_gather_perm_fwd, _gather_perm_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _gather_sorted(table, idx, dst, num_segments):
    return table[idx]


def _gather_sorted_fwd(table, idx, dst, num_segments):
    return table[idx], (idx, dst)


def _gather_sorted_bwd(num_segments, res, ct):
    idx, dst = res
    dtable = jax.ops.segment_sum(
        ct, dst, num_segments, indices_are_sorted=True
    )
    return (dtable, None, None)


_gather_sorted.defvjp(_gather_sorted_fwd, _gather_sorted_bwd)


def plan_gather(
    table: jnp.ndarray, idx: jnp.ndarray, plan: GatherPlan | None
) -> jnp.ndarray:
    """``table[idx]`` whose backward is a sorted segment sum per ``plan``.

    ``plan=None`` (or an empty plan) falls back to the plain gather with
    XLA's default scatter-add transpose.
    """
    if plan is None or plan.dst.shape[0] == 0:
        return table[idx]
    n = table.shape[0]
    if plan.perm.shape[0] == 0:
        return _gather_sorted(table, idx, plan.dst, n)
    return _gather_perm(table, idx, plan.perm, plan.dst, n)
