"""Streaming window-gather kernel (ops/stream_ops.py).

Unlike the segment-sum kernel (TPU-only in tests), the gather kernel runs
here in Pallas interpret mode on the CPU backend — exactness is asserted
against numpy fancy indexing, including multi-chunk windows, masked rows
and every supported feature width.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from chgnet_tpu.ops import stream_ops as so
from chgnet_tpu.ops.scatter import make_plan


def _window_local_idx(rng, S, L, window):
    nb = L // so.BO
    idx = np.empty(L, np.int32)
    for b in range(nb):
        base = int(b * max(S - window, 0) / max(nb - 1, 1))
        idx[b * so.BO : (b + 1) * so.BO] = base + rng.integers(
            0, window, so.BO
        )
    return idx


@pytest.mark.parametrize(
    ("d", "dtype"),
    [(32, np.float32), (64, np.float32), (64, jnp.bfloat16), (128, jnp.bfloat16), (256, np.float32)],
)
def test_gather_kernel_exact(d, dtype):
    rng = np.random.default_rng(0)
    S, L = 2048, 2048
    src = rng.standard_normal((S, d)).astype(dtype)
    idx = _window_local_idx(rng, S, L, 700)
    g_lo, g_cnt, visits = so.build_gather_plan(idx, np.ones(L, bool), S)
    out = np.asarray(
        so._gather_pallas(
            jnp.asarray(src), jnp.asarray(idx),
            jnp.asarray(g_lo), jnp.asarray(g_cnt), interpret=True,
        )
    )
    assert np.array_equal(out, np.asarray(src)[idx])


def test_gather_kernel_masked_rows_zero_or_exact():
    """Rows excluded from the window plan come out zero (or exact when the
    index happens to fall inside the window) — consumers always mask."""
    rng = np.random.default_rng(1)
    S, L, d = 2048, 2048, 64
    src = rng.standard_normal((S, d)).astype(np.float32)
    idx = _window_local_idx(rng, S, L, 600)
    valid = np.ones(L, bool)
    bad_rows = rng.choice(L, 100, replace=False)
    valid[bad_rows] = False
    idx[bad_rows] = rng.integers(0, S, 100)  # wild indices on masked rows
    g_lo, g_cnt, _ = so.build_gather_plan(idx, valid, S)
    out = np.asarray(
        so._gather_pallas(
            jnp.asarray(src), jnp.asarray(idx),
            jnp.asarray(g_lo), jnp.asarray(g_cnt), interpret=True,
        )
    )
    ref = src[idx]
    assert np.array_equal(out[valid], ref[valid])
    for r in bad_rows:
        assert (out[r] == 0).all() or (out[r] == ref[r]).all()


def test_build_gather_plan_covers_all_valid_rows():
    rng = np.random.default_rng(2)
    S, L = 4096, 4096
    idx = _window_local_idx(rng, S, L, 900)
    g_lo, g_cnt, visits = so.build_gather_plan(idx, np.ones(L, bool), S)
    for b in range(L // so.BO):
        seg = idx[b * so.BO : (b + 1) * so.BO]
        lo, hi = g_lo[b], g_lo[b] + g_cnt[b] * so.C
        assert lo % so.C == 0
        assert lo <= seg.min() and seg.max() < hi
    assert visits == int(g_cnt.sum())


def test_build_gather_plan_rejects_unaligned():
    idx = np.zeros(so.BO + 1, np.int32)
    assert so.build_gather_plan(idx, np.ones(len(idx), bool), 4096) is None
    # tiny source tables can't take a full chunk DMA
    idx = np.zeros(so.BO, np.int32)
    assert so.build_gather_plan(idx, np.ones(so.BO, bool), so.C - 1) is None


def test_make_plan_attaches_gather_window_only_when_local():
    rng = np.random.default_rng(3)
    S, L = 4096, 4096
    local = _window_local_idx(rng, S, L, 800)
    valid = np.ones(L, bool)
    plan = make_plan(local, valid, S)
    assert plan.g_lo.shape[0] == L // so.BO  # window-local -> kernel plan
    scattered = rng.integers(0, S, L).astype(np.int32)
    plan2 = make_plan(scattered, valid, S)
    assert plan2.g_lo.shape[0] == 0  # random stream -> XLA gather
