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


# ------------------------------------------------- fused multi-gather-sum
@pytest.mark.parametrize(
    ("d", "dtype"), [(64, np.float32), (128, np.float32), (128, jnp.bfloat16)]
)
def test_multi_gather_sum_exact(d, dtype):
    """Fused K-part window-gather + aligned stream equals the unfused sum
    (interpret mode; f32 exact — one-hot row selection copies rows)."""
    rng = np.random.default_rng(5)
    S1, S2, L = 2048, 4096, 2048
    a = rng.standard_normal((S1, d)).astype(dtype)
    b = rng.standard_normal((S2, d)).astype(dtype)
    stream = rng.standard_normal((L, d)).astype(dtype)
    ia = _window_local_idx(rng, S1, L, 700)
    ib = _window_local_idx(rng, S2, L, 900)
    plans = [
        so.build_gather_plan(i, np.ones(L, bool), s.shape[0])
        for i, s in ((ia, a), (ib, b))
    ]
    out = np.asarray(
        so._multi_gather_pallas(
            [jnp.asarray(a), jnp.asarray(b)],
            [jnp.asarray(ia), jnp.asarray(ib)],
            [jnp.asarray(p[0]) for p in plans],
            [jnp.asarray(p[1]) for p in plans],
            jnp.asarray(stream),
            has_stream=True,
            interpret=True,
        )
    )
    ref = np.asarray(a)[ia] + np.asarray(b)[ib] + np.asarray(stream)
    if dtype == np.float32:
        np.testing.assert_allclose(out, ref, atol=1e-6)
    else:
        np.testing.assert_allclose(
            out.astype(np.float32), ref.astype(np.float32), atol=1e-1
        )


def test_gather_sum_fused_matches_fallback_and_grads(monkeypatch):
    """gather_sum's fused custom-vjp path (kernel in interpret mode)
    matches the plain per-part path in value AND gradients."""
    import functools as ft

    import jax

    from chgnet_tpu.ops import scatter as sc

    rng = np.random.default_rng(7)
    d, S1, S2, L = 64, 2048, 2048, 2048
    t1 = rng.standard_normal((S1, d)).astype(np.float32)
    t2 = rng.standard_normal((S2, d)).astype(np.float32)
    stream = rng.standard_normal((L, d)).astype(np.float32)
    i1 = _window_local_idx(rng, S1, L, 600)
    i2 = _window_local_idx(rng, S2, L, 800)
    p1 = make_plan(i1, np.ones(L, bool), S1)
    p2 = make_plan(i2, np.ones(L, bool), S2)
    assert p1.g_lo.shape[0] and p2.g_lo.shape[0]

    def loss(t1, t2, stream):
        parts = [
            (t1, jnp.asarray(i1), p1),
            (stream, None, None),
            (t2, jnp.asarray(i2), p2),
        ]
        out = sc.gather_sum(parts)
        return (jnp.sin(out) * out).sum()

    ref_val, ref_grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(t1), jnp.asarray(t2), jnp.asarray(stream)
    )

    # force every kernel gate open, with all pallas entry points in
    # interpret mode (CPU backend)
    monkeypatch.setattr(so, "tpu_backend", lambda: True)
    for name in (
        "_multi_gather_pallas", "_gather_pallas", "_segsum_pallas",
        "_segsum2_pallas",
        "_segsum_v2_pallas", "_gather_v2_pallas",
    ):
        monkeypatch.setattr(
            so, name, ft.partial(getattr(so, name), interpret=True)
        )
    fused_val, fused_grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(t1), jnp.asarray(t2), jnp.asarray(stream)
    )
    np.testing.assert_allclose(float(fused_val), float(ref_val), rtol=1e-6)
    for fg, rg in zip(fused_grads, ref_grads):
        np.testing.assert_allclose(
            np.asarray(fg), np.asarray(rg), atol=1e-5
        )

    # grad-of-grad (the trainer differentiates the force backward):
    # pallas interpret mode cannot run second-order through the
    # prefetch-grid kernels, so swap in a pure-jax stand-in for the
    # kernel — the custom_vjp STRUCTURE (what the TPU path composes) is
    # what this asserts
    def plain_multi(srcs, idxs, los, cnts, stream_, has_stream, **_):
        acc = sum(s[i] for s, i in zip(srcs, idxs))
        return acc + stream_ if has_stream else acc

    monkeypatch.setattr(so, "_multi_gather_pallas", plain_multi)

    def outer(t1_):
        g_stream = jax.grad(loss, argnums=2)(
            t1_, jnp.asarray(t2), jnp.asarray(stream)
        )
        return (g_stream**2).sum()

    gg = np.asarray(jax.grad(outer)(jnp.asarray(t1)))
    monkeypatch.undo()
    gg_ref = np.asarray(jax.grad(outer)(jnp.asarray(t1)))
    np.testing.assert_allclose(gg, gg_ref, atol=1e-4)
