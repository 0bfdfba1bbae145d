"""Two-output streaming segment sum (one-sweep pairing) + twin-reduce
backward tests. Kernel exactness runs in Pallas interpret mode on CPU;
the custom-vjp composition (incl. second order, which interpret mode
cannot trace through prefetch-grid kernels) runs with pure-jax stand-ins
— the exact pattern of tests/test_scatter_plans.py."""

from __future__ import annotations

import functools as ft

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chgnet_tpu.ops import scatter, stream_ops as so


def _streams(rng, n_out, L):
    """A sorted key stream and a block-local jittered one over the same
    output capacity, with padded tails (>= n_out)."""
    dst_a = np.sort(rng.integers(0, n_out, L - 80)).astype(np.int32)
    dst_a = np.concatenate([dst_a, np.full(80, n_out, np.int32)])
    dst_b = np.clip(dst_a + rng.integers(-40, 40, L), 0, n_out - 1)
    dst_b = dst_b.astype(np.int32)
    dst_b[dst_a >= n_out] = n_out
    return dst_a, dst_b


def _plans(dst_a, dst_b, n_out):
    from chgnet_tpu.utils.native.hostops import stable_argsort_i32

    lo_a, cnt_a = so.build_block_plan(dst_a, n_out)
    perm = stable_argsort_i32(dst_b)
    lo_b, cnt_b, _ = so.build_block_plan_local(dst_b, perm, n_out)
    ulo, ucnt = so.union_block_plan(lo_a, cnt_a, lo_b, cnt_b)
    return (lo_a, cnt_a), (lo_b, cnt_b), (ulo, ucnt)


@pytest.mark.parametrize("d", [32, 64, 128])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_segsum2_kernel_matches_two_segment_sums(d, dtype):
    rng = np.random.default_rng(3)
    n_out, L = 2 * so.BO, 4 * so.C
    dst_a, dst_b = _streams(rng, n_out, L)
    _, _, (ulo, ucnt) = _plans(dst_a, dst_b, n_out)
    x = jnp.asarray(rng.standard_normal((L, d)), dtype)
    oa, ob = so._segsum2_pallas(
        x, jnp.asarray(dst_a), jnp.asarray(dst_b),
        jnp.asarray(ulo), jnp.asarray(ucnt), n_out=n_out, interpret=True,
    )
    ra = jax.ops.segment_sum(x.astype(jnp.float32), jnp.asarray(dst_a), n_out)
    rb = jax.ops.segment_sum(x.astype(jnp.float32), jnp.asarray(dst_b), n_out)
    tol = 1e-5 if dtype == jnp.float32 else 1e-1
    np.testing.assert_allclose(
        np.asarray(oa, np.float32), np.asarray(ra), atol=tol, rtol=tol
    )
    np.testing.assert_allclose(
        np.asarray(ob, np.float32), np.asarray(rb), atol=tol, rtol=tol
    )


def test_union_block_plan_handles_empty_blocks():
    lo_a = np.array([0, 512, 0], np.int32)
    cnt_a = np.array([1, 2, 0], np.int32)
    lo_b = np.array([512, 0, 0], np.int32)
    cnt_b = np.array([1, 0, 0], np.int32)
    lo, cnt = so.union_block_plan(lo_a, cnt_a, lo_b, cnt_b)
    lo, cnt = np.asarray(lo), np.asarray(cnt)
    assert lo.tolist() == [0, 512, 0]
    assert cnt.tolist() == [2, 2, 0]  # both-empty block stays empty


def test_segment_sum_pair_grad_and_second_order(monkeypatch):
    """The pair op's custom-vjp chain (expand_rows per stream) must be
    twice-differentiable — the force-training path differentiates the
    gather_sum backward that calls it."""
    monkeypatch.setattr(so, "tpu_backend", lambda: True)
    monkeypatch.setattr(
        so, "_segsum2_pallas",
        lambda x, da, db, lo, cnt, *, n_out, interpret=False: (
            jax.ops.segment_sum(x, da, num_segments=n_out),
            jax.ops.segment_sum(x, db, num_segments=n_out),
        ),
    )
    for name in ("_segsum_pallas",):
        monkeypatch.setattr(
            so, name,
            lambda x, dst, lo, cnt, *, n_out, interpret=False: (
                jax.ops.segment_sum(x, dst, num_segments=n_out)
            ),
        )
    monkeypatch.setattr(
        so, "_gather_pallas",
        lambda src, idx, lo, cnt, *, interpret=False: src[idx],
    )
    rng = np.random.default_rng(5)
    n_out, L = 2 * so.BO, 4 * so.C
    dst_a, dst_b = _streams(rng, n_out, L)
    (lo_a, cnt_a), (lo_b, cnt_b), (ulo, ucnt) = _plans(dst_a, dst_b, n_out)
    x = jnp.asarray(rng.standard_normal((L, 64)), jnp.float32)
    aux_a = (jnp.asarray(lo_a), jnp.asarray(cnt_a), None, None, None)
    aux_b = (jnp.asarray(lo_b), jnp.asarray(cnt_b), None, None, None)
    args = (
        jnp.asarray(dst_a), jnp.asarray(dst_b),
        jnp.asarray(ulo), jnp.asarray(ucnt), aux_a, aux_b,
    )

    def energy(x, pair):
        if pair:
            oa, ob = so.segment_sum_pair(x, *args, n_out, False, True)
        else:
            oa = jax.ops.segment_sum(x, jnp.asarray(dst_a), n_out)
            ob = jax.ops.segment_sum(x, jnp.asarray(dst_b), n_out)
        return (oa ** 2).sum() + (ob ** 3).sum()

    def force_loss(x, pair):
        return (jax.grad(energy)(x, pair) ** 2).sum()

    np.testing.assert_allclose(
        energy(x, True), energy(x, False), rtol=1e-6
    )
    np.testing.assert_allclose(
        force_loss(x, True), force_loss(x, False), rtol=1e-5
    )
    g_p = jax.grad(force_loss)(x, True)
    g_r = jax.grad(force_loss)(x, False)
    np.testing.assert_allclose(
        np.asarray(g_p), np.asarray(g_r), atol=1e-4
    )


def test_gather_sum_bwd_pairs_same_capacity_parts(monkeypatch):
    """_gather_sum_bwd must route two same-capacity windowed parts
    through ONE segment_sum_pair call and still match the reference."""
    monkeypatch.setattr(so, "tpu_backend", lambda: True)
    calls = []

    def fake_segsum2(x, da, db, lo, cnt, *, n_out, interpret=False):
        calls.append(1)
        return (
            jax.ops.segment_sum(x, da, num_segments=n_out),
            jax.ops.segment_sum(x, db, num_segments=n_out),
        )

    monkeypatch.setattr(so, "_segsum2_pallas", fake_segsum2)
    monkeypatch.setattr(
        so, "_segsum_pallas",
        lambda x, dst, lo, cnt, *, n_out, interpret=False: (
            jax.ops.segment_sum(x, dst, num_segments=n_out)
        ),
    )
    monkeypatch.setattr(
        so, "_gather_pallas",
        lambda src, idx, lo, cnt, *, interpret=False: src[idx],
    )
    monkeypatch.setattr(
        so, "_multi_gather_pallas",
        lambda srcs, idxs, los, cnts, stream=None, *, has_stream=False,
        interpret=False: (
            sum(s[i] for s, i in zip(srcs, idxs))
            + (stream if has_stream else 0)
        ),
    )
    rng = np.random.default_rng(11)
    n_src, L = 2 * so.BO, 4 * so.C
    # window-local index streams (sorted-ish) over the same source table
    idx_a = np.sort(rng.integers(0, n_src, L)).astype(np.int32)
    idx_b = np.clip(idx_a + rng.integers(-16, 16, L), 0, n_src - 1)
    idx_b = idx_b.astype(np.int32)
    valid = np.ones(L, bool)
    plan_a = scatter.make_plan(idx_a, valid, n_src, assume_sorted=True)
    plan_b = scatter.make_plan(idx_b, valid, n_src)
    if plan_a.g_lo.shape[0] == 0 or plan_b.raw.shape[0] == 0:
        pytest.skip("plan gates rejected the synthetic streams")
    table = jnp.asarray(rng.standard_normal((n_src, 64)), jnp.float32)

    def out_sum(t, on):
        if on:
            s = scatter.gather_sum(
                [(t, jnp.asarray(idx_a), plan_a),
                 (t, jnp.asarray(idx_b), plan_b)]
            )
        else:
            s = t[jnp.asarray(idx_a)] + t[jnp.asarray(idx_b)]
        return (s ** 2).sum()

    np.testing.assert_allclose(
        out_sum(table, True), out_sum(table, False), rtol=1e-6
    )
    g_on = jax.grad(out_sum)(table, True)
    assert calls, "pairing path never engaged"
    g_ref = jax.grad(out_sum)(table, False)
    np.testing.assert_allclose(
        np.asarray(g_on), np.asarray(g_ref), atol=1e-5
    )


def test_twin_reduce_matches_and_backward_is_gather():
    """twin_reduce == gather(u2d) + gather(und_second); its backward is
    the d2u row gather — values must match the segment-sum transpose."""
    rng = np.random.default_rng(2)
    U = 300
    E = 2 * U
    # build a consistent (u2d, und_second, d2u) triple: bond u owns
    # directed edges (2u, 2u+1)
    u2d = (2 * np.arange(U)).astype(np.int32)
    und2 = (2 * np.arange(U) + 1).astype(np.int32)
    d2u = np.repeat(np.arange(U), 2).astype(np.int32)
    partial = jnp.asarray(rng.standard_normal((E, 8)), jnp.float32)

    def f(p, on):
        if on:
            out = scatter.twin_reduce(
                p, jnp.asarray(u2d), jnp.asarray(und2), jnp.asarray(d2u),
                None, None, None,
            )
        else:
            out = p[jnp.asarray(u2d)] + p[jnp.asarray(und2)]
        return (out ** 2).sum()

    np.testing.assert_allclose(f(partial, True), f(partial, False), rtol=1e-6)
    g_on = jax.grad(f)(partial, True)
    g_ref = jax.grad(f)(partial, False)
    np.testing.assert_allclose(
        np.asarray(g_on), np.asarray(g_ref), atol=1e-6
    )
    # second order
    h_on = jax.grad(lambda p: (jax.grad(f)(p, True) ** 2).sum())(partial)
    h_ref = jax.grad(lambda p: (jax.grad(f)(p, False) ** 2).sum())(partial)
    np.testing.assert_allclose(
        np.asarray(h_on), np.asarray(h_ref), atol=1e-5
    )
