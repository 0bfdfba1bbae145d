"""Mono-kernel conv pass (ops/fused_pass.py): the fused
gather+tail kernel must match the unfused custom-op composition in
values and gradients of both orders, on every layer shape it serves."""

from __future__ import annotations

import functools as ft

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chgnet_tpu.ops import fused_pass as fp
from chgnet_tpu.ops import stream_ops as so
from chgnet_tpu.ops.scatter import make_plan


@pytest.fixture()
def kernels_on(monkeypatch):
    monkeypatch.setattr(so, "tpu_backend", lambda: True)
    monkeypatch.setenv("CHGNET_TPU_FUSED_PASS", "1")  # opt-in gate
    for name in (
        "_multi_gather_pallas", "_gather_pallas", "_segsum_pallas",
        "_segsum2_pallas",
        "_segsum_v2_pallas", "_gather_v2_pallas",
    ):
        monkeypatch.setattr(
            so, name, ft.partial(getattr(so, name), interpret=True)
        )


def _pack(rng, dim, with_w2=True):
    p2 = {
        "nc_scale": jnp.asarray(rng.standard_normal(dim), jnp.float32),
        "nc_bias": jnp.asarray(rng.standard_normal(dim), jnp.float32),
        "ng_scale": jnp.asarray(rng.standard_normal(dim), jnp.float32),
        "ng_bias": jnp.asarray(rng.standard_normal(dim), jnp.float32),
    }
    if with_w2:
        p2["w2"] = jnp.asarray(
            rng.standard_normal((2 * dim, 2 * dim)) * 0.2, jnp.float32
        )
        p2["b2"] = jnp.asarray(rng.standard_normal(2 * dim), jnp.float32)
    return p2


def _inputs(rng, *, message: bool, with_w2: bool):
    dim = 64
    n_src, L = 2 * so.C, 2 * so.BO
    idx = np.sort(rng.integers(0, n_src, L)).astype(np.int32)
    plan = make_plan(idx, np.ones(L, bool), n_src)
    assert plan.g_lo.shape[0] == L // so.BO
    table = jnp.asarray(rng.standard_normal((n_src, 2 * dim)), jnp.float32)
    stream = jnp.asarray(rng.standard_normal((L, 2 * dim)), jnp.float32)
    parts = [(table, jnp.asarray(idx), plan), (stream, None, None)]
    b1 = jnp.asarray(rng.standard_normal(2 * dim), jnp.float32)
    p2 = _pack(rng, dim, with_w2=with_w2)
    kw = {}
    if message:
        kw["weights"] = jnp.asarray(
            rng.standard_normal((L, dim)), jnp.float32
        )
        mask = np.ones(L, np.float32)
        mask[rng.integers(0, L, 50)] = 0.0
        kw["mask"] = jnp.asarray(mask)
    else:
        kw["resnet"] = jnp.asarray(
            rng.standard_normal((L, dim)), jnp.float32
        )
    return parts, b1, p2, kw


@pytest.mark.parametrize(
    ("message", "with_w2"),
    [(True, True), (False, True), (False, False)],
)
def test_fused_pass_matches_reference(kernels_on, message, with_w2):
    rng = np.random.default_rng(11)
    parts, b1, p2, kw = _inputs(rng, message=message, with_w2=with_w2)
    tables = tuple(t for t, _, _ in parts)
    idxs = tuple(i for _, i, _ in parts)
    plans = tuple(p for _, _, p in parts)

    out = fp.fused_layer_pass(parts, b1, p2, **kw)
    ref = fp._reference_pass(
        tables, idxs, plans, b1, p2,
        kw.get("weights"), kw.get("mask"), kw.get("resnet"),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    # gradients w.r.t. the tables, the pack, and the first-layer bias
    def fused_loss(tables_, b1_, p2_):
        parts_ = [
            (tables_[0], idxs[0], plans[0]), (tables_[1], None, None)
        ]
        return (fp.fused_layer_pass(parts_, b1_, p2_, **kw) ** 2).sum()

    def ref_loss(tables_, b1_, p2_):
        return (
            fp._reference_pass(
                tables_, idxs, plans, b1_, p2_,
                kw.get("weights"), kw.get("mask"), kw.get("resnet"),
            )
            ** 2
        ).sum()

    g_f = jax.grad(fused_loss, argnums=(0, 1, 2))(tables, b1, p2)
    g_r = jax.grad(ref_loss, argnums=(0, 1, 2))(tables, b1, p2)
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=1e-4
        )

    # grad-of-grad (the force-training trace)
    def gradnorm(loss):
        def f(tables_, b1_, p2_):
            g = jax.grad(loss)(tables_, b1_, p2_)
            return sum((x ** 2).sum() for x in jax.tree.leaves(g))
        return f

    gg_f = jax.grad(gradnorm(fused_loss))(tables, b1, p2)
    gg_r = jax.grad(gradnorm(ref_loss))(tables, b1, p2)
    for a, b in zip(jax.tree.leaves(gg_f), jax.tree.leaves(gg_r)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-2, rtol=1e-3
        )


def test_fused_pass_engages_kernel(kernels_on, monkeypatch):
    """The eligibility gate must actually select the mono-kernel on
    qualifying parts (guard against a silent permanent fallback)."""
    rng = np.random.default_rng(12)
    parts, b1, p2, kw = _inputs(rng, message=True, with_w2=True)
    called = {}
    orig = fp._fused_pass_pallas

    def spy(*args, **kwargs):
        called["yes"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(fp, "_fused_pass_pallas", spy)
    fp.fused_layer_pass(parts, b1, p2, **kw)
    assert called.get("yes")


def test_fused_pass_falls_back_off_tpu():
    """Off-TPU (no monkeypatch) the pass must use the reference
    composition and still produce finite values."""
    rng = np.random.default_rng(13)
    parts, b1, p2, kw = _inputs(rng, message=True, with_w2=True)
    out = fp.fused_layer_pass(parts, b1, p2, **kw)
    assert np.isfinite(np.asarray(out)).all()
