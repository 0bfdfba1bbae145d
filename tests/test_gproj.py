"""Union-window gather-project kernel (ops/gproj.py) vs the projected
composition — interpret mode on CPU, forward + grads to second order."""

from __future__ import annotations

import functools as ft

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chgnet_tpu.ops import gproj as gp
from chgnet_tpu.ops import stream_ops as so
from chgnet_tpu.ops.scatter import make_plan


def _window_local_idx(L, S, rng):
    """Index stream whose BO-blocks each stay inside a narrow window."""
    base = np.linspace(0, S - 1, L).astype(np.int64)
    jitter = rng.integers(-200, 200, L)
    return np.clip(base + jitter, 0, S - 1).astype(np.int32)


def _setup(L=2048, S=1024, dt=64, K=128, seed=0):
    rng = np.random.default_rng(seed)
    ia = _window_local_idx(L, S, rng)
    ib = _window_local_idx(L, S, rng)
    pa = make_plan(ia, np.ones(L, bool), S)
    pb = make_plan(ib, np.ones(L, bool), S)
    assert pa.g_lo.shape[0] and pb.g_lo.shape[0], "windows must exist"
    t1 = rng.standard_normal((S, dt)).astype(np.float32)
    t2 = rng.standard_normal((S, dt)).astype(np.float32)
    al = rng.standard_normal((L, dt)).astype(np.float32)
    wa = rng.standard_normal((dt, K)).astype(np.float32) * 0.1
    wb = rng.standard_normal((dt, K)).astype(np.float32) * 0.1
    wc = rng.standard_normal((dt, K)).astype(np.float32) * 0.1
    wal = rng.standard_normal((dt, K)).astype(np.float32) * 0.1
    b1 = rng.standard_normal(K).astype(np.float32)
    return (ia, ib, pa, pb, t1, t2, al, wa, wb, wc, wal, b1)


def _ref(ia, ib, t1, t2, al, wa, wb, wc, wal, b1):
    return (
        t1[ia] @ wa + t1[ib] @ wb + t2[ia] @ wc + al @ wal + b1
    )


@pytest.fixture()
def interp(monkeypatch):
    monkeypatch.setattr(so, "tpu_backend", lambda: True)
    for mod, name in [
        (gp, "_gproj_pallas"), (so, "_segsum_pallas"),
        (so, "_segsum2_pallas"), (so, "_gather_pallas"),
        (so, "_multi_gather_pallas"),
    ]:
        monkeypatch.setattr(
            mod, name, ft.partial(getattr(mod, name), interpret=True)
        )
    jax.clear_caches()
    yield
    jax.clear_caches()


def test_gproj_forward_matches_reference(interp):
    ia, ib, pa, pb, t1, t2, al, wa, wb, wc, wal, b1 = _setup()
    parts = [
        (jnp.asarray(t1), jnp.asarray(ia), pa),
        (jnp.asarray(t1), jnp.asarray(ib), pb),
        (jnp.asarray(al), None, None),
        (jnp.asarray(t2), jnp.asarray(ia), pa),
    ]
    # share table/idx objects so dedup kicks in
    parts[3] = (jnp.asarray(t2), parts[0][1], pa)
    parts[1] = (parts[0][0], parts[1][1], pb)
    assert gp.gproj_eligible(parts, ia.shape[0])
    out = gp.gather_project_sum(
        parts, [jnp.asarray(wa), jnp.asarray(wb), jnp.asarray(wc)],
        jnp.asarray(b1), [jnp.asarray(wal)],
    )
    ref = _ref(ia, ib, t1, t2, al, wa, wb, wc, wal, b1)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=2e-4)


def test_gproj_grads_match_reference(interp):
    ia, ib, pa, pb, t1, t2, al, wa, wb, wc, wal, b1 = _setup(L=1024, S=512)
    cot = np.random.default_rng(1).standard_normal((1024, 128)).astype(
        np.float32
    )

    def run_gproj(t1j, t2j, alj, waj, wbj, wcj, walj, b1j):
        ia_j = jnp.asarray(ia)
        parts = [
            (t1j, ia_j, pa),
            (t1j, jnp.asarray(ib), pb),
            (alj, None, None),
            (t2j, ia_j, pa),
        ]
        out = gp.gather_project_sum(
            parts, [waj, wbj, wcj], b1j, [walj]
        )
        return jnp.sum(out * cot)

    def run_ref(t1j, t2j, alj, waj, wbj, wcj, walj, b1j):
        out = (
            t1j[ia] @ waj + t1j[ib] @ wbj + t2j[ia] @ wcj + alj @ walj
            + b1j
        )
        return jnp.sum(out * cot)

    args = tuple(
        jnp.asarray(x) for x in (t1, t2, al, wa, wb, wc, wal, b1)
    )
    g1 = jax.grad(run_gproj, argnums=tuple(range(8)))(*args)
    g2 = jax.grad(run_ref, argnums=tuple(range(8)))(*args)
    for a, b, name in zip(
        g1, g2, ["t1", "t2", "al", "wa", "wb", "wc", "wal", "b1"]
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-4, rtol=3e-4,
            err_msg=name,
        )


def test_gproj_second_order(interp):
    """grad-of-grad (the force-training path) through the op."""
    ia, ib, pa, pb, t1, t2, al, wa, wb, wc, wal, b1 = _setup(L=1024, S=512)

    def energy(t1j):
        parts = [
            (t1j, jnp.asarray(ia), pa),
            (t1j, jnp.asarray(ib), pb),
            (jnp.asarray(al), None, None),
        ]
        out = gp.gather_project_sum(
            parts, [jnp.asarray(wa), jnp.asarray(wb)], jnp.asarray(b1),
            [jnp.asarray(wal)],
        )
        return jnp.sum(jnp.tanh(out))

    def loss(t1j):
        g = jax.grad(energy)(t1j)
        return jnp.sum(g * g)

    def energy_ref(t1j):
        out = (
            t1j[ia] @ wa + t1j[ib] @ wb + jnp.asarray(al) @ wal + b1
        )
        return jnp.sum(jnp.tanh(out))

    def loss_ref(t1j):
        g = jax.grad(energy_ref)(t1j)
        return jnp.sum(g * g)

    gg = jax.grad(loss)(jnp.asarray(t1))
    gg_ref = jax.grad(loss_ref)(jnp.asarray(t1))
    np.testing.assert_allclose(
        np.asarray(gg), np.asarray(gg_ref), atol=5e-4, rtol=5e-4
    )


def test_full_model_gproj_matches_plain(monkeypatch):
    """E+F+S+M with the gproj kernel live (interpret) vs the plain path."""
    from chgnet_tpu import ROOT
    from chgnet_tpu.core.structure import Structure
    from chgnet_tpu.graph.batching import batch_graphs
    from chgnet_tpu.models.chgnet import CHGNet, compute_batch

    model = CHGNet(seed=0)
    struct = Structure.from_file(
        f"{ROOT}/examples/mp-18767-LiMnO2.cif"
    ).make_supercell(2).perturb(0.03, seed=0)
    batch = batch_graphs([model.graph_converter(struct)])

    def run():
        return compute_batch(
            model.params, batch, config=model.config,
            compute_force=True, compute_stress=True, compute_magmom=True,
        )

    ref = jax.tree.map(np.asarray, run())

    monkeypatch.setattr(so, "tpu_backend", lambda: True)
    for mod, name in [
        (so, "_multi_gather_pallas"), (so, "_gather_pallas"),
        (so, "_segsum_pallas"), (so, "_segsum2_pallas"),
        (so, "_segsum_v2_pallas"), (so, "_gather_v2_pallas"),
        (gp, "_gproj_pallas"),
    ]:
        monkeypatch.setattr(
            mod, name, ft.partial(getattr(mod, name), interpret=True)
        )
    jax.clear_caches()
    out = jax.tree.map(np.asarray, run())
    jax.clear_caches()
    for key, atol in (("e", 1e-5), ("f", 1e-4), ("s", 1e-4), ("m", 1e-5)):
        np.testing.assert_allclose(out[key], ref[key], atol=atol, err_msg=key)
