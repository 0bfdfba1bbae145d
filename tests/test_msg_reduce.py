"""Fused message-reduce kernel (ops/gated_message.py): tail + sorted
segment sum in one sweep — interpret mode vs the split composition."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chgnet_tpu.ops import gated_message as gm
from chgnet_tpu.ops import stream_ops as so
from chgnet_tpu.ops.scatter import make_plan


def _setup(L=2048, n_out=1024, dim=64, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    # sorted dst with some padded (dropped) rows AND some rows whose
    # mask is zero while dst stays IN RANGE — the dynamic-cutoff shape
    # (apply_dynamic_cutoff zeroes masks without touching plan dst), so
    # the kernel must honor the mask, not just the dst-drop convention
    dst = np.sort(rng.integers(0, n_out, L)).astype(np.int32)
    mask = (rng.random(L) > 0.1).astype(np.float32)
    drop = (rng.random(L) > 0.5) & (mask == 0)
    dst = np.where(drop, n_out, dst).astype(np.int32)
    order = np.argsort(dst, kind="stable")
    dst, mask = dst[order], mask[order]
    assert ((mask == 0) & (dst < n_out)).any()
    plan = make_plan(dst, dst < n_out, n_out, assume_sorted=True)
    acc = rng.standard_normal((L, 2 * dim)).astype(dtype)
    w = rng.standard_normal((L, dim)).astype(dtype)
    p2 = {
        "w2": rng.standard_normal((2 * dim, 2 * dim)).astype(dtype) * 0.1,
        "b2": rng.standard_normal(2 * dim).astype(dtype) * 0.1,
        "nc_scale": np.ones(dim, dtype),
        "nc_bias": np.zeros(dim, dtype),
        "ng_scale": np.ones(dim, dtype),
        "ng_bias": np.zeros(dim, dtype),
    }
    return acc, w, mask, dst, plan, p2, n_out


@pytest.fixture()
def on_tpu_gates(monkeypatch):
    import functools as ft

    monkeypatch.setenv("CHGNET_TPU_MSG_REDUCE", "1")  # opt-in since r5
    monkeypatch.setattr(so, "tpu_backend", lambda: True)
    for name in (
        "_multi_gather_pallas", "_gather_pallas", "_segsum_pallas",
        "_segsum2_pallas", "_segsum_v2_pallas", "_gather_v2_pallas",
    ):
        monkeypatch.setattr(
            so, name, ft.partial(getattr(so, name), interpret=True)
        )
    jax.clear_caches()
    yield
    jax.clear_caches()


def test_msg_reduce_matches_split(on_tpu_gates):
    acc, w, mask, dst, plan, p2, n_out = _setup()
    assert gm.msg_reduce_ok(jnp.asarray(acc), plan, n_out)
    out = gm.fused_gated_message_reduce(
        jnp.asarray(acc), jnp.asarray(w), jnp.asarray(mask),
        {k: jnp.asarray(v) for k, v in p2.items()}, plan, n_out,
    )
    ref = gm._reduce_reference(
        jnp.asarray(acc), jnp.asarray(w), jnp.asarray(mask),
        jnp.asarray(dst), n_out,
        {k: jnp.asarray(v) for k, v in p2.items()},
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=3e-5, rtol=3e-5
    )


def test_msg_reduce_grads(on_tpu_gates):
    acc, w, mask, dst, plan, p2, n_out = _setup(L=1024, n_out=512)
    ct = np.random.default_rng(1).standard_normal(
        (n_out, 64)
    ).astype(np.float32)
    p2j = {k: jnp.asarray(v) for k, v in p2.items()}

    def f(a, wj, p):
        out = gm.fused_gated_message_reduce(
            a, wj, jnp.asarray(mask), p, plan, n_out
        )
        return jnp.sum(out * ct)

    def f_ref(a, wj, p):
        out = gm._reduce_reference(
            a, wj, jnp.asarray(mask), jnp.asarray(dst), n_out, p
        )
        return jnp.sum(out * ct)

    g = jax.grad(f, argnums=(0, 1, 2))(
        jnp.asarray(acc), jnp.asarray(w), p2j
    )
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(
        jnp.asarray(acc), jnp.asarray(w), p2j
    )
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(gr)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4
        )


def test_msg_reduce_second_order(on_tpu_gates):
    acc, w, mask, dst, plan, p2, n_out = _setup(L=1024, n_out=512)
    p2j = {k: jnp.asarray(v) for k, v in p2.items()}

    def e(a):
        out = gm.fused_gated_message_reduce(
            a, jnp.asarray(w), jnp.asarray(mask), p2j, plan, n_out
        )
        return jnp.sum(jnp.tanh(out))

    def loss(a):
        g = jax.grad(e)(a)
        return jnp.sum(g * g)

    def e_ref(a):
        out = gm._reduce_reference(
            a, jnp.asarray(w), jnp.asarray(mask), jnp.asarray(dst),
            n_out, p2j,
        )
        return jnp.sum(jnp.tanh(out))

    def loss_ref(a):
        g = jax.grad(e_ref)(a)
        return jnp.sum(g * g)

    gg = jax.grad(loss)(jnp.asarray(acc))
    gg_ref = jax.grad(loss_ref)(jnp.asarray(acc))
    np.testing.assert_allclose(
        np.asarray(gg), np.asarray(gg_ref), atol=1e-3, rtol=1e-3
    )


def test_full_model_with_msg_reduce(monkeypatch):
    """E+F+S+M with the reduce kernel engaged (interpret) vs plain."""
    import functools as ft

    from chgnet_tpu import ROOT
    from chgnet_tpu.core.structure import Structure
    from chgnet_tpu.graph.batching import batch_graphs
    from chgnet_tpu.models.chgnet import CHGNet, compute_batch
    from chgnet_tpu.ops import gproj as gp

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
    monkeypatch.setenv("CHGNET_TPU_MSG_REDUCE", "1")  # opt-in since r5
    monkeypatch.setattr(so, "tpu_backend", lambda: True)
    for mod, name in [
        (so, "_multi_gather_pallas"), (so, "_gather_pallas"),
        (so, "_segsum_pallas"), (so, "_segsum2_pallas"),
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
