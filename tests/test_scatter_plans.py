"""Sorted-backward gather plans (ops/scatter.py) parity tests.

The sorted_grads path replaces every grad-of-gather random scatter-add
with a host-planned permutation gather + sorted segment sum; results must
be bit-compatible with XLA's default transpose at first AND second order
(training differentiates through the force gradient).
"""

from __future__ import annotations

import jax
import numpy as np
import pytest

from chgnet_tpu.core.structure import Structure
from chgnet_tpu import ROOT
from chgnet_tpu.graph.batching import batch_graphs
from chgnet_tpu.graph.converter import CrystalGraphConverter
from chgnet_tpu.models.chgnet import CHGNet, compute_batch
from chgnet_tpu.ops.scatter import GatherPlan, make_plan, plan_gather


@pytest.fixture(scope="module")
def batch():
    struct = Structure.from_file(f"{ROOT}/examples/mp-18767-LiMnO2.cif")
    conv = CrystalGraphConverter(atom_graph_cutoff=6.0, bond_graph_cutoff=3.0)
    g1 = conv(struct)
    g2 = conv(struct.make_supercell(2).perturb(0.03, seed=1))
    return batch_graphs([g1, g2])


def test_plan_gather_matches_plain_gather_grad():
    rng = np.random.default_rng(0)
    n, e, d = 40, 300, 16
    idx = rng.integers(0, n, e)
    valid = rng.random(e) > 0.1
    plan = make_plan(idx, valid, n)
    table = rng.normal(size=(n, d)).astype(np.float32)
    ct_mask = valid.astype(np.float32)[:, None]

    def loss_plan(t):
        return ((plan_gather(t, idx, plan) * ct_mask) ** 2).sum()

    def loss_plain(t):
        return ((t[idx] * ct_mask) ** 2).sum()

    np.testing.assert_allclose(loss_plan(table), loss_plain(table), rtol=1e-6)
    g1 = jax.grad(loss_plan)(table)
    g2 = jax.grad(loss_plain)(table)
    np.testing.assert_allclose(g1, g2, atol=1e-5)

    # second order (force-in-loss training does grad-of-grad)
    def gg(loss):
        return jax.grad(lambda t: (jax.grad(loss)(t) ** 2).sum())(table)

    np.testing.assert_allclose(gg(loss_plan), gg(loss_plain), atol=1e-4)


def test_make_plan_assume_sorted_validates():
    idx = np.array([3, 1, 2])
    with pytest.raises(ValueError, match="unsorted"):
        make_plan(idx, np.ones(3, bool), 5, assume_sorted=True)
    sorted_plan = make_plan(
        np.array([1, 2, 3]), np.ones(3, bool), 5, assume_sorted=True
    )
    assert sorted_plan.perm.shape == (0,)


def test_batch_plans_shapes_are_data_independent(batch):
    """Unsorted-stream plans always carry a full perm (stable jit caches)."""
    assert batch.plan_nbr.perm.shape == batch.plan_nbr.dst.shape
    assert batch.plan_d2u.perm.shape == batch.plan_d2u.dst.shape
    assert batch.plan_u2d.perm.shape == (0,)  # sorted by construction


def test_sorted_grads_efsm_parity(batch):
    """Full-model E/F/S/M and param grads agree with the scatter path."""
    m_on = CHGNet(seed=0, sorted_grads=True)
    m_off = CHGNet(seed=0, sorted_grads=False)
    kw = dict(compute_force=True, compute_stress=True, compute_magmom=True)
    o1 = compute_batch(m_on.params, batch, config=m_on.config, **kw)
    o2 = compute_batch(m_off.params, batch, config=m_off.config, **kw)
    for key in ("e", "f", "s", "m"):
        np.testing.assert_allclose(
            np.asarray(o1[key]), np.asarray(o2[key]), atol=1e-5
        )

    def loss(params, cfg):
        out = compute_batch(params, batch, config=cfg, **kw)
        return (
            (out["e"] ** 2).sum()
            + (out["f"] ** 2).sum() * 0.1
            + (out["s"] ** 2).sum() * 0.01
        )

    g_on = jax.grad(loss)(m_on.params, m_on.config)
    g_off = jax.grad(loss)(m_off.params, m_off.config)
    for a, b in zip(jax.tree.leaves(g_on), jax.tree.leaves(g_off)):
        np.testing.assert_allclose(a, b, atol=2e-4)


def test_sorted_grads_fused_kernels_compose(batch):
    """plans + fused Pallas kernels (falls back off-TPU) stay consistent."""
    m = CHGNet(seed=0, sorted_grads=True, fused_kernels=True)
    base = CHGNet(seed=0, sorted_grads=False, fused_kernels=False)
    kw = dict(compute_force=True, compute_stress=False, compute_magmom=False)
    o1 = compute_batch(m.params, batch, config=m.config, **kw)
    o2 = compute_batch(base.params, batch, config=base.config, **kw)
    np.testing.assert_allclose(np.asarray(o1["e"]), np.asarray(o2["e"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(o1["f"]), np.asarray(o2["f"]), atol=1e-5)


def test_plan_segment_sum_perm_matches_segment_sum():
    """The permutation-plan segment sum (and its gather-backed VJP) must
    match jax.ops.segment_sum for an unsorted stream with drop padding."""
    import jax
    import jax.numpy as jnp
    from chgnet_tpu.ops.scatter import make_plan, plan_segment_sum_perm

    rng = np.random.default_rng(0)
    L, n_out, d = 2048, 600, 64
    ids = rng.integers(0, n_out, L).astype(np.int32)
    valid = rng.random(L) > 0.1
    keys = np.where(valid, ids, n_out).astype(np.int32)
    plan = make_plan(ids, valid, n_out)
    data = rng.standard_normal((L, d)).astype(np.float32)

    out = plan_segment_sum_perm(jnp.asarray(data), jnp.asarray(keys), n_out, plan)
    ref = jax.ops.segment_sum(jnp.asarray(data), jnp.asarray(keys), n_out + 1)[:n_out]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def loss(x):
        return (plan_segment_sum_perm(x, jnp.asarray(keys), n_out, plan) ** 2).sum()

    def loss_ref(x):
        return (jax.ops.segment_sum(x, jnp.asarray(keys), n_out + 1)[:n_out] ** 2).sum()

    g = jax.grad(loss)(jnp.asarray(data))
    g_ref = jax.grad(loss_ref)(jnp.asarray(data))
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-5)


def test_train_grads_with_kernel_gates_open(batch, monkeypatch):
    """Second-order autodiff (grad of a force-containing loss) with EVERY
    streaming-kernel gate forced open, using pure-jax stand-ins for the
    pallas entry points: exercises the exact custom-vjp composition the
    real-TPU TRAINING path runs (interpret mode cannot do second order
    through the prefetch-grid kernels)."""
    from chgnet_tpu.ops import stream_ops as so

    m = CHGNet(seed=0, sorted_grads=True)
    kw = dict(compute_force=True, compute_stress=True, compute_magmom=False)

    def loss(params):
        out = compute_batch(params, batch, config=m.config, **kw)
        return (
            (out["e"] ** 2).sum()
            + (out["f"] ** 2).sum() * 0.1
            + (out["s"] ** 2).sum() * 0.01
        )

    g_ref = jax.grad(loss)(m.params)

    monkeypatch.setattr(so, "tpu_backend", lambda: True)
    monkeypatch.setattr(
        so,
        "_segsum_pallas",
        lambda x, dst, lo, cnt, *, n_out, interpret=False: (
            jax.ops.segment_sum(x, dst, num_segments=n_out)
        ),
    )
    monkeypatch.setattr(
        so,
        "_gather_pallas",
        lambda src, idx, lo, cnt, *, interpret=False: src[idx],
    )
    monkeypatch.setattr(
        so,
        "_segsum_v2_pallas",
        lambda x, dst, lo, cnt, *, n_out, raw_mode=False,
        interpret=False: jax.ops.segment_sum(x, dst, num_segments=n_out),
    )
    monkeypatch.setattr(
        so,
        "_gather_v2_pallas",
        lambda src, idx, pw, *, interpret=False: src[idx],
    )
    monkeypatch.setattr(
        so,
        "_multi_gather_pallas",
        lambda srcs, idxs, los, cnts, stream=None, *, has_stream=False,
        interpret=False: (
            sum(s[i] for s, i in zip(srcs, idxs))
            + (stream if has_stream else 0)
        ),
    )
    monkeypatch.setattr(
        so,
        "_segsum2_pallas",
        lambda x, da, db, lo, cnt, *, n_out, interpret=False: [
            jax.ops.segment_sum(x, da, num_segments=n_out),
            jax.ops.segment_sum(x, db, num_segments=n_out),
        ],
    )
    from chgnet_tpu.ops import gproj as gproj_mod

    monkeypatch.setattr(
        gproj_mod,
        "_gproj_pallas",
        lambda tables, idxs, ws, ulo, ucnt, stream=None, *, pairs,
        has_stream=False, interpret=False: sum(
            [tables[t][idxs[i]] @ ws[k] for k, (t, i) in enumerate(pairs)]
        ) + (stream if has_stream else 0),
    )
    jax.clear_caches()
    g_on = jax.grad(loss)(m.params)
    for a, b in zip(jax.tree.leaves(g_on), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(a, b, atol=2e-4)
