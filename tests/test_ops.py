"""Pallas fused-op tests (interpret mode on CPU; same code path on TPU)."""

from __future__ import annotations

import jax
import numpy as np
import pytest

from chgnet_tpu.ops.gated_message import (
    _reference,
    _reference_nw,
    fused_gated_message,
    fused_gated_update,
)


@pytest.fixture
def inputs():
    rng = np.random.default_rng(0)
    E, D = 2500, 64  # not a tile multiple: exercises padding
    acc_both = rng.normal(size=(E, 2 * D)).astype(np.float32)
    weights = rng.normal(size=(E, D)).astype(np.float32)
    mask = (rng.random(E) < 0.9).astype(np.float32)
    w2c = rng.normal(size=(D, D)).astype(np.float32) * 0.1
    w2g = rng.normal(size=(D, D)).astype(np.float32) * 0.1
    w2 = np.zeros((2 * D, 2 * D), np.float32)
    w2[:D, :D] = w2c
    w2[D:, D:] = w2g
    p2 = {
        "w2": w2,
        "b2": rng.normal(size=(2 * D,)).astype(np.float32) * 0.1,
        "nc_scale": rng.normal(size=(D,)).astype(np.float32),
        "nc_bias": rng.normal(size=(D,)).astype(np.float32) * 0.1,
        "ng_scale": rng.normal(size=(D,)).astype(np.float32),
        "ng_bias": rng.normal(size=(D,)).astype(np.float32) * 0.1,
    }
    return acc_both, weights, mask, p2


def test_fused_matches_reference(inputs):
    acc_both, weights, mask, p2 = inputs
    ref = _reference(acc_both, weights, mask, p2)
    out = fused_gated_message(acc_both, weights, mask, p2, use_pallas=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    assert out.shape == ref.shape == (2500, 64)


def test_fused_gradients(inputs):
    """Custom VJP (recompute via plain XLA) matches autodiff of the
    reference composition — required because forces differentiate
    through every message."""
    acc_both, weights, mask, p2 = inputs

    def loss_fused(ab, w, p):
        return (
            fused_gated_message(ab, w, mask, p, use_pallas=True) ** 2
        ).sum()

    def loss_ref(ab, w, p):
        return (_reference(ab, w, mask, p) ** 2).sum()

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(acc_both, weights, p2)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(acc_both, weights, p2)
    for a, b in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-5
        )


def test_fused_under_jit(inputs):
    acc_both, weights, mask, p2 = inputs
    fn = jax.jit(
        lambda ab: fused_gated_message(ab, weights, mask, p2, use_pallas=True)
    )
    np.testing.assert_allclose(
        np.asarray(fn(acc_both)),
        np.asarray(_reference(acc_both, weights, mask, p2)),
        atol=1e-5,
    )


def test_model_with_fused_kernels_matches():
    """Full model with fused_kernels=True (interpret mode on CPU) matches
    the plain path for e/f/s/m."""
    import dataclasses

    from chgnet_tpu import ROOT
    from chgnet_tpu.core.structure import Structure
    from chgnet_tpu.graph.batching import batch_graphs
    from chgnet_tpu.models.chgnet import CHGNet, compute_batch

    model = CHGNet(seed=0, atom_fea_dim=16, bond_fea_dim=16, angle_fea_dim=16,
                   num_radial=9, num_angular=9, n_conv=2, mlp_hidden_dims=(16,),
                   atom_conv_hidden_dim=16, bond_conv_hidden_dim=16)
    struct = Structure.from_file(f"{ROOT}/examples/mp-18767-LiMnO2.cif")
    batch = batch_graphs([model.graph_converter(struct.perturb(0.05, seed=1))])
    kw = dict(compute_force=True, compute_stress=True, compute_magmom=True)
    cfg_plain = dataclasses.replace(model.config, fused_kernels=False)
    ref = compute_batch(model.params, batch, config=cfg_plain, **kw)
    cfg_fused = dataclasses.replace(model.config, fused_kernels=True)
    out = compute_batch(model.params, batch, config=cfg_fused, **kw)
    np.testing.assert_allclose(
        float(out["e"][0]), float(ref["e"][0]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["f"]), np.asarray(ref["f"]), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["s"]), np.asarray(ref["s"]), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["m"]), np.asarray(ref["m"]), atol=1e-5
    )


def test_fused_update_matches_reference(inputs):
    """Weights-free tail (AngleUpdate shape) kernel == XLA composition,
    forward and gradients."""
    acc_both, _, _, p2 = inputs
    rng = np.random.default_rng(3)
    resnet = rng.normal(size=(acc_both.shape[0], 64)).astype(np.float32)
    ref = _reference_nw(acc_both, resnet, p2)
    out = fused_gated_update(acc_both, resnet, p2, use_pallas=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def loss_fused(ab, res, p):
        return (fused_gated_update(ab, res, p, use_pallas=True) ** 2).sum()

    def loss_ref(ab, res, p):
        return (_reference_nw(ab, res, p) ** 2).sum()

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(acc_both, resnet, p2)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(acc_both, resnet, p2)
    for a, b in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-5
        )


def test_fused_update_single_layer(inputs):
    """Single-Linear branches (AngleUpdate's default shape,
    angle_layer_hidden_dim=0): no w2/b2 — acc is y directly."""
    acc_both, _, _, p2_full = inputs
    p2 = {k: v for k, v in p2_full.items() if k not in ("w2", "b2")}
    rng = np.random.default_rng(4)
    resnet = rng.normal(size=(acc_both.shape[0], 64)).astype(np.float32)
    ref = _reference_nw(acc_both, resnet, p2)
    out = fused_gated_update(acc_both, resnet, p2, use_pallas=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def loss_fused(ab, res, p):
        return (fused_gated_update(ab, res, p, use_pallas=True) ** 2).sum()

    def loss_ref(ab, res, p):
        return (_reference_nw(ab, res, p) ** 2).sum()

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(acc_both, resnet, p2)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(acc_both, resnet, p2)
    for a, b in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-5
        )


def test_fused_bf16_runs():
    """bf16 streams through the fused kernels (fwd + bwd) stay finite and
    close to the f32 path."""
    import dataclasses

    from chgnet_tpu import ROOT
    from chgnet_tpu.core.structure import Structure
    from chgnet_tpu.graph.batching import batch_graphs
    from chgnet_tpu.models.chgnet import CHGNet, compute_batch

    model = CHGNet(seed=0, atom_fea_dim=16, bond_fea_dim=16, angle_fea_dim=16,
                   num_radial=9, num_angular=9, n_conv=2, mlp_hidden_dims=(16,),
                   atom_conv_hidden_dim=16, bond_conv_hidden_dim=16)
    struct = Structure.from_file(f"{ROOT}/examples/mp-18767-LiMnO2.cif")
    batch = batch_graphs([model.graph_converter(struct)])
    kw = dict(compute_force=True, compute_stress=True, compute_magmom=True)
    ref = compute_batch(model.params, batch, config=model.config, **kw)
    cfg = dataclasses.replace(
        model.config, fused_kernels=True, compute_dtype="bfloat16",
        matmul_precision="default",
    )
    out = compute_batch(model.params, batch, config=cfg, **kw)
    assert float(out["e"][0]) == pytest.approx(float(ref["e"][0]), abs=5e-3)
    np.testing.assert_allclose(
        np.asarray(out["f"]), np.asarray(ref["f"]), atol=5e-2
    )
