"""Graph-partitioned multi-chip forward vs single-device forward.

Runs on the 8 virtual CPU devices configured in conftest; asserts the
sharded path (atoms/edges/bonds/angles spread over the mesh, features
exchanged by all-gather, energies psum'ed) reproduces the single-device
padded forward numerically, including forces and stress through the
collective transposes.
"""

from __future__ import annotations

import jax
import numpy as np
import pytest

from chgnet_tpu import ROOT
from chgnet_tpu.core.structure import Structure
from chgnet_tpu.graph.batching import batch_graphs
from chgnet_tpu.models.chgnet import CHGNet, compute_batch
from chgnet_tpu.parallel.graph_sharded import (
    compute_batch_sharded,
    shard_batch,
    unshard_atoms,
)
from chgnet_tpu.parallel.mesh import make_mesh

SMALL = dict(
    atom_fea_dim=16,
    bond_fea_dim=16,
    angle_fea_dim=16,
    num_radial=9,
    num_angular=9,
    n_conv=3,
    mlp_hidden_dims=(16,),
    atom_conv_hidden_dim=16,
    bond_conv_hidden_dim=16,
)


@pytest.fixture(scope="module")
def model():
    return CHGNet(seed=0, **SMALL)


@pytest.fixture(scope="module")
def struct():
    return Structure.from_file(f"{ROOT}/examples/mp-18767-LiMnO2.cif")


def _reference(model, batch):
    return compute_batch(
        model.params,
        batch,
        config=model.config,
        compute_force=True,
        compute_stress=True,
        compute_magmom=True,
    )


def _sharded(model, batch, n_devices):
    mesh = make_mesh(n_devices, axis_name="graph")
    sbatch = shard_batch(batch, n_devices)
    out = compute_batch_sharded(
        model.params,
        sbatch,
        config=model.config,
        mesh=mesh,
        compute_force=True,
        compute_stress=True,
        compute_magmom=True,
    )
    return sbatch, out


@pytest.mark.parametrize("n_devices", [2, 8])
def test_sharded_matches_single_device(model, struct, n_devices):
    """One 64-atom structure split across the mesh: e/f/s/m identical."""
    big = struct.make_supercell(2).perturb(0.05, seed=0)
    graph = model.graph_converter(big)
    batch = batch_graphs([graph])
    ref = _reference(model, batch)
    sbatch, out = _sharded(model, batch, n_devices)

    np.testing.assert_allclose(
        np.asarray(out["e"]), np.asarray(ref["e"]), atol=1e-5
    )
    n = len(big)
    f_sharded = unshard_atoms(out["f"])[:n]
    np.testing.assert_allclose(
        f_sharded, np.asarray(ref["f"])[:n], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["s"]), np.asarray(ref["s"]), atol=1e-4
    )
    m_sharded = unshard_atoms(out["m"])[:n]
    np.testing.assert_allclose(
        m_sharded, np.asarray(ref["m"])[:n], atol=1e-5
    )


def test_sharded_plans_match_plan_free(model, struct):
    """The per-device GatherPlans (streaming/backward scatter plans built
    by shard_batch) must be numerically inert: forward with plans equals
    forward with plans=False bit-for-bit on CPU (the perm custom-vjp path
    is exercised either way; the TPU streaming kernels consume the same
    plans)."""
    big = struct.make_supercell(2).perturb(0.05, seed=1)
    graph = model.graph_converter(big)
    batch = batch_graphs([graph])
    mesh = make_mesh(4, axis_name="graph")
    outs = []
    for with_plans in (True, False):
        sbatch = shard_batch(batch, 4, plans=with_plans)
        assert (sbatch.plans is not None) == with_plans
        outs.append(
            compute_batch_sharded(
                model.params, sbatch, config=model.config, mesh=mesh,
                compute_force=True, compute_stress=True,
                compute_magmom=True,
            )
        )
    for key in ("e", "f", "s", "m"):
        np.testing.assert_allclose(
            np.asarray(outs[0][key]), np.asarray(outs[1][key]),
            atol=1e-6, err_msg=key,
        )


def test_balance_bond_devices():
    """Weighted endpoint waterfill: species-blocked pairs (every bond
    oriented low-block -> high-block, heavy weights concentrated) must
    spread within ~the largest class granule of the mean, and forced
    same-device bonds stay put."""
    from chgnet_tpu.parallel.graph_sharded import _balance_bond_devices

    rng = np.random.default_rng(0)
    d = 4
    n = 40_000
    dev_c = rng.integers(0, d, n).astype(np.int32)
    # systematically oriented: second endpoint >= first (worst case for
    # the naive first-endpoint rule)
    dev_n = np.minimum(dev_c + rng.integers(0, d, n), d - 1).astype(np.int32)
    weights = np.where(dev_c == 0, 50, 1).astype(np.int64)  # heavy block
    u_dev = _balance_bond_devices(dev_c, dev_n, weights, d)
    forced = dev_c == dev_n
    assert (u_dev[forced] == dev_c[forced]).all()
    assert ((u_dev == dev_c) | (u_dev == dev_n)).all()
    loads = np.bincount(u_dev, weights=weights, minlength=d)
    naive = np.bincount(dev_c, weights=weights, minlength=d)
    # the naive rule is badly skewed; the waterfill must be much tighter
    assert loads.max() / loads.mean() < 1.35
    assert loads.max() < 0.6 * naive.max()


def test_sharded_multiple_graphs(model, struct):
    """A batch of graphs sharded across 4 devices (atoms of different
    graphs may land on the same device)."""
    graphs = [
        model.graph_converter(struct.perturb(0.04, seed=s)) for s in range(3)
    ]
    batch = batch_graphs(graphs)
    ref = _reference(model, batch)
    _, out = _sharded(model, batch, 4)
    np.testing.assert_allclose(
        np.asarray(out["e"])[:3], np.asarray(ref["e"])[:3], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["s"])[:3], np.asarray(ref["s"])[:3], atol=1e-4
    )
    # per-atom forces: compare in global block layout
    n_tot = sum(len(g.atomic_number) for g in graphs)
    np.testing.assert_allclose(
        unshard_atoms(out["f"])[:n_tot],
        np.asarray(ref["f"])[:n_tot],
        atol=1e-4,
    )


def test_shard_batch_layout(model, struct):
    graph = model.graph_converter(struct)
    batch = batch_graphs([graph])
    sbatch = shard_batch(batch, 4)
    assert sbatch.n_devices == 4
    # every valid edge's center belongs to its device's atom block
    n_loc = sbatch.atomic_numbers.shape[1]
    for dev in range(4):
        valid = sbatch.edge_mask[dev] > 0
        centers = sbatch.edge_center[dev][valid]
        assert ((centers >= dev * n_loc) & (centers < (dev + 1) * n_loc)).all()
    # edge count preserved
    assert int(sbatch.edge_mask.sum()) == int(batch.edge_mask.sum())
    assert int(sbatch.und_mask.sum()) == int(batch.und_mask.sum())
    assert int(sbatch.ang_mask.sum()) == int(batch.angle_mask.sum())


def test_graph_sharded_training_step(model, struct):
    """Parameter gradients THROUGH the sharded forward (incl. grad-of-grad
    for the force loss) match single-device training gradients, and the
    step optimizes."""
    import optax

    from chgnet_tpu.parallel.graph_sharded import (
        make_graph_sharded_train_step,
        shard_targets,
    )
    from chgnet_tpu.trainer.losses import CombinedLoss, loss_and_metrics

    big = struct.make_supercell(2).perturb(0.05, seed=0)
    graph = model.graph_converter(big)
    batch = batch_graphs([graph])
    n = len(big)

    # teacher labels
    teacher = CHGNet(seed=7, **SMALL)
    pred = teacher.predict_structure(big, task="ef")
    targets = {
        "e": np.array([pred["e"]], np.float32),
        "graph_mask": np.ones(1, np.float32),
        "f": np.concatenate(
            [np.asarray(pred["f"], np.float32),
             np.full((batch.n_atoms_padded - n, 3), np.nan, np.float32)]
        ),
    }

    # single-device reference gradient (same MSE e+f loss)
    loss_fn = CombinedLoss(target_str="ef", criterion="MSE")
    ref_grads, ref_metrics = jax.grad(
        lambda p: loss_and_metrics(
            p, batch, targets, config=model.config, loss_fn=loss_fn
        ),
        has_aux=True,
    )(model.params)

    n_dev = 4
    mesh = make_mesh(n_dev, axis_name="graph")
    sbatch = shard_batch(batch, n_dev)
    st = shard_targets(targets, sbatch)
    optimizer = optax.adam(1e-3)
    step = make_graph_sharded_train_step(
        config=model.config, optimizer=optimizer, mesh=mesh
    )
    params0 = model.params
    opt_state = optimizer.init(params0)
    params1, opt_state, metrics = step(params0, opt_state, sbatch, st)

    # losses agree with the single-device combined loss
    assert float(metrics["loss"]) == pytest.approx(
        float(ref_metrics["loss"]), rel=1e-4, abs=1e-6
    )
    assert float(metrics["e_MAE"]) == pytest.approx(
        float(ref_metrics["e_MAE"]), rel=1e-4, abs=1e-6
    )
    assert float(metrics["f_MAE"]) == pytest.approx(
        float(ref_metrics["f_MAE"]), rel=1e-4, abs=1e-6
    )
    # params moved
    delta = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        params0, params1,
    )
    assert max(jax.tree.leaves(delta)) > 0

    # gradient agreement: adam's first update is sign(grad)-scaled, so
    # compare the actual gradient trees via a second run with SGD
    sgd = optax.sgd(1.0)
    step_sgd = make_graph_sharded_train_step(
        config=model.config, optimizer=sgd, mesh=mesh
    )
    p_after, _, _ = step_sgd(params0, sgd.init(params0), sbatch, st)
    for key in ("atom_embedding", "bond_embedding", "site_wise"):
        sharded_grad = jax.tree.map(
            lambda a, b: np.asarray(a) - np.asarray(b),
            params0[key], p_after[key],
        )
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(sharded_grad)[0]),
            np.asarray(jax.tree.leaves(ref_grads[key])[0]),
            atol=1e-4, rtol=1e-3,
        )


def test_hybrid_mesh_and_initialize():
    from chgnet_tpu.parallel.distributed import initialize, make_hybrid_mesh

    initialize()  # single-process no-op
    mesh = make_hybrid_mesh(data=2, graph=4)
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == ("data", "graph")
    mesh2 = make_hybrid_mesh(graph=8)
    assert mesh2.devices.shape == (1, 8)
    with pytest.raises(ValueError, match="divisible"):
        make_hybrid_mesh(graph=3)


def test_graph_sharded_training_efsm(model, struct):
    """Full efsm sharded training: loss/MAEs match the single-device
    CombinedLoss (stress through the psum'ed strain gradient, magmoms on
    local atom blocks)."""
    import optax

    from chgnet_tpu.parallel.graph_sharded import (
        make_graph_sharded_train_step,
        shard_targets,
    )
    from chgnet_tpu.trainer.losses import CombinedLoss, loss_and_metrics

    big = struct.make_supercell(2).perturb(0.05, seed=3)
    batch = batch_graphs([model.graph_converter(big)])
    n = len(big)
    n_pad = batch.n_atoms_padded

    teacher = CHGNet(seed=7, **SMALL)
    pred = teacher.predict_structure(big, task="efsm")
    nanpad = lambda a, w: np.concatenate(
        [np.asarray(a, np.float32),
         np.full((n_pad - n, *w), np.nan, np.float32)]
    )
    targets = {
        "e": np.array([pred["e"]], np.float32),
        "graph_mask": np.ones(1, np.float32),
        "f": nanpad(pred["f"], (3,)),
        "s": np.asarray(pred["s"], np.float32)[None],
        "m": nanpad(pred["m"], ()),
    }
    loss_fn = CombinedLoss(target_str="efsm", criterion="MSE")
    _, ref_metrics = loss_and_metrics(
        model.params, batch, targets, config=model.config, loss_fn=loss_fn
    )

    mesh = make_mesh(4, axis_name="graph")
    sbatch = shard_batch(batch, 4)
    st = shard_targets(targets, sbatch)
    optimizer = optax.adam(1e-3)
    step = make_graph_sharded_train_step(
        config=model.config, optimizer=optimizer, mesh=mesh, targets="efsm"
    )
    _, _, metrics = step(
        model.params, optimizer.init(model.params), sbatch, st
    )
    for key in ("loss", "e_MAE", "f_MAE", "s_MAE", "m_MAE"):
        assert float(metrics[key]) == pytest.approx(
            float(ref_metrics[key]), rel=1e-4, abs=1e-6
        ), key


@pytest.mark.parametrize("n_devices", [2, 4, 8])
def test_halo_exchange_matches_single_device(model, struct, n_devices):
    """Boundary halo exchange (all_to_all of referenced border rows — the
    BASELINE north-star mechanism) reproduces the single-device forward
    exactly, including forces/stress through the collective transposes."""
    from chgnet_tpu.parallel.graph_sharded import (
        compute_batch_sharded_halo,
        shard_batch_halo,
    )

    big = struct.make_supercell(2).perturb(0.05, seed=0)
    batch = batch_graphs([model.graph_converter(big)])
    ref = _reference(model, batch)

    mesh = make_mesh(n_devices, axis_name="graph")
    sbatch, halo = shard_batch_halo(batch, n_devices)
    out = compute_batch_sharded_halo(
        model.params, sbatch, halo,
        config=model.config, mesh=mesh,
        compute_force=True, compute_stress=True, compute_magmom=True,
    )
    n = len(big)
    np.testing.assert_allclose(
        np.asarray(out["e"]), np.asarray(ref["e"]), atol=1e-5
    )
    np.testing.assert_allclose(
        unshard_atoms(out["f"])[:n], np.asarray(ref["f"])[:n], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["s"]), np.asarray(ref["s"]), atol=1e-4
    )
    np.testing.assert_allclose(
        unshard_atoms(out["m"])[:n], np.asarray(ref["m"])[:n], atol=1e-5
    )


def test_graph_sharded_training_halo(model, struct):
    """Training through the halo-exchange forward matches the all-gather
    path's loss and metrics exactly."""
    import optax

    from chgnet_tpu.parallel.graph_sharded import (
        make_graph_sharded_train_step,
        shard_batch_halo,
        shard_targets,
    )

    big = struct.make_supercell(2).perturb(0.05, seed=5)
    batch = batch_graphs([model.graph_converter(big)])
    n, n_pad = len(big), batch.n_atoms_padded
    teacher = CHGNet(seed=7, **SMALL)
    pred = teacher.predict_structure(big, task="ef")
    targets = {
        "e": np.array([pred["e"]], np.float32),
        "graph_mask": np.ones(1, np.float32),
        "f": np.concatenate(
            [np.asarray(pred["f"], np.float32),
             np.full((n_pad - n, 3), np.nan, np.float32)]
        ),
    }
    mesh = make_mesh(4, axis_name="graph")
    sbatch, halo = shard_batch_halo(batch, 4)
    st = shard_targets(targets, sbatch)
    opt = optax.sgd(1.0)

    step_ag = make_graph_sharded_train_step(
        config=model.config, optimizer=opt, mesh=mesh
    )
    p_ag, _, m_ag = step_ag(model.params, opt.init(model.params), sbatch, st)
    step_halo = make_graph_sharded_train_step(
        config=model.config, optimizer=opt, mesh=mesh, halo=True
    )
    p_halo, _, m_halo = step_halo(
        model.params, opt.init(model.params), (sbatch, halo), st
    )
    assert float(m_halo["loss"]) == pytest.approx(
        float(m_ag["loss"]), rel=1e-5, abs=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(p_halo["atom_embedding"]["weight"]),
        np.asarray(p_ag["atom_embedding"]["weight"]),
        atol=1e-5,
    )


def test_sharded_remat_identity(model, struct):
    """cfg.remat on the MESH path (new in round 4 — it was silently
    ignored before): forces identical to the un-remat'ed sharded run."""
    batch = batch_graphs([model.graph_converter(struct.make_supercell(2))])
    sbatch = shard_batch(batch, 8)
    mesh = make_mesh(8, axis_name="graph")
    ref = compute_batch_sharded(
        model.params, sbatch, config=model.config, mesh=mesh,
        compute_force=True,
    )
    cfg_r = CHGNet(seed=0, remat="angle", **SMALL).config
    out = compute_batch_sharded(
        model.params, sbatch, config=cfg_r, mesh=mesh, compute_force=True,
    )
    assert abs(float(out["e"][0]) - float(ref["e"][0])) < 1e-5
    np.testing.assert_allclose(
        np.asarray(out["f"]), np.asarray(ref["f"]), atol=1e-5
    )
