"""Trainer integration tests (counterpart of reference ``tests/test_trainer.py``):
full short training runs with NaN-label injection, checkpoint file layout,
composition-model fine-tuning selectivity, schedules and resume."""

from __future__ import annotations

import os
import pickle

import numpy as np
import pytest

from chgnet_tpu.core.lattice import Lattice
from chgnet_tpu.core.structure import Structure
from chgnet_tpu.data import StructureData, get_train_val_test_loader
from chgnet_tpu.models.chgnet import CHGNet
from chgnet_tpu.trainer import Trainer
from chgnet_tpu.trainer.trainer import _make_schedule

SMALL = dict(
    atom_fea_dim=16,
    bond_fea_dim=16,
    angle_fea_dim=16,
    num_radial=9,
    num_angular=9,
    n_conv=2,
    mlp_hidden_dims=(16,),
    atom_conv_hidden_dim=16,
    bond_conv_hidden_dim=16,
)

NaCl = Structure(
    Lattice.cubic(4), ["Na", "Cl"], [[0, 0, 0], [0.5, 0.5, 0.5]]
)


@pytest.fixture(scope="module")
def loaders():
    """20 perturbed NaCl structures with teacher-model labels and some NaN
    labels injected, like the reference fixture (``test_trainer.py:33-46``,
    which uses random labels; a teacher keeps the toy problem learnable)."""
    teacher = CHGNet(seed=7, **SMALL)
    structures, energies, forces, stresses, magmoms = [], [], [], [], []
    for index in range(20):
        struct = NaCl.perturb(0.1, seed=index)
        pred = teacher.predict_structure(struct, task="efsm")
        structures.append(struct)
        energies.append(float(pred["e"]))
        forces.append(np.asarray(pred["f"], dtype=np.float32))
        # dataset ingests VASP convention and multiplies by -0.1 -> GPa
        stresses.append(np.asarray(pred["s"], dtype=np.float32) * -10.0)
        magmoms.append(np.asarray(pred["m"], dtype=np.float32))
    # inject missing labels
    energies[2] = np.nan
    forces[4] = np.full((2, 3), np.nan, dtype=np.float32)
    magmoms[6] = np.full(2, np.nan, dtype=np.float32)
    data = StructureData(
        structures=structures,
        energies=energies,
        forces=forces,
        stresses=stresses,
        magmoms=magmoms,
        shuffle=False,
    )
    return get_train_val_test_loader(
        data, batch_size=4, train_ratio=0.6, val_ratio=0.2
    )


def test_trainer_end_to_end(loaders, tmp_path):
    train_loader, val_loader, test_loader = loaders
    model = CHGNet(seed=0, **SMALL)
    trainer = Trainer(
        model=model,
        targets="efsm",
        optimizer="Adam",
        criterion="MSE",
        learning_rate=1e-3,
        epochs=5,
        scheduler="CosLR",
        print_freq=100,
    )
    save_dir = str(tmp_path / "run")
    trainer.train(
        train_loader, val_loader, test_loader, save_dir=save_dir
    )
    # history filled for every target and split
    for key in "efsm":
        assert len(trainer.training_history[key]["train"]) == 5
        assert len(trainer.training_history[key]["val"]) == 5
        assert np.isfinite(trainer.training_history[key]["test"])
    # training reduced the energy error
    hist_e = trainer.training_history["e"]["train"]
    assert hist_e[-1] < hist_e[0]
    # checkpoint layout: one rotating epoch file + bestE_ + bestF_
    files = os.listdir(save_dir)
    assert sum(f.startswith("epoch") for f in files) == 1
    assert sum(f.startswith("bestE_") for f in files) == 1
    assert sum(f.startswith("bestF_") for f in files) == 1
    assert trainer.get_best_model() is not None


def test_trainer_resume(loaders, tmp_path):
    train_loader, val_loader, _ = loaders
    model = CHGNet(seed=1, **SMALL)
    trainer = Trainer(
        model=model, targets="ef", epochs=2, learning_rate=1e-3
    )
    save_dir = str(tmp_path / "resume")
    trainer.train(train_loader, val_loader, save_dir=save_dir)
    ckpt = next(
        os.path.join(save_dir, f)
        for f in os.listdir(save_dir)
        if f.startswith("epoch")
    )
    restored = Trainer.load(ckpt)
    assert restored.starting_epoch == 2
    assert restored.scheduler_step == trainer.scheduler_step
    np.testing.assert_allclose(
        np.asarray(restored.model.params["atom_embedding"]["weight"]),
        np.asarray(trainer.model.params["atom_embedding"]["weight"]),
    )
    # training history rides along
    assert (
        restored.training_history["e"]["train"]
        == trainer.training_history["e"]["train"]
    )
    # continue training from the restored state
    restored.epochs = 3
    restored.train(train_loader, val_loader, save_dir=save_dir)
    assert len(restored.training_history["e"]["train"]) == 3


def test_composition_model_freezing(loaders):
    train_loader, val_loader, _ = loaders
    model = CHGNet(seed=0, **SMALL)
    comp_before = np.asarray(model.params["composition"]["weight"]).copy()

    trainer = Trainer(model=model, targets="ef", epochs=1)
    trainer.train(train_loader, val_loader, save_dir=None)
    comp_frozen = np.asarray(model.params["composition"]["weight"])
    np.testing.assert_array_equal(comp_before, comp_frozen)

    trainer2 = Trainer(model=model, targets="ef", epochs=1)
    trainer2.train(
        train_loader, val_loader, save_dir=None, train_composition_model=True
    )
    comp_after = np.asarray(model.params["composition"]["weight"])
    # only Na (Z=11 -> row 10) and Cl (Z=17 -> row 16) rows may move
    changed = ~np.isclose(comp_before, comp_after)
    changed_rows = set(np.nonzero(changed)[0].tolist())
    assert changed_rows == {10, 16}


def test_nan_loss_aborts(loaders, capsys):
    train_loader, val_loader, _ = loaders
    model = CHGNet(seed=0, **SMALL)
    # absurd lr -> NaN loss quickly; trainer must exit, not crash
    trainer = Trainer(
        model=model, targets="ef", epochs=5, learning_rate=1e12,
        scheduler="ExponentialLR",
    )
    trainer.train(train_loader, val_loader, save_dir=None)
    assert len(trainer.training_history["e"]["train"]) < 5


def test_schedules():
    lr0, epochs = 1e-3, 10
    cos = _make_schedule("CosLR", lr0, epochs, {})
    assert cos(0) == pytest.approx(lr0)
    assert cos(10 * epochs) == pytest.approx(1e-2 * lr0)
    exp = _make_schedule("ExponentialLR", lr0, epochs, {})
    assert exp(1) == pytest.approx(lr0 * 0.98)
    multi = _make_schedule("MultiStepLR", lr0, epochs, {})
    assert multi(0) == pytest.approx(lr0)
    assert multi(4 * epochs) == pytest.approx(lr0 * 0.3)
    assert multi(9 * epochs) == pytest.approx(lr0 * 0.3**4)
    restart = _make_schedule("CosRestartLR", lr0, epochs, {})
    assert restart(0) == pytest.approx(lr0)
    assert restart(10) == pytest.approx(lr0)  # restarted at T_0=10
    with pytest.raises(NotImplementedError):
        _make_schedule("bogus", lr0, epochs, {})


def test_trainer_huber_and_optimizers(loaders):
    train_loader, val_loader, _ = loaders
    for optimizer in ("SGD", "AdamW", "RAdam"):
        model = CHGNet(seed=0, **SMALL)
        trainer = Trainer(
            model=model,
            targets="ef",
            optimizer=optimizer,
            criterion="Huber",
            delta=0.1,
            epochs=1,
            learning_rate=1e-3,
        )
        trainer.train(train_loader, val_loader, save_dir=None)
        assert np.isfinite(trainer.training_history["e"]["train"][0])


def test_trainer_data_parallel(loaders):
    """Trainer over a 4-device mesh: loader batches grouped/stacked per
    device, gradients pmean'ed — a capability the reference lacks."""
    train_loader, val_loader, _ = loaders
    model = CHGNet(seed=0, **SMALL)
    trainer = Trainer(
        model=model, targets="ef", epochs=2, learning_rate=1e-3, mesh=4
    )
    trainer.train(train_loader, val_loader, save_dir=None)
    hist = trainer.training_history["e"]["train"]
    assert len(hist) == 2 and all(np.isfinite(hist))
    # fixed capacities were pinned for shape-identical device batches
    assert train_loader.capacities is not None


def test_trainer_data_parallel_dropout(loaders):
    """DP training must keep dropout ACTIVE: the dp step threads the
    global step + per-shard axis index into the dropout rng (round-2
    review fix — the step argument was silently dropped before)."""
    train_loader, val_loader, _ = loaders
    model = CHGNet(seed=0, conv_dropout=0.2, mlp_dropout=0.1, **SMALL)
    trainer = Trainer(
        model=model, targets="ef", epochs=1, learning_rate=1e-3, mesh=2
    )
    trainer.train(train_loader, val_loader, save_dir=None)
    assert np.isfinite(trainer.training_history["e"]["train"][0])


def test_dp_step_matches_manual_grad_average():
    """The DP train step runs under shard_map with check_vma=False (its
    collectives are hand-placed), so nothing machine-checks that pmean is
    where it must be. This pins the semantics: one DP step over a
    2-device mesh == averaging per-device grads computed WITHOUT any
    shard_map, then one optimizer update."""
    import jax
    import optax

    from chgnet_tpu.graph.batching import batch_graphs
    from chgnet_tpu.parallel.dp import (
        loss_and_metrics,
        make_dp_train_step,
        stack_batches,
        stack_targets,
    )
    from chgnet_tpu.parallel.mesh import make_mesh
    from chgnet_tpu.trainer.losses import CombinedLoss

    model = CHGNet(seed=0, **SMALL)
    caps = (8, 256, 512)
    rng = np.random.default_rng(0)
    batches, targets = [], []
    for dev in range(2):
        graph = model.graph_converter(
            NaCl.perturb(0.08, seed=dev), graph_id=str(dev)
        )
        batch = batch_graphs([graph], capacities=caps)
        n_pad = batch.atomic_numbers.shape[0]
        targets.append(
            {
                "e": np.float32(rng.normal(-3.0, 0.1, size=1)),
                "f": rng.normal(0, 0.1, size=(n_pad, 3)).astype(np.float32),
                "graph_mask": np.ones(1, np.float32),
            }
        )
        batches.append(batch)

    loss_fn = CombinedLoss(target_str="ef", criterion="MSE")
    opt = optax.sgd(1e-2)
    params = model.params
    opt_state = opt.init(params)

    dp_step = make_dp_train_step(
        config=model.config, loss_fn=loss_fn, optimizer=opt,
        mesh=make_mesh(2),
    )
    dp_params, _, dp_metrics = dp_step(
        params, opt_state, stack_batches(batches), stack_targets(targets),
        np.int32(0),
    )

    # reference: plain jax.grad per device batch, tree-averaged
    grad_fn = jax.jit(
        jax.grad(
            lambda p, b, t: loss_and_metrics(
                p, b, t, config=model.config, loss_fn=loss_fn
            )[0],
        )
    )
    per_dev = [grad_fn(params, b, t) for b, t in zip(batches, targets)]
    gmean = jax.tree.map(lambda a, b: (a + b) / 2.0, *per_dev)
    updates, _ = opt.update(gmean, opt.init(params), params)
    ref_params = optax.apply_updates(params, updates)

    flat_dp = jax.tree.leaves(dp_params)
    flat_ref = jax.tree.leaves(ref_params)
    for got, want in zip(flat_dp, flat_ref):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6
        )
    # metrics are pmean'ed too: the DP loss equals the mean per-device loss
    losses = [
        float(
            loss_and_metrics(
                params, b, t, config=model.config, loss_fn=loss_fn
            )[0]
        )
        for b, t in zip(batches, targets)
    ]
    assert abs(float(dp_metrics["loss"]) - np.mean(losses)) < 1e-5


def test_stack_batches_harmonizes_plan_shapes():
    """Same-capacity batches may legally disagree on streaming-plan
    fields (data-dependent cost gates); stacking degrades those plans to
    the permutation form instead of raising."""
    from chgnet_tpu.graph.batching import batch_graphs
    from chgnet_tpu.graph.converter import CrystalGraphConverter
    from chgnet_tpu.ops.scatter import GatherPlan
    from chgnet_tpu.parallel.dp import stack_batches

    conv = CrystalGraphConverter(atom_graph_cutoff=5, bond_graph_cutoff=3)
    graphs = [conv(NaCl.make_supercell((2, 1, 1)), graph_id="g")]
    caps = (16, 512, 2048)
    b1 = batch_graphs(graphs, capacities=caps)
    b2 = batch_graphs(graphs, capacities=caps)
    # simulate a cost-gate disagreement: strip one batch's streaming fields
    p = b2.plan_ang_vj
    b2 = b2._replace(plan_ang_vj=GatherPlan(perm=p.perm, dst=p.dst))
    stacked = stack_batches([b1, b2])
    assert stacked.plan_ang_vj.raw.shape[0] == 2  # stacked, shapes agree
    assert stacked.plan_ang_vj.blk_lo.shape[-1] == 0  # degraded plan
    assert stacked.atom_graph.shape[0] == 2


def test_wandb_mocked(loaders, monkeypatch):
    """wandb init/log wiring, mirroring reference test_trainer.py:181-252."""
    from unittest.mock import MagicMock

    import chgnet_tpu.trainer.trainer as trainer_mod

    mock_wandb = MagicMock()
    monkeypatch.setattr(trainer_mod, "wandb", mock_wandb)
    train_loader, val_loader, _ = loaders
    model = CHGNet(seed=0, **SMALL)
    trainer = trainer_mod.Trainer(
        model=model,
        targets="ef",
        epochs=1,
        wandb_path="test-project/test-run",
    )
    mock_wandb.init.assert_called_once()
    _, kwargs = mock_wandb.init.call_args
    assert kwargs["project"] == "test-project"
    assert kwargs["name"] == "test-run"
    trainer.train(
        train_loader, val_loader, save_dir=None, wandb_log_freq="epoch"
    )
    # one epoch-level log with train+val metrics
    logged = [c.args[0] for c in mock_wandb.log.call_args_list]
    assert any("train_e_mae" in d and "val_e_mae" in d for d in logged)

    with pytest.raises(ValueError, match="project/run_name"):
        trainer_mod.Trainer(
            model=model, epochs=1, wandb_path="too/many/slashes"
        )


def test_get_best_model_is_snapshot(loaders):
    """get_best_model returns the best-epoch params, not an alias to the
    live (latest) model."""
    train_loader, val_loader, _ = loaders
    model = CHGNet(seed=0, **SMALL)
    trainer = Trainer(model=model, targets="ef", epochs=2, learning_rate=1e-3)
    trainer.train(train_loader, val_loader, save_dir=None)
    best = trainer.get_best_model()
    assert best is not trainer.model
    best_epoch = int(np.argmin(trainer.training_history["e"]["val"]))
    if best_epoch < len(trainer.training_history["e"]["val"]) - 1:
        # best epoch was not the last one: params must differ from latest
        same = np.allclose(
            np.asarray(best.params["atom_embedding"]["weight"]),
            np.asarray(trainer.model.params["atom_embedding"]["weight"]),
        )
        assert not same


def test_loss_extensivity():
    """Unit-cell and supercell batches give the same per-atom losses when
    labels scale correspondingly (reference test_trainer.py:53-104)."""
    from chgnet_tpu.graph.batching import batch_graphs
    from chgnet_tpu.models.chgnet import compute_batch
    from chgnet_tpu.trainer.losses import CombinedLoss, loss_and_metrics

    model = CHGNet(seed=0, **SMALL)
    teacher = CHGNet(seed=7, **SMALL)
    unit = NaCl.perturb(0.05, seed=0)
    super_ = unit.make_supercell((2, 1, 1))

    def targets_for(struct):
        pred = teacher.predict_structure(struct, task="ef")
        batch = batch_graphs([model.graph_converter(struct)])
        n_pad = batch.n_atoms_padded
        f = np.full((n_pad, 3), np.nan, np.float32)
        f[: len(struct)] = np.asarray(pred["f"], np.float32)
        return batch, {
            "e": np.array([pred["e"]], np.float32),
            "graph_mask": np.ones(1, np.float32),
            "f": f,
        }

    loss_fn = CombinedLoss(target_str="ef", criterion="MSE")
    batch_u, tgt_u = targets_for(unit)
    batch_s, tgt_s = targets_for(super_)
    _, m_u = loss_and_metrics(
        model.params, batch_u, tgt_u, config=model.config, loss_fn=loss_fn
    )
    _, m_s = loss_and_metrics(
        model.params, batch_s, tgt_s, config=model.config, loss_fn=loss_fn
    )
    # intensive energy + per-atom force errors: identical across cells
    assert float(m_s["e_MAE"]) == pytest.approx(float(m_u["e_MAE"]), abs=2e-5)
    assert float(m_s["f_MAE"]) == pytest.approx(float(m_u["f_MAE"]), abs=2e-5)
    assert float(m_s["loss"]) == pytest.approx(float(m_u["loss"]), abs=2e-4)
