"""Dropout support (reference ``conv_dropout`` / ``mlp_dropout``,
``model.py:59-64``, ``functions.py:70-107``): stochastic in train mode,
identity in eval mode, gradients flow."""

from __future__ import annotations

import jax
import numpy as np

from chgnet_tpu import ROOT
from chgnet_tpu.core.structure import Structure
from chgnet_tpu.graph.batching import batch_graphs
from chgnet_tpu.graph.converter import CrystalGraphConverter
from chgnet_tpu.models.chgnet import CHGNet, compute_batch
from chgnet_tpu.models.functions import dropout_apply, mlp_apply, mlp_init


def _batch():
    struct = Structure.from_file(f"{ROOT}/examples/mp-18767-LiMnO2.cif")
    conv = CrystalGraphConverter(atom_graph_cutoff=6.0, bond_graph_cutoff=3.0)
    return batch_graphs([conv(struct)])


def test_dropout_apply_semantics():
    rng = jax.random.key(0)
    x = np.ones((1000, 8), np.float32)
    # eval mode: identity
    np.testing.assert_array_equal(dropout_apply(x, 0.5, None), x)
    np.testing.assert_array_equal(dropout_apply(x, 0.0, rng), x)
    # train mode: inverted dropout, mean preserved, ~rate zeros
    out = np.asarray(dropout_apply(x, 0.5, rng))
    zero_frac = (out == 0).mean()
    assert 0.4 < zero_frac < 0.6
    np.testing.assert_allclose(out[out != 0], 2.0)


def test_mlp_dropout_train_vs_eval():
    rng_np = np.random.default_rng(0)
    params = mlp_init(rng_np, 16, output_dim=4, hidden_dim=(8, 8))
    x = rng_np.normal(size=(32, 16)).astype(np.float32)
    eval_out = np.asarray(mlp_apply(params, x))
    train1 = np.asarray(
        mlp_apply(params, x, dropout=0.5, rng=jax.random.key(1))
    )
    train2 = np.asarray(
        mlp_apply(params, x, dropout=0.5, rng=jax.random.key(2))
    )
    assert not np.allclose(train1, eval_out)
    assert not np.allclose(train1, train2)


def test_model_dropout_modes():
    batch = _batch()
    model = CHGNet(seed=0, conv_dropout=0.2, mlp_dropout=0.2)
    kw = dict(config=model.config, compute_force=True)
    # eval (no rng): deterministic, equal to a dropout-free model
    base = CHGNet(seed=0)
    out_eval = compute_batch(model.params, batch, **kw)
    out_base = compute_batch(base.params, batch, config=base.config,
                             compute_force=True)
    np.testing.assert_allclose(
        np.asarray(out_eval["e"]), np.asarray(out_base["e"]), atol=1e-6
    )
    # train (rng given): stochastic across rngs, finite gradients
    o1 = compute_batch(
        model.params, batch, **kw, dropout_rng=jax.random.key(1)
    )
    o2 = compute_batch(
        model.params, batch, **kw, dropout_rng=jax.random.key(2)
    )
    assert not np.allclose(np.asarray(o1["e"]), np.asarray(o2["e"]))
    assert np.isfinite(np.asarray(o1["f"])).all()

    def loss(params):
        out = compute_batch(
            params, batch, **kw, dropout_rng=jax.random.key(3)
        )
        return (out["e"] ** 2).sum() + (out["f"] ** 2).sum()

    grads = jax.grad(loss)(model.params)
    flat = np.concatenate(
        [np.asarray(g).ravel() for g in jax.tree.leaves(grads)]
    )
    assert np.isfinite(flat).all()
    assert np.abs(flat).max() > 0


def test_trainer_accepts_dropout_config():
    """Trainer runs a step with dropout enabled (per-step rng fold-in)."""
    from chgnet_tpu.data.dataset import StructureData, get_train_val_test_loader
    from chgnet_tpu.trainer.trainer import Trainer

    struct = Structure.from_file(f"{ROOT}/examples/mp-18767-LiMnO2.cif")
    rng = np.random.default_rng(0)
    structs, energies, forces = [], [], []
    for i in range(6):
        s = struct.perturb(0.05, seed=i)
        structs.append(s)
        energies.append(float(rng.normal(-7, 0.1)))
        forces.append(rng.normal(0, 0.1, (len(s), 3)))
    data = StructureData(
        structures=structs, energies=energies, forces=forces, shuffle=False
    )
    train_loader, val_loader, _ = get_train_val_test_loader(
        data, batch_size=2, train_ratio=0.67, val_ratio=0.33
    )
    model = CHGNet(seed=0, conv_dropout=0.1, mlp_dropout=0.1)
    trainer = Trainer(
        model=model, targets="ef", epochs=1, learning_rate=1e-3,
        print_freq=100,
    )
    trainer.train(train_loader, val_loader, save_dir=None)
    assert len(trainer.training_history["e"]["train"]) == 1
    assert np.isfinite(trainer.training_history["e"]["train"][0])
