"""Lean topology shipping (graph/leanship.py): the device-expanded batch
must be interchangeable with the directly-transferred one.

Runs on the CPU backend (conftest), where expansion exercises the same
derivations the TPU path jits; the streaming kernels themselves are
covered by tests/test_stream_ops.py.
"""

from __future__ import annotations

import jax
import numpy as np
import pytest

from chgnet_tpu import ROOT
from chgnet_tpu.core.structure import Structure
from chgnet_tpu.graph.batching import batch_graphs
from chgnet_tpu.graph.converter import CrystalGraphConverter
from chgnet_tpu.graph.leanship import _PLAN_FIELDS, make_lean, ship_lean
from chgnet_tpu.models.chgnet import CHGNet
from chgnet_tpu.simulation.runtime import GraphRuntime, compute_batch_dynamic

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


@pytest.fixture(scope="module")
def model():
    return CHGNet(seed=0, **SMALL)


@pytest.fixture(scope="module")
def batch(model):
    base = Structure.from_file(f"{ROOT}/examples/mp-18767-LiMnO2.cif")
    structs = [base, base.make_supercell((2, 1, 1))]
    conv = CrystalGraphConverter(
        atom_graph_cutoff=model.config.atom_graph_cutoff + 0.3,
        bond_graph_cutoff=model.config.bond_graph_cutoff + 0.3,
    )
    return batch_graphs([conv(s) for s in structs])


def test_expand_reproduces_host_batch(batch):
    """Every derived array equals the host-built one bit-for-bit; only
    raw-mode plans drop their (kernel-unused) permutation."""
    out = jax.tree.map(np.asarray, ship_lean(batch))
    plain = {
        f: getattr(batch, f)
        for f in batch._fields
        if not f.startswith("plan_") and not f.startswith("dense_")
    }
    for name, host in plain.items():
        np.testing.assert_array_equal(
            np.asarray(host), getattr(out, name), err_msg=name
        )
    for name in _PLAN_FIELDS:
        hp = getattr(batch, f"plan_{name}")
        lp = getattr(out, f"plan_{name}")
        np.testing.assert_array_equal(
            hp.blk_lo, lp.blk_lo, err_msg=f"{name}.blk_lo"
        )
        np.testing.assert_array_equal(
            hp.blk_cnt, lp.blk_cnt, err_msg=f"{name}.blk_cnt"
        )
        np.testing.assert_array_equal(hp.g_lo, lp.g_lo, err_msg=f"{name}.g_lo")
        np.testing.assert_array_equal(
            hp.g_cnt, lp.g_cnt, err_msg=f"{name}.g_cnt"
        )
        if hp.raw.shape[0]:
            # raw-mode: raw survives; the host permutation (and with it
            # the sorted dst, both unread once raw is set) is dropped
            np.testing.assert_array_equal(
                hp.raw, lp.raw, err_msg=f"{name}.raw"
            )
            np.testing.assert_array_equal(
                lp.dst, lp.raw, err_msg=f"{name}.dst(raw)"
            )
            assert lp.perm.shape[0] == 0
        else:
            np.testing.assert_array_equal(
                hp.dst, lp.dst, err_msg=f"{name}.dst"
            )
            np.testing.assert_array_equal(
                hp.perm, lp.perm, err_msg=f"{name}.perm"
            )


def test_lean_forward_and_gradients_match(model, batch):
    """E/F/S/M through the lean-shipped batch == direct transfer.

    Raw-mode plans take the unsorted-fallback segment sum on CPU (a
    different floating add order), so comparison is allclose-tight, not
    bit-equal."""
    ref = compute_batch_dynamic(model.params, batch, config=model.config)
    lean = compute_batch_dynamic(
        model.params, ship_lean(batch), config=model.config
    )
    for key in ("e", "f", "s", "m"):
        np.testing.assert_allclose(
            np.asarray(ref[key]),
            np.asarray(lean[key]),
            rtol=2e-6,
            atol=2e-6,
            err_msg=key,
        )


def test_images_out_of_int8_range_rejected(batch):
    images = np.array(batch.images)
    images[0, 0] = 200.0
    with pytest.raises(ValueError, match="int8"):
        make_lean(batch._replace(images=images))


def test_runtime_lean_md_equivalence(model):
    """GraphRuntime(lean=True) MD trajectory == lean=False on CPU."""
    from chgnet_tpu.simulation import MolecularDynamics

    base = Structure.from_file(f"{ROOT}/examples/mp-18767-LiMnO2.cif")
    struct = base.make_supercell((2, 1, 1))

    def run(lean):
        md = MolecularDynamics(
            struct,
            model=model,
            ensemble="nve",
            temperature=300.0,
            starting_temperature=300.0,
            timestep=1.0,
            seed=7,
            lean=lean,
        )
        md.run(6)
        return np.asarray(md.state.frac), md

    frac_ref, md_ref = run(False)
    frac_lean, md_lean = run(True)
    assert md_lean.runtime.lean and not md_ref.runtime.lean
    np.testing.assert_allclose(frac_ref, frac_lean, rtol=5e-6, atol=5e-7)


def test_lean_rebuild_after_drift(model):
    """Rebuild through the lean path keeps dynamic-cutoff physics: drift
    atoms, rebuild, and compare against a fresh unlean runtime."""
    rng = np.random.default_rng(3)
    base = Structure.from_file(f"{ROOT}/examples/mp-18767-LiMnO2.cif")
    rt = GraphRuntime(model.config, [base], skin=0.4, lean=True)
    frac = np.asarray(rt.batch.frac_coords).copy()
    lat = np.asarray(rt.batch.lattices).copy()
    n = len(base)
    frac[:n] += rng.normal(scale=0.02, size=(n, 3)).astype(np.float32)
    rebuilt = rt.rebuild(frac, lat)
    fresh = GraphRuntime(
        model.config,
        [Structure(base.lattice, base.atomic_numbers.tolist(), frac[:n])],
        skin=0.4,
        lean=False,
    )
    out_lean = compute_batch_dynamic(
        model.params, rebuilt, config=model.config
    )
    out_ref = compute_batch_dynamic(
        model.params, fresh.batch, config=model.config
    )
    np.testing.assert_allclose(
        np.asarray(out_lean["e"])[:1],
        np.asarray(out_ref["e"])[:1],
        rtol=2e-6,
        atol=2e-6,
    )


def test_lean_zero_angle_batch(model):
    """A batch with no angle rows (tiny bond cutoff) survives the lean
    round-trip: run counts are all zero and every mask row is padding."""
    base = Structure.from_file(f"{ROOT}/examples/mp-18767-LiMnO2.cif")
    conv = CrystalGraphConverter(
        atom_graph_cutoff=model.config.atom_graph_cutoff, bond_graph_cutoff=0.5
    )
    b = batch_graphs([conv(base)])
    assert float(np.asarray(b.angle_mask).sum()) == 0
    out = jax.tree.map(np.asarray, ship_lean(b))
    for f in b._fields:
        if f.startswith(("plan_", "dense_")):
            continue
        np.testing.assert_array_equal(np.asarray(getattr(b, f)), getattr(out, f), err_msg=f)


def test_pipelined_rebuild_ordering(model):
    """In-flight background rebuilds apply in launch order up to the
    pipeline depth (3 since the graph/batch/ship split); the final
    Verlet reference is the LAST accepted launch's positions, and a
    further launch is refused while the pipeline is full."""
    import time

    rng = np.random.default_rng(11)
    base = Structure.from_file(f"{ROOT}/examples/mp-18767-LiMnO2.cif")
    struct = base.make_supercell((2, 2, 1))
    rt = GraphRuntime(model.config, [struct], skin=0.8)
    frac0 = np.asarray(rt.batch.frac_coords).copy()
    lat = np.asarray(rt.batch.lattices).copy()
    n = len(struct)

    def perturbed(scale):
        f = frac0.copy()
        f[:n] += rng.normal(scale=scale, size=(n, 3)).astype(np.float32)
        return f

    f1, f2, f3 = perturbed(0.02), perturbed(0.05), perturbed(0.08)
    assert rt.launch_rebuild(f1, lat)
    assert rt.launch_rebuild(f2, lat)  # drift past the gate vs f1
    assert rt.launch_rebuild(f3, lat)  # third stage slot
    assert not rt.launch_rebuild(perturbed(0.08), lat)  # pipeline full
    deadline = time.time() + 120
    while rt._pipeline and time.time() < deadline:
        rt.poll_rebuild()
        time.sleep(0.05)
    assert not rt._pipeline
    assert rt.n_rebuilds == 3
    np.testing.assert_allclose(rt._ref_frac, f3, atol=1e-7)


def test_tiled_lean_round_trip(model):
    """The lean blob carries the halo-tiled fields (exp_map/nbr_x and
    their plans) and the expansion reproduces them bit-for-bit; the model
    output through the lean batch is identical."""
    from chgnet_tpu import ROOT
    from chgnet_tpu.core.structure import Structure
    from chgnet_tpu.models.chgnet import compute_batch

    struct = Structure.from_file(
        f"{ROOT}/examples/mp-18767-LiMnO2.cif"
    ).make_supercell((4, 3, 3)).perturb(0.03, seed=0).spatial_sort()
    b = batch_graphs([model.graph_converter(struct)], tile=64)
    lb = jax.tree.map(np.asarray, ship_lean(b))
    np.testing.assert_array_equal(b.exp_map, lb.exp_map)
    np.testing.assert_array_equal(b.nbr_x, lb.nbr_x)
    for name in ("exp", "nbr_x"):
        hp = getattr(b, f"plan_{name}" if name != "nbr_x" else "plan_nbr_x")
        lp = getattr(lb, f"plan_{name}" if name != "nbr_x" else "plan_nbr_x")
        np.testing.assert_array_equal(hp.blk_lo, lp.blk_lo)
        np.testing.assert_array_equal(hp.blk_cnt, lp.blk_cnt)
        np.testing.assert_array_equal(hp.g_lo, lp.g_lo)
        if hp.raw.shape[0]:
            np.testing.assert_array_equal(hp.raw, lp.raw)
        else:
            np.testing.assert_array_equal(hp.dst, lp.dst)
            np.testing.assert_array_equal(hp.perm, lp.perm)
    r0 = compute_batch(model.params, b, config=model.config, compute_force=True)
    r1 = compute_batch(model.params, lb, config=model.config, compute_force=True)
    np.testing.assert_array_equal(np.asarray(r0["e"]), np.asarray(r1["e"]))
    np.testing.assert_array_equal(np.asarray(r0["f"]), np.asarray(r1["f"]))
