"""Graph-partitioned MD: the sharded integrator must reproduce the
single-device trajectories on a virtual mesh (and keep its conservation
properties). Covers the BASELINE north-star config "multi-chip supercell
MD" at test scale."""

from __future__ import annotations

import numpy as np
import pytest

from chgnet_tpu import ROOT
from chgnet_tpu.core.structure import Structure
from chgnet_tpu.models.chgnet import CHGNet
from chgnet_tpu.simulation import MolecularDynamics

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
def limno2_2x():
    return Structure.from_file(
        f"{ROOT}/examples/mp-18767-LiMnO2.cif"
    ).make_supercell(2)


def _perturbed_skin_batch(model, struct, seed):
    """A skin-built padded batch with positions moved inside the skin
    budget, so exact-cutoff masks genuinely differ from the build's."""
    from chgnet_tpu.graph.batching import batch_graphs
    from chgnet_tpu.graph.converter import CrystalGraphConverter

    cfg = model.config
    skin = 0.4
    conv = CrystalGraphConverter(
        atom_graph_cutoff=cfg.atom_graph_cutoff + skin,
        bond_graph_cutoff=cfg.bond_graph_cutoff + skin,
    )
    batch = batch_graphs([conv(struct, graph_id="0")])
    rng = np.random.default_rng(seed)
    frac = batch.frac_coords + (
        rng.normal(0, 0.004, batch.frac_coords.shape).astype(np.float32)
        * batch.atom_mask[:, None]
    )
    return batch._replace(frac_coords=frac.astype(np.float32))


def _with_sharded_frac(sb, batch):
    """Overwrite a sharded batch's positions with the padded batch's
    (block layout: padded order + zero tail)."""
    n_dev, n_loc = sb.frac_coords.shape[:2]
    fr = np.zeros((n_dev * n_loc, 3), np.float32)
    fr[: batch.frac_coords.shape[0]] = batch.frac_coords
    return sb._replace(frac_coords=fr.reshape(n_dev, n_loc, 3))


def _assert_matches_dynamic_ref(model, batch, ref, out):
    from chgnet_tpu.parallel.graph_sharded import unshard_atoms

    np.testing.assert_allclose(
        float(out["e"][0]), float(ref["e"][0]), atol=2e-5
    )
    f_sh = unshard_atoms(out["f"])[: batch.frac_coords.shape[0]]
    np.testing.assert_allclose(f_sh, np.asarray(ref["f"]), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(out["s"][0]), np.asarray(ref["s"][0]), atol=2e-5
    )


def test_sharded_dynamic_cutoff_matches_single_device(model, limno2_2x):
    """compute_batch_sharded(dynamic_cutoff=True) over a skin-built
    topology == compute_batch_dynamic on one device (E, F, S)."""
    from chgnet_tpu.parallel.graph_sharded import (
        compute_batch_sharded,
        shard_batch,
    )
    from chgnet_tpu.parallel.mesh import make_mesh
    from chgnet_tpu.simulation.runtime import compute_batch_dynamic

    batch = _perturbed_skin_batch(model, limno2_2x, seed=3)
    ref = compute_batch_dynamic(
        model.params, batch, config=model.config, compute_stress=True
    )
    sb = _with_sharded_frac(shard_batch(batch, 8), batch)
    out = compute_batch_sharded(
        model.params,
        sb,
        config=model.config,
        mesh=make_mesh(8, axis_name="graph"),
        compute_force=True,
        compute_stress=True,
        dynamic_cutoff=True,
    )
    _assert_matches_dynamic_ref(model, batch, ref, out)


def test_halo_dynamic_cutoff_matches_single_device(model, limno2_2x):
    """The halo-exchange variant's dynamic-cutoff masks agree with the
    single-device exact-cutoff forward too (the per-bond flag travels to
    edge rows through the bond halo exchange)."""
    from chgnet_tpu.parallel.graph_sharded import (
        compute_batch_sharded_halo,
        shard_batch_halo,
    )
    from chgnet_tpu.parallel.mesh import make_mesh
    from chgnet_tpu.simulation.runtime import compute_batch_dynamic

    batch = _perturbed_skin_batch(model, limno2_2x, seed=5)
    ref = compute_batch_dynamic(
        model.params, batch, config=model.config, compute_stress=True
    )
    sb, halo = shard_batch_halo(batch, 8)
    sb = _with_sharded_frac(sb, batch)
    out = compute_batch_sharded_halo(
        model.params,
        sb,
        halo,
        config=model.config,
        mesh=make_mesh(8, axis_name="graph"),
        compute_force=True,
        compute_stress=True,
        dynamic_cutoff=True,
    )
    _assert_matches_dynamic_ref(model, batch, ref, out)


def _run_md(struct, model, mesh, **kwargs):
    defaults = dict(
        model=model,
        ensemble="nvt",
        thermostat="Berendsen",
        temperature=300.0,
        starting_temperature=300.0,
        timestep=1.0,
        seed=0,
        skin=0.3,
        chunk_size=6,
    )
    defaults.update(kwargs)
    md = MolecularDynamics(struct, mesh=mesh, **defaults)
    return md


def test_mesh_md_matches_single_device(model, limno2_2x):
    """MolecularDynamics(mesh=8) reproduces the single-device NVT
    trajectory (positions, velocities, energy, temperature)."""
    ref = _run_md(limno2_2x, model, None)
    sh = _run_md(limno2_2x, model, 8)
    ref.run(12)
    sh.run(12)
    cap = ref.runtime.batch.n_atoms_padded
    np.testing.assert_allclose(
        np.asarray(sh.state.frac)[:cap],
        np.asarray(ref.state.frac),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(sh.state.vel)[:cap],
        np.asarray(ref.state.vel),
        atol=1e-6,
    )
    assert abs(float(sh.state.epot[0]) - float(ref.state.epot[0])) < 5e-3
    assert abs(sh.get_temperature() - ref.get_temperature()) < 0.1


def test_mesh_md_halo_matches_allgather(model, limno2_2x):
    """MolecularDynamics(mesh=8, halo=True) rides the boundary
    all_to_all exchange (47% of the all-gather wire bytes at D=8) and
    must reproduce the all-gather trajectory bit-for-near: same
    integrator, same topology, different row transport."""
    ag = _run_md(limno2_2x, model, 8)
    hl = _run_md(limno2_2x, model, 8, halo=True)
    assert hl.runtime.hbatch is not None
    ag.run(12)
    hl.run(12)
    np.testing.assert_allclose(
        np.asarray(hl.state.frac),
        np.asarray(ag.state.frac),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(hl.state.vel), np.asarray(ag.state.vel), atol=1e-6
    )
    assert abs(float(hl.state.epot[0]) - float(ag.state.epot[0])) < 5e-3


def test_mesh_md_halo_rebuild_path(model, limno2_2x):
    """Halo MD across topology rebuilds: the re-shard worker must rebuild
    the HaloBatch too (monotone halo caps keep trace shapes stable)."""
    ref = _run_md(limno2_2x, model, None, skin=0.08, chunk_size=4)
    hl = _run_md(limno2_2x, model, 8, skin=0.08, chunk_size=4, halo=True)
    ref.run(16)
    hl.run(16)
    assert hl.runtime.n_rebuilds >= 1, "test did not exercise a rebuild"
    cap = ref.runtime.batch.n_atoms_padded
    np.testing.assert_allclose(
        np.asarray(hl.state.frac)[:cap],
        np.asarray(ref.state.frac),
        atol=1e-5,
    )


def test_mesh_relax_halo_matches_allgather(model, limno2_2x):
    """StructOptimizer(mesh=8, halo=True): FIRE relaxation over the halo
    transport lands on the all-gather result."""
    from chgnet_tpu.simulation import StructOptimizer

    start = limno2_2x.perturb(0.06, seed=2)
    ag = StructOptimizer(model=model, mesh=8).relax(
        start, fmax=0.08, steps=60, relax_cell=True
    )
    hl = StructOptimizer(model=model, mesh=8, halo=True).relax(
        start, fmax=0.08, steps=60, relax_cell=True
    )
    np.testing.assert_allclose(
        hl["final_structure"].frac_coords,
        ag["final_structure"].frac_coords,
        atol=1e-5,
    )
    assert abs(hl["final_energy"] - ag["final_energy"]) < 5e-3


def test_mesh_md_rebuild_path(model, limno2_2x):
    """A small skin forces topology rebuilds mid-run: the re-shard path
    must keep the trajectory on course (positions still match the
    single-device run with the SAME skin)."""
    ref = _run_md(limno2_2x, model, None, skin=0.08, chunk_size=4)
    sh = _run_md(limno2_2x, model, 8, skin=0.08, chunk_size=4)
    ref.run(16)
    sh.run(16)
    assert sh.runtime.n_rebuilds >= 1, "test did not exercise a rebuild"
    cap = ref.runtime.batch.n_atoms_padded
    np.testing.assert_allclose(
        np.asarray(sh.state.frac)[:cap],
        np.asarray(ref.state.frac),
        atol=1e-5,
    )


def test_mesh_md_multi_structure_lockstep(model, limno2_2x):
    """Several structures run MD in lockstep on the mesh too (the atom
    blocks split graphs across devices; per-graph reductions must not
    mix them). Positions match the single-device two-structure run."""
    structs = [limno2_2x, limno2_2x.perturb(0.05, seed=9)]
    ref = _run_md(structs, model, None)
    sh = _run_md(structs, model, 8)
    ref.run(8)
    sh.run(8)
    cap = ref.runtime.batch.n_atoms_padded
    np.testing.assert_allclose(
        np.asarray(sh.state.frac)[:cap],
        np.asarray(ref.state.frac),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(sh.state.epot), np.asarray(ref.state.epot), atol=5e-3
    )


def test_mesh_md_nve_conserves_energy(model, limno2_2x, tmp_path):
    """NVE total energy drift on the sharded path stays at the meV scale
    (same bound the single-device NVE test uses)."""
    logfile = str(tmp_path / "nve_mesh.log")
    md = _run_md(limno2_2x, model, 8, ensemble="nve", logfile=logfile)
    md.run(30)
    log = np.loadtxt(logfile, skiprows=1, usecols=(1,))
    drift = float(log.max() - log.min())
    assert drift < 5e-3, f"NVE drift {drift} eV"


def test_mesh_md_npt_full_cell_smoke(model, limno2_2x):
    """Anisotropic Parrinello-Rahman NPT runs on the mesh: finite state,
    cell actually evolves."""
    md = _run_md(
        limno2_2x,
        model,
        8,
        ensemble="npt",
        thermostat="Nose-Hoover-full",
        bulk_modulus=100.0,
        pressure=0.0001,
    )
    lat0 = np.asarray(md.state.lat).copy()
    md.run(10)
    assert np.isfinite(np.asarray(md.state.frac)).all()
    assert np.isfinite(float(md.state.epot[0]))
    assert not np.allclose(np.asarray(md.state.lat), lat0)


def test_mesh_relax_matches_single_device(model, limno2_2x):
    """StructOptimizer(mesh=8) reproduces the single-device FIRE
    relaxation (final structure, trajectory length, energy)."""
    from chgnet_tpu.simulation import StructOptimizer

    start = limno2_2x.perturb(0.06, seed=2)
    ref = StructOptimizer(model=model).relax(
        start, fmax=0.08, steps=120, relax_cell=True
    )
    sh = StructOptimizer(model=model, mesh=8).relax(
        start, fmax=0.08, steps=120, relax_cell=True
    )
    assert len(sh["trajectory"]) == len(ref["trajectory"])
    np.testing.assert_allclose(
        sh["final_structure"].frac_coords,
        ref["final_structure"].frac_coords,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        sh["final_structure"].lattice.matrix,
        ref["final_structure"].lattice.matrix,
        atol=1e-5,
    )
    assert abs(sh["final_energy"] - ref["final_energy"]) < 5e-3


def test_mesh_relax_rejects_lbfgs(model):
    """LBFGS keeps device-resident history buffers the sharded path does
    not implement — asking for it with a mesh must fail loudly."""
    from chgnet_tpu.simulation import StructOptimizer

    with pytest.raises(NotImplementedError, match="FIRE/MDMin"):
        StructOptimizer(model=model, optimizer_class="LBFGS", mesh=8)


def test_mesh_md_record_observers(model, limno2_2x, tmp_path):
    """Trajectory observers work in mesh mode: per-atom streams come back
    in the global block layout and unpad to the structure's atoms."""
    md = MolecularDynamics(
        limno2_2x,
        model=model,
        ensemble="nvt",
        thermostat="Berendsen",
        temperature=300.0,
        starting_temperature=300.0,
        timestep=1.0,
        seed=0,
        chunk_size=5,
        mesh=8,
        trajectory=str(tmp_path / "traj.pkl"),
    )
    md.run(5)
    obs = md.observers[0]
    assert len(obs.energies) == 5
    assert obs.forces[0].shape == (len(limno2_2x), 3)
    assert obs.magmoms[0].shape == (len(limno2_2x),)
    assert np.isfinite(obs.forces[0]).all()
