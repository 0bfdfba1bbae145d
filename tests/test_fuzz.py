"""Randomized hardening: arbitrary skewed cells and compositions through
the full builder stack and model invariants (extends the reference's
20-supercell stability fuzz, ``test_crystal_graph.py:306-335``)."""

from __future__ import annotations

import numpy as np
import pytest

from chgnet_tpu.core.lattice import Lattice
from chgnet_tpu.core.structure import Structure
from chgnet_tpu.graph.builder import build_graph_arrays
from chgnet_tpu.graph.fast import fast_graph
from chgnet_tpu.graph.neighbors import get_neighbor_list
from chgnet_tpu.models.chgnet import CHGNet

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


def _random_structure(rng: np.random.Generator) -> Structure:
    """A random periodic cell: skewed lattice, 2-24 atoms, mixed species,
    dense enough that no atom is isolated at 6 A."""
    n_atoms = int(rng.integers(2, 24))
    # random lattice: diagonal 3.5-8 A plus mild shear
    diag = rng.uniform(3.5, 8.0, 3)
    shear = rng.uniform(-0.3, 0.3, (3, 3)) * diag[:, None]
    matrix = np.diag(diag) + np.tril(shear, -1)
    species = rng.integers(1, 95, n_atoms).tolist()
    frac = rng.random((n_atoms, 3))
    return Structure(Lattice(matrix), species, frac)


@pytest.mark.parametrize("seed", range(12))
def test_builders_agree_on_random_cells(seed):
    rng = np.random.default_rng(seed)
    struct = _random_structure(rng)
    center, neighbor, image, dist = get_neighbor_list(struct, r=6.0)
    ref = build_graph_arrays(len(struct), center, neighbor, image, dist, 3.0)
    assert ref.n_directed == 2 * ref.n_undirected
    if fast_graph.is_available():
        fast = fast_graph.build(struct, 6.0, 3.0)
        np.testing.assert_array_equal(fast.atom_graph, ref.atom_graph)
        np.testing.assert_array_equal(fast.neighbor_image, ref.neighbor_image)
        np.testing.assert_array_equal(
            fast.directed2undirected, ref.directed2undirected
        )
        np.testing.assert_array_equal(fast.bond_graph, ref.bond_graph)
        np.testing.assert_allclose(fast.distances, ref.distances, atol=1e-9)


@pytest.mark.parametrize("seed", [100, 101, 102])
def test_model_invariants_on_random_cells(seed):
    """Finite e/f/s/m, zero net force, symmetric stress on random cells;
    wrapped coordinates give identical energy (periodicity)."""
    rng = np.random.default_rng(seed)
    struct = _random_structure(rng)
    model = CHGNet(seed=0, **SMALL)
    try:
        out = model.predict_structure(struct, task="efsm")
    except ValueError as exc:
        if "isolated atom" in str(exc):
            pytest.skip("random cell produced an isolated atom")
        raise
    assert np.isfinite(out["e"])
    f = np.asarray(out["f"])
    s = np.asarray(out["s"])
    assert np.isfinite(f).all() and np.isfinite(s).all()
    assert np.abs(f.sum(axis=0)).max() < 5e-4
    np.testing.assert_allclose(s, s.T, atol=1e-3)

    shifted = struct.copy()
    shifted.frac_coords = shifted.frac_coords + rng.integers(-2, 3, (len(struct), 3))
    out2 = model.predict_structure(shifted, task="e")
    assert out2["e"] == pytest.approx(out["e"], abs=1e-5)


@pytest.mark.parametrize("seed", [200, 201, 202])
def test_sharded_identity_on_random_cells(seed):
    """Graph-partitioned forward (with per-device streaming plans and the
    weighted bond-device balance) matches single-device e/f on random
    skewed cells — hardens the shard prep against arbitrary topologies,
    not just the LiMnO2 fixtures."""
    from chgnet_tpu.graph.batching import batch_graphs
    from chgnet_tpu.models.chgnet import compute_batch
    from chgnet_tpu.parallel.graph_sharded import (
        compute_batch_sharded,
        shard_batch,
        unshard_atoms,
    )
    from chgnet_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(seed)
    struct = _random_structure(rng)
    model = CHGNet(seed=0, **SMALL)
    try:
        graph = model.graph_converter(struct, graph_id="fuzz")
    except ValueError as exc:
        if "isolated atom" in str(exc):
            pytest.skip("random cell produced an isolated atom")
        raise
    batch = batch_graphs([graph])
    ref = compute_batch(
        model.params, batch, config=model.config, compute_force=True
    )
    sbatch = shard_batch(batch, 4)
    out = compute_batch_sharded(
        model.params, sbatch, config=model.config,
        mesh=make_mesh(4, axis_name="graph"), compute_force=True,
    )
    np.testing.assert_allclose(
        float(out["e"][0]), float(ref["e"][0]), atol=1e-5
    )
    n = len(struct)
    np.testing.assert_allclose(
        unshard_atoms(out["f"])[:n], np.asarray(ref["f"])[:n], atol=1e-4
    )
