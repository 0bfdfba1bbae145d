"""Golden-value graph construction tests.

The numeric expectations come from the reference test suite
(``/root/reference/tests/test_crystal_graph.py``), which pins the graph
topology of LiMnO2 (mp-18767) under several cutoffs/transforms. These
counts are geometry facts, so they validate our standalone neighbor list +
edge pairing + line graph against the pymatgen+C implementation without
importing either.
"""

from __future__ import annotations

import numpy as np
import pytest

from chgnet_tpu.core.structure import Structure
from chgnet_tpu.graph.builder import build_graph_arrays
from chgnet_tpu.graph.converter import CrystalGraphConverter
from chgnet_tpu.graph.neighbors import get_neighbor_list


@pytest.fixture
def converter() -> CrystalGraphConverter:
    return CrystalGraphConverter(
        atom_graph_cutoff=5, bond_graph_cutoff=3, algorithm="numpy"
    )


def test_crystal_graph_limno2(converter, li_mn_o2) -> None:
    graph = converter(li_mn_o2, graph_id="test")
    assert graph.composition == "Li2 Mn2 O4"
    assert graph.atomic_number.tolist() == [3, 3, 25, 25, 8, 8, 8, 8]
    assert graph.atom_frac_coord.shape == (8, 3)
    assert graph.atom_graph.shape == (384, 2)
    assert (graph.atom_graph[:, 0] == 0).sum() == 48
    assert (graph.atom_graph[:, 1] == 0).sum() == 48
    assert (graph.atom_graph[:, 0] == 4).sum() == 48
    assert (graph.atom_graph[:, 0] == 7).sum() == 48
    assert graph.bond_graph.shape == (744, 5)
    assert (graph.bond_graph[:, 0] == 1).sum() == 72
    assert graph.lattice.shape == (3, 3)
    assert graph.undirected2directed.shape == (192,)
    assert graph.directed2undirected.shape == (384,)
    assert graph.num_isolated_atoms == 0


def test_crystal_graph_different_cutoff(li_mn_o2) -> None:
    converter = CrystalGraphConverter(
        atom_graph_cutoff=5.5, bond_graph_cutoff=3.5, algorithm="numpy"
    )
    graph = converter(li_mn_o2)
    assert graph.atom_graph.shape == (624, 2)
    assert (graph.atom_graph[:, 0] == 5).sum() == 78
    assert (graph.atom_graph[:, 1] == 5).sum() == 78
    assert (graph.atom_graph[:, 1] == 7).sum() == 78
    assert graph.bond_graph.shape == (2448, 5)
    assert (graph.bond_graph[:, 0] == 1).sum() == 306
    assert graph.undirected2directed.shape == (312,)
    assert graph.directed2undirected.shape == (624,)


def test_crystal_graph_perturb(converter, li_mn_o2) -> None:
    # the reference pins counts for a 0.1 A perturbation with a fixed torch
    # seed; our RNG differs so we check invariants rather than exact counts
    graph = converter(li_mn_o2.perturb(0.1, seed=0))
    assert graph.n_directed == 2 * graph.n_undirected
    assert graph.atom_graph.shape[1] == 2
    assert graph.bond_graph.shape[1] == 5
    # directed edges come in reverse pairs: every undirected id appears twice
    counts = np.bincount(graph.directed2undirected)
    assert (counts == 2).all()


def test_crystal_graph_strained(converter, li_mn_o2) -> None:
    graph = converter(li_mn_o2.apply_strain(0.1))
    assert graph.n_directed == 2 * graph.n_undirected
    # stretching reduces edge counts vs pristine
    assert graph.n_directed < 384


def test_crystal_graph_supercell(converter, li_mn_o2) -> None:
    supercell = li_mn_o2.make_supercell([2, 3, 4])
    graph = converter(supercell)
    assert graph.n_atoms == 192
    assert graph.atom_graph.shape == (9216, 2)
    assert graph.bond_graph.shape == (17856, 5)
    assert graph.undirected2directed.shape == (4608,)


def test_graph_stability_fuzz(converter, li_mn_o2) -> None:
    """20 random perturbed supercells keep n_directed == 2 * n_undirected
    (port of the reference stability fuzz, test_crystal_graph.py:306-335).
    """
    rng = np.random.default_rng(100)
    for trial in range(20):
        scale = rng.integers(1, 3, size=3)
        struct = li_mn_o2.make_supercell(scale).perturb(
            float(rng.uniform(0.01, 0.3)), seed=int(rng.integers(0, 2**31))
        )
        graph = converter(struct, graph_id=f"fuzz-{trial}")
        assert graph.n_directed == 2 * graph.n_undirected


def test_neighbor_list_symmetry(li_mn_o2) -> None:
    """Every (i, j, image) has its reverse (j, i, -image) with equal dist."""
    center, neighbor, image, dist = get_neighbor_list(li_mn_o2, r=5.0)
    fwd = {
        (int(c), int(n), tuple(img)): d
        for c, n, img, d in zip(center, neighbor, image, dist)
    }
    for (c, n, img), d in fwd.items():
        rev = (n, c, tuple(-i for i in img))
        assert rev in fwd
        assert fwd[rev] == pytest.approx(d, abs=1e-10)


def test_neighbor_list_unwrapped_coords(li_mn_o2) -> None:
    """Out-of-cell coordinates give the same topology (images shift)."""
    shifted = li_mn_o2.copy()
    shifted.frac_coords = shifted.frac_coords + np.array([2.0, -1.0, 3.0])
    base = get_neighbor_list(li_mn_o2, r=5.0)
    moved = get_neighbor_list(shifted, r=5.0)
    assert len(base[0]) == len(moved[0])
    assert np.sort(base[3]) == pytest.approx(np.sort(moved[3]), abs=1e-9)


def test_isolated_atom_policies() -> None:
    """ignore / warn / error responses to isolated atoms
    (port of reference test_converter.py:66-99).
    """
    lattice = np.diag([20.0, 20.0, 20.0])
    struct = Structure(lattice, ["H", "H"], [[0, 0, 0], [0.5, 0.5, 0.5]])

    conv_err = CrystalGraphConverter(
        atom_graph_cutoff=5, bond_graph_cutoff=3, algorithm="numpy"
    )
    with pytest.raises(ValueError, match="isolated atom"):
        conv_err(struct, graph_id="iso")

    conv_ok = CrystalGraphConverter(
        atom_graph_cutoff=5,
        bond_graph_cutoff=3,
        algorithm="numpy",
        on_isolated_atoms="ignore",
    )
    graph = conv_ok(struct, graph_id="iso")
    assert graph.num_isolated_atoms == 2
    assert graph.n_directed == 0


def test_builder_rejects_incomplete_pairs() -> None:
    with pytest.raises(ValueError, match="reverse-complete"):
        build_graph_arrays(
            2,
            center=np.array([0]),
            neighbor=np.array([1]),
            image=np.zeros((1, 3), dtype=np.int64),
            distance=np.array([1.0]),
            bond_graph_cutoff=3.0,
        )


def test_converter_as_dict_roundtrip(converter) -> None:
    dct = converter.as_dict()
    clone = CrystalGraphConverter.from_dict(dct)
    assert clone.atom_graph_cutoff == converter.atom_graph_cutoff
    assert clone.bond_graph_cutoff == converter.bond_graph_cutoff


def test_crystal_graph_save_load(converter, li_mn_o2, tmp_path) -> None:
    graph = converter(li_mn_o2, graph_id="save-test", mp_id="mp-18767")
    path = graph.save(fname="g.npz", save_dir=str(tmp_path))
    back = type(graph).from_file(path)
    assert back.graph_id == "save-test"
    assert back.mp_id == "mp-18767"
    assert np.array_equal(back.atom_graph, graph.atom_graph)
    assert np.array_equal(back.bond_graph, graph.bond_graph)
    assert back.atom_graph_cutoff == 5.0
