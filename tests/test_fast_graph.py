"""C++ fast builder vs numpy builder equivalence (the dual-implementation
strategy of reference ``tests/test_crystal_graph.py``, which runs every
case through both its legacy and fast paths and asserts identity)."""

from __future__ import annotations

import numpy as np
import pytest

from chgnet_tpu import ROOT
from chgnet_tpu.core.lattice import Lattice
from chgnet_tpu.core.structure import Structure
from chgnet_tpu.graph.builder import build_graph_arrays
from chgnet_tpu.graph.converter import CrystalGraphConverter
from chgnet_tpu.graph.fast import fast_graph
from chgnet_tpu.graph.neighbors import get_neighbor_list

pytestmark = pytest.mark.skipif(
    not fast_graph.is_available(), reason="native builder unavailable"
)


def _numpy_build(struct, rc, rb):
    center, neighbor, image, dist = get_neighbor_list(struct, r=rc)
    return build_graph_arrays(len(struct), center, neighbor, image, dist, rb)


def _assert_identical(fast, ref):
    np.testing.assert_array_equal(fast.atom_graph, ref.atom_graph)
    np.testing.assert_array_equal(fast.neighbor_image, ref.neighbor_image)
    np.testing.assert_array_equal(
        fast.directed2undirected, ref.directed2undirected
    )
    np.testing.assert_array_equal(
        fast.undirected2directed, ref.undirected2directed
    )
    np.testing.assert_array_equal(fast.bond_graph, ref.bond_graph)
    np.testing.assert_allclose(fast.distances, ref.distances, atol=1e-10)


@pytest.fixture(scope="module")
def li_mn_o2():
    return Structure.from_file(f"{ROOT}/examples/mp-18767-LiMnO2.cif")


def test_golden_counts(li_mn_o2):
    """Reference golden: 384 directed / 192 undirected / 744 angles at
    5 A / 3 A (``test_crystal_graph.py:31-42``)."""
    arrays = fast_graph.build(li_mn_o2, 5.0, 3.0)
    assert arrays.n_directed == 384
    assert arrays.n_undirected == 192
    assert arrays.n_angles == 744


@pytest.mark.parametrize(
    "transform",
    [
        lambda s: s,
        lambda s: s.perturb(0.1, seed=0),
        lambda s: s.apply_strain(0.07),
        lambda s: s.apply_strain([-0.05, 0.02, 0.08]),
        lambda s: s.make_supercell(2),
        lambda s: s.make_supercell((2, 3, 4)).perturb(0.05, seed=1),
    ],
)
def test_fast_matches_numpy(li_mn_o2, transform):
    struct = transform(li_mn_o2)
    for rc, rb in ((5.0, 3.0), (6.0, 3.0)):
        _assert_identical(
            fast_graph.build(struct, rc, rb), _numpy_build(struct, rc, rb)
        )


def test_fast_matches_numpy_fuzz(li_mn_o2):
    """Random perturbed supercells; also pins n_dir == 2 * n_und
    (``test_crystal_graph.py:306-335``)."""
    rng = np.random.default_rng(0)
    for trial in range(10):
        scale = tuple(rng.integers(1, 3, size=3).tolist())
        struct = li_mn_o2.make_supercell(scale).perturb(
            float(rng.uniform(0.01, 0.3)), seed=trial
        )
        fast = fast_graph.build(struct, 6.0, 3.0)
        assert fast.n_directed == 2 * fast.n_undirected
        _assert_identical(fast, _numpy_build(struct, 6.0, 3.0))


def test_small_and_skewed_cells():
    """Tiny cells exercise many self-images; skewed cells exercise the
    plane-spacing image bound."""
    tiny = Structure(Lattice.cubic(2.2), ["Fe"], [[0, 0, 0]])
    _assert_identical(fast_graph.build(tiny, 6.0, 3.0), _numpy_build(tiny, 6.0, 3.0))
    skewed = Structure(
        [[4.0, 0, 0], [3.4, 2.1, 0], [1.2, 0.3, 5.1]],
        ["Na", "Cl"],
        [[0.1, 0.9, 0.2], [0.6, 0.4, 0.7]],
    )
    _assert_identical(
        fast_graph.build(skewed, 6.0, 3.0), _numpy_build(skewed, 6.0, 3.0)
    )


def test_converter_fast_algorithm(li_mn_o2):
    """CrystalGraphConverter(algorithm='fast') goes through the native
    path and matches the numpy converter output."""
    conv_fast = CrystalGraphConverter(
        atom_graph_cutoff=6, bond_graph_cutoff=3, algorithm="fast"
    )
    conv_np = CrystalGraphConverter(
        atom_graph_cutoff=6, bond_graph_cutoff=3, algorithm="numpy"
    )
    assert conv_fast.algorithm == "fast"
    g_fast = conv_fast(li_mn_o2)
    g_np = conv_np(li_mn_o2)
    np.testing.assert_array_equal(g_fast.atom_graph, g_np.atom_graph)
    np.testing.assert_array_equal(g_fast.bond_graph, g_np.bond_graph)
    np.testing.assert_array_equal(
        g_fast.directed2undirected, g_np.directed2undirected
    )
