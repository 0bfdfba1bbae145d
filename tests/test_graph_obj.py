"""Object-graph API tests: hand-built graphs (reference ``tests/
test_graph.py`` analog) + triple-implementation equivalence vs the numpy
array builder on a real structure."""

from __future__ import annotations

import numpy as np
import pytest

from chgnet_tpu import ROOT
from chgnet_tpu.core.structure import Structure
from chgnet_tpu.graph.builder import build_graph_arrays
from chgnet_tpu.graph.graph import DirectedEdge, Graph, Node, UndirectedEdge
from chgnet_tpu.graph.neighbors import get_neighbor_list


@pytest.fixture
def tri_graph() -> Graph:
    """3 nodes; bonds 0-1, 0-2, 1-2 plus a periodic self-bond on node 0
    (images +/-1), fed in both directions."""
    graph = Graph([Node(index=idx) for idx in range(3)])
    graph.add_edge(0, 1, np.zeros(3), 1.0)
    graph.add_edge(1, 0, np.zeros(3), 1.0)
    graph.add_edge(0, 2, np.zeros(3), 2.0)
    graph.add_edge(2, 0, np.zeros(3), 2.0)
    graph.add_edge(1, 2, np.zeros(3), 3.0)
    graph.add_edge(2, 1, np.zeros(3), 3.0)
    graph.add_edge(0, 0, np.array([0, 0, 1]), 4.0)
    graph.add_edge(0, 0, np.array([0, 0, -1]), 4.0)
    return graph


def test_graph_dedup(tri_graph):
    assert len(tri_graph.directed_edges_list) == 8
    assert len(tri_graph.undirected_edges_list) == 4
    graph_rows, d2u = tri_graph.adjacency_list()
    assert graph_rows == [
        [0, 1], [1, 0], [0, 2], [2, 0], [1, 2], [2, 1], [0, 0], [0, 0],
    ]
    assert d2u == [0, 0, 1, 1, 2, 2, 3, 3]
    assert tri_graph.undirected2directed() == [0, 2, 4, 6]


def test_graph_line_graph(tri_graph):
    line, u2d = tri_graph.line_graph_adjacency_list(cutoff=2.5)
    assert u2d == [0, 2, 4, 6]
    # bonds with d <= 2.5: und 0 (d=1) and und 1 (d=2); right bonds d < 2.5
    # node 0 has short directed edges [0 (0->1), 2 (0->2)]; node 1 only [1];
    # node 2 only [3]
    assert [row for row in line] == [
        [0, 0, 0, 1, 2],  # und0 via 0->1 with other 0->2
        [0, 1, 2, 0, 0],  # und1 via 0->2 with other 0->1
    ]


def test_directed_edge_equality():
    edge_a = DirectedEdge([0, 1], 0, {"image": np.array([0, 0, 1]), "distance": 1.5})
    rev = DirectedEdge([1, 0], 1, {"image": np.array([0, 0, -1]), "distance": 1.5})
    same = DirectedEdge([0, 1], 2, {"image": np.array([0, 0, 1]), "distance": 1.5})
    far = DirectedEdge([0, 1], 3, {"image": np.array([0, 0, 1]), "distance": 2.5})
    assert edge_a == rev
    assert edge_a == same
    assert edge_a != far
    und = edge_a.make_undirected(0)
    assert isinstance(und, UndirectedEdge)
    assert und.nodes == [0, 1]
    assert und.info["distance"] == 1.5


def test_incomplete_graph_raises():
    graph = Graph([Node(index=idx) for idx in range(2)])
    graph.add_edge(0, 1, np.zeros(3), 1.0)  # reverse never added
    with pytest.raises(ValueError, match="reverse edge"):
        graph.line_graph_adjacency_list(cutoff=3.0)


def test_object_graph_matches_array_builder():
    """Fed the same canonical neighbor list, the object Graph reproduces
    the numpy builder's index maps exactly (triple-implementation check
    together with the C++ equivalence tests)."""
    struct = Structure.from_file(f"{ROOT}/examples/mp-18767-LiMnO2.cif")
    center, neighbor, image, dist = get_neighbor_list(struct, r=5.0)
    arrays = build_graph_arrays(len(struct), center, neighbor, image, dist, 3.0)

    graph = Graph([Node(index=idx) for idx in range(len(struct))])
    for c, n, img, d in zip(center, neighbor, image, dist):
        graph.add_edge(int(c), int(n), img, float(d))

    rows, d2u = graph.adjacency_list()
    np.testing.assert_array_equal(np.asarray(rows), arrays.atom_graph)
    np.testing.assert_array_equal(np.asarray(d2u), arrays.directed2undirected)
    line, u2d = graph.line_graph_adjacency_list(cutoff=3.0)
    np.testing.assert_array_equal(np.asarray(u2d), arrays.undirected2directed)
    np.testing.assert_array_equal(np.asarray(line), arrays.bond_graph)
    assert len(line) == 744  # reference golden count
