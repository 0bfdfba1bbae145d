"""Graph construction: neighbor search, edge pairing, line graphs, batching."""

from chgnet_tpu.graph.batching import GraphBatch, batch_graphs
from chgnet_tpu.graph.converter import CrystalGraphConverter
from chgnet_tpu.graph.crystalgraph import CrystalGraph
from chgnet_tpu.graph.graph import DirectedEdge, Graph, Node, UndirectedEdge

__all__ = [
    "CrystalGraph",
    "CrystalGraphConverter",
    "DirectedEdge",
    "Graph",
    "GraphBatch",
    "Node",
    "UndirectedEdge",
    "batch_graphs",
]
