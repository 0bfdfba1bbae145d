"""Graph construction: neighbor search, edge pairing, line graphs, batching."""

from chgnet_tpu.graph.converter import CrystalGraphConverter
from chgnet_tpu.graph.crystalgraph import CrystalGraph

__all__ = ["CrystalGraph", "CrystalGraphConverter"]
