"""Standalone structure core: lattice, structure, element data, CIF IO."""

from chgnet_tpu.core.lattice import Lattice
from chgnet_tpu.core.structure import Structure

__all__ = ["Lattice", "Structure"]
