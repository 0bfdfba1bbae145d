"""Simulation layer: calculator, relaxation, molecular dynamics, EOS.

TPU-native counterpart of ``/root/reference/chgnet/model/dynamics.py``:
instead of wrapping ASE (host-side python loops rebuilding the graph every
step), simulation loops here are jit-compiled ``lax.scan`` chunks over a
padded graph batch whose neighbor topology is built once with a skin
radius and reused until atoms drift, with exact-cutoff semantics restored
on device via dynamic masks.
"""

from chgnet_tpu.simulation.calculator import CHGNetCalculator
from chgnet_tpu.simulation.eos import EquationOfState
from chgnet_tpu.simulation.md import MolecularDynamics
from chgnet_tpu.simulation.observers import (
    CrystalFeasObserver,
    TrajectoryObserver,
)
from chgnet_tpu.simulation.relax import FIRE, StructOptimizer

__all__ = [
    "FIRE",
    "CHGNetCalculator",
    "CrystalFeasObserver",
    "EquationOfState",
    "MolecularDynamics",
    "StructOptimizer",
    "TrajectoryObserver",
]
