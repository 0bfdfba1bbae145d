"""Relax MANY structures in one padded batch on device.

Flagship TPU extension over the reference (which relaxes one structure at
a time through an ASE host loop): every FIRE/LBFGS step below advances
all candidates simultaneously; converged ones freeze in place.
"""

from __future__ import annotations

import os

from chgnet_tpu.core.structure import Structure
from chgnet_tpu.models.chgnet import CHGNet
from chgnet_tpu.simulation import StructOptimizer

here = os.path.dirname(os.path.abspath(__file__))
base = Structure.from_file(f"{here}/mp-18767-LiMnO2.cif")

# a screening-style candidate pool: perturbed + strained variants
candidates = [base.perturb(0.08, seed=s) for s in range(8)] + [
    base.apply_strain(eps).perturb(0.05, seed=100 + i)
    for i, eps in enumerate((-0.04, -0.02, 0.02, 0.04))
]

model = CHGNet(seed=0)  # swap for CHGNet.load() with converted weights
relaxer = StructOptimizer(model=model, optimizer_class="FIRE")
results = relaxer.relax(
    candidates,
    fmax=0.05,
    steps=300,
    relax_cell=True,
    loginterval=None,   # skip per-step trajectory capture for speed
)

ranked = sorted(results, key=lambda r: r["final_energy"])
for rank, res in enumerate(ranked[:5]):
    struct = res["final_structure"]
    print(
        f"#{rank + 1}: E = {res['final_energy']:.4f} eV, "
        f"V = {struct.volume:.2f} A^3, {struct.formula}"
    )
