"""Run molecular dynamics with chgnet-tpu.

Counterpart of the reference ``examples/run_md.py``: NPT MD on LiMnO2 with
trajectory + logfile capture. The integration loop is jit-compiled and
runs on device in lax.scan chunks with skin-reused graph topology.
"""

from __future__ import annotations

import os

from chgnet_tpu.core.structure import Structure
from chgnet_tpu.models.chgnet import CHGNet
from chgnet_tpu.simulation import MolecularDynamics

here = os.path.dirname(os.path.abspath(__file__))
struct = Structure.from_file(f"{here}/mp-18767-LiMnO2.cif")

# a randomly initialized model for the demo; swap for CHGNet.load() once a
# converted pretrained checkpoint is available
model = CHGNet(seed=0)

ensemble = "npt"
temperature = 300  # K

md = MolecularDynamics(
    atoms=struct,
    model=model,
    ensemble=ensemble,
    temperature=temperature,
    starting_temperature=temperature,
    timestep=2,  # fs
    bulk_modulus=100.0,  # GPa; omit to auto-fit via the EOS
    trajectory=f"md_out_{ensemble}_T_{temperature}.traj.pkl",
    logfile=f"md_out_{ensemble}_T_{temperature}.log",
    loginterval=100,
)
md.run(2000)  # 4 ps demo; scale the step count up for production runs
print("final temperature:", md.get_temperature(), "K")
