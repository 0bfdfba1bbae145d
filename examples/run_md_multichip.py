"""Graph-partitioned multi-chip MD with chgnet-tpu.

One large supercell's atoms/edges/angles are spread over a device mesh
(``MolecularDynamics(mesh=N)``): forces come from the sharded energy
core with per-layer feature exchange over ICI, the velocity-Verlet
integrator is the same one the single-device loop uses, and the
Verlet-skin topology rebuild (including the mesh re-layout) runs on a
background thread. Trajectories are identical to the single-device path
(``tests/test_md_sharded.py``).

No TPU pod handy? Run on N virtual CPU devices:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/run_md_multichip.py
(with ``jax.config.update("jax_platforms", "cpu")`` before jax use).
"""

from __future__ import annotations

import os

import jax

from chgnet_tpu.core.structure import Structure
from chgnet_tpu.models.chgnet import CHGNet
from chgnet_tpu.simulation import MolecularDynamics

n_devices = len(jax.devices())
here = os.path.dirname(os.path.abspath(__file__))

# a big supercell — the point of the mesh is systems that exceed one chip.
# CHGNET_TPU_DEMO_SCALE / _STEPS shrink the demo for CPU smoke runs.
scale = tuple(
    int(x)
    for x in os.environ.get("CHGNET_TPU_DEMO_SCALE", "8,8,5").split(",")
)
n_steps = int(os.environ.get("CHGNET_TPU_DEMO_STEPS", 200))
struct = Structure.from_file(f"{here}/mp-18767-LiMnO2.cif").make_supercell(
    scale
)  # (8,8,5) -> 2,560 atoms; scale toward 100k for a pod slice
print(f"{len(struct)} atoms over {n_devices} device(s)")

# a randomly initialized model for the demo; swap for CHGNet.load() once a
# converted pretrained checkpoint is available
model = CHGNet(seed=0, compute_dtype="bfloat16")

md = MolecularDynamics(
    atoms=struct,
    model=model,
    ensemble="nvt",
    thermostat="Berendsen",
    temperature=300,  # K
    starting_temperature=300,
    timestep=2,  # fs
    logfile="md_mesh_nvt.log",
    loginterval=10,
    mesh=n_devices,
)
md.run(n_steps)
print("final temperature:", md.get_temperature(), "K")
