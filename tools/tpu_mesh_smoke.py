"""D=1 REAL-TPU smoke of every sharded entry point with kernels live.

The CPU test suite structurally cannot catch TPU-backend-only trace
failures in the mesh paths: the streaming/fused kernels gate OFF on the
CPU backend, so shard_map(check_vma=True) never sees a pallas_call
there. This tool runs the full matrix — sharded forward, halo forward,
sharded training (grad-of-grad), sharded MD, halo MD, sharded
relaxation — on the live chip as a 1-device mesh, where every kernel
engages exactly as it would on a real multi-chip slice. Round 4 it
caught two shipped-latent bugs (missing vma declarations on pallas
outputs; fused-tail second-order vs check_vma) that 292 green CPU tests
missed.

Usage: python tools/tpu_mesh_smoke.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root for direct runs
import os, sys
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/chgnet_tpu_jax_cache")
from chgnet_tpu.utils.profiling import wait_for_tpu
if not wait_for_tpu(float(os.environ.get("CHGNET_TPU_PROBE_BUDGET_S", 900))):
    raise SystemExit("no tpu")
import optax
from chgnet_tpu import ROOT
from chgnet_tpu.core.structure import Structure
from chgnet_tpu.graph.batching import batch_graphs
from chgnet_tpu.models.chgnet import CHGNet
from chgnet_tpu.parallel.graph_sharded import (
    compute_batch_sharded, compute_batch_sharded_halo,
    make_graph_sharded_train_step, shard_batch, shard_batch_halo,
    shard_targets,
)
from chgnet_tpu.parallel.mesh import make_mesh
from chgnet_tpu.simulation import MolecularDynamics, StructOptimizer

model = CHGNet(seed=0)
struct = Structure.from_file(f"{ROOT}/examples/mp-18767-LiMnO2.cif").make_supercell(2).perturb(0.03, seed=0)
mesh = make_mesh(1, axis_name="graph")
batch = batch_graphs([model.graph_converter(struct)])
sb = shard_batch(batch, 1)
out = compute_batch_sharded(model.params, sb, config=model.config, mesh=mesh,
                            compute_force=True, compute_stress=True, compute_magmom=True)
print("sharded fwd OK e=", float(out["e"][0])); sys.stdout.flush()
sbh, hb = shard_batch_halo(batch, 1)
outh = compute_batch_sharded_halo(model.params, sbh, hb, config=model.config,
                                  mesh=mesh, compute_force=True)
print("halo fwd OK e=", float(outh["e"][0])); sys.stdout.flush()
opt = optax.adam(1e-3)
step = make_graph_sharded_train_step(config=model.config, optimizer=opt, mesh=mesh)
tgt = shard_targets({"e": np.float32([-7.0]), "graph_mask": np.ones(1, np.float32),
                     "f": np.zeros((batch.atomic_numbers.shape[0], 3), np.float32)}, sb)
_, _, metrics = step(model.params, opt.init(model.params), sb, tgt)
print("sharded train OK loss=", float(metrics["loss"])); sys.stdout.flush()
md = MolecularDynamics(struct, model=model, ensemble="nvt", thermostat="Berendsen",
                       temperature=300.0, starting_temperature=300.0, timestep=1.0,
                       seed=0, chunk_size=4, mesh=1)
md.run(4)
print("sharded MD OK T=", float(md.get_temperature())); sys.stdout.flush()
mdh = MolecularDynamics(struct, model=model, ensemble="nvt", thermostat="Berendsen",
                        temperature=300.0, starting_temperature=300.0, timestep=1.0,
                        seed=0, chunk_size=4, mesh=1, halo=True)
mdh.run(4)
print("halo MD OK T=", float(mdh.get_temperature())); sys.stdout.flush()
ro = StructOptimizer(model=model, mesh=1).relax(struct, fmax=0.3, steps=6, assign_magmoms=False)
print("sharded relax OK E=", ro["final_energy"])
print("ALL D=1 TPU MESH SMOKES PASS")
