"""Graph-partitioned structure relaxation: batched FIRE/MDMin on a mesh.

Counterpart of :mod:`chgnet_tpu.parallel.md_sharded` for the relaxation
loop: one huge structure's atoms/edges/angles spread over a device mesh
(``shard_batch`` block layout), the SAME FIRE/MDMin update rule as the
single-device path (``simulation.relax.make_fire_step``) inside one
``shard_map``, forces from the sharded energy core with skin-topology
dynamic-cutoff masks, and per-graph reductions (power, velocity/force
norms, convergence fmax) psum/pmax-ed so every device sees identical
optimizer scalars. Use via ``StructOptimizer(..., mesh=N)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from chgnet_tpu.models.chgnet import CHGNetConfig
from chgnet_tpu.models.functions import segment_sum
from chgnet_tpu.parallel.graph_sharded import (
    ShardedGraphBatch,
    _sbatch_spec,
    _strip,
)
from chgnet_tpu.parallel.md_sharded import sharded_energy_eval
from chgnet_tpu.simulation.relax import FIRE, FireState, make_fire_step
from chgnet_tpu.simulation.units import GPA_TO_EV_A3

__all__ = ["fire_chunk_sharded"]


def _state_spec(axis: str) -> FireState:
    """shard_map spec for FireState: per-atom leaves sharded, per-graph
    leaves replicated."""
    return FireState(
        frac=P(axis),
        lat=P(),
        vel=P(axis),
        vel_cell=P(),
        dt=P(),
        alpha=P(),
        n_pos=P(),
        converged=P(),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "config", "mesh", "axis", "fire", "n_steps", "relax_cell",
        "record", "method",
    ),
)
def fire_chunk_sharded(
    params,
    sbatch: ShardedGraphBatch,
    state: FireState,
    halo=None,  # HaloBatch: boundary all_to_all instead of all-gathers
    *,
    config: CHGNetConfig,
    mesh: Mesh,
    axis: str = "graph",
    fire: FIRE,
    n_steps: int,
    fmax_target: float,
    cell_factor: jnp.ndarray,  # [B]
    relax_cell: bool,
    record: bool,
    method: str = "FIRE",
):
    """``n_steps`` fixed-topology FIRE/MDMin steps over the mesh.

    ``state`` per-atom leaves use the GLOBAL block layout
    [N_glob = D * N_loc, ...]; returned state and recorded trajectories
    come back in the same layout.
    """
    cfg = config
    n_graphs = sbatch.n_graphs
    sharded_spec = _sbatch_spec(sbatch, axis)
    halo_spec = jax.tree.map(lambda _: P(axis), halo)
    need_stress = relax_cell or record

    def local_chunk(params, sbatch_l, halo_l, state, fmax_t, cell_factor):
        sb = _strip(sbatch_l, sharded_spec, axis)
        hb = (
            None
            if halo_l is None
            else jax.tree.map(lambda leaf: leaf[0], halo_l)
        )
        owner = sb.atom_owner
        atom_mask = sb.atom_mask[:, None]

        def seg_sum(x):
            return jax.lax.psum(
                segment_sum(x, owner, n_graphs, indices_are_sorted=True),
                axis,
            )

        def seg_max(x):
            return jax.lax.pmax(
                jax.ops.segment_max(
                    x, owner, num_segments=n_graphs,
                    indices_are_sorted=True,
                ),
                axis,
            )

        def evaluate(frac, lat):
            out = sharded_energy_eval(
                params, cfg, sb, owner, axis, frac, lat,
                need_stress=need_stress, record=record, hb=hb,
            )
            forces = out.pop("forces") * atom_mask
            if need_stress:
                volume = jnp.abs(jnp.linalg.det(lat))
                virial = (
                    out["s"] * GPA_TO_EV_A3 * volume[:, None, None]
                )  # dE/d(strain) [B,3,3] eV
                virial = 0.5 * (virial + jnp.swapaxes(virial, 1, 2))
            else:
                virial = jnp.zeros((n_graphs, 3, 3), forces.dtype)
            return out.pop("epot"), forces, virial, out

        step = make_fire_step(
            fire=fire,
            owner=owner,
            atom_mask=atom_mask,
            fmax_target=fmax_t,
            cell_factor=cell_factor,
            relax_cell=relax_cell,
            record=record,
            method=method,
            evaluate=evaluate,
            seg_sum=seg_sum,
            seg_max=seg_max,
        )
        return jax.lax.scan(step, state, None, length=n_steps)

    state_spec = _state_spec(axis)
    ys_spec = {"energy": P(), "fmax": P()}
    if record:
        ys_spec.update(
            forces=P(None, axis),
            stress=P(),
            magmom=P(None, axis),
            crystal_fea=P(),
            frac=P(None, axis),
            lat=P(),
        )

    fn = shard_map(
        local_chunk,
        mesh=mesh,
        in_specs=(P(), sharded_spec, halo_spec, state_spec, P(), P()),
        out_specs=(state_spec, ys_spec),
        check_vma=True,
    )
    return fn(
        params,
        jax.tree.map(jnp.asarray, sbatch),
        jax.tree.map(jnp.asarray, halo),
        state,
        jnp.float32(fmax_target),
        jnp.asarray(cell_factor),
    )
