"""Graph-partitioned molecular dynamics: one structure's MD over a mesh.

The reference caps MD at what fits one device (its calculator rebuilds the
graph on the host every step, ``/root/reference/chgnet/model/dynamics.py:156-158``).
Here the BASELINE north-star config — a 100k-atom supercell on N chips —
runs the SAME velocity-Verlet integrator as the single-device loop
(``simulation.md.make_md_step``) inside one ``shard_map``:

* atoms/edges/bonds/angles live in the :class:`ShardedGraphBatch` block
  layout (``shard_batch``); per-atom MD state (positions, velocities,
  accelerations) is sharded over the mesh's graph axis,
* forces come from the graph-partitioned energy core ``_energy_sharded``
  with ``dynamic_cutoff=True`` (exact-cutoff masks over the skin-built
  topology, like ``simulation.runtime``), cross-device force terms flow
  through the all_gather transpose,
* per-graph reductions (kinetic energy, kinetic stress) psum local
  partial segment sums, so thermostat/barostat math sees replicated [B]
  values on every device,
* the host keeps the Verlet-skin rebuild policy: when drift exhausts the
  skin budget, rebuild + re-shard (atom block layout is invariant across
  rebuilds — the atom capacity is pinned — so velocities stay valid).

Use via ``MolecularDynamics(..., mesh=N)`` (``simulation.md``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from chgnet_tpu.models.chgnet import EV_A3_TO_GPA, CHGNetConfig
from chgnet_tpu.models.functions import linear_apply, segment_sum
from chgnet_tpu.parallel.graph_sharded import (
    ShardedGraphBatch,
    _energy_sharded,
    _energy_sharded_halo,
    _pvary,
    _sbatch_spec,
    _strip,
)
from chgnet_tpu.simulation import units
from chgnet_tpu.simulation.md import MDParams, MDState, make_md_step

__all__ = ["md_chunk_sharded", "sharded_energy_eval"]


def sharded_energy_eval(
    params,
    cfg: CHGNetConfig,
    sb,  # stripped ShardedGraphBatch (inside shard_map)
    owner,  # [N_loc] graph ids
    axis: str,
    frac,  # [N_loc, 3]
    lat,  # [B, 3, 3] replicated
    *,
    need_stress: bool,
    record: bool,
    hb=None,  # stripped HaloBatch: boundary all_to_all row exchange
):
    """Local E/F(/S) evaluation inside a sharded simulation step.

    Returns a dict with ``epot`` (extensive [B] eV incl. the
    composition/AtomRef term, replicated), ``forces`` (local [N_loc, 3],
    unmasked), ``s`` ([B, 3, 3] GPa, replicated; zeros when
    ``need_stress`` is False), and — under ``record`` — local ``m`` and
    replicated ``crystal_fea``. Shared by the sharded MD and relaxation
    chunks; mirrors ``compute_batch_sharded``'s local function with
    ``dynamic_cutoff=True`` (skin topologies)."""
    n_graphs = lat.shape[0]

    def energy_of(cart, strains):
        with jax.default_matmul_precision(cfg.matmul_precision):
            if hb is not None:
                e_partial, aux = _energy_sharded_halo(
                    params, cfg, sb._replace(lattices=lat), hb, cart,
                    strains, axis, dynamic_cutoff=True,
                )
            else:
                e_partial, aux = _energy_sharded(
                    params, cfg, sb._replace(lattices=lat), cart,
                    strains, axis, dynamic_cutoff=True,
                )
        return e_partial.sum(), (e_partial, aux)

    cart0 = jnp.einsum("ni,nij->nj", frac, lat[owner])
    # pvary: each device differentiates its OWN energy partial wrt the
    # replicated strain; the explicit psum below sums the virial (see
    # compute_batch_sharded — without pvary check_vma inserts a
    # transpose-psum and the stress comes out D-fold inflated)
    strains0 = _pvary(jnp.zeros((n_graphs, 3, 3), jnp.float32), axis)
    argnums = (0, 1) if need_stress else (0,)
    (_, (e_partial, aux)), grads = jax.value_and_grad(
        energy_of, argnums=argnums, has_aux=True
    )(cart0, strains0)
    if need_stress:
        volumes = jnp.abs(jnp.linalg.det(lat))
        virial = jax.lax.psum(grads[1], axis)
        stress = virial * EV_A3_TO_GPA / volumes[:, None, None]
    else:
        stress = jnp.zeros((n_graphs, 3, 3), jnp.float32)

    # extensive potential energy incl. the composition/AtomRef term,
    # mirroring compute_batch_sharded
    e_ext = jax.lax.psum(e_partial, axis)
    atoms_per_graph = jax.lax.psum(aux["atoms_per_graph_local"], axis)
    safe = jnp.maximum(atoms_per_graph, 1.0)
    energy = e_ext / safe if cfg.is_intensive else e_ext
    if "composition" in params:
        site_ref = params["composition"]["weight"][
            jnp.clip(sb.atomic_numbers - 1, 0, cfg.max_num_elements - 1)
        ] * sb.atom_mask
        comp_ext = jax.lax.psum(
            segment_sum(
                site_ref[:, None],
                jnp.where(sb.atom_mask > 0, owner, n_graphs).astype(
                    jnp.int32
                ),
                n_graphs,
            ).reshape(-1),
            axis,
        )
        energy = energy + (
            comp_ext / safe if cfg.atom_ref_is_intensive else comp_ext
        )
    epot = energy * safe if cfg.is_intensive else energy

    out = {"epot": epot, "forces": -grads[0], "s": stress}
    if record:
        out["m"] = (
            jnp.abs(
                linear_apply(params["site_wise"], aux["atom_feas_mid"])
            ).reshape(-1)
            * sb.atom_mask
        )
        out["crystal_fea"] = jax.lax.psum(aux["crystal_fea_local"], axis)
    return out


def _state_spec(axis: str) -> MDState:
    """shard_map spec for MDState: per-atom leaves sharded, per-graph
    leaves replicated."""
    return MDState(
        frac=P(axis),
        lat=P(),
        vel=P(axis),
        accel=P(axis),
        epot=P(),
        stress=P(),
        zeta=P(),
        eps_dot=P(),
        cell_rate=P(),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "config", "mesh", "axis", "ensemble", "thermostat", "n_steps",
        "record",
    ),
)
def md_chunk_sharded(
    params,
    sbatch: ShardedGraphBatch,
    state: MDState,
    md: MDParams,
    masses: jnp.ndarray,  # [N_glob] amu (padding: 1), block layout
    dof: jnp.ndarray,  # [B]
    halo=None,  # HaloBatch: boundary all_to_all instead of all-gathers
    *,
    config: CHGNetConfig,
    mesh: Mesh,
    axis: str = "graph",
    ensemble: str,
    thermostat: str,
    n_steps: int,
    record: bool,
):
    """``n_steps`` fixed-topology MD steps over the mesh.

    ``state`` per-atom leaves use the GLOBAL block layout
    [N_glob = D * N_loc, ...] (``unshard_atoms`` order); returned state and
    recorded per-atom trajectories come back in the same layout.
    """
    cfg = config
    n_graphs = sbatch.n_graphs
    sharded_spec = _sbatch_spec(sbatch, axis)
    halo_spec = jax.tree.map(lambda _: P(axis), halo)
    need_stress = ensemble == "npt" or record

    def local_chunk(params, sbatch_l, halo_l, state, md, masses, dof):
        sb = _strip(sbatch_l, sharded_spec, axis)
        hb = (
            None
            if halo_l is None
            else jax.tree.map(lambda leaf: leaf[0], halo_l)
        )
        owner = sb.atom_owner  # [N_loc] sorted graph ids
        atom_mask = sb.atom_mask[:, None]

        def seg_sum(x):
            return jax.lax.psum(
                segment_sum(x, owner, n_graphs, indices_are_sorted=True),
                axis,
            )

        def evaluate(frac, lat):
            out = sharded_energy_eval(
                params, cfg, sb, owner, axis, frac, lat,
                need_stress=need_stress, record=record, hb=hb,
            )
            accel = (
                out.pop("forces")
                * atom_mask
                / masses[:, None]
                * units.EV_PER_AMU_A_TO_A_FS2
            )
            return out.pop("epot"), accel, out

        step = make_md_step(
            md=md,
            masses=masses,
            dof=dof,
            owner=owner,
            atom_mask=atom_mask,
            ensemble=ensemble,
            thermostat=thermostat,
            record=record,
            evaluate=evaluate,
            seg_sum=seg_sum,
        )
        return jax.lax.scan(step, state, None, length=n_steps)

    state_spec = _state_spec(axis)
    ys_spec = {
        "epot": P(),
        "ekin": P(),
        "temperature": P(),
        "stress": P(),
    }
    if record:
        ys_spec.update(
            forces=P(None, axis),
            magmom=P(None, axis),
            crystal_fea=P(),
            frac=P(None, axis),
            lat=P(),
        )

    fn = shard_map(
        local_chunk,
        mesh=mesh,
        in_specs=(
            P(), sharded_spec, halo_spec, state_spec, P(), P(axis), P(),
        ),
        out_specs=(state_spec, ys_spec),
        check_vma=True,
    )
    return fn(
        params,
        jax.tree.map(jnp.asarray, sbatch),
        jax.tree.map(jnp.asarray, halo),
        state,
        md,
        jnp.asarray(masses),
        jnp.asarray(dof),
    )
