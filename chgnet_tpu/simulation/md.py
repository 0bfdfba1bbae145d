"""On-device molecular dynamics: NVE / NVT / NPT ensembles.

TPU-native counterpart of the reference ``MolecularDynamics``
(``/root/reference/chgnet/model/dynamics.py:433-780``), which drives ASE
integrators on the host with a fresh graph every step. Here each ensemble
is a jitted velocity-Verlet ``lax.scan`` chunk over a padded batch with
skin-reused topology (:class:`GraphRuntime`), so several structures can
run MD in lockstep on one chip. Supported (matching the reference's
ensemble/thermostat matrix, ``dynamics.py:553-720``):

* ``nve``                — velocity Verlet
* ``nvt``  + Berendsen / Nose-Hoover
* ``npt``  + Berendsen (isotropic) / Berendsen_inhomogeneous (per-axis) /
  Nose-Hoover (isotropic MTK) / Nose-Hoover-full a.k.a. Parrinello-Rahman
  (anisotropic full-cell MTK: shear relaxes too).

Units: fs, eV, Angstrom, amu, K, GPa (see ``simulation/units.py``).
"""

from __future__ import annotations

import functools
import warnings
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from chgnet_tpu.core.structure import Structure
from chgnet_tpu.models.chgnet import CHGNetConfig
from chgnet_tpu.simulation import units
from chgnet_tpu.simulation.calculator import voigt_6
from chgnet_tpu.simulation.observers import (
    CrystalFeasObserver,
    TrajectoryObserver,
)
from chgnet_tpu.simulation.runtime import GraphRuntime, compute_batch_dynamic


class MDState(NamedTuple):
    """Batched MD integration state (a JAX pytree)."""

    frac: jnp.ndarray  # [N, 3]
    lat: jnp.ndarray  # [B, 3, 3]
    vel: jnp.ndarray  # [N, 3] A/fs
    accel: jnp.ndarray  # [N, 3] A/fs^2 at current positions
    epot: jnp.ndarray  # [B] total potential energy, eV
    stress: jnp.ndarray  # [B, 3, 3] potential stress, GPa
    zeta: jnp.ndarray  # [B] Nose-Hoover thermostat variable, 1/fs
    eps_dot: jnp.ndarray  # [B] isotropic barostat strain rate, 1/fs (MTK)
    cell_rate: jnp.ndarray  # [B, 3, 3] full-cell barostat strain-rate
    # matrix (symmetric, 1/fs) for the anisotropic Parrinello-Rahman NPT


class MDParams(NamedTuple):
    """Dynamic (traced) MD parameters."""

    dt: jnp.ndarray  # scalar, fs
    temperature: jnp.ndarray  # scalar, K
    taut: jnp.ndarray  # scalar, fs
    taup: jnp.ndarray  # scalar, fs
    pressure: jnp.ndarray  # scalar, GPa
    compressibility: jnp.ndarray  # scalar, 1/GPa


def kinetic_energy(
    vel: jnp.ndarray, masses: jnp.ndarray, owner: jnp.ndarray, n_graphs: int
) -> jnp.ndarray:
    """Per-graph kinetic energy [B] in eV (vel A/fs, masses amu)."""
    ke_atom = 0.5 * masses * (vel**2).sum(axis=1) * units.AMU_A2_FS2_TO_EV
    return jax.ops.segment_sum(
        ke_atom, owner, num_segments=n_graphs, indices_are_sorted=True
    )


def _pad_rows(arr, n_rows: int, fill=0.0) -> np.ndarray:
    """Extend ``arr``'s leading axis to ``n_rows`` with ``fill`` (the
    sharded state layout adds a tail past the padded batch order)."""
    arr = np.asarray(arr)
    out = np.full((n_rows,) + arr.shape[1:], fill, arr.dtype)
    out[: arr.shape[0]] = arr
    return out


def make_md_step(
    *,
    md: MDParams,
    masses: jnp.ndarray,  # [N] amu (padding: 1)
    dof: jnp.ndarray,  # [B]
    owner: jnp.ndarray,  # [N] graph ids (sorted)
    atom_mask: jnp.ndarray,  # [N, 1]
    ensemble: str,
    thermostat: str,
    record: bool,
    evaluate,  # (frac [N,3], lat [B,3,3]) -> (epot [B] eV, accel, out)
    seg_sum,  # per-atom [N, ...] -> per-graph [B, ...] sum over owner
):
    """Build one velocity-Verlet MD step (state, _) -> (state, ys).

    All ensemble/thermostat/barostat math lives here, parameterized by
    the force engine (``evaluate``) and the atom->graph reduction
    (``seg_sum``) so the same integrator drives the single-device padded
    batch AND the graph-partitioned multi-chip layout (where ``seg_sum``
    psums local partial sums and ``evaluate`` wraps the sharded energy
    core — see ``parallel/md_sharded.py``).
    """
    thermo = thermostat.lower()
    # NVE is plain velocity Verlet: the thermostat argument is inert there
    # (reference behavior: ensemble="nve" -> VelocityVerlet regardless,
    # dynamics.py:553-575)
    nose_hoover = ensemble in ("nvt", "npt") and (
        thermo.startswith("nose") or thermo.startswith("parrinello")
    )
    # anisotropic Parrinello-Rahman cell dynamics (reference flagship NPT:
    # ASE NPT with full upper-triangular cell DOF,
    # /root/reference/chgnet/model/dynamics.py:553-720,754-780)
    full_cell = nose_hoover and (
        "full" in thermo or thermo.startswith("parrinello")
    )
    # Nose-Hoover mass Q = dof * kB * T0 * taut^2  [eV fs^2]
    q_nh = dof * units.KB * md.temperature * md.taut**2
    # whether evaluate() carries the strain branch (see md_chunk)
    need_stress = ensemble == "npt" or record

    def kinetic(vel):
        return seg_sum(
            0.5 * masses * (vel**2).sum(axis=1) * units.AMU_A2_FS2_TO_EV
        )

    def total_pressure(state, ke):
        """Instantaneous pressure [B] in GPa incl. ideal-gas term."""
        volume = jnp.abs(jnp.linalg.det(state.lat))
        p_pot = -jnp.trace(state.stress, axis1=1, axis2=2) / 3.0
        p_kin = 2.0 * ke / (3.0 * volume) * units.EV_A3_TO_GPA
        return p_pot + p_kin

    def rescale_cell(state, eta):
        """Scale lattices (and positions implicitly, via frac) by eta [B,3]."""
        lat = state.lat * eta[:, :, None]  # row i scaled by eta_i
        return state._replace(lat=lat)

    def step(state: MDState, _):
        dt = md.dt
        vel = state.vel

        # --- thermostat pre-step
        if nose_hoover:
            vel = vel + 0.5 * dt * (
                state.accel - state.zeta[owner][:, None] * vel
            )
        else:
            vel = vel + 0.5 * dt * state.accel

        # --- drift
        cart = jnp.einsum("ni,nij->nj", state.frac, state.lat[owner])
        cart = cart + dt * vel
        frac = jnp.einsum(
            "ni,nij->nj", cart, jnp.linalg.inv(state.lat)[owner]
        )

        epot, accel, out = evaluate(frac, state.lat)

        # --- kick 2
        if nose_hoover:
            ke_half = kinetic(vel)
            zeta = state.zeta + dt * (
                2.0 * ke_half - dof * units.KB * md.temperature
            ) / jnp.maximum(q_nh, 1e-30)
            vel = (vel + 0.5 * dt * accel) / (
                1.0 + 0.5 * dt * zeta[owner][:, None]
            )
        else:
            zeta = state.zeta
            vel = vel + 0.5 * dt * accel

        state = MDState(
            frac=frac,
            lat=state.lat,
            vel=vel * atom_mask,
            accel=accel,
            epot=epot,
            # without the strain branch the priming-time stress would ride
            # along forever — carry zeros rather than present a stale value
            stress=out["s"]
            if need_stress
            else jnp.zeros_like(state.stress),
            zeta=zeta,
            eps_dot=state.eps_dot,
            cell_rate=state.cell_rate,
        )

        # --- Berendsen velocity rescale (nvt/npt with Berendsen thermostat)
        ke = kinetic(state.vel)
        temp = 2.0 * ke / jnp.maximum(dof * units.KB, 1e-30)
        if ensemble in {"nvt", "npt"} and not nose_hoover:
            lam2 = 1.0 + dt / md.taut * (
                md.temperature / jnp.maximum(temp, 1e-10) - 1.0
            )
            lam = jnp.sqrt(jnp.clip(lam2, 0.81, 1.21))
            state = state._replace(vel=state.vel * lam[owner][:, None])
            ke = kinetic(state.vel)
            temp = 2.0 * ke / jnp.maximum(dof * units.KB, 1e-30)

        # --- barostat (npt)
        if ensemble == "npt" and full_cell:
            # Full-cell (anisotropic) Nose-Hoover-Parrinello-Rahman / MTK
            # barostat: the cell strain-rate is a symmetric 3x3 matrix G
            # driven by the full internal stress tensor, so shear relaxes
            # too (reference behavior: ASE NPT upper-triangular dynamics,
            # dynamics.py:553-720,754-780).
            #   dG/dt = V (P_int - P0 I) / W + (2 KE / Nf) I / W
            #   cell:  h <- h (I + dt G)        (row-vector lattice)
            #   vel:   v <- v - dt (G + tr(G)/Nf I) v
            volume = jnp.abs(jnp.linalg.det(state.lat))
            eye3 = jnp.eye(3, dtype=state.lat.dtype)
            # kinetic stress sum(m v v^T) / V, eV/A^3
            kin_outer = seg_sum(
                masses[:, None, None]
                * state.vel[:, :, None]
                * state.vel[:, None, :]
            ) * units.AMU_A2_FS2_TO_EV / volume[:, None, None]
            # potential stress: state.stress is +dE/dstrain/V (GPa), i.e.
            # the NEGATIVE of the internal pressure tensor
            p_int = -state.stress * units.GPA_TO_EV_A3 + kin_outer
            p_int = 0.5 * (p_int + jnp.swapaxes(p_int, 1, 2))
            w_baro = (dof + 3.0) * units.KB * md.temperature * md.taup**2
            drive = volume[:, None, None] * (
                p_int - md.pressure * units.GPA_TO_EV_A3 * eye3
            ) + (2.0 * ke / jnp.maximum(dof, 1.0))[:, None, None] * eye3
            cell_rate = state.cell_rate + dt * drive / jnp.maximum(
                w_baro, 1e-30
            )[:, None, None]
            # bound the per-step deformation for stability
            cell_rate = jnp.clip(cell_rate, -0.02 / dt, 0.02 / dt)
            tr_g = jnp.trace(cell_rate, axis1=1, axis2=2)
            drag = cell_rate + (
                tr_g / jnp.maximum(dof, 1.0)
            )[:, None, None] * eye3
            vel_new = state.vel - dt * jnp.einsum(
                "nij,nj->ni", drag[owner], state.vel
            )
            lat_new = jnp.einsum(
                "bij,bjk->bik", state.lat, eye3[None] + dt * cell_rate
            )
            state = state._replace(
                cell_rate=cell_rate,
                vel=vel_new * atom_mask,
                lat=lat_new,
            )
            ke = kinetic(state.vel)
            temp = 2.0 * ke / jnp.maximum(dof * units.KB, 1e-30)
        elif ensemble == "npt" and nose_hoover:
            # MTK-style isotropic Nose-Hoover-Parrinello-Rahman barostat:
            # d(eps_dot)/dt = 3 V (P - P0) / W, W = (dof + 3) kB T0 taup^2
            volume = jnp.abs(jnp.linalg.det(state.lat))
            p_inst = total_pressure(state, ke)
            w_baro = (dof + 3.0) * units.KB * md.temperature * md.taup**2
            eps_dot = state.eps_dot + dt * 3.0 * volume * (
                (p_inst - md.pressure) * units.GPA_TO_EV_A3
            ) / jnp.maximum(w_baro, 1e-30)
            eta_iso = jnp.exp(jnp.clip(eps_dot * dt, -0.02, 0.02))
            state = state._replace(
                eps_dot=eps_dot,
                vel=state.vel
                * jnp.exp(
                    -(1.0 + 3.0 / jnp.maximum(dof, 1.0)) * eps_dot * dt
                )[owner][:, None],
            )
            state = rescale_cell(
                state, eta_iso[:, None] * jnp.ones((1, 3))
            )
            ke = kinetic(state.vel)
            temp = 2.0 * ke / jnp.maximum(dof * units.KB, 1e-30)
        elif ensemble == "npt":
            if thermostat.lower().endswith("inhomogeneous"):
                # per-axis coupling to the diagonal stress components
                volume = jnp.abs(jnp.linalg.det(state.lat))
                sigma_kin = (
                    seg_sum(masses[:, None] * state.vel**2)
                    * units.AMU_A2_FS2_TO_EV
                    / volume[:, None]
                    * units.EV_A3_TO_GPA
                )  # [B, 3] ideal-gas diagonal, GPa
                p_axis = (
                    -jnp.diagonal(state.stress, axis1=1, axis2=2) + sigma_kin
                )
                eta = (
                    1.0
                    + dt / md.taup * (md.compressibility / 3.0)
                    * (p_axis - md.pressure)
                )
            else:
                p_inst = total_pressure(state, ke)
                eta3 = 1.0 + dt / md.taup * md.compressibility * (
                    p_inst - md.pressure
                )
                eta = jnp.cbrt(eta3)[:, None] * jnp.ones((1, 3))
            eta = jnp.clip(eta, 0.98, 1.02)
            state = rescale_cell(state, eta)

        ys = {
            "epot": state.epot,
            "ekin": ke,
            "temperature": temp,
            "stress": state.stress,
        }
        if record:
            ys.update(
                forces=state.accel
                * masses[:, None]
                * units.AMU_A2_FS2_TO_EV,
                magmom=out["m"],
                crystal_fea=out["crystal_fea"],
                frac=state.frac,
                lat=state.lat,
            )
        return state, ys

    return step


@functools.partial(
    jax.jit,
    static_argnames=("config", "ensemble", "thermostat", "n_steps", "record"),
)
def md_chunk(
    params,
    batch,
    state: MDState,
    md: MDParams,
    masses: jnp.ndarray,  # [N] amu (padding: 1)
    dof: jnp.ndarray,  # [B] degrees of freedom (3 n_atoms)
    *,
    config: CHGNetConfig,
    ensemble: str,
    thermostat: str,
    n_steps: int,
    record: bool,
):
    """Run ``n_steps`` fixed-topology MD steps under ``lax.scan``."""
    n_graphs = batch.n_graphs
    owner = batch.atom_owner
    atom_mask = batch.atom_mask[:, None]
    # stress (the strain branch of the joint value_and_grad) only feeds
    # the barostats and recording observers; NVE/NVT without observers
    # skip it (the per-step ys["stress"] trace is zeros there)
    need_stress = ensemble == "npt" or record

    def evaluate(frac, lat):
        out = compute_batch_dynamic(
            params,
            batch._replace(frac_coords=frac, lattices=lat),
            config=config,
            compute_stress=need_stress,
            compute_magmom=record,
        )
        n_atoms = jnp.maximum(out["atoms_per_graph"], 1.0)
        epot = out["e"] * (n_atoms if config.is_intensive else 1.0)
        accel = (
            out["f"]
            * atom_mask
            / masses[:, None]
            * units.EV_PER_AMU_A_TO_A_FS2
        )
        return epot, accel, out

    def seg_sum(x):
        return jax.ops.segment_sum(
            x, owner, num_segments=n_graphs, indices_are_sorted=True
        )

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


def maxwell_boltzmann_velocities(
    masses: np.ndarray,
    temperature: float,
    *,
    seed: int | None = None,
    force_temp: bool = True,
    stationary: bool = True,
) -> np.ndarray:
    """Velocities [n, 3] in A/fs from the Maxwell-Boltzmann distribution."""
    rng = np.random.default_rng(seed)
    sigma = np.sqrt(
        units.KB * temperature / (masses * units.AMU_A2_FS2_TO_EV)
    )
    vel = rng.normal(size=(len(masses), 3)) * sigma[:, None]
    if stationary:
        vel -= (masses[:, None] * vel).sum(axis=0) / masses.sum()
    if force_temp and temperature > 0:
        ke = 0.5 * (masses[:, None] * vel**2).sum() * units.AMU_A2_FS2_TO_EV
        target = 1.5 * len(masses) * units.KB * temperature
        vel *= np.sqrt(target / max(ke, 1e-30))
    return vel


class MolecularDynamics:
    """Molecular dynamics over one Structure — or several in lockstep.

    Constructor arguments mirror the reference (``dynamics.py:433-551``):
    ensemble nve/nvt/npt, thermostat Berendsen / Berendsen_inhomogeneous /
    Nose-Hoover, temperature [K], timestep [fs], pressure [GPa],
    taut/taup time constants [fs], bulk_modulus [GPa] (auto-fitted via EOS
    for NPT when not given, fallback 2 GPa like ``dynamics.py:620-645``),
    logfile + loginterval, trajectory and crystal-feature capture.
    """

    def __init__(
        self,
        atoms: Structure | list[Structure],
        *,
        model=None,
        ensemble: str = "nvt",
        thermostat: str = "Berendsen_inhomogeneous",
        temperature: float = 300.0,
        starting_temperature: float | None = None,
        timestep: float = 2.0,
        pressure: float = units.ATM_IN_GPA,
        taut: float | None = None,
        taup: float | None = None,
        bulk_modulus: float | None = None,
        trajectory: str | None = None,
        logfile: str | None = None,
        loginterval: int = 1,
        crystal_feas_logfile: str | None = None,
        on_isolated_atoms: str = "warn",
        use_device: str | None = None,
        seed: int | None = None,
        skin: float = 0.3,
        chunk_size: int = 10,
        mesh: int | None = None,
        halo: bool = False,
        lean: bool | None = None,
    ) -> None:
        if model is None:
            from chgnet_tpu.models.chgnet import CHGNet

            model = CHGNet.load(verbose=False)
        if hasattr(model, "model"):  # CHGNetCalculator
            model = model.model
        self.model = model
        self.ensemble = ensemble.lower()
        self.thermostat = thermostat
        if self.ensemble not in {"nve", "nvt", "npt"}:
            raise ValueError(f"Ensemble not supported: {ensemble}")

        single = isinstance(atoms, Structure)
        self.structures = [atoms] if single else list(atoms)
        self._single = single
        self.temperature = float(temperature)
        self.timestep = float(timestep)
        self.pressure = float(pressure)
        self.taut = float(taut if taut is not None else 100 * timestep)
        self.taup = float(taup if taup is not None else 1000 * timestep)
        self.loginterval = int(loginterval)
        self.chunk_size = int(chunk_size)
        # drift fraction of the skin at which a background topology
        # rebuild is launched (the chunk keeps running on the old, still
        # valid topology while the host builds)
        self._rebuild_trigger = 0.4
        self._n_steps_done = 0

        if bulk_modulus is None and self.ensemble == "npt":
            bulk_modulus = self._auto_bulk_modulus()
        self.bulk_modulus = bulk_modulus
        compressibility = 1.0 / bulk_modulus if bulk_modulus else 0.0

        # multi-chip mode: graph-partitioned MD over a device mesh (the
        # BASELINE north-star "100k-atom supercell MD on N hosts" config);
        # the integrator and rebuild policy are identical, forces come
        # from the sharded energy core (parallel/md_sharded.py)
        self._mesh = None
        if mesh is not None:
            from chgnet_tpu.parallel.mesh import make_mesh

            self._mesh = make_mesh(int(mesh), axis_name="graph")
        self.runtime = GraphRuntime(
            model.config,
            self.structures,
            skin=skin,
            on_isolated_atoms=on_isolated_atoms,
            shard_mesh=self._mesh,
            halo=halo,
            lean=lean,
        )
        batch = self.runtime.batch
        # mesh mode: per-atom state lives in the sharded GLOBAL block
        # layout [n_glob = D * n_loc] (a zero-padded extension of the
        # padded order, invariant across rebuilds)
        if self._mesh is not None:
            n_state = (
                self.runtime.sbatch.frac_coords.shape[0]
                * self.runtime.sbatch.frac_coords.shape[1]
            )
        else:
            n_state = batch.n_atoms_padded
        self._n_state = n_state
        masses = np.ones(n_state)
        vel = np.zeros((n_state, 3))
        for idx, struct in enumerate(self.structures):
            sl = slice(self.runtime.offsets[idx], self.runtime.offsets[idx + 1])
            masses[sl] = struct.masses
            if starting_temperature is not None:
                vel[sl] = maxwell_boltzmann_velocities(
                    struct.masses,
                    starting_temperature,
                    seed=None if seed is None else seed + idx,
                )
        self.masses = jnp.asarray(masses, jnp.float32)
        self.dof = jnp.asarray(
            [3.0 * len(s) for s in self.structures], jnp.float32
        )
        self.md_params = MDParams(
            dt=jnp.float32(self.timestep),
            temperature=jnp.float32(self.temperature),
            taut=jnp.float32(self.taut),
            taup=jnp.float32(self.taup),
            pressure=jnp.float32(self.pressure),
            compressibility=jnp.float32(compressibility),
        )

        # padded-to-state-layout atom mask (identity in single-device mode)
        self._atom_mask_state = jnp.asarray(
            _pad_rows(batch.atom_mask, n_state)
        )
        frac0 = _pad_rows(batch.frac_coords, n_state)

        # prime accel/epot/stress with one evaluation
        epot0, accel0, stress0 = self._evaluate_full(
            jnp.asarray(frac0), jnp.asarray(batch.lattices)
        )
        self.state = MDState(
            frac=jnp.asarray(frac0),
            lat=jnp.asarray(batch.lattices),
            vel=jnp.asarray(vel, jnp.float32),
            accel=accel0,
            epot=epot0,
            stress=stress0,
            zeta=jnp.zeros(batch.n_graphs, jnp.float32),
            eps_dot=jnp.zeros(batch.n_graphs, jnp.float32),
            cell_rate=jnp.zeros((batch.n_graphs, 3, 3), jnp.float32),
        )

        self.observers: list[TrajectoryObserver] | None = None
        self._trajectory_path = trajectory
        if trajectory is not None:
            self.observers = [
                TrajectoryObserver(atomic_numbers=s.atomic_numbers)
                for s in self.structures
            ]
        self.crystal_feas_observer = (
            CrystalFeasObserver() if crystal_feas_logfile else None
        )
        self._crystal_feas_logfile = crystal_feas_logfile
        self._logfile = logfile
        if logfile:
            with open(logfile, "w") as file:
                file.write(
                    "Time[ps]      Etot[eV]     Epot[eV]     Ekin[eV]    T[K]\n"
                )

    def _evaluate_full(self, frac, lat):
        """(epot [B] eV, accel [N_state, 3], stress [B, 3, 3] GPa) at the
        given positions — single-device or graph-sharded per ``mesh``."""
        cfg = self.model.config
        if self._mesh is not None:
            from chgnet_tpu.parallel.graph_sharded import (
                compute_batch_sharded,
                unshard_atoms,
            )

            sb = self.runtime.sbatch
            n_loc = sb.frac_coords.shape[1]
            out = compute_batch_sharded(
                self.model.params,
                sb._replace(
                    frac_coords=jnp.reshape(frac, (-1, n_loc, 3)),
                    lattices=jnp.asarray(lat),
                ),
                self.runtime.hbatch,
                config=cfg,
                mesh=self._mesh,
                compute_force=True,
                compute_stress=True,
                dynamic_cutoff=True,
            )
            forces = jnp.asarray(unshard_atoms(out["f"]))
        else:
            out = compute_batch_dynamic(
                self.model.params,
                self.runtime.batch._replace(
                    frac_coords=frac[: self.runtime.batch.n_atoms_padded],
                    lattices=lat,
                ),
                config=cfg,
                compute_magmom=False,
            )
            forces = out["f"]
        n_atoms = jnp.maximum(out["atoms_per_graph"], 1.0)
        epot = out["e"] * (n_atoms if cfg.is_intensive else 1.0)
        accel = (
            forces
            * self._atom_mask_state[:, None]
            / self.masses[:, None]
            * units.EV_PER_AMU_A_TO_A_FS2
        )
        return epot, accel, out["s"]

    def _auto_bulk_modulus(self) -> float:
        """Fit bulk modulus via EOS, fallback 2 GPa (``dynamics.py:620-645``)."""
        from chgnet_tpu.simulation.eos import EquationOfState

        try:
            eos = EquationOfState(model=self.model)
            eos.fit(self.structures[0], steps=500, fmax=0.1)
            bulk = eos.get_bulk_modulus(unit="GPa")
            print(f"Bulk modulus of fitted material = {bulk:.3f} GPa")
            return float(bulk)
        except Exception:
            warnings.warn(
                "Warning!!! Equation of State fitting failed, setting bulk "
                "modulus to 2 GPa. NPT simulation can proceed with incorrect "
                "pressure relaxation time."
            )
            return 2.0

    # -------------------------------------------------------------------- run
    def _safe_steps(self, drift_fraction: float) -> int:
        """Upper bound on steps before two atoms could close the skin
        shell, from the current max atomic speed (with a 1.5x margin for
        acceleration during the chunk). Keeps long chunks from silently
        overrunning the Verlet budget mid-scan."""
        vmax = float(np.abs(np.asarray(self.state.vel)).max()) * np.sqrt(3.0)
        budget = max(1.0 - drift_fraction, 0.0) * self.runtime.skin
        per_step = 2.0 * vmax * self.timestep * 1.5
        if per_step <= 0.0:
            return self.chunk_size
        return max(int(budget / per_step), 1)

    def run(self, steps: int = 50) -> None:
        """Advance the dynamics by ``steps`` timesteps."""
        if self._mesh is not None:
            from chgnet_tpu.parallel.md_sharded import md_chunk_sharded
        record = (
            self.observers is not None
            or self.crystal_feas_observer is not None
        )
        done = 0
        drift = self.runtime.drift_fraction(
            np.asarray(self.state.frac[: self.runtime.batch.n_atoms_padded]),
            np.asarray(self.state.lat),
        )
        while done < steps:
            n_steps = min(
                self.chunk_size, steps - done, self._safe_steps(drift)
            )
            if n_steps < min(self.chunk_size, steps - done):
                # round down to a power of two: each distinct scan length
                # is a separate compile, so bucket the adaptive lengths
                n_steps = 1 << (n_steps.bit_length() - 1)
            if self._mesh is not None:
                self.state, ys = md_chunk_sharded(
                    self.model.params,
                    self.runtime.sbatch,
                    self.state,
                    self.md_params,
                    self.masses,
                    self.dof,
                    self.runtime.hbatch,
                    config=self.model.config,
                    mesh=self._mesh,
                    ensemble=self.ensemble,
                    thermostat=self.thermostat,
                    n_steps=n_steps,
                    record=record,
                )
            else:
                self.state, ys = md_chunk(
                    self.model.params,
                    self.runtime.batch,
                    self.state,
                    self.md_params,
                    self.masses,
                    self.dof,
                    config=self.model.config,
                    ensemble=self.ensemble,
                    thermostat=self.thermostat,
                    n_steps=n_steps,
                    record=record,
                )
            ys = jax.tree.map(np.asarray, ys)
            self._log_chunk(ys, n_steps)
            done += n_steps
            self._n_steps_done += n_steps
            # drift/rebuild bookkeeping runs on the padded-order prefix
            # (mesh mode's state carries a zero tail beyond it)
            frac = np.asarray(
                self.state.frac[: self.runtime.batch.n_atoms_padded]
            )
            lat = np.asarray(self.state.lat)
            # async-rebuild policy (GraphRuntime.step_rebuild): background
            # build launched at the trigger hides the ~0.5 s host build at
            # 10k atoms; stepping blocks only when the budget is exhausted
            drift = self.runtime.step_rebuild(
                frac, lat, trigger=self._rebuild_trigger
            )
        if self.observers is not None and self._trajectory_path:
            for idx, obs in enumerate(self.observers):
                suffix = "" if self._single else f".{idx}"
                obs.save(f"{self._trajectory_path}{suffix}")
        if self.crystal_feas_observer and self._crystal_feas_logfile:
            self.crystal_feas_observer.save(self._crystal_feas_logfile)

    # -------------------------------------------------------------- logging
    def _log_chunk(self, ys: dict, n_steps: int) -> None:
        for step in range(n_steps):
            global_step = self._n_steps_done + step + 1
            if global_step % self.loginterval:
                continue
            if self._logfile:
                with open(self._logfile, "a") as file:
                    for gi in range(len(self.structures)):
                        epot = ys["epot"][step][gi]
                        ekin = ys["ekin"][step][gi]
                        temp = ys["temperature"][step][gi]
                        time_ps = global_step * self.timestep / 1000.0
                        file.write(
                            f"{time_ps:<10.4f} {epot + ekin:12.4f} "
                            f"{epot:12.4f} {ekin:12.4f} {temp:6.1f}\n"
                        )
            if self.observers is not None:
                for gi, obs in enumerate(self.observers):
                    lat = ys["lat"][step][gi]
                    frac = self.runtime.unpad(ys["frac"][step], gi)
                    obs.record(
                        energy=ys["epot"][step][gi],
                        forces=self.runtime.unpad(ys["forces"][step], gi),
                        stress=voigt_6(ys["stress"][step][gi])
                        * units.GPA_TO_EV_A3,
                        magmoms=self.runtime.unpad(ys["magmom"][step], gi),
                        positions=frac @ lat,
                        cell=lat,
                    )
            if self.crystal_feas_observer is not None:
                self.crystal_feas_observer.record(ys["crystal_fea"][step])

    # ------------------------------------------------------------ accessors
    @property
    def atoms(self) -> Structure | list[Structure]:
        """Current structure(s) materialized from device state."""
        structs = self.runtime.structures(
            np.asarray(self.state.frac), np.asarray(self.state.lat)
        )
        return structs[0] if self._single else structs

    def get_temperature(self) -> float | np.ndarray:
        n_pad = self.runtime.batch.n_atoms_padded
        ke = kinetic_energy(
            self.state.vel[:n_pad],
            self.masses[:n_pad],
            jnp.asarray(self.runtime.batch.atom_owner),
            self.runtime.batch.n_graphs,
        )
        temp = np.asarray(2.0 * ke / (self.dof * units.KB))
        return float(temp[0]) if self._single else temp

    def upper_triangular_cell(self, *, verbose: bool | None = False) -> None:
        """Re-express every cell in an upper-triangular basis.

        API parity with the reference (``dynamics.py:754-780``), where
        ASE's Nose-Hoover NPT REQUIRES an upper-triangular cell. The
        on-device integrators here work with general cells, so this is a
        pure rigid re-expression: the new basis has identical cell
        parameters (an orthogonal map M relates the bases), fractional
        coordinates are unchanged, and velocities/accelerations rotate
        with M.
        """
        lats = np.asarray(self.state.lat, np.float64)
        new_lats = np.empty_like(lats)
        rotate = np.empty_like(lats)
        changed = False
        for idx, lat in enumerate(lats):
            if np.allclose(lat[np.tril_indices(3, -1)], 0.0, atol=1e-12):
                new_lats[idx] = lat
                rotate[idx] = np.eye(3)
                continue
            changed = True
            lengths = np.linalg.norm(lat, axis=1)
            a, b, c = lengths
            cos_a = lat[1] @ lat[2] / (b * c)  # alpha: angle(b, c)
            cos_b = lat[0] @ lat[2] / (a * c)
            cos_g = lat[0] @ lat[1] / (a * b)
            sin_a = np.sqrt(1.0 - cos_a**2)
            sin_b = np.sqrt(1.0 - cos_b**2)
            cos_p = np.clip(
                (cos_g - cos_a * cos_b) / (sin_a * sin_b), -1.0, 1.0
            )
            sin_p = np.sqrt(1.0 - cos_p**2)
            new_lat = np.array(
                [
                    (a * sin_b * sin_p, a * sin_b * cos_p, a * cos_b),
                    (0.0, b * sin_a, b * cos_a),
                    (0.0, 0.0, c),
                ]
            )
            new_lats[idx] = new_lat
            # cart_new = cart_old @ M with M = lat^-1 @ new_lat orthogonal
            rotate[idx] = np.linalg.solve(lat, new_lat)
        if not changed:
            return
        owner = _pad_rows(self.runtime.batch.atom_owner, self._n_state, 0)
        m_atom = jnp.asarray(rotate[owner], jnp.float32)
        vel = jnp.einsum("ni,nij->nj", self.state.vel, m_atom)
        self.state = self.state._replace(
            lat=jnp.asarray(new_lats, jnp.float32), vel=vel
        )
        # refresh the skin-topology reference frame and derived state
        self.runtime.rebuild(
            np.asarray(self.state.frac[: self.runtime.batch.n_atoms_padded]),
            np.asarray(self.state.lat),
        )
        epot, accel, stress = self._evaluate_full(
            self.state.frac, self.state.lat
        )
        self.state = self.state._replace(
            accel=accel, epot=epot, stress=stress
        )
        if verbose:
            print("Transformed to upper triangular unit cell.", flush=True)

    def set_atoms(self, atoms: Structure | list[Structure]) -> None:
        """Replace the structures (new topology, velocities kept)."""
        structures = [atoms] if isinstance(atoms, Structure) else list(atoms)
        if [len(s) for s in structures] != self.runtime.sizes:
            raise ValueError("set_atoms requires matching atom counts")
        self.runtime.rebuild(
            np.concatenate([s.frac_coords for s in structures]),
            np.stack([s.lattice.matrix for s in structures]),
        )
        batch = self.runtime.batch
        frac = _pad_rows(batch.frac_coords, self._n_state)
        self.state = self.state._replace(
            frac=jnp.asarray(frac),
            lat=jnp.asarray(batch.lattices),
        )
