"""Batched on-device FIRE structure relaxation.

TPU-native counterpart of the reference ``StructOptimizer``
(``/root/reference/chgnet/model/dynamics.py:184-346``), which loops ASE's
FIRE on the host and rebuilds the graph every step. Here:

* FIRE (Bitzek et al. 2006, with the standard ASE parameterization:
  dt0=0.1, dtmax=1.0, Nmin=5, finc=1.1, fdec=0.5, astart=0.1, fa=0.99,
  maxstep=0.2 A) is a jitted ``lax.scan`` chunk over a padded batch,
* MANY structures relax in parallel, each with its own FIRE clock and
  convergence flag (converged graphs freeze in place),
* cell relaxation follows the unit-cell-filter scheme: the DOF vector is
  (cartesian positions, cell_factor * strain), with the strain gradient
  dE/d(eps) taken from the same single backward pass that yields forces,
* topology is reused across steps via :class:`GraphRuntime` skin masks.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from chgnet_tpu.core.structure import Structure
from chgnet_tpu.graph.batching import GraphBatch
from chgnet_tpu.models.chgnet import CHGNetConfig
from chgnet_tpu.simulation.observers import TrajectoryObserver
from chgnet_tpu.simulation.runtime import GraphRuntime, compute_batch_dynamic
from chgnet_tpu.simulation.units import GPA_TO_EV_A3

from chgnet_tpu.simulation.calculator import voigt_6


class FIRE(NamedTuple):
    """FIRE hyperparameters (ASE defaults)."""

    dt0: float = 0.1
    dtmax: float = 1.0
    n_min: int = 5
    f_inc: float = 1.1
    f_dec: float = 0.5
    alpha_start: float = 0.1
    f_alpha: float = 0.99
    maxstep: float = 0.2


class FireState(NamedTuple):
    """Per-batch FIRE integration state (a JAX pytree)."""

    frac: jnp.ndarray  # [N, 3]
    lat: jnp.ndarray  # [B, 3, 3]
    vel: jnp.ndarray  # [N, 3] atom DOF velocity
    vel_cell: jnp.ndarray  # [B, 3, 3] scaled-strain DOF velocity
    dt: jnp.ndarray  # [B]
    alpha: jnp.ndarray  # [B]
    n_pos: jnp.ndarray  # [B] i32
    converged: jnp.ndarray  # [B] bool


def _init_state(
    batch: GraphBatch, fire: FIRE, n_state: int | None = None
) -> FireState:
    """``n_state`` extends the per-atom leaves beyond the padded batch
    (zero tail) — the sharded global block layout (StructOptimizer mesh
    mode)."""
    n_graphs = batch.n_graphs
    n_pad = batch.frac_coords.shape[0]
    n_state = n_pad if n_state is None else int(n_state)
    frac = np.zeros((n_state, 3), np.float32)
    frac[:n_pad] = np.asarray(batch.frac_coords)
    return FireState(
        frac=jnp.asarray(frac),
        lat=jnp.asarray(batch.lattices, jnp.float32),
        vel=jnp.zeros((n_state, 3), jnp.float32),
        vel_cell=jnp.zeros((n_graphs, 3, 3), jnp.float32),
        dt=jnp.full((n_graphs,), fire.dt0, jnp.float32),
        alpha=jnp.full((n_graphs,), fire.alpha_start, jnp.float32),
        n_pos=jnp.zeros((n_graphs,), jnp.int32),
        converged=jnp.zeros((n_graphs,), bool),
    )


def make_fire_step(
    *,
    fire: FIRE,
    owner: jnp.ndarray,  # [N] graph ids (sorted)
    atom_mask: jnp.ndarray,  # [N, 1]
    fmax_target: float,
    cell_factor: jnp.ndarray,  # [B]
    relax_cell: bool,
    record: bool,
    method: str,
    evaluate,  # (frac, lat) -> (e_total [B], forces [N,3], virial, out)
    seg_sum,  # per-atom [N] -> per-graph [B] sum over owner
    seg_max,  # per-atom [N] -> per-graph [B] max over owner
):
    """Build one FIRE/MDMin step (state, _) -> (state, ys).

    Like :func:`chgnet_tpu.simulation.md.make_md_step`, the optimizer
    math is parameterized by the force engine and the atom->graph
    reductions so the same implementation drives the single-device
    padded batch and the graph-partitioned mesh layout
    (``parallel/relax_sharded.py``, where ``seg_sum``/``seg_max``
    psum/pmax local partials).
    """

    def step(state: FireState, _):
        e_total, forces, virial, out = evaluate(state.frac, state.lat)
        cell_forces = (
            -virial / cell_factor[:, None, None]
            if relax_cell
            else jnp.zeros_like(virial)
        )

        # convergence: max row norm over atoms (+ cell pseudo-atoms)
        f2_atom = (forces**2).sum(axis=1)
        fmax2 = seg_max(jnp.where(atom_mask[:, 0] > 0, f2_atom, 0.0))
        if relax_cell:
            fmax2 = jnp.maximum(fmax2, (cell_forces**2).sum(axis=2).max(axis=1))
        fmax = jnp.sqrt(fmax2)
        converged = state.converged | (fmax < fmax_target)

        # FIRE / MDMin: P = F . v per graph over the combined DOF
        power = seg_sum((forces * state.vel).sum(axis=1)) + (
            (cell_forces * state.vel_cell).sum(axis=(1, 2))
        )
        v_norm2 = seg_sum((state.vel**2).sum(axis=1)) + (
            (state.vel_cell**2).sum(axis=(1, 2))
        )
        f_norm2 = seg_sum(f2_atom) + (cell_forces**2).sum(axis=(1, 2))
        downhill = power > 0.0

        if method == "MDMin":
            # project v fully onto F when downhill, zero when uphill
            proj = power / jnp.maximum(f_norm2, 1e-30)
            vel = jnp.where(
                downhill[owner][:, None], proj[owner][:, None] * forces, 0.0
            )
            vel_cell = jnp.where(
                downhill[:, None, None],
                proj[:, None, None] * cell_forces,
                0.0,
            )
            dt, alpha, n_pos = state.dt, state.alpha, state.n_pos
        else:
            mix = state.alpha * jnp.sqrt(
                v_norm2 / jnp.maximum(f_norm2, 1e-30)
            )
            vel_mixed = (1.0 - state.alpha[owner])[:, None] * state.vel + mix[
                owner
            ][:, None] * forces
            velc_mixed = (
                (1.0 - state.alpha)[:, None, None] * state.vel_cell
                + mix[:, None, None] * cell_forces
            )
            vel = jnp.where(downhill[owner][:, None], vel_mixed, 0.0)
            vel_cell = jnp.where(downhill[:, None, None], velc_mixed, 0.0)

            grow = downhill & (state.n_pos > fire.n_min)
            dt = jnp.where(
                grow,
                jnp.minimum(state.dt * fire.f_inc, fire.dtmax),
                jnp.where(downhill, state.dt, state.dt * fire.f_dec),
            )
            alpha = jnp.where(
                grow,
                state.alpha * fire.f_alpha,
                jnp.where(downhill, state.alpha, fire.alpha_start),
            )
            n_pos = jnp.where(downhill, state.n_pos + 1, 0)

        vel = vel + dt[owner][:, None] * forces
        vel_cell = vel_cell + dt[:, None, None] * cell_forces

        dr = dt[owner][:, None] * vel
        dr_cell = dt[:, None, None] * vel_cell
        dr_norm = jnp.sqrt(
            seg_sum((dr**2).sum(axis=1)) + (dr_cell**2).sum(axis=(1, 2))
        )
        scale = jnp.minimum(1.0, fire.maxstep / jnp.maximum(dr_norm, 1e-30))
        active = scale * jnp.where(converged, 0.0, 1.0)  # freeze converged
        dr = dr * active[owner][:, None] * atom_mask
        d_strain = dr_cell * (active / cell_factor)[:, None, None]

        # fold: lat' = lat @ (I + de), cart' = (cart + dr) @ (I + de)
        deform = jnp.eye(3, dtype=state.lat.dtype)[None] + d_strain
        lat_new = jnp.einsum("bij,bjk->bik", state.lat, deform)
        cart = jnp.einsum("ni,nij->nj", state.frac, state.lat[owner]) + dr
        cart = jnp.einsum("ni,nij->nj", cart, deform[owner])
        frac_new = jnp.einsum(
            "ni,nij->nj", cart, jnp.linalg.inv(lat_new)[owner]
        )

        new_state = FireState(
            frac=frac_new,
            lat=lat_new,
            vel=vel,
            vel_cell=vel_cell,
            dt=dt,
            alpha=alpha,
            n_pos=n_pos,
            converged=converged,
        )
        ys = {"energy": e_total, "fmax": fmax}
        if record:
            ys.update(
                forces=forces,
                stress=out["s"],
                magmom=out["m"],
                crystal_fea=out["crystal_fea"],
                frac=state.frac,
                lat=state.lat,
            )
        return new_state, ys

    return step


@functools.partial(
    jax.jit,
    static_argnames=(
        "config", "fire", "n_steps", "relax_cell", "record", "method",
    ),
)
def fire_chunk(
    params,
    batch: GraphBatch,
    state: FireState,
    *,
    config: CHGNetConfig,
    fire: FIRE,
    n_steps: int,
    fmax_target: float,
    cell_factor: jnp.ndarray,  # [B]
    relax_cell: bool,
    record: bool,
    method: str = "FIRE",
):
    """Run ``n_steps`` fixed-topology FIRE (or MDMin) steps under
    ``lax.scan``. Returns (state, per-step outputs). Each step evaluates
    E/F(/S), updates convergence, then moves the unconverged graphs.
    MDMin is the velocity-projection quench: v is projected onto F when
    downhill and zeroed when uphill (same semantics as ASE's MDMin).
    """
    n_graphs = batch.n_graphs
    owner = batch.atom_owner
    atom_mask = batch.atom_mask[:, None]

    def seg_sum(per_atom):  # [N] -> [B], padded atoms masked upstream
        return jax.ops.segment_sum(
            per_atom, owner, num_segments=n_graphs, indices_are_sorted=True
        )

    def seg_max(per_atom):  # [N] -> [B]
        return jax.ops.segment_max(
            per_atom, owner, num_segments=n_graphs, indices_are_sorted=True
        )

    def evaluate(frac, lat):
        cur = batch._replace(frac_coords=frac, lattices=lat)
        out = compute_batch_dynamic(
            params,
            cur,
            config=config,
            compute_stress=relax_cell or record,
            compute_magmom=record,
        )
        n_atoms = jnp.maximum(out["atoms_per_graph"], 1.0)
        e_total = out["e"] * (n_atoms if config.is_intensive else 1.0)
        forces = out["f"] * atom_mask
        if relax_cell or record:
            volume = jnp.abs(jnp.linalg.det(lat))
            virial = (
                out["s"] * GPA_TO_EV_A3 * volume[:, None, None]
            )  # dE/d(strain) [B,3,3] eV
            virial = 0.5 * (virial + jnp.swapaxes(virial, 1, 2))
        else:
            virial = jnp.zeros((n_graphs, 3, 3), forces.dtype)
        return e_total, forces, virial, out

    step = make_fire_step(
        fire=fire,
        owner=owner,
        atom_mask=atom_mask,
        fmax_target=fmax_target,
        cell_factor=cell_factor,
        relax_cell=relax_cell,
        record=record,
        method=method,
        evaluate=evaluate,
        seg_sum=seg_sum,
        seg_max=seg_max,
    )
    return jax.lax.scan(step, state, None, length=n_steps)



class LBFGS(NamedTuple):
    """LBFGS hyperparameters (ASE defaults: H0 = I/70, damping 1, maxstep
    0.2 A, memory capped for device-resident history buffers)."""

    memory: int = 10
    alpha: float = 70.0
    damping: float = 1.0
    maxstep: float = 0.2


class LbfgsState(NamedTuple):
    """Batched LBFGS state: circular history of (s, y) pairs per graph."""

    frac: jnp.ndarray  # [N, 3]
    lat: jnp.ndarray  # [B, 3, 3]
    s_hist: jnp.ndarray  # [M, N, 3]
    y_hist: jnp.ndarray  # [M, N, 3]
    s_cell: jnp.ndarray  # [M, B, 3, 3]
    y_cell: jnp.ndarray  # [M, B, 3, 3]
    rho: jnp.ndarray  # [M, B]
    prev_grad: jnp.ndarray  # [N, 3]
    prev_grad_cell: jnp.ndarray  # [B, 3, 3]
    prev_dr: jnp.ndarray  # [N, 3]
    prev_dr_cell: jnp.ndarray  # [B, 3, 3]
    n_hist: jnp.ndarray  # [B] i32 pairs stored so far
    converged: jnp.ndarray  # [B] bool


def _init_lbfgs_state(batch: GraphBatch, lbfgs: LBFGS) -> LbfgsState:
    n_graphs = batch.n_graphs
    n_pad = batch.frac_coords.shape[0]
    mem = lbfgs.memory
    zeros_a = jnp.zeros((mem, n_pad, 3), jnp.float32)
    zeros_c = jnp.zeros((mem, n_graphs, 3, 3), jnp.float32)
    return LbfgsState(
        frac=jnp.asarray(batch.frac_coords, jnp.float32),
        lat=jnp.asarray(batch.lattices, jnp.float32),
        s_hist=zeros_a,
        y_hist=zeros_a,
        s_cell=zeros_c,
        y_cell=zeros_c,
        rho=jnp.zeros((mem, n_graphs), jnp.float32),
        prev_grad=jnp.zeros((n_pad, 3), jnp.float32),
        prev_grad_cell=jnp.zeros((n_graphs, 3, 3), jnp.float32),
        prev_dr=jnp.zeros((n_pad, 3), jnp.float32),
        prev_dr_cell=jnp.zeros((n_graphs, 3, 3), jnp.float32),
        n_hist=jnp.zeros((n_graphs,), jnp.int32),
        converged=jnp.zeros((n_graphs,), bool),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "config", "lbfgs", "n_steps", "relax_cell", "record", "line_search"
    ),
)
def lbfgs_chunk(
    params,
    batch: GraphBatch,
    state: LbfgsState,
    *,
    config: CHGNetConfig,
    lbfgs: LBFGS,
    n_steps: int,
    fmax_target: float,
    cell_factor: jnp.ndarray,  # [B]
    relax_cell: bool,
    record: bool,
    line_search: bool = False,
):
    """Batched limited-memory BFGS over (positions, scaled strain) DOF;
    per-graph two-loop recursion with masked circular histories.

    ``line_search`` adds a per-graph Armijo backtracking search along the
    L-BFGS direction (the reference's ``LBFGSLineSearch`` /
    ``BFGSLineSearch`` variants, ``dynamics.py:46-55``): each step tries
    shrinking trial factors and keeps the largest that achieves sufficient
    decrease, at the cost of a few extra energy-only evaluations."""
    n_graphs = batch.n_graphs
    owner = batch.atom_owner
    atom_mask = batch.atom_mask[:, None]
    mem = lbfgs.memory

    def seg_sum(per_atom):
        return jax.ops.segment_sum(
            per_atom, owner, num_segments=n_graphs, indices_are_sorted=True
        )

    def seg_max(per_atom):
        return jax.ops.segment_max(
            per_atom, owner, num_segments=n_graphs, indices_are_sorted=True
        )

    def dot(a_atoms, a_cell, b_atoms, b_cell):
        """Per-graph inner product over combined DOF -> [B]."""
        return seg_sum((a_atoms * b_atoms).sum(axis=1)) + (
            (a_cell * b_cell).sum(axis=(1, 2))
        )

    def evaluate(state):
        cur = batch._replace(frac_coords=state.frac, lattices=state.lat)
        out = compute_batch_dynamic(
            params,
            cur,
            config=config,
            compute_stress=relax_cell or record,
            compute_magmom=record,
        )
        n_atoms = jnp.maximum(out["atoms_per_graph"], 1.0)
        e_total = out["e"] * (n_atoms if config.is_intensive else 1.0)
        forces = out["f"] * atom_mask
        if relax_cell or record:
            volume = jnp.abs(jnp.linalg.det(state.lat))
            virial = out["s"] * GPA_TO_EV_A3 * volume[:, None, None]
            virial = 0.5 * (virial + jnp.swapaxes(virial, 1, 2))
        else:
            virial = jnp.zeros((n_graphs, 3, 3), forces.dtype)
        return e_total, forces, virial, out

    def step(state: LbfgsState, _):
        e_total, forces, virial, out = evaluate(state)
        cell_forces = (
            -virial / cell_factor[:, None, None]
            if relax_cell
            else jnp.zeros_like(virial)
        )
        grad = -forces
        grad_cell = -cell_forces

        f2_atom = (forces**2).sum(axis=1)
        fmax2 = seg_max(jnp.where(atom_mask[:, 0] > 0, f2_atom, 0.0))
        if relax_cell:
            fmax2 = jnp.maximum(fmax2, (cell_forces**2).sum(axis=2).max(axis=1))
        fmax = jnp.sqrt(fmax2)
        converged = state.converged | (fmax < fmax_target)

        # push previous (s, y) pair into the circular history
        have_prev = state.n_hist > 0
        y_new = grad - state.prev_grad
        y_cell_new = grad_cell - state.prev_grad_cell
        sy = dot(state.prev_dr, state.prev_dr_cell, y_new, y_cell_new)
        slot = (state.n_hist - 1) % mem  # [B] per-graph slot
        # scatter per-graph rows into slot: build via one-hot over mem
        onehot = (
            jax.nn.one_hot(slot, mem, dtype=jnp.float32)
            * have_prev.astype(jnp.float32)[:, None]
        ).T  # [M, B]
        keep = 1.0 - onehot  # [M, B]
        oh_atoms = onehot[:, owner, None]  # [M, N, 1]
        keep_atoms = 1.0 - oh_atoms
        s_hist = state.s_hist * keep_atoms + state.prev_dr[None] * oh_atoms
        y_hist = state.y_hist * keep_atoms + y_new[None] * oh_atoms
        s_cell = (
            state.s_cell * keep[:, :, None, None]
            + state.prev_dr_cell[None] * onehot[:, :, None, None]
        )
        y_cell = (
            state.y_cell * keep[:, :, None, None]
            + y_cell_new[None] * onehot[:, :, None, None]
        )
        rho_new = jnp.where(jnp.abs(sy) > 1e-30, 1.0 / sy, 0.0)
        rho = state.rho * keep + rho_new[None, :] * onehot

        # two-loop recursion (static M loop; invalid slots masked by rho=0);
        # per-graph circular indexing via gathers over the M axis
        q = grad
        q_cell = grad_cell
        n_hist = state.n_hist

        def gather_hist(hist_atoms, idx):
            # hist_atoms [M, N, 3], idx [B] -> [N, 3] rows per atom's graph
            return jnp.take_along_axis(
                hist_atoms, idx[owner][None, :, None], axis=0
            )[0]

        def gather_cell(hist_cell, idx):
            return jnp.take_along_axis(
                hist_cell, idx[None, :, None, None], axis=0
            )[0]

        def gather_rho(rho_arr, idx):
            return jnp.take_along_axis(rho_arr, idx[None, :], axis=0)[0]

        alphas = []
        for i in range(mem):
            idx = (n_hist - 1 - i) % mem
            valid = ((i < n_hist) & ~converged).astype(jnp.float32)
            s_i = gather_hist(s_hist, idx)
            y_i = gather_hist(y_hist, idx)
            sc_i = gather_cell(s_cell, idx)
            yc_i = gather_cell(y_cell, idx)
            rho_i = gather_rho(rho, idx) * valid
            a_i = rho_i * dot(s_i, sc_i, q, q_cell)  # [B]
            q = q - a_i[owner][:, None] * y_i
            q_cell = q_cell - a_i[:, None, None] * yc_i
            alphas.append((a_i, idx))
        q = q / lbfgs.alpha
        q_cell = q_cell / lbfgs.alpha
        for a_i, idx in reversed(alphas):
            s_i = gather_hist(s_hist, idx)
            y_i = gather_hist(y_hist, idx)
            sc_i = gather_cell(s_cell, idx)
            yc_i = gather_cell(y_cell, idx)
            rho_i = gather_rho(rho, idx)
            b_i = rho_i * dot(y_i, yc_i, q, q_cell)
            q = q + (a_i - b_i)[owner][:, None] * s_i
            q_cell = q_cell + (a_i - b_i)[:, None, None] * sc_i

        dr = -q * lbfgs.damping * atom_mask
        dr_cell = -q_cell * lbfgs.damping
        # clip the longest per-atom displacement to maxstep (ASE LBFGS)
        step_len2 = (dr**2).sum(axis=1)
        longest2 = jax.ops.segment_max(
            jnp.where(batch.atom_mask > 0, step_len2, 0.0),
            owner,
            num_segments=n_graphs,
            indices_are_sorted=True,
        )
        longest2 = jnp.maximum(longest2, (dr_cell**2).sum(axis=(1, 2)))
        longest = jnp.sqrt(jnp.maximum(longest2, 1e-30))
        scale = jnp.minimum(1.0, lbfgs.maxstep / longest)
        active = scale * jnp.where(converged, 0.0, 1.0)
        dr = dr * active[owner][:, None]
        dr_cell_active = dr_cell * active[:, None, None]

        def apply_step(alpha_b):
            """Per-graph step fraction alpha_b [B] along (dr, dr_cell)."""
            d_strain = (
                dr_cell_active * (alpha_b / cell_factor)[:, None, None]
            )
            deform = jnp.eye(3, dtype=state.lat.dtype)[None] + d_strain
            lat_n = jnp.einsum("bij,bjk->bik", state.lat, deform)
            cart = jnp.einsum(
                "ni,nij->nj", state.frac, state.lat[owner]
            ) + dr * alpha_b[owner][:, None]
            cart = jnp.einsum("ni,nij->nj", cart, deform[owner])
            return (
                jnp.einsum("ni,nij->nj", cart, jnp.linalg.inv(lat_n)[owner]),
                lat_n,
            )

        if line_search:
            # Armijo backtracking: largest trial factor with sufficient
            # decrease E(a) <= E0 + c1 a g.d, per graph; fallback = smallest
            g_dot_d = dot(grad, grad_cell, dr, dr_cell_active)  # [B] (< 0)
            c1 = 1e-4
            alpha_sel = jnp.full((n_graphs,), 0.25, e_total.dtype)
            accepted = jnp.zeros((n_graphs,), bool)
            for trial in (1.0, 0.5, 0.25):
                frac_t, lat_t = apply_step(
                    jnp.full((n_graphs,), trial, e_total.dtype)
                )
                out_t = compute_batch_dynamic(
                    params,
                    batch._replace(frac_coords=frac_t, lattices=lat_t),
                    config=config,
                )
                n_at = jnp.maximum(out_t["atoms_per_graph"], 1.0)
                e_t = out_t["e"] * (n_at if config.is_intensive else 1.0)
                ok = (~accepted) & (
                    e_t <= e_total + c1 * trial * g_dot_d
                )
                alpha_sel = jnp.where(ok, trial, alpha_sel)
                accepted = accepted | ok
            frac_new, lat_new = apply_step(alpha_sel)
            dr = dr * alpha_sel[owner][:, None]
            dr_cell_active = dr_cell_active * alpha_sel[:, None, None]
        else:
            frac_new, lat_new = apply_step(
                jnp.ones((n_graphs,), e_total.dtype)
            )

        new_state = LbfgsState(
            frac=frac_new,
            lat=lat_new,
            s_hist=s_hist,
            y_hist=y_hist,
            s_cell=s_cell,
            y_cell=y_cell,
            rho=rho,
            prev_grad=grad,
            prev_grad_cell=grad_cell,
            prev_dr=dr,
            prev_dr_cell=dr_cell_active,
            n_hist=jnp.where(converged, state.n_hist, state.n_hist + 1),
            converged=converged,
        )
        ys = {"energy": e_total, "fmax": fmax}
        if record:
            ys.update(
                forces=forces,
                stress=out["s"],
                magmom=out["m"],
                crystal_fea=out["crystal_fea"],
                frac=state.frac,
                lat=state.lat,
            )
        return new_state, ys

    state, trajectory = jax.lax.scan(step, state, None, length=n_steps)
    return state, trajectory


class BFGS(NamedTuple):
    """Exact-Hessian BFGS hyperparameters (ASE ``BFGS`` conventions:
    H0 = alpha * I with alpha = 70 eV/A^2, maxstep 0.2 A)."""

    alpha: float = 70.0
    maxstep: float = 0.2


class BfgsState(NamedTuple):
    """Batched dense-Hessian BFGS state: one (3 * n_max + 9)-DOF Hessian
    per graph (positions + scaled strain, the unit-cell-filter DOF)."""

    frac: jnp.ndarray  # [N, 3]
    lat: jnp.ndarray  # [B, 3, 3]
    hessian: jnp.ndarray  # [B, D, D] with D = 3 * n_max + 9
    prev_grad: jnp.ndarray  # [B, D]
    prev_dr: jnp.ndarray  # [B, D]
    have_prev: jnp.ndarray  # [B] bool
    converged: jnp.ndarray  # [B] bool


def _graph_slots(batch: GraphBatch) -> tuple[np.ndarray, int]:
    """Host map flat atoms -> per-graph slots: ``pg_idx[b, k]`` is the
    flat index of graph ``b``'s ``k``-th atom (padding repeats the last
    valid flat row; its force is zero so it never moves the DOF)."""
    owner = np.asarray(batch.atom_owner)
    mask = np.asarray(batch.atom_mask) > 0
    n_graphs = batch.n_graphs
    counts = np.bincount(owner[mask], minlength=n_graphs)
    if counts.size and int(counts.min()) == 0:
        # a zero-atom graph would get pg_idx rows of flat index 0 (a real
        # atom of graph 0) with valid slots, cross-contaminating graph 0
        # through to_graph/from_graph
        raise ValueError("every graph in a BFGS batch needs >= 1 atom")
    n_max = max(int(counts.max()) if counts.size else 1, 1)
    pg_idx = np.zeros((n_graphs, n_max), np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)])[:-1]
    for b in range(n_graphs):
        rows = offsets[b] + np.arange(counts[b])
        pg_idx[b, : counts[b]] = rows
        pg_idx[b, counts[b]:] = rows[-1] if counts[b] else 0
    return pg_idx.astype(np.int32), n_max


def _init_bfgs_state(
    batch: GraphBatch, bfgs: BFGS, n_max: int
) -> BfgsState:
    n_graphs = batch.n_graphs
    dof = 3 * n_max + 9
    eye = jnp.eye(dof, dtype=jnp.float32) * bfgs.alpha
    return BfgsState(
        frac=jnp.asarray(batch.frac_coords, jnp.float32),
        lat=jnp.asarray(batch.lattices, jnp.float32),
        hessian=jnp.broadcast_to(eye, (n_graphs, dof, dof)),
        prev_grad=jnp.zeros((n_graphs, dof), jnp.float32),
        prev_dr=jnp.zeros((n_graphs, dof), jnp.float32),
        have_prev=jnp.zeros((n_graphs,), bool),
        converged=jnp.zeros((n_graphs,), bool),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "config", "bfgs", "n_steps", "n_max", "relax_cell", "record",
        "line_search",
    ),
)
def bfgs_chunk(
    params,
    batch: GraphBatch,
    state: BfgsState,
    pg_idx: jnp.ndarray,  # [B, n_max] flat atom index per graph slot
    *,
    config: CHGNetConfig,
    bfgs: BFGS,
    n_steps: int,
    n_max: int,
    fmax_target: float,
    cell_factor: jnp.ndarray,  # [B]
    relax_cell: bool,
    record: bool,
    line_search: bool = False,
):
    """Batched EXACT-Hessian BFGS (ASE ``BFGS`` semantics,
    ``/root/reference/chgnet/model/dynamics.py:46-55`` offers it via ASE):
    per graph, a dense (3 n + 9)-DOF Hessian updated with the two
    rank-one BFGS terms, stepped through its eigendecomposition
    ``dr = V (V^T f / |omega|)`` — curvature is handled by the absolute
    eigenvalues exactly as ASE does, so saddle directions are walked
    downhill. The (3N)^2 memory/eigh cost is what makes this small-system
    only; LBFGS covers large systems. ``line_search`` adds the same
    per-graph Armijo backtracking the L-BFGS variant uses, on the
    BFGS direction (ASE's BFGSLineSearch analog)."""
    n_graphs = batch.n_graphs
    owner = batch.atom_owner
    atom_mask = batch.atom_mask[:, None]
    dof = 3 * n_max + 9
    slot_valid = (
        jnp.asarray(batch.atom_mask)[pg_idx] > 0
    )  # [B, n_max] (padding repeats a valid row; mask via position)
    # padded slots repeat the last valid flat row — keep only the FIRST
    # occurrence so to-graph scatters are well-defined
    first = jnp.concatenate(
        [
            jnp.ones((n_graphs, 1), bool),
            pg_idx[:, 1:] != pg_idx[:, :-1],
        ],
        axis=1,
    )
    slot_ok = (slot_valid & first).astype(jnp.float32)[..., None]  # [B,K,1]

    def to_graph(x_atoms, x_cell):
        """Flat per-atom [N, 3] + per-graph cell [B, 3, 3] -> [B, D]."""
        per = x_atoms[pg_idx] * slot_ok  # [B, n_max, 3]
        return jnp.concatenate(
            [per.reshape(n_graphs, 3 * n_max), x_cell.reshape(n_graphs, 9)],
            axis=1,
        )

    def from_graph(v):
        """[B, D] -> flat per-atom [N, 3] + per-graph cell [B, 3, 3]."""
        per = v[:, : 3 * n_max].reshape(n_graphs, n_max, 3)
        flat = jnp.zeros(
            (batch.frac_coords.shape[0], 3), v.dtype
        ).at[pg_idx.reshape(-1)].add(
            (per * slot_ok).reshape(-1, 3)
        )
        return flat, v[:, 3 * n_max:].reshape(n_graphs, 3, 3)

    def seg_max(per_atom):
        return jax.ops.segment_max(
            per_atom, owner, num_segments=n_graphs, indices_are_sorted=True
        )

    def evaluate(frac, lat):
        cur = batch._replace(frac_coords=frac, lattices=lat)
        out = compute_batch_dynamic(
            params,
            cur,
            config=config,
            compute_stress=relax_cell or record,
            compute_magmom=record,
        )
        n_atoms = jnp.maximum(out["atoms_per_graph"], 1.0)
        e_total = out["e"] * (n_atoms if config.is_intensive else 1.0)
        forces = out["f"] * atom_mask
        if relax_cell or record:
            volume = jnp.abs(jnp.linalg.det(lat))
            virial = out["s"] * GPA_TO_EV_A3 * volume[:, None, None]
            virial = 0.5 * (virial + jnp.swapaxes(virial, 1, 2))
        else:
            virial = jnp.zeros((n_graphs, 3, 3), forces.dtype)
        return e_total, forces, virial, out

    def step(state: BfgsState, _):
        e_total, forces, virial, out = evaluate(state.frac, state.lat)
        cell_forces = (
            -virial / cell_factor[:, None, None]
            if relax_cell
            else jnp.zeros((n_graphs, 3, 3), forces.dtype)
        )
        f_vec = to_graph(forces, cell_forces)  # [B, D] forces (= -grad)
        grad = -f_vec

        f2_atom = (forces**2).sum(axis=1)
        fmax2 = seg_max(jnp.where(atom_mask[:, 0] > 0, f2_atom, 0.0))
        if relax_cell:
            fmax2 = jnp.maximum(
                fmax2, (cell_forces**2).sum(axis=2).max(axis=1)
            )
        fmax = jnp.sqrt(fmax2)
        converged = state.converged | (fmax < fmax_target)

        # ASE BFGS.update: H -= df df^T / (s . df) + dg dg^T / (s . dg)
        # with s the previous step, df the force difference, dg = H s;
        # skipped when the previous step was (numerically) zero.
        s = state.prev_dr  # [B, D]
        df = f_vec - (-state.prev_grad)  # force difference
        a = jnp.einsum("bd,bd->b", s, df)
        dg = jnp.einsum("bij,bj->bi", state.hessian, s)
        b = jnp.einsum("bd,bd->b", s, dg)
        upd_ok = (
            state.have_prev
            & (jnp.abs(s).max(axis=1) > 1e-7)
            & (jnp.abs(a) > 1e-30)
            & (jnp.abs(b) > 1e-30)
        )
        # masked-out graphs still evaluate the division: keep denominators
        # away from zero or 0 * inf poisons the whole Hessian with NaN
        a_safe = jnp.where(upd_ok, a, 1.0)[:, None, None]
        b_safe = jnp.where(upd_ok, b, 1.0)[:, None, None]
        hessian = state.hessian - upd_ok.astype(jnp.float32)[
            :, None, None
        ] * (
            jnp.einsum("bi,bj->bij", df, df) / a_safe
            + jnp.einsum("bi,bj->bij", dg, dg) / b_safe
        )

        # step through the eigendecomposition, |omega| regularized
        omega, vecs = jnp.linalg.eigh(hessian)
        f_modes = jnp.einsum("bdk,bd->bk", vecs, f_vec)
        dr = jnp.einsum(
            "bdk,bk->bd", vecs, f_modes / jnp.abs(omega)
        )  # [B, D]

        # per-graph scale so the longest per-atom (or cell) step length
        # stays under maxstep (ASE determine_step)
        dr_atoms, dr_cell = from_graph(dr)
        step_len2 = (dr_atoms**2).sum(axis=1)
        longest2 = seg_max(
            jnp.where(batch.atom_mask > 0, step_len2, 0.0)
        )
        longest2 = jnp.maximum(longest2, (dr_cell**2).sum(axis=(1, 2)))
        longest = jnp.sqrt(jnp.maximum(longest2, 1e-30))
        scale = jnp.minimum(1.0, bfgs.maxstep / longest)
        active = scale * jnp.where(converged, 0.0, 1.0)
        dr = dr * active[:, None]
        dr_atoms = dr_atoms * active[owner][:, None] * atom_mask
        dr_cell = dr_cell * active[:, None, None]

        def apply_step(alpha_b):
            d_strain = dr_cell * (alpha_b / cell_factor)[:, None, None]
            deform = jnp.eye(3, dtype=state.lat.dtype)[None] + d_strain
            lat_n = jnp.einsum("bij,bjk->bik", state.lat, deform)
            cart = jnp.einsum(
                "ni,nij->nj", state.frac, state.lat[owner]
            ) + dr_atoms * alpha_b[owner][:, None]
            cart = jnp.einsum("ni,nij->nj", cart, deform[owner])
            return (
                jnp.einsum(
                    "ni,nij->nj", cart, jnp.linalg.inv(lat_n)[owner]
                ),
                lat_n,
            )

        if line_search:
            g_dot_d = jnp.einsum("bd,bd->b", grad, dr)
            c1 = 1e-4
            alpha_sel = jnp.full((n_graphs,), 0.25, e_total.dtype)
            accepted = jnp.zeros((n_graphs,), bool)
            for trial in (1.0, 0.5, 0.25):
                frac_t, lat_t = apply_step(
                    jnp.full((n_graphs,), trial, e_total.dtype)
                )
                out_t = compute_batch_dynamic(
                    params,
                    batch._replace(frac_coords=frac_t, lattices=lat_t),
                    config=config,
                )
                n_at = jnp.maximum(out_t["atoms_per_graph"], 1.0)
                e_t = out_t["e"] * (n_at if config.is_intensive else 1.0)
                ok = (~accepted) & (e_t <= e_total + c1 * trial * g_dot_d)
                alpha_sel = jnp.where(ok, trial, alpha_sel)
                accepted = accepted | ok
            frac_new, lat_new = apply_step(alpha_sel)
            dr = dr * alpha_sel[:, None]
        else:
            frac_new, lat_new = apply_step(
                jnp.ones((n_graphs,), e_total.dtype)
            )

        new_state = BfgsState(
            frac=frac_new,
            lat=lat_new,
            hessian=hessian,
            prev_grad=grad,
            prev_dr=dr,
            have_prev=jnp.ones((n_graphs,), bool),
            converged=converged,
        )
        ys = {"energy": e_total, "fmax": fmax}
        if record:
            ys.update(
                forces=forces,
                stress=out["s"],
                magmom=out["m"],
                crystal_fea=out["crystal_fea"],
                frac=state.frac,
                lat=state.lat,
            )
        return new_state, ys

    state, trajectory = jax.lax.scan(step, state, None, length=n_steps)
    return state, trajectory


class StructOptimizer:
    """Structure relaxation via batched on-device FIRE.

    API mirrors the reference (``dynamics.py:184-346``): ``relax()``
    returns ``{"final_structure", "trajectory"}`` — or a list of such
    dicts when given several structures, all relaxed in ONE padded batch.
    """

    def __init__(
        self,
        model=None,
        *,
        optimizer_class: str = "FIRE",
        use_device: str | None = None,
        stress_weight: float = GPA_TO_EV_A3,
        on_isolated_atoms: str = "warn",
        fire_params: FIRE | None = None,
        lbfgs_params: LBFGS | None = None,
        bfgs_params: BFGS | None = None,
        mesh: int | None = None,
        halo: bool = False,
    ) -> None:
        optimizer_class = optimizer_class or "FIRE"
        supported = {
            "FIRE", "LBFGS", "LBFGSLineSearch", "MDMin",
            "BFGS", "BFGSLineSearch",
            "SciPyFminCG", "SciPyFminBFGS",
        }
        if optimizer_class not in supported:
            raise NotImplementedError(
                f"{optimizer_class=}: the TPU-native relaxer implements "
                f"{sorted(supported)}"
            )
        self.optimizer_class = optimizer_class
        if model is None:
            from chgnet_tpu.models.chgnet import CHGNet

            model = CHGNet.load(verbose=False)
        if hasattr(model, "model"):  # a CHGNetCalculator
            model = model.model
        self.model = model
        self.fire = fire_params or FIRE()
        self.lbfgs = lbfgs_params or LBFGS()
        self.bfgs = bfgs_params or BFGS()
        self.on_isolated_atoms = on_isolated_atoms
        # graph-partitioned relaxation over a device mesh (FIRE/MDMin —
        # the LBFGS history buffers and the SciPy host loop are
        # single-device only)
        self._mesh = None
        if mesh is not None:
            if optimizer_class not in {"FIRE", "MDMin"}:
                raise NotImplementedError(
                    f"mesh relaxation supports FIRE/MDMin, not "
                    f"{optimizer_class}"
                )
            from chgnet_tpu.parallel.mesh import make_mesh

            self._mesh = make_mesh(int(mesh), axis_name="graph")
        self._halo = bool(halo)

    @property
    def version(self) -> str | None:
        return self.model.version

    @property
    def n_params(self) -> int:
        return self.model.n_params

    def relax(
        self,
        atoms: Structure | list[Structure],
        *,
        fmax: float = 0.1,
        steps: int = 500,
        relax_cell: bool = True,
        save_path: str | None = None,
        loginterval: int | None = 1,
        crystal_feas_save_path: str | None = None,
        ase_filter: str | None = "FrechetCellFilter",
        verbose: bool = False,
        assign_magmoms: bool = True,
        chunk_size: int = 20,
        skin: float = 0.3,
        **kwargs,
    ):
        """Relax structure(s) to a local total-energy minimum.

        Args mirror the reference ``relax`` (``dynamics.py:243-306``);
        ``chunk_size`` sets how many jitted steps run between host-side
        convergence checks and topology rebuilds.
        """
        single = isinstance(atoms, Structure)
        structures = [atoms] if single else list(atoms)
        if self.optimizer_class.startswith("SciPyFmin"):
            results = self._relax_scipy(
                structures,
                fmax=fmax,
                steps=steps,
                relax_cell=relax_cell,
                save_path=save_path,
                assign_magmoms=assign_magmoms,
                skin=skin,
                verbose=verbose,
            )
            return results[0] if single else results
        runtime = GraphRuntime(
            self.model.config,
            structures,
            skin=skin,
            on_isolated_atoms=self.on_isolated_atoms,
            shard_mesh=self._mesh,
            halo=self._halo,
        )
        cell_factor = jnp.asarray(
            [max(len(s), 1) for s in structures], jnp.float32
        )
        if ase_filter not in {"FrechetCellFilter", "ExpCellFilter", None}:
            raise NotImplementedError(
                f"{ase_filter=}: the TPU-native relaxer implements a "
                "unit-cell-filter strain parameterization"
            )
        record = loginterval is not None or crystal_feas_save_path is not None
        use_lbfgs = self.optimizer_class in {"LBFGS", "LBFGSLineSearch"}
        use_bfgs = self.optimizer_class in {"BFGS", "BFGSLineSearch"}
        # mesh mode: per-atom state in the sharded global block layout
        n_state = None
        if self._mesh is not None:
            n_state = (
                runtime.sbatch.frac_coords.shape[0]
                * runtime.sbatch.frac_coords.shape[1]
            )
        if use_bfgs:
            pg_idx, n_max = _graph_slots(runtime.batch)
            state = _init_bfgs_state(runtime.batch, self.bfgs, n_max)
        elif use_lbfgs:
            state = _init_lbfgs_state(runtime.batch, self.lbfgs)
        else:
            state = _init_state(runtime.batch, self.fire, n_state)
        observers = [
            TrajectoryObserver(atomic_numbers=s.atomic_numbers)
            for s in structures
        ]
        from chgnet_tpu.simulation.observers import CrystalFeasObserver

        feas_observer = (
            CrystalFeasObserver() if crystal_feas_save_path else None
        )

        total = 0
        last_energy = np.zeros(len(structures))
        while total < steps:
            n_steps = min(chunk_size, steps - total)
            if use_bfgs:
                state, traj = bfgs_chunk(
                    self.model.params,
                    runtime.batch,
                    state,
                    jnp.asarray(pg_idx),
                    config=self.model.config,
                    bfgs=self.bfgs,
                    n_steps=n_steps,
                    n_max=n_max,
                    fmax_target=fmax,
                    cell_factor=cell_factor,
                    relax_cell=relax_cell,
                    record=record,
                    line_search=self.optimizer_class == "BFGSLineSearch",
                )
            elif use_lbfgs:
                state, traj = lbfgs_chunk(
                    self.model.params,
                    runtime.batch,
                    state,
                    config=self.model.config,
                    lbfgs=self.lbfgs,
                    n_steps=n_steps,
                    fmax_target=fmax,
                    cell_factor=cell_factor,
                    relax_cell=relax_cell,
                    record=record,
                    line_search=self.optimizer_class == "LBFGSLineSearch",
                )
            elif self._mesh is not None:
                from chgnet_tpu.parallel.relax_sharded import (
                    fire_chunk_sharded,
                )

                state, traj = fire_chunk_sharded(
                    self.model.params,
                    runtime.sbatch,
                    state,
                    runtime.hbatch,
                    config=self.model.config,
                    mesh=self._mesh,
                    fire=self.fire,
                    n_steps=n_steps,
                    fmax_target=fmax,
                    cell_factor=cell_factor,
                    relax_cell=relax_cell,
                    record=record,
                    method=self.optimizer_class,
                )
            else:
                state, traj = fire_chunk(
                    self.model.params,
                    runtime.batch,
                    state,
                    config=self.model.config,
                    fire=self.fire,
                    n_steps=n_steps,
                    fmax_target=fmax,
                    cell_factor=cell_factor,
                    relax_cell=relax_cell,
                    record=record,
                    method=self.optimizer_class,
                )
            traj = jax.tree.map(np.asarray, traj)
            last_energy = traj["energy"][-1]
            if record:
                self._record(observers, runtime, traj, total, loginterval)
                if feas_observer is not None:
                    for step in range(len(traj["crystal_fea"])):
                        feas_observer.record(traj["crystal_fea"][step])
            total += n_steps
            if verbose:
                print(
                    f"{self.optimizer_class} step {total}: E = "
                    f"{np.array2string(traj['energy'][-1], precision=4)} eV, "
                    f"fmax = {np.array2string(traj['fmax'][-1], precision=4)}"
                )
            if bool(np.all(np.asarray(state.converged))):
                break
            # async rebuild: launch in the background at 40% skin drift,
            # keep stepping on the still-valid topology, block only when
            # the Verlet budget is exhausted (GraphRuntime.step_rebuild).
            # Mesh mode's state carries a zero tail past the padded order.
            runtime.step_rebuild(
                np.asarray(state.frac[: runtime.batch.n_atoms_padded]),
                np.asarray(state.lat),
            )

        final_structures = runtime.structures(
            np.asarray(state.frac), np.asarray(state.lat)
        )
        if assign_magmoms or save_path:
            final = self.model.predict_structure(
                final_structures, task="efsm"
            )
            if isinstance(final, dict):  # predict returns a dict for one graph
                final = [final]
            for idx, struct in enumerate(final_structures):
                if assign_magmoms:
                    struct.site_properties["magmom"] = list(
                        np.asarray(final[idx]["m"], dtype=float)
                    )

        if feas_observer is not None:
            feas_observer.save(crystal_feas_save_path)

        results = []
        for idx, struct in enumerate(final_structures):
            if save_path is not None:
                suffix = "" if single else f".{idx}"
                observers[idx].save(f"{save_path}{suffix}")
            results.append(
                {
                    "final_structure": struct,
                    "trajectory": observers[idx],
                    "final_energy": float(last_energy[idx]),
                }
            )
        return results[0] if single else results

    def _relax_scipy(
        self,
        structures: list[Structure],
        *,
        fmax: float,
        steps: int,
        relax_cell: bool,
        save_path: str | None,
        assign_magmoms: bool,
        skin: float,
        verbose: bool,
    ) -> list[dict]:
        """SciPyFminCG / SciPyFminBFGS: host-driven ``scipy.optimize``
        over flattened (cartesian, scaled-strain) DOF, one structure at a
        time — the reference wraps ASE's SciPy optimizers the same way
        (``dynamics.py:46-55``)."""
        from scipy.optimize import minimize

        method = "CG" if self.optimizer_class.endswith("CG") else "BFGS"
        results = []
        for s_idx, struct in enumerate(structures):
            runtime = GraphRuntime(
                self.model.config,
                [struct],
                skin=skin,
                on_isolated_atoms=self.on_isolated_atoms,
            )
            n = len(struct)
            cell_factor = float(max(n, 1))
            lat0 = np.asarray(runtime.batch.lattices[0], np.float64)
            observer = TrajectoryObserver(
                atomic_numbers=struct.atomic_numbers
            )

            def unpack(x):
                cart = x[: 3 * n].reshape(n, 3)
                strain = (
                    x[3 * n:].reshape(3, 3) / cell_factor
                    if relax_cell
                    else np.zeros((3, 3))
                )
                lat = lat0 @ (np.eye(3) + strain)
                return cart @ np.linalg.inv(lat), lat

            def fun(x):
                frac, lat = unpack(x)
                cap = runtime.batch.frac_coords.shape[0]
                frac_pad = np.zeros((cap, 3), np.float32)
                frac_pad[:n] = frac
                # Verlet criterion against the skin-built topology: scipy
                # drives arbitrarily large moves per iteration, so the
                # graph can go stale mid-minimize (dynamic cutoff masks
                # only remove edges, never add them)
                if runtime.needs_rebuild(frac_pad, lat[None]):
                    runtime.rebuild(frac_pad, lat[None])
                batch = runtime.batch
                out = compute_batch_dynamic(
                    self.model.params,
                    batch._replace(
                        frac_coords=jnp.asarray(frac_pad),
                        lattices=jnp.asarray(lat[None], jnp.float32),
                    ),
                    config=self.model.config,
                    compute_stress=True,
                    compute_magmom=False,
                )
                e = float(out["e"][0]) * (
                    n if self.model.config.is_intensive else 1.0
                )
                forces = np.asarray(out["f"])[:n]
                grad = [-forces.ravel().astype(np.float64)]
                if relax_cell:
                    volume = abs(np.linalg.det(lat))
                    virial = (
                        np.asarray(out["s"][0]) * GPA_TO_EV_A3 * volume
                    )
                    grad.append(
                        (virial / cell_factor).ravel().astype(np.float64)
                    )
                observer.record(
                    energy=e,
                    forces=forces,
                    stress=voigt_6(np.asarray(out["s"][0])) * GPA_TO_EV_A3,
                    magmoms=None,
                    positions=frac @ lat,
                    cell=lat,
                )
                return e, np.concatenate(grad)

            x0 = [
                (
                    np.asarray(runtime.batch.frac_coords[:n], np.float64)
                    @ lat0
                ).ravel()
            ]
            if relax_cell:
                x0.append(np.zeros(9))
            res = minimize(
                fun,
                np.concatenate(x0),
                jac=True,
                method=method,
                options={"maxiter": steps, "gtol": fmax},
            )
            frac, lat = unpack(res.x)
            final = Structure(
                lattice=lat,
                species=[int(z) for z in struct.atomic_numbers],
                frac_coords=np.mod(frac, 1.0),
            )
            if assign_magmoms:
                pred = self.model.predict_structure(final, task="em")
                final.site_properties["magmom"] = list(
                    np.asarray(pred["m"], dtype=float)
                )
            if verbose:
                print(
                    f"SciPyFmin{method} [{s_idx}]: E = {res.fun:.4f} eV "
                    f"({res.nit} iterations, success={res.success})"
                )
            if save_path is not None:
                suffix = "" if len(structures) == 1 else f".{s_idx}"
                observer.save(f"{save_path}{suffix}")
            results.append(
                {
                    "final_structure": final,
                    "trajectory": observer,
                    "final_energy": float(res.fun),
                }
            )
        return results

    @staticmethod
    def _record(observers, runtime, traj, step_offset, loginterval):
        n_steps = len(traj["energy"])
        for step in range(n_steps):
            if (step_offset + step) % (loginterval or 1):
                continue
            for gi, obs in enumerate(observers):
                lat = traj["lat"][step][gi]
                frac = runtime.unpad(traj["frac"][step], gi)
                obs.record(
                    energy=traj["energy"][step][gi],
                    forces=runtime.unpad(traj["forces"][step], gi),
                    stress=voigt_6(traj["stress"][step][gi]) * GPA_TO_EV_A3,
                    magmoms=runtime.unpad(traj["magmom"][step], gi),
                    positions=frac @ lat,
                    cell=lat,
                )
