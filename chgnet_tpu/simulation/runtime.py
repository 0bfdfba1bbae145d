"""Skin-radius graph topology reuse for on-device simulation loops.

The reference rebuilds the crystal graph on the host every MD/relaxation
step (``/root/reference/chgnet/model/dynamics.py:156-158``). Here the
topology is built once with cutoffs enlarged by a ``skin`` radius and
reused across steps; exact-cutoff semantics are restored inside the jitted
forward by :func:`apply_dynamic_cutoff`, which recomputes edge/angle
validity masks from the *current* positions. The host only rebuilds when
accumulated atomic drift or lattice strain could let a neighbor cross the
skin shell (the classic Verlet-list criterion).

Atom capacity is pinned so per-atom state arrays (velocities, etc.) stay
valid across rebuilds; edge/angle capacities grow monotonically on a
bucket grid to bound recompiles.
"""

from __future__ import annotations

import functools
import time
from collections.abc import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from chgnet_tpu.core.lattice import Lattice
from chgnet_tpu.core.structure import Structure
from chgnet_tpu.graph.batching import GraphBatch, batch_graphs, round_up
from chgnet_tpu.graph.converter import CrystalGraphConverter
from chgnet_tpu.models.chgnet import CHGNetConfig, compute_batch

_TOL = 1e-8  # matches neighbor-search numerical_tol


def apply_dynamic_cutoff(
    batch: GraphBatch, config: CHGNetConfig
) -> GraphBatch:
    """Recompute edge/angle masks from current positions at model cutoffs.

    Mirrors the builder's comparisons (``chgnet_tpu/graph/builder.py``):
    atom-graph edges keep ``d <= atom_graph_cutoff``; a line-graph row stays
    valid while its undirected bond i satisfies ``d_i <= bond_graph_cutoff``
    and its directed bond j satisfies ``d_j < bond_graph_cutoff``.
    """
    lat = batch.lattices
    cart = jnp.einsum("ni,nij->nj", batch.frac_coords, lat[batch.atom_owner])
    vec = (
        cart[batch.atom_graph[:, 0]]
        - cart[batch.atom_graph[:, 1]]
        - jnp.einsum("ei,eij->ej", batch.images, lat[batch.edge_owner])
    )
    dist = jnp.linalg.norm(vec, axis=1)  # [E] directed distances
    und_dist = dist[batch.undirected2directed]  # [U]

    in_atom_graph = und_dist <= config.atom_graph_cutoff + _TOL
    edge_mask = batch.edge_mask * in_atom_graph[
        batch.directed2undirected
    ].astype(batch.edge_mask.dtype)
    und_mask = batch.und_mask * in_atom_graph.astype(batch.und_mask.dtype)

    left_ok = und_dist[batch.bond_graph[:, 1]] <= config.bond_graph_cutoff + _TOL
    right_ok = dist[batch.bond_graph[:, 4]] < config.bond_graph_cutoff - _TOL
    angle_mask = batch.angle_mask * (left_ok & right_ok).astype(
        batch.angle_mask.dtype
    )
    return batch._replace(
        edge_mask=edge_mask, und_mask=und_mask, angle_mask=angle_mask
    )


@functools.partial(
    jax.jit,
    static_argnames=("config", "compute_stress", "compute_magmom"),
)
def compute_batch_dynamic(
    params,
    batch: GraphBatch,
    *,
    config: CHGNetConfig,
    compute_stress: bool = True,
    compute_magmom: bool = True,
):
    """Forward pass with forces over a skin-built batch: dynamic-cutoff
    masks first, then the standard padded forward (energies per atom in eV,
    forces eV/A, stress GPa, magmom mu_B)."""
    batch = apply_dynamic_cutoff(batch, config)
    return compute_batch(
        params,
        batch,
        config=config,
        compute_force=True,
        compute_stress=compute_stress,
        compute_magmom=compute_magmom,
    )


class GraphRuntime:
    """Builds and maintains a padded :class:`GraphBatch` for structures
    whose positions/lattices evolve on device.

    Usage::

        rt = GraphRuntime(config, structures, skin=0.3)
        batch = rt.batch                       # initial padded batch
        ...update batch.frac_coords / batch.lattices on device...
        if rt.needs_rebuild(frac, lattices):
            batch = rt.rebuild(frac, lattices)
    """

    def __init__(
        self,
        config: CHGNetConfig,
        structures: Sequence[Structure],
        *,
        skin: float = 0.3,
        on_isolated_atoms: str = "warn",
        shard_mesh=None,  # jax.sharding.Mesh: maintain a ShardedGraphBatch
        halo: bool = False,  # with shard_mesh: also maintain a HaloBatch
        # (boundary all_to_all row exchange — 47% of all-gather wire bytes
        # at D=8, improving with D)
        lean: bool | None = None,  # lean topology shipping (None = on-TPU)
        tile: bool | int = False,  # halo-tiled neighbor layout
        # (batch_graphs(tile=...); structures should be spatially
        # sorted. Env override: CHGNET_TPU_MD_TILE=<T>. Lean shipping
        # carries the tiled fields.)
    ) -> None:
        if getattr(config, "dense_atom_conv", False):
            raise NotImplementedError(
                "dense_atom_conv is a batching mode for inference/training "
                "batches; simulation loops use the CSR layout (dynamic "
                "cutoff masks are not defined for dense slots yet)"
            )
        self.config = config
        self.skin = float(skin)
        self.converter = CrystalGraphConverter(
            atom_graph_cutoff=config.atom_graph_cutoff + self.skin,
            bond_graph_cutoff=config.bond_graph_cutoff + self.skin,
            on_isolated_atoms=on_isolated_atoms,  # type: ignore[arg-type]
        )
        self.n_structs = len(structures)
        self.sizes = [len(s) for s in structures]
        self.offsets = np.concatenate([[0], np.cumsum(self.sizes)])
        self.atomic_numbers = [s.atomic_numbers.copy() for s in structures]
        self.site_properties = [dict(s.site_properties) for s in structures]
        # pinned atom capacity; edge/angle capacities grow monotonically.
        # Large systems align onto the streaming-kernel chunk grid so
        # atom-table window-gathers stay kernel-eligible (batching.py
        # honors explicit capacities verbatim).
        from chgnet_tpu.ops.stream_ops import C as _STREAM_CHUNK

        self.cap_n = round_up(int(self.offsets[-1]))
        if self.cap_n >= _STREAM_CHUNK:
            self.cap_n = -(-self.cap_n // _STREAM_CHUNK) * _STREAM_CHUNK
        self._cap_e = 0
        self._cap_a = 0
        self._cap_nx = 0  # tiled expanded-table capacity (monotone)
        # multi-chip mode: every build also re-lays the batch out over the
        # mesh (parallel.graph_sharded.shard_batch) in the same worker, so
        # the async-rebuild machinery hides shard prep too. Per-device
        # capacities grow monotonically (min_caps) to bound recompiles.
        self.shard_mesh = shard_mesh
        self.shard_halo = bool(halo) and shard_mesh is not None
        self.hbatch = None
        self._halo_caps: tuple[int, int] | None = None
        # lean shipping: transfer the primary index streams only and
        # derive the rest of the batch on device (graph/leanship.py) —
        # ~5x fewer host->device bytes per rebuild at MD scales. Default
        # on for real TPU backends (where the transfer dominates the
        # rebuild); CHGNET_TPU_NO_LEAN_SHIP set to ANY non-empty value
        # disables it (read at construction time).
        import os

        from chgnet_tpu.ops.stream_ops import tpu_backend

        env_tile = os.environ.get("CHGNET_TPU_MD_TILE", "")
        if env_tile:
            tile = int(env_tile)
        self.tile = tile if tile else False
        # Round-5 measured: the halo-tiled layout wins the isolated E+F
        # step A/B (+72% at 10,240 atoms) but LOSES the end-to-end MD
        # loop 2.6x (0.294 vs 0.78 steps/s — per-rebuild ship time blows
        # up 28 -> 139 s per 60 steps and the pipeline can no longer
        # hide it), so it stays OPT-IN here (tile=/CHGNET_TPU_MD_TILE).
        # The expansion probe still guards the first build: tiling only
        # wins spatially local atom orders, so a halo expansion beyond
        # 12x (sorted 10k atoms measures 8.3x) falls back untiled with
        # a warning rather than shipping a pathological layout.
        self._tile_probe = bool(self.tile)
        if os.environ.get("CHGNET_TPU_NO_LEAN_SHIP"):
            lean = False
        self.lean = bool(lean) if lean is not None else False
        self._lean_auto = lean is None and shard_mesh is None and tpu_backend()
        self.sbatch = None
        self._shard_caps: tuple[int, int, int] | None = None
        self.n_rebuilds = -1  # first build is not a "rebuild"
        # phase timings (seconds, cumulative) for throughput triage:
        # graphs_s = host C++ graph builds, batch_s = padding + plans,
        # put_s = host->device topology transfer, stall_s = simulation
        # loop blocked waiting on a rebuild, sync_rebuilds = times the
        # Verlet budget ran out with no finished background build.
        self.stats = {
            "graphs_s": 0.0, "batch_s": 0.0, "put_s": 0.0,
            "stall_s": 0.0, "sync_rebuilds": 0,
        }
        self._pipeline: list = []  # in-flight ship futures, launch order
        self._launch_ref = None  # (frac, lat) of the newest launch
        self._graph_exec = None
        self._host_exec = None
        self._ship_exec = None
        self.batch = self._build(
            [s.frac_coords for s in structures],
            np.stack([s.lattice.matrix for s in structures]),
        )

    # ----------------------------------------------------------------- build
    def _graph_stage(self, frac_list: list[np.ndarray], lattices):
        """First rebuild stage: C++ graph construction only. Its own
        executor, so build N+2's graphs overlap build N+1's batching and
        build N's device link (3-deep pipeline)."""
        t0 = time.perf_counter()
        graphs = []
        for idx in range(self.n_structs):
            struct = Structure(
                Lattice(np.asarray(lattices[idx], dtype=np.float64)),
                self.atomic_numbers[idx].tolist(),
                np.asarray(frac_list[idx], dtype=np.float64),
            )
            graphs.append(self.converter(struct, graph_id=str(idx)))
        self.stats["graphs_s"] += time.perf_counter() - t0
        return graphs

    def _batch_stage(self, graphs) -> dict:
        """Second stage: padded batching + plans (+ lean pack / shard
        re-layout prep). Single executor, so consecutive builds see
        monotonically growing capacities in order; touches no other
        runtime state beyond cumulative stat adds."""
        t1 = time.perf_counter()
        tot_e = sum(g.n_directed for g in graphs)
        tot_a = sum(g.n_angles for g in graphs)
        cap_e = max(self._cap_e, round_up(tot_e))
        cap_a = max(self._cap_a, round_up(max(tot_a, 1)))
        self._cap_e, self._cap_a = cap_e, cap_a
        batch = batch_graphs(
            graphs, capacities=(self.cap_n, cap_e, cap_a), tile=self.tile,
            tile_cap=self._cap_nx,
        )
        if self.tile and self._tile_probe:
            # auto-tile expansion probe (first build only, which runs
            # before any jit trace so downstream shapes stay consistent):
            # spatially dispersed atom orders blow the halo up; beyond
            # 12x the per-layer [N_x] expansion gather costs more than
            # the window-local neighbor stream saves, so fall back.
            self._tile_probe = False
            if batch.exp_map.shape[0] > 12 * self.cap_n:
                import warnings

                warnings.warn(
                    "tiling disabled: halo expansion "
                    f"{batch.exp_map.shape[0] / max(self.cap_n, 1):.1f}x "
                    "exceeds 12x — the atom order is not spatially "
                    "local. Sort with Structure.spatial_sort() before "
                    "constructing the simulation to keep the tiled "
                    "neighbor stream.",
                    stacklevel=2,
                )
                self.tile = False
                self._cap_nx = 0
                batch = batch_graphs(
                    graphs, capacities=(self.cap_n, cap_e, cap_a),
                )
        if self.tile:
            self._cap_nx = max(self._cap_nx, batch.exp_map.shape[0])
        built = {
            "ref_frac": batch.frac_coords.copy(),
            "ref_lat": batch.lattices.copy(),
            "atom_owner": batch.atom_owner.copy(),
            "cap_e": cap_e,
            "cap_a": cap_a,
            "batch": batch,
        }
        if self.shard_mesh is None:
            # auto mode turns lean shipping on once the batch is big
            # enough that transfer bytes beat the extra expansion
            # dispatch (small systems rebuild in ms either way);
            # capacities only grow, so the decision is sticky and
            # downstream trace shapes stay stable
            if (
                self._lean_auto
                and not self.lean
                and cap_e + cap_a >= 400_000
            ):
                self.lean = True
            if self.lean:
                from chgnet_tpu.graph.leanship import make_lean

                built["lean"] = make_lean(batch)
        self.stats["batch_s"] += time.perf_counter() - t1
        return built

    def _ship_stage(self, built: dict) -> dict:
        """Device half of a rebuild: host->device transfer (+ lean
        expansion). Runs on the single ship-stage executor so transfers
        land in launch order while the NEXT build's host stage overlaps."""
        batch = built["batch"]
        if self.shard_mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            from chgnet_tpu.parallel.graph_sharded import (
                _sbatch_spec,
                shard_batch,
                shard_batch_halo,
            )

            axis = self.shard_mesh.axis_names[0]
            hbatch = None
            if self.shard_halo:
                sbatch, hbatch = shard_batch_halo(
                    batch,
                    self.shard_mesh.devices.size,
                    min_caps=self._shard_caps,
                    min_halo=self._halo_caps,
                )
            else:
                sbatch = shard_batch(
                    batch,
                    self.shard_mesh.devices.size,
                    min_caps=self._shard_caps,
                )
            # device-resident with the step's sharding, so chunked loops
            # don't re-transfer the whole topology every call
            spec = _sbatch_spec(sbatch, axis)
            built["sbatch"] = jax.tree.map(
                lambda leaf, sp: jax.device_put(
                    leaf, NamedSharding(self.shard_mesh, sp)
                ),
                sbatch,
                spec,
            )
            if hbatch is not None:
                built["hbatch"] = jax.tree.map(
                    lambda leaf: jax.device_put(
                        leaf,
                        NamedSharding(self.shard_mesh, PartitionSpec(axis)),
                    ),
                    hbatch,
                )
                built["halo_caps"] = (
                    hbatch.atom_send.shape[2],
                    hbatch.bond_send.shape[2],
                )
            built["shard_caps"] = (
                sbatch.edge_center.shape[1],
                sbatch.und_center.shape[1],
                sbatch.ang_center.shape[1],
            )
            # the single-device padded batch stays HOST-side in shard
            # mode (only ref positions and shapes are consulted)
            built["batch"] = batch
            return built
        # keep the topology DEVICE-resident: simulation loops pass the
        # batch into a jitted step every chunk, and host numpy leaves
        # would be re-transferred each call (~3.6 s per call at the
        # 10k-atom scale through the dev tunnel — measured)
        t2 = time.perf_counter()
        if "lean" in built:
            from chgnet_tpu.graph.leanship import expand_lean

            blob, meta = built.pop("lean")
            put = expand_lean(jax.device_put(blob), meta)
        else:
            put = jax.device_put(batch)
        jax.block_until_ready(put)
        self.stats["put_s"] += time.perf_counter() - t2
        built["batch"] = put
        return built

    def _host_stage(
        self,
        frac_list: list[np.ndarray],
        lattices: np.ndarray,
    ) -> dict:
        """Graph + batch stages back to back (sync path / tests)."""
        return self._batch_stage(self._graph_stage(frac_list, lattices))

    def _build_worker(
        self,
        frac_list: list[np.ndarray],
        lattices: np.ndarray,
    ) -> dict:
        """All rebuild stages back to back (sync path)."""
        return self._ship_stage(self._host_stage(frac_list, lattices))

    def _apply_build(self, built: dict) -> GraphBatch:
        self._cap_e = built["cap_e"]
        self._cap_a = built["cap_a"]
        self._ref_frac = built["ref_frac"]
        self._ref_lat = built["ref_lat"]
        self._ref_inv_lat = np.linalg.inv(self._ref_lat)
        self._atom_owner_np = built["atom_owner"]
        self.n_rebuilds += 1
        self.batch = built["batch"]
        if "sbatch" in built:
            self.sbatch = built["sbatch"]
            self._shard_caps = built["shard_caps"]
        if "hbatch" in built:
            self.hbatch = built["hbatch"]
            self._halo_caps = built["halo_caps"]
        return self.batch

    def _build(
        self, frac_list: list[np.ndarray], lattices: np.ndarray
    ) -> GraphBatch:
        return self._apply_build(self._build_worker(frac_list, lattices))

    def _split(self, frac: np.ndarray) -> list[np.ndarray]:
        return [
            frac[self.offsets[i]: self.offsets[i + 1]]
            for i in range(self.n_structs)
        ]

    def rebuild(self, frac: np.ndarray, lattices: np.ndarray) -> GraphBatch:
        """Rebuild topology from padded frac [cap_n, 3] and lattices [B, 3, 3]."""
        # a fresh synchronous build supersedes any in-flight ones; wait
        # them out (the workers may hold the native lib) and drop them
        self._drain_pipeline()
        frac = np.asarray(frac, dtype=np.float64)
        lattices = np.asarray(lattices, dtype=np.float64)
        self._build(self._split(frac), lattices)
        return self.batch

    # ------------------------------------------------------- async rebuild
    # The host graph build takes O(0.5 s) at 10k atoms — synchronous
    # rebuilds stall the device every few steps at small skins. Instead
    # the simulation loop LAUNCHES a rebuild on a background thread as
    # soon as drift crosses a trigger fraction of the skin and keeps
    # stepping on the (still-valid) old topology; the Verlet criterion is
    # judged against the positions the pending build was launched from,
    # so correctness is unchanged.
    #
    # Rebuilds are a TWO-STAGE PIPELINE (depth 2): while build N occupies
    # the device link (ship stage), build N+1's CPU stage (graphs +
    # batching + blob pack) runs on a second worker. At 10k atoms the two
    # stages are comparable (~0.9 s each), so pipelining nearly doubles
    # the sustainable rebuild rate — the Verlet deadline at small skins.
    _MAX_INFLIGHT = 3

    def _executors(self):
        if self._host_exec is None:
            from concurrent.futures import ThreadPoolExecutor

            self._graph_exec = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="graph-build"
            )
            self._host_exec = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="graph-batch"
            )
            self._ship_exec = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="graph-ship"
            )
        return self._graph_exec, self._host_exec, self._ship_exec

    def launch_rebuild(self, frac: np.ndarray, lattices: np.ndarray) -> bool:
        """Start a background rebuild from these positions. Returns False
        when the pipeline is full (or these positions are too close to
        the newest in-flight build's to be worth a fresh topology)."""
        if len(self._pipeline) >= self._MAX_INFLIGHT:
            return False
        frac = np.array(frac, dtype=np.float64)
        lattices = np.array(lattices, dtype=np.float64)
        if self._pipeline and self._launch_ref is not None:
            # a second in-flight build only pays off once drift has
            # advanced a meaningful fraction of the skin past the first's
            # launch point
            ref_frac, ref_lat = self._launch_ref
            if self._drift_between(
                ref_frac, ref_lat, frac, lattices
            ) < 0.25:
                return False
        graph_exec, batch_exec, ship_exec = self._executors()
        gf = graph_exec.submit(self._graph_stage, self._split(frac), lattices)
        bf = batch_exec.submit(lambda: self._batch_stage(gf.result()))
        sf = ship_exec.submit(lambda: self._ship_stage(bf.result()))
        self._pipeline.append(sf)
        self._launch_ref = (frac, lattices)
        return True

    def poll_rebuild(self) -> bool:
        """Swap in finished background rebuilds (in launch order); False
        if none were ready."""
        applied = False
        while self._pipeline and self._pipeline[0].done():
            self._apply_build(self._pipeline.pop(0).result())
            applied = True
        if not self._pipeline:
            self._launch_ref = None
        return applied

    def finish_rebuild(self) -> bool:
        """Block until the oldest pending background rebuild lands
        (True), or return False if none was pending."""
        if not self._pipeline:
            return False
        t0 = time.perf_counter()
        self._apply_build(self._pipeline.pop(0).result())
        self.stats["stall_s"] += time.perf_counter() - t0
        if not self._pipeline:
            self._launch_ref = None
        return True

    def _drain_pipeline(self) -> None:
        while self._pipeline:
            fut = self._pipeline.pop(0)
            fut.cancel()
            if not fut.cancelled():
                fut.result()
        self._launch_ref = None

    def step_rebuild(
        self, frac: np.ndarray, lattices: np.ndarray, *, trigger: float = 0.4
    ) -> float:
        """One tick of the async-rebuild policy shared by the MD and
        relaxation loops: swap in any finished background build, then —
        judged against the (possibly new) reference positions — block on
        or run a rebuild when the Verlet budget is exhausted, or launch a
        background rebuild once drift crosses ``trigger`` of the skin.
        Returns the resulting drift fraction."""
        self.poll_rebuild()
        drift = self.drift_fraction(frac, lattices)
        while drift >= 1.0 and self.finish_rebuild():
            drift = self.drift_fraction(frac, lattices)
        if drift >= 1.0:
            self.stats["sync_rebuilds"] += 1
            t0 = time.perf_counter()
            self.rebuild(frac, lattices)
            self.stats["stall_s"] += time.perf_counter() - t0
            drift = 0.0
        elif drift >= trigger:
            self.launch_rebuild(frac, lattices)
        return drift

    # --------------------------------------------------------- rebuild check
    def _drift_between(
        self,
        ref_frac: np.ndarray,
        ref_lat: np.ndarray,
        frac: np.ndarray,
        lattices: np.ndarray,
    ) -> float:
        """Skin-budget fraction consumed going from (ref_frac, ref_lat)
        to (frac, lattices): 2 x max displacement + strain-stretched
        build radius, over the skin."""
        frac = np.asarray(frac)
        lattices = np.asarray(lattices)
        disp = np.einsum(
            "ni,nij->nj", frac - ref_frac, lattices[self._atom_owner()]
        )
        max_disp = float(np.sqrt((disp**2).sum(axis=1)).max()) if len(disp) else 0.0
        # operator-norm bound of the deformation relative to the build cell
        strain = np.matmul(np.linalg.inv(ref_lat), lattices) - np.eye(3)
        strain_norm = float(
            max(np.linalg.norm(s, 2) for s in strain)
        )
        r_build = self.config.atom_graph_cutoff + self.skin
        return (2.0 * max_disp + strain_norm * r_build) / self.skin

    def drift_fraction(self, frac: np.ndarray, lattices: np.ndarray) -> float:
        """Fraction of the skin budget consumed since the current batch was
        built. >= 1.0 means two atoms could have closed the shell."""
        frac = np.asarray(frac)
        lattices = np.asarray(lattices)
        disp = np.einsum(
            "ni,nij->nj", frac - self._ref_frac, lattices[self._atom_owner()]
        )
        max_disp = float(np.sqrt((disp**2).sum(axis=1)).max()) if len(disp) else 0.0
        strain = np.matmul(self._ref_inv_lat, lattices) - np.eye(3)
        strain_norm = float(
            max(np.linalg.norm(s, 2) for s in strain)
        )
        r_build = self.config.atom_graph_cutoff + self.skin
        return (2.0 * max_disp + strain_norm * r_build) / self.skin

    def needs_rebuild(self, frac: np.ndarray, lattices: np.ndarray) -> bool:
        """Verlet-list criterion: rebuild when two atoms could have closed
        the skin shell (2 x max displacement) or lattice strain could have
        stretched a build-radius bond by the remaining margin."""
        return self.drift_fraction(frac, lattices) >= 1.0

    def _atom_owner(self) -> np.ndarray:
        return self._atom_owner_np

    # ------------------------------------------------------------- unpadding
    def unpad(self, arr: np.ndarray, graph_idx: int) -> np.ndarray:
        """Slice one structure's rows out of a padded per-atom array."""
        return np.asarray(arr)[
            self.offsets[graph_idx]: self.offsets[graph_idx + 1]
        ]

    def structures(
        self, frac: np.ndarray, lattices: np.ndarray
    ) -> list[Structure]:
        """Materialize host Structures from padded device state."""
        frac = np.asarray(frac, dtype=np.float64)
        lattices = np.asarray(lattices, dtype=np.float64)
        return [
            Structure(
                Lattice(lattices[i]),
                self.atomic_numbers[i].tolist(),
                self.unpad(frac, i),
                site_properties=self.site_properties[i],
            )
            for i in range(self.n_structs)
        ]
