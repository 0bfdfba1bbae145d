"""MD throughput benchmark: steps/s at ~10k atoms (BASELINE.json north star).

Runs NVT Berendsen MD on a large LiMnO2 supercell with the full jitted
step (forward + forces each step), skin-reused topology. Prints one JSON
line per system size.

Usage:
    python tools/bench_md.py [n_steps]
    python tools/bench_md.py --mesh D [n_steps]

``--mesh D`` runs the graph-partitioned loop (``MolecularDynamics(
mesh=D)``) instead — the BASELINE config-5 "100k-atom supercell MD on N
hosts" proof. Env knobs:
    CHGNET_TPU_MD_SIZES     comma list of atom counts (default per mode)
    CHGNET_TPU_MD_SKIN      skin radius override
    CHGNET_TPU_MD_REMAT     per-layer remat: 1/all or angle
    CHGNET_TPU_MD_HALO=1    mesh mode: boundary all_to_all row exchange
    CHGNET_TPU_MD_VIRTUAL=1 mesh mode: run on D VIRTUAL CPU devices
                            (semantics/capacity proof without N chips)
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root for direct runs

import json
import os
import sys
import time


def _parse_args(argv):
    mesh = None
    rest = []
    it = iter(argv)
    for a in it:
        if a == "--mesh":
            mesh = int(next(it))
        else:
            rest.append(a)
    return mesh, rest


MESH, _ARGS = _parse_args(sys.argv[1:])
VIRTUAL = os.environ.get("CHGNET_TPU_MD_VIRTUAL") == "1"
if MESH and VIRTUAL:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = f"{flags} --xla_force_host_platform_device_count={MESH}"
    # big virtual-mesh programs oversubscribe the host cores, and XLA's
    # CPU collectives kill the process when a rendezvous waits > 40 s —
    # raise the limits (this is a semantics proof, not a timing run)
    flags += (
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
        " --xla_cpu_collective_call_terminate_timeout_seconds=7200"
        " --xla_cpu_collective_timeout_seconds=7200"
    )
    os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402

if MESH and VIRTUAL:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/chgnet_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from chgnet_tpu import ROOT  # noqa: E402
from chgnet_tpu.core.structure import Structure  # noqa: E402
from chgnet_tpu.models.chgnet import CHGNet  # noqa: E402
from chgnet_tpu.simulation import MolecularDynamics  # noqa: E402


def _remat_opt():
    v = os.environ.get("CHGNET_TPU_MD_REMAT", "")
    if v in ("", "0"):
        return False
    return True if v == "1" else v


def _supercell(base: Structure, n_atoms: int) -> Structure:
    """LiMnO2 supercell with ~n_atoms (8 atoms per cell)."""
    cells = max(n_atoms // 8, 1)
    a = max(round(cells ** (1 / 3)), 1)
    b = max(round((cells / a) ** 0.5), 1)
    c = max(cells // (a * b), 1)
    return base.make_supercell((a, b, c))


def main_mesh(n_steps: int) -> None:
    """Graph-partitioned MD over a D-device mesh (real chips or virtual
    CPU devices with CHGNET_TPU_MD_VIRTUAL=1)."""
    if not VIRTUAL:
        from chgnet_tpu.utils.profiling import wait_for_tpu

        if not wait_for_tpu(
            float(os.environ.get("CHGNET_TPU_PROBE_BUDGET_S", 900))
        ):
            raise SystemExit("device backend unreachable (tunnel down)")
    halo = os.environ.get("CHGNET_TPU_MD_HALO") == "1"
    sizes = [
        int(s)
        for s in os.environ.get("CHGNET_TPU_MD_SIZES", "51200").split(",")
    ]
    base = Structure.from_file(f"{ROOT}/examples/mp-18767-LiMnO2.cif")
    for n_atoms in sizes:
        struct = _supercell(base, n_atoms)
        skin = float(os.environ.get("CHGNET_TPU_MD_SKIN", 0.1))
        # bf16 streams even in virtual mode: the 8 per-device copies of
        # f32 angle streams at >=50k atoms exceed the dev host's 125 GB
        # (measured: OOM-killed at 130 GB RSS); this is a semantics
        # proof, and bf16 halves every buffer
        model = CHGNet(
            seed=0,
            compute_dtype="bfloat16",
            matmul_precision="default",
            remat=_remat_opt(),
        )
        t_setup = time.perf_counter()
        md = MolecularDynamics(
            struct,
            model=model,
            ensemble="nvt",
            thermostat="Berendsen",
            temperature=300.0,
            starting_temperature=300.0,
            timestep=1.0,
            seed=0,
            skin=skin,
            chunk_size=2 if VIRTUAL else 10,
            mesh=MESH,
            halo=halo,
        )
        setup_s = time.perf_counter() - t_setup
        md.run(md.chunk_size)  # compile the production chunk
        start = time.perf_counter()
        md.run(n_steps)
        float(md.state.epot[0])
        elapsed = time.perf_counter() - start
        temp = float(md.get_temperature())
        assert temp == temp and 0.0 < temp < 1500.0, f"bad T {temp}"
        stats = {
            k: (round(v, 2) if isinstance(v, float) else v)
            for k, v in md.runtime.stats.items()
        }
        print(
            json.dumps(
                {
                    "metric": (
                        f"sharded MD steps/s @ {len(struct)} atoms "
                        f"(NVT, D={MESH}"
                        f"{', halo' if halo else ''}"
                        f"{', virtual-cpu' if VIRTUAL else ''})"
                    ),
                    "value": round(n_steps / elapsed, 4),
                    "unit": "steps/s",
                    "n_atoms": len(struct),
                    "temperature_K": round(temp, 1),
                    "skin": skin,
                    "setup_s": round(setup_s, 1),
                    "rebuilds": md.runtime.n_rebuilds,
                    "phase_s": stats,
                }
            )
        )
        sys.stdout.flush()


def main() -> None:
    from chgnet_tpu.utils.profiling import wait_for_tpu

    if not wait_for_tpu(float(os.environ.get("CHGNET_TPU_PROBE_BUDGET_S", 900))):
        raise SystemExit("device backend unreachable (tunnel down)")

    n_steps = int(_ARGS[0]) if _ARGS else 100
    base = Structure.from_file(f"{ROOT}/examples/mp-18767-LiMnO2.cif")
    # experiment overrides (bench defaults unchanged when unset)
    skin_env = os.environ.get("CHGNET_TPU_MD_SKIN")
    remat_env = os.environ.get("CHGNET_TPU_MD_REMAT")
    sizes_env = os.environ.get("CHGNET_TPU_MD_SIZES", "512,10240")
    # canonical scales for the documented sizes; other sizes derive a
    # near-cubic supercell from the atom count
    all_scales = {512: (4, 4, 4), 2560: (4, 10, 8), 10240: (16, 10, 8)}
    scales = [
        all_scales.get(int(s), int(s)) for s in sizes_env.split(",")
    ]

    for scale in scales:
        struct = (
            base.make_supercell(scale)
            if isinstance(scale, tuple)
            else _supercell(base, scale)
        )
        if os.environ.get("CHGNET_TPU_MD_TILE") or len(struct) > 2000:
            # the halo-tiled neighbor layout needs spatially compact
            # index tiles (GraphRuntime auto-tiles large single-device
            # runs; supercell atom order is species-blocked, which the
            # expansion probe would otherwise reject)
            struct = struct.spatial_sort()
        # bf16 + small skin pay off from a few thousand atoms. remat off
        # by default: the un-remat'ed EF graph fits comfortably up to the
        # ~2M-angle-row HBM boundary (skin 0.1 at 10k atoms is 1.97M) and
        # steps 25% faster; CHGNET_TPU_MD_REMAT=1 restores it for larger
        # streams (skin 0.2 at this size OOMs either way).
        big = len(struct) > 2000
        # Big systems: bf16 streams + a moderate skin. LiMnO2 has a
        # dense neighbor shell just above the 5 A cutoff, so skin=0.3
        # inflates the angle stream 3.3x (docs/performance.md). Round 4:
        # skin 0.15 replaced 0.1 as the default — ~30% fewer rebuilds
        # roughly offsets the ~40% larger angle stream and the loop is
        # less sensitive to tunnel/host latency jitter; remat off (the
        # un-remat'ed EF graph fits at this size).
        model = CHGNet(
            seed=0,
            compute_dtype="bfloat16" if big else "float32",
            matmul_precision="default" if big else "highest",
            remat=_remat_opt(),
        )
        skin = float(skin_env) if skin_env else (0.15 if big else 0.3)
        md = MolecularDynamics(
            struct,
            model=model,
            ensemble="nvt",
            thermostat="Berendsen",
            temperature=300.0,
            starting_temperature=300.0,
            timestep=1.0,
            seed=0,
            skin=skin,
        )
        md.run(md.chunk_size)  # compiles the production-size scan chunk
        start = time.perf_counter()
        md.run(n_steps)
        # force true completion
        float(md.state.epot[0])
        elapsed = time.perf_counter() - start
        stats = {
            k: (round(v, 2) if isinstance(v, float) else v)
            for k, v in md.runtime.stats.items()
        }
        print(
            json.dumps(
                {
                    "metric": f"MD steps/s @ {len(struct)} atoms (NVT)",
                    "value": round(n_steps / elapsed, 3),
                    "unit": "steps/s",
                    "n_atoms": len(struct),
                    "skin": skin,
                    "lean": md.runtime.lean,
                    "rebuilds": md.runtime.n_rebuilds,
                    "phase_s": stats,
                }
            )
        )


if __name__ == "__main__":
    if MESH:
        main_mesh(int(_ARGS[0]) if _ARGS else 10)
    else:
        main()
