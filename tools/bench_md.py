"""MD throughput benchmark: steps/s at ~10k atoms (BASELINE.json north star).

Runs NVT Berendsen MD on a large LiMnO2 supercell with the full jitted
step (forward + forces each step), skin-reused topology. Prints one JSON
line per system size.

Usage: python tools/bench_md.py [n_steps]
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/chgnet_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from chgnet_tpu import ROOT  # noqa: E402
from chgnet_tpu.core.structure import Structure  # noqa: E402
from chgnet_tpu.models.chgnet import CHGNet  # noqa: E402
from chgnet_tpu.simulation import MolecularDynamics  # noqa: E402


def main() -> None:
    from chgnet_tpu.utils.profiling import wait_for_tpu

    if not wait_for_tpu(float(os.environ.get("CHGNET_TPU_PROBE_BUDGET_S", 900))):
        raise SystemExit("device backend unreachable (tunnel down)")

    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    base = Structure.from_file(f"{ROOT}/examples/mp-18767-LiMnO2.cif")
    # experiment overrides (bench defaults unchanged when unset)
    skin_env = os.environ.get("CHGNET_TPU_MD_SKIN")
    remat_env = os.environ.get("CHGNET_TPU_MD_REMAT")
    sizes_env = os.environ.get("CHGNET_TPU_MD_SIZES", "512,10240")
    all_scales = {512: (4, 4, 4), 2560: (4, 10, 8), 10240: (16, 10, 8)}
    scales = [all_scales[int(s)] for s in sizes_env.split(",")]

    for scale in scales:
        struct = base.make_supercell(scale)
        # bf16 + small skin pay off from a few thousand atoms. remat off
        # by default: the un-remat'ed EF graph fits comfortably up to the
        # ~2M-angle-row HBM boundary (skin 0.1 at 10k atoms is 1.97M) and
        # steps 25% faster; CHGNET_TPU_MD_REMAT=1 restores it for larger
        # streams (skin 0.2 at this size OOMs either way).
        big = len(struct) > 2000
        # Big systems: bf16 streams + a SMALL skin. LiMnO2 has a dense
        # neighbor shell just above the 5 A cutoff, so skin=0.3 inflates
        # the angle stream 3.3x (docs/performance.md); skin=0.1 keeps the
        # streams small and the async background rebuild hides the more
        # frequent host builds. remat=True since round 3: the streaming-
        # kernel layout copies pushed the un-remat'ed E+F graph past the
        # 16 GB HBM budget at this size (compile-time OOM).
        model = CHGNet(
            seed=0,
            compute_dtype="bfloat16" if big else "float32",
            matmul_precision="default" if big else "highest",
            remat=(remat_env == "1") if remat_env else False,
        )
        skin = float(skin_env) if skin_env else (0.1 if big else 0.3)
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
    main()
