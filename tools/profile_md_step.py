"""Differential component timing of the large-system MD device step.

Times the 10,240-atom EF step (bf16, skin-built batch, lean-shipped)
under layer ablations with forced-completion timing, attributing
milliseconds to AtomConv/BondConv/AngleUpdate and the remat recompute.
Round-3 reference numbers (docs/performance.md): full EF 1565 ms with
remat / 1174 ms without; BondConv ~750 ms; AngleUpdate ~380 ms.

Usage: python tools/profile_md_step.py [supercell e.g. 16,10,8]
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root for direct runs

import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/chgnet_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from chgnet_tpu import ROOT  # noqa: E402
from chgnet_tpu.core.structure import Structure  # noqa: E402
from chgnet_tpu.models.chgnet import CHGNet  # noqa: E402
from chgnet_tpu.simulation.runtime import (  # noqa: E402
    GraphRuntime,
    compute_batch_dynamic,
)
from chgnet_tpu.utils.profiling import wait_for_tpu  # noqa: E402

EF = dict(compute_stress=False, compute_magmom=False)
VARIANTS = [
    ("ef remat (MD config above the HBM boundary)", {"remat": True}, EF),
    ("ef no remat (MD config)", {}, EF),
    ("ef no AngleUpdate", {"update_angle": False}, EF),
    ("ef no Bond/Angle", {"update_bond": False, "update_angle": False}, EF),
]


def main() -> None:
    if not wait_for_tpu(600):
        raise SystemExit("device backend unreachable (tunnel down)")
    scale = tuple(
        int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "16,10,8").split(",")
    )
    base = Structure.from_file(f"{ROOT}/examples/mp-18767-LiMnO2.cif")
    struct = base.make_supercell(scale)
    print(f"atoms: {len(struct)}", flush=True)
    for name, mk, ck in VARIANTS:
        kw = dict(
            seed=0, compute_dtype="bfloat16", matmul_precision="default"
        )
        kw.update(mk)
        model = CHGNet(**kw)
        rt = GraphRuntime(model.config, [struct], skin=0.1)
        try:
            out = compute_batch_dynamic(
                model.params, rt.batch, config=model.config, **ck
            )
            float(np.asarray(out["e"])[0])  # force completion (tunnel!)
            t0, n = time.perf_counter(), 3
            for _ in range(n):
                out = compute_batch_dynamic(
                    model.params, rt.batch, config=model.config, **ck
                )
                float(np.asarray(out["e"])[0])
            print(
                f"{name:44s} {(time.perf_counter() - t0) / n * 1000:8.1f} ms",
                flush=True,
            )
        except Exception as exc:  # OOM at large streams is expected data
            print(f"{name:44s} FAILED: {type(exc).__name__}", flush=True)


if __name__ == "__main__":
    main()
