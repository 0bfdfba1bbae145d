"""Dump + analyze the optimized HLO of the bench-scale E+F+S+M executable.

Prints a summary of copy/transpose/bitcast-copy bytes (layout-adjustment
waste, typically inserted where XLA's preferred layouts meet the Pallas
custom-calls' row-major operand constraints), fusion counts, and the
largest individual ops. Writes the full text to /tmp/chgnet_tpu_hlo.txt.

Usage: python tools/dump_hlo.py [n_structs]
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root for direct runs

import collections
import os
import re
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/chgnet_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from chgnet_tpu import ROOT  # noqa: E402
from chgnet_tpu.core.structure import Structure  # noqa: E402
from chgnet_tpu.graph.batching import batch_graphs  # noqa: E402
from chgnet_tpu.models.chgnet import CHGNet, compute_batch  # noqa: E402
from chgnet_tpu.utils.profiling import wait_for_tpu  # noqa: E402

DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1,
               "s8": 1, "u8": 1, "f16": 2, "s64": 8, "f64": 8}


def shape_bytes(shape: str) -> int:
    m = re.match(r"(\w+)\[([\d,]*)\]", shape)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * DTYPE_BYTES.get(dt, 4)


def main() -> None:
    if not wait_for_tpu(
        float(os.environ.get("CHGNET_TPU_PROBE_BUDGET_S", 900))
    ):
        raise SystemExit("device backend unreachable")
    n_structs = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    model = CHGNet(seed=0, compute_dtype="bfloat16", matmul_precision="default")
    struct = Structure.from_file(f"{ROOT}/examples/mp-18767-LiMnO2.cif")
    graphs = [
        model.graph_converter(
            struct.make_supercell(3).perturb(0.05, seed=seed), graph_id=str(seed)
        )
        for seed in range(n_structs)
    ]
    batch = jax.device_put(batch_graphs(graphs))

    def run(b):
        return compute_batch(
            model.params, b, config=model.config,
            compute_force=True, compute_stress=True, compute_magmom=True,
        )

    compiled = jax.jit(run).lower(batch).compile()
    text = compiled.as_text()
    with open("/tmp/chgnet_tpu_hlo.txt", "w") as fh:
        fh.write(text)

    copies = []  # (bytes, line)
    op_bytes = collections.Counter()
    op_count = collections.Counter()
    for line in text.splitlines():
        ls = line.strip()
        m = re.match(r"%?[\w.\-]+ = (\S+?)\{?[\d,]*\}? ([\w\-]+)\(", ls)
        if not m:
            continue
        shape, op = m.groups()
        b = shape_bytes(shape)
        op_count[op] += 1
        op_bytes[op] += b
        if op == "copy":
            copies.append((b, ls[:160]))

    print("== op byte totals (output bytes, top 15) ==")
    for op, b in op_bytes.most_common(15):
        print(f"{op:28s} n={op_count[op]:5d}  out={b/1e9:8.3f} GB")
    copies.sort(reverse=True)
    total_copy = sum(b for b, _ in copies)
    print(f"\n== copies: {len(copies)} totaling {total_copy/1e9:.3f} GB out "
          f"(~{2*total_copy/1e9:.3f} GB moved) ==")
    for b, ls in copies[:12]:
        print(f"{b/1e6:9.1f} MB  {ls}")
    print("\nfull HLO: /tmp/chgnet_tpu_hlo.txt")


if __name__ == "__main__":
    main()
