"""Isolated streaming-kernel microbenchmarks on the real chip.

Times each hot op (streaming segment-sum, window gather, fused
multi-gather) on bench-shaped synthetic streams against its XLA fallback
and an elementwise HBM-bound reference, printing one JSON line per op
with achieved physical GB/s (counting PADDED tile bytes, i.e. what the
memory system really moves: minor dims pad to 128 lanes in T(8,128)).

CRITICAL measurement rule for this environment: the axon tunnel ships
every EXECUTION OUTPUT back to the host at ~0.45 GB/s (measured: a
165 MB-output op costs ~365 ms regardless of compute; a 165 MB-INPUT
reduction costs 3.4 ms). Standalone op timings are meaningless unless
the op's output is reduced to a scalar ON DEVICE inside the same
executable — every timed fn here returns jnp.sum(op(...)) (one extra
read pass over the output, a few ms at HBM speed, constant across
variants).

Chunk geometry is env-tunable: CHGNET_TPU_STREAM_C / CHGNET_TPU_STREAM_BO
(read at import by ops/stream_ops.py) — run one process per config.

Usage: python tools/bench_kernels.py [scale]
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root for direct runs

import json
import os

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/chgnet_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp  # noqa: E402

from chgnet_tpu.ops import stream_ops  # noqa: E402
from chgnet_tpu.ops.scatter import make_plan  # noqa: E402
from chgnet_tpu.utils.profiling import timeit, wait_for_tpu  # noqa: E402


def tile_bytes(shape, dtype) -> int:
    """Physical HBM bytes of a 2-D array under T(8,128) tiling."""
    n, d = shape
    itemsize = np.dtype(dtype).itemsize
    sub = 8 if itemsize >= 2 else 32
    lanes = -(-d // 128) * 128
    rows = -(-n // sub) * sub
    return rows * lanes * itemsize


def scalarized(op):
    """jit(op) with its output summed to one f32 scalar on device, so
    the tunnel's per-MB output-shipping cost disappears from timings."""
    return jax.jit(lambda *a: jnp.sum(op(*a).astype(jnp.float32)))


def report(name, seconds, bytes_moved, extra=None):
    out = {
        "op": name,
        "ms": round(seconds * 1e3, 3),
        "gbps": round(bytes_moved / seconds / 1e9, 1),
    }
    if extra:
        out.update(extra)
    print(json.dumps(out), flush=True)


def main() -> None:
    if not wait_for_tpu(
        float(os.environ.get("CHGNET_TPU_PROBE_BUDGET_S", 900))
    ):
        raise SystemExit("device backend unreachable")
    import sys

    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    C = stream_ops.C
    BO = stream_ops.BO

    def align(n):
        a = max(C, BO)
        return -(-int(n * scale) // a) * a

    # bench-workload shapes (32x 216-atom LiMnO2 supercells)
    N = align(7_168)
    U = align(292_224)
    E = 2 * U
    A = align(656_826)
    rng = np.random.default_rng(0)
    print(
        json.dumps({"N": N, "U": U, "E": E, "A": A, "C": C, "BO": BO}),
        flush=True,
    )

    # --- reference: elementwise add on the angle stream (HBM bound) ----
    xa = jax.device_put(
        rng.standard_normal((A, 128)).astype(np.float32)
    ).astype(jnp.bfloat16)
    xb = jax.device_put(
        rng.standard_normal((A, 128)).astype(np.float32)
    ).astype(jnp.bfloat16)
    t = timeit(scalarized(lambda p, q: p + q), xa, xb)["seconds_per_iter"]
    report(
        "elementwise add [A,128] bf16", t, 3 * tile_bytes((A, 128), np.float16)
    )

    # --- streaming segment-sum: A -> E (BondConv partial, sorted) ------
    dst = np.sort(rng.integers(0, E, size=A)).astype(np.int32)
    plan = make_plan(dst, np.ones(A, bool), E, assume_sorted=True)
    moved = tile_bytes((A, 128), np.float16) + tile_bytes((E, 128), np.float16)
    if plan.blk_lo.shape[0]:
        f = scalarized(
            lambda v: stream_ops.segment_sum_sorted(
                v, plan.dst, plan.blk_lo, plan.blk_cnt, E
            )
        )
        t = timeit(f, xa)["seconds_per_iter"]
        report(
            "segsum_stream A->E [A,128] bf16", t, moved,
            {"visits": int(plan.blk_cnt.sum()),
             "blocks": int(plan.blk_lo.shape[0])},
        )
    dstj = jax.device_put(dst)
    f = scalarized(
        lambda v, dd: jax.ops.segment_sum(v, dd, E, indices_are_sorted=True)
    )
    t = timeit(f, xa, dstj)["seconds_per_iter"]
    report("segsum_xla    A->E [A,128] bf16", t, moved)

    # --- streaming segment-sum: E -> N (AtomConv reduce, sorted) -------
    dstn = np.sort(rng.integers(0, N, size=E)).astype(np.int32)
    plann = make_plan(dstn, np.ones(E, bool), N, assume_sorted=True)
    xe = jax.device_put(
        rng.standard_normal((E, 128)).astype(np.float32)
    ).astype(jnp.bfloat16)
    movedn = tile_bytes((E, 128), np.float16) + tile_bytes((N, 128), np.float16)
    if plann.blk_lo.shape[0]:
        f = scalarized(
            lambda v: stream_ops.segment_sum_sorted(
                v, plann.dst, plann.blk_lo, plann.blk_cnt, N
            )
        )
        t = timeit(f, xe)["seconds_per_iter"]
        report(
            "segsum_stream E->N [E,128] bf16", t, movedn,
            {"visits": int(plann.blk_cnt.sum()),
             "blocks": int(plann.blk_lo.shape[0])},
        )

    # --- window gather: [E,128] table -> [A] sorted idx (dir_i) --------
    idx = np.sort(rng.integers(0, E, size=A)).astype(np.int32)
    gplan = make_plan(idx, np.ones(A, bool), E)
    idxj = jax.device_put(idx)
    moved = tile_bytes((E, 128), np.float16) + tile_bytes((A, 128), np.float16)
    if gplan.g_lo.shape[0]:
        f = scalarized(
            lambda v: stream_ops._gather_pallas(
                v, idxj, gplan.g_lo, gplan.g_cnt
            )
        )
        t = timeit(f, xe)["seconds_per_iter"]
        report(
            "gather_stream [E,128]->[A] bf16", t, moved,
            {"visits": int(gplan.g_cnt.sum()),
             "blocks": int(gplan.g_lo.shape[0])},
        )
    f = scalarized(lambda v, ii: v[ii])
    t = timeit(f, xe, idxj)["seconds_per_iter"]
    report("gather_xla    [E,128]->[A] bf16", t, moved)

    # --- window gather: geometry [E,32] f32 -> [A] ---------------------
    tab32 = jax.device_put(rng.standard_normal((E, 32)).astype(np.float32))
    moved32 = tile_bytes((E, 32), np.float32) + tile_bytes((A, 32), np.float32)
    if gplan.g_lo.shape[0]:
        f = scalarized(
            lambda v: stream_ops._gather_pallas(
                v, idxj, gplan.g_lo, gplan.g_cnt
            )
        )
        t = timeit(f, tab32)["seconds_per_iter"]
        report("gather_stream [E,32]->[A] f32", t, moved32)
    f = scalarized(lambda v, ii: v[ii])
    t = timeit(f, tab32, idxj)["seconds_per_iter"]
    report("gather_xla    [E,32]->[A] f32", t, moved32)

    # --- d2u expansion gather: [U,128] -> [E] (i//2, sorted) -----------
    idxu = (np.arange(E, dtype=np.int32) // 2).astype(np.int32)
    uplan = make_plan(idxu, np.ones(E, bool), U)
    idxuj = jax.device_put(idxu)
    tabu = jax.device_put(
        rng.standard_normal((U, 128)).astype(np.float32)
    ).astype(jnp.bfloat16)
    movedu = tile_bytes((U, 128), np.float16) + tile_bytes((E, 128), np.float16)
    if uplan.g_lo.shape[0]:
        f = scalarized(
            lambda v: stream_ops._gather_pallas(
                v, idxuj, uplan.g_lo, uplan.g_cnt
            )
        )
        t = timeit(f, tabu)["seconds_per_iter"]
        report("gather_stream [U,128]->[E] bf16", t, movedu)
    f = scalarized(lambda v, ii: v[ii])
    t = timeit(f, tabu, idxuj)["seconds_per_iter"]
    report("gather_xla    [U,128]->[E] bf16", t, movedu)

    # --- fused multi-gather: 2x [E,128] windows + aligned stream -------
    idx2 = np.sort(rng.integers(0, E, size=A)).astype(np.int32)
    gplan2 = make_plan(idx2, np.ones(A, bool), E)
    idx2j = jax.device_put(idx2)
    tabb = jax.device_put(
        rng.standard_normal((E, 128)).astype(np.float32)
    ).astype(jnp.bfloat16)
    if gplan.g_lo.shape[0] and gplan2.g_lo.shape[0]:
        f = scalarized(
            lambda v, w, s: stream_ops._multi_gather_pallas(
                (v, w),
                (idxj, idx2j),
                (gplan.g_lo, gplan2.g_lo),
                (gplan.g_cnt, gplan2.g_cnt),
                s,
                has_stream=True,
            )
        )
        t = timeit(f, xe, tabb, xa)["seconds_per_iter"]
        moved = 2 * tile_bytes((E, 128), np.float16) + 2 * tile_bytes(
            (A, 128), np.float16
        )
        report("multi_gather 2x[E,128]+stream bf16", t, moved)
        # unfused comparison: two kernel gathers + stream add
        f = scalarized(
            lambda v, w, s: (
                stream_ops._gather_pallas(v, idxj, gplan.g_lo, gplan.g_cnt)
                + stream_ops._gather_pallas(
                    w, idx2j, gplan2.g_lo, gplan2.g_cnt
                )
                + s
            )
        )
        t = timeit(f, xe, tabb, xa)["seconds_per_iter"]
        report(
            "2x gather_stream + add (unfused)", t,
            moved + 2 * tile_bytes((A, 128), np.float16),
        )


if __name__ == "__main__":
    main()
