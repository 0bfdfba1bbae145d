"""On-chip probe: effective HBM cost of narrow (64-lane) bf16 streams.

Decides the round-5 shared-window gather design: gathering RAW 64-wide
tables (bond/atom features before the first-layer projection) only wins
if a [L, 64] bf16 stream actually moves ~128 B/row — i.e. if XLA hands
the P-packing kernels a dense [L/2, 128] buffer instead of a lane-padded
[L, 64] one, and if elementwise consumers see the same.

Timing per CLAUDE.md: the tunnel ships outputs at ~0.45 GB/s and
block_until_ready does not block, so every measured op reduces to a
scalar ON DEVICE and a host fetch forces completion.
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root for direct runs

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/chgnet_tpu_jax_cache")

from chgnet_tpu.ops import stream_ops as so  # noqa: E402
from chgnet_tpu.utils.profiling import wait_for_tpu  # noqa: E402

if not wait_for_tpu(120):
    raise SystemExit("no tpu")

L = 1 << 20  # 1M rows


def timed(fn, *args, reps=20):
    out = fn(*args)
    float(out)  # force compile + completion
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        float(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def report(name, secs, bytes_moved):
    print(
        f"{name:48s} {secs * 1e3:8.3f} ms   "
        f"{bytes_moved / secs / 1e9:7.1f} GB/s(nominal)"
    )


key = jax.random.PRNGKey(0)
x64 = jax.random.normal(key, (L, 64), jnp.float32).astype(jnp.bfloat16)
x128 = jax.random.normal(key, (L, 128), jnp.float32).astype(jnp.bfloat16)
x64p = jnp.reshape(x128, (2 * L, 64))[:L]  # same bytes as x64

# 1) elementwise read cost: sum(abs(x)) — one read pass, scalar out
f_sum = jax.jit(lambda a: jnp.sum(jnp.abs(a.astype(jnp.float32))))
t128 = timed(f_sum, x128)
t64 = timed(f_sum, x64)
report("elementwise read [1M,128] bf16", t128, L * 256)
report("elementwise read [1M,64] bf16", t64, L * 128)

# 2) segsum kernel: sorted stream, d=64 vs d=128 (same ROW count)
n_out = L // 8
dst = np.repeat(np.arange(n_out, dtype=np.int32), 8)
blk_lo, blk_cnt = so.build_block_plan(dst, n_out)
dst_j = jnp.asarray(dst)
lo_j, cnt_j = jnp.asarray(blk_lo), jnp.asarray(blk_cnt)


def seg(d):
    xx = x64 if d == 64 else x128

    @jax.jit
    def f(x):
        out = so.segment_sum_sorted(
            x, dst_j, lo_j, cnt_j, n_out
        )
        return jnp.sum(jnp.abs(out.astype(jnp.float32)))

    return timed(f, xx)


t_s64 = seg(64)
t_s128 = seg(128)
report("segsum kernel [1M,64]->[128k,64]", t_s64, L * 128 + n_out * 128)
report("segsum kernel [1M,128]->[128k,128]", t_s128, L * 256 + n_out * 256)

# 3) window gather kernel: window-local idx, d=64 vs 128
S = L
idx = np.minimum(
    np.arange(L, dtype=np.int64) + np.tile(np.arange(-256, 256), L // 512),
    S - 1,
).clip(0)
gp = so.build_gather_plan(idx, np.ones(L, bool), S)
g_lo, g_cnt = jnp.asarray(gp[0]), jnp.asarray(gp[1])
idx_j = jnp.asarray(idx, dtype=jnp.int32)


def gat(d):
    xx = x64 if d == 64 else x128

    @jax.jit
    def f(x):
        out = so._gather_pallas(x, idx_j, g_lo, g_cnt)
        return jnp.sum(jnp.abs(out.astype(jnp.float32)))

    return timed(f, xx)


t_g64 = gat(64)
t_g128 = gat(128)
report("window gather [1M,64] local", t_g64, 2 * L * 128)
report("window gather [1M,128] local", t_g128, 2 * L * 256)
print("ratios: elem", round(t64 / t128, 3), "seg", round(t_s64 / t_s128, 3),
      "gather", round(t_g64 / t_g128, 3),
      "(0.5 = narrow moves half the bytes; 1.0 = lane-padded)")
