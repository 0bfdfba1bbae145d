"""Profiling helpers: trace capture and honest device timing.

The reference has no profiling support at all (SURVEY §5); this module
adds the two tools that matter on TPU:

* :func:`trace` — context manager around ``jax.profiler`` trace capture,
* :func:`timeit` — steady-state timing that FORCES completion with a host
  scalar fetch. ``block_until_ready`` alone can be unreliable through
  remote-device tunnels (it may return at enqueue time), silently turning
  benchmarks into dispatch-latency measurements.
"""

from __future__ import annotations

import contextlib
import time
from collections.abc import Callable

import jax
import numpy as np


def wait_for_tpu(budget_s: float = 900.0, probe_timeout_s: float = 60.0) -> bool:
    """Wait until the TPU backend actually executes work, up to ``budget_s``.

    The dev environment's remote TPU tunnel intermittently HANGS (no
    exception — any dispatched op blocks forever), so the probe runs a
    tiny matmul in a SUBPROCESS under a hard timeout and retries.
    Returns True once a probe succeeds, False when the budget runs out.
    Benchmarks call this before heavy work so a down tunnel produces a
    bounded, explicit failure instead of an indefinite hang.
    """
    import os
    import signal
    import subprocess
    import sys
    import tempfile

    code = (
        "import jax, jax.numpy as jnp;"
        "x = jnp.ones((128, 128));"
        "print(float((x @ x).sum()))"
    )
    deadline = time.monotonic() + budget_s
    attempt = 0
    while True:
        attempt += 1
        why = "probe timed out (tunnel hang?)"
        # Output goes to a temp FILE, not a pipe: the device plugin spawns
        # helper processes that inherit stdout/stderr, so a piped
        # subprocess.run() blocks in communicate() after the timeout kill
        # (the grandchildren keep the pipe open) and the budget is never
        # honored. start_new_session + killpg reaps the whole tree.
        with tempfile.TemporaryFile() as out:
            proc = subprocess.Popen(
                [sys.executable, "-c", code],
                stdout=out,
                stderr=out,
                start_new_session=True,
            )
            try:
                rc = proc.wait(timeout=probe_timeout_s)
                if rc == 0:
                    return True
                # surface the real failure: a deterministic error (broken
                # install, bad env) would otherwise burn the whole budget
                # with zero diagnostics
                out.seek(0)
                tail = out.read().decode(errors="replace").strip().splitlines()
                why = tail[-1][:200] if tail else f"exit code {rc}"
            except subprocess.TimeoutExpired:
                with contextlib.suppress(ProcessLookupError):
                    os.killpg(proc.pid, signal.SIGKILL)
                proc.wait()
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            print(f"# TPU probe gave up: {why}", flush=True)
            return False
        print(
            f"# TPU probe {attempt} failed ({why}); retrying, "
            f"{int(remaining)} s left in budget",
            flush=True,
        )
        time.sleep(min(30.0, max(remaining, 0.0)))


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/chgnet_tpu_trace"):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def _force_completion(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf)).ravel()[:1]


def timeit(
    fn: Callable,
    *args,
    iters: int = 10,
    repeats: int = 3,
    warmup: bool = True,
) -> dict:
    """Best-of-``repeats`` steady-state seconds/iteration for ``fn(*args)``.

    Each window enqueues ``iters`` calls then fetches one scalar to the
    host, which is stream-ordered and therefore guarantees every queued
    execution actually ran.
    """
    if warmup:
        out = fn(*args)
        _force_completion(out)
    best = float("inf")
    for _ in range(repeats):
        start = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _force_completion(out)
        best = min(best, (time.perf_counter() - start) / iters)
    return {"seconds_per_iter": best, "iters": iters, "repeats": repeats}
