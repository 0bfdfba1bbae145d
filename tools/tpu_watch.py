"""Detached TPU-tunnel watcher: probe until the device answers, then bench.

The dev environment's remote TPU tunnel goes down for minutes-to-hours at
a time (CLAUDE.md); this script is meant to be left running detached
(``nohup setsid python tools/tpu_watch.py &``) so benchmarks run the
moment the tunnel recovers instead of requiring a human to poll it.

Loop: probe with a hard per-attempt timeout; once a probe succeeds, run
each benchmark command (itself under a hard timeout, output appended to
the log), collect the final JSON line each prints, and write all results
to ``WATCH_BENCH.json``. A command that fails re-enters the probe loop
(the tunnel often flaps up for <1 min). Exits when every command has
succeeded or the wall budget runs out.

Usage: python tools/tpu_watch.py [--hours H] [--log PATH] [--out PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: (name, argv, per-run timeout seconds)
COMMANDS = [
    ("bench", [sys.executable, "bench.py"], 3600),
    ("bench_md", [sys.executable, "tools/bench_md.py", "60"], 5400),
]

#: the real-chip mesh smoke (tools/tpu_mesh_smoke.py) runs once per
#: session before the benchmarks: the CPU suite structurally cannot see
#: TPU-backend mesh failures (kernels gate off CPU), and round 4 proved
#: that bug class ships past a fully green CPU suite. Result goes to
#: WATCH_SMOKE.json so the artifact exists even when a human forgets.
SMOKE = ("mesh_smoke", [sys.executable, "tools/tpu_mesh_smoke.py"], 2400)
SMOKE_PASS = "ALL D=1 TPU MESH SMOKES PASS"


def log(msg: str, path: str) -> None:
    line = f"[{time.strftime('%Y-%m-%d %H:%M:%S')}] {msg}"
    with open(path, "a") as fh:
        fh.write(line + "\n")


def run_logged(
    argv: list[str], timeout_s: float, log_path: str
) -> list[str] | None:
    """Run argv appending output to the log; return its JSON lines or None.

    Output goes straight to the log FILE (not a pipe — helper processes
    spawned by the device plugin inherit the fds and would wedge a piped
    read after a timeout kill), and the whole process group is killed on
    timeout.
    """
    with open(log_path, "a") as out:
        out.flush()
        start_offset = out.tell()
        proc = subprocess.Popen(
            argv, stdout=out, stderr=out, cwd=REPO, start_new_session=True
        )
        try:
            rc = proc.wait(timeout=timeout_s)
        except subprocess.TimeoutExpired:
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
            proc.wait()
            log(f"TIMEOUT after {timeout_s:.0f}s: {' '.join(argv)}", log_path)
            return None
    if rc != 0:
        log(f"FAILED rc={rc}: {' '.join(argv)}", log_path)
        return None
    # the benchmarks print results as JSON object lines (bench_md prints
    # one per system size); scan only THIS run's output (the log
    # accumulates across runs)
    with open(log_path) as fh:
        fh.seek(start_offset)
        found = [
            ln.strip()
            for ln in fh
            if ln.strip().startswith("{") and ln.strip().endswith("}")
        ]
        return found or None


def run_raw(
    argv: list[str], timeout_s: float, log_path: str
) -> tuple[int, list[str]]:
    """Like :func:`run_logged` but returns (rc, this run's output lines)
    regardless of success — for commands whose result is a text verdict
    rather than JSON (the mesh smoke). Timeout reports rc = -1."""
    with open(log_path, "a") as out:
        out.flush()
        start_offset = out.tell()
        proc = subprocess.Popen(
            argv, stdout=out, stderr=out, cwd=REPO, start_new_session=True
        )
        try:
            rc = proc.wait(timeout=timeout_s)
        except subprocess.TimeoutExpired:
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
            proc.wait()
            log(f"TIMEOUT after {timeout_s:.0f}s: {' '.join(argv)}", log_path)
            rc = -1
    with open(log_path) as fh:
        fh.seek(start_offset)
        lines = [ln.rstrip("\n") for ln in fh if ln.strip()]
    return rc, lines


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hours", type=float, default=11.0)
    ap.add_argument("--log", default=os.path.join(REPO, "tpu_watch.log"))
    ap.add_argument("--out", default=os.path.join(REPO, "WATCH_BENCH.json"))
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from chgnet_tpu.utils.profiling import wait_for_tpu

    deadline = time.monotonic() + args.hours * 3600
    # small probe budget per env so the gated benchmarks fail fast if the
    # tunnel drops between our probe and their own
    os.environ.setdefault("CHGNET_TPU_PROBE_BUDGET_S", "120")

    results: dict[str, dict] = {}
    if os.path.exists(args.out):
        with open(args.out) as fh:
            results = json.load(fh)

    pending = [c for c in COMMANDS if c[0] not in results]
    log(f"watcher start: pending={[c[0] for c in pending]}", args.log)
    while pending and time.monotonic() < deadline:
        if not wait_for_tpu(budget_s=300, probe_timeout_s=45):
            log("probe window failed; sleeping 120s", args.log)
            time.sleep(120)
            continue
        log("TPU probe SUCCEEDED; running benchmarks", args.log)
        smoke_out = os.path.join(
            os.path.dirname(args.out), "WATCH_SMOKE.json"
        )
        if not os.path.exists(smoke_out):
            name, argv, tmo = SMOKE
            log(f"running {name}: {' '.join(argv)}", args.log)
            rc, lines = run_raw(argv, tmo, args.log)
            ok = rc == 0 and any(SMOKE_PASS in ln for ln in lines)
            with open(smoke_out, "w") as fh:
                json.dump(
                    {"ts": time.time(), "ok": ok, "rc": rc,
                     "tail": lines[-8:]},
                    fh,
                    indent=2,
                )
            log(f"mesh smoke {'OK' if ok else 'FAILED'}", args.log)
            if not ok:
                # tunnel may have dropped mid-smoke: leave the failure
                # artifact, remove it so the next session retries, and
                # re-probe (a REAL regression keeps failing and the log
                # carries the trace)
                os.replace(smoke_out, smoke_out + ".failed")
                time.sleep(30)
                continue
        for name, argv, tmo in pending:
            log(f"running {name}: {' '.join(argv)}", args.log)
            lines = run_logged(argv, tmo, args.log)
            parsed = []
            for ln in lines or []:
                # the `{...}` shape filter also passes dict reprs and
                # XLA/absl log noise — keep only lines that really parse
                try:
                    parsed.append(json.loads(ln))
                except json.JSONDecodeError:
                    continue
            if not parsed:
                # tunnel likely dropped; re-probe before the rest (the
                # command stays pending — it has no result entry)
                break
            results[name] = {"ts": time.time(), "result": parsed}
            with open(args.out, "w") as fh:
                json.dump(results, fh, indent=2)
            log(f"{name} OK: {parsed}", args.log)
        pending = [c for c in pending if c[0] not in results]
    log(f"watcher exit: done={list(results)} pending={[c[0] for c in pending]}", args.log)


if __name__ == "__main__":
    main()
