"""Benchmark: crystal-graph message-passing throughput on one chip.

Measures the BASELINE.json north-star metric — directed graph edges
processed per second — on the production inference path (energy + forces +
stress + magmom, i.e. forward + full backward through the conv stack) of
the default 412k-param CHGNet over a batch of 32 perturbed 216-atom LiMnO2
supercells (~6.9k atoms, ~585k directed edges at 6 A — a saturating
production-scale batch; small batches are dispatch-latency-bound, and
larger ones exceed the remote compiler's memory budget on the current
single-chip environment).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` anchors to 1e6 directed edges/s, a fixed documented
nominal: the reference publishes no throughput numbers (SURVEY §6), so the
anchor makes cross-round progress comparable (2.0 == 2M edges/s).
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_EDGES_PER_S = 1.0e6

# Effective HBM bandwidth bound for roofline accounting. Measured on this
# chip with a large f32 elementwise loop: ~265 GB/s (the earlier ~37 GB/s
# figure was XLA's row-at-a-time gather emitter, not the memory system —
# see docs/performance.md). Override with CHGNET_TPU_HBM_GBPS.
HBM_GBPS = float(__import__("os").environ.get("CHGNET_TPU_HBM_GBPS", 265.0))


def roofline_bytes(batch, config) -> int:
    """Approximate LOWER BOUND on HBM bytes moved per E+F+S+M iteration.

    Counts each hot feature stream once per touch (gather read + message
    write + segment-sum read/write) across the conv stack, forward plus
    ~2x for the backward (grad-of-gather = gather + sorted segment-sum,
    see ops/scatter.py), at the configured stream dtype. Fused/elementwise
    traffic, basis tables and weight tensors are ignored, so the model
    understates true traffic: achieved_gbps computed against it is a
    floor on the real bandwidth utilisation.
    """
    import numpy as np  # local: keep module import light

    n_atoms = int(batch.atomic_numbers.shape[0])
    n_dir = int(batch.atom_graph.shape[0])
    n_und = int(batch.undirected2directed.shape[0])
    n_ang = int(batch.bond_graph.shape[0])
    d = int(config.atom_fea_dim)
    s = 2 if config.compute_dtype == "bfloat16" else 4
    n_conv = int(config.n_conv)

    # Counts follow the DIRECTED implementation (docs/performance.md §7):
    # bond tables expand [U,d] -> [E,d] once per consuming layer, bond
    # updates partial-sum into the directed stream and reduce back with
    # two [U,d] window gathers.
    # AtomConv (n_conv): center + nbr + d2u-bond gathers [E,d], message
    # write [E,d], segment-sum read [E,d] -> write [N,d]
    atom_conv = n_conv * (5 * n_dir * d + n_atoms * d)
    # BondConv (n_conv-1): d2u expansion (U read + E write), bond_i +
    # bond_j + center + angle reads [A,d], message write [A,d], partial
    # segment-sum [A,d] -> [E,d], two-gather reduce [E,d] -> [U,d]
    bond_conv = (n_conv - 1) * (
        (n_und + n_dir) * d + 6 * n_ang * d + n_dir * d + 3 * n_und * d
    )
    # AngleUpdate (n_conv-1): d2u expansion + 3 gathers + write [A,d]
    angle_upd = (n_conv - 1) * ((n_und + n_dir) * d + 4 * n_ang * d)
    fwd = (atom_conv + bond_conv + angle_upd) * s
    return int(fwd * 3)  # forward + ~2x backward


def main() -> None:
    from chgnet_tpu import ROOT
    from chgnet_tpu.core.structure import Structure
    from chgnet_tpu.graph.batching import batch_graphs
    from chgnet_tpu.models.chgnet import CHGNet, compute_batch
    from chgnet_tpu.utils.profiling import wait_for_tpu

    import os

    # the remote TPU tunnel intermittently hangs (ops block forever, no
    # exception): probe in a subprocess first so a down tunnel fails
    # loudly and boundedly instead of wedging the benchmark
    budget = float(os.environ.get("CHGNET_TPU_PROBE_BUDGET_S", 900))
    if not wait_for_tpu(budget):
        raise SystemExit(
            f"device backend unreachable after {budget:.0f} s of probing"
        )

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/chgnet_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    # production serving configuration: bf16 conv streams (accuracy cost
    # ~0.2 meV/atom — far below the model's 29 meV/atom test MAE; see
    # docs/performance.md). fp32 remains the default for parity work.
    model = CHGNet(
        seed=0, compute_dtype="bfloat16", matmul_precision="default"
    )
    struct = Structure.from_file(f"{ROOT}/examples/mp-18767-LiMnO2.cif")

    n_structs = 32
    graphs = [
        model.graph_converter(
            struct.make_supercell(3).perturb(0.05, seed=seed), graph_id=str(seed)
        )
        for seed in range(n_structs)
    ]
    n_edges = sum(g.n_directed for g in graphs)
    batch = batch_graphs(graphs)
    batch = jax.device_put(batch)

    def run():
        return compute_batch(
            model.params,
            batch,
            config=model.config,
            compute_force=True,
            compute_stress=True,
            compute_magmom=True,
        )

    # compile, with retries: the remote compile service is intermittent.
    # If all retries fail with a NON-transient error (e.g. a Mosaic
    # lowering rejection of a newly-default kernel on a toolchain this
    # round never saw), fall back once with the round-5 kernel families
    # disabled so the benchmark still reports a number instead of dying.
    def compile_with_retries():
        for attempt in range(3):
            try:
                out = run()
                jax.block_until_ready(out)
                return
            except Exception as exc:  # noqa: BLE001 - transient faults
                if attempt == 2:
                    raise
                print(
                    f"# compile attempt {attempt + 1} failed ({exc}); "
                    "retrying"
                )
                time.sleep(10)

    kernel_fallback = False
    try:
        compile_with_retries()
    except Exception as exc:  # noqa: BLE001
        print(
            "# compile failed with round-5 kernels on "
            f"({type(exc).__name__}); retrying with gproj/msg-reduce/"
            "pairing disabled"
        )
        for kill in (
            "CHGNET_TPU_NO_GPROJ",
            "CHGNET_TPU_NO_STREAM_PAIR", "CHGNET_TPU_NO_TWIN_REDUCE",
        ):
            os.environ[kill] = "1"
        jax.clear_caches()
        kernel_fallback = True
        compile_with_retries()

    # best-of-5 windows: the device link has noisy latency spikes, and a
    # throughput metric should report steady-state, not tunnel jitter
    n_iters = 20
    best = float("inf")
    for _ in range(5):
        start = time.perf_counter()
        for _ in range(n_iters):
            out = run()
        # host scalar fetch: stream-ordered, so it forces TRUE completion
        # of all queued executions (block_until_ready alone can be
        # unreliable through remote-device tunnels)
        float(out["e"][0])
        best = min(best, time.perf_counter() - start)

    edges_per_s = n_edges * n_iters / best

    # energy-only screening throughput (forward pass, no backward): the
    # high-volume stability-screening workload — regression-tracked as a
    # second field so the driver's BENCH_r*.json captures both paths
    def run_e():
        return compute_batch(model.params, batch, config=model.config)

    out_e = run_e()
    jax.block_until_ready(out_e)
    best_e = float("inf")
    for _ in range(5):
        start = time.perf_counter()
        for _ in range(n_iters):
            out_e = run_e()
        float(out_e["e"][0])
        best_e = min(best_e, time.perf_counter() - start)
    e_only_edges_per_s = n_edges * n_iters / best_e

    # roofline: achieved HBM GB/s against the measured effective bound
    # (makes the "speed-of-light" target falsifiable; see roofline_bytes)
    bytes_per_iter = roofline_bytes(batch, model.config)
    achieved_gbps = bytes_per_iter * n_iters / best / 1e9
    result = {
        **({"kernel_fallback": True} if kernel_fallback else {}),
        "metric": "edges/s per chip (batched graphs, E+F+S+M inference)",
        "value": round(edges_per_s, 1),
        "unit": "directed edges/s",
        "vs_baseline": round(edges_per_s / BASELINE_EDGES_PER_S, 4),
        "energy_only_edges_per_s": round(e_only_edges_per_s, 1),
        "roofline": {
            "stream_bytes_per_iter": bytes_per_iter,
            "achieved_gbps_floor": round(achieved_gbps, 2),
            "hbm_bound_gbps": HBM_GBPS,
            "fraction_of_bound": round(achieved_gbps / HBM_GBPS, 3),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
