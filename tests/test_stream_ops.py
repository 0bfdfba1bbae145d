"""Streaming segment-sum kernel: host-side block-plan logic (CPU-safe).

The Pallas kernel itself only runs on TPU (``stream_segsum_ok`` gates on
backend); its numerics are covered by the model-parity scripts and the
TPU bench. Here we pin the host planning: block plans must cover exactly
the rows each output block needs, and ``make_plan`` must pick the right
variant (sorted / block-local raw / permutation).
"""

from __future__ import annotations

import numpy as np

from chgnet_tpu.ops import stream_ops as so
from chgnet_tpu.ops.scatter import make_plan


def _check_cover(dst_sorted, blk_lo, blk_cnt, n_out):
    """Every row with dst < n_out lies inside its block's chunk range."""
    for j in range(len(blk_lo)):
        rows = np.nonzero(
            (dst_sorted >= j * so.BO)
            & (dst_sorted < min((j + 1) * so.BO, n_out))
        )[0]
        if rows.size == 0:
            assert blk_cnt[j] == 0
            continue
        lo, hi = blk_lo[j], blk_lo[j] + blk_cnt[j] * so.C
        assert lo <= rows.min() and rows.max() < hi
        assert lo % so.C == 0


def test_build_block_plan_sorted_covers_all_rows():
    rng = np.random.default_rng(0)
    n_out = 3 * so.BO - 17  # not a multiple of BO
    L = 8 * so.C
    dst = np.sort(rng.integers(0, n_out, L - 200)).astype(np.int32)
    dst = np.concatenate([dst, np.full(200, n_out, np.int32)])
    blk_lo, blk_cnt = so.build_block_plan(dst, n_out)
    assert blk_lo.shape == (-(-n_out // so.BO),)
    _check_cover(dst, blk_lo, blk_cnt, n_out)
    # padded tail rows are excluded from the last block's range
    last = np.searchsorted(dst, n_out, side="left")
    j = len(blk_lo) - 1
    assert blk_lo[j] + blk_cnt[j] * so.C <= -(-last // so.C) * so.C


def test_build_block_plan_local_covers_unsorted_rows():
    rng = np.random.default_rng(1)
    n_out = 2 * so.BO
    L = 6 * so.C
    key = np.where(
        rng.random(L) > 0.1, rng.integers(0, n_out, L), n_out
    ).astype(np.int32)
    perm = np.argsort(key, kind="stable").astype(np.int32)
    blk_lo, blk_cnt, visits = so.build_block_plan_local(key, perm, n_out)
    assert visits == int(blk_cnt.sum())
    for j in range(len(blk_lo)):
        rows = np.nonzero((key >= j * so.BO) & (key < (j + 1) * so.BO))[0]
        if rows.size == 0:
            assert blk_cnt[j] == 0
            continue
        lo, hi = blk_lo[j], blk_lo[j] + blk_cnt[j] * so.C
        assert lo <= rows.min() and rows.max() < hi


def test_build_block_plan_local_block_local_stream_is_cheap():
    """Graph-local stream: rows for each output block are contiguous, so
    the local plan's visit total stays near the sequential minimum."""
    n_out = 4 * so.BO
    L = 8 * so.C
    # rows sorted into 4 contiguous graph segments, dst within segment
    key = np.sort(
        (np.arange(L) * n_out // L)
        + np.random.default_rng(2).integers(-8, 9, L)
    ).clip(0, n_out - 1).astype(np.int32)
    perm = np.argsort(key, kind="stable").astype(np.int32)
    _, _, visits = so.build_block_plan_local(key, perm, n_out)
    assert visits <= 2 * (L // so.C)


def test_make_plan_variant_selection():
    rng = np.random.default_rng(3)
    L = 4 * so.C
    n = 600
    # block-local stream -> raw variant with a block plan
    local_idx = np.sort(rng.integers(0, n, L)).astype(np.int32)
    p = make_plan(local_idx, np.ones(L, bool), n)
    assert p.raw.shape == (L,) and p.blk_lo.shape[0] == -(-n // so.BO)
    # scattered stream over many blocks -> perm variant, sorted block plan
    n_big = 40 * so.BO
    scat_idx = rng.integers(0, n_big, L).astype(np.int32)
    p2 = make_plan(scat_idx, np.ones(L, bool), n_big)
    assert p2.raw.shape == (0,)
    assert p2.perm.shape == (L,)
    assert p2.blk_lo.shape[0] == -(-n_big // so.BO)
    # unaligned stream -> no block plan at all
    p3 = make_plan(scat_idx[: so.C + 5], np.ones(so.C + 5, bool), n_big)
    assert p3.blk_lo.shape == (0,)


def test_make_plan_sorted_variant_matches_scatter_ids():
    L = 2 * so.C
    idx = np.sort(np.random.default_rng(4).integers(0, 500, L)).astype(
        np.int32
    )
    valid = np.ones(L, bool)
    valid[-37:] = False
    idx[-37:] = 0  # padding gathers point at row 0; plan maps them to n
    plan = make_plan(idx, valid, 500, assume_sorted=False)
    # the sorted key stream ends with the dropped rows
    assert (plan.dst[-37:] == 500).all()


def test_batch_capacities_are_stream_aligned():
    from chgnet_tpu import ROOT
    from chgnet_tpu.core.structure import Structure
    from chgnet_tpu.graph.batching import batch_graphs
    from chgnet_tpu.graph.converter import CrystalGraphConverter

    struct = Structure.from_file(f"{ROOT}/examples/mp-18767-LiMnO2.cif")
    conv = CrystalGraphConverter(
        atom_graph_cutoff=6.0, bond_graph_cutoff=3.0
    )
    batch = batch_graphs([conv(struct)])
    assert batch.atom_graph.shape[0] % (2 * so.C) == 0
    assert batch.bond_graph.shape[0] % (2 * so.C) == 0
    assert batch.undirected2directed.shape[0] % so.C == 0
    # forward-scatter plans carry sorted block plans
    n_atoms = batch.atomic_numbers.shape[0]
    assert batch.plan_center.blk_lo.shape[0] == -(-n_atoms // so.BO)
    assert (batch.plan_center.dst == batch.edge_scatter).all()
    # directed angle layout: the sorted dir_i plan drives the BondConv
    # [A] -> [E] partial-sum, so its dst must equal angle_scatter_dir
    assert (batch.plan_ang_vi.dst == batch.angle_scatter_dir).all()
    # and angle rows must actually BE dir_i-sorted
    valid = batch.angle_mask > 0
    assert (np.diff(batch.angle_scatter_dir) >= 0).all()
    assert (batch.bond_graph[valid, 0]
            == batch.atom_graph[batch.bond_graph[valid, 2], 0]).all()


def _force_kernels(monkeypatch):
    """Open every streaming-kernel gate on CPU (pallas interpret mode)."""
    import functools as ft

    from chgnet_tpu.ops import gproj as gproj_mod

    monkeypatch.setattr(so, "tpu_backend", lambda: True)
    for name in (
        "_multi_gather_pallas", "_gather_pallas", "_segsum_pallas",
        "_segsum2_pallas",
        "_segsum_v2_pallas", "_gather_v2_pallas",
    ):
        monkeypatch.setattr(
            so, name, ft.partial(getattr(so, name), interpret=True)
        )
    monkeypatch.setattr(
        gproj_mod,
        "_gproj_pallas",
        ft.partial(gproj_mod._gproj_pallas, interpret=True),
    )


def test_segsum_gather_window_backward_second_order(monkeypatch):
    """The segment-sum backward's ct[dst] expansion rides the streaming
    window-gather kernel when the plan carries g_lo — and training takes
    grad-of-grad THROUGH that backward (force loss), so the whole chain
    must be twice-differentiable on the kernel path (round-3 advisor
    finding: the raw pallas gather had no transpose rule)."""
    import jax
    import jax.numpy as jnp

    _force_kernels(monkeypatch)
    rng = np.random.default_rng(7)
    n_out, L = 2 * so.BO, 2 * so.BO
    dst = np.sort(rng.integers(0, n_out, L - 64)).astype(np.int32)
    dst = np.concatenate([dst, np.full(64, n_out, np.int32)])  # padding
    blk_lo, blk_cnt = so.build_block_plan(dst, n_out)
    gw = so.build_gather_plan(
        np.minimum(dst, n_out - 1), dst < n_out, n_out
    )
    assert gw is not None
    g_lo, g_cnt, _ = gw
    x = jnp.asarray(rng.standard_normal((L, 64)), jnp.float32)
    args = (jnp.asarray(dst), jnp.asarray(blk_lo), jnp.asarray(blk_cnt))

    def energy(x, segsum):
        return (segsum(x) ** 2).sum()

    def force_loss(x, segsum):
        f = jax.grad(energy)(x, segsum)
        return (f ** 2).sum()

    kern = lambda v: so.segment_sum_sorted(
        v, *args, n_out, jnp.asarray(g_lo), jnp.asarray(g_cnt)
    )
    ref = lambda v: jax.ops.segment_sum(v, jnp.asarray(dst), n_out)
    np.testing.assert_allclose(
        energy(x, kern), energy(x, ref), rtol=1e-6)
    np.testing.assert_allclose(
        force_loss(x, kern), force_loss(x, ref), rtol=1e-5)
    g_k = jax.grad(force_loss)(x, kern)  # grad THROUGH the backward
    g_r = jax.grad(force_loss)(x, ref)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_r), atol=1e-4)


def test_gather_sum_one_window_plus_stream(monkeypatch):
    """K=1 windowed part + aligned stream — the directed-bond AtomConv
    shape — through the fused multi-gather kernel, values and both grad
    orders vs the plain XLA composition (round-3 advisor: this fast path
    had no coverage off-TPU)."""
    import jax
    import jax.numpy as jnp

    from chgnet_tpu.ops.scatter import gather_sum, make_plan

    _force_kernels(monkeypatch)
    rng = np.random.default_rng(8)
    n_src, L = 2 * so.C, 2 * so.BO
    idx = np.sort(rng.integers(0, n_src, L)).astype(np.int32)
    plan = make_plan(idx, np.ones(L, bool), n_src)
    assert plan.g_lo.shape[0] == L // so.BO  # window gate passed
    table = jnp.asarray(rng.standard_normal((n_src, 64)), jnp.float32)
    stream = jnp.asarray(rng.standard_normal((L, 64)), jnp.float32)
    jidx = jnp.asarray(idx)

    def fused(t, s):
        return gather_sum([(t, jidx, plan), (s, None, None)])

    def plain(t, s):
        return t[jidx] + s

    np.testing.assert_allclose(
        np.asarray(fused(table, stream)),
        np.asarray(plain(table, stream)),
        atol=1e-6,
    )

    def loss(f):
        return lambda t, s: (f(t, s) ** 2).sum()

    for g_f, g_p in zip(
        jax.grad(loss(fused), argnums=(0, 1))(table, stream),
        jax.grad(loss(plain), argnums=(0, 1))(table, stream),
    ):
        np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_p), atol=1e-4)

    def gradnorm(f):
        return lambda t, s: sum(
            (g ** 2).sum()
            for g in jax.grad(loss(f), argnums=(0, 1))(t, s)
        )

    for g_f, g_p in zip(
        jax.grad(gradnorm(fused), argnums=(0, 1))(table, stream),
        jax.grad(gradnorm(plain), argnums=(0, 1))(table, stream),
    ):
        np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_p), atol=1e-3)


def test_force_training_grad_of_grad_on_kernel_path(monkeypatch):
    """Gradient of a force loss w.r.t. params — the trainer's
    grad-of-grad — with every streaming-kernel gate forced open. This is
    the exact TPU trace the round-3 advisor proved fails (raw pallas in a
    custom-vjp fwd has no JVP rule); CPU-pinned tests can't see it
    without forcing the gates."""
    import jax
    import jax.numpy as jnp

    from chgnet_tpu import ROOT
    from chgnet_tpu.core.structure import Structure
    from chgnet_tpu.graph.batching import batch_graphs
    from chgnet_tpu.models.chgnet import CHGNet, compute_batch

    model = CHGNet(seed=0)
    struct = Structure.from_file(
        f"{ROOT}/examples/mp-18767-LiMnO2.cif"
    ).perturb(0.03, seed=0)
    batch = batch_graphs([model.graph_converter(struct)])
    f_target = jnp.zeros((batch.frac_coords.shape[0], 3), jnp.float32)

    def loss(params):
        out = compute_batch(
            params, batch, config=model.config, compute_force=True
        )
        return ((out["f"] - f_target) ** 2).mean() + out["e"].sum() ** 2

    g_ref = jax.grad(loss)(model.params)

    _force_kernels(monkeypatch)
    jax.clear_caches()
    g_kern = jax.grad(loss)(model.params)
    flat_r, _ = jax.tree_util.tree_flatten(g_ref)
    flat_k, _ = jax.tree_util.tree_flatten(g_kern)
    for a, b in zip(flat_r, flat_k):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4
        )


def test_full_model_kernel_path_matches_xla(monkeypatch):
    """E+F+S+M through the model with EVERY streaming-kernel gate forced
    open (pallas in interpret mode) must match the plain XLA path — the
    full integration guard for the kernels the real TPU runs, including
    the fused first-layer multi-gather (ops.scatter.gather_sum)."""
    import functools as ft

    import jax

    from chgnet_tpu import ROOT
    from chgnet_tpu.core.structure import Structure
    from chgnet_tpu.graph.batching import batch_graphs
    from chgnet_tpu.models.chgnet import CHGNet, compute_batch
    from chgnet_tpu.ops import stream_ops as so

    model = CHGNet(seed=0)
    struct = Structure.from_file(
        f"{ROOT}/examples/mp-18767-LiMnO2.cif"
    ).make_supercell(2).perturb(0.03, seed=0)
    batch = batch_graphs([model.graph_converter(struct)])

    def run():
        return compute_batch(
            model.params, batch, config=model.config,
            compute_force=True, compute_stress=True, compute_magmom=True,
        )

    ref = jax.tree.map(np.asarray, run())

    from chgnet_tpu.ops import gproj as gproj_mod

    monkeypatch.setattr(so, "tpu_backend", lambda: True)
    for name in (
        "_multi_gather_pallas", "_gather_pallas", "_segsum_pallas",
        "_segsum2_pallas",
        "_segsum_v2_pallas", "_gather_v2_pallas",
    ):
        monkeypatch.setattr(
            so, name, ft.partial(getattr(so, name), interpret=True)
        )
    monkeypatch.setattr(
        gproj_mod,
        "_gproj_pallas",
        ft.partial(gproj_mod._gproj_pallas, interpret=True),
    )
    jax.clear_caches()  # drop traces compiled with the gates closed
    out = jax.tree.map(np.asarray, run())
    for key, atol in (("e", 1e-5), ("f", 1e-4), ("s", 1e-4), ("m", 1e-5)):
        np.testing.assert_allclose(out[key], ref[key], atol=atol, err_msg=key)


def test_v2_kernels_match_references(monkeypatch):
    """Opt-in v2 kernels (input-stationary segsum, paired-window gather)
    against jnp references in interpret mode — sorted, raw-local, and
    narrow-stream shapes."""
    import functools as ft

    import jax
    import jax.numpy as jnp

    monkeypatch.setenv("CHGNET_TPU_STREAM_V2", "1")
    monkeypatch.setattr(so, "tpu_backend", lambda: True)
    for name in ("_segsum_v2_pallas", "_gather_v2_pallas"):
        monkeypatch.setattr(
            so, name, ft.partial(getattr(so, name), interpret=True)
        )
    rng = np.random.default_rng(21)
    n_out, L = 3 * so.BO, 4 * so.C
    for d in (32, 64, 128):
        x = jnp.asarray(rng.standard_normal((L, d)), jnp.float32)
        # sorted stream with padded tail
        dst = np.sort(rng.integers(0, n_out, L - 40)).astype(np.int32)
        dst = np.concatenate([dst, np.full(40, n_out, np.int32)])
        blk_lo, blk_cnt = so.build_block_plan(dst, n_out)
        out = so._segsum_v2_pallas(
            x, jnp.asarray(dst), jnp.asarray(blk_lo), jnp.asarray(blk_cnt),
            n_out=n_out,
        )
        ref = jax.ops.segment_sum(x, jnp.asarray(dst), n_out)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5, err_msg=f"d={d}"
        )
    # raw (unsorted block-local) stream through the public dispatch
    key = np.sort(rng.integers(0, n_out, L)).astype(np.int32)
    shuffle = rng.permutation(L // 8)
    key = key.reshape(-1, 8)[shuffle].reshape(-1)  # locally scrambled
    perm = np.argsort(key, kind="stable").astype(np.int32)
    blk_lo, blk_cnt, _ = so.build_block_plan_local(key, perm, n_out)
    x = jnp.asarray(rng.standard_normal((L, 64)), jnp.float32)
    out = so.segment_sum_sorted(
        x, jnp.asarray(key), jnp.asarray(blk_lo), jnp.asarray(blk_cnt),
        n_out, None, None, None, True,
    )
    ref = jax.ops.segment_sum(x, jnp.asarray(key), n_out)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # paired-window gather
    n_src = 4 * so.W
    idx = np.sort(rng.integers(0, n_src, L)).astype(np.int32)
    pw = so.build_pw_plan(idx, np.ones(L, bool), n_src)
    assert pw is not None
    src = jnp.asarray(rng.standard_normal((n_src, 64)), jnp.float32)
    out = so._gather_v2_pallas(src, jnp.asarray(idx), jnp.asarray(pw))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(src[jnp.asarray(idx)]), atol=0
    )
