"""Halo-tiled neighbor layout (graph/batching.py _build_halo_tiles):
exactness of the expanded map, plan quality, and model equivalence."""

from __future__ import annotations

import functools as ft

import numpy as np

import jax

from chgnet_tpu import ROOT
from chgnet_tpu.core.structure import Structure
from chgnet_tpu.graph.batching import batch_graphs
from chgnet_tpu.models.chgnet import CHGNet, compute_batch
from chgnet_tpu.ops import stream_ops as so


def _model_and_graph(n=(4, 3, 3)):
    model = CHGNet(seed=0)
    s = Structure.from_file(
        f"{ROOT}/examples/mp-18767-LiMnO2.cif"
    ).make_supercell(n).perturb(0.03, seed=0).spatial_sort()
    return model, model.graph_converter(s)


def test_halo_map_exact_and_window_local():
    model, g = _model_and_graph()
    b = batch_graphs([g], tile=64)
    valid = np.asarray(b.edge_mask) > 0
    # the expansion restates the neighbor stream row for row
    assert (
        np.asarray(b.exp_map)[np.asarray(b.nbr_x)][valid]
        == np.asarray(b.atom_graph)[valid, 1]
    ).all()
    # nbr_x must carry a streaming window (the whole point)
    assert b.plan_nbr_x.g_lo.shape[0] > 0
    # and the expansion must be plan-covered for its backward
    assert b.plan_exp.dst.shape[0] > 0


def test_tiled_model_matches_untiled():
    model, g = _model_and_graph()
    b0 = batch_graphs([g])
    b1 = batch_graphs([g], tile=64)
    kw = dict(
        config=model.config, compute_force=True, compute_stress=True,
        compute_magmom=True,
    )
    r0 = compute_batch(model.params, b0, **kw)
    r1 = compute_batch(model.params, b1, **kw)
    for k, atol in (("e", 1e-6), ("f", 5e-5), ("s", 5e-5), ("m", 1e-6)):
        np.testing.assert_allclose(
            np.asarray(r0[k]), np.asarray(r1[k]), atol=atol, err_msg=k
        )


def test_tiled_md_runtime_rebuilds(monkeypatch):
    """GraphRuntime(tile=) survives async rebuilds with stable shapes."""
    from chgnet_tpu.simulation import MolecularDynamics

    monkeypatch.setenv("CHGNET_TPU_MD_TILE", "64")
    model = CHGNet(seed=0)
    s = Structure.from_file(
        f"{ROOT}/examples/mp-18767-LiMnO2.cif"
    ).make_supercell(2).perturb(0.02, seed=0).spatial_sort()
    md = MolecularDynamics(
        s, model=model, ensemble="nvt", thermostat="Berendsen",
        temperature=300.0, starting_temperature=300.0, timestep=1.0,
        seed=0, chunk_size=4, skin=0.2,
    )
    assert md.runtime.tile == 64
    assert md.runtime.batch.nbr_x.shape[0] > 0
    md.run(16)
    assert md.runtime.n_rebuilds >= 1
    assert md.runtime.batch.nbr_x.shape[0] > 0  # rebuilds stay tiled
    t = float(md.get_temperature())
    assert t == t and 0.0 < t < 1500.0


def test_tiled_kernel_path_matches(monkeypatch):
    """Tiled E+F with every kernel gate open (interpret) vs plain."""
    from chgnet_tpu.ops import gproj as gp

    model, g = _model_and_graph((2, 2, 2))
    b1 = batch_graphs([g], tile=64)
    kw = dict(config=model.config, compute_force=True)
    ref = jax.tree.map(
        np.asarray, compute_batch(model.params, b1, **kw)
    )
    monkeypatch.setattr(so, "tpu_backend", lambda: True)
    for mod, name in [
        (so, "_multi_gather_pallas"), (so, "_gather_pallas"),
        (so, "_segsum_pallas"), (so, "_segsum2_pallas"),
        (gp, "_gproj_pallas"),
    ]:
        monkeypatch.setattr(
            mod, name, ft.partial(getattr(mod, name), interpret=True)
        )
    jax.clear_caches()
    out = jax.tree.map(
        np.asarray, compute_batch(model.params, b1, **kw)
    )
    jax.clear_caches()
    for k, atol in (("e", 1e-5), ("f", 1e-4)):
        np.testing.assert_allclose(out[k], ref[k], atol=atol, err_msg=k)


def test_tile_expansion_probe(monkeypatch):
    """Round-5: the MD runtime stays untiled by default (the isolated
    E+F tile win did not survive the end-to-end MD loop), and an
    explicit tile= request is guarded by the first-build expansion
    probe, which falls back untiled (with a warning) for spatially
    dispersed atom orders."""
    import pytest

    from chgnet_tpu.models.chgnet import CHGNetConfig
    from chgnet_tpu.simulation import runtime as rt
    from chgnet_tpu.ops import stream_ops as so_mod

    monkeypatch.setattr(so_mod, "tpu_backend", lambda: True)

    base = Structure.from_file(f"{ROOT}/examples/mp-18767-LiMnO2.cif")
    big = base.make_supercell((8, 8, 8)).perturb(0.02, seed=0)  # 4096
    cfg = CHGNetConfig()

    # no auto-tiling: default stays untiled at any size
    plain_rt = rt.GraphRuntime(cfg, [big.spatial_sort()], skin=0.2)
    assert plain_rt.tile is False and plain_rt.batch.nbr_x.shape[0] == 0

    # explicit tile on a sorted structure: probe accepts
    sorted_rt = rt.GraphRuntime(cfg, [big.spatial_sort()], skin=0.2, tile=64)
    assert sorted_rt.tile == 64
    assert sorted_rt.batch.nbr_x.shape[0] > 0
    assert not sorted_rt._tile_probe  # probe ran on the first build

    # species-blocked supercell order: expansion probe falls back
    with pytest.warns(UserWarning, match="tiling disabled"):
        disp_rt = rt.GraphRuntime(cfg, [big], skin=0.2, tile=64)
    assert disp_rt.tile is False
    assert disp_rt.batch.nbr_x.shape[0] == 0
