"""Directed-native bond representation (CHGNetConfig.directed_bonds).

Bond features/weights live on the directed edge stream, twin-duplicated;
BondConv reduces per bond as ``partial + partial[twin]`` through one
involution gather. These tests pin (1) the twin stream's invariants,
(2) equality with the undirected reference layout to float rounding for
every output head, (3) exact-zero padding contributions, and (4) the
involution gather's first- and second-order transposes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chgnet_tpu import ROOT
from chgnet_tpu.core.structure import Structure
from chgnet_tpu.graph.batching import batch_graphs
from chgnet_tpu.graph.converter import CrystalGraphConverter
from chgnet_tpu.models.chgnet import CHGNet, compute_batch
from chgnet_tpu.ops.scatter import involution_gather


@pytest.fixture(scope="module")
def structs():
    s = Structure.from_file(f"{ROOT}/examples/mp-18767-LiMnO2.cif")
    return [s, s.make_supercell((2, 1, 1))]


@pytest.fixture(scope="module")
def batch(structs):
    conv = CrystalGraphConverter(atom_graph_cutoff=6.0, bond_graph_cutoff=3.0)
    return batch_graphs([conv(s) for s in structs])


def test_twin_invariants(batch):
    tw = np.asarray(batch.twin)
    E = tw.shape[0]
    assert tw.dtype == np.int32
    # involution over the WHOLE padded stream (padding maps to self)
    assert (tw[tw] == np.arange(E)).all()
    valid = np.asarray(batch.edge_mask) > 0
    idx = np.nonzero(valid)[0]
    d2u = np.asarray(batch.directed2undirected)
    # twin stays within the same undirected bond and never fixes a
    # valid edge (every bond has exactly two directed edges)
    assert (d2u[tw[idx]] == d2u[idx]).all()
    assert (tw[idx] != idx).all()
    # consistent with the undirected maps: {e, twin[e]} == {first, second}
    u2d = np.asarray(batch.undirected2directed)
    second = np.asarray(batch.und_second)
    assert (tw[u2d[np.asarray(batch.und_mask) > 0]]
            == second[np.asarray(batch.und_mask) > 0]).all()
    # padding is the identity
    assert (tw[~valid] == np.nonzero(~valid)[0]).all()


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_directed_matches_undirected(batch, dtype):
    kw = dict(compute_force=True, compute_stress=True, compute_magmom=True)
    out = {}
    for directed in (True, False):
        m = CHGNet(seed=0, directed_bonds=directed, compute_dtype=dtype)
        out[directed] = compute_batch(m.params, batch, config=m.config, **kw)
    # bf16: the directed path's atom-fold (the angle-side atom part
    # riding the dir_i gather, round 5) reorders bf16 summation vs the
    # undirected path; f32 agreement stays at 1e-5, bf16 site values
    # drift up to ~6e-3 on magmoms (was 5e-3 before the fold)
    tol = 1e-5 if dtype == "float32" else 8e-3
    for k in ("e", "f", "s", "m"):
        np.testing.assert_allclose(
            np.asarray(out[True][k], np.float32),
            np.asarray(out[False][k], np.float32),
            atol=tol,
            err_msg=k,
        )


def test_padding_invariance(structs):
    """Growing every capacity must not change any output (padded edges
    and their twin rows contribute exactly zero)."""
    conv = CrystalGraphConverter(atom_graph_cutoff=6.0, bond_graph_cutoff=3.0)
    graphs = [conv(s) for s in structs]
    tight = batch_graphs(graphs, bucket=False)
    n, e, a = (
        tight.atomic_numbers.shape[0],
        tight.atom_graph.shape[0],
        tight.bond_graph.shape[0],
    )
    loose = batch_graphs(graphs, capacities=(n + 13, e + 130, a + 70))
    m = CHGNet(seed=0, directed_bonds=True)
    kw = dict(compute_force=True, compute_stress=True, compute_magmom=True)
    o1 = compute_batch(m.params, tight, config=m.config, **kw)
    o2 = compute_batch(m.params, loose, config=m.config, **kw)
    n_atoms = sum(len(s) for s in structs)
    np.testing.assert_allclose(
        np.asarray(o1["e"]), np.asarray(o2["e"]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(o1["f"])[:n_atoms], np.asarray(o2["f"])[:n_atoms], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(o1["s"]), np.asarray(o2["s"]), atol=1e-6
    )


def test_involution_gather_grads():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 4)), jnp.float32)
    inv = jnp.asarray([1, 0, 3, 2, 5, 4, 7, 6], jnp.int32)

    def f(x):
        return (involution_gather(x, inv) ** 2).sum()

    def f_ref(x):
        return (x[inv] ** 2).sum()

    np.testing.assert_allclose(jax.grad(f)(x), jax.grad(f_ref)(x), atol=1e-6)
    # second order (the force-loss training path differentiates the vjp)
    def g(x):
        return (jax.grad(f)(x) ** 3).sum()

    def g_ref(x):
        return (jax.grad(f_ref)(x) ** 3).sum()

    np.testing.assert_allclose(jax.grad(g)(x), jax.grad(g_ref)(x), atol=1e-5)


def test_directed_training_grads_match(batch):
    """Full train-style grad (energy + force loss) agrees between the
    layouts — guards the involution gather's transposes inside
    grad-of-grad."""
    kw = dict(compute_force=True, compute_stress=False, compute_magmom=False)
    grads = {}
    for directed in (True, False):
        m = CHGNet(seed=0, directed_bonds=directed)

        def loss(p):
            out = compute_batch(p, batch, config=m.config, **kw)
            return (out["e"] ** 2).sum() + (out["f"] ** 2).sum()

        grads[directed] = jax.grad(loss)(m.params)
    flat_t = jax.tree.leaves(grads[True])
    flat_f = jax.tree.leaves(grads[False])
    for a, b in zip(flat_t, flat_f):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )
