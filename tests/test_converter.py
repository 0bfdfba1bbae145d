"""Converter behavior tests (counterpart of reference ``tests/test_converter.py``):
cutoffs, algorithm fallback, isolated-atom policy."""

from __future__ import annotations

import numpy as np
import pytest

from chgnet_tpu import ROOT
from chgnet_tpu.core.lattice import Lattice
from chgnet_tpu.core.structure import Structure
from chgnet_tpu.graph.converter import CrystalGraphConverter


@pytest.fixture
def li_mn_o2():
    return Structure.from_file(f"{ROOT}/examples/mp-18767-LiMnO2.cif")


@pytest.mark.parametrize(
    ("atom_cutoff", "bond_cutoff"), [(5, 3), (6, 3), (5, 0.5), (6, 6)]
)
def test_cutoff_handling(li_mn_o2, atom_cutoff, bond_cutoff):
    converter = CrystalGraphConverter(
        atom_graph_cutoff=atom_cutoff, bond_graph_cutoff=bond_cutoff
    )
    graph = converter(li_mn_o2)
    assert graph.n_directed == 2 * graph.n_undirected
    if bond_cutoff < 1:
        assert graph.n_angles == 0  # no bonds short enough for angles


def test_bond_graph_cutoff_none_defaults_to_atom(li_mn_o2):
    converter = CrystalGraphConverter(
        atom_graph_cutoff=5, bond_graph_cutoff=None
    )
    assert converter.bond_graph_cutoff == 5


def test_unknown_algorithm_warns(li_mn_o2):
    with pytest.warns(UserWarning, match="Unknown"):
        converter = CrystalGraphConverter(
            atom_graph_cutoff=5, bond_graph_cutoff=3, algorithm="bogus"
        )
    assert converter.algorithm == "numpy"


def test_fast_fallback_when_unavailable(monkeypatch, li_mn_o2):
    """When the native builder is unavailable the converter warns and
    falls back to numpy — like the reference's monkeypatched
    ``make_graph=None`` fixture (``test_converter.py:20-28``)."""
    import chgnet_tpu.graph.converter as conv_mod

    monkeypatch.setattr(conv_mod, "_FAST_AVAILABLE", False)
    with pytest.warns(UserWarning, match="not available"):
        converter = CrystalGraphConverter(
            atom_graph_cutoff=5, bond_graph_cutoff=3, algorithm="fast"
        )
    assert converter.algorithm == "numpy"
    graph = converter(li_mn_o2)
    assert graph.n_directed == 384


@pytest.mark.parametrize("on_isolated_atoms", ["ignore", "warn", "error"])
def test_isolated_atom_policy(on_isolated_atoms, capsys):
    """Reference behavior (``converter.py:161-174`` /
    ``test_converter.py:66-99``): error raises, warn prints to stderr,
    ignore passes silently."""
    isolated = Structure(
        Lattice.cubic(20), ["Na", "Cl"], [[0, 0, 0], [0.05, 0, 0]]
    )  # the pair bonds to itself but a 3rd distant atom is isolated
    far = Structure(
        Lattice.cubic(30),
        ["Na", "Cl", "He"],
        [[0, 0, 0], [0.02, 0, 0], [0.5, 0.5, 0.5]],
    )
    converter = CrystalGraphConverter(
        atom_graph_cutoff=6,
        bond_graph_cutoff=3,
        on_isolated_atoms=on_isolated_atoms,
    )
    if on_isolated_atoms == "error":
        with pytest.raises(ValueError, match="isolated atom"):
            converter(far)
    else:
        graph = converter(far)
        assert graph.num_isolated_atoms == 1
        err = capsys.readouterr().err
        if on_isolated_atoms == "warn":
            assert "isolated atom" in err
        else:
            assert "isolated atom" not in err
    # setter mirrors the reference API
    converter.set_isolated_atom_response("ignore")
    assert converter.on_isolated_atoms == "ignore"


def test_as_dict_round_trip():
    converter = CrystalGraphConverter(
        atom_graph_cutoff=5.5, bond_graph_cutoff=2.5, algorithm="numpy"
    )
    clone = CrystalGraphConverter.from_dict(converter.as_dict())
    assert clone.atom_graph_cutoff == 5.5
    assert clone.bond_graph_cutoff == 2.5
    assert clone.algorithm == "numpy"
