"""Dataset/loader tests (counterpart of reference ``tests/test_dataset.py``)."""

from __future__ import annotations

import numpy as np
import pytest

from chgnet_tpu.core.lattice import Lattice
from chgnet_tpu.core.structure import Structure
from chgnet_tpu.data import (
    GraphData,
    StructureData,
    StructureJsonData,
    collate_padded,
    get_train_val_test_loader,
)
from chgnet_tpu.data.dataset import make_graphs
from chgnet_tpu.graph.batching import GraphBatch
from chgnet_tpu.graph.crystalgraph import CrystalGraph

NaCl = Structure(
    Lattice.cubic(4), ["Na", "Cl"], [[0, 0, 0], [0.5, 0.5, 0.5]]
)


@pytest.fixture
def structure_data() -> StructureData:
    rng = np.random.default_rng(42)
    structures, energies, forces = [], [], []
    stresses, magmoms, structure_ids = [], [], []
    for index in range(50):
        structures.append(NaCl.perturb(0.1, seed=index))
        energies.append(float(rng.random()))
        forces.append(rng.random((2, 3)))
        stresses.append(rng.random((3, 3)))
        magmoms.append(rng.random((2, 1)))
        structure_ids.append(index)
    return StructureData(
        structures=structures,
        energies=energies,
        forces=forces,
        stresses=stresses,
        magmoms=magmoms,
        structure_ids=structure_ids,
    )


def test_structure_data(structure_data):
    graph, targets = structure_data[0]
    assert isinstance(graph, CrystalGraph)
    assert set(targets) == {"e", "f", "s", "m"}
    assert targets["f"].shape == (2, 3)
    assert targets["s"].shape == (3, 3)
    assert targets["m"].shape == (2,)
    # stress scaled by -0.1 on ingest (VASP -> model convention)
    raw = structure_data.stresses[int(structure_data.keys[0])]
    np.testing.assert_allclose(targets["s"], np.asarray(raw) * -0.1, rtol=1e-6)


def test_structure_data_inconsistent_lengths():
    with pytest.raises(RuntimeError, match="Inconsistent number"):
        StructureData(
            structures=[NaCl],
            energies=[1.0, 2.0],
            forces=[np.zeros((2, 3))],
        )


def test_structure_data_caches_and_resamples():
    # a structure that fails conversion (single atom, isolated at 6 A)
    good = [NaCl.perturb(0.05, seed=i) for i in range(4)]
    iso = Structure(Lattice.cubic(20), ["Na"], [[0, 0, 0]])
    data = StructureData(
        structures=[*good, iso],
        energies=[0.0] * 5,
        forces=[np.zeros((len(s), 3)) for s in [*good, iso]],
        shuffle=False,
    )
    for idx in range(len(data)):
        graph, _ = data[idx]
        assert isinstance(graph, CrystalGraph)
    # isolated atom got resampled (possibly repeatedly if the random
    # resample hits the bad index again, like the reference)
    assert set(data.failed_idx) == {4}


def test_collate_padded(structure_data):
    items = [structure_data[i] for i in range(4)]
    batch, targets = collate_padded(items, n_graphs_cap=6)
    assert isinstance(batch, GraphBatch)
    assert batch.n_graphs == 6
    assert targets["graph_mask"].sum() == 4
    assert targets["e"].shape == (6,)
    assert np.isnan(targets["e"][4:]).all()
    assert targets["f"].shape == (batch.n_atoms_padded, 3)
    assert targets["s"].shape == (6, 3, 3)
    # force rows beyond the real atoms are NaN (filler + padding)
    n_real = sum(items[i][0].n_atoms for i in range(4))
    assert not np.isnan(targets["f"][:n_real]).any()


def test_loaders(structure_data):
    train_loader, val_loader, test_loader = get_train_val_test_loader(
        structure_data, batch_size=8, train_ratio=0.8, val_ratio=0.1
    )
    assert len(train_loader) == 5
    assert len(val_loader) == len(test_loader) == 1
    batch, targets = next(iter(train_loader))
    assert batch.n_graphs == 8
    assert targets["e"].shape == (8,)
    # determinism of split sizes
    n_total = sum(
        len(ldr.indices) for ldr in (train_loader, val_loader, test_loader)
    )
    assert n_total == len(structure_data)


def test_loader_fixed_capacities(structure_data):
    from chgnet_tpu.data import GraphLoader

    loader = GraphLoader(
        structure_data,
        batch_size=4,
        capacities=(64, 2048, 4096),
        shuffle=False,
    )
    shapes = set()
    for batch, _ in loader:
        shapes.add((batch.n_atoms_padded, batch.atom_graph.shape[0]))
    assert shapes == {(64, 2048)}


def test_graph_data_roundtrip(tmp_path, structure_data):
    """make_graphs -> GraphData -> loaders, with mp-id partitioning."""
    sub = StructureData(
        structures=[NaCl.perturb(0.05, seed=i) for i in range(10)],
        energies=[float(i) for i in range(10)],
        forces=[np.zeros((2, 3)) for _ in range(10)],
        magmoms=[np.ones(2) for _ in range(10)],
        structure_ids=[f"mp-{i % 3}" for i in range(10)],
        shuffle=False,
    )
    graph_dir = str(tmp_path / "graphs")
    make_graphs(sub, graph_dir)
    gdata = GraphData(graph_dir, shuffle=False)
    assert len(gdata) == 10
    graph, targets = gdata[0]
    assert isinstance(graph, CrystalGraph)
    assert targets["m"].shape == (2,)
    train_l, val_l, test_l = gdata.get_train_val_test_loader(
        train_ratio=0.34, val_ratio=0.33, batch_size=4
    )
    # mp-id level split: all graphs of one mp-id in the same partition
    train_ids = {gdata.keys[int(i)][0] for i in train_l.indices}
    val_ids = {gdata.keys[int(i)][0] for i in val_l.indices}
    test_ids = {gdata.keys[int(i)][0] for i in test_l.indices}
    assert not (train_ids & val_ids)
    assert not (train_ids & test_ids)
    assert not (val_ids & test_ids)


def test_structure_json_data(tmp_path):
    data = {
        "mp-1": {
            "mp-1-0": {
                "structure": NaCl.as_dict(),
                "energy_per_atom": -3.0,
                "force": np.zeros((2, 3)).tolist(),
                "stress": np.eye(3).tolist(),
                "magmom": [0.1, 0.2],
            }
        },
        "mp-2": {
            "mp-2-0": {
                "structure": NaCl.perturb(0.1, seed=1).as_dict(),
                "energy_per_atom": -2.5,
                "force": np.ones((2, 3)).tolist(),
                "stress": None,
                "magmom": None,
            }
        },
    }
    dataset = StructureJsonData(data, shuffle=False)
    assert len(dataset) == 2
    graph, targets = dataset[0]
    assert targets["e"] == pytest.approx(-3.0)
    _, targets2 = dataset[1]
    assert np.isnan(targets2["m"]).all()  # missing magmom -> NaN labels


def test_cif_data(tmp_path):
    """CIFData: directory of CIFs + labels.json (``dataset.py:197-308``)."""
    from chgnet_tpu.data import CIFData
    from chgnet_tpu.utils import write_json

    labels = {}
    for idx in range(4):
        struct = NaCl.perturb(0.05, seed=idx)
        struct.to(str(tmp_path / f"nacl-{idx}.cif"))
        labels[f"nacl-{idx}"] = {
            "energy_per_atom": -3.0 + 0.1 * idx,
            "force": np.zeros((2, 3)).tolist(),
            "stress": np.eye(3).tolist(),
            "magmom": [0.1, 0.2],
        }
    write_json(labels, str(tmp_path / "labels.json"))

    dataset = CIFData(str(tmp_path), shuffle=False)
    assert len(dataset) == 4
    graph, targets = dataset[0]
    assert isinstance(graph, CrystalGraph)
    assert set(targets) == {"e", "f", "s", "m"}
    assert targets["e"] == pytest.approx(-3.0)
    np.testing.assert_allclose(targets["s"], np.eye(3) * -0.1, atol=1e-7)


def test_loader_remainder_batch(structure_data):
    """Non-divisible splits: the trailing short batch pads with filler
    graphs; capacities must cover them (regression)."""
    from chgnet_tpu.data import GraphLoader

    loader = GraphLoader(
        structure_data, indices=np.arange(9), batch_size=8, shuffle=False
    )
    batches = list(loader)
    assert len(batches) == 2
    batch, targets = batches[1]  # 1 real graph + 7 fillers
    assert batch.n_graphs == 8
    assert targets["graph_mask"].sum() == 1
