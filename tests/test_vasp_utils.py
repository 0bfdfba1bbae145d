"""VASP parsing tests against the reference's zipped real VASP outputs
(read in place from the read-only reference mount; fixture data only)."""

from __future__ import annotations

import os
from zipfile import ZipFile

import numpy as np
import pytest

from chgnet_tpu.core.lattice import Lattice
from chgnet_tpu.core.structure import Structure
from chgnet_tpu.data import StructureData
from chgnet_tpu.utils import parse_vasp_dir, solve_charge_by_mag

REF_FILES = "/root/reference/tests/files"


@pytest.fixture(scope="module")
def vasp_dir_with_magmoms(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("vasp_mag")
    with ZipFile(f"{REF_FILES}/parse-vasp-with-magmoms.zip") as zip_ref:
        zip_ref.extractall(tmp)
    return os.path.join(tmp, "parse-vasp-with-magmoms")


@pytest.fixture(scope="module")
def vasp_dir_no_magmoms(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("vasp_nomag")
    with ZipFile(f"{REF_FILES}/parse-vasp-no-magmoms.zip") as zip_ref:
        zip_ref.extractall(tmp)
    return os.path.join(tmp, "parse-vasp-no-magmoms")


def test_parse_vasp_dir_with_magmoms(vasp_dir_with_magmoms, tmp_path):
    dataset_dict = parse_vasp_dir(
        vasp_dir_with_magmoms, save_path=f"{tmp_path}/tmp.json"
    )
    assert isinstance(dataset_dict, dict)
    assert len(dataset_dict["structure"]) > 0
    assert len(dataset_dict["uncorrected_total_energy"]) > 0
    assert len(dataset_dict["energy_per_atom"]) > 0
    assert len(dataset_dict["force"]) > 0
    assert len(dataset_dict["magmom"]) == len(dataset_dict["force"])
    assert len(dataset_dict["stress"]) > 0
    for structure in dataset_dict["structure"]:
        assert isinstance(structure, Structure)
    n_sites = len(dataset_dict["structure"][0])
    for magmom, force in zip(dataset_dict["magmom"], dataset_dict["force"]):
        assert len(magmom) == n_sites
        assert np.asarray(force).shape == (n_sites, 3)
    # energies consistent
    for e_tot, e_atom in zip(
        dataset_dict["uncorrected_total_energy"],
        dataset_dict["energy_per_atom"],
    ):
        assert e_atom == pytest.approx(e_tot / n_sites)
    assert os.path.isfile(f"{tmp_path}/tmp.json")


def test_parse_vasp_dir_without_magmoms(vasp_dir_no_magmoms):
    dataset_dict = parse_vasp_dir(vasp_dir_no_magmoms)
    assert len(dataset_dict["structure"]) > 0
    assert len(dataset_dict["force"]) > 0
    assert len(dataset_dict["stress"]) > 0


def test_parse_vasp_dir_no_data(tmp_path):
    with pytest.raises(NotADirectoryError, match="is not a directory"):
        parse_vasp_dir(f"{tmp_path}/non-existent")
    with pytest.raises(RuntimeError, match="No data parsed from"):
        parse_vasp_dir(str(tmp_path))


def test_dataset_from_vasp(vasp_dir_with_magmoms):
    dataset = StructureData.from_vasp(vasp_dir_with_magmoms)
    assert len(dataset.structures) > 0
    assert isinstance(dataset.structures[0], Structure)
    assert len(dataset.structures) == len(dataset.energies)
    assert len(dataset.structures) == len(dataset.forces)
    assert len(dataset.structures) == len(dataset.stresses)
    assert len(dataset.structures) == len(dataset.magmoms)
    graph, targets = dataset[0]
    assert set(targets) == {"e", "f", "s", "m"}


def test_solve_charge_by_mag():
    struct = Structure(
        Lattice.cubic(8),
        ["Li", "Mn", "Mn", "O", "O", "O"],
        np.random.default_rng(0).random((6, 3)),
        site_properties={"magmom": [0.0, 3.1, 0.9, 0.05, 0.05, 0.02]},
    )
    decorated = solve_charge_by_mag(struct)
    assert decorated is not None
    assert decorated.site_properties["oxidation_state"] == [1, 4, 2, -2, -2, -2]

    # unsolvable: element with no default and no range
    bad = Structure(
        Lattice.cubic(8),
        ["Xe"],
        [[0, 0, 0]],
        site_properties={"magmom": [0.0]},
    )
    with pytest.warns(UserWarning, match="Failed to solve"):
        assert solve_charge_by_mag(bad) is None
