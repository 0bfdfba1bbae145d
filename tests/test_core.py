"""Tests for the standalone structure core (Lattice/Structure/CIF)."""

from __future__ import annotations

import numpy as np
import pytest

from chgnet_tpu import ROOT
from chgnet_tpu.core.lattice import Lattice
from chgnet_tpu.core.structure import Structure


def test_lattice_roundtrip() -> None:
    lat = Lattice.from_parameters(3.0, 4.0, 5.0, 80.0, 95.0, 100.0)
    a, b, c, alpha, beta, gamma = lat.parameters
    assert (a, b, c) == pytest.approx((3.0, 4.0, 5.0))
    assert (alpha, beta, gamma) == pytest.approx((80.0, 95.0, 100.0))
    # frac <-> cart round trip
    frac = np.random.default_rng(0).random((5, 3))
    cart = lat.get_cartesian_coords(frac)
    assert lat.get_fractional_coords(cart) == pytest.approx(frac)


def test_lattice_volume_orthorhombic() -> None:
    lat = Lattice(np.diag([2.0, 3.0, 4.0]))
    assert lat.volume == pytest.approx(24.0)
    assert lat.plane_spacings == pytest.approx([2.0, 3.0, 4.0])


def test_cif_parse_limno2(li_mn_o2: Structure) -> None:
    assert li_mn_o2.formula == "Li2 Mn2 O4"
    assert len(li_mn_o2) == 8
    assert li_mn_o2.atomic_numbers.tolist() == [3, 3, 25, 25, 8, 8, 8, 8]
    assert li_mn_o2.volume == pytest.approx(77.54484024, abs=1e-5)
    assert li_mn_o2.lattice.lengths == pytest.approx(
        [2.868779, 4.634475, 5.832507], abs=1e-6
    )


def test_cif_write_read_roundtrip(li_mn_o2: Structure, tmp_path) -> None:
    path = str(tmp_path / "out.cif")
    li_mn_o2.to(path)
    back = Structure.from_file(path)
    assert back.formula == li_mn_o2.formula
    assert back.frac_coords == pytest.approx(li_mn_o2.frac_coords, abs=1e-6)
    assert back.lattice.matrix == pytest.approx(li_mn_o2.lattice.matrix, abs=1e-5)


def test_structure_dict_roundtrip(li_mn_o2: Structure) -> None:
    dct = li_mn_o2.as_dict()
    back = Structure.from_dict(dct)
    assert back.atomic_numbers.tolist() == li_mn_o2.atomic_numbers.tolist()
    assert back.frac_coords == pytest.approx(li_mn_o2.frac_coords)


def test_supercell(li_mn_o2: Structure) -> None:
    sc = li_mn_o2.make_supercell([2, 3, 4])
    assert len(sc) == 8 * 24
    assert sc.volume == pytest.approx(li_mn_o2.volume * 24)
    assert sc.formula == "Li48 Mn48 O96"


def test_perturb(li_mn_o2: Structure) -> None:
    pert = li_mn_o2.perturb(0.1, seed=42)
    disp = (pert.frac_coords - li_mn_o2.frac_coords) @ li_mn_o2.lattice.matrix
    assert np.linalg.norm(disp, axis=1) == pytest.approx(np.full(8, 0.1))


def test_apply_strain(li_mn_o2: Structure) -> None:
    strained = li_mn_o2.apply_strain(0.01)
    assert strained.volume == pytest.approx(li_mn_o2.volume * 1.01**3)
    aniso = li_mn_o2.apply_strain([0.01, 0.0, 0.0])
    assert aniso.lattice.lengths[0] == pytest.approx(
        li_mn_o2.lattice.lengths[0] * 1.01
    )


def test_site_properties(li_mn_o2: Structure) -> None:
    struct = li_mn_o2.copy()
    struct.site_properties["magmom"] = [0.0] * 8
    dup = struct.copy()
    assert dup.site_properties["magmom"] == [0.0] * 8
    with pytest.raises(ValueError, match="wrong length"):
        Structure(
            struct.lattice,
            struct.atomic_numbers.tolist(),
            struct.frac_coords,
            site_properties={"magmom": [0.0]},
        )


def test_masses(li_mn_o2: Structure) -> None:
    masses = li_mn_o2.masses
    assert masses[0] == pytest.approx(6.94)  # Li
    assert masses[2] == pytest.approx(54.938)  # Mn
    assert masses[4] == pytest.approx(15.999)  # O


def test_spatial_sort_is_a_permutation():
    """Morton reorder: same sites (as a set), per-site properties follow,
    and the order actually changes for a site-major supercell."""
    s = Structure.from_file(f"{ROOT}/examples/mp-18767-LiMnO2.cif")
    s = s.make_supercell((4, 3, 2))
    s.site_properties["tag"] = list(range(len(s)))
    zs = s.spatial_sort()
    assert len(zs) == len(s)
    tags = np.asarray(zs.site_properties["tag"])
    assert sorted(tags.tolist()) == list(range(len(s)))
    assert not np.array_equal(tags, np.arange(len(s)))  # actually moved
    np.testing.assert_allclose(
        zs.frac_coords, s.frac_coords[tags], atol=0
    )
    assert (np.asarray(zs.atomic_numbers)
            == np.asarray(s.atomic_numbers)[tags]).all()
