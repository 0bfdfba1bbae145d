"""Pinned fixed-seed MD / relaxation traces (integrator regression guard).

Analog of the reference's golden MD logs (``/root/reference/tests/
test_md.py:55-266``: 30-step energy/temperature traces per ensemble at
rtol 2e-3). The reference pins traces of its pretrained model; the
checkpoint blobs are absent from this environment, so these goldens were
generated from the seed-0 SMALL model on this codebase and guard the
INTEGRATORS: any refactor of the Verlet/Nose-Hoover/Berendsen/MTK update
equations, the skin-reuse runtime, or the force path that changes
trajectories beyond float jitter fails here, the way
``test_self_golden_regression`` guards the model forward.

Tolerance rtol 2e-3 (same as the reference) absorbs platform/compiler
float differences; 30 chaotic MD steps stay well inside it.
"""

from __future__ import annotations

import numpy as np
import pytest

from chgnet_tpu import ROOT
from chgnet_tpu.core.structure import Structure
from chgnet_tpu.models.chgnet import CHGNet
from chgnet_tpu.simulation import MolecularDynamics, StructOptimizer

SMALL = dict(
    atom_fea_dim=16,
    bond_fea_dim=16,
    angle_fea_dim=16,
    num_radial=9,
    num_angular=9,
    n_conv=2,
    mlp_hidden_dims=(16,),
    atom_conv_hidden_dim=16,
    bond_conv_hidden_dim=16,
)

# (ensemble, thermostat) -> (epot [eV] every 3rd step, T [K] every 3rd step)
GOLDEN_MD = {
    ("nve", "Berendsen_inhomogeneous"): (
        [-56.184486, -56.180012, -56.174957, -56.169758, -56.16481,
         -56.160439, -56.156845, -56.154091, -56.152088, -56.150677],
        [296.647, 292.322, 287.44, 282.414, 277.63,
         273.404, 269.933, 267.268, 265.329, 263.96],
    ),
    ("nvt", "Nose-Hoover"): (
        [-56.184486, -56.180012, -56.174957, -56.16975, -56.164783,
         -56.160389, -56.156765, -56.153969, -56.151913, -56.150433],
        [296.662, 292.447, 287.882, 283.496, 279.78,
         277.138, 275.835, 275.963, 277.449, 280.12],
    ),
    ("nvt", "Berendsen"): (
        [-56.184486, -56.180008, -56.174942, -56.169716, -56.164722,
         -56.160297, -56.156651, -56.153831, -56.151756, -56.150261],
        [296.897, 293.257, 289.518, 286.069, 283.23,
         281.224, 280.141, 279.923, 280.391, 281.321],
    ),
    ("npt", "Nose-Hoover"): (
        [-56.184483, -56.17997, -56.174812, -56.169403, -56.164101,
         -56.159153, -56.154625, -56.150364, -56.146065, -56.141438],
        [296.314, 291.265, 285.435, 279.417, 273.761,
         268.907, 265.118, 262.455, 260.838, 260.175],
    ),
    ("npt", "Nose-Hoover-full"): (
        [-56.184509, -56.18013, -56.175278, -56.170406, -56.165932,
         -56.162174, -56.159309, -56.157307, -56.155941, -56.154919],
        [296.433, 291.665, 286.251, 280.753, 275.69,
         271.484, 268.398, 266.502, 265.706, 265.858],
    ),
    ("npt", "Berendsen"): (
        [-56.184486, -56.180004, -56.174934, -56.169704, -56.164707,
         -56.160275, -56.156616, -56.153786, -56.151691, -56.150173],
        [296.897, 293.256, 289.516, 286.065, 283.224,
         281.215, 280.129, 279.905, 280.364, 281.282],
    ),
}

GOLDEN_FIRE = [
    -56.177689, -56.177723, -56.177792, -56.177895, -56.178032,
    -56.178207, -56.178413, -56.178654, -56.178955, -56.17934,
    -56.179817, -56.180412, -56.181145, -56.182045, -56.18314,
    -56.184471, -56.186077, -56.187992, -56.190266, -56.192936,
    -56.196037, -56.199589, -56.203587, -56.208008, -56.212807,
]


@pytest.fixture(scope="module")
def model():
    return CHGNet(seed=0, **SMALL)


@pytest.fixture(scope="module")
def struct():
    return Structure.from_file(f"{ROOT}/examples/mp-18767-LiMnO2.cif")


@pytest.mark.parametrize(("ensemble", "thermostat"), sorted(GOLDEN_MD))
def test_md_golden_trace(model, struct, ensemble, thermostat):
    md = MolecularDynamics(
        struct,
        model=model,
        ensemble=ensemble,
        thermostat=thermostat,
        temperature=300.0,
        starting_temperature=300.0,
        timestep=2.0,
        taut=50.0,
        taup=200.0,
        pressure=0.0,
        bulk_modulus=100.0,
        seed=0,
    )
    es, ts = [], []
    for _ in range(10):
        md.run(3)
        es.append(float(md.state.epot[0]))
        ts.append(float(md.get_temperature()))
    want_e, want_t = GOLDEN_MD[(ensemble, thermostat)]
    np.testing.assert_allclose(es, want_e, rtol=2e-3)
    np.testing.assert_allclose(ts, want_t, rtol=2e-3)


def test_nve_ignores_thermostat_choice(model, struct):
    """ensemble='nve' is plain velocity Verlet: the thermostat argument
    must be inert (a Nose-Hoover friction term sneaking into NVE was a
    real regression caught while pinning these traces)."""
    def run(thermostat):
        md = MolecularDynamics(
            struct, model=model, ensemble="nve", thermostat=thermostat,
            temperature=300.0, starting_temperature=300.0, timestep=2.0,
            seed=0,
        )
        md.run(10)
        return np.asarray(md.state.epot), np.asarray(md.state.vel)

    e_b, v_b = run("Berendsen_inhomogeneous")
    e_n, v_n = run("Nose-Hoover")
    np.testing.assert_array_equal(e_b, e_n)
    np.testing.assert_array_equal(v_b, v_n)


def test_fire_golden_trajectory(model, struct):
    relaxer = StructOptimizer(model=model, optimizer_class="FIRE")
    res = relaxer.relax(
        struct.perturb(0.1, seed=3),
        fmax=0.01,
        steps=25,
        relax_cell=True,
        assign_magmoms=False,
    )
    es = [float(e) for e in res["trajectory"].energies[:25]]
    np.testing.assert_allclose(es, GOLDEN_FIRE, rtol=2e-3)
