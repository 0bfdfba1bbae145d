"""Encoder-function tests (counterpart of reference ``tests/test_encoders.py``)."""

from __future__ import annotations

import numpy as np
import pytest

from chgnet_tpu.models import basis
from chgnet_tpu.models.chgnet import CHGNet, CHGNetConfig
from chgnet_tpu.models.encoders import (
    angle_encoder,
    atom_embedding_apply,
    bond_encoder,
)


def test_atom_embedding():
    model = CHGNet(seed=0, atom_fea_dim=16, num_radial=9, num_angular=9,
                   n_conv=2, mlp_hidden_dims=(16,))
    emb = atom_embedding_apply(
        model.params["atom_embedding"], np.array([1, 8, 94])
    )
    assert emb.shape == (3, 16)
    # Z=1 -> row 0
    np.testing.assert_allclose(
        np.asarray(emb[0]),
        np.asarray(model.params["atom_embedding"]["weight"][0]),
    )


def test_bond_encoder_shapes_and_cutoff():
    params = {
        "freq_ag": basis.bessel_frequencies(31),
        "freq_bg": basis.bessel_frequencies(31),
    }
    center = np.zeros((4, 3))
    nbr = np.array([[1.0, 0, 0], [0, 2.5, 0], [0, 0, 5.0], [0, 0, 6.5]])
    rbf_ag, rbf_bg, unit = bond_encoder(
        params, center_pos=center, neighbor_pos=nbr
    )
    assert rbf_ag.shape == rbf_bg.shape == (4, 31)
    assert unit.shape == (4, 3)
    np.testing.assert_allclose(np.linalg.norm(unit, axis=1), 1.0, rtol=1e-6)
    # smooth envelope: basis beyond the 6 A atom-graph cutoff vanishes
    assert np.abs(np.asarray(rbf_ag[3])).max() < np.abs(np.asarray(rbf_ag[0])).max()


def test_bond_encoder_zero_length_nan():
    """Zero-length bonds produce NaN, like the reference
    (``test_encoders.py:83-96``) — documents the sharp edge."""
    params = {
        "freq_ag": basis.bessel_frequencies(9),
        "freq_bg": basis.bessel_frequencies(9),
    }
    _, _, unit = bond_encoder(
        params, center_pos=np.zeros((1, 3)), neighbor_pos=np.zeros((1, 3))
    )
    assert np.isnan(np.asarray(unit)).all()


def test_angle_encoder():
    params = {"freq": basis.fourier_frequencies(4)}  # num_angular 9
    unit_i = np.array([[1.0, 0, 0], [1.0, 0, 0]])
    unit_j = np.array([[0, 1.0, 0], [1.0, 0, 0]])
    out = angle_encoder(params, unit_vec_i=unit_i, unit_vec_j=unit_j)
    assert out.shape == (2, 9)
    assert np.isfinite(np.asarray(out)).all()  # parallel vectors stay finite


def test_odd_num_angular_required():
    with pytest.raises(ValueError, match="must be odd"):
        CHGNetConfig(num_angular=8)
