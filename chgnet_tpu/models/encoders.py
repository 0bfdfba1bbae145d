"""Standalone encoder functions: atom embedding, bond encoder, angle encoder.

API-parity counterpart of ``/root/reference/chgnet/model/encoders.py``.
In this framework the encoder math lives inlined in the fused energy core
(``chgnet_tpu/models/chgnet.py::_energy_core``) so XLA sees one graph; the
functions here expose the same building blocks standalone for analysis,
feature extraction and tests. Formulas are identical to the fused path.
"""

from __future__ import annotations

import jax.numpy as jnp

from chgnet_tpu.models import basis
from chgnet_tpu.models.functions import Params


def atom_embedding_apply(
    params: Params, atomic_numbers: jnp.ndarray, *, max_num_elements: int = 94
) -> jnp.ndarray:
    """Element embedding lookup keyed by Z-1 (``encoders.py:9-32``;
    offset applied at ``model.py:432-434``)."""
    z_index = jnp.clip(atomic_numbers - 1, 0, max_num_elements - 1)
    return params["weight"][z_index]


def bond_encoder(
    bond_basis_params: Params,
    *,
    center_pos: jnp.ndarray,  # [U, 3] cartesian
    neighbor_pos: jnp.ndarray,  # [U, 3] cartesian (image already applied)
    atom_graph_cutoff: float = 6.0,
    bond_graph_cutoff: float = 3.0,
    cutoff_coeff: float = 8.0,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Bond vectors -> (rbf_atom_graph, rbf_bond_graph, unit vectors).

    Mirrors ``encoders.py:35-111``: vec = center - neighbor, two
    RadialBessel expansions with smooth polynomial cutoffs.
    """
    vec = center_pos - neighbor_pos
    dist = jnp.linalg.norm(vec, axis=1)
    unit = vec / dist[:, None]
    rbf_ag = basis.radial_bessel(
        dist, bond_basis_params["freq_ag"], atom_graph_cutoff, cutoff_coeff
    )
    rbf_bg = basis.radial_bessel(
        dist, bond_basis_params["freq_bg"], bond_graph_cutoff, cutoff_coeff
    )
    return rbf_ag, rbf_bg, unit


def angle_encoder(
    angle_basis_params: Params,
    *,
    unit_vec_i: jnp.ndarray,  # [A, 3]
    unit_vec_j: jnp.ndarray,  # [A, 3]
) -> jnp.ndarray:
    """Unit bond vectors -> Fourier angle basis (``encoders.py:114-146``):
    cos scaled by (1 - 1e-6) for acos stability, like the reference."""
    cos_ij = jnp.sum(unit_vec_i * unit_vec_j, axis=1) * (1 - 1e-6)
    return basis.fourier(jnp.arccos(cos_ij), angle_basis_params["freq"])
