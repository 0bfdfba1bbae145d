"""Basis expansions: smooth radial Bessel and Fourier angular bases.

Math matches the reference (``/root/reference/chgnet/model/basis.py``):

* ``RadialBessel``: sqrt(2/c) * sin(f_k * r / c) / r with learnable
  frequencies f_k (init k*pi), times the GemNet polynomial envelope
  1 + a u^p + b u^(p+1) + c u^(p+2) (u = r/c) that decays 1 -> 0 on [0, c].
* ``Fourier``: [1/sqrt(2), sin(k theta), cos(k theta)] / sqrt(pi) with
  learnable frequencies (init 1..order).

Implemented as pure functions of (frequencies, distances/angles) so the
learnable frequencies live in the model param pytree.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def bessel_frequencies(num_radial: int) -> np.ndarray:
    """Canonical initialization: k * pi, k = 1..num_radial."""
    return (np.pi * np.arange(1, num_radial + 1)).astype(np.float32)


def fourier_frequencies(order: int) -> np.ndarray:
    """Canonical initialization: 1..order."""
    return np.arange(1, order + 1, dtype=np.float32)


def polynomial_cutoff(r: jnp.ndarray, cutoff: float, cutoff_coeff: float):
    """Smooth polynomial envelope decaying from 1 at r=0 to 0 at r=cutoff.

    ``cutoff_coeff`` = 0 disables the envelope (returns ones).
    """
    if cutoff_coeff == 0:
        return jnp.ones_like(r)
    p = float(cutoff_coeff)
    a = -(p + 1) * (p + 2) / 2
    b = p * (p + 2)
    c = -p * (p + 1) / 2
    u = r / cutoff
    env = 1 + a * u**p + b * u ** (p + 1) + c * u ** (p + 2)
    return jnp.where(u < 1, env, jnp.zeros_like(u))


def radial_bessel(
    dist: jnp.ndarray,
    frequencies: jnp.ndarray,
    cutoff: float,
    cutoff_coeff: float | None,
) -> jnp.ndarray:
    """Expand distances [n] -> [n, num_radial].

    Note: callers guarantee dist > 0 (padding bonds are given a full
    lattice-vector length), so sin(f r / c) / r and its gradients are finite.
    """
    dist = dist[:, None]
    norm_const = (2.0 / cutoff) ** 0.5
    out = norm_const * jnp.sin(frequencies[None, :] * dist / cutoff) / dist
    if cutoff_coeff is not None:
        out = out * polynomial_cutoff(dist, cutoff, cutoff_coeff)
    return out


def fourier(angle: jnp.ndarray, frequencies: jnp.ndarray) -> jnp.ndarray:
    """Expand angles [n] -> [n, 1 + 2*order]."""
    n = angle.shape[0]
    order = frequencies.shape[0]
    const = jnp.full((n, 1), 1.0 / jnp.sqrt(2.0), dtype=angle.dtype)
    phases = angle[:, None] * frequencies[None, :]
    out = jnp.concatenate([const, jnp.sin(phases), jnp.cos(phases)], axis=1)
    return out / np.sqrt(np.pi)


def gaussian_expansion(
    features: jnp.ndarray,
    *,
    min_val: float = 0.0,
    max_val: float = 5.0,
    step: float = 0.5,
    var: float | None = None,
) -> jnp.ndarray:
    """Soft one-hot Gaussian distance expansion (``basis.py:119-162``);
    unused by released models but part of the public surface."""
    if min_val >= max_val:
        raise ValueError(f"{min_val=} must be less than {max_val=}")
    if max_val - min_val <= step:
        raise ValueError(f"{max_val - min_val=} must be greater than {step=}")
    var = var or step
    if var <= 0:
        raise ValueError(f"{var=} must be positive")
    centers = jnp.arange(min_val, max_val + step, step)
    return jnp.exp(-((features[:, None] - centers[None, :]) ** 2) / var**2)
