"""Utility tests (profiling helpers, device-selection parity stubs)."""

from __future__ import annotations


def test_profiling_timeit():
    """timeit forces true completion via a host fetch and reports
    steady-state seconds/iter."""
    import jax.numpy as jnp

    from chgnet_tpu.utils import timeit

    result = timeit(lambda x: x * 2.0, jnp.ones(128), iters=3, repeats=2)
    assert result["seconds_per_iter"] > 0


def test_cuda_devices_stub():
    from chgnet_tpu.utils import cuda_devices_sorted_by_free_mem

    ids = cuda_devices_sorted_by_free_mem()
    assert isinstance(ids, list) and len(ids) >= 1
