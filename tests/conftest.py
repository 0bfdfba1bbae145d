"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so that multi-chip sharding
(mesh/pjit/shard_map paths) is exercised without TPU hardware — the
counterpart of the reference CI pinning ``CHGNET_DEVICE: cpu``
(``/root/reference/.github/workflows/test.yml:36-41``).

Must set the env vars before jax is imported anywhere.
"""

from __future__ import annotations

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the axon sitecustomize pins jax_platforms=axon programmatically; tests run
# on 8 virtual CPU devices so the multi-chip paths execute without hardware
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/chgnet_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import pytest  # noqa: E402

from chgnet_tpu import ROOT  # noqa: E402
from chgnet_tpu.core.structure import Structure  # noqa: E402


@pytest.fixture
def li_mn_o2() -> Structure:
    """LiMnO2 (mp-18767) fixture, same as the reference conftest."""
    return Structure.from_file(f"{ROOT}/examples/mp-18767-LiMnO2.cif")
