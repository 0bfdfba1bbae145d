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

# --- VMA headroom guard -------------------------------------------------
# XLA's CPU JIT mmaps ~3 anonymous regions (code/rodata/data) per compiled
# LLVM module and NEVER unmaps them (jax.clear_caches() does not help); a
# full-suite run accumulates >65k mappings and then dies INSIDE an XLA
# compile with SIGSEGV/SIGABRT ("Unable to allocate section memory") once
# vm.max_map_count (default 65530) is exhausted. Diagnosed from a core
# dump: 65,532 VMAs at abort, llvm::RuntimeDyldELF -> report_fatal_error.
# Raise the limit when we can (root in CI containers); otherwise warn.
_MAP_LIMIT = "/proc/sys/vm/max_map_count"


def _ensure_map_headroom(want: int = 1_048_576) -> None:
    try:
        with open(_MAP_LIMIT) as fh:
            current = int(fh.read())
        if current >= want:
            return
        try:
            with open(_MAP_LIMIT, "w") as fh:
                fh.write(str(want))
        except PermissionError:
            import warnings

            warnings.warn(
                f"vm.max_map_count={current} is low for a full-suite run; "
                f"XLA's CPU JIT may exhaust it (segfault inside compile). "
                f"Run: sysctl -w vm.max_map_count={want}",
                stacklevel=1,
            )
    except OSError:  # non-linux
        pass


_ensure_map_headroom()

import jax  # noqa: E402

# the axon sitecustomize pins jax_platforms=axon programmatically; tests run
# on 8 virtual CPU devices so the multi-chip paths execute without hardware
jax.config.update("jax_platforms", "cpu")
# NOTE: tests deliberately do NOT share the persistent compilation cache
# (/tmp/chgnet_tpu_jax_cache, used by bench.py for the slow TPU compiles):
# a cache entry torn by a killed process segfaults deserialization, and CPU
# test compiles are cheap anyway.

import pytest  # noqa: E402

from chgnet_tpu import ROOT  # noqa: E402
from chgnet_tpu.core.structure import Structure  # noqa: E402


@pytest.fixture
def li_mn_o2() -> Structure:
    """LiMnO2 (mp-18767) fixture, same as the reference conftest."""
    return Structure.from_file(f"{ROOT}/examples/mp-18767-LiMnO2.cif")
