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


def test_api_docs_generator_renders_modules():
    """The docstring->markdown generator (tools/make_api_docs.py) must
    keep rendering every listed public module — catches API-reference rot
    (renamed modules, import errors) without writing to docs/."""
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "make_api_docs", os.path.join(root, "tools", "make_api_docs.py")
    )
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)
    for modname in gen.MODULES:
        page = gen.render_module(modname)
        assert page.startswith(f"# `{modname}`")
        assert len(page) > 40, modname
