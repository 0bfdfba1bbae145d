"""ctypes bridge to the native C++ graph builder.

Loads (auto-building with g++ on first use if needed) the shared library
``libfast_graph.so`` and exposes :func:`build` with the same output
contract as the numpy builder (``chgnet_tpu/graph/builder.py``); the two
are equivalence-tested edge-for-edge, mirroring how the reference tests
its legacy vs fast paths (``/root/reference/tests/test_crystal_graph.py``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from chgnet_tpu.graph.builder import GraphArrays

_module_dir = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_module_dir, "src", "fast_graph.cpp")
_LIB = os.path.join(_module_dir, "libfast_graph.so")
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_load_failed = False


class _ChgnetGraph(ctypes.Structure):
    _fields_ = [
        ("n_directed", ctypes.c_int64),
        ("n_undirected", ctypes.c_int64),
        ("n_angles", ctypes.c_int64),
        ("atom_graph", ctypes.POINTER(ctypes.c_int64)),
        ("neighbor_image", ctypes.POINTER(ctypes.c_int64)),
        ("d2u", ctypes.POINTER(ctypes.c_int64)),
        ("u2d", ctypes.POINTER(ctypes.c_int64)),
        ("bond_graph", ctypes.POINTER(ctypes.c_int64)),
        ("distances", ctypes.POINTER(ctypes.c_double)),
        ("error", ctypes.c_int32),
    ]


def _compile() -> bool:
    try:
        subprocess.run(
            [
                "g++",
                "-O3",
                "-march=native",
                "-std=c++17",
                "-shared",
                "-fPIC",
                "-pthread",
                _SRC,
                "-o",
                _LIB,
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> ctypes.CDLL | None:
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not os.path.isfile(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(
            _SRC
        ):
            if not _compile():
                _load_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _load_failed = True
            return None
        lib.chgnet_build_graph.restype = ctypes.POINTER(_ChgnetGraph)
        lib.chgnet_build_graph.argtypes = [
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_double,
            ctypes.c_double,
            ctypes.c_double,
        ]
        lib.chgnet_free_graph.argtypes = [ctypes.POINTER(_ChgnetGraph)]
        lib.chgnet_free_graph.restype = None
        _lib = lib
        return _lib


def is_available() -> bool:
    """True when the shared library is loadable (builds it if needed)."""
    return _load() is not None


def build(
    structure,
    atom_graph_cutoff: float,
    bond_graph_cutoff: float,
    *,
    numerical_tol: float = 1e-8,
) -> GraphArrays:
    """Full graph topology for one Structure via the native builder."""
    lib = _load()
    if lib is None:
        raise RuntimeError("fast graph library unavailable")
    frac = np.ascontiguousarray(structure.frac_coords, dtype=np.float64)
    lattice = np.ascontiguousarray(structure.lattice.matrix, dtype=np.float64)
    n_atoms = len(structure)

    ptr = lib.chgnet_build_graph(
        n_atoms,
        frac.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        lattice.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        float(atom_graph_cutoff),
        float(bond_graph_cutoff),
        float(numerical_tol),
    )
    try:
        graph = ptr.contents
        if graph.error:
            raise ValueError(
                "native graph builder found an unpaired directed edge "
                "(neighbor list not reverse-complete)"
            )
        n_dir, n_und, n_ang = (
            graph.n_directed,
            graph.n_undirected,
            graph.n_angles,
        )

        def copy(pointer, count, dtype):
            if count == 0:
                return np.zeros(count, dtype=dtype)
            # convert to the FINAL consumer dtype during the one required
            # copy out of C-owned memory (CrystalGraph stores int32 ids;
            # a second astype pass at 100k-atom scale costs seconds)
            return np.ctypeslib.as_array(pointer, shape=(count,)).astype(
                dtype, copy=True
            )

        atom_graph = copy(graph.atom_graph, 2 * n_dir, np.int32).reshape(-1, 2)
        image = copy(graph.neighbor_image, 3 * n_dir, np.float32).reshape(-1, 3)
        d2u = copy(graph.d2u, n_dir, np.int32)
        u2d = copy(graph.u2d, n_und, np.int32)
        bond_graph = copy(graph.bond_graph, 5 * n_ang, np.int32).reshape(-1, 5)
        distances = copy(graph.distances, n_dir, np.float64)
    finally:
        lib.chgnet_free_graph(ptr)

    return GraphArrays(
        atom_graph=atom_graph,
        neighbor_image=image,
        directed2undirected=d2u,
        undirected2directed=u2d,
        bond_graph=bond_graph,
        distances=distances,
        n_atoms=n_atoms,
    )
