"""ctypes bridge to the threaded host-ops library (see src/hostops.cpp).

``fast_gather(src, idx)`` == ``src[idx]`` for 1-D/2-D contiguous arrays,
but multithreaded + software-prefetched: random row gathers over 10M+-row
arrays are DRAM-latency-bound and numpy's single-threaded fancy indexing
leaves ~Nx of the machine's memory parallelism unused. Falls back to numpy
transparently if the native build is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from chgnet_tpu.utils import hostmem

_module_dir = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_module_dir, "src", "hostops.cpp")
_LIB = os.path.join(_module_dir, "libhostops.so")
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_load_failed = False

_N_THREADS = min(8, os.cpu_count() or 1)


def _compile() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
             "-fPIC", "-pthread", _SRC, "-o", _LIB],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except (subprocess.SubprocessError, OSError):
        return False


def _load() -> ctypes.CDLL | None:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not os.path.exists(_LIB) or os.path.getmtime(
            _LIB
        ) < os.path.getmtime(_SRC):
            if not _compile():
                _load_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
            lib.hostops_gather_rows.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_char_p,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int32,
            ]
            lib.hostops_gather_rows.restype = None
            lib.hostops_argsort_i32.argtypes = [
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int32,
                ctypes.c_int32,
            ]
            lib.hostops_argsort_i32.restype = ctypes.c_int32
            lib.hostops_gather_strided_i32.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_char_p,
                ctypes.c_int64,
                ctypes.c_int32,
            ]
            lib.hostops_gather_strided_i32.restype = None
            _lib = lib
        except OSError:
            _load_failed = True
    return _lib


def fast_gather(src: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """``src[idx]`` (rows) with a threaded, prefetching native kernel."""
    if os.environ.get("CHGNET_TPU_NO_HOSTOPS") == "1":
        return np.ascontiguousarray(src)[idx]
    lib = _load()
    src = np.ascontiguousarray(src)
    if lib is None or src.ndim > 2:
        return src[idx]
    idx64 = np.ascontiguousarray(idx, dtype=np.int64)
    if idx64.size:
        # numpy-equivalent bounds semantics (minus negative wrapping):
        # the native kernel would silently read wild memory on a bad index
        lo, hi = int(idx64.min()), int(idx64.max())
        if lo < 0 or hi >= src.shape[0]:
            raise IndexError(
                f"fast_gather: index range [{lo}, {hi}] out of bounds "
                f"for {src.shape[0]} rows"
            )
    out = hostmem.populated_empty((idx64.shape[0],) + src.shape[1:], src.dtype)
    row = src.dtype.itemsize * (src.shape[1] if src.ndim == 2 else 1)
    lib.hostops_gather_rows(
        src.ctypes.data_as(ctypes.c_char_p),
        idx64.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out.ctypes.data_as(ctypes.c_char_p),
        idx64.shape[0],
        row,
        _N_THREADS,
    )
    return out


def gather_col_into(
    src: np.ndarray,
    col: int | None,
    idx: np.ndarray,
    out: np.ndarray,
) -> bool:
    """``out[:] = src[idx]`` (col=None, full rows) or ``src[idx, col]``,
    written straight into a caller-provided contiguous view — the fused
    gather+pack primitive of the multi-chip re-layout (no intermediate
    array, no second copy). Returns False (caller must fall back to
    numpy) when the native library is unavailable or dtypes/layout don't
    qualify.

    Requirements: src C-contiguous 1-D/2-D; idx int32 (non-negative,
    in-range — checked); out C-contiguous with matching dtype and shape
    ``idx.shape + (src.shape[1:] if col is None else ())``.
    """
    if os.environ.get("CHGNET_TPU_NO_HOSTOPS") == "1":
        return False
    lib = _load()
    if (
        lib is None
        or not src.flags.c_contiguous
        or not out.flags.c_contiguous
        or idx.dtype != np.int32
        or not idx.flags.c_contiguous
        or src.ndim > 2
        or out.dtype != src.dtype
    ):
        return False
    n = idx.shape[0]
    if n == 0:
        return True
    lo, hi = int(idx.min()), int(idx.max())
    if lo < 0 or hi >= src.shape[0]:
        raise IndexError(
            f"gather_col_into: index range [{lo}, {hi}] out of bounds "
            f"for {src.shape[0]} rows"
        )
    item = src.dtype.itemsize
    stride = item * (src.shape[1] if src.ndim == 2 else 1)
    if col is None:
        elem = stride
        base = src.ctypes.data
    else:
        elem = item
        base = src.ctypes.data + col * item
    if out.nbytes != n * elem:
        raise ValueError(
            f"gather_col_into: out has {out.nbytes} bytes, expected {n * elem}"
        )
    lib.hostops_gather_strided_i32(
        ctypes.c_char_p(base),
        stride,
        elem,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_char_p(out.ctypes.data),
        n,
        _N_THREADS,
    )
    return True


def gather_col(
    src: np.ndarray, col: int | None, idx: np.ndarray
) -> np.ndarray:
    """Allocating form of :func:`gather_col_into` (populated pages), with
    a transparent numpy fallback."""
    shape = idx.shape + (src.shape[1:] if col is None else ())
    out = hostmem.populated_empty(shape, src.dtype)
    if not gather_col_into(src, col, idx, out):
        out[...] = src[idx] if col is None else src[idx, col]
    return out


def stable_argsort_i32(keys: np.ndarray) -> np.ndarray:
    """Stable argsort of NON-NEGATIVE int32 keys (threaded LSD radix,
    ~5-8x numpy's comparison sort at 10M rows). Falls back to numpy when
    the native build is unavailable or preconditions don't hold."""
    keys = np.asarray(keys)
    lib = None
    if (
        os.environ.get("CHGNET_TPU_NO_HOSTOPS") != "1"
        and keys.dtype == np.int32
        and keys.ndim == 1
        and keys.size > (1 << 15)
    ):
        lib = _load()
    if lib is None:
        return np.argsort(keys, kind="stable").astype(np.int32)
    keys = np.ascontiguousarray(keys)
    lo = int(keys.min()) if keys.size else 0
    hi = int(keys.max()) if keys.size else 0
    if lo < 0:
        return np.argsort(keys, kind="stable").astype(np.int32)
    out = hostmem.populated_empty(keys.shape[0], np.int32)
    # small key ranges (device ids, bucket keys) take one counting pass
    # and skip the scratch buffer entirely
    small = hi < (1 << 16)
    scratch = (
        out if small else hostmem.populated_empty(keys.shape[0], np.int32)
    )
    rc = lib.hostops_argsort_i32(
        keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        keys.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        scratch.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        _N_THREADS,
        hi if small else -1,
    )
    if rc != 0:
        return np.argsort(keys, kind="stable").astype(np.int32)
    return out
