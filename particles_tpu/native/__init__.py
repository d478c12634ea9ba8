"""Native host kernels (C++), loaded via ctypes.

The counterpart of the reference's numba ``@jit(nopython=True)`` layer
(SURVEY.md §2a): on-device the hot ops are Pallas/XLA kernels, while these
C++ kernels serve host-side execution.  Production consumer:
``resampling.ssp_counts`` routes EAGER calls on the CPU backend here (the
inherently sequential SSP recursion as one host loop — the lax.scan
formulation pays a multi-second XLA-CPU compile at N >= 1e5); the others
back the bit-exactness cross-checks in ``tests/test_native.py`` and are
available to host-side post-processing.

The shared library is compiled on first use with g++ (cached next to the
sources); if no compiler is available, ``AVAILABLE`` is False and callers
fall back to the pure-JAX implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

__all__ = [
    "AVAILABLE",
    "inverse_cdf",
    "systematic_counts",
    "ssp_counts",
    "hilbert_index",
]

_SRC = Path(__file__).parent / "src" / "particles_native.cpp"
_LIB = Path(__file__).parent / "_particles_native.so"

_lib = None


def _ensure_built():
    global _lib
    if _lib is not None:
        return _lib
    if (not _LIB.exists()) or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        # build to a per-process temp file and os.replace atomically:
        # concurrent importers (parallel pytest, multi-process users) must
        # never CDLL a partially written .so
        tmp = _LIB.with_suffix(f".tmp{os.getpid()}.so")
        cmd = [
            "g++", "-O3", "-march=native", "-shared", "-fPIC",
            "-o", str(tmp), str(_SRC),
        ]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, _LIB)
    lib = ctypes.CDLL(str(_LIB))
    c_dp = ctypes.POINTER(ctypes.c_double)
    c_i32p = ctypes.POINTER(ctypes.c_int32)
    c_u32p = ctypes.POINTER(ctypes.c_uint32)
    c_u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.pn_inverse_cdf.argtypes = [c_dp, c_dp, ctypes.c_int64,
                                   ctypes.c_int64, c_i32p]
    lib.pn_systematic_counts.argtypes = [c_dp, ctypes.c_int64,
                                         ctypes.c_int64, ctypes.c_double,
                                         c_i32p]
    lib.pn_ssp_counts.argtypes = [c_dp, ctypes.c_int64, ctypes.c_int64,
                                  c_dp, c_i32p]
    lib.pn_ssp_counts.restype = ctypes.c_int32
    lib.pn_hilbert_index.argtypes = [c_u32p, ctypes.c_int64, ctypes.c_int32,
                                     ctypes.c_int32, c_u64p]
    _lib = lib
    return lib


try:
    _ensure_built()
    AVAILABLE = True
except Exception:  # pragma: no cover - no toolchain
    AVAILABLE = False


def _as_c(a, dtype):
    return np.ascontiguousarray(np.asarray(a), dtype=dtype)


def inverse_cdf(su, W):
    """Host two-pointer inverse CDF (reference resampling.py:484-509)."""
    lib = _ensure_built()
    su = _as_c(su, np.float64)
    W = _as_c(W, np.float64)
    A = np.empty(su.shape[0], np.int32)
    lib.pn_inverse_cdf(
        su.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        W.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        su.shape[0], W.shape[0],
        A.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return A


def systematic_counts(W, M, u):
    """Host systematic offspring counts."""
    lib = _ensure_built()
    W = _as_c(W, np.float64)
    counts = np.empty(W.shape[0], np.int32)
    lib.pn_systematic_counts(
        W.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        W.shape[0], int(M), float(u),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return counts


def ssp_counts(W, M, u):
    """Host SSP offspring counts (sequential pairwise rounding);
    ``u`` is an (N-1,) array of iid uniforms."""
    lib = _ensure_built()
    W = _as_c(W, np.float64)
    u = _as_c(u, np.float64)
    counts = np.empty(W.shape[0], np.int32)
    lib.pn_ssp_counts(
        W.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        W.shape[0], int(M),
        u.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return counts


def hilbert_index(coords, nbits):
    """Host Hilbert indices of an (N, d) uint32 array."""
    lib = _ensure_built()
    coords = _as_c(coords, np.uint32)
    N, d = coords.shape
    out = np.empty(N, np.uint64)
    lib.pn_hilbert_index(
        coords.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        N, d, int(nbits),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )
    return out
