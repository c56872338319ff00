"""Native (C++) host-side components.

The TPU runs the compute path (jax/XLA/Pallas); the inherently sequential
host-side pieces run native C++ via a plain C ABI + ctypes:

* `halo_growth.cpp` — the halofinder's exclusive sphere-growth loop
  (halofind.f90:683-717 role).

The shared library auto-builds with g++ on first use and caches next to
the sources; everything degrades gracefully to the numpy fallback if no
compiler is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(__file__)
_SO = os.path.join(_DIR, "libhalogrowth.so")
_LIB = None
_TRIED = False


def _build() -> bool:
    src = os.path.join(_DIR, "halo_growth.cpp")
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", src, "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO) or (
            os.path.getmtime(_SO)
            < os.path.getmtime(os.path.join(_DIR, "halo_growth.cpp"))):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.grow_halos.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.grow_halos.restype = None
    _LIB = lib
    return _LIB


def grow_halos(rho: np.ndarray, peaks: np.ndarray, offsets: np.ndarray,
               rdist: np.ndarray, odc: float, min_mass: float):
    """Run the native growth loop; modifies rho in place.

    Returns (mass, radius, kept, ncells) arrays, or None if the library is
    unavailable (caller falls back to numpy).
    """
    lib = load()
    if lib is None:
        return None
    rho = np.ascontiguousarray(rho, dtype=np.float32)
    peaks = np.ascontiguousarray(peaks, dtype=np.int64)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    rdist = np.ascontiguousarray(rdist, dtype=np.float32)
    npeaks = peaks.shape[0]
    mass = np.zeros(npeaks, np.float32)
    radius = np.zeros(npeaks, np.float32)
    kept = np.zeros(npeaks, np.int32)
    ncells = np.zeros(npeaks, np.int64)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int64)
    lib.grow_halos(
        rho.ctypes.data_as(fp), ctypes.c_int64(rho.shape[0]),
        peaks.ctypes.data_as(ip), ctypes.c_int64(npeaks),
        offsets.ctypes.data_as(ip), rdist.ctypes.data_as(fp),
        ctypes.c_int64(offsets.shape[0]),
        ctypes.c_float(odc), ctypes.c_float(min_mass),
        mass.ctypes.data_as(fp), radius.ctypes.data_as(fp),
        kept.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ncells.ctypes.data_as(ip))
    return rho, mass, radius, kept.astype(bool), ncells
