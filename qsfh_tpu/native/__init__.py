"""Native (C++) host-side kernels, loaded over a plain C ABI via ctypes.

The image ships a g++ toolchain but no pybind11, so the binding layer is
ctypes on an ``extern "C"`` surface.  The library is compiled from
``pauli_native.cpp`` on first import (a few hundred ms, cached as a .so next
to the source, rebuilt when the source is newer).  Every entry point has a
pure-numpy fallback in ``qsfh_tpu/ops/pauli.py``; set ``QSFH_NO_NATIVE=1``
to force the fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "pauli_native.cpp")
_SO = os.path.join(_HERE, f"libqsfh_native-py{sys.version_info[0]}{sys.version_info[1]}.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    # compile to a temp path and rename into place: atomic for concurrent
    # starters and never truncates a .so another process has already mapped
    tmp = _SO + f".tmp.{os.getpid()}"
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", tmp, _SRC]
    try:
        proc = subprocess.run(cmd, capture_output=True, timeout=120, text=True)
        if proc.returncode != 0:
            import warnings

            warnings.warn(
                "qsfh_tpu.native: g++ build failed, falling back to numpy "
                f"paths:\n{proc.stderr[-2000:]}"
            )
            return False
        os.replace(tmp, _SO)
        return True
    except Exception as e:
        import warnings

        warnings.warn(f"qsfh_tpu.native: build unavailable ({e}); numpy fallback")
        return False
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("QSFH_NO_NATIVE"):
            return None
        try:
            stale = (not os.path.exists(_SO)) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)
            )
            if stale and not _build():
                return None
            lib = ctypes.CDLL(_SO)
        except Exception:
            return None

        u64p = ctypes.POINTER(ctypes.c_uint64)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.qsfh_merge_terms.restype = ctypes.c_int64
        lib.qsfh_merge_terms.argtypes = [
            u64p, u64p, f64p, f64p, ctypes.c_int64, ctypes.c_double,
            u64p, u64p, f64p, f64p,
        ]
        lib.qsfh_dress_emit.restype = ctypes.c_int64
        lib.qsfh_dress_emit.argtypes = [
            u64p, u64p, f64p, f64p, ctypes.c_int64,
            ctypes.c_uint64, ctypes.c_uint64, ctypes.c_double, ctypes.c_double,
            ctypes.c_double,
            u64p, u64p, f64p, f64p,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _u64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def _f64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def merge_terms(x: np.ndarray, z: np.ndarray, c: np.ndarray, tol: float):
    """Sort + combine duplicate (x, z) monomials, dropping |c| <= tol.

    Returns (x, z, c) merged in (x, z)-lex order, or None when the native
    library is unavailable (caller falls back to numpy).
    """
    lib = _load()
    if lib is None:
        return None
    n = int(x.shape[0])
    x = np.ascontiguousarray(x, dtype=np.uint64)
    z = np.ascontiguousarray(z, dtype=np.uint64)
    c = np.ascontiguousarray(c, dtype=np.complex128)
    c_re = np.ascontiguousarray(c.real)
    c_im = np.ascontiguousarray(c.imag)
    ox = np.empty(n, dtype=np.uint64)
    oz = np.empty(n, dtype=np.uint64)
    ore = np.empty(n, dtype=np.float64)
    oim = np.empty(n, dtype=np.float64)
    m = lib.qsfh_merge_terms(
        _u64p(x), _u64p(z), _f64p(c_re), _f64p(c_im), n, float(tol),
        _u64p(ox), _u64p(oz), _f64p(ore), _f64p(oim),
    )
    out_c = np.empty(m, dtype=np.complex128)
    out_c.real = ore[:m]
    out_c.imag = oim[:m]
    return ox[:m].copy(), oz[:m].copy(), out_c


def dress_emit(x, z, c, px, pz, pc, tau):
    """Emit the un-merged single-string dressing term list (see .cpp).

    Returns (x, z, c) of length n + |anticommuting|, or None when native
    is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    n = int(x.shape[0])
    x = np.ascontiguousarray(x, dtype=np.uint64)
    z = np.ascontiguousarray(z, dtype=np.uint64)
    c = np.ascontiguousarray(c, dtype=np.complex128)
    c_re = np.ascontiguousarray(c.real)
    c_im = np.ascontiguousarray(c.imag)
    ox = np.empty(2 * n, dtype=np.uint64)
    oz = np.empty(2 * n, dtype=np.uint64)
    ore = np.empty(2 * n, dtype=np.float64)
    oim = np.empty(2 * n, dtype=np.float64)
    m = lib.qsfh_dress_emit(
        _u64p(x), _u64p(z), _f64p(c_re), _f64p(c_im), n,
        ctypes.c_uint64(int(px)), ctypes.c_uint64(int(pz)),
        float(pc.real), float(pc.imag), float(tau),
        _u64p(ox), _u64p(oz), _f64p(ore), _f64p(oim),
    )
    out_c = np.empty(m, dtype=np.complex128)
    out_c.real = ore[:m]
    out_c.imag = oim[:m]
    return ox[:m].copy(), oz[:m].copy(), out_c
