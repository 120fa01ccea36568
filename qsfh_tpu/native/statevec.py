"""ctypes binding for the f64 C++ statevector engine (statevec64.cpp).

Purpose: polish-grade CPU optimization of rot programs (the flagship 3x3
L-BFGS/Newton endgame) at ~5-10x the jax-CPU f64 stage throughput.  The
semantics mirror ``engine/compiled.py`` exactly (same grouped commuting
closed form, same adjoint sweep); parity is unit-tested against the jax
f64 stages in ``tests/test_statevec64.py``.

The reference delegates this role to torch-CPU complex128 autodiff
(/root/reference/models/hva.py:145); here it is a native engine so the
f64 refinement loop is not jax-dispatch-bound.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "statevec64.cpp")
_SO = os.path.join(
    _HERE, f"libqsfh_sv64-py{sys.version_info[0]}{sys.version_info[1]}.so"
)

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    tmp = _SO + f".tmp.{os.getpid()}"
    cmd = [
        "g++", "-O3", "-march=native", "-funroll-loops", "-std=c++17",
        "-shared", "-fPIC", "-o", tmp, _SRC,
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, timeout=180, text=True)
        if proc.returncode != 0:
            import warnings

            warnings.warn(
                "qsfh_tpu.native.statevec: g++ build failed:\n"
                f"{proc.stderr[-2000:]}"
            )
            return False
        os.replace(tmp, _SO)
        return True
    except Exception as e:  # pragma: no cover
        import warnings

        warnings.warn(f"qsfh_tpu.native.statevec: build unavailable ({e})")
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

        u32p = ctypes.POINTER(ctypes.c_uint32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64p = ctypes.POINTER(ctypes.c_int64)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.qsfh_sv64_apply.restype = None
        lib.qsfh_sv64_apply.argtypes = [
            ctypes.c_int32, ctypes.c_int64, u32p, i64p, u32p, f64p, u8p,
            f64p, f64p, f64p,
        ]
        lib.qsfh_sv64_happly.restype = None
        lib.qsfh_sv64_happly.argtypes = [
            ctypes.c_int32, ctypes.c_int64, u32p, u32p, f64p, f64p,
            f64p, f64p, f64p, f64p,
        ]
        lib.qsfh_sv64_adjoint.restype = None
        lib.qsfh_sv64_adjoint.argtypes = [
            ctypes.c_int32, ctypes.c_int64, u32p, i64p, u32p, f64p, u8p,
            f64p, f64p, f64p, f64p, f64p, f64p,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _p(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def _group_terms(xb, zb, scale, pidx, phre, phim, cap=8):
    """Group consecutive rot terms by (x, pidx, parity(x&z)), cap subterms.

    Same key as ``engine.compiled._group_rot_terms`` (the closed form is
    exact because same-x equal-parity strings mutually commute); exact
    per-group lengths instead of padding, and the per-term phase is folded
    into a REAL weight w_k = scale_k * (ph_k / unit) with unit = 1 (parity
    even, ph in {+-1}) or i (parity odd, ph in {+-i}).
    """
    T = len(xb)
    gx, gpidx, gflip, goff, zflat, wflat = [], [], [], [0], [], []
    key = None
    count = 0
    for t in range(T):
        x, z = int(xb[t]), int(zb[t])
        par = (x & z).bit_count() & 1
        kt = (x, int(pidx[t]), par)
        if kt != key or count >= cap:
            gx.append(x)
            gpidx.append(int(pidx[t]))
            gflip.append(par)
            goff.append(goff[-1])
            key = kt
            count = 0
        if par == 0:
            assert abs(phim[t]) < 1e-12, "even-parity term with imag phase"
            w = float(scale[t]) * float(phre[t])
        else:
            assert abs(phre[t]) < 1e-12, "odd-parity term with real phase"
            w = float(scale[t]) * float(phim[t])
        zflat.append(z)
        wflat.append(w)
        goff[-1] += 1
        count += 1
    return (
        np.asarray(gx, np.uint32),
        np.asarray(gpidx, np.int32),
        np.asarray(gflip, np.uint8),
        np.asarray(goff, np.int64),
        np.asarray(zflat, np.uint32),
        np.asarray(wflat, np.float64),
    )


class Rot64Program:
    """A lowered rot segment + observable, prepared for fast f64 evals.

    Build from an ADAPT/HVA rot segment (``seg.data``) and the packed
    Hamiltonian scan terms (``Observable._scan_terms()``).
    """

    def __init__(self, n, seg_data, h_terms, n_params):
        if _load() is None:
            raise RuntimeError("native statevec64 unavailable")
        self.n = int(n)
        self.n_params = int(n_params)
        (self.gx, self.gpidx, self.gflip, self.goff, self.zsub,
         self.wsub) = _group_terms(
            np.asarray(seg_data["xb"]), np.asarray(seg_data["zb"]),
            np.asarray(seg_data["scale"]), np.asarray(seg_data["pidx"]),
            np.asarray(seg_data["phre"]), np.asarray(seg_data["phim"]),
        )
        self.G = len(self.gx)
        xs, zs, cre, cim = h_terms
        self.hx = np.ascontiguousarray(xs, np.uint32)
        self.hz = np.ascontiguousarray(zs, np.uint32)
        self.hcre = np.ascontiguousarray(cre, np.float64)
        self.hcim = np.ascontiguousarray(cim, np.float64)
        self._grad_rows = self.gpidx >= 0

    @classmethod
    def from_adapt(cls, vqe, indices=None):
        """Build from an ADAPT driver (flagship polish entry point)."""
        from ..engine.compiled import CompiledCircuit, givens_network_static_ops

        if indices is None:
            indices = tuple(vqe.selected_indices)
        p = vqe.problem
        ops = [("rot", tuple(vqe.pool_rot[i]), slot)
               for slot, i in enumerate(indices)]
        net_ops, _ = givens_network_static_ops(
            vqe.n_qubits, p.diagonal, p.decomposition
        )
        cc = CompiledCircuit(ops + net_ops, vqe.n_qubits)
        assert len(cc.segments) == 1 and cc.segments[0].kind == "rot"
        h = p.observables["H"]
        return cls(vqe.n_qubits, cc.segments[0].data, h._scan_terms(),
                   len(indices))

    def _angles(self, theta):
        th = np.asarray(theta, np.float64)
        ang = np.ones(self.G, np.float64)
        rows = self._grad_rows
        ang[rows] = th[self.gpidx[rows]]
        return ang

    def apply(self, theta, psi0):
        """Full-circuit forward: returns complex128 statevector."""
        lib = _load()
        re = np.ascontiguousarray(np.real(psi0), np.float64).copy()
        im = np.ascontiguousarray(np.imag(psi0), np.float64).copy()
        ang = self._angles(theta)
        lib.qsfh_sv64_apply(
            self.n, self.G, _p(self.gx, ctypes.c_uint32),
            _p(self.goff, ctypes.c_int64), _p(self.zsub, ctypes.c_uint32),
            _p(self.wsub, ctypes.c_double), _p(self.gflip, ctypes.c_uint8),
            _p(ang, ctypes.c_double), _p(re, ctypes.c_double),
            _p(im, ctypes.c_double),
        )
        return re + 1j * im

    def h_apply(self, psi):
        """H |psi> (complex128)."""
        lib = _load()
        re = np.ascontiguousarray(np.real(psi), np.float64)
        im = np.ascontiguousarray(np.imag(psi), np.float64)
        ore = np.zeros_like(re)
        oim = np.zeros_like(im)
        lib.qsfh_sv64_happly(
            self.n, len(self.hx), _p(self.hx, ctypes.c_uint32),
            _p(self.hz, ctypes.c_uint32), _p(self.hcre, ctypes.c_double),
            _p(self.hcim, ctypes.c_double), _p(re, ctypes.c_double),
            _p(im, ctypes.c_double), _p(ore, ctypes.c_double),
            _p(oim, ctypes.c_double),
        )
        return ore + 1j * oim

    def energy(self, theta, psi0):
        psi = self.apply(theta, psi0)
        return float(np.real(np.vdot(psi, self.h_apply(psi))))

    def value_and_grad(self, theta, psi0):
        """(E, dE/dtheta) via the fused adjoint sweep.  O(1) state memory."""
        lib = _load()
        re = np.ascontiguousarray(np.real(psi0), np.float64).copy()
        im = np.ascontiguousarray(np.imag(psi0), np.float64).copy()
        ang = self._angles(theta)
        args_prog = (
            self.n, self.G, _p(self.gx, ctypes.c_uint32),
            _p(self.goff, ctypes.c_int64), _p(self.zsub, ctypes.c_uint32),
            _p(self.wsub, ctypes.c_double), _p(self.gflip, ctypes.c_uint8),
            _p(ang, ctypes.c_double),
        )
        lib.qsfh_sv64_apply(*args_prog, _p(re, ctypes.c_double),
                            _p(im, ctypes.c_double))
        lre = np.zeros_like(re)
        lim = np.zeros_like(im)
        lib.qsfh_sv64_happly(
            self.n, len(self.hx), _p(self.hx, ctypes.c_uint32),
            _p(self.hz, ctypes.c_uint32), _p(self.hcre, ctypes.c_double),
            _p(self.hcim, ctypes.c_double), _p(re, ctypes.c_double),
            _p(im, ctypes.c_double), _p(lre, ctypes.c_double),
            _p(lim, ctypes.c_double),
        )
        e = float(np.dot(re, lre) + np.dot(im, lim))
        # cotangent lam = 2 H psi (cf. adapt cot_e_raw); E = 0.5 Re<psi|lam>
        lre *= 2.0
        lim *= 2.0
        contrib = np.zeros(self.G, np.float64)
        lib.qsfh_sv64_adjoint(
            *args_prog, _p(re, ctypes.c_double), _p(im, ctypes.c_double),
            _p(lre, ctypes.c_double), _p(lim, ctypes.c_double),
            _p(contrib, ctypes.c_double),
        )
        grads = np.zeros(self.n_params, np.float64)
        rows = self._grad_rows
        np.add.at(grads, self.gpidx[rows], contrib[rows])
        return e, grads

    def hvp(self, theta, psi0, v, eps=1e-6):
        """Central-difference Hessian-vector product from two adjoint evals."""
        vn = float(np.linalg.norm(v))
        if vn == 0.0:
            return np.zeros_like(np.asarray(v, np.float64))
        h = eps / vn
        _, gp = self.value_and_grad(np.asarray(theta) + h * v, psi0)
        _, gm = self.value_and_grad(np.asarray(theta) - h * v, psi0)
        return (gp - gm) / (2.0 * h)
