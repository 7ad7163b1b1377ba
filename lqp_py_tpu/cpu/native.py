"""ctypes binding to the native C++ CPU box-QP solver (native/lqp_native.cpp).

Auto-builds the shared library on first use (``make`` in native/); falls
back gracefully (``available() == False``) when no toolchain is present.
Used as an independent correctness oracle in tests and as the CPU baseline
in benchmarks — the role SCS plays for the reference (scs_qp.py:97-108).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "liblqp_native.so")

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    d = ctypes.POINTER(ctypes.c_double)
    i = ctypes.POINTER(ctypes.c_int)
    lib.lqp_solve_box_qp_batch.restype = ctypes.c_int
    lib.lqp_solve_box_qp_batch.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        d, d, d, d, d, d,
        ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_int, ctypes.c_int,
        d, d, d, d, i, d, d,
    ]
    if hasattr(lib, "lqp_solve_box_qp_batch_mt"):
        lib.lqp_solve_box_qp_batch_mt.restype = ctypes.c_int
        lib.lqp_solve_box_qp_batch_mt.argtypes = (
            [ctypes.c_int] + list(lib.lqp_solve_box_qp_batch.argtypes))
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def solve_box_qp_native(Q, p, A=None, b=None, lb=None, ub=None,
                        rho: float = -1.0, eps_abs: float = 1e-6,
                        eps_rel: float = 1e-6, max_iters: int = 100000,
                        check_every: int = 0, n_threads: int = 1):
    """Batched solve through the C++ core.  Shapes as in the JAX solver
    ((B, n) vectors).  Returns dict with x, z, nus, lams (signed), iters,
    primal/dual residuals, status.

    ``n_threads``: 1 -> sequential batch loop (mirrors the reference's
    SCS-wrapper pattern, scs_qp.py:97-108); 0 -> all cores via OpenMP;
    k > 1 -> k OpenMP threads."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native solver unavailable (build failed)")

    Q = np.ascontiguousarray(np.asarray(Q, np.float64))
    p = np.ascontiguousarray(np.asarray(p, np.float64))
    B, n = p.shape[0], p.shape[1]
    if A is not None:
        A = np.ascontiguousarray(np.asarray(A, np.float64))
        b = np.ascontiguousarray(np.asarray(b, np.float64)).reshape(B, -1)
        m = A.shape[1]
    else:
        m = 0
    if lb is None:
        lb = np.full((B, n), -np.inf)
    if ub is None:
        ub = np.full((B, n), np.inf)
    lb = np.ascontiguousarray(np.asarray(lb, np.float64)).reshape(B, n)
    ub = np.ascontiguousarray(np.asarray(ub, np.float64)).reshape(B, n)
    p = p.reshape(B, n)

    x = np.zeros((B, n))
    z = np.zeros((B, n))
    nus = np.zeros((B, m)) if m > 0 else np.zeros((B, 0))
    lams = np.zeros((B, n))
    iters = np.zeros((B,), np.int32)
    primal = np.zeros((B,))
    dual = np.zeros((B,))

    def ptr(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))

    common = (
        B, n, m,
        ptr(Q), ptr(p),
        ptr(A) if m > 0 else None, ptr(b) if m > 0 else None,
        ptr(lb), ptr(ub),
        ctypes.c_double(rho), ctypes.c_double(eps_abs),
        ctypes.c_double(eps_rel), int(max_iters), int(check_every),
        ptr(x), ptr(z), ptr(nus) if m > 0 else None, ptr(lams),
        iters.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ptr(primal), ptr(dual))
    if n_threads != 1 and hasattr(lib, "lqp_solve_box_qp_batch_mt"):
        status = lib.lqp_solve_box_qp_batch_mt(int(n_threads), *common)
    else:
        status = lib.lqp_solve_box_qp_batch(*common)

    return {
        "x": x, "z": z, "nus": nus if m > 0 else None, "lams": lams,
        "iters": iters, "primal": primal, "dual": dual, "status": status,
    }
