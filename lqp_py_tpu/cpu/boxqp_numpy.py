"""Single-problem NumPy box-QP ADMM solver (float64 CPU reference).

Component parity with the reference's non-batched scalar solver
(``solve_box_qp`` / ``BoxQP``, solve_box_qp_admm.py:7-282): same problem
class and stopping rules, used as a readable, dependency-free oracle (the
fast path is the C++ core in native/lqp_native.cpp; this is the pure-Python
fallback and the line-by-line-checkable reference).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from scipy.linalg import lu_factor, lu_solve


def prep_bound(v, n_x: int, default: float):
    if v is None:
        return np.full(n_x, default)
    v = np.asarray(v, np.float64).reshape(-1)
    if v.size == 1:
        return np.full(n_x, float(v[0]))
    return v


def solve_box_qp_np(Q, p, A=None, b=None, lb=None, ub=None,
                    rho: Optional[float] = None, eps_abs: float = 1e-6,
                    eps_rel: float = 1e-6, max_iters: int = 100000,
                    check_every: Optional[int] = None):
    """Solve one box QP.  Returns dict {x, z, u, nus, lams, iter,
    primal_error, dual_error, converged}."""
    Q = np.asarray(Q, np.float64)
    p = np.asarray(p, np.float64).reshape(-1)
    n = p.shape[0]
    lb = prep_bound(lb, n, -np.inf)
    ub = prep_bound(ub, n, np.inf)
    m = 0
    if A is not None:
        A = np.asarray(A, np.float64).reshape(-1, n)
        b = np.asarray(b, np.float64).reshape(-1)
        m = A.shape[0]

    any_ineq = np.max(lb) > -np.inf or np.min(ub) < np.inf
    if rho is None:
        rho = float(np.linalg.norm(Q) / np.sqrt(n)) if any_ineq else 0.0
        rho = min(max(rho, 1e-6), 1e6)
    if not any_ineq:
        rho = 0.0
    if check_every is None:
        check_every = max(round(np.sqrt(n) / 10) * 10, 1)

    K = np.zeros((n + m, n + m))
    K[:n, :n] = Q + rho * np.eye(n)
    if m:
        K[:n, n:] = A.T
        K[n:, :n] = A
    factors = lu_factor(K)

    x = np.zeros(n)
    z = np.zeros(n)
    u = np.zeros(n)
    nus = np.zeros(m)
    p_norm = np.max(np.abs(p)) if n else 0.0
    primal = dual = np.inf
    converged = False
    it = 0
    for it in range(max_iters):
        rhs = np.concatenate([-p + rho * (z - u), b]) if m \
            else (-p + rho * (z - u))
        sol = lu_solve(factors, rhs)
        x = sol[:n]
        if m:
            nus = sol[n:]
        z_prev = z
        z = np.clip(x + u, lb, ub)
        u = u + (x - z)
        if it % check_every == 0:
            primal = np.max(np.abs(x - z))
            dual = rho * np.max(np.abs(z - z_prev))
            tol_p = eps_abs + eps_rel * max(np.max(np.abs(x)),
                                            np.max(np.abs(z)))
            tol_d = eps_abs + eps_rel * max(
                rho * np.max(np.abs(u)), np.max(np.abs(Q @ x)), p_norm)
            if primal < tol_p and dual < tol_d:
                converged = True
                it += 1
                break

    lam = rho * u
    lams = np.concatenate([np.maximum(-lam, 0), np.maximum(lam, 0)])
    return {"x": x, "z": z, "u": u, "nus": nus if m else None, "lams": lams,
            "iter": it, "primal_error": primal, "dual_error": dual,
            "converged": converged}


class BoxQPNumpy:
    """Stateful wrapper (``BoxQP`` analogue, solve_box_qp_admm.py:7-42)."""

    def __init__(self, Q, p, A=None, b=None, lb=None, ub=None, **options):
        self.Q, self.p, self.A, self.b = Q, p, A, b
        self.lb, self.ub = lb, ub
        self.options = options
        self.sol = None

    def solve(self):
        self.sol = solve_box_qp_np(self.Q, self.p, self.A, self.b,
                                   self.lb, self.ub, **self.options)
        return self.sol["x"]

    def update(self, Q=None, p=None, A=None, b=None, lb=None, ub=None,
               **options):
        if Q is not None:
            self.Q = Q
        if p is not None:
            self.p = p
        if A is not None:
            self.A = A
        if b is not None:
            self.b = b
        if lb is not None:
            self.lb = lb
        if ub is not None:
            self.ub = ub
        self.options.update(options)
