"""LP capability: Q = 0 (and near-0) through every solver family.

The reference's SCS wrapper inherits LP support from the SCS C solver
(scs_qp.py drives a general conic solver); here nothing special is
needed either — the splitting solvers regularize the x-update with
rho/sigma and the box IP's condensed operator Q + diag(d) stays SPD —
but that only stays true if it is pinned.  Analytic oracle: a box LP
min p'x, 0 <= x <= 1 has x_i* = 1 if p_i < 0 else 0 (p_i != 0).
"""

import jax.numpy as jnp
import numpy as np

from lqp_py_tpu import (BoxQPConfig, GenQPConfig, OptNetConfig,
                        solve_box_qp)
from lqp_py_tpu.models.box_ip import solve_box_qp_ip
from lqp_py_tpu.models.genqp import solve_qp_gen

B, N = 4, 6


def _lp_data():
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.normal(size=(B, N)))
    # Keep coefficients away from 0 so the LP solution is unique.
    p = jnp.where(jnp.abs(p) < 0.1, 0.1, p)
    Q = jnp.zeros((B, N, N))
    lb, ub = jnp.zeros((B, N)), jnp.ones((B, N))
    x_star = (np.asarray(p) < 0).astype(float)
    return Q, p, lb, ub, x_star


def test_lp_box_admm():
    Q, p, lb, ub, x_star = _lp_data()
    sol = solve_box_qp(Q, p, None, None, lb, ub,
                       BoxQPConfig(eps_abs=1e-9, eps_rel=1e-9))
    assert bool(sol.converged.all())
    np.testing.assert_allclose(np.asarray(sol.x), x_star, atol=1e-7)


def test_lp_box_ip():
    Q, p, lb, ub, x_star = _lp_data()
    sol = solve_box_qp_ip(Q, p, None, None, lb, ub,
                          OptNetConfig(tol=1e-9, max_iters=50))
    assert bool(sol.converged.all())
    np.testing.assert_allclose(np.asarray(sol.x), x_star, atol=1e-7)


def test_lp_genqp():
    Q, p, lb, ub, x_star = _lp_data()
    eye = jnp.eye(N)[None].repeat(B, 0)
    G = jnp.concatenate([-eye, eye], axis=1)
    h = jnp.concatenate([-lb, ub], axis=-1)
    sol = solve_qp_gen(Q, p, None, None, G, h,
                       GenQPConfig(eps_abs=1e-7, eps_rel=1e-7,
                                   max_iters=200000))
    assert bool(sol.converged.all())
    np.testing.assert_allclose(np.asarray(sol.x), x_star, atol=1e-5)


def test_lp_with_equality_budget():
    """LP with a budget row: min p'x s.t. sum(x) = 1, 0 <= x <= 1.
    Unique solution puts all mass on the smallest p coordinate."""
    rng = np.random.default_rng(3)
    p_np = rng.normal(size=(B, N))
    p = jnp.asarray(p_np)
    Q = jnp.zeros((B, N, N))
    A = jnp.ones((B, 1, N))
    b = jnp.ones((B, 1))
    lb, ub = jnp.zeros((B, N)), jnp.ones((B, N))
    sol = solve_box_qp(Q, p, A, b, lb, ub,
                       BoxQPConfig(eps_abs=1e-9, eps_rel=1e-9))
    assert bool(sol.converged.all())
    x_star = np.zeros((B, N))
    x_star[np.arange(B), p_np.argmin(axis=1)] = 1.0
    np.testing.assert_allclose(np.asarray(sol.x), x_star, atol=1e-6)
