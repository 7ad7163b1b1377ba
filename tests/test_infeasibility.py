"""Primal-infeasibility certificates (OSQP-style; SURVEY §5 failure
detection).  The reference silently runs to max_iters on infeasible
input; SCS exposes eps_infeas.  Here the solver reports a per-element
``primal_infeasible`` flag derived from successive dual differences."""

import jax
import jax.numpy as jnp
import numpy as np

from lqp_py_tpu import BoxQPConfig, solve_box_qp
from lqp_py_tpu.utils.generators import create_qp_data

CFG = BoxQPConfig(eps_abs=1e-6, eps_rel=1e-6, max_iters=20000)


def _spd(key, B, n):
    L = jax.random.normal(key, (B, 2 * n, n), jnp.float64)
    return jnp.einsum("bsi,bsj->bij", L, L) / (2 * n) \
        + 0.5 * jnp.eye(n, dtype=jnp.float64)


def test_inconsistent_equality_and_bounds_detected():
    """sum(x) = 10 with x <= 1 and n = 5 is infeasible (sum <= 5)."""
    B, n = 3, 5
    Q = _spd(jax.random.PRNGKey(0), B, n)
    p = jax.random.normal(jax.random.PRNGKey(1), (B, n), jnp.float64)
    A = jnp.ones((B, 1, n), jnp.float64)
    b = jnp.full((B, 1), 10.0, jnp.float64)
    lb = jnp.full((B, n), -1.0, jnp.float64)
    ub = jnp.full((B, n), 1.0, jnp.float64)
    sol = solve_box_qp(Q, p, A, b, lb, ub, config=CFG)
    assert bool(jnp.all(sol.primal_infeasible)), (
        np.asarray(sol.primal_infeasible), int(sol.iterations))
    assert not bool(jnp.any(sol.converged))
    # Detection must happen FAR before max_iters (the whole point).
    assert int(sol.iterations) < CFG.max_iters // 4


def test_mixed_feasible_infeasible_batch():
    """Per-element flags: one feasible element, one infeasible."""
    n = 5
    Q = _spd(jax.random.PRNGKey(2), 2, n)
    p = jax.random.normal(jax.random.PRNGKey(3), (2, n), jnp.float64)
    A = jnp.ones((2, 1, n), jnp.float64)
    b = jnp.asarray([[2.0], [10.0]], jnp.float64)   # elem 1 infeasible
    lb = jnp.full((2, n), -1.0, jnp.float64)
    ub = jnp.full((2, n), 1.0, jnp.float64)
    sol = solve_box_qp(Q, p, A, b, lb, ub, config=CFG)
    flags = np.asarray(sol.primal_infeasible)
    assert not flags[0] and flags[1], flags
    assert bool(sol.converged[0])


def test_unbounded_direction_not_flagged():
    """Infinite bounds on the violating direction: NOT infeasible (the
    equality can be met by leaving the finite box); flag must stay off."""
    B, n = 2, 5
    Q = _spd(jax.random.PRNGKey(4), B, n)
    p = jnp.zeros((B, n), jnp.float64)
    A = jnp.ones((B, 1, n), jnp.float64)
    b = jnp.full((B, 1), 10.0, jnp.float64)
    lb = jnp.full((B, n), -1.0, jnp.float64)
    ub = jnp.concatenate([jnp.full((B, n - 1), 1.0, jnp.float64),
                          jnp.full((B, 1), jnp.inf, jnp.float64)], axis=-1)
    sol = solve_box_qp(Q, p, A, b, lb, ub, config=CFG)
    assert not bool(jnp.any(sol.primal_infeasible))
    assert bool(jnp.all(sol.converged))


def test_feasible_problems_never_flagged():
    """The standard random family must never trip the certificate."""
    data = create_qp_data(40, 8, seed=0, dtype=jnp.float64)
    sol = solve_box_qp(*data, config=CFG)
    assert bool(jnp.all(sol.converged))
    assert not bool(jnp.any(sol.primal_infeasible))


def test_crossed_bounds_detected():
    """lb > ub on one coordinate, no equality constraints."""
    B, n = 2, 6
    Q = _spd(jax.random.PRNGKey(5), B, n)
    p = jax.random.normal(jax.random.PRNGKey(6), (B, n), jnp.float64)
    lb = jnp.zeros((B, n), jnp.float64)
    ub = jnp.ones((B, n), jnp.float64)
    ub = ub.at[:, 2].set(-1.0)   # lb=0 > ub=-1: empty box
    sol = solve_box_qp(Q, p, None, None, lb, ub, config=CFG)
    assert bool(jnp.all(sol.primal_infeasible)), (
        np.asarray(sol.primal_infeasible), int(sol.iterations))


def test_genqp_contradictory_inequalities_detected():
    """x <= 0 and x >= 1 via G = [I; -I], h = [0; -1]: infeasible."""
    from lqp_py_tpu import GenQPConfig
    from lqp_py_tpu.models.genqp import solve_qp_gen
    B, n = 2, 4
    Q = _spd(jax.random.PRNGKey(7), B, n)
    p = jax.random.normal(jax.random.PRNGKey(8), (B, n), jnp.float64)
    eye = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float64), (B, n, n))
    G = jnp.concatenate([eye, -eye], axis=1)
    h = jnp.concatenate([jnp.zeros((B, n)), -jnp.ones((B, n))],
                        axis=-1).astype(jnp.float64)
    cfg = GenQPConfig(eps_abs=1e-6, eps_rel=1e-6, max_iters=20000)
    sol = solve_qp_gen(Q, p, None, None, G, h, config=cfg)
    assert bool(jnp.all(sol.primal_infeasible)), (
        np.asarray(sol.primal_infeasible), int(sol.iterations))
    assert int(sol.iterations) < cfg.max_iters // 4


def test_genqp_equality_vs_inequalities_detected():
    """sum(x) = 10 with x <= 1, n = 5: infeasible through A + G."""
    from lqp_py_tpu import GenQPConfig
    from lqp_py_tpu.models.genqp import solve_qp_gen
    B, n = 2, 5
    Q = _spd(jax.random.PRNGKey(9), B, n)
    p = jax.random.normal(jax.random.PRNGKey(10), (B, n), jnp.float64)
    A = jnp.ones((B, 1, n), jnp.float64)
    b = jnp.full((B, 1), 10.0, jnp.float64)
    G = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float64), (B, n, n))
    h = jnp.ones((B, n), jnp.float64)
    cfg = GenQPConfig(eps_abs=1e-6, eps_rel=1e-6, max_iters=20000)
    sol = solve_qp_gen(Q, p, A, b, G, h, config=cfg)
    assert bool(jnp.all(sol.primal_infeasible)), (
        np.asarray(sol.primal_infeasible), int(sol.iterations))


def test_genqp_feasible_never_flagged():
    data = create_qp_data(24, 4, seed=1, dtype=jnp.float64)
    from lqp_py_tpu import GenQPConfig
    from lqp_py_tpu.models.genqp import solve_qp_gen
    G, h = data.with_G_h()
    sol = solve_qp_gen(data.Q, data.p, data.A, data.b, G, h,
                       config=GenQPConfig(eps_abs=1e-7, eps_rel=1e-7,
                                          max_iters=100000))
    assert bool(jnp.all(sol.converged))
    assert not bool(jnp.any(sol.primal_infeasible))
