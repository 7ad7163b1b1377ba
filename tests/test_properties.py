"""Property-based invariance tests (hypothesis over generator seeds).

These are solver-independent correctness oracles of a different kind than
the fixed-seed fuzz/cross-checks: structural identities any exact QP
solver must satisfy, checked over a seed-randomized problem stream with
shrinking.  Shapes are drawn from a small fixed set so jit caches stay
warm (one compile per shape/solver, then hundreds of examples reuse it).

  1. Permutation equivariance: relabeling variables permutes the solution.
  2. Positive cost scaling: x*(aQ, ap) = x*(Q, p); duals scale by a.
  3. KKT residuals of converged solves vanish (seeded-stream version of
     the fixed-seed oracle in test_box_qp_forward).
"""

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from lqp_py_tpu import BoxQPConfig, GenQPConfig, solve_box_qp
from lqp_py_tpu.models.genqp import solve_qp_gen
from lqp_py_tpu.utils.generators import create_qp_data, kkt_residuals

CFG = BoxQPConfig(eps_abs=1e-9, eps_rel=1e-9, max_iters=4000)
GCFG = GenQPConfig(eps_abs=1e-9, eps_rel=1e-9, max_iters=4000)
N_SET = (3, 7, 12)          # fixed shape menu -> bounded compile count
B = 2

_solve = jax.jit(lambda *a: solve_box_qp(*a, config=CFG))
_solve_gen = jax.jit(lambda *a: solve_qp_gen(*a, config=GCFG))


def _problem(n, seed):
    d = create_qp_data(n, B, seed=seed, dtype=jnp.float64)
    return d.Q, d.p, d.A, d.b, d.lb, d.ub


@settings(max_examples=25, deadline=None)
@given(n=st.sampled_from(N_SET), seed=st.integers(0, 2**31 - 1),
       perm_seed=st.integers(0, 2**31 - 1))
def test_permutation_equivariance(n, seed, perm_seed):
    Q, p, A, b, lb, ub = _problem(n, seed)
    pi = np.random.default_rng(perm_seed).permutation(n)
    sol = _solve(Q, p, A, b, lb, ub)
    sol_p = _solve(Q[:, pi][:, :, pi], p[:, pi], A[:, :, pi], b,
                   lb[:, pi], ub[:, pi])
    assert bool(jnp.all(sol.converged)) and bool(jnp.all(sol_p.converged))
    np.testing.assert_allclose(np.asarray(sol_p.x), np.asarray(sol.x[:, pi]),
                               atol=5e-7, rtol=0)


@settings(max_examples=25, deadline=None)
@given(n=st.sampled_from(N_SET), seed=st.integers(0, 2**31 - 1),
       a=st.floats(1e-3, 1e3))
def test_cost_scaling_invariance(n, seed, a):
    Q, p, A, b, lb, ub = _problem(n, seed)
    sol = _solve(Q, p, A, b, lb, ub)
    sol_s = _solve(a * Q, a * p, A, b, lb, ub)
    assert bool(jnp.all(sol.converged)) and bool(jnp.all(sol_s.converged))
    # The two runs stop at tolerance along different iteration paths (the
    # auto-rho scales with ||Q||), so agreement is to stopping accuracy,
    # not machine precision.
    np.testing.assert_allclose(np.asarray(sol_s.x), np.asarray(sol.x),
                               atol=1e-5, rtol=0)
    # Stationarity duals scale with the cost: lam' = a lam, nu' = a nu.
    np.testing.assert_allclose(np.asarray(sol_s.lams),
                               a * np.asarray(sol.lams),
                               atol=a * 1e-5 + 1e-7, rtol=0)


@settings(max_examples=25, deadline=None)
@given(n=st.sampled_from(N_SET), seed=st.integers(0, 2**31 - 1))
def test_kkt_residuals_seed_stream(n, seed):
    Q, p, A, b, lb, ub = _problem(n, seed)
    sol = _solve(Q, p, A, b, lb, ub)
    assert bool(jnp.all(sol.converged))
    res = kkt_residuals(Q, p, A, b, lb, ub, sol.x, sol.lams, sol.nus)
    for name, r in res.items():
        assert float(jnp.max(r)) < 1e-6, (name, float(jnp.max(r)))


@settings(max_examples=15, deadline=None)
@given(n=st.sampled_from(N_SET), seed=st.integers(0, 2**31 - 1))
def test_genqp_matches_box_seed_stream(n, seed):
    """Cross-family agreement over the seeded stream: the operator-splitting
    solver on G=[-I;I] must find the box solver's solution."""
    Q, p, A, b, lb, ub = _problem(n, seed)
    d = create_qp_data(n, B, seed=seed, dtype=jnp.float64)
    G, h = d.with_G_h()
    sol = _solve(Q, p, A, b, lb, ub)
    gsol = _solve_gen(Q, p, A, b, G, h)
    assert bool(jnp.all(sol.converged)) and bool(jnp.all(gsol.converged))
    # Two different splittings, each stopped at tolerance: agreement is to
    # stopping accuracy.
    np.testing.assert_allclose(np.asarray(gsol.x), np.asarray(sol.x),
                               atol=1e-5, rtol=0)
