"""Pallas fused ADMM step: interpreter-mode equivalence with the XLA path."""

import jax.numpy as jnp
import numpy as np

from lqp_py_tpu import BoxQPConfig, solve_box_qp
from lqp_py_tpu.utils.generators import create_qp_data


def test_pallas_step_matches_xla():
    # alpha=1.0 pins the plain iteration: the fused kernel must then be
    # step-for-step (near-bitwise) equivalent to the XLA path.
    data = create_qp_data(50, 4, seed=0, dtype=jnp.float64)
    cfg = dict(eps_abs=1e-7, eps_rel=1e-7, alpha=1.0)
    ref = solve_box_qp(*data, config=BoxQPConfig(**cfg))
    pal = solve_box_qp(*data, config=BoxQPConfig(use_pallas_step=True, **cfg))
    assert bool(jnp.all(pal.converged))
    assert int(pal.iterations) == int(ref.iterations)
    np.testing.assert_allclose(np.asarray(pal.x), np.asarray(ref.x),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(pal.nus), np.asarray(ref.nus),
                               rtol=1e-9, atol=1e-12)


def test_pallas_step_matches_xla_relaxed():
    # With over-relaxation the two paths may freeze converged elements at
    # slightly different iterates; they must agree to solver tolerance.
    data = create_qp_data(50, 4, seed=0, dtype=jnp.float64)
    cfg = dict(eps_abs=1e-7, eps_rel=1e-7, alpha=1.6)
    ref = solve_box_qp(*data, config=BoxQPConfig(**cfg))
    pal = solve_box_qp(*data, config=BoxQPConfig(use_pallas_step=True, **cfg))
    assert bool(jnp.all(pal.converged))
    np.testing.assert_allclose(np.asarray(pal.x), np.asarray(ref.x),
                               rtol=1e-5, atol=1e-7)


def test_pallas_step_no_eq_and_aligned_n():
    data = create_qp_data(128, 2, seed=1, dtype=jnp.float64)  # n % 128 == 0
    cfg = dict(eps_abs=1e-7, eps_rel=1e-7)
    ref = solve_box_qp(data.Q, data.p, None, None, data.lb, data.ub,
                       config=BoxQPConfig(**cfg))
    pal = solve_box_qp(data.Q, data.p, None, None, data.lb, data.ub,
                       config=BoxQPConfig(use_pallas_step=True, **cfg))
    # Different accumulation order inside the kernel => iterates agree to
    # solver tolerance, not bitwise.
    np.testing.assert_allclose(np.asarray(pal.x), np.asarray(ref.x),
                               rtol=1e-4, atol=1e-6)
