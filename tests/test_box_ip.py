"""Box-structured interior point: agreement with the ADMM and generic-IP
solvers plus gradient checks through the box KKT backward."""

import jax
import jax.numpy as jnp
import numpy as np

from lqp_py_tpu import BoxQPConfig, OptNetConfig, solve_box_qp
from lqp_py_tpu.models.box_ip import boxqp_ip, solve_box_qp_ip
from lqp_py_tpu.utils.generators import create_qp_data


def test_box_ip_matches_admm():
    data = create_qp_data(30, 4, seed=0, dtype=jnp.float64)
    ip = solve_box_qp_ip(*data, config=OptNetConfig(tol=1e-11, max_iters=60))
    admm = solve_box_qp(*data, config=BoxQPConfig(eps_abs=1e-9, eps_rel=1e-9,
                                                  max_iters=50000))
    assert bool(jnp.all(ip.converged)), (
        int(ip.iterations), float(ip.primal_residual.max()),
        float(ip.dual_residual.max()))
    np.testing.assert_allclose(np.asarray(ip.x), np.asarray(admm.x),
                               rtol=1e-4, atol=1e-5)


def test_box_ip_matches_generic_ip():
    """Must agree with the generic condensed IP fed the same box as G."""
    from lqp_py_tpu.models.optnet import solve_qp_optnet
    data = create_qp_data(16, 3, seed=1, dtype=jnp.float64)
    G, h = data.with_G_h()
    gen = solve_qp_optnet(data.Q, data.p, data.A, data.b, G, h,
                          config=OptNetConfig(tol=1e-10, max_iters=60))
    box = solve_box_qp_ip(*data, config=OptNetConfig(tol=1e-10, max_iters=60))
    np.testing.assert_allclose(np.asarray(box.x), np.asarray(gen.x),
                               rtol=1e-6, atol=1e-8)
    # lams layouts: generic [h=-lb rows; ub rows] == box [z_lo; z_hi].
    np.testing.assert_allclose(np.asarray(box.lams), np.asarray(gen.lams),
                               rtol=1e-4, atol=1e-6)


def test_box_ip_no_equality():
    data = create_qp_data(20, 3, seed=2, dtype=jnp.float64)
    ip = solve_box_qp_ip(data.Q, data.p, None, None, data.lb, data.ub,
                         config=OptNetConfig(tol=1e-11, max_iters=60))
    admm = solve_box_qp(data.Q, data.p, None, None, data.lb, data.ub,
                        config=BoxQPConfig(eps_abs=1e-9, eps_rel=1e-9,
                                           max_iters=50000))
    assert bool(jnp.all(ip.converged))
    np.testing.assert_allclose(np.asarray(ip.x), np.asarray(admm.x),
                               rtol=1e-4, atol=1e-5)


def test_box_ip_grads_match_admm_layer():
    from lqp_py_tpu import boxqp
    data = create_qp_data(10, 2, seed=3, dtype=jnp.float64)
    w = jax.random.normal(jax.random.PRNGKey(4), data.p.shape, jnp.float64)

    def loss_ip(Q, p, lb, ub):
        x = boxqp_ip(Q, p, data.A, data.b, lb, ub,
                     config=OptNetConfig(tol=1e-11, max_iters=80))
        return jnp.sum(w * x)

    def loss_admm(Q, p, lb, ub):
        x = boxqp(Q, p, data.A, data.b, lb, ub,
                  config=BoxQPConfig(eps_abs=1e-10, eps_rel=1e-10,
                                     max_iters=100000))
        return jnp.sum(w * x)

    g_ip = jax.grad(loss_ip, argnums=(0, 1, 2, 3))(
        data.Q, data.p, data.lb, data.ub)
    g_admm = jax.grad(loss_admm, argnums=(0, 1, 2, 3))(
        data.Q, data.p, data.lb, data.ub)
    for a, b_, name in zip(g_ip, g_admm, ["Q", "p", "lb", "ub"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-2, atol=1e-4,
                                   err_msg=f"box-IP vs ADMM grads: {name}")


def test_box_ip_polish_preserves_equality_constraints():
    """Same acceptance invariant as the general IP: the polish refinement
    corrects through Hinv only, so accepted iterates must be gated on the
    equality residual as well (advisor finding, round 2)."""
    for seed in range(4):
        data = create_qp_data(24, 4, seed=200 + seed, dtype=jnp.float64)
        sol = solve_box_qp_ip(data.Q, data.p, data.A, data.b,
                              data.lb, data.ub,
                              config=OptNetConfig(tol=1e-9, max_iters=60,
                                                  polish=True))
        eq = jnp.max(jnp.abs(
            jnp.einsum("bmi,bi->bm", data.A, sol.x) - data.b))
        assert float(eq) < 1e-6, f"seed {seed}: |Ax-b| = {float(eq):.3e}"
