"""Interior-point solver tests: cross-validation against the ADMM solver on
identical box QPs (the reference validates ADMM/OptNet/SCS agreement on the
same data, experiment_1_new.py:51-56), plus gradient checks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lqp_py_tpu import BoxQPConfig, OptNetConfig, solve_box_qp
from lqp_py_tpu.models.optnet import qp_optnet, solve_qp_optnet
from lqp_py_tpu.utils.generators import create_qp_data


def _data_Gh(n_x, n_batch, seed):
    data = create_qp_data(n_x, n_batch, seed=seed, dtype=jnp.float64)
    G, h = data.with_G_h()
    return data, G, h


def test_optnet_matches_admm_on_box_qp():
    data, G, h = _data_Gh(30, 4, seed=0)
    # tol drives the relative OSQP-style stopping test (incl. the worst
    # complementarity product); x-accuracy ~ sqrt(comp), so matching ADMM
    # to 1e-5 needs a tight tol here.
    ip = solve_qp_optnet(data.Q, data.p, data.A, data.b, G, h,
                         config=OptNetConfig(tol=1e-11, max_iters=60))
    admm = solve_box_qp(*data, config=BoxQPConfig(eps_abs=1e-9, eps_rel=1e-9,
                                                  max_iters=50000))
    assert bool(jnp.all(ip.converged))
    np.testing.assert_allclose(np.asarray(ip.x), np.asarray(admm.x),
                               rtol=1e-4, atol=1e-5)


def test_optnet_no_equality():
    data, G, h = _data_Gh(20, 3, seed=1)
    ip = solve_qp_optnet(data.Q, data.p, None, None, G, h,
                         config=OptNetConfig(tol=1e-8, max_iters=50))
    admm = solve_box_qp(data.Q, data.p, None, None, data.lb, data.ub,
                        config=BoxQPConfig(eps_abs=1e-9, eps_rel=1e-9,
                                           max_iters=50000))
    assert bool(jnp.all(ip.converged))
    np.testing.assert_allclose(np.asarray(ip.x), np.asarray(admm.x),
                               rtol=1e-4, atol=1e-5)


def test_optnet_general_inequalities():
    """Non-box G: random inequalities around a strictly feasible point."""
    key = jax.random.PRNGKey(2)
    B, n, ni, m = 3, 12, 8, 2
    ks = jax.random.split(key, 6)
    L = jax.random.normal(ks[0], (B, 2 * n, n), jnp.float64)
    Q = jnp.einsum("bsi,bsj->bij", L, L) / (2 * n) \
        + 0.1 * jnp.eye(n, dtype=jnp.float64)
    p = jax.random.normal(ks[1], (B, n), jnp.float64)
    A = jax.random.normal(ks[2], (B, m, n), jnp.float64)
    x0 = jax.random.normal(ks[3], (B, n), jnp.float64)
    b = jnp.einsum("bmi,bi->bm", A, x0)
    G = jax.random.normal(ks[4], (B, ni, n), jnp.float64)
    h = jnp.einsum("bki,bi->bk", G, x0) \
        + jax.random.uniform(ks[5], (B, ni), jnp.float64, 0.5, 1.5)

    ip = solve_qp_optnet(Q, p, A, b, G, h,
                         config=OptNetConfig(tol=1e-9, max_iters=60))
    assert bool(jnp.all(ip.converged))
    # KKT check: stationarity + feasibility + complementarity.
    lam, s = ip.lams, ip.slacks
    stat = (jnp.einsum("bij,bj->bi", Q, ip.x) + p
            + jnp.einsum("bki,bk->bi", G, lam)
            + jnp.einsum("bmi,bm->bi", A, ip.nus))
    assert float(jnp.max(jnp.abs(stat))) < 1e-6
    assert float(jnp.max(jnp.abs(jnp.einsum("bmi,bi->bm", A, ip.x) - b))) \
        < 1e-6
    viol = jnp.einsum("bki,bi->bk", G, ip.x) - h
    assert float(jnp.max(viol)) < 1e-6
    assert float(jnp.max(lam * s)) < 1e-6


def test_optnet_factor_modes_agree():
    """'condensed' and 'schur' solve the same Newton system with different
    algebra — solutions and implicit gradients must match."""
    data, G, h = _data_Gh(16, 3, seed=9)
    w = jax.random.normal(jax.random.PRNGKey(12), data.p.shape, jnp.float64)
    sols, grads = {}, {}
    for mode in ("condensed", "schur"):
        cfg = OptNetConfig(tol=1e-10, max_iters=80, factor=mode)
        sols[mode] = solve_qp_optnet(data.Q, data.p, data.A, data.b, G, h,
                                     config=cfg)

        def loss(Q, p, cfg=cfg):
            return jnp.sum(w * qp_optnet(Q, p, data.A, data.b, G, h,
                                         config=cfg))

        grads[mode] = jax.grad(loss, argnums=(0, 1))(data.Q, data.p)

    assert bool(jnp.all(sols["condensed"].converged))
    np.testing.assert_allclose(np.asarray(sols["condensed"].x),
                               np.asarray(sols["schur"].x),
                               rtol=1e-6, atol=1e-8)
    # The modes regularize different blocks (int_reg on the n x n H vs the
    # ni x ni Schur complement), so agreement is to O(int_reg) = 1e-6.
    for a, b_, name in zip(grads["condensed"], grads["schur"], ["Q", "p"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=2e-5,
                                   err_msg=f"factor-mode grads: {name}")


def test_optnet_grads_vs_finite_difference():
    data, G, h = _data_Gh(6, 2, seed=3)
    cfg = OptNetConfig(tol=1e-11, max_iters=80)
    w = jax.random.normal(jax.random.PRNGKey(5), data.p.shape, jnp.float64)

    @jax.jit
    def loss(Q, p, h_):
        x = qp_optnet(Q, p, data.A, data.b, G, h_, config=cfg)
        return jnp.sum(w * x)

    gQ, gp, gh = jax.grad(loss, argnums=(0, 1, 2))(data.Q, data.p, h)

    eps = 1e-6
    rng = np.random.RandomState(0)
    Q0, p0, h0 = (np.asarray(v, np.float64) for v in (data.Q, data.p, h))

    # Q lives on the symmetric manifold: finite differences must perturb
    # (i,j) and (j,i) together; the directional derivative then equals
    # g[i,j] + g[j,i] (for i != j).
    gQn = np.asarray(gQ)
    for _ in range(5):
        bi = rng.randint(0, Q0.shape[0])
        i, j = rng.randint(0, Q0.shape[1], size=2)
        Qp, Qm = Q0.copy(), Q0.copy()
        Qp[bi, i, j] += eps
        Qm[bi, i, j] -= eps
        if i != j:
            Qp[bi, j, i] += eps
            Qm[bi, j, i] -= eps
        fd = (float(loss(jnp.asarray(Qp), data.p, h))
              - float(loss(jnp.asarray(Qm), data.p, h))) / (2 * eps)
        want = gQn[bi, i, j] + (gQn[bi, j, i] if i != j else 0.0)
        np.testing.assert_allclose(want, fd, rtol=5e-3, atol=1e-5)

    for arr, g, argi in [(p0, np.asarray(gp), 1), (h0, np.asarray(gh), 2)]:
        for _ in range(5):
            idx = tuple(rng.randint(0, s) for s in arr.shape)
            ap, am = arr.copy(), arr.copy()
            ap[idx] += eps
            am[idx] -= eps
            args_p = [data.Q, data.p, h]
            args_m = [data.Q, data.p, h]
            args_p[argi] = jnp.asarray(ap)
            args_m[argi] = jnp.asarray(am)
            fd = (float(loss(*args_p)) - float(loss(*args_m))) / (2 * eps)
            np.testing.assert_allclose(g[idx], fd, rtol=5e-3, atol=1e-5)


def test_optnet_matches_boxqp_grads():
    """Implicit gradients of IP and ADMM layers must agree on box QPs."""
    from lqp_py_tpu import boxqp
    data, G, h = _data_Gh(10, 2, seed=6)
    w = jax.random.normal(jax.random.PRNGKey(8), data.p.shape, jnp.float64)

    def loss_ip(Q, p):
        x = qp_optnet(Q, p, data.A, data.b, G, h,
                      config=OptNetConfig(tol=1e-11, max_iters=80))
        return jnp.sum(w * x)

    def loss_admm(Q, p):
        x = boxqp(Q, p, data.A, data.b, data.lb, data.ub,
                  config=BoxQPConfig(eps_abs=1e-10, eps_rel=1e-10,
                                     max_iters=100000))
        return jnp.sum(w * x)

    g_ip = jax.grad(loss_ip, argnums=(0, 1))(data.Q, data.p)
    g_admm = jax.grad(loss_admm, argnums=(0, 1))(data.Q, data.p)
    for a, b_, name in zip(g_ip, g_admm, ["Q", "p"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-2, atol=1e-4,
                                   err_msg=f"IP vs ADMM grads: {name}")


def test_polish_preserves_equality_constraints():
    """Polish acceptance must include the equality residual: the refinement
    correction goes through Hinv only (not the full KKT), so without the
    equality term in the acceptance test a polished iterate can drift off
    A x = b and still be accepted (advisor finding, round 2)."""
    for seed in range(4):
        data, G, h = _data_Gh(24, 4, seed=100 + seed)
        sol = solve_qp_optnet(data.Q, data.p, data.A, data.b, G, h,
                              config=OptNetConfig(tol=1e-9, max_iters=60,
                                                  polish=True))
        eq = jnp.max(jnp.abs(
            jnp.einsum("bmi,bi->bm", data.A, sol.x) - data.b))
        assert float(eq) < 1e-6, f"seed {seed}: |Ax-b| = {float(eq):.3e}"
