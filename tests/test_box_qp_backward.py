"""Gradient correctness for the differentiable box-QP layer.

Oracles (SURVEY.md §4): finite differences of the solve at tight tolerance,
and cross-agreement of the three backward modes (fixed_point / kkt /
unrolled autodiff) — the reference demos exercise exactly this triple
(demo/demo_solve_box_qp_torch_layer.py:25-78).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lqp_py_tpu import BoxQPConfig, boxqp
from lqp_py_tpu.utils.generators import create_qp_data

TOL = 1e-10


def _cfg(**kw):
    kw.setdefault("eps_abs", TOL)
    kw.setdefault("eps_rel", TOL)
    kw.setdefault("max_iters", 50000)
    return BoxQPConfig(**kw)


def _loss_fn(data, cfg, key):
    """Random-linear loss on x so dl/dz is a fixed random cotangent."""
    w = jax.random.normal(key, data.p.shape, dtype=data.p.dtype)

    @jax.jit
    def loss(Q, p, lb, ub):
        x = boxqp(Q, p, data.A, data.b, lb, ub, config=cfg)
        return jnp.sum(w * x)

    return loss


def _fd_grad(f, args, i, eps=1e-6):
    """Central finite differences on argument i (flattened)."""
    a = [np.asarray(x, dtype=np.float64) for x in args]
    base = a[i].copy()
    g = np.zeros_like(base)
    it = np.nditer(base, flags=["multi_index"])
    while not it.finished:
        idx = it.multi_index
        a[i] = base.copy()
        a[i][idx] = base[idx] + eps
        fp = float(f(*[jnp.asarray(x) for x in a]))
        a[i][idx] = base[idx] - eps
        fm = float(f(*[jnp.asarray(x) for x in a]))
        g[idx] = (fp - fm) / (2 * eps)
        it.iternext()
    return g


@pytest.mark.parametrize("backward", ["fixed_point", "kkt"])
def test_grads_vs_finite_difference(backward):
    data = create_qp_data(6, n_batch=2, seed=0, dtype=jnp.float64)
    cfg = _cfg(backward=backward)
    loss = _loss_fn(data, cfg, jax.random.PRNGKey(42))
    args = (data.Q, data.p, data.lb, data.ub)
    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(*args)
    names = ["Q", "p", "lb", "ub"]
    for i, (g, name) in enumerate(zip(grads, names)):
        fd = _fd_grad(loss, args, i)
        np.testing.assert_allclose(
            np.asarray(g), fd, rtol=2e-3, atol=5e-5,
            err_msg=f"grad mismatch for {name} ({backward})")


def test_grads_A_b_vs_finite_difference():
    data = create_qp_data(5, n_batch=2, seed=1, dtype=jnp.float64)
    cfg = _cfg()
    w = jax.random.normal(jax.random.PRNGKey(7), data.p.shape,
                          dtype=jnp.float64)

    @jax.jit
    def loss(A, b):
        x = boxqp(data.Q, data.p, A, b, data.lb, data.ub, config=cfg)
        return jnp.sum(w * x)

    gA, gb = jax.grad(loss, argnums=(0, 1))(data.A, data.b)
    fdA = _fd_grad(loss, (data.A, data.b), 0)
    fdb = _fd_grad(loss, (data.A, data.b), 1)
    np.testing.assert_allclose(np.asarray(gA), fdA, rtol=2e-3, atol=5e-5)
    np.testing.assert_allclose(np.asarray(gb), fdb, rtol=2e-3, atol=5e-5)


def test_unrolled_matches_implicit():
    data = create_qp_data(8, n_batch=2, seed=2, dtype=jnp.float64)
    w = jax.random.normal(jax.random.PRNGKey(3), data.p.shape,
                          dtype=jnp.float64)

    def make_loss(cfg):
        def loss(Q, p):
            x = boxqp(Q, p, data.A, data.b, data.lb, data.ub, config=cfg)
            return jnp.sum(w * x)
        return loss

    g_fp = jax.grad(make_loss(_cfg()), argnums=(0, 1))(data.Q, data.p)
    g_un = jax.grad(
        make_loss(_cfg(unroll=True, unroll_iters=4000, adaptive_rho=False)),
        argnums=(0, 1))(data.Q, data.p)
    for a, b, name in zip(g_fp, g_un, ["Q", "p"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-5,
                                   err_msg=f"unroll vs implicit: {name}")


def test_backward_modes_agree():
    data = create_qp_data(12, n_batch=3, seed=4, dtype=jnp.float64)
    w = jax.random.normal(jax.random.PRNGKey(9), data.p.shape,
                          dtype=jnp.float64)

    def g(backward):
        def loss(Q, p, lb, ub):
            x = boxqp(Q, p, data.A, data.b, lb, ub,
                      config=_cfg(backward=backward))
            return jnp.sum(w * x)
        return jax.grad(loss, argnums=(0, 1, 2, 3))(
            data.Q, data.p, data.lb, data.ub)

    g_fp = g("fixed_point")
    g_kkt = g("kkt")
    for a, b, name in zip(g_fp, g_kkt, ["Q", "p", "lb", "ub"]):
        # atol covers weakly-active coordinates where the two linearized
        # systems differ at the regularization scale.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-5,
                                   err_msg=f"fp vs kkt: {name}")


def test_grad_through_jit():
    data = create_qp_data(10, n_batch=2, seed=5, dtype=jnp.float64)
    cfg = _cfg()

    @jax.jit
    def loss(p):
        x = boxqp(data.Q, p, data.A, data.b, data.lb, data.ub, config=cfg)
        return jnp.sum(x ** 2)

    g = jax.grad(loss)(data.p)
    assert g.shape == data.p.shape
    assert bool(jnp.all(jnp.isfinite(g)))


def test_no_bounds_grads_are_eqcon_grads():
    """With infinite bounds the layer reduces to the eqcon solve; implicit
    grads must match the direct eqcon implicit grads."""
    from lqp_py_tpu import qp_eqcon
    data = create_qp_data(7, n_batch=2, seed=6, dtype=jnp.float64)
    w = jax.random.normal(jax.random.PRNGKey(11), data.p.shape,
                          dtype=jnp.float64)

    def loss_box(Q, p):
        x = boxqp(Q, p, data.A, data.b, None, None, config=_cfg())
        return jnp.sum(w * x)

    def loss_eq(Q, p):
        x = qp_eqcon(Q, p, data.A, data.b)
        return jnp.sum(w * x)

    g_box = jax.grad(loss_box, argnums=(0, 1))(data.Q, data.p)
    g_eq = jax.grad(loss_eq, argnums=(0, 1))(data.Q, data.p)
    for a, b in zip(g_box, g_eq):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-8)
