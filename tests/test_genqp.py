"""General-inequality QP solver tests (the SCS-capability replacement)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lqp_py_tpu import BoxQPConfig, GenQPConfig, solve_box_qp
from lqp_py_tpu.models.genqp import qp_gen, solve_qp_gen
from lqp_py_tpu.utils.generators import create_qp_data


def _data_Gh(n_x, n_batch, seed):
    data = create_qp_data(n_x, n_batch, seed=seed, dtype=jnp.float64)
    G, h = data.with_G_h()
    return data, G, h


def _cfg(**kw):
    kw.setdefault("eps_abs", 1e-7)
    kw.setdefault("eps_rel", 1e-7)
    kw.setdefault("max_iters", 100000)
    return GenQPConfig(**kw)


def test_genqp_matches_admm_on_box():
    data, G, h = _data_Gh(20, 4, seed=0)
    gen = solve_qp_gen(data.Q, data.p, data.A, data.b, G, h, config=_cfg())
    admm = solve_box_qp(*data, config=BoxQPConfig(eps_abs=1e-8, eps_rel=1e-8,
                                                  max_iters=100000))
    assert bool(jnp.all(gen.converged)), (
        int(gen.iterations), float(gen.primal_residual.max()),
        float(gen.dual_residual.max()))
    np.testing.assert_allclose(np.asarray(gen.x), np.asarray(admm.x),
                               rtol=1e-4, atol=1e-4)


def test_genqp_kkt_conditions():
    data, G, h = _data_Gh(16, 3, seed=1)
    sol = solve_qp_gen(data.Q, data.p, data.A, data.b, G, h, config=_cfg())
    assert bool(jnp.all(sol.converged))
    stat = (jnp.einsum("bij,bj->bi", data.Q, sol.x) + data.p
            + jnp.einsum("bki,bk->bi", G, sol.lams)
            + jnp.einsum("bmi,bm->bi", data.A, sol.nus))
    assert float(jnp.max(jnp.abs(stat))) < 5e-4
    assert float(jnp.max(jnp.einsum("bki,bi->bk", G, sol.x) - h)) < 1e-5
    assert float(jnp.max(sol.lams * sol.slacks)) < 1e-4


def test_genqp_no_equality():
    data, G, h = _data_Gh(12, 2, seed=2)
    sol = solve_qp_gen(data.Q, data.p, None, None, G, h, config=_cfg())
    assert bool(jnp.all(sol.converged))
    admm = solve_box_qp(data.Q, data.p, None, None, data.lb, data.ub,
                        config=BoxQPConfig(eps_abs=1e-8, eps_rel=1e-8,
                                           max_iters=100000))
    np.testing.assert_allclose(np.asarray(sol.x), np.asarray(admm.x),
                               rtol=1e-4, atol=1e-4)
    assert sol.nus is None


@pytest.mark.parametrize("backward", ["kkt", "conic"])
def test_genqp_grads_vs_admm_layer(backward):
    """Gradient cross-check against the box-QP implicit gradients on the
    same problem expressed with G = [-I; I]."""
    from lqp_py_tpu import boxqp
    data, G, h = _data_Gh(8, 2, seed=3)
    w = jax.random.normal(jax.random.PRNGKey(4), data.p.shape, jnp.float64)

    def loss_gen(Q, p):
        x = qp_gen(Q, p, data.A, data.b, G, h,
                   config=_cfg(backward=backward))
        return jnp.sum(w * x)

    def loss_admm(Q, p):
        x = boxqp(Q, p, data.A, data.b, data.lb, data.ub,
                  config=BoxQPConfig(eps_abs=1e-9, eps_rel=1e-9,
                                     max_iters=200000))
        return jnp.sum(w * x)

    g1 = jax.grad(loss_gen, argnums=(0, 1))(data.Q, data.p)
    g2 = jax.grad(loss_admm, argnums=(0, 1))(data.Q, data.p)
    for a, b, name in zip(g1, g2, ["Q", "p"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=2e-3,
                                   err_msg=f"genqp({backward}) vs admm {name}")


def test_genqp_jit():
    data, G, h = _data_Gh(10, 2, seed=5)
    cfg = _cfg()
    f = jax.jit(lambda Q, p: solve_qp_gen(Q, p, data.A, data.b, G, h,
                                          config=cfg).x)
    x = f(data.Q, data.p)
    assert bool(jnp.all(jnp.isfinite(x)))
