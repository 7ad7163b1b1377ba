"""Direct solvers: equality-constrained and unconstrained QPs
(components #10/#11 of the reference, solve_qp_eqcon_torch.py /
solve_qp_uncon_torch.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from lqp_py_tpu import qp_eqcon, qp_uncon, solve_qp_eqcon, solve_qp_uncon
from lqp_py_tpu.utils.generators import create_qp_data


def _data(n, B, seed):
    return create_qp_data(n, B, seed=seed, dtype=jnp.float64)


def test_uncon_solution():
    d = _data(12, 3, 0)
    sol = solve_qp_uncon(d.Q, d.p)
    res = jnp.einsum("bij,bj->bi", d.Q, sol.x) + d.p
    assert float(jnp.max(jnp.abs(res))) < 1e-9


def test_eqcon_solution():
    d = _data(12, 3, 1)
    sol = solve_qp_eqcon(d.Q, d.p, d.A, d.b)
    stat = (jnp.einsum("bij,bj->bi", d.Q, sol.x) + d.p
            + jnp.einsum("bmi,bm->bi", d.A, sol.nus))
    assert float(jnp.max(jnp.abs(stat))) < 1e-9
    assert float(jnp.max(jnp.abs(
        jnp.einsum("bmi,bi->bm", d.A, sol.x) - d.b))) < 1e-9


def test_eqcon_none_A_falls_back():
    d = _data(8, 2, 2)
    s1 = solve_qp_eqcon(d.Q, d.p, None, None)
    s2 = solve_qp_uncon(d.Q, d.p)
    np.testing.assert_allclose(np.asarray(s1.x), np.asarray(s2.x))
    assert s1.nus is None


def _fd_check(loss, args, grads, names, eps=1e-6, k=6):
    rng = np.random.RandomState(0)
    arrays = [np.asarray(a, np.float64) for a in args]
    for i, (g, name) in enumerate(zip(grads, names)):
        g = np.asarray(g)
        for _ in range(k):
            idx = tuple(rng.randint(0, s) for s in g.shape)
            ap = [a.copy() for a in arrays]
            am = [a.copy() for a in arrays]
            ap[i][idx] += eps
            am[i][idx] -= eps
            if name == "Q" and idx[-1] != idx[-2]:
                # symmetric-manifold perturbation
                jidx = (idx[0], idx[2], idx[1])
                ap[i][jidx] += eps
                am[i][jidx] -= eps
                want = g[idx] + g[jidx]
            else:
                want = g[idx]
            fd = (float(loss(*map(jnp.asarray, ap)))
                  - float(loss(*map(jnp.asarray, am)))) / (2 * eps)
            np.testing.assert_allclose(want, fd, rtol=1e-4, atol=1e-7,
                                       err_msg=f"{name}@{idx}")


def test_uncon_grads():
    d = _data(7, 2, 3)
    w = jax.random.normal(jax.random.PRNGKey(0), d.p.shape, jnp.float64)

    @jax.jit
    def loss(Q, p):
        return jnp.sum(w * qp_uncon(Q, p))

    grads = jax.grad(loss, argnums=(0, 1))(d.Q, d.p)
    _fd_check(loss, (d.Q, d.p), grads, ["Q", "p"])


def test_eqcon_grads():
    d = _data(7, 2, 4)
    w = jax.random.normal(jax.random.PRNGKey(1), d.p.shape, jnp.float64)

    @jax.jit
    def loss(Q, p, A, b):
        return jnp.sum(w * qp_eqcon(Q, p, A, b))

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(d.Q, d.p, d.A, d.b)
    _fd_check(loss, (d.Q, d.p, d.A, d.b), grads, ["Q", "p", "A", "b"])


def test_layout_3d():
    d = _data(6, 2, 5)
    x3 = qp_eqcon(d.Q, d.p[..., None], d.A, d.b[..., None])
    assert x3.shape == (2, 6, 1)
    x2 = qp_eqcon(d.Q, d.p, d.A, d.b)
    np.testing.assert_allclose(np.asarray(x3[..., 0]), np.asarray(x2))
