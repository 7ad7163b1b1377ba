"""OSQP-style active-set polish on the ADMM box solver (models/_polish.py).

The contract: with ``polish=True`` the returned (x, lams, nus) are a
near-machine-precision KKT point when the active-set guess is right, and
NEVER worse than the unpolished iterate when it is wrong (per-element
acceptance).  No reference counterpart (/root/reference/lqp_py has no
polish); the comparator is a tight-tolerance solve.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lqp_py_tpu import BoxQPConfig, solve_box_qp
from lqp_py_tpu.utils.generators import (create_qp_data, generate_hard_qp,
                                         kkt_residuals)

TIGHT = BoxQPConfig(eps_abs=1e-12, eps_rel=1e-12, max_iters=50_000)
LOOSE = dict(eps_abs=1e-4, eps_rel=1e-4)


def _max_err(a, b):
    return float(jnp.max(jnp.abs(a - b)))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_polish_reaches_machine_precision(seed):
    d = create_qp_data(30, 8, seed=seed, dtype=jnp.float64)
    tight = solve_box_qp(*d, config=TIGHT)
    pol = solve_box_qp(*d, config=BoxQPConfig(**LOOSE, polish=True))
    assert _max_err(pol.x, tight.x) < 1e-9
    res = kkt_residuals(*d, pol.x, pol.lams, pol.nus)
    for name, r in res.items():
        assert float(jnp.max(r)) < 1e-12, (name, float(jnp.max(r)))


def test_polish_no_equality_and_infinite_bounds():
    d = create_qp_data(20, 4, seed=5, dtype=jnp.float64)
    lb = d.lb.at[:, ::3].set(-jnp.inf)
    ub = d.ub.at[:, 1::4].set(jnp.inf)
    args = (d.Q, d.p, None, None, lb, ub)
    tight = solve_box_qp(*args, config=TIGHT)
    pol = solve_box_qp(*args, config=BoxQPConfig(**LOOSE, polish=True))
    assert _max_err(pol.x, tight.x) < 1e-9
    res = kkt_residuals(*args, pol.x, pol.lams, pol.nus)
    for name, r in res.items():
        assert float(jnp.max(r)) < 1e-12, name


def test_polish_fully_unconstrained_elements():
    # All-infinite bounds: the polish system degenerates to the plain
    # Newton solve and must return the exact unconstrained minimizer.
    d = create_qp_data(12, 3, seed=2, dtype=jnp.float64)
    inf = jnp.full_like(d.lb, jnp.inf)
    pol = solve_box_qp(d.Q, d.p, None, None, -inf, inf,
                       config=BoxQPConfig(**LOOSE, polish=True))
    x_exact = jnp.linalg.solve(d.Q, -d.p[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(pol.x), np.asarray(x_exact),
                               atol=1e-11, rtol=0)


def test_polish_with_pinned_bounds():
    # lb == ub pins are active on both sides; the multiplier may sit on
    # either side and must not be flagged as a wrong active set.
    d = create_qp_data(16, 4, seed=7, dtype=jnp.float64)
    pin = (d.lb + d.ub) / 2
    lb = d.lb.at[:, :4].set(pin[:, :4])
    ub = d.ub.at[:, :4].set(pin[:, :4])
    args = (d.Q, d.p, d.A, d.b, lb, ub)
    tight = solve_box_qp(*args, config=TIGHT)
    pol = solve_box_qp(*args, config=BoxQPConfig(**LOOSE, polish=True))
    assert _max_err(pol.x, tight.x) < 1e-9
    np.testing.assert_allclose(np.asarray(pol.x[:, :4]),
                               np.asarray(pin[:, :4]), atol=1e-12, rtol=0)


def test_polish_hard_set():
    # Ill-conditioned problems at loose tolerance: the slack-filtered
    # detector identifies the active set exactly on these seeds (raw
    # sign-of-u over-detects under over-relaxation), so the polish reaches
    # near-machine precision; at minimum it must never degrade.
    for seed in (0, 1):
        d = generate_hard_qp(24, 8, seed=seed, dtype=jnp.float64)
        tight = solve_box_qp(*d, config=TIGHT)
        plain = solve_box_qp(*d, config=BoxQPConfig(**LOOSE))
        pol = solve_box_qp(*d, config=BoxQPConfig(**LOOSE, polish=True))
        e_plain = _max_err(plain.x, tight.x)
        e_pol = _max_err(pol.x, tight.x)
        assert e_pol <= e_plain * 1.01 + 1e-12, (seed, e_plain, e_pol)
        assert e_pol < 1e-9, (seed, e_pol)


def test_genqp_polish():
    from lqp_py_tpu import GenQPConfig
    from lqp_py_tpu.models.genqp import solve_qp_gen

    for seed in (0, 42):
        d = create_qp_data(30, 8, seed=seed, dtype=jnp.float64)
        G, h = d.with_G_h()
        tight = solve_box_qp(*d, config=TIGHT)
        pol = solve_qp_gen(d.Q, d.p, d.A, d.b, G, h,
                           config=GenQPConfig(**LOOSE, polish=True))
        assert _max_err(pol.x, tight.x) < 1e-9
        # Polished duals satisfy stationarity (to the AL w*eps scale) and
        # complementarity.
        stat = (jnp.einsum("bij,bj->bi", d.Q, pol.x) + d.p
                + jnp.einsum("bki,bk->bi", G, pol.lams)
                + jnp.einsum("bmi,bm->bi", d.A, pol.nus))
        assert float(jnp.max(jnp.abs(stat))) < 1e-6
        assert float(jnp.max(jnp.abs(pol.lams * pol.slacks))) < 1e-12


def test_genqp_polish_with_acceleration():
    from lqp_py_tpu import GenQPConfig
    from lqp_py_tpu.models.genqp import solve_qp_gen

    d = create_qp_data(24, 6, seed=3, dtype=jnp.float64)
    G, h = d.with_G_h()
    tight = solve_box_qp(*d, config=TIGHT)
    pol = solve_qp_gen(d.Q, d.p, d.A, d.b, G, h,
                       config=GenQPConfig(**LOOSE, acceleration=5,
                                          polish=True))
    assert _max_err(pol.x, tight.x) < 1e-8


def test_polish_with_acceleration():
    # The AA path detects the active set off the clipped z (u loses its
    # exact zeros); polish must still reach machine precision.
    d = create_qp_data(24, 6, seed=3, dtype=jnp.float64)
    tight = solve_box_qp(*d, config=TIGHT)
    pol = solve_box_qp(*d, config=BoxQPConfig(**LOOSE, acceleration=5,
                                              polish=True))
    assert _max_err(pol.x, tight.x) < 1e-9


def test_polish_f32_improves_accuracy():
    d = create_qp_data(24, 8, seed=4, dtype=jnp.float32)
    tight = solve_box_qp(*d, config=BoxQPConfig(eps_abs=1e-7, eps_rel=1e-7,
                                                max_iters=20_000))
    plain = solve_box_qp(*d, config=BoxQPConfig(eps_abs=1e-3, eps_rel=1e-3))
    pol = solve_box_qp(*d, config=BoxQPConfig(eps_abs=1e-3, eps_rel=1e-3,
                                              polish=True))
    e_plain = _max_err(plain.x, tight.x)
    e_pol = _max_err(pol.x, tight.x)
    assert e_pol < 1e-5 and e_pol < e_plain * 0.1, (e_plain, e_pol)


def test_polish_gradients_match_unpolished_tight():
    # The implicit fixed-point backward differentiates the SOLUTION; a
    # polished loose solve should give the gradients of a tight solve.
    from lqp_py_tpu.models.layers import boxqp

    d = create_qp_data(10, 3, seed=6, dtype=jnp.float64)

    def loss(cfg):
        def f(Q, p):
            return jnp.sum(boxqp(Q, p, d.A, d.b, d.lb, d.ub, cfg) ** 2)
        return jax.grad(f, argnums=(0, 1))(d.Q, d.p)

    gQ_t, gp_t = loss(TIGHT)
    gQ_p, gp_p = loss(BoxQPConfig(**LOOSE, polish=True))
    np.testing.assert_allclose(np.asarray(gQ_p), np.asarray(gQ_t),
                               atol=1e-7, rtol=0)
    np.testing.assert_allclose(np.asarray(gp_p), np.asarray(gp_t),
                               atol=1e-7, rtol=0)


def test_polish_unrolled_rejected():
    import pytest as _pt
    from lqp_py_tpu.models.box_qp import solve_box_qp_unrolled
    d = create_qp_data(8, 2, seed=0, dtype=jnp.float64)
    with _pt.raises(ValueError, match="polish"):
        solve_box_qp_unrolled(*d, config=BoxQPConfig(polish=True))
    with _pt.raises(ValueError, match="polish"):
        BoxQPConfig(polish=True, unroll=True)


def test_genqp_polish_f32_at_scale_never_degrades():
    """Review finding: at f32/n=200 the old w=1e6 penalty's AL-multiplier
    noise floor (w*eps ~ 0.12) swamped a genuinely negative multiplier
    read and accepted a 500x-degraded point.  With w=1e4 the floor is
    ~1e-3 and the wrong pin must be rejected (or the polish must win)."""
    from lqp_py_tpu import GenQPConfig
    from lqp_py_tpu.models.genqp import solve_qp_gen

    d = create_qp_data(200, 4, seed=0, dtype=jnp.float32)
    G, h = d.with_G_h()
    d64 = jax.tree_util.tree_map(lambda v: jnp.asarray(v, jnp.float64), d)
    tight = solve_box_qp(*d64, config=TIGHT).x.astype(jnp.float32)
    cfg = dict(eps_abs=1e-3, eps_rel=1e-3)
    plain = solve_qp_gen(d.Q, d.p, d.A, d.b, G, h,
                         config=GenQPConfig(**cfg))
    pol = solve_qp_gen(d.Q, d.p, d.A, d.b, G, h,
                       config=GenQPConfig(**cfg, polish=True))
    e_plain = _max_err(plain.x, tight)
    e_pol = _max_err(pol.x, tight)
    assert e_pol <= max(e_plain * 2.0, 1e-4), (e_plain, e_pol)


def test_polish_aa_narrow_box_never_degrades():
    """Review finding: the AA proximity detector fired BOTH sides of a
    narrow (ub - lb ~ tolerance) box, the helper relu-split the
    multiplier read as if it were a pin, and a wrongly-pinned midpoint
    was accepted 1000x off.  Wide double-fires now resolve to the nearer
    side and must reject (or win)."""
    d = create_qp_data(30, 8, seed=0, dtype=jnp.float64)
    ub = d.ub.at[:, :5].set(d.lb[:, :5] + 1e-3)
    args = (d.Q, d.p, d.A, d.b, d.lb, ub)
    tight = solve_box_qp(*args, config=TIGHT)
    cfg = dict(eps_abs=1e-4, eps_rel=1e-4)
    plain = solve_box_qp(*args, config=BoxQPConfig(**cfg, acceleration=5))
    pol = solve_box_qp(*args, config=BoxQPConfig(**cfg, acceleration=5,
                                                 polish=True))
    e_plain = _max_err(plain.x, tight.x)
    e_pol = _max_err(pol.x, tight.x)
    assert e_pol <= e_plain * 1.5 + 1e-10, (e_plain, e_pol)
