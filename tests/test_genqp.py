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


def _general_data(seed, B=3, n=10, ni=7, m=2):
    """Random non-box inequalities around a strictly feasible point (the
    recipe of tests/test_optnet.py) — the shape that distinguishes the
    general solver from the box solver."""
    key = jax.random.PRNGKey(seed)
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
    return Q, p, A, b, G, h


def test_genqp_general_G_kkt_and_ip_agreement():
    """Non-box G: KKT-residual oracle + agreement with the interior-point
    solver on the same data."""
    from lqp_py_tpu.models.optnet import solve_qp_optnet
    from lqp_py_tpu import OptNetConfig
    Q, p, A, b, G, h = _general_data(7)
    sol = solve_qp_gen(Q, p, A, b, G, h, config=_cfg())
    assert bool(jnp.all(sol.converged)), (
        int(sol.iterations), float(sol.primal_residual.max()),
        float(sol.dual_residual.max()))
    stat = (jnp.einsum("bij,bj->bi", Q, sol.x) + p
            + jnp.einsum("bki,bk->bi", G, sol.lams)
            + jnp.einsum("bmi,bm->bi", A, sol.nus))
    assert float(jnp.max(jnp.abs(stat))) < 5e-4
    assert float(jnp.max(jnp.abs(
        jnp.einsum("bmi,bi->bm", A, sol.x) - b))) < 1e-5
    assert float(jnp.max(jnp.einsum("bki,bi->bk", G, sol.x) - h)) < 1e-5
    assert float(jnp.max(sol.lams * sol.slacks)) < 1e-4

    ip = solve_qp_optnet(Q, p, A, b, G, h,
                         config=OptNetConfig(tol=1e-10, max_iters=80))
    np.testing.assert_allclose(np.asarray(sol.x), np.asarray(ip.x),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("backward", ["kkt", "conic"])
def test_genqp_general_G_grads_vs_finite_difference(backward):
    """Finite-difference gradcheck of both implicit backwards on non-box G
    (all of Q, p, G, h)."""
    Q, p, A, b, G, h = _general_data(8, B=2, n=8, ni=5, m=2)
    cfg = _cfg(eps_abs=1e-11, eps_rel=1e-11, backward=backward)
    w = jax.random.normal(jax.random.PRNGKey(9), p.shape, jnp.float64)

    @jax.jit
    def loss(Q_, p_, G_, h_):
        x = qp_gen(Q_, p_, A, b, G_, h_, config=cfg)
        return jnp.sum(w * x)

    gQ, gp, gG, gh = jax.grad(loss, argnums=(0, 1, 2, 3))(Q, p, G, h)

    eps = 1e-6
    rng = np.random.RandomState(1)
    Q0, p0, G0, h0 = (np.asarray(v, np.float64) for v in (Q, p, G, h))

    # Q on the symmetric manifold: perturb (i,j) and (j,i) together.
    gQn = np.asarray(gQ)
    for _ in range(4):
        bi = rng.randint(0, Q0.shape[0])
        i, j = rng.randint(0, Q0.shape[1], size=2)
        Qp, Qm = Q0.copy(), Q0.copy()
        Qp[bi, i, j] += eps
        Qm[bi, i, j] -= eps
        if i != j:
            Qp[bi, j, i] += eps
            Qm[bi, j, i] -= eps
        fd = (float(loss(jnp.asarray(Qp), p, G, h))
              - float(loss(jnp.asarray(Qm), p, G, h))) / (2 * eps)
        want = gQn[bi, i, j] + (gQn[bi, j, i] if i != j else 0.0)
        np.testing.assert_allclose(want, fd, rtol=1e-2, atol=1e-4)

    for argi, (arr, g) in enumerate(
            [(p0, np.asarray(gp)), (G0, np.asarray(gG)),
             (h0, np.asarray(gh))], start=1):
        for _ in range(4):
            idx = tuple(rng.randint(0, s) for s in arr.shape)
            ap, am = arr.copy(), arr.copy()
            ap[idx] += eps
            am[idx] -= eps
            args_p = [Q, p, G, h]
            args_m = [Q, p, G, h]
            args_p[argi] = jnp.asarray(ap)
            args_m[argi] = jnp.asarray(am)
            fd = (float(loss(*args_p)) - float(loss(*args_m))) / (2 * eps)
            np.testing.assert_allclose(
                g[idx], fd, rtol=1e-2, atol=1e-4,
                err_msg=f"genqp({backward}) fd arg {argi} idx {idx}")


@pytest.mark.parametrize("per_element", [True, False])
def test_genqp_heterogeneous_batch_rho_gate(per_element):
    """A batch mixing an easy and an ill-conditioned element must converge
    under both adaptive-rho policies (per-element gate and the
    measured-default rescale-all)."""
    key = jax.random.PRNGKey(11)
    ks = jax.random.split(key, 4)
    n, ni = 12, 8
    # Easy element: well-conditioned SPD.  Hard element: condition ~1e4.
    L = jax.random.normal(ks[0], (2, 2 * n, n), jnp.float64)
    Q = jnp.einsum("bsi,bsj->bij", L, L) / (2 * n)
    scale = jnp.concatenate([jnp.ones((n,)),
                             jnp.logspace(0, 4, n)]).reshape(2, n)
    Q = Q * scale[:, :, None] * scale[:, None, :] \
        + 1e-3 * jnp.eye(n, dtype=jnp.float64)
    p = jax.random.normal(ks[1], (2, n), jnp.float64)
    x0 = jax.random.normal(ks[2], (2, n), jnp.float64)
    G = jax.random.normal(ks[3], (2, ni, n), jnp.float64)
    h = jnp.einsum("bki,bi->bk", G, x0) + 0.5
    sol = solve_qp_gen(Q, p, None, None, G, h,
                       config=_cfg(eps_abs=1e-8, eps_rel=1e-8,
                                   adaptive_rho_per_element=per_element))
    assert bool(jnp.all(sol.converged)), (
        int(sol.iterations),
        [float(v) for v in sol.primal_residual],
        [float(v) for v in sol.dual_residual])
    stat = (jnp.einsum("bij,bj->bi", Q, sol.x) + p
            + jnp.einsum("bki,bk->bi", G, sol.lams))
    # Scale-relative stationarity check (Q entries span ~1e8).
    assert float(jnp.max(jnp.abs(stat))) < 1e-3 * float(jnp.max(jnp.abs(Q)))


def test_genqp_jit():
    data, G, h = _data_Gh(10, 2, seed=5)
    cfg = _cfg()
    f = jax.jit(lambda Q, p: solve_qp_gen(Q, p, data.A, data.b, G, h,
                                          config=cfg).x)
    x = f(data.Q, data.p)
    assert bool(jnp.all(jnp.isfinite(x)))


def test_genqp_warm_start_cuts_iterations():
    """Re-solving a drifted problem from the previous solution must
    converge in far fewer iterations (serving workflow parity with the
    box solver's warm_start)."""
    data, G, h = _data_Gh(20, 4, seed=6)
    # check_solved=5 so the iteration counter can resolve the warm-start
    # gain (the default 25-iteration check interval quantizes it away).
    cfg = _cfg(eps_abs=1e-7, eps_rel=1e-7, check_solved=5)
    sol = solve_qp_gen(data.Q, data.p, data.A, data.b, G, h, config=cfg)
    p2 = data.p + 0.005 * jax.random.normal(jax.random.PRNGKey(13),
                                            data.p.shape, jnp.float64)
    cold = solve_qp_gen(data.Q, p2, data.A, data.b, G, h, config=cfg)
    warm = solve_qp_gen(data.Q, p2, data.A, data.b, G, h, config=cfg,
                        warm_start=sol)
    assert bool(jnp.all(warm.converged))
    np.testing.assert_allclose(np.asarray(warm.x), np.asarray(cold.x),
                               rtol=1e-4, atol=1e-5)
    assert int(warm.iterations) < int(cold.iterations), (
        int(warm.iterations), int(cold.iterations))


def test_genqp_anderson_acceleration_hard_set():
    """Safeguarded AA (the SCS acceleration_lookback capability): on the
    ill-conditioned hard set it must converge in strictly fewer iterations
    than the plain splitting, to the same solution (within tolerance
    scale), in BOTH f64 and f32 — the f32 case pins the safeguard (a
    consecutive-growth monitor diverged: 201 -> 20000 iterations)."""
    from lqp_py_tpu.utils.generators import generate_hard_qp

    n, B = 50, 8
    Q, p, A, b, lb, ub = [jnp.asarray(v) for v in
                          generate_hard_qp(n, B, seed=0,
                                           dtype=jnp.float64)[:6]]
    for dtype in (jnp.float64, jnp.float32):
        Qd, pd, Ad, bd, lbd, ubd = [v.astype(dtype)
                                    for v in (Q, p, A, b, lb, ub)]
        G = jnp.concatenate([-jnp.eye(n, dtype=dtype),
                             jnp.eye(n, dtype=dtype)])[None].repeat(B, 0)
        h = jnp.concatenate([-lbd, ubd], axis=1)
        cfg0 = GenQPConfig(eps_abs=1e-5, eps_rel=1e-5)
        plain = solve_qp_gen(Qd, pd, Ad, bd, G, h, cfg0)
        accel = solve_qp_gen(Qd, pd, Ad, bd, G, h,
                             GenQPConfig(eps_abs=1e-5, eps_rel=1e-5,
                                         acceleration=10))
        assert bool(plain.converged.all()) and bool(accel.converged.all())
        assert int(accel.iterations) < int(plain.iterations), dtype
        assert float(jnp.max(jnp.abs(accel.x - plain.x))) < 5e-3, dtype


def test_genqp_acceleration_neutral_when_converged_fast():
    """AA must not perturb problems the plain splitting already solves
    quickly (converged elements are held on the plain map)."""
    data, G, h = _data_Gh(24, 4, seed=3)
    plain = solve_qp_gen(data.Q, data.p, data.A, data.b, G, h,
                         config=_cfg())
    accel = solve_qp_gen(data.Q, data.p, data.A, data.b, G, h,
                         config=_cfg(acceleration=10))
    assert bool(accel.converged.all())
    np.testing.assert_allclose(np.asarray(accel.x), np.asarray(plain.x),
                               rtol=1e-5, atol=1e-5)


def test_scs_control_acceleration_lookback_maps():
    from lqp_py_tpu import scs_control

    cfg = scs_control(acceleration_lookback=7)
    assert cfg.acceleration == 7
    # SCS uses negative lookback for type-I AA; magnitude maps.
    assert scs_control(acceleration_lookback=-5).acceleration == 5


def test_conic_backward_guard_fires_at_flagship_shape():
    """backward='conic' materializes a dense (B, n+m+2n)^2 self-dual system
    (~4.6 GB at B=128, n=1000); the backward must auto-fall back to the
    condensed 'kkt' rule with a warning instead of allocating it
    (round-3 verdict #7).  Traced via eval_shape: no memory is committed."""
    import warnings

    import jax

    from lqp_py_tpu import GenQPConfig
    from lqp_py_tpu.models.genqp import qp_gen

    B, n = 128, 1000
    f32 = jnp.float32
    Q = jax.ShapeDtypeStruct((B, n, n), f32)
    p = jax.ShapeDtypeStruct((B, n), f32)
    A = jax.ShapeDtypeStruct((B, 1, n), f32)
    b = jax.ShapeDtypeStruct((B, 1), f32)
    G = jax.ShapeDtypeStruct((B, 2 * n, n), f32)
    h = jax.ShapeDtypeStruct((B, 2 * n), f32)
    cfg = GenQPConfig(backward="conic")

    def loss(Q, p, A, b, G, h):
        return jnp.sum(qp_gen(Q, p, A, b, G, h, config=cfg))

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = jax.eval_shape(jax.grad(loss, argnums=(0, 1)), Q, p, A, b, G, h)
    assert any("falling back" in str(w.message) for w in caught), \
        "conic-backward scale guard did not fire at the flagship shape"
    assert out[0].shape == (B, n, n)

    # Small shapes stay on the true conic rule (no warning).
    Bs, ns = 2, 12
    Qs = jax.ShapeDtypeStruct((Bs, ns, ns), f32)
    ps = jax.ShapeDtypeStruct((Bs, ns), f32)
    As = jax.ShapeDtypeStruct((Bs, 1, ns), f32)
    bs = jax.ShapeDtypeStruct((Bs, 1), f32)
    Gs = jax.ShapeDtypeStruct((Bs, 2 * ns, ns), f32)
    hs = jax.ShapeDtypeStruct((Bs, 2 * ns), f32)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        jax.eval_shape(jax.grad(loss, argnums=(0, 1)), Qs, ps, As, bs, Gs, hs)
    assert not any("falling back" in str(w.message) for w in caught)
