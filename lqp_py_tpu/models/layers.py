"""Differentiable QP layer API — the framework's flagship surface.

Parity with the reference L3 layer (``SolveBoxQP`` / ``SolveBoxQPLayer`` /
``BoxQPTH``, solve_box_qp_admm_torch.py:7-105) in JAX idiom:

- ``boxqp(...)`` — a pure differentiable function (``jax.custom_vjp``
  around the while-loop forward; implicit fixed-point or KKT backward, or
  plain autodiff through a scan when ``config.unroll``).
- ``BoxQPLayer`` — a thin callable holding the config (the nn.Module
  analogue, usable inside flax modules or bare jit code).
- ``BoxQP`` — a stateful solve/update wrapper (the ``BoxQPTH`` analogue,
  with its update bug fixed: reference set lb/ub to None instead of the
  new value, solve_box_qp_admm_torch.py:99-102).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from lqp_py_tpu.config import BoxQPConfig
from lqp_py_tpu.models import box_qp_grad as grads
from lqp_py_tpu.models._stateful import StatefulQP
from lqp_py_tpu.models.box_qp import solve_box_qp, solve_box_qp_unrolled
from lqp_py_tpu.ops.precision import solver_precision
from lqp_py_tpu.types import as_vector, like_layout


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _boxqp_implicit(config: BoxQPConfig, Q, p, A, b, lb, ub):
    """Canonical-layout ((B, n)) differentiable solve; returns x."""
    return solve_box_qp(Q, p, A, b, lb, ub, config).x


def _boxqp_fwd(config, Q, p, A, b, lb, ub):
    sol = solve_box_qp(Q, p, A, b, lb, ub, config)
    # Residual set matches the reference's ctx.save_for_backward
    # (solve_box_qp_admm_torch.py:49-51): x, u, lams, nus, Q, A, lb, ub, rho.
    res = (sol.x, sol.u, sol.lams, sol.nus, Q, A,
           lb, ub, sol.rho, (lb is None, ub is None))
    return sol.x, res


@solver_precision
def _boxqp_bwd(config, res, dl_dz):
    x, u, lams, nus, Q, A, lb, ub, rho, (lb_none, ub_none) = res
    B, n = x.shape
    if lb is None:
        lb = jnp.full((B, n), -jnp.inf, x.dtype)
    if ub is None:
        ub = jnp.full((B, n), jnp.inf, x.dtype)
    if config.backward == "kkt":
        dQ, dp, dA, db, dlb, dub = grads.box_qp_grad_kkt(
            dl_dz, x=x, lams=lams, nus=nus, Q=Q, A=A, lb=lb, ub=ub)
    elif config.backward == "fixed_point":
        dQ, dp, dA, db, dlb, dub = grads.box_qp_grad_fixed_point(
            dl_dz, x=x, u=u, lams=lams, nus=nus, Q=Q, A=A, lb=lb, ub=ub,
            rho=rho, reg=config.backward_reg)
    else:
        raise ValueError(f"unknown backward mode {config.backward!r}")
    if A is None:
        dA, db = None, None
    if lb_none:
        dlb = None
    if ub_none:
        dub = None
    return dQ, dp, dA, db, dlb, dub


_boxqp_implicit.defvjp(_boxqp_fwd, _boxqp_bwd)


def boxqp(Q, p, A=None, b=None, lb=None, ub=None,
          config: BoxQPConfig = BoxQPConfig()):
    """Differentiable batched box-QP layer.

    Returns ``x`` in the caller's layout ((B, n, 1) in, (B, n, 1) out).
    Gradients flow to Q, p, A, b, lb, ub via the backward strategy selected
    in ``config`` ('fixed_point' default, 'kkt', or unrolled autodiff when
    ``config.unroll``), mirroring SolveBoxQP.forward
    (solve_box_qp_admm_torch.py:12-18).
    """
    if config.unroll:
        x = solve_box_qp_unrolled(Q, p, A, b, lb, ub, config)
        return like_layout(x, p)
    pv = as_vector(p, "p")
    bv = as_vector(b, "b") if b is not None else None
    lbv = as_vector(lb, "lb") if lb is not None else None
    ubv = as_vector(ub, "ub") if ub is not None else None
    x = _boxqp_implicit(config, Q, pv, A, bv, lbv, ubv)
    return like_layout(x, p)


class BoxQPLayer:
    """Callable layer holding a config (``SolveBoxQP`` analogue)."""

    def __init__(self, config: BoxQPConfig = BoxQPConfig()):
        self.config = config

    def __call__(self, Q, p, A=None, b=None, lb=None, ub=None):
        return boxqp(Q, p, A, b, lb, ub, config=self.config)


class BoxQP(StatefulQP):
    """Stateful solve/update wrapper (``BoxQPTH`` analogue,
    solve_box_qp_admm_torch.py:70-105).

    With ``warm_start=True`` each ``solve()`` reuses the previous solution
    as the starting iterate — the solve/update/re-solve workflow the
    reference class hints at but never implements.  The scaling and KKT
    factorization are cached across solves and invalidated only when an
    ``update()`` touches something other than ``p`` (the serving pattern:
    repeated solves with a drifting cost vector skip the prep entirely)."""

    _extra_fields = ("lb", "ub")

    def __init__(self, Q, p, A=None, b=None, lb=None, ub=None,
                 control: BoxQPConfig = BoxQPConfig(),
                 warm_start: bool = False):
        self._init(Q, p, A, b, lb, ub, control, warm_start)

    def _prepare(self):
        from lqp_py_tpu.models.box_qp import prepare_box_qp
        return prepare_box_qp(self.Q, self.A, self.b, self.lb, self.ub,
                              config=self.control)

    def _solve_prepared(self, prep, p, warm_start):
        from lqp_py_tpu.models.box_qp import solve_box_qp_prepared
        return solve_box_qp_prepared(prep, p, config=self.control,
                                     warm_start=warm_start)

    def update(self, Q=None, p=None, A=None, b=None, lb=None, ub=None,
               control=None):
        self._update(Q, p, A, b, lb, ub, control)
