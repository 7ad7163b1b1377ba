"""Equality-constrained QP: direct KKT solve + implicit gradient.

Parity with ``torch_solve_qp_eqcon`` / ``torch_solve_qp_eqcon_grad``
(solve_qp_eqcon_torch.py:6-70).  Instead of a generic LU of the full
``[[Q, A^T], [A, 0]]`` system, the solve goes through the Schur-complement
Cholesky factorization in ops/linalg.py (Q is SPD) — half the FLOPs and the
factors are reused for the backward re-solve.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lqp_py_tpu.ops import linalg as lin
from lqp_py_tpu.ops.precision import solver_precision
from lqp_py_tpu.types import EqQPSolution, as_vector, like_layout
from lqp_py_tpu.models.uncon import qp_uncon, solve_qp_uncon


@solver_precision
def solve_qp_eqcon(Q, p, A=None, b=None) -> EqQPSolution:
    """Non-differentiable functional solve (falls back to the unconstrained
    solver when A is None, matching solve_qp_eqcon_torch.py:31-33)."""
    if A is None:
        return solve_qp_uncon(Q, p)
    pv = as_vector(p, "p")
    bv = as_vector(b, "b")
    Q = jnp.asarray(Q)
    Q = 0.5 * (Q + jnp.swapaxes(Q, -1, -2))  # symmetric-manifold input
    f = lin.factorize_kkt(Q, 0.0, jnp.asarray(A), mode="cholesky")
    x, nus = lin.kkt_apply(f, -pv, bv)
    return EqQPSolution(x=x, nus=nus)


@jax.custom_vjp
def qp_eqcon(Q, p, A, b):
    """Differentiable equality-constrained QP solve returning x."""
    if A is None:
        return qp_uncon(Q, p)
    return like_layout(solve_qp_eqcon(Q, p, A, b).x, p)


@solver_precision
def _fwd(Q, p, A, b):
    if A is None:
        raise ValueError("qp_eqcon requires A; use qp_uncon for A=None")
    pv = as_vector(p, "p")
    bv = as_vector(b, "b")
    Q = jnp.asarray(Q)
    Q = 0.5 * (Q + jnp.swapaxes(Q, -1, -2))  # symmetric-manifold input
    f = lin.factorize_kkt(Q, 0.0, jnp.asarray(A), mode="cholesky")
    x, nus = lin.kkt_apply(f, -pv, bv)
    return like_layout(x, p), (f, x, nus, jnp.ndim(p) == 3, jnp.ndim(b) == 3)


@solver_precision
def _bwd(res, g):
    f, x, nus, p3, b3 = res
    dl_dz = g[..., 0] if p3 else g
    # Re-solve the same KKT system with rhs (-dl_dz, 0)
    # (solve_qp_eqcon_torch.py:47-51).
    dx, dnu = lin.kkt_apply(f, -dl_dz, jnp.zeros_like(nus))
    dl_dp = dx
    dl_dQ = 0.5 * (jnp.einsum("...i,...j->...ij", dx, x)
                   + jnp.einsum("...i,...j->...ij", x, dx))
    dl_db = -dnu
    dl_dA = (jnp.einsum("...m,...j->...mj", dnu, x)
             + jnp.einsum("...m,...j->...mj", nus, dx))
    if p3:
        dl_dp = dl_dp[..., None]
    if b3:
        dl_db = dl_db[..., None]
    return dl_dQ, dl_dp, dl_dA, dl_db


qp_eqcon.defvjp(_fwd, _bwd)
