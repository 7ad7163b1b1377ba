"""Unconstrained QP: ``x* = argmin 0.5 x'Qx + p'x  =  -Q^{-1} p``.

Parity with the reference's ``torch_solve_qp_uncon`` /
``torch_solve_qp_uncon_grad`` (solve_qp_uncon_torch.py:4-35), with the
solve done via batched Cholesky (Q is SPD) instead of generic LU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.lax import linalg as lax_linalg

from lqp_py_tpu.ops.linalg import chol_solve
from lqp_py_tpu.ops.precision import solver_precision
from lqp_py_tpu.types import EqQPSolution, as_vector, like_layout


@solver_precision
def solve_qp_uncon(Q, p) -> EqQPSolution:
    """Non-differentiable functional solve.  p: (B, n) or (B, n, 1)."""
    pv = as_vector(p, "p")
    Q = jnp.asarray(Q)
    Q = 0.5 * (Q + jnp.swapaxes(Q, -1, -2))  # symmetric-manifold input
    L = lax_linalg.cholesky(Q)
    x = chol_solve(L, -pv)
    return EqQPSolution(x=x, nus=None)


@jax.custom_vjp
def qp_uncon(Q, p):
    """Differentiable unconstrained QP solve returning x (caller layout)."""
    return like_layout(solve_qp_uncon(Q, p).x, p)


@solver_precision
def _fwd(Q, p):
    pv = as_vector(p, "p")
    Q = jnp.asarray(Q)
    Q = 0.5 * (Q + jnp.swapaxes(Q, -1, -2))  # symmetric-manifold input
    L = lax_linalg.cholesky(Q)
    x = chol_solve(L, -pv)
    return like_layout(x, p), (L, x, jnp.ndim(p) == 3)


@solver_precision
def _bwd(res, g):
    L, x, was_3d = res
    dl_dz = g[..., 0] if was_3d else g
    # dx = Q^{-1} (-dl_dz)  (torch_solve_qp_uncon_grad,
    # solve_qp_uncon_torch.py:19-22).
    dx = chol_solve(L, -dl_dz)
    dl_dp = dx
    dl_dQ = 0.5 * (jnp.einsum("...i,...j->...ij", dx, x)
                   + jnp.einsum("...i,...j->...ij", x, dx))
    if was_3d:
        dl_dp = dl_dp[..., None]
    return dl_dQ, dl_dp


qp_uncon.defvjp(_fwd, _bwd)
