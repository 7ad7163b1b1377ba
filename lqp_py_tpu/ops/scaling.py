"""Problem scaling / preconditioning for the box-QP ADMM solver.

Implements the reference's Jacobi-style diagonal scaling with quantile-blended
``beta`` and row equilibration of the equality constraints
(solve_box_qp_admm_torch.py:161-197), as pure traced functions: everything is
static-shaped and jit-safe (data-dependent branches become ``jnp.where``).

The scaled problem is

    Q' = D Q D,  p' = D p,  A' = E A D,  b' = E b,  lb' = lb / D,  ub' = ub / D

with per-batch-element diagonal vectors ``D (B, n)`` and ``E (B, m)``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class ScaledProblem(NamedTuple):
    Q: jnp.ndarray
    p: jnp.ndarray
    A: Optional[jnp.ndarray]
    b: Optional[jnp.ndarray]
    lb: jnp.ndarray
    ub: jnp.ndarray
    D: jnp.ndarray  # (B, n)
    E: Optional[jnp.ndarray]  # (B, m) or None


def _safe_colnorm(norms):
    """Replace non-positive norms with max(mean, 1e-6) per batch element
    (reference zero-column clamp, solve_box_qp_admm_torch.py:164-168)."""
    fill = jnp.maximum(jnp.mean(norms, axis=-1, keepdims=True), 1e-6)
    return jnp.where(norms <= 0.0, jnp.broadcast_to(fill, norms.shape), norms)


def scale_problem(Q, p, A, b, lb, ub, beta=None) -> ScaledProblem:
    """Compute and apply the scaling.  All inputs in (B, n)/(B, m) layout."""
    # --- D from column inf-norms of Q, blended toward its mean by beta.
    Q_norm = jnp.max(jnp.abs(Q), axis=-2)            # (B, n) column inf-norms
    Q_norm = _safe_colnorm(Q_norm)
    D = jnp.sqrt(1.0 / Q_norm)
    if beta is None:
        # Per-element auto beta = 1 - q10(D)/q90(D)
        # (solve_box_qp_admm_torch.py:171-174).
        q = jnp.quantile(D, jnp.array([0.10, 0.90], dtype=D.dtype), axis=-1)
        beta_v = 1.0 - q[0] / q[1]                   # (B,)
        beta_v = beta_v[..., None]
    else:
        beta_v = jnp.asarray(beta, dtype=D.dtype)
    D = (1.0 - beta_v) * D + beta_v * jnp.mean(D, axis=-1, keepdims=True)

    Qs = D[..., :, None] * Q * D[..., None, :]
    ps = D * p

    As = None
    bs = None
    E = None
    if A is not None:
        AD = A * D[..., None, :]
        A_norm = jnp.max(jnp.abs(AD), axis=-1)       # (B, m) row inf-norms
        A_norm = _safe_colnorm(A_norm)
        E = 1.0 / A_norm
        As = E[..., :, None] * AD
        bs = E * b

    # Division by D keeps +/-inf bounds infinite (D > 0).
    lbs = lb / D
    ubs = ub / D
    return ScaledProblem(Q=Qs, p=ps, A=As, b=bs, lb=lbs, ub=ubs, D=D, E=E)


def identity_scaling(Q, p, A, b, lb, ub) -> ScaledProblem:
    D = jnp.ones_like(p)
    E = None if A is None else jnp.ones_like(b)
    return ScaledProblem(Q=Q, p=p, A=A, b=b, lb=lb, ub=ub, D=D, E=E)
