"""Matmul-precision scoping for solver entry points.

On TPU, f32 ``jnp.einsum``/``dot`` default to fast bf16 MXU passes (error
~1e-2 relative) — catastrophic for a solver targeting 1e-5 KKT residuals:
the unchecked equality residual silently reaches O(0.1).  Every solver
entry point is wrapped in ``jax.default_matmul_precision("highest")``
(6-pass f32-accurate MXU); the per-iteration GEMV is HBM-bound, so this
costs ~nothing on TPU while restoring full f32 accuracy.
"""

from __future__ import annotations

import functools

import jax

PRECISION = "highest"


def solver_precision(fn):
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision(PRECISION):
            return fn(*args, **kwargs)
    return wrapped
