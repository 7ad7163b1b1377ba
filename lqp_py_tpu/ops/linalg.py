"""Batched KKT factorization and solves — the L1 numerics of the framework.

TPU-first design
----------------
The reference factorizes the full ``(n_x+n_eq)^2`` KKT matrix with LU and does
an ``lu_solve`` every ADMM iteration (solve_box_qp_admm_torch.py:206-267).
Triangular substitution is sequential and maps poorly onto the MXU, and a
per-iteration ``lu_solve`` with one right-hand side is latency-bound.

Here the KKT operator

    M = [[H, A^T],
         [A, 0  ]],   H = Q + rho*I  (SPD)

is reduced by a Schur complement on the Cholesky factor of ``H``:

    S    = A H^-1 A^T            (n_eq x n_eq, tiny in practice)
    x    = P r + W S^-1 b,       P = H^-1 - W S^-1 W^T,  W = H^-1 A^T
    nu   = S^-1 (W^T r - b)

With ``P`` materialized once (mode ``'inverse'``), every ADMM iteration is a
single batched GEMV — dense, static-shaped, HBM-bandwidth-bound work that XLA
tiles straight onto the MXU.  A ``'cholesky'`` mode keeps triangular factors
and does two batched triangular solves per iteration instead (slightly better
rounding behavior, slower on TPU); both are jit/vmap/shard_map compatible.

Ref parity: replaces components #1's factorization path and #5 (TorchLU,
lu_layer.py:5-58) — see ``kkt_solve_cached`` for the cached-factor
differentiable solve used by unrolled mode.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from jax.lax import linalg as lax_linalg


def _eye_like(Q):
    n = Q.shape[-1]
    return jnp.eye(n, dtype=Q.dtype)


def chol_solve(L, rhs):
    """Solve ``(L L^T) x = rhs`` for batched lower-triangular ``L``.

    ``rhs`` is ``(..., n)`` or ``(..., n, k)``.
    """
    vec = rhs.ndim == L.ndim - 1
    if vec:
        rhs = rhs[..., None]
    y = lax_linalg.triangular_solve(L, rhs, left_side=True, lower=True,
                                    transpose_a=False)
    x = lax_linalg.triangular_solve(L, y, left_side=True, lower=True,
                                    transpose_a=True)
    return x[..., 0] if vec else x


def chol_inverse(L):
    """Explicit SPD inverse from a lower Cholesky factor.

    ``H^-1 = L^-T L^-1`` computed as a triangular solve against the identity
    followed by one symmetric GEMM (MXU-friendly).
    """
    eye = jnp.broadcast_to(_eye_like(L), L.shape)
    Linv = lax_linalg.triangular_solve(L, eye, left_side=True, lower=True)
    return jnp.einsum("...ki,...kj->...ij", Linv, Linv,
                      preferred_element_type=L.dtype)


def spd_inverse(H):
    return chol_inverse(lax_linalg.cholesky(H))


# ---------------------------------------------------------------------------
# Fast SPD inverse: block Schur-complement recursion over MXU GEMMs with a
# Pallas SWEEP kernel at the 128x128 leaves (ops/pallas/spd_inverse.py).
#
# XLA's cholesky + triangular_solve are dominated by sequential column
# recurrences (~55 ms at B=128, n=1000 f32 on v5e); this path keeps all
# O(n^3) work in batched GEMMs and runs the only irreducibly sequential part
# (the leaf pivot loop) inside VMEM. ~3x faster end-to-end, and it is the
# default 'inverse'-mode factorization on TPU.
# ---------------------------------------------------------------------------

_LEAF = 128

# When True, spd_inverse_fast / spd_solve_fast use pure lax ops (Cholesky)
# instead of the Pallas sweep leaves.  Needed under GSPMD tensor-parallel
# sharding: a Mosaic custom call cannot be auto-partitioned by XLA's SPMD
# pass, while the lax decomposition can (see parallel/tp.py).
_FORCE_LAX = False


import contextlib


@contextlib.contextmanager
def lax_linalg_only():
    """Trace-time switch forcing the partitionable lax path."""
    global _FORCE_LAX
    old = _FORCE_LAX
    _FORCE_LAX = True
    try:
        yield
    finally:
        _FORCE_LAX = old


def _sweep_leaf(H):
    from lqp_py_tpu.ops.pallas.spd_inverse import sweep_spd_inverse
    return sweep_spd_inverse(H)


#: Below this size the batch-major Gauss-Jordan beats the 128-padded sweep
#: leaf: a (B, n, n) inverse at n <= 64 otherwise pads to a full 128x128
#: sweep (12.8x the pivots at n=10).  64 keeps the (n, n, B) working set
#: ~2 MB at B=128 (HBM-traffic parity with the sweep leaf).
_GJ_MAX = 64


def _gj_inverse_small(H):
    """Batch-major SPD inverse for small n: transpose to (n, n, B) so the
    BATCH fills the TPU lane dimension, then run the same symmetric sweep
    recurrence as the Pallas leaf (ops/pallas/spd_inverse.py) as plain XLA
    ops — every pivot step is a fully-vectorized rank-1 pass whose inner
    dimension is B, not n, so tiny matrices stop paying 128-lane padding.
    SPD input => every pivot is positive, no pivoting needed."""
    B, n, _ = H.shape
    dtype = H.dtype
    X = jnp.moveaxis(H, 0, -1)                       # (n, n, B)
    iota = jnp.arange(n)

    def step(k, X):
        onehot = (iota == k).astype(dtype)[:, None]  # (n, 1)
        row = jax.lax.dynamic_slice_in_dim(X, k, 1, axis=0)[0]  # (n, B)
        d = jnp.sum(row * onehot, axis=0)            # (B,)
        u = row - onehot                             # (n, B)
        v = u / d
        X = X - u[:, None, :] * v[None, :, :]
        # Pivot correction (sweep: A[k,k] -> -1/d needs an extra -2 after
        # the rank-1 update; see the Pallas kernel derivation).
        return X - 2.0 * (onehot[:, None, :] * onehot[None, :, :])

    X = jax.lax.fori_loop(0, n, step, X)
    return -jnp.moveaxis(X, -1, 0)


def _schur_inverse(H, ee, leaf=_sweep_leaf):
    """Recursive SPD inverse; H is (B, n, n) with n a multiple of _LEAF.

    ``leaf`` inverts the <=128 diagonal blocks: the Pallas sweep kernel on
    a single TPU chip, or plain Cholesky under ``lax_linalg_only`` (the
    recursion itself is all einsums, which XLA's SPMD partitioner can
    shard — a full-size ``lax.linalg.cholesky`` cannot be)."""
    n = H.shape[-1]
    if n <= _LEAF:
        return leaf(H)
    h = (n // _LEAF // 2) * _LEAF
    A = H[..., :h, :h]
    Bm = H[..., :h, h:]
    C = H[..., h:, h:]
    Ai = _schur_inverse(A, ee, leaf)
    T = ee("...ij,...jk->...ik", Ai, Bm)          # Ai B        (h, n-h)
    S = C - ee("...ji,...jk->...ik", Bm, T)       # C - B^T Ai B
    Si = _schur_inverse(S, ee, leaf)
    U = ee("...ij,...jk->...ik", T, Si)           # Ai B Si     (h, n-h)
    TL = Ai + ee("...ik,...jk->...ij", U, T)      # Ai + U (Ai B)^T
    top = jnp.concatenate([TL, -U], axis=-1)
    bot = jnp.concatenate([-jnp.swapaxes(U, -1, -2), Si], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def spd_inverse_fast(H, precision: str = "highest", equilibrate: bool = True):
    """SPD inverse of (B, n, n).  On TPU: Schur recursion + Pallas sweep
    leaves; elsewhere falls back to the Cholesky path.  ``n`` is padded to a
    multiple of 128 with an identity block (exact: the inverse of
    blockdiag(H, I) is blockdiag(H^-1, I)).

    With ``equilibrate=True`` the input is Jacobi-equilibrated first
    (``H' = D H D`` with ``D = diag(H)^-1/2``, so diag(H') = 1) and the
    result unscaled as ``H^-1 = D H'^-1 D``.  Without this, matrices with
    extreme diagonal dynamic range — e.g. the interior-point Schur
    complement ``Rt + diag(1/d)`` whose diagonal spans ~1e8 near
    convergence — lose all accuracy in a fixed-order f32 sweep (observed
    as NaNs in the OptNet solver).  Callers whose operand is already
    equilibrated (the box-QP solver Jacobi-scales Q before adding rho I)
    pass ``equilibrate=False`` and skip four full (B, n, n) HBM passes
    (~5 ms at the flagship shape)."""
    if _FORCE_LAX:
        # GSPMD tensor-parallel path: Schur recursion (partitionable
        # einsums) with Cholesky leaves instead of the Mosaic sweep.
        leaf = spd_inverse
    elif jax.default_backend() != "tpu" or H.dtype != jnp.float32:
        # Mosaic kernels have no f64 support; x64 runs (and CPU) take the
        # lax Cholesky path.
        return spd_inverse(H)
    else:
        leaf = _sweep_leaf
    import functools
    ee = functools.partial(jnp.einsum, precision=precision,
                           preferred_element_type=H.dtype)
    if equilibrate:
        diag = jnp.diagonal(H, axis1=-2, axis2=-1)
        d = jax.lax.rsqrt(jnp.maximum(diag, 1e-30))       # (B, n)
        Hs = H * d[..., :, None] * d[..., None, :]
    else:
        d = None
        Hs = H
    n = H.shape[-1]
    if n <= _GJ_MAX and leaf is _sweep_leaf:
        # Small-n fast path: batch-major Gauss-Jordan, no 128-padding.
        Hi = _gj_inverse_small(Hs)
    else:
        n_pad = -(-n // _LEAF) * _LEAF
        pad = n_pad - n
        if pad:
            B = H.shape[0]
            Hp = jnp.zeros((B, n_pad, n_pad), H.dtype)
            Hp = Hp.at[:, :n, :n].set(Hs)
            Hp = Hp.at[:, n:, n:].set(jnp.eye(pad, dtype=H.dtype))
            Hi = _schur_inverse(Hp, ee, leaf)[:, :n, :n]
        else:
            Hi = _schur_inverse(Hs, ee, leaf)
    if d is None:
        return Hi
    return Hi * d[..., :, None] * d[..., None, :]


@struct.dataclass
class KKTFactors:
    """Factorization state of the reduced KKT operator.

    'inverse' mode keeps the Schur reduction IMPLICIT by default:
    ``Hinv = (Q + rho I)^-1`` plus the low-rank pieces ``W = H^-1 A^T``,
    ``WS = W S^-1`` and ``Sinv = (A H^-1 A^T)^-1`` — the reduced inverse
    ``P = Hinv - WS W^T`` is applied as one (B, n, n) GEMV plus two
    rank-``n_eq`` corrections (n_eq is tiny in this workload), which is
    the same per-iteration HBM traffic as a materialized ``P`` without
    ever building the extra (B, n, n) operand (~2 ms + 0.5 GB at the
    flagship shape).  ``P`` is materialized only on request
    (``materialize_p=True`` — the Pallas fused step consumes a single
    dense operator).

    ``L`` is chol(H) in 'cholesky' mode, else None.
    ``W``/``WS``/``Sinv`` are None when n_eq == 0.
    """

    P: Optional[jax.Array]
    L: Optional[jax.Array]
    W: Optional[jax.Array]
    Sinv: Optional[jax.Array]
    Hinv: Optional[jax.Array] = None
    WS: Optional[jax.Array] = None


def _schur_solve_rec(H, R, ee, leaf=_sweep_leaf):
    """``H^-1 R`` without materializing the full inverse: the two half-size
    blocks are inverted (recursively, sweep leaves) but the cross-block
    pieces are only ever applied to ``R`` — ~40% fewer FLOPs than
    ``_schur_inverse`` when only a few right-hand sides are needed.

    H: (B, n, n) SPD with n a multiple of _LEAF; R: (B, n, k).
    """
    n = H.shape[-1]
    if n <= 2 * _LEAF:
        Hi = _schur_inverse(H, ee, leaf)
        return ee("...ij,...jk->...ik", Hi, R)
    h = (n // _LEAF // 2) * _LEAF
    A = H[..., :h, :h]
    Bm = H[..., :h, h:]
    C = H[..., h:, h:]
    R1 = R[..., :h, :]
    R2 = R[..., h:, :]
    Ai = _schur_inverse(A, ee, leaf)
    T = ee("...ij,...jk->...ik", Ai, Bm)            # Ai B      (h, n-h)
    S = C - ee("...ji,...jk->...ik", Bm, T)         # C - B^T Ai B
    Si = _schur_inverse(S, ee, leaf)
    Y1 = ee("...ij,...jk->...ik", Ai, R1)
    X2 = ee("...ij,...jk->...ik",
            Si, R2 - ee("...ji,...jk->...ik", Bm, Y1))
    X1 = Y1 - ee("...ij,...jk->...ik", T, X2)
    return jnp.concatenate([X1, X2], axis=-2)


def spd_solve_fast(H, R, equilibrate: bool = True,
                   precision: str = "highest"):
    """Solve ``H X = R`` for SPD (B, n, n) H and (B, n, k) R.  On TPU f32:
    Jacobi-equilibrated Schur-recursion solve with sweep leaves (cheaper
    than materializing H^-1 when k << n, e.g. the one-shot backward-pass
    solve); elsewhere a Cholesky solve.

    ``equilibrate=False`` skips the internal diag-rescale passes — pass it
    when the operand is already (approximately) unit-diagonal; callers that
    build H elementwise can fuse the equilibration into the build for free
    (see box_qp_grad_fixed_point).

    ``precision`` controls the recursion GEMMs: "highest" (6-pass bf16,
    f32-exact, solve residual ~2e-6 relative) for forward factorizations
    that feed 1e-5-tolerance residual checks; "high" (3-pass bf16, ~2x
    faster on the MXU, residual ~7e-6 relative) is enough for GRADIENT
    solves, whose consumers tolerate 1e-4-class relative error."""
    if _FORCE_LAX:
        leaf = spd_inverse
    elif jax.default_backend() != "tpu" or H.dtype != jnp.float32:
        return chol_solve(lax_linalg.cholesky(H), R)
    else:
        leaf = _sweep_leaf
    import functools
    ee = functools.partial(jnp.einsum, precision=precision,
                           preferred_element_type=H.dtype)
    if equilibrate:
        diag = jnp.diagonal(H, axis1=-2, axis2=-1)
        d = jax.lax.rsqrt(jnp.maximum(diag, 1e-30))     # (B, n)
        Hs = H * d[..., :, None] * d[..., None, :]
        Rs = R * d[..., :, None]
    else:
        d = None
        Hs, Rs = H, R
    n = H.shape[-1]
    if n <= _GJ_MAX and leaf is _sweep_leaf:
        Hi = _gj_inverse_small(Hs)
        X = ee("...ij,...jk->...ik", Hi, Rs)
    else:
        n_pad = -(-n // _LEAF) * _LEAF
        pad = n_pad - n
        if pad:
            B, k = H.shape[0], R.shape[-1]
            Hp = jnp.zeros((B, n_pad, n_pad), H.dtype)
            Hp = Hp.at[:, :n, :n].set(Hs)
            Hp = Hp.at[:, n:, n:].set(jnp.eye(pad, dtype=H.dtype))
            Rp = jnp.zeros((B, n_pad, k), R.dtype)
            Rp = Rp.at[:, :n, :].set(Rs)
            X = _schur_solve_rec(Hp, Rp, ee, leaf)[:, :n, :]
        else:
            X = _schur_solve_rec(Hs, Rs, ee, leaf)
    if d is None:
        return X
    return X * d[..., :, None]


def factorize_kkt(Q, rho, A, *, mode: str = "inverse",
                  s_reg: float = 0.0, materialize_p: bool = False,
                  equilibrate: bool = True) -> KKTFactors:
    """Factorize ``M = [[Q + rho I, A^T], [A, 0]]`` (batched).

    Q:   (B, n, n) SPD
    rho: (B,) or scalar — per-element ADMM penalty.  ``None`` means Q is
      ALREADY the shifted operand ``H`` (built fused with the scaling
      pass, ops/scaling.py ``scale_problem_h``) — no diagonal add here.
    A:   (B, m, n) or None
    s_reg: optional Tikhonov regularizer added to the Schur complement
      (used by the backward pass where masked A rows can lose rank).
    materialize_p: build the dense reduced inverse ``P`` (needed only by
      consumers of a single dense operator, e.g. the Pallas fused step).
    equilibrate: passed to ``spd_inverse_fast`` — pass False when Q is
      already Jacobi-equilibrated (the solver scaling path).
    """
    if rho is None:
        H = Q
    else:
        rho = jnp.asarray(rho, dtype=Q.dtype)
        rho_diag = jnp.broadcast_to(
            rho[..., None, None] if rho.ndim == 1 else rho,
            Q.shape[:-2] + (1, 1))
        H = Q + rho_diag * _eye_like(Q)

    if mode == "inverse":
        # Materialized-inverse mode never needs a triangular factor:
        # H^-1 comes from the Schur/sweep fast path (Cholesky-free), and
        # the Schur-complement pieces are plain GEMMs against it.
        Hinv = spd_inverse_fast(H, equilibrate=equilibrate)
        if A is None:
            return KKTFactors(P=Hinv if materialize_p else None, L=None,
                              W=None, Sinv=None, Hinv=Hinv)
        At = jnp.swapaxes(A, -1, -2)
        W = jnp.einsum("...ij,...jk->...ik", Hinv, At,
                       preferred_element_type=Q.dtype)   # (B, n, m)
        S = jnp.einsum("...ij,...jk->...ik", A, W,
                       preferred_element_type=Q.dtype)   # (B, m, m)
        if s_reg:
            S = S + s_reg * jnp.eye(S.shape[-1], dtype=S.dtype)
        Sinv = spd_inverse(S)
        WS = jnp.einsum("...im,...mk->...ik", W, Sinv,
                        preferred_element_type=Q.dtype)
        if materialize_p:
            P = Hinv - jnp.einsum("...im,...jm->...ij", WS, W,
                                  preferred_element_type=Q.dtype)
            return KKTFactors(P=P, L=None, W=W, Sinv=Sinv, Hinv=Hinv,
                              WS=WS)
        return KKTFactors(P=None, L=None, W=W, Sinv=Sinv, Hinv=Hinv, WS=WS)

    L = lax_linalg.cholesky(H)
    if A is None:
        return KKTFactors(P=None, L=L, W=None, Sinv=None)
    At = jnp.swapaxes(A, -1, -2)
    W = chol_solve(L, At)                       # (B, n, m)
    S = jnp.einsum("...ij,...jk->...ik", A, W,
                   preferred_element_type=Q.dtype)  # (B, m, m)
    if s_reg:
        S = S + s_reg * jnp.eye(S.shape[-1], dtype=S.dtype)
    Sinv = spd_inverse(S)
    return KKTFactors(P=None, L=L, W=W, Sinv=Sinv)


def kkt_apply(f: KKTFactors, r, b) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Apply the factored KKT inverse: solve M [x; nu] = [r; b].

    r: (B, n); b: (B, m) or None.  Returns (x, nu).
    """
    dense = f.P if f.P is not None else f.Hinv
    if f.W is None:
        if dense is not None:
            x = jnp.einsum("...ij,...j->...i", dense, r,
                           preferred_element_type=r.dtype)
        else:
            x = chol_solve(f.L, r)
        return x, None

    Wt_r = jnp.einsum("...im,...i->...m", f.W, r,
                      preferred_element_type=r.dtype)
    nu = jnp.einsum("...mk,...k->...m", f.Sinv, Wt_r - b,
                    preferred_element_type=r.dtype)
    if f.P is not None:
        # x = P r + W Sinv b
        Sb = jnp.einsum("...mk,...k->...m", f.Sinv, b,
                        preferred_element_type=r.dtype)
        x = (jnp.einsum("...ij,...j->...i", f.P, r,
                        preferred_element_type=r.dtype)
             + jnp.einsum("...im,...m->...i", f.W, Sb,
                          preferred_element_type=r.dtype))
    elif f.Hinv is not None:
        # Implicit P: x = Hinv r - W nu (one dense GEMV + rank-m pieces).
        y = jnp.einsum("...ij,...j->...i", f.Hinv, r,
                       preferred_element_type=r.dtype)
        x = y - jnp.einsum("...im,...m->...i", f.W, nu,
                           preferred_element_type=r.dtype)
    else:
        y = chol_solve(f.L, r)
        x = y - jnp.einsum("...im,...m->...i", f.W, nu,
                           preferred_element_type=r.dtype)
    return x, nu


def kkt_step_operator(f: KKTFactors, b):
    """Precompute ``(P_eff, q)`` so the hot-loop solve is
    ``x = P_eff r - WS (W^T r) + q`` (the middle term drops when P is
    materialized or n_eq == 0).

    In 'inverse' mode with equality constraints, ``q = W Sinv b`` is constant
    across iterations, so the per-iteration work collapses to one dense
    GEMV plus two rank-``n_eq`` corrections.
    Returns (P_eff, q) or None if not in inverse mode.
    """
    dense = f.P if f.P is not None else f.Hinv
    if dense is None:
        return None
    if f.W is None or b is None:
        q = jnp.zeros(dense.shape[:-1], dtype=dense.dtype)
    else:
        Sb = jnp.einsum("...mk,...k->...m", f.Sinv, b,
                        preferred_element_type=dense.dtype)
        q = jnp.einsum("...im,...m->...i", f.W, Sb,
                       preferred_element_type=dense.dtype)
    return dense, q


# ---------------------------------------------------------------------------
# Differentiable cached-factor KKT solve (unrolled mode).
#
# Equivalent role to the reference's TorchLU/TorchLULayer (lu_layer.py:5-58):
# the in-loop solve back-propagates through the *cached* factors instead of
# differentiating the factorization.  For the symmetric KKT operator the VJP
# is one extra factored solve:
#     d = M^-1 (-g);  dM = d [x;nu]^T;  drhs = -d
# ---------------------------------------------------------------------------


@jax.custom_vjp
def kkt_solve_cached(factors: KKTFactors, Q, A, r, b):
    """Solve M(Q, A) [x; nu] = [r; b] using prefactored ``factors``.

    Gradients flow to Q, A, r, b (via the cached factors); the factors
    themselves receive zero cotangent.  ``A``/``b`` may be None.
    """
    x, nu = kkt_apply(factors, r, b)
    return x, nu


def _kkt_solve_cached_fwd(factors, Q, A, r, b):
    x, nu = kkt_apply(factors, r, b)
    return (x, nu), (factors, A, x, nu)


def _kkt_solve_cached_bwd(res, g):
    factors, A, x, nu = res
    g_x, g_nu = g
    if g_nu is None and nu is not None:
        g_nu = jnp.zeros_like(nu)
    dx, dnu = kkt_apply(factors, -g_x,
                        None if g_nu is None else -g_nu)
    # dl/dM = [dx; dnu] [x; nu]^T  (symmetric operator, reference
    # lu_layer.py:52); restricted to the Q and A blocks:
    dQ = jnp.einsum("...i,...j->...ij", dx, x)
    if A is not None:
        # A appears in both off-diagonal blocks: dA = dnu x^T + nu dx^T
        dA = (jnp.einsum("...m,...j->...mj", dnu, x)
              + jnp.einsum("...m,...j->...mj", nu, dx))
        db = -dnu
    else:
        dA = None
        db = None
    dr = -dx
    zero_factors = jax.tree_util.tree_map(jnp.zeros_like, factors)
    return (zero_factors, dQ, dA, dr, db)


kkt_solve_cached.defvjp(_kkt_solve_cached_fwd, _kkt_solve_cached_bwd)
