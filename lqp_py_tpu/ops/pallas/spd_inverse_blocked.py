"""Pallas TPU kernel: whole-matrix SPD inverse, VMEM-resident block sweep.

Why this exists
---------------
The Schur-recursion inverse (ops/linalg.py ``_schur_inverse`` over the
128-leaf sweep kernel) keeps all O(n^3) work in batched XLA GEMMs, but at
the flagship shape (B=128, n=1024 f32) those GEMMs are nowhere near the
MXU roofline: each batch element's block product is only a few MFLOP, and
every recursion level round-trips block temporaries and concatenations
through HBM.  Measured: 24 ms for the full inverse while ONE full-size
(B, 1024, 1024) GEMM already costs 3.9 ms at any precision — i.e. the
recursion pays ~6 GEMM-equivalents of time for ~1 GEMM-equivalent of
FLOPs, all of it memory traffic and per-op overhead.

This kernel instead processes one batch element per grid step and keeps
its ENTIRE (n, n) matrix resident in VMEM (4 MB at n=1024, under the
16 MB/core ceiling with pipeline headroom): HBM traffic collapses to one
read + one write of the matrix, and every block update is an MXU dot on
VMEM operands.

Algorithm: right-looking block SWEEP (the 128x128 diagonal blocks are
swept with the same fused rank-2 scalar recurrence as the batched leaf
kernel — ops/pallas/spd_inverse.py — then the panel/trailing updates are
rank-128 MXU products).  Sweeping every block of an SPD matrix in order
yields ``-H^-1``; each pivot block is a Schur complement of an SPD
matrix, hence SPD itself — no pivoting.  With ``E_k`` the (n, 128)
identity panel at block k and ``D = M[k,k]``:

    U = M[:, k] - E_k
    V = U @ D^-1
    M <- M - V U^T         (in 128-column strips, VMEM-sized temporaries)
    M[k, k] <- -D^-1       (replaces the rank-update value 2I - D^-1)

Reference parity note: same role as ``torch.linalg.lu_factor`` prep
(solve_box_qp_admm_torch.py:206-215); consumed by ops/linalg.py
``spd_inverse_fast`` for 256 <= n <= 1024 on TPU f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 128
#: Largest n the whole-matrix kernel accepts: the pipelined output block
#: is double-buffered (2 * n^2 * 4 B) and the strip temporaries add
#: ~1.5 MB — n=1024 peaks at ~10 MB of VMEM, leaving headroom under the
#: 16 MB ceiling.  Above this, callers fall back to the Schur recursion.
MAX_N = 1024

_HI = jax.lax.Precision.HIGHEST


def _sweep_block(s_ref):
    """Sweep all 128 pivots of one (BLK, BLK) symmetric VMEM scratch tile
    in place.

    Same fused rank-2 recurrence as the batched leaf kernel
    (ops/pallas/spd_inverse.py:_sweep_kernel) with the batch dimension
    removed: the pivot scalars become O(1) lane reductions.  Row reads go
    through the ref (Mosaic lowers dynamic slicing only on refs).  Leaves
    the fully swept tile (= -S^-1 for SPD S) in ``s_ref``.
    """
    m = s_ref.shape[-1]
    dtype = s_ref.dtype
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)

    def step(j, _):
        k1 = 2 * j
        k2 = 2 * j + 1
        oh1 = (lane == k1).astype(dtype)               # (1, m)
        oh2 = (lane == k2).astype(dtype)
        row1 = s_ref[pl.ds(k1, 1), :]                  # (1, m)
        d1 = jnp.sum(row1 * oh1)
        u1 = row1 - oh1
        v1 = u1 * (1.0 / d1)
        row2 = s_ref[pl.ds(k2, 1), :]
        u1_k2 = jnp.sum(row1 * oh2)
        row2 = row2 - u1_k2 * v1
        d2 = jnp.sum(row2 * oh2)
        u2 = row2 - oh2
        v2 = u2 * (1.0 / d2)
        # One fused rank-2 pass over the tile; (m,1)x(1,m) broadcasts,
        # with the A[k,k] -= 2 pivot corrections folded in (see leaf
        # kernel derivation).
        s_ref[...] = (s_ref[...]
                      - jnp.swapaxes(u1, 0, 1) * v1
                      - jnp.swapaxes(u2, 0, 1) * v2
                      - 2.0 * (jnp.swapaxes(oh1, 0, 1) * oh1
                               + jnp.swapaxes(oh2, 0, 1) * oh2))
        return 0

    jax.lax.fori_loop(0, m // 2, step, 0)


def _kernel(h_hbm, o_ref, d_scr, dsem, *, n: int):
    b = pl.program_id(0)
    cp = pltpu.make_async_copy(h_hbm.at[b], o_ref.at[0], dsem)
    cp.start()
    cp.wait()

    nb = n // BLK
    row_id = jax.lax.broadcasted_iota(jnp.int32, (n, BLK), 0)
    col_id = jax.lax.broadcasted_iota(jnp.int32, (n, BLK), 1)

    for k in range(nb):                      # static unroll, nb <= 8
        kb = k * BLK
        d_scr[...] = o_ref[0, kb:kb + BLK, kb:kb + BLK]
        _sweep_block(d_scr)
        negDinv = d_scr[...]                 # = -D^-1
        Ek = (row_id == col_id + kb).astype(o_ref.dtype)   # (n, BLK)
        U = o_ref[0, :, kb:kb + BLK] - Ek
        V = -jax.lax.dot_general(            # U @ D^-1
            U, negDinv, (((1,), (0,)), ((), ())),
            precision=_HI, preferred_element_type=o_ref.dtype)
        # Trailing + leading update in 128-column strips: M -= V U^T.
        # Strip-wise keeps the dot temporaries at (n, BLK) instead of a
        # second full (n, n) VMEM buffer.
        for j in range(nb):
            jb = j * BLK
            Uj = U[jb:jb + BLK, :]           # (BLK, BLK) rows j of U
            upd = jax.lax.dot_general(       # V @ Uj^T -> (n, BLK)
                V, Uj, (((1,), (1,)), ((), ())),
                precision=_HI, preferred_element_type=o_ref.dtype)
            o_ref[0, :, jb:jb + BLK] = o_ref[0, :, jb:jb + BLK] - upd
        # The rank update leaves M[k,k] = 2I - D^-1; the sweep target is
        # -D^-1 = negDinv.
        o_ref[0, kb:kb + BLK, kb:kb + BLK] = negDinv
    o_ref[0] = -o_ref[0]


def block_sweep_spd_inverse(H, interpret=None):
    """Batched SPD inverse of (B, n, n) f32 with n a multiple of 128,
    256 <= n <= MAX_N.  One grid step per batch element; the whole matrix
    stays in VMEM between block steps."""
    B, n, n2 = H.shape
    assert n == n2 and n % BLK == 0 and BLK < n <= MAX_N, H.shape
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    return pl.pallas_call(
        functools.partial(_kernel, n=n),
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, n, n), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, n, n), H.dtype),
        scratch_shapes=[pltpu.VMEM((BLK, BLK), H.dtype),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(H)
