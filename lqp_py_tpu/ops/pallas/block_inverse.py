"""Pallas TPU kernel: whole-matrix SPD inverse, VMEM-resident block sweep.

Why this exists
---------------
``ops/linalg.spd_inverse_fast`` assembles the (B, n, n) inverse from
128x128 sweep leaves with a block Schur-complement recursion of XLA
einsums.  That recursion is correct and fast relative to
``lax.linalg.cholesky`` (~3x), but every level materializes (B, n/2, n/2)
intermediates in HBM — at the flagship shape (B=128, n=1024 f32) the
recursion moves ~4-5 GB and costs ~23 ms, of which only ~8 ms is MXU
work.

This kernel keeps ONE matrix (4 MB at n=1024) fully resident in VMEM and
runs the classical right-looking *block* Gauss-Jordan sweep over its
128-wide diagonal blocks.  HBM traffic collapses to the irreducible
minimum — read H once, write H^-1 once — and all O(n^3) work happens as
(n, 128) x (128, n) MXU panel GEMMs against VMEM operands.

Block sweep (symmetric Gauss-Jordan; same operator as the 128-leaf kernel
in ``spd_inverse.py``, lifted from scalar pivots to 128x128 pivot blocks):
for each diagonal block K of a symmetric M,

    D          = M[K, K]                 (128 x 128, SPD Schur diagonal)
    V          = M[:, K] D^-1            (n x 128 panel)
    M          = M - V M[:, K]^T         (rank-128 symmetric update)
    M[:, K]    = V,   M[K, :] = V^T      (panel write-back)
    M[K, K]    = -D^-1

After all n/128 block steps, M == -H^-1 (induction over the scalar sweep
operator; every pivot block is an SPD Schur complement, so the in-place
128-pivot scalar sweep of D needs no pivoting).

Reference parity note: same role as ``torch.linalg.lu_factor`` prep
(solve_box_qp_admm_torch.py:206-215); TPU-native mechanics.

MEASURED NEGATIVE RESULT (why spd_inverse_fast does NOT use this): at
(B=128, n=1024) f32 on v5e the kernel is CORRECT (residual ~2e-6) but
~60 ms vs the recursion's 24 ms.  The scalar pivot sweep costs ~0.8 us
of FIXED per-step overhead (lane<->sublane transposes, dynamic row
reads), and with one matrix per program nothing amortizes it: 512
steps/element x 128 elements ~ 54 ms.  The batched 128-leaf kernel
amortizes the same overhead across 32 elements per program
(0.07 us/elem/step).  Lesson recorded here because it keeps being
rediscovered: on TPU the BATCH dimension is what amortizes per-op
overhead — do not trade batch vectorization for memory locality in
scalar-recurrence-heavy kernels.  Kept as the honest implementation of
the minimal-HBM-traffic inverse (useful if a future Mosaic lowers the
pivot loop better) and exercised in interpret mode by the test suite.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 128


def _sweep_tile_ref(d_ref, m: int, dtype):
    """Sweep all ``m`` pivots of the (m, m) symmetric tile held in the
    VMEM scratch ``d_ref``, in place.  Rank-2 fused steps, same derivation
    as spd_inverse.py's ``_sweep_kernel`` minus the batch dimension
    (Mosaic has no value-level dynamic_slice, so rows are read through the
    ref).  Sweeping maps an SPD tile to ``-tile^-1``."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)

    def step(j, _):
        k1 = 2 * j
        k2 = 2 * j + 1
        oh1 = (lane == k1).astype(dtype)                  # (1, m)
        oh2 = (lane == k2).astype(dtype)
        row1 = d_ref[pl.ds(k1, 1), :]                     # (1, m)
        d1 = jnp.sum(row1 * oh1)
        u1 = row1 - oh1
        v1 = u1 / d1
        row2 = d_ref[pl.ds(k2, 1), :]
        u1_k2 = jnp.sum(row1 * oh2)
        row2 = row2 - u1_k2 * v1
        d2 = jnp.sum(row2 * oh2)
        u2 = row2 - oh2
        v2 = u2 / d2
        # Fused rank-2 pass: t -= u1^T v1 + u2^T v2 (rows as (1, m)),
        # then pivot corrections t[k, k] -= 2.
        corr = 2.0 * (jnp.swapaxes(oh1, 0, 1) * oh1
                      + jnp.swapaxes(oh2, 0, 1) * oh2)
        d_ref[...] = (d_ref[...]
                      - jnp.swapaxes(u1, 0, 1) * v1
                      - jnp.swapaxes(u2, 0, 1) * v2
                      - corr)
        return 0

    jax.lax.fori_loop(0, m // 2, step, 0)


def _block_sweep_kernel(h_any, o_ref, d_ref, sem, *, n: int):
    """One matrix per grid step: DMA H[i] into the VMEM out block, run the
    n/BLK block sweep in place, negate."""
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(h_any.at[i], o_ref.at[0], sem)
    cp.start()
    cp.wait()
    dtype = o_ref.dtype
    nb = n // BLK

    def block_step(k, _):
        off = k * BLK
        d_ref[...] = o_ref[0, pl.ds(off, BLK), pl.ds(off, BLK)]
        _sweep_tile_ref(d_ref, BLK, dtype)
        Dinv = -d_ref[...]                                # (BLK, BLK)
        C = o_ref[0, :, pl.ds(off, BLK)]                  # (n, BLK)
        V = jax.lax.dot_general(
            C, Dinv, (((1,), (0,)), ((), ())),
            preferred_element_type=dtype,
            precision=jax.lax.Precision.HIGHEST)          # (n, BLK)
        # Rank-BLK symmetric update of the whole matrix: M -= V C^T.
        o_ref[0] = o_ref[0] - jax.lax.dot_general(
            V, C, (((1,), (1,)), ((), ())),
            preferred_element_type=dtype,
            precision=jax.lax.Precision.HIGHEST)
        # Panel write-back: column K <- V, row K <- V^T, block KK <- -Dinv.
        o_ref[0, :, pl.ds(off, BLK)] = V
        o_ref[0, pl.ds(off, BLK), :] = jnp.swapaxes(V, 0, 1)
        o_ref[0, pl.ds(off, BLK), pl.ds(off, BLK)] = -Dinv
        return 0

    jax.lax.fori_loop(0, nb, block_step, 0)
    o_ref[0] = -o_ref[0]


def block_spd_inverse(H, interpret=None):
    """Batched SPD inverse of (B, n, n) f32 with n a multiple of 128 that
    fits VMEM (n <= 1024 leaves headroom on v5e: 4 MB matrix + panels).
    Input should be (approximately) diagonally equilibrated — same
    contract as the Schur-recursion path it replaces."""
    B, n, n2 = H.shape
    assert n == n2 and n % BLK == 0, H.shape
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    return pl.pallas_call(
        functools.partial(_block_sweep_kernel, n=n),
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, n, n), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, n, n), H.dtype),
        scratch_shapes=[pltpu.VMEM((BLK, BLK), H.dtype),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(H)
