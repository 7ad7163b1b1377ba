"""Pallas TPU kernel: ADMM x-update GEMV with true per-element early exit.

The lock-step batch semantics of the XLA solver (SURVEY.md §2) make every
batch element pay for the slowest one: even after an element's residuals
pass the tolerance, its 4 MB ``P`` panel is re-read from HBM every
iteration until the whole batch stops.  ``pl.when`` alone cannot fix this —
BlockSpec-driven prefetch still issues the DMA for predicated-off programs
(measured: identical runtime at 0% and 50% converged).

This kernel keeps ``P`` in HBM (``memory_space=ANY``) and issues the tile
DMAs *manually inside* the predicated region, double-buffered, so a
converged element's panel is genuinely never read:

    measured ms/GEMV at (B=128, n=1024) f32 on v5e
      converged:      0%     50%     90%
      this kernel    0.84    0.77    0.12
      XLA einsum     0.69    0.69    0.69

The row-tile product runs on the VPU (multiply + hierarchical lane-fold
reduction) because an MXU matvec at f32-faithful precision is 6 bf16
passes on a 1-column operand — compute-bound at ~1.7 ms (and Mosaic has no
3-pass HIGH lowering).  f32-exact to ~4e-7.

Win case, measured end-to-end (experiments/experiment_straggler.py,
exp_straggler_results.json): a straggler-skewed serving batch — 8
un-ridged hard problems among 120 easy ones, so ~94% of elements are
converged for ~2/3 of the 157-iteration solve — runs **1.11x faster**
than the lock-step XLA path at (B=128, n=1024) f32 (230 vs 254 ms).
The same workload at n=512 still LOSES (0.85x): the per-element
fixed overheads (predicate, DMA bookkeeping, VPU matvec) are a larger
fraction of a 2-row-tile GEMV, and each adaptive-rho refactorization
additionally pays the P materialization the implicit-factor XLA path
avoids.  On the UNIFORM benchmark sets the skip fraction is low and the
~0.15 ms/GEMV VPU-matvec penalty wins: 267 vs 259 ms on the hard set at
n=1024 — hence off by default (``BoxQPConfig.use_pallas_step``); turn it
on for skewed batches at n >= ~1000.

Frozen elements return their previous iterate bitwise (they are at a fixed
point within tolerance).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 256


def _kernel(flags_ref, P_hbm, r_ref, x_ref, o_ref, scratch, sems, *, n: int):
    b = pl.program_id(0)
    nt = n // ROW_TILE

    @pl.when(flags_ref[b] == 0)
    def _active():
        rv = r_ref[0, 0]                                  # (n,)

        def get_dma(slot, t):
            return pltpu.make_async_copy(
                P_hbm.at[b, pl.ds(t * ROW_TILE, ROW_TILE), :],
                scratch.at[slot],
                sems.at[slot])

        get_dma(0, 0).start()

        def body(t, _):
            slot = t % 2
            nxt = (t + 1) % 2

            @pl.when(t + 1 < nt)
            def _():
                get_dma(nxt, t + 1).start()

            get_dma(slot, t).wait()
            prod = scratch[slot] * rv[None, :]
            # Hierarchical reduction: fold lane groups with cheap vector
            # adds first, then one short lane-reduction per row tile.
            seg = jnp.sum(jnp.sum(prod.reshape(ROW_TILE, n // 128, 128),
                                  axis=1), axis=1)
            o_ref[0, 0, pl.ds(t * ROW_TILE, ROW_TILE)] = seg
            return 0

        jax.lax.fori_loop(0, nt, body, 0)

    @pl.when(flags_ref[b] != 0)
    def _frozen():
        o_ref[0, 0, :] = x_ref[0, 0, :]


def gemv_early_exit(P, r, x_prev, converged):
    """``x[b] = P[b] @ r[b]`` for non-converged elements; ``x_prev[b]``
    (bitwise) for converged ones — whose P panel is never read from HBM.

    P (B, n, n) f32 with n a multiple of 256; r/x_prev (B, n);
    converged (B,) bool.
    """
    import functools
    B, n = r.shape
    if n % ROW_TILE != 0:
        raise ValueError(f"gemv_early_exit requires n % {ROW_TILE} == 0, "
                         f"got {n}")
    # VMEM budget: double-buffered P scratch (2 * ROW_TILE * n) plus three
    # (1, 1, n) operand blocks must leave headroom under the 16 MB Mosaic
    # ceiling; past it Mosaic fails at compile with an opaque error.
    vmem_bytes = (2 * ROW_TILE * n + 4 * n) * P.dtype.itemsize
    if vmem_bytes > 12 * 1024 * 1024:
        raise ValueError(
            f"gemv_early_exit scratch ({vmem_bytes/2**20:.1f} MiB at n={n}) "
            f"exceeds the safe VMEM budget (12 MiB); use the XLA einsum "
            f"path (use_pallas_step=False) at this size")
    out = pl.pallas_call(
        functools.partial(_kernel, n=n),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),                 # P (HBM)
                pl.BlockSpec((1, 1, n), lambda b, *_: (b, 0, 0)),  # r
                pl.BlockSpec((1, 1, n), lambda b, *_: (b, 0, 0)),  # x_prev
            ],
            out_specs=pl.BlockSpec((1, 1, n), lambda b, *_: (b, 0, 0)),
            scratch_shapes=[pltpu.VMEM((2, ROW_TILE, n), P.dtype),
                            pltpu.SemaphoreType.DMA((2,))],
        ),
        out_shape=jax.ShapeDtypeStruct((B, 1, n), r.dtype),
        interpret=jax.devices()[0].platform == "cpu",
    )(converged.astype(jnp.int32), P, r[:, None, :], x_prev[:, None, :])
    return out[:, 0, :]


def fused_admm_step(P, r, x, z, u, p, q, lb, ub, rho, converged,
                    alpha: float = 1.0, **_ignored):
    """One ADMM iteration with per-element early exit: the x-update GEMV
    skips converged elements' HBM traffic (the dominant cost); the cheap
    elementwise z/u updates freeze them with ``where``.

    All arrays (B, n)/(B, n, n); ``n`` must be a multiple of 256.
    Returns (x', z', u', r').
    """
    xk = gemv_early_exit(P, r, x, converged) + jnp.where(
        converged[:, None], 0.0, q)
    # For frozen elements gemv returns x (without q); re-freeze exactly.
    x_new = jnp.where(converged[:, None], x, xk)
    xh = alpha * x_new + (1.0 - alpha) * z if alpha != 1.0 else x_new
    z_new = jnp.where(converged[:, None], z,
                      jnp.clip(xh + u, lb, ub))
    u_new = jnp.where(converged[:, None], u, u + (xh - z_new))
    r_new = jnp.where(converged[:, None], r,
                      -p + rho[..., None] * (z_new - u_new))
    return x_new, z_new, u_new, r_new
