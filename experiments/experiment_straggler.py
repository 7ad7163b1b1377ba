"""Straggler-skewed serving benchmark: the per-element early-exit kernel.

The Pallas fused ADMM step (ops/pallas/admm_step.py) skips the HBM read
of a converged element's (n, n) operator panel entirely — a capability
lock-step XLA batching cannot express.  On uniformly-hard batches it
loses ~3% to the plain XLA GEMV (the measured VPU-matvec penalty), so it
is off by default.  This benchmark measures the workload it exists for:
a serving batch where a few ill-conditioned stragglers keep the lock-step
loop alive long after the bulk of the batch has converged (e.g. one hard
MPC instance among many easy ones).

Batch: all ``n_batch`` problems come from the hard generator (so the
equality blocks share one shape); all but ``n_hard`` of them get a ridge
``mean(diag Q) * I`` added, which collapses their condition number and
makes them converge in a few dozen iterations while the un-ridged
stragglers need hundreds — so for most of the solve the skip fraction is
~(1 - n_hard/n_batch).  (A first attempt mixed box-only easy/hard
batches: WITHOUT the equality constraints the "hard" set converges in
~25 iterations and no skew materializes — the difficulty lives in the
sparse equality rows + conditioning, not the box.)

Writes exp_straggler_results.json.

Run:  python experiments/experiment_straggler.py [--n-x 500 --n-hard 8]
"""

import argparse
import json
import statistics
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from lqp_py_tpu import BoxQPConfig, solve_box_qp
from lqp_py_tpu.utils.generators import generate_hard_qp
from lqp_py_tpu.utils.profiling import force as _force


def mixed_batch(n_x, n_batch, n_hard, seed=0):
    hard = generate_hard_qp(n_x, n_batch, seed=seed, dtype=jnp.float32)
    # Ridge the leading (n_batch - n_hard) elements into easy problems;
    # the bounds stay feasible (they are anchored to a point of Ax=b,
    # which does not involve Q).
    ridge = jnp.mean(jnp.diagonal(hard.Q, axis1=-2, axis2=-1),
                     axis=-1)                                # (B,)
    is_easy = (jnp.arange(n_batch) < n_batch - n_hard)
    Q = hard.Q + jnp.where(is_easy, ridge, 0.0)[:, None, None] \
        * jnp.eye(n_x, dtype=hard.Q.dtype)
    return Q, hard.p, hard.A, hard.b, hard.lb, hard.ub


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-x", type=int, default=500)
    ap.add_argument("--n-batch", type=int, default=128)
    ap.add_argument("--n-hard", type=int, default=8)
    ap.add_argument("--tol", type=float, default=1e-5)
    ap.add_argument("--n-reps", type=int, default=7)
    ap.add_argument("--max-iters", type=int, default=4000)
    args = ap.parse_args()

    Q, p, A, b, lb, ub = mixed_batch(args.n_x, args.n_batch, args.n_hard)

    base = dict(eps_abs=args.tol, eps_rel=args.tol, symmetrize=False,
                max_iters=args.max_iters)
    configs = {
        "xla_step": BoxQPConfig(**base),
        "pallas_step": BoxQPConfig(**base, use_pallas_step=True),
    }

    out = {"n_x": args.n_x, "n_batch": args.n_batch, "n_hard": args.n_hard,
           "tol": args.tol, "device": str(jax.devices()[0])}
    sols = {}
    for name, cfg in configs.items():
        @jax.jit
        def solve(Q, p, A, b, lb, ub, cfg=cfg):
            s = solve_box_qp(Q, p, A, b, lb, ub, cfg)
            return s, jnp.sum(s.x) + jnp.sum(s.primal_residual)

        s, c = solve(Q, p, A, b, lb, ub)
        _force(c)
        ts = []
        for _ in range(args.n_reps):
            t0 = time.perf_counter()
            _force(solve(Q, p, A, b, lb, ub)[1])
            ts.append(time.perf_counter() - t0)
        med = statistics.median(ts)
        sols[name] = s
        out[name] = {
            "median_s": med, "times": ts,
            "iterations": int(s.iterations),
            "n_converged": int(jnp.sum(s.converged)),
            "n_problems": int(s.converged.shape[0]),
        }
        print(f"{name:12s} {med*1e3:7.1f} ms  iters={out[name]['iterations']}"
              f"  converged={out[name]['n_converged']}/"
              f"{out[name]['n_problems']}", file=sys.stderr)

    # Both paths must solve the same problems to the same tolerance.
    dx = float(jnp.max(jnp.abs(sols["xla_step"].x - sols["pallas_step"].x)))
    out["max_dx_between_paths"] = dx
    assert out["xla_step"]["n_converged"] == out["pallas_step"]["n_converged"]
    out["pallas_speedup"] = (out["xla_step"]["median_s"]
                             / out["pallas_step"]["median_s"])
    print(f"pallas early-exit speedup on the straggler batch: "
          f"{out['pallas_speedup']:.2f}x  (paths agree to {dx:.2e})",
          file=sys.stderr)

    # Merge by size so the winning (n=1000) and losing (n=500) regimes
    # both stay on record.
    try:
        with open("exp_straggler_results.json") as f:
            all_res = json.load(f)
        if "results" not in all_res:       # migrate the flat layout
            all_res = {"results": {str(all_res.get("n_x")): all_res}}
    except (FileNotFoundError, json.JSONDecodeError):
        all_res = {"results": {}}
    all_res["results"][str(args.n_x)] = out
    with open("exp_straggler_results.json", "w") as f:
        json.dump(all_res, f, indent=2)
    print(json.dumps({"pallas_speedup": round(out["pallas_speedup"], 3),
                      "xla_ms": round(out["xla_step"]["median_s"] * 1e3, 1),
                      "pallas_ms": round(
                          out["pallas_step"]["median_s"] * 1e3, 1)}))


if __name__ == "__main__":
    main()
