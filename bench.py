"""Benchmark: reference Experiment-1 protocol on the flagship solver.

Protocol (BASELINE.md): batch=128, dz=1000, eps_abs=eps_rel=1e-5, median
forward+backward wall-clock; data = create_qp_data random SPD box QPs.
The reference's published number on its CPU baseline is ~2.6 s total at
dz=1000 (images/exp_1_n_1000.png) — that is ``vs_baseline``'s denominator.

Prints ONE JSON line to stdout:
  {"metric": "exp1_dz1000_total_s", "value": <median s>, "unit": "s",
   "vs_baseline": <ref_time / our_time>}
Detail (per-size sweep, iterations, convergence, device) goes to stderr
and BENCH_detail.json.
"""

import argparse
import json
import statistics
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from lqp_py_tpu import BoxQPConfig, boxqp, solve_box_qp
from lqp_py_tpu.utils.generators import create_qp_data


# block_until_ready alone can be lazy on experimental remote platforms;
# force() also reads one element back.
from lqp_py_tpu.utils.profiling import force as _force  # noqa: E402


def _checksum(tree):
    """In-graph scalar depending on EVERY output leaf, so fetching it (a)
    guarantees the whole program ran (no dead-code elimination of dual /
    residual extraction) and (b) costs one small host transfer instead of
    the ~3 tunnel round-trips of block_until_ready + slice + read, which
    were inflating every timed call by ~35 ms on the remote TPU."""
    leaves = [l for l in jax.tree_util.tree_leaves(tree) if l is not None]
    return sum(jnp.sum(jnp.abs(jnp.asarray(l).astype(jnp.float32)))
               for l in leaves)

# Reference ADMM-FP totals (s) read off the published charts (BASELINE.md).
REF_TOTAL_S = {10: 0.025, 50: 0.027, 100: 0.068, 250: 0.26, 500: 0.75,
               1000: 2.6}


def bench_one(n_x, n_batch=128, tol=1e-5, n_sims=10, dtype=jnp.float32,
              seed=0):
    # symmetrize=False is protocol-fair: the generators emit exactly
    # symmetric Q and the reference solver performs no symmetrization
    # pass either (solve_box_qp_admm_torch.py:161-215) — the defensive
    # default pays a full (B, n, n) HBM round trip the reference never
    # does.
    cfg = BoxQPConfig(eps_abs=tol, eps_rel=tol, symmetrize=False)
    data = create_qp_data(n_x, n_batch, seed=seed, dtype=dtype)
    Q, p, A, b, lb, ub = data

    # Mosaic sweep-path accuracy, asserted on DEVICE each round (CI runs
    # the pallas kernels in interpret mode only, so a Mosaic regression
    # could otherwise hide behind a still-converging solver).
    from lqp_py_tpu.ops.linalg import spd_inverse_fast

    @jax.jit
    def sweep_residual(Q):
        eye = jnp.eye(Q.shape[-1], dtype=Q.dtype)
        H = Q + eye
        Hi = spd_inverse_fast(H)
        R = jnp.einsum("bij,bjk->bik", H, Hi, precision="highest",
                       preferred_element_type=Q.dtype) - eye
        return jnp.max(jnp.abs(R))

    sweep_res = float(sweep_residual(Q))
    print(f"[bench] dz={n_x} sweep residual {sweep_res:.3e}",
          file=sys.stderr)
    assert 0.0 < sweep_res < 1e-2, (
        f"sweep-path inverse residual {sweep_res:.3e} at n={n_x} — Mosaic "
        f"kernel regression")

    @jax.jit
    def fwd(Q, p):
        sol = solve_box_qp(Q, p, A, b, lb, ub, cfg)
        return sol, _checksum(sol)

    @jax.jit
    def fwd_bwd(Q, p):
        def loss(Q, p):
            x = boxqp(Q, p, A, b, lb, ub, config=cfg)
            return jnp.sum(x)
        l, grads = jax.value_and_grad(loss, argnums=(0, 1))(Q, p)
        return l, grads, _checksum((l, grads))

    # Compile (excluded — steady-state serving numbers; the reference's
    # torch eager path has no compile step to amortize).
    t0 = time.perf_counter()
    sol, _c = fwd(Q, p)
    _force(_c)
    compile_fwd_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    _force(fwd_bwd(Q, p)[-1])
    compile_total_s = time.perf_counter() - t0

    conv = bool(jnp.all(sol.converged))
    iters = int(sol.iterations)

    fwd_times, tot_times = [], []
    for _ in range(n_sims):
        t0 = time.perf_counter()
        float(fwd(Q, p)[-1])
        fwd_times.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(fwd_bwd(Q, p)[-1])
        tot_times.append(time.perf_counter() - t0)

    # Auxiliary device-limited metric: K fwd+bwd solves with DISTINCT cost
    # vectors chained inside one jit (lax.scan; distinct inputs so XLA
    # cannot CSE the work).  The per-call protocol above charges every call
    # ~tens of ms of remote-tunnel dispatch that local hardware would not
    # pay; total/K amortizes it away and measures the device itself.
    K = 4
    dp = jax.random.normal(jax.random.PRNGKey(7), (K,) + p.shape,
                           p.dtype) * 0.01

    @jax.jit
    def chained(Q, p, dp):
        def step(c, d):
            # Perturb Q as well as p: a loop-invariant Q would let XLA
            # hoist the factorization out of the scan and overstate the
            # per-solve device time.
            Qk = Q + jnp.abs(d[0, 0]) * jnp.eye(Q.shape[-1], dtype=Q.dtype)

            def loss(Q, p):
                x = boxqp(Q, p, A, b, lb, ub, config=cfg)
                return jnp.sum(x)
            l, grads = jax.value_and_grad(loss, argnums=(0, 1))(Qk, p + d)
            return c + l + _checksum(grads), None
        out, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), dp)
        return out

    _force(chained(Q, p, dp))
    dev_times = []
    for _ in range(max(n_sims // 2, 2)):
        t0 = time.perf_counter()
        float(chained(Q, p, dp))
        dev_times.append((time.perf_counter() - t0) / K)

    return {
        "n_x": n_x, "n_batch": n_batch, "tol": tol,
        "dtype": jnp.dtype(dtype).name,
        "sweep_residual_inf": sweep_res,
        "fwd_s": statistics.median(fwd_times),
        "total_s": statistics.median(tot_times),
        "device_total_s": statistics.median(dev_times),
        "bwd_s": max(statistics.median(tot_times)
                     - statistics.median(fwd_times), 0.0),
        "iterations": iters, "converged": conv,
        "compile_fwd_s": compile_fwd_s, "compile_total_s": compile_total_s,
        "ref_total_s": REF_TOTAL_S.get(n_x),
        "speedup_vs_ref": (REF_TOTAL_S[n_x] / statistics.median(tot_times)
                           if n_x in REF_TOTAL_S else None),
        "max_primal_residual": float(jnp.max(sol.primal_residual)),
        "max_dual_residual": float(jnp.max(sol.dual_residual)),
    }


def _probe_device(timeout_s=300):
    """Fail fast if the remote TPU tunnel is unresponsive.

    The axon tunnel occasionally dies in a mode where any device call
    hangs indefinitely (no error, no timeout).  Run a trivial matmul in a
    subprocess under a hard timeout so the benchmark aborts with a clear
    message instead of hanging for hours.  Skipped on CPU (tests)."""
    import subprocess
    code = ("import jax, jax.numpy as jnp;"
            "print(float((jnp.ones((128,128))@jnp.ones((128,128)))[0,0]))")
    try:
        subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                       check=True, stdout=subprocess.DEVNULL,
                       stderr=subprocess.DEVNULL)
    except subprocess.TimeoutExpired:
        print(f"[bench] FATAL: device probe (128x128 matmul) did not "
              f"complete within {timeout_s}s — TPU tunnel unresponsive. "
              f"Not benchmarking against a dead device.", file=sys.stderr)
        sys.exit(2)
    except subprocess.CalledProcessError as e:
        print(f"[bench] FATAL: device probe failed (exit {e.returncode}).",
              file=sys.stderr)
        sys.exit(2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="*", default=[1000])
    ap.add_argument("--n-sims", type=int, default=10)
    ap.add_argument("--n-batch", type=int, default=128)
    ap.add_argument("--tol", type=float, default=1e-5)
    ap.add_argument("--f64", action="store_true")
    args = ap.parse_args()

    if args.f64:
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float64 if args.f64 else jnp.float32

    # Probe BEFORE jax.devices() initializes the backend in this process:
    # the remote platform is single-tenant (CLAUDE.md: "ONE process on the
    # TPU at a time"), so the subprocess probe must be the only client
    # while it runs.  jax.config reads don't initialize backends.
    if jax.config.jax_platforms != "cpu":
        _probe_device()

    device = jax.devices()[0]
    detail = {"device": str(device), "platform": device.platform,
              "results": []}
    for n_x in args.sizes:
        r = bench_one(n_x, n_batch=args.n_batch, tol=args.tol,
                      n_sims=args.n_sims, dtype=dtype)
        detail["results"].append(r)
        print(f"[bench] dz={n_x}: fwd={r['fwd_s']:.4f}s "
              f"total={r['total_s']:.4f}s iters={r['iterations']} "
              f"converged={r['converged']} "
              f"speedup={r['speedup_vs_ref']}", file=sys.stderr)

    # Merge with sizes captured by earlier runs (same device/protocol), as
    # experiment_1.py does — a default `--sizes 1000` run must not erase
    # the dz=500 entry README quotes (round-2 verdict, "weak" #1).
    try:
        with open("BENCH_detail.json") as f:
            old = json.load(f)
        if (old.get("device") == detail["device"]
                and old.get("platform") == detail["platform"]):
            fresh = {r["n_x"] for r in detail["results"]}
            dtype_name = jnp.dtype(dtype).name
            # Records written before the dtype field existed were all
            # float32 — default, or they'd erase on the next merge.
            keep = [r for r in old.get("results", [])
                    if r.get("n_x") not in fresh
                    and r.get("n_batch") == args.n_batch
                    and r.get("tol") == args.tol
                    and r.get("dtype", "float32") == dtype_name]
            detail["results"] = sorted(
                detail["results"] + keep, key=lambda r: r["n_x"])
    except (FileNotFoundError, json.JSONDecodeError, KeyError):
        pass

    with open("BENCH_detail.json", "w") as f:
        json.dump(detail, f, indent=2)

    # Headline metric: the largest size captured in THIS run (merged-in
    # older sizes are detail only).
    r = max((r for r in detail["results"] if r["n_x"] in set(args.sizes)),
            key=lambda r: r["n_x"])
    ref = r["ref_total_s"] or r["total_s"]
    print(json.dumps({
        "metric": f"exp1_dz{r['n_x']}_total_s",
        "value": round(r["total_s"], 6),
        "unit": "s",
        "vs_baseline": round(ref / r["total_s"], 3),
    }))


if __name__ == "__main__":
    main()
