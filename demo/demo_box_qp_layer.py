"""Demo: the differentiable layer API with all three backward modes.

Mirror of the reference demo (demo/demo_solve_box_qp_torch_layer.py:25-78):
dz=1000, real autodiff pullback through fixed_point / kkt / unrolled modes.

Run:  python demo/demo_box_qp_layer.py [--n-x 1000 --n-batch 32]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from lqp_py_tpu import BoxQPConfig, BoxQPLayer
from lqp_py_tpu.utils.generators import create_qp_data


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-x", type=int, default=1000)
    ap.add_argument("--n-batch", type=int, default=32)
    ap.add_argument("--tol", type=float, default=1e-5)
    args = ap.parse_args()

    data = create_qp_data(args.n_x, args.n_batch, seed=0, dtype=jnp.float32)
    modes = {
        "fixed_point": BoxQPConfig(eps_abs=args.tol, eps_rel=args.tol,
                                   backward="fixed_point"),
        "kkt": BoxQPConfig(eps_abs=args.tol, eps_rel=args.tol,
                           backward="kkt"),
        "unroll": BoxQPConfig(eps_abs=args.tol, eps_rel=args.tol,
                              unroll=True, unroll_iters=200,
                              adaptive_rho=False),
    }

    grads = {}
    for name, cfg in modes.items():
        layer = BoxQPLayer(cfg)

        @jax.jit
        def loss(Q, p):
            x = layer(Q, p, data.A, data.b, data.lb, data.ub)
            return jnp.sum(x)

        gfn = jax.jit(jax.grad(loss, argnums=(0, 1)))
        g = gfn(data.Q, data.p)
        _ = float(jnp.sum(g[1]))  # force compile+run
        t0 = time.perf_counter()
        g = gfn(data.Q, data.p)
        _ = float(jnp.sum(g[1]))
        dt = time.perf_counter() - t0
        grads[name] = g
        print(f"{name:12s}: fwd+bwd {dt:.3f}s  "
              f"|dQ|max={float(jnp.max(jnp.abs(g[0]))):.4e}  "
              f"|dp|max={float(jnp.max(jnp.abs(g[1]))):.4e}")

    ref = grads["fixed_point"]
    for name in ("kkt", "unroll"):
        dq = float(jnp.max(jnp.abs(grads[name][0] - ref[0])))
        dp = float(jnp.max(jnp.abs(grads[name][1] - ref[1])))
        print(f"{name} vs fixed_point: max|dQ diff|={dq:.2e} "
              f"max|dp diff|={dp:.2e}")


if __name__ == "__main__":
    main()
