"""Micro-bench: spd_inverse_fast precision variants at the flagship shape."""
import time, statistics, sys, functools
import jax, jax.numpy as jnp
from lqp_py_tpu.ops.linalg import spd_inverse_fast, _schur_inverse, _sweep_leaf
from lqp_py_tpu.utils.generators import create_qp_data
from lqp_py_tpu.utils.profiling import force as _force

B, n = 128, 1024
Q, p, A, b, lb, ub = create_qp_data(1000, B, seed=0, dtype=jnp.float32)
# Build the actual factorization operand: scaled Q padded to 1024 + rho I
from lqp_py_tpu.ops import scaling as sca
sp = sca.scale_problem(Q, p, A, b, lb, ub, pad=24)
rho = 0.5 * jnp.sqrt(jnp.maximum(jnp.sum(sp.Q*sp.Q, axis=(-1,-2)) - 24, 0.0)) / jnp.sqrt(jnp.float32(1000))
H = sp.Q + rho[:, None, None] * jnp.eye(n, dtype=jnp.float32)
K = 8
dH = jax.random.normal(jax.random.PRNGKey(3), (K, B), jnp.float32)**2 * 0.01

def timeit(fn, label, reps=5):
    _force(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); float(fn()); ts.append(time.perf_counter()-t0)
    m = statistics.median(ts)/K
    print(f"{label:44s} {m*1000:8.2f} ms/op", file=sys.stderr)
    return m

def chain(op):
    @jax.jit
    def f(H, dH):
        def step(c, d):
            Hk = H + d[:, None, None] * jnp.eye(n, dtype=H.dtype)
            return c + jnp.sum(jnp.abs(op(Hk))), None
        out, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), dH)
        return out
    return lambda: f(H, dH)

def inv_prec(prec):
    def op(Hk):
        return spd_inverse_fast(Hk, precision=prec, equilibrate=False)
    return op

def inv_high_ns(Hk):
    X = spd_inverse_fast(Hk, precision="high", equilibrate=False)
    ee = functools.partial(jnp.einsum, precision="high",
                           preferred_element_type=Hk.dtype)
    HX = ee("bij,bjk->bik", Hk, X)
    X = X + ee("bij,bjk->bik", X, jnp.eye(n, dtype=Hk.dtype) - HX)
    return X

def inv_def_ns(Hk):
    X = spd_inverse_fast(Hk, precision="default", equilibrate=False)
    ee = functools.partial(jnp.einsum, precision="high",
                           preferred_element_type=Hk.dtype)
    HX = ee("bij,bjk->bik", Hk, X)
    X = X + ee("bij,bjk->bik", X, jnp.eye(n, dtype=Hk.dtype) - HX)
    return X

@jax.jit
def resid(H, X):
    R = jnp.einsum("bij,bjk->bik", H, X, precision="highest",
                   preferred_element_type=jnp.float32) - jnp.eye(n, dtype=jnp.float32)
    return jnp.max(jnp.abs(R))

for prec in ("high", "default"):
    timeit(chain(inv_prec(prec)), f"spd_inverse_fast prec={prec}")
    r = float(resid(H, jax.jit(inv_prec(prec))(H)))
    print(f"    residual {r:.3e}", file=sys.stderr)
timeit(chain(inv_high_ns), "high + 1 Newton-Schulz(high)")
print(f"    residual {float(resid(H, jax.jit(inv_high_ns)(H))):.3e}", file=sys.stderr)
timeit(chain(inv_def_ns), "default + 1 Newton-Schulz(high)")
print(f"    residual {float(resid(H, jax.jit(inv_def_ns)(H))):.3e}", file=sys.stderr)

# Roofline: one full-size GEMM at each precision
for prec in ("highest", "high", "default"):
    @jax.jit
    def g(H, dH, prec=prec):
        def step(c, d):
            Hk = H + d[:, None, None] * jnp.eye(n, dtype=H.dtype)
            return c + jnp.sum(jnp.einsum("bij,bjk->bik", Hk, H, precision=prec,
                                          preferred_element_type=jnp.float32)[:, 0]), None
        out, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), dH)
        return out
    timeit(lambda g=g: g(H, dH), f"one (128,1024,1024) GEMM prec={prec}")
