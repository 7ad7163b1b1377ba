import time, statistics, sys
import jax, jax.numpy as jnp
from lqp_py_tpu.ops.pallas.spd_inverse_blocked import block_sweep_spd_inverse
from lqp_py_tpu.ops.linalg import spd_inverse_fast
from lqp_py_tpu.utils.profiling import force as _force

B = 128
K = 8

def bench(n):
    k = jax.random.normal(jax.random.PRNGKey(0), (B, n, n), jnp.float32)
    H = jnp.einsum("bij,bkj->bik", k, k, precision="highest") / n \
        + 0.5 * jnp.eye(n, dtype=jnp.float32)
    d = jax.lax.rsqrt(jnp.diagonal(H, axis1=-2, axis2=-1))
    H = H * d[:, :, None] * d[:, None, :]   # equilibrated, like solver use
    dH = jax.random.normal(jax.random.PRNGKey(3), (K, B), jnp.float32)**2 * 0.01

    @jax.jit
    def resid(H, X):
        R = jnp.einsum("bij,bjk->bik", H, X, precision="highest",
                       preferred_element_type=jnp.float32) - jnp.eye(n, dtype=jnp.float32)
        return jnp.max(jnp.abs(R))

    Hi = jax.jit(lambda H: block_sweep_spd_inverse(H))(H)
    print(f"n={n} blocked residual {float(resid(H, Hi)):.3e}", file=sys.stderr)

    def chain(op):
        @jax.jit
        def f(H, dH):
            def step(c, d):
                Hk = H + d[:, None, None] * jnp.eye(n, dtype=H.dtype)
                return c + jnp.sum(jnp.abs(op(Hk))), None
            out, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), dH)
            return out
        return lambda: f(H, dH)

    for label, op in (("blocked", lambda Hk: block_sweep_spd_inverse(Hk)),
                      ("schur-rec", lambda Hk: spd_inverse_fast(Hk, equilibrate=False))):
        fn = chain(op)
        _force(fn())
        ts = []
        for _ in range(5):
            t0 = time.perf_counter(); float(fn()); ts.append(time.perf_counter()-t0)
        print(f"n={n} {label:10s} {statistics.median(ts)*1000/K:8.2f} ms/op", file=sys.stderr)

bench(512)
bench(1024)
