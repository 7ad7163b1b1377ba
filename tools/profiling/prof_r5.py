"""Round-5 profile: where does dz=1000 fwd+bwd device time go?"""
import time, statistics, sys
import jax, jax.numpy as jnp
from lqp_py_tpu import BoxQPConfig, boxqp, solve_box_qp
from lqp_py_tpu.models.box_qp import prepare_box_qp, solve_box_qp_prepared
from lqp_py_tpu.utils.generators import create_qp_data
from lqp_py_tpu.utils.profiling import force as _force

N = 1000
cfg = BoxQPConfig(eps_abs=1e-5, eps_rel=1e-5, symmetrize=False)
Q, p, A, b, lb, ub = create_qp_data(N, 128, seed=0, dtype=jnp.float32)
K = 8

def chk(tree):
    leaves = [l for l in jax.tree_util.tree_leaves(tree) if l is not None]
    return sum(jnp.sum(jnp.abs(jnp.asarray(l).astype(jnp.float32))) for l in leaves)

def timeit(fn, label, reps=6):
    _force(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); float(fn()); ts.append(time.perf_counter()-t0)
    m = statistics.median(ts)
    print(f"{label:34s} {m*1000/K:8.2f} ms/op  (total {m*1000:.1f} ms over K={K})", file=sys.stderr)
    return m/K

dp = jax.random.normal(jax.random.PRNGKey(7), (K,) + p.shape, p.dtype) * 0.01

@jax.jit
def fwd_chain(Q, p, dp):
    def step(c, d):
        Qk = Q + jnp.abs(d[0, 0]) * jnp.eye(N, dtype=Q.dtype)
        sol = solve_box_qp(Qk, p + d, A, b, lb, ub, cfg)
        return c + chk(sol), None
    out, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), dp)
    return out

@jax.jit
def prep_chain(Q, dp):
    def step(c, d):
        Qk = Q + jnp.abs(d[0, 0]) * jnp.eye(N, dtype=Q.dtype)
        pr = prepare_box_qp(Qk, A, b, lb, ub, cfg)
        return c + chk(pr), None
    out, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), dp)
    return out

pr0 = jax.jit(lambda Q: prepare_box_qp(Q, A, b, lb, ub, cfg))(Q)
_force(chk(pr0))

@jax.jit
def iter_chain(pr, p, dp):
    def step(c, d):
        sol = solve_box_qp_prepared(pr, p + d, cfg)
        return c + chk(sol), None
    out, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), dp)
    return out

@jax.jit
def fwdbwd_chain(Q, p, dp):
    def step(c, d):
        Qk = Q + jnp.abs(d[0, 0]) * jnp.eye(N, dtype=Q.dtype)
        def loss(Q, p):
            x = boxqp(Q, p, A, b, lb, ub, config=cfg)
            return jnp.sum(x)
        l, grads = jax.value_and_grad(loss, argnums=(0, 1))(Qk, p + d)
        return c + l + chk(grads), None
    out, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), dp)
    return out

t_fwd  = timeit(lambda: fwd_chain(Q, p, dp),   "fwd solve (scale+factor+iters)")
t_prep = timeit(lambda: prep_chain(Q, dp),     "prepare (scale+factorize)")
t_iter = timeit(lambda: iter_chain(pr0, p, dp),"iterations only (prepared)")
t_tot  = timeit(lambda: fwdbwd_chain(Q, p, dp),"fwd+bwd")
print(f"\nimplied bwd  {1000*(t_tot-t_fwd):7.2f} ms", file=sys.stderr)
print(f"implied fwd-minus-prep {1000*(t_fwd-t_prep):7.2f} ms (iters+checks+polishless tail)", file=sys.stderr)
