import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_platforms", "cpu")
from lqp_py_tpu.ops.pallas.spd_inverse_blocked import block_sweep_spd_inverse

for n in (256, 512):
    B = 3
    k = jax.random.normal(jax.random.PRNGKey(0), (B, n, n), jnp.float32)
    H = jnp.einsum("bij,bkj->bik", k, k) / n + 0.5 * jnp.eye(n, dtype=jnp.float32)
    Hi = block_sweep_spd_inverse(H, interpret=True)
    R = np.einsum("bij,bjk->bik", np.asarray(H, np.float64), np.asarray(Hi, np.float64)) - np.eye(n)
    print(n, "resid", np.max(np.abs(R)))
