"""Worker for the multi-process ``jax.distributed`` test (SURVEY §4(e)).

Each of N CPU processes owns 4 virtual devices (XLA_FLAGS set by the
launching test); together they form one global 'dp' mesh.  The worker
builds globally-sharded problem arrays from its process-local batch slice,
runs the GSPMD-sharded solve collectively, all-gathers the result, and
checks it against a process-local full solve.

Run directly:  XLA_FLAGS=--xla_force_host_platform_device_count=4 \
    python tests/multiprocess_worker.py <pid> <nprocs> <port>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    import jax
    jax.config.update("jax_platforms", "cpu")

    from lqp_py_tpu.parallel.mesh import initialize_distributed, make_mesh
    initialize_distributed(f"127.0.0.1:{port}", nprocs, pid)
    assert jax.process_count() == nprocs, jax.process_count()

    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    from lqp_py_tpu import BoxQPConfig, solve_box_qp
    from lqp_py_tpu.utils.generators import create_qp_data

    n, B = 24, 8
    ndev = len(jax.devices())
    assert B % ndev == 0, (B, ndev)
    # Same seed everywhere: every process generates the full problem, then
    # contributes only its local batch slice to the global array.
    data = create_qp_data(n, B, seed=0, dtype=jnp.float32)
    cfg = BoxQPConfig(eps_abs=1e-6, eps_rel=1e-6, max_iters=20000)

    mesh = make_mesh()  # 1-D 'dp' mesh over ALL global devices
    per_proc = B // nprocs

    def to_global(x):
        x = np.asarray(x)
        sh = NamedSharding(mesh, P("dp", *([None] * (x.ndim - 1))))
        local = x[pid * per_proc:(pid + 1) * per_proc]
        return jax.make_array_from_process_local_data(sh, local,
                                                      global_shape=x.shape)

    g_args = [to_global(v) for v in data]

    @jax.jit
    def run(Q, p, A, b, lb, ub):
        return solve_box_qp(Q, p, A, b, lb, ub, cfg)

    sol = run(*g_args)  # collective SPMD execution across processes
    x_global = multihost_utils.process_allgather(sol.x, tiled=True)
    conv_global = multihost_utils.process_allgather(sol.converged,
                                                    tiled=True)

    # Process-local reference on the full batch (single-device).
    ref = solve_box_qp(*data, config=cfg)
    assert bool(np.all(conv_global)), conv_global
    np.testing.assert_allclose(np.asarray(x_global), np.asarray(ref.x),
                               rtol=2e-4, atol=2e-5)
    print(f"MULTIPROC_OK pid={pid} procs={jax.process_count()} "
          f"devices={ndev}", flush=True)


if __name__ == "__main__":
    main()
