"""Multi-device sharding tests on the 8-virtual-CPU mesh (SURVEY.md §4:
multi-host behavior tested via simulated meshes)."""

import numpy as np

import jax
import jax.numpy as jnp

from lqp_py_tpu import BoxQPConfig, solve_box_qp
from lqp_py_tpu.parallel.mesh import make_mesh
from lqp_py_tpu.parallel.sharded import (boxqp_sharded, solve_box_qp_sharded,
                                         solve_box_qp_shard_map)
from lqp_py_tpu.utils.generators import create_qp_data

CFG = BoxQPConfig(eps_abs=1e-7, eps_rel=1e-7)


def _data():
    return create_qp_data(12, n_batch=16, seed=0, dtype=jnp.float64)


def test_gspmd_sharded_matches_single_device():
    data = _data()
    ref = solve_box_qp(*data, config=CFG)
    mesh = make_mesh((8,), ("dp",))
    sol = solve_box_qp_sharded(mesh, *data, config=CFG)
    np.testing.assert_allclose(np.asarray(sol.x), np.asarray(ref.x),
                               rtol=1e-9, atol=1e-12)
    assert bool(jnp.all(sol.converged))


def test_shard_map_matches_single_device():
    data = _data()
    ref = solve_box_qp(*data, config=CFG)
    mesh = make_mesh((8,), ("dp",))
    sol = solve_box_qp_shard_map(mesh, *data, config=CFG)
    # Shards exit on their local convergence test, so iterates agree with
    # the lock-step global solve only to solver tolerance.
    np.testing.assert_allclose(np.asarray(sol.x), np.asarray(ref.x),
                               rtol=1e-4, atol=1e-6)
    assert bool(jnp.all(sol.converged))


def test_sharded_gradients():
    data = _data()
    mesh = make_mesh((8,), ("dp",))
    w = jax.random.normal(jax.random.PRNGKey(0), data.p.shape, jnp.float64)

    def loss_sharded(p):
        x = boxqp_sharded(mesh, data.Q, p, data.A, data.b, data.lb, data.ub,
                          config=CFG)
        return jnp.sum(w * x)

    from lqp_py_tpu import boxqp

    def loss_single(p):
        x = boxqp(data.Q, p, data.A, data.b, data.lb, data.ub, config=CFG)
        return jnp.sum(w * x)

    g_sh = jax.grad(loss_sharded)(data.p)
    g_1 = jax.grad(loss_single)(data.p)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_1),
                               rtol=1e-8, atol=1e-10)


def test_graft_entry_dryrun():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    x = jax.jit(fn)(*args)
    assert np.all(np.isfinite(np.asarray(x)))
    mod.dryrun_multichip(8)


def test_tp_sharded_solve_matches_and_partitions():
    """'tp' axis with a real QP meaning: the KKT operator's column axis is
    sharded over the mesh; results must match the unsharded solve and XLA's
    per-device memory analysis must show the factorization temporaries
    genuinely shrinking (no silent replication)."""
    from lqp_py_tpu.parallel.tp import lowered_tp_memory, solve_box_qp_tp
    from lqp_py_tpu import solve_box_qp

    data = create_qp_data(256, 4, seed=0, dtype=jnp.float64)
    cfg = BoxQPConfig(eps_abs=1e-7, eps_rel=1e-7, max_iters=50000)
    ref = solve_box_qp(*data, config=cfg)

    mesh = make_mesh((2, 4), ("dp", "tp"))
    sol = solve_box_qp_tp(mesh, *data, config=cfg)
    assert bool(jnp.all(sol.converged))
    np.testing.assert_allclose(np.asarray(sol.x), np.asarray(ref.x),
                               rtol=1e-8, atol=1e-10)

    m_tp = lowered_tp_memory(mesh, *data, config=cfg)
    m_1 = lowered_tp_memory(make_mesh((2, 1), ("dp", "tp")), *data,
                            config=cfg)
    # Arguments shard ~4x; temps are bounded by the gathered 128-leaves at
    # this size (ratio improves with n) but must clearly shrink.
    assert m_tp.argument_size_in_bytes < 0.35 * m_1.argument_size_in_bytes
    assert m_tp.temp_size_in_bytes < 0.7 * m_1.temp_size_in_bytes


def test_genqp_and_ip_sharded_equivalence():
    """GSPMD batch sharding is solver-agnostic: the general-inequality and
    interior-point solvers must produce identical results when their batch
    axis is sharded over the mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from lqp_py_tpu import GenQPConfig, OptNetConfig
    from lqp_py_tpu.models.genqp import solve_qp_gen
    from lqp_py_tpu.models.box_ip import solve_box_qp_ip

    data = create_qp_data(24, 8, seed=2, dtype=jnp.float64)
    G, h = data.with_G_h()
    mesh = make_mesh((8,), ("dp",))

    def shard(x):
        return jax.device_put(x, NamedSharding(
            mesh, P("dp", *([None] * (x.ndim - 1)))))

    gcfg = GenQPConfig(eps_abs=1e-7, eps_rel=1e-7, max_iters=100000)
    ref_g = solve_qp_gen(data.Q, data.p, data.A, data.b, G, h, config=gcfg)
    sh_g = jax.jit(lambda *a: solve_qp_gen(*a, config=gcfg))(
        shard(data.Q), shard(data.p), shard(data.A), shard(data.b),
        shard(G), shard(h))
    np.testing.assert_allclose(np.asarray(sh_g.x), np.asarray(ref_g.x),
                               rtol=1e-10, atol=1e-12)

    icfg = OptNetConfig(tol=1e-10, max_iters=60)
    ref_i = solve_box_qp_ip(*data, config=icfg)
    sh_i = jax.jit(lambda *a: solve_box_qp_ip(*a, config=icfg))(
        *[shard(jnp.asarray(v)) for v in data])
    np.testing.assert_allclose(np.asarray(sh_i.x), np.asarray(ref_i.x),
                               rtol=1e-10, atol=1e-12)


def test_tp_sharded_genqp_and_ip_match_and_partition():
    """Round-3 generalization: the 'tp' column-sharding covers the whole
    solver family, not just the box ADMM.  GenQP and both interior points
    route their factorizations through the same partitionable
    spd_*_fast leaves under lax_linalg_only; results must match the
    unsharded solves and the genqp factorization temporaries must shrink
    with the tp degree (no silent replication)."""
    from lqp_py_tpu import GenQPConfig, OptNetConfig
    from lqp_py_tpu.models.box_ip import solve_box_qp_ip
    from lqp_py_tpu.models.genqp import solve_qp_gen
    from lqp_py_tpu.models.optnet import solve_qp_optnet
    from lqp_py_tpu.parallel.tp import (lowered_tp_memory,
                                        solve_box_qp_ip_tp,
                                        solve_qp_gen_tp, solve_qp_optnet_tp)

    data = create_qp_data(64, 4, seed=5, dtype=jnp.float64)
    G, h = data.with_G_h()
    mesh = make_mesh((2, 4), ("dp", "tp"))

    gcfg = GenQPConfig(eps_abs=1e-7, eps_rel=1e-7, max_iters=100000)
    ref_g = solve_qp_gen(data.Q, data.p, data.A, data.b, G, h, config=gcfg)
    tp_g = solve_qp_gen_tp(mesh, data.Q, data.p, data.A, data.b, G, h,
                           config=gcfg)
    assert bool(jnp.all(tp_g.converged))
    np.testing.assert_allclose(np.asarray(tp_g.x), np.asarray(ref_g.x),
                               rtol=1e-6, atol=1e-8)

    icfg = OptNetConfig(tol=1e-10, max_iters=60)
    ref_i = solve_qp_optnet(data.Q, data.p, data.A, data.b, G, h,
                            config=icfg)
    tp_i = solve_qp_optnet_tp(mesh, data.Q, data.p, data.A, data.b, G, h,
                              config=icfg)
    np.testing.assert_allclose(np.asarray(tp_i.x), np.asarray(ref_i.x),
                               rtol=1e-6, atol=1e-8)

    ref_bi = solve_box_qp_ip(*data, config=icfg)
    tp_bi = solve_box_qp_ip_tp(mesh, *data, config=icfg)
    np.testing.assert_allclose(np.asarray(tp_bi.x), np.asarray(ref_bi.x),
                               rtol=1e-6, atol=1e-8)

    # Memory analysis at a size where the 128-leaf recursion partitions
    # (compile only; no execution).
    big = create_qp_data(256, 2, seed=6, dtype=jnp.float64)
    Gb, hb = big.with_G_h()
    m_tp = lowered_tp_memory(mesh, big.Q, big.p, big.A, big.b, Gb, hb,
                             config=gcfg, solver="genqp")
    m_1 = lowered_tp_memory(make_mesh((2, 1), ("dp", "tp")), big.Q, big.p,
                            big.A, big.b, Gb, hb, config=gcfg,
                            solver="genqp")
    assert m_tp.argument_size_in_bytes < 0.35 * m_1.argument_size_in_bytes
    assert m_tp.temp_size_in_bytes < 0.8 * m_1.temp_size_in_bytes


def test_tp_accepts_column_vector_layout():
    """Vectors in the documented (B, n, 1) layout must be canonicalized
    before placement, not misclassified as matrices and sharded over 'tp'
    on the size-1 trailing axis (round-3 review regression)."""
    from lqp_py_tpu.parallel.tp import solve_box_qp_tp

    data = create_qp_data(32, 4, seed=11, dtype=jnp.float64)
    mesh = make_mesh((2, 2), ("dp", "tp"))
    cfg = BoxQPConfig(eps_abs=1e-8, eps_rel=1e-8)
    ref = solve_box_qp(*data, config=cfg)
    col = solve_box_qp_tp(mesh, data.Q, data.p[..., None], data.A,
                          data.b[..., None], data.lb[..., None],
                          data.ub[..., None], config=cfg)
    np.testing.assert_allclose(np.asarray(col.x), np.asarray(ref.x),
                               rtol=1e-10, atol=1e-12)


def test_anderson_sharded_equivalence():
    """The AA update (ring buffers, per-element normal equations, batched
    m x m solve) is pure batch math — sharding the batch axis must not
    change a single bit of the accelerated trajectory."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from lqp_py_tpu import BoxQPConfig
    from lqp_py_tpu.utils.generators import generate_hard_qp

    data = [jnp.asarray(v) for v in
            generate_hard_qp(24, 8, seed=4, dtype=jnp.float64)[:6]]
    mesh = make_mesh((8,), ("dp",))

    def shard(x):
        return jax.device_put(x, NamedSharding(
            mesh, P("dp", *([None] * (x.ndim - 1)))))

    cfg = BoxQPConfig(eps_abs=1e-7, eps_rel=1e-7, acceleration=8)
    ref = solve_box_qp(*data, config=cfg)
    sh = jax.jit(lambda *a: solve_box_qp(*a, config=cfg))(
        *[shard(v) for v in data])
    assert int(sh.iterations) == int(ref.iterations)
    np.testing.assert_allclose(np.asarray(sh.x), np.asarray(ref.x),
                               rtol=1e-10, atol=1e-12)


def test_tp_nx1_matrices_not_squeezed():
    """n_x == 1 makes every matrix operand (B, k, 1) — identical in shape
    to the column-vector layout.  Matrix slots are positional, so the
    operators must NOT be squeezed to 2-D (round-3 review regression:
    the old shape heuristic crashed the tp path for n_x = 1)."""
    from lqp_py_tpu.parallel.tp import solve_box_qp_tp

    data = create_qp_data(1, 4, seed=13, dtype=jnp.float64)
    cfg = BoxQPConfig(eps_abs=1e-9, eps_rel=1e-9)
    ref = solve_box_qp(*data, config=cfg)
    mesh = make_mesh((4, 1), ("dp", "tp"))  # tp=1: size-1 column axis
    sol = solve_box_qp_tp(mesh, *data, config=cfg)
    assert bool(jnp.all(sol.converged))
    np.testing.assert_allclose(np.asarray(sol.x), np.asarray(ref.x),
                               rtol=1e-10, atol=1e-12)
