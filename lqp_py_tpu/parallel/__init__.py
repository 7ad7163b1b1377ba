"""Distribution layer: device meshes, batch sharding ('dp'), KKT-operator
tensor parallelism ('tp'), and multi-host bring-up."""

from lqp_py_tpu.parallel.mesh import (batch_sharding, initialize_distributed,
                                      make_mesh, shard_batch)
from lqp_py_tpu.parallel.sharded import (boxqp_sharded, solve_box_qp_sharded,
                                         solve_box_qp_shard_map)
from lqp_py_tpu.parallel.tp import (lowered_tp_memory, shard_problem_tp,
                                    solve_box_qp_ip_tp, solve_box_qp_tp,
                                    solve_qp_gen_tp, solve_qp_optnet_tp)

__all__ = [
    "batch_sharding", "initialize_distributed", "make_mesh", "shard_batch",
    "boxqp_sharded", "solve_box_qp_sharded", "solve_box_qp_shard_map",
    "lowered_tp_memory", "shard_problem_tp", "solve_box_qp_tp",
    "solve_qp_gen_tp", "solve_qp_optnet_tp", "solve_box_qp_ip_tp",
]
