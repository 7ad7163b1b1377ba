"""Flax linen integration: differentiable QP layers as nn.Modules.

The reference exposes its layers as ``torch.nn.Module``s
(solve_box_qp_admm_torch.py:7-18, optnet.py:8-15, scs_qp.py:10-17); the
flax analogues below make the QP layers drop-in components of linen models
(e.g. the Experiment-2 architecture: Dense -> BoxQPModule).
"""

from __future__ import annotations


import flax.linen as nn

from lqp_py_tpu.config import BoxQPConfig, GenQPConfig, OptNetConfig
from lqp_py_tpu.models.genqp import qp_gen
from lqp_py_tpu.models.layers import boxqp
from lqp_py_tpu.models.optnet import qp_optnet


class BoxQPModule(nn.Module):
    """Differentiable box-QP layer (``SolveBoxQP`` analogue)."""

    config: BoxQPConfig = BoxQPConfig()

    @nn.compact
    def __call__(self, Q, p, A=None, b=None, lb=None, ub=None):
        return boxqp(Q, p, A, b, lb, ub, config=self.config)


class OptNetModule(nn.Module):
    """Differentiable interior-point QP layer (``OptNet`` analogue)."""

    config: OptNetConfig = OptNetConfig()

    @nn.compact
    def __call__(self, Q, p, A=None, b=None, G=None, h=None):
        return qp_optnet(Q, p, A, b, G, h, config=self.config)


class GenQPModule(nn.Module):
    """Differentiable general-inequality QP layer (``SolveScsQP``
    capability)."""

    config: GenQPConfig = GenQPConfig()

    @nn.compact
    def __call__(self, Q, p, A=None, b=None, G=None, h=None):
        return qp_gen(Q, p, A, b, G, h, config=self.config)


class LinearBoxQP(nn.Module):
    """The Experiment-2 architecture as one module: a Dense layer predicts
    the QP cost vector p, the box-QP layer solves it
    (experiments/experiment_2.py:57-81)."""

    n_x: int
    config: BoxQPConfig = BoxQPConfig()

    @nn.compact
    def __call__(self, features, Q, A=None, b=None, lb=None, ub=None):
        p_hat = nn.Dense(self.n_x, name="cost_head")(features)
        return boxqp(Q, p_hat, A, b, lb, ub, config=self.config)
