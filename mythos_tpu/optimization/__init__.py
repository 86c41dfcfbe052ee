"""Optimization: objectives (incl. DiffTRe) and optimizer loops."""

from mythos_tpu.optimization.objective import (
    DiffTReObjective,
    Objective,
    ObjectiveOutput,
    compute_loss,
    compute_loss_and_grad,
    compute_min_segment_neff,
    compute_weights_and_neff,
)
from mythos_tpu.optimization.optimization import (
    Optimizer,
    OptimizerOutput,
    OptimizerState,
    PoolOptimizer,
    SimpleOptimizer,
)

__all__ = [
    "DiffTReObjective",
    "Objective",
    "ObjectiveOutput",
    "Optimizer",
    "OptimizerOutput",
    "OptimizerState",
    "PoolOptimizer",
    "SimpleOptimizer",
    "compute_loss",
    "compute_loss_and_grad",
    "compute_min_segment_neff",
    "compute_weights_and_neff",
]
