"""Loss functions over observables.

Parity reference: mythos/losses/observable_wrappers.py:15-63.
"""

from typing import Any

import chex
import jax.numpy as jnp

from mythos_tpu.observables.base import BaseObservable
from mythos_tpu.simulators.io import SimulatorTrajectory
from mythos_tpu.utils.types import Arr, Scalar

loss_input = Arr | tuple[Arr, dict[str, Any]]


@chex.dataclass
class LossFn:
    """Base class for loss functions."""

    def __call__(self, actual: loss_input, target: loss_input, weights: Arr) -> Scalar:
        """Calculate the loss."""
        raise NotImplementedError("Subclasses must implement this method.")


@chex.dataclass
class SquaredError(LossFn):
    """(target - actual)^2."""

    def __call__(self, actual: Arr, target: Arr) -> Scalar:
        return (target - actual) ** 2


@chex.dataclass
class RootMeanSquaredError(LossFn):
    """sqrt(mean((target - actual)^2))."""

    def __call__(self, actual: Arr, target: Arr) -> Scalar:
        return jnp.sqrt(jnp.mean((target - actual) ** 2))


@chex.dataclass
class ObservableLossFn:
    """Reweighted observable expectation + loss vs target.

    The weights are DiffTRe reweighting weights: the observable expectation is
    sum(weights * observable(trajectory)).
    """

    observable: BaseObservable
    loss_fn: LossFn
    return_observable: bool = False

    def __call__(self, trajectory: SimulatorTrajectory, target: Arr, weights: Arr) -> tuple:
        obs = jnp.sum(self.observable(trajectory) * weights)
        vals = [self.loss_fn(obs, target)]
        if self.return_observable:
            vals.append(obs)
        return tuple(vals)


def l2_loss(actual: Arr, target: Arr) -> Scalar:
    """sum((actual - target)^2)."""
    return jnp.sum((actual - target) ** 2)


__all__ = ["LossFn", "ObservableLossFn", "RootMeanSquaredError", "SquaredError", "l2_loss"]
