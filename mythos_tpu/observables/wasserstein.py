"""1-D Wasserstein distance observables (bottom-up MARTINI fitting).

Parity reference: mythos/observables/wasserstein.py:14-149.
"""

from __future__ import annotations

import math
from dataclasses import field

import chex
import jax
import jax.numpy as jnp

from mythos_tpu.observables.base import BaseObservable
from mythos_tpu.simulators.io import SimulatorTrajectory
from mythos_tpu.utils.types import Arr, Scalar


def wasserstein_1d(
    u: Arr, v: Arr, u_weights: Arr | None = None, v_weights: Arr | None = None
) -> Scalar:
    """1-D Wasserstein distance between weighted samples u and v.

    Computed as the integral of |CDF_u - CDF_v| over the merged support.
    """
    u = jnp.asarray(u)
    v = jnp.asarray(v)

    u_weights = (
        jnp.full(u.shape, 1.0 / u.size) if u_weights is None else jnp.asarray(u_weights)
    )
    v_weights = (
        jnp.full(v.shape, 1.0 / v.size) if v_weights is None else jnp.asarray(v_weights)
    )

    if u_weights.shape != u.shape:
        raise ValueError(f"u_weights must have the same shape as u; got {u_weights.shape} and {u.shape}.")
    if v_weights.shape != v.shape:
        raise ValueError(f"v_weights must have the same shape as v; got {v_weights.shape} and {v.shape}.")
    total_u, total_v = jnp.sum(u_weights), jnp.sum(v_weights)
    if not (isinstance(total_u, jax.core.Tracer) or isinstance(total_v, jax.core.Tracer)):
        # only checkable on concrete values; under jit the caller guarantees
        # equal total mass (DiffTRe weights are normalized)
        if not jnp.isclose(total_u, total_v, rtol=1e-5, atol=1e-5):
            raise ValueError(
                "u_weights and v_weights must sum to the same total mass; "
                f"got {total_u} and {total_v}."
            )

    # merged support with signed masses; |cumsum| is the CDF difference
    all_vals = jnp.concatenate([u, v])
    all_weights = jnp.concatenate([u_weights, -v_weights])
    order = jnp.argsort(all_vals)
    all_vals = all_vals[order]
    diffs = jnp.cumsum(all_weights[order])

    dx = all_vals[1:] - all_vals[:-1]
    return jnp.sum(dx * jnp.abs(diffs[:-1]))


def _compute_wasserstein_distance(
    obs_values: Arr, v: Arr, weights: Arr | None = None, v_weights: Arr | None = None
) -> Scalar:
    obs_shape = obs_values.shape
    obs_values = obs_values.flatten()
    if weights is not None:
        # per-state weights spread uniformly across that state's values
        n_per_weight = math.prod(obs_shape[1:])
        weights = jnp.repeat(weights, n_per_weight) / n_per_weight
    return wasserstein_1d(obs_values, v, u_weights=weights, v_weights=v_weights)


@chex.dataclass(frozen=True, kw_only=True)
class WassersteinDistance:
    """W1 between an observable's trajectory distribution and a reference.

    The observable should return (n_states, n_values); call-time ``weights``
    are per-state DiffTRe weights.
    """

    observable: BaseObservable
    v_distribution: Arr
    v_weights: Arr | None = None

    def __call__(self, trajectory: SimulatorTrajectory, weights: Arr | None = None) -> Scalar:
        """W1 distance."""
        obs_values = self.observable(trajectory)
        return _compute_wasserstein_distance(
            obs_values, self.v_distribution, weights=weights, v_weights=self.v_weights
        )


@chex.dataclass(frozen=True, kw_only=True)
class WassersteinDistanceMapped:
    """Per-key W1 distances for dict-valued observables."""

    observable: BaseObservable
    v_distribution_map: dict[str, Arr]
    v_weights_map: dict[str, Arr | None] = field(default_factory=dict)

    def __call__(self, trajectory: SimulatorTrajectory, weights: Arr | None = None) -> dict[str, Scalar]:
        """key -> W1 distance."""
        obs_values = self.observable(trajectory)
        return {
            key: _compute_wasserstein_distance(
                obs_values[key],
                self.v_distribution_map[key],
                weights=weights,
                v_weights=self.v_weights_map.get(key),
            )
            for key in self.v_distribution_map
        }
