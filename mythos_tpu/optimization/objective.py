"""Objectives: gradient producers, including DiffTRe trajectory reweighting.

Parity reference: mythos/optimization/objective.py:32-389. The DiffTRe math
follows Thaler & Zavadlav, Nat. Commun. 12, 6884 (2021), eqs. 4-5: Boltzmann
reweighting of a reference trajectory under perturbed parameters, with the
normalized effective sample size n_eff as the validity criterion.

TPU notes: the hot paths are ``energy_fn.map`` over the reference states
(lax.map + remat; shards over the state axis with shard_map -- see
mythos_tpu.parallel) and one value_and_grad over ~10^2 parameters.
"""

from __future__ import annotations

import math
import types
import typing
from collections.abc import Callable
from dataclasses import field

import chex
import jax
import jax.numpy as jnp
import numpy as np

from mythos_tpu.energy.base import EnergyFunction
from mythos_tpu.rigid_body import RigidBody
from mythos_tpu.simulators.io import SimulatorTrajectory
from mythos_tpu.utils.scheduler import SchedulerUnit
from mythos_tpu.utils.types import Arr, Grads, Params, Scalar

ERR_MISSING_ARG = "Missing required argument: {missing_arg}."
ERR_OBJECTIVE_NOT_READY = "Not all required observables have been obtained."
ERR_NEIGHBOR_OVERFLOW = (
    "Trajectory was produced with an overflowed neighbor table (dropped pair "
    "interactions). Enlarge the neighbor-list capacity (capacity/"
    "capacity_multiplier) and re-simulate."
)

empty_dict = types.MappingProxyType({})


@chex.dataclass(frozen=True, kw_only=True)
class ObjectiveOutput:
    """Result of an objective calculation.

    ``is_ready=False`` with ``needs_update`` names is the signal that
    re-triggers the producing simulators.
    """

    is_ready: bool
    grads: Grads | None = None
    observables: dict[str, typing.Any] = field(default_factory=dict)
    state: dict[str, typing.Any] = field(default_factory=dict)
    needs_update: tuple[str, ...] = field(default_factory=tuple)


@chex.dataclass(frozen=True, kw_only=True)
class Objective(SchedulerUnit):
    """Immutable gradient producer.

    ``required_observables`` names are matched against simulator
    ``exposes()`` strings; all state passes through calculate().
    """

    name: str
    required_observables: tuple[str, ...]
    logging_observables: tuple[str, ...] = field(default_factory=tuple)
    grad_or_loss_fn: Callable = field(repr=False)

    def __post_init__(self) -> None:
        if self.name is None:
            raise ValueError(ERR_MISSING_ARG.format(missing_arg="name"))
        if self.required_observables is None:
            raise ValueError(ERR_MISSING_ARG.format(missing_arg="required_observables"))
        if self.grad_or_loss_fn is None:
            raise ValueError(ERR_MISSING_ARG.format(missing_arg="grad_or_loss_fn"))

    def calculate(
        self,
        observables: dict[str, typing.Any],
        opt_params: Params | None = None,  # noqa: ARG002 - base class ignores params
        **_kwargs,
    ) -> ObjectiveOutput:
        """Compute gradients from observables (or signal missing ones)."""
        missing = [obs for obs in self.required_observables if obs not in observables]
        if missing:
            return ObjectiveOutput(is_ready=False, needs_update=tuple(missing))

        sorted_obs = [observables[key] for key in self.required_observables]
        grads, aux = self.grad_or_loss_fn(*sorted_obs)

        output_observables = dict(aux)
        output_observables.update(dict(zip(self.required_observables, sorted_obs, strict=True)))

        return ObjectiveOutput(
            is_ready=True,
            grads=grads,
            observables=output_observables,
            state={},
            needs_update=(),
        )

    def get_logging_observables(
        self, observables: dict[str, typing.Any]
    ) -> list[tuple[str, typing.Any]]:
        """(name, value) pairs for the configured logging observables."""
        return [(n, observables[n]) for n in self.logging_observables if n in observables]


# DiffTRe math -----------------------------------------------------------------


def compute_weights_and_neff(
    beta: Arr | float, new_energies: Arr, ref_energies: Arr
) -> tuple[Arr, Scalar]:
    """Boltzmann weights and normalized effective sample size (eqs. 4-5).

    w_i = exp(-beta dE_i) / sum, n_eff = exp(-sum w log w) / S.
    """
    diffs = new_energies - ref_energies
    # subtract the max for overflow-safe exponentials (invariant under the
    # normalization, keeps fp32 viable on TPU)
    logits = -beta * diffs
    logits = logits - jax.lax.stop_gradient(jnp.max(logits))
    boltz = jnp.exp(logits)
    weights = boltz / jnp.sum(boltz)
    n_eff = jnp.exp(-jnp.sum(weights * jnp.log(jnp.where(weights > 0, weights, 1.0))))
    return weights, n_eff / len(new_energies)


def compute_min_segment_neff(
    temperature: Arr, new_energies: Arr, ref_energies: Arr
) -> float:
    """Minimum per-temperature-segment n_eff for multi-T trajectories."""
    temperature = np.asarray(temperature)

    def segment_neff(temp: float) -> float:
        mask = temperature == temp
        _, neff = compute_weights_and_neff(
            1.0 / temp, jnp.asarray(new_energies)[mask], jnp.asarray(ref_energies)[mask]
        )
        return float(neff)

    return min(segment_neff(t) for t in np.unique(temperature))


def compute_loss(
    opt_params: Params,
    energy_fn: EnergyFunction,
    beta: Arr | float,
    loss_fn: Callable,
    ref_states: RigidBody,
    ref_energies: Arr,
    observables: list[typing.Any],
) -> tuple[Scalar, tuple]:
    """Reweighted loss under current params (the DiffTRe objective core)."""
    energy_fn = energy_fn.with_params(opt_params)
    new_energies = energy_fn.map(ref_states)
    weights, neff = compute_weights_and_neff(beta, new_energies, ref_energies)
    loss, (measured_value, _) = loss_fn(ref_states, weights, energy_fn, opt_params, observables)
    return loss, (neff, measured_value, new_energies)


compute_loss_and_grad = jax.value_and_grad(compute_loss, has_aux=True)


@chex.dataclass(frozen=True, kw_only=True)
class DiffTReObjective(Objective):
    """Differentiable Trajectory Reweighting objective.

    Protocol: slice equilibration snapshots, concat trajectories, compute
    reference energies under frozen reference params, check per-segment
    n_eff >= min_n_eff_factor (else request fresh trajectories and reset
    opt_steps), then produce reweighted gradients.
    """

    energy_fn: EnergyFunction = field(repr=False)
    n_equilibration_steps: int = 0
    min_n_eff_factor: float = 0.95
    max_valid_opt_steps: float = math.inf

    def __post_init__(self) -> None:
        Objective.__post_init__(self)
        if self.energy_fn is None:
            raise ValueError(ERR_MISSING_ARG.format(missing_arg="energy_fn"))
        if self.n_equilibration_steps is None:
            raise ValueError(ERR_MISSING_ARG.format(missing_arg="n_equilibration_steps"))
        if self.n_equilibration_steps < 0:
            raise ValueError(
                f"n_equilibration_steps must be non-negative, got {self.n_equilibration_steps}."
            )
        if self.max_valid_opt_steps <= 0:
            raise ValueError("max_valid_opt_steps must be positive or infinity.")

    def calculate(
        self,
        observables: dict[str, typing.Any],
        opt_params: Params,
        opt_steps: int = 0,
        reference_opt_params: Params | None = None,
    ) -> ObjectiveOutput:
        """Gradients via reweighting, or a not-ready request for fresh data."""
        if opt_steps >= self.max_valid_opt_steps:
            return ObjectiveOutput(
                is_ready=False,
                needs_update=tuple(self.required_observables),
                state={"opt_steps": 0},
            )

        missing = [obs for obs in self.required_observables if obs not in observables]
        if missing:
            return ObjectiveOutput(is_ready=False, needs_update=tuple(missing))

        sorted_obs = [observables[key] for key in self.required_observables]
        trajectories = [o for o in sorted_obs if isinstance(o, SimulatorTrajectory)]
        if not trajectories:
            raise ValueError("No SimulatorTrajectory observables found in observables.")

        # a trajectory produced with an overflowed neighbor table silently
        # dropped pair interactions -- reweighting it would corrupt the fit
        for t in trajectories:
            overflow = (t.metadata or {}).get("neighbor_overflow")
            if overflow is not None and bool(jnp.any(overflow)):
                raise RuntimeError(ERR_NEIGHBOR_OVERFLOW)

        if self.n_equilibration_steps > 0:
            trajectories = [
                t.slice(slice(self.n_equilibration_steps, t.length())) for t in trajectories
            ]

        reference_states = SimulatorTrajectory.concat(trajectories)
        if reference_states.length() == 0:
            raise ValueError(
                "Equilibration slicing yields no states! Note slicing is in number of "
                "snapshots, not timesteps."
            )

        if reference_states.temperature is None:
            raise ValueError(
                "SimulatorTrajectory.temperature is None. DiffTRe requires per-state "
                "temperature (kT) on the trajectory."
            )
        beta = 1.0 / reference_states.temperature

        reference_opt_params = reference_opt_params or opt_params
        reference_energies = self.energy_fn.with_params(reference_opt_params).map(reference_states)

        neff = compute_min_segment_neff(
            temperature=reference_states.temperature,
            new_energies=self.energy_fn.with_params(opt_params).map(reference_states),
            ref_energies=reference_energies,
        )

        if neff < self.min_n_eff_factor:
            return ObjectiveOutput(
                is_ready=False,
                needs_update=tuple(self.required_observables),
                observables={"neff": neff},
                state={"opt_steps": 0},
            )

        (loss, (_, measured_value, _)), grads = compute_loss_and_grad(
            opt_params,
            self.energy_fn,
            beta,
            self.grad_or_loss_fn,
            reference_states,
            reference_energies,
            sorted_obs,
        )

        return ObjectiveOutput(
            is_ready=True,
            grads=grads,
            observables={"loss": loss, "neff": neff, measured_value[0]: measured_value[1]},
            state={"opt_steps": opt_steps + 1, "reference_opt_params": reference_opt_params},
        )
