"""Melting-temperature observable via histogram reweighting.

Parity reference: mythos/observables/melting_temp.py:22-173. Re-evaluates
trajectory energies at each extrapolation temperature (the energy map is the
hot path; it shards over states), Boltzmann-reweights umbrella-weighted
counts, applies the finite-size correction, and interpolates bound:unbound
= 0.5.
"""

from __future__ import annotations

import dataclasses as dc
from collections.abc import Callable

import chex
import jax
import jax.numpy as jnp

import mythos_tpu.observables.base as obs_base
from mythos_tpu.simulators.io import SimulatorTrajectory
from mythos_tpu.utils.types import Arr, PyTree, Scalar
from mythos_tpu.utils.units import get_kt_from_c

TARGETS = {
    "SL_avg_6bp": get_kt_from_c(31.2),
    "SL_avg_8bp": get_kt_from_c(48.2),
    "SL_avg_12bp": get_kt_from_c(64.7),
}


def jax_interp1d(x: Arr, y: Arr, x_new: Scalar) -> Arr:
    """Linear interpolation with unsorted inputs."""
    order = jnp.argsort(x)
    return jnp.interp(x_new, x[order], y[order])


def compute_finf(ratio: Arr) -> Arr:
    """Finite-size correction to the bound:unbound ratio."""
    return 1 + 1 / (2 * ratio) - jnp.sqrt((1 + 1 / (2 * ratio)) ** 2 - 1)


def find_melting_temp(temperatures: Arr, ratios: Arr) -> Scalar:
    """Temperature where the corrected bound fraction crosses 0.5."""
    return jax_interp1d(ratios, temperatures, 0.5)


def compute_curve_width(temperatures: Arr, ratios: Arr) -> Scalar:
    """Temperature separation between ratio 0.2 and 0.8."""
    return jax_interp1d(ratios, temperatures, 0.8) - jax_interp1d(ratios, temperatures, 0.2)


@chex.dataclass(frozen=True)
class MeltingTemp(obs_base.BaseObservable):
    """Melting temperature of a duplex from umbrella-sampled data.

    Attributes:
        sim_temperature: kT at which the trajectory was sampled.
        temperature_range: kT values to extrapolate to via reweighting.
        energy_fn: energy function (re-parameterized per extrapolation kT).
    """

    sim_temperature: Scalar
    temperature_range: Arr = dc.field(hash=False)
    energy_fn: Callable

    def __call__(
        self,
        trajectory: SimulatorTrajectory,
        bind_states: Arr,
        umbrella_weights: Arr,
        opt_params: PyTree,
    ) -> Scalar:
        """Melting temperature in simulation units."""
        return self.get_melting_temperature(trajectory, bind_states, umbrella_weights, opt_params)

    def get_extrap_ratios(
        self,
        trajectory: SimulatorTrajectory,
        bind_states: Arr,
        umbrella_weights: Arr,
        opt_params: PyTree,
    ) -> Arr:
        """Finite-size-corrected bound fractions at each extrapolated kT."""
        energies_t0 = self.energy_fn.with_params(opt_params).map(trajectory)

        def finf_at_t(extrapolated_temp: Scalar) -> Scalar:
            energies_tx = self.energy_fn.with_params(opt_params, kt=extrapolated_temp).map(trajectory)
            boltz = jnp.exp(energies_t0 / self.sim_temperature - energies_tx / extrapolated_temp)
            unbiased_counts = (1 / umbrella_weights) * boltz
            total_unbound = jnp.where(bind_states == 0, unbiased_counts, 0).sum()
            total_bound = jnp.where(bind_states != 0, unbiased_counts, 0).sum()
            return compute_finf(total_bound / total_unbound)

        return jax.vmap(finf_at_t)(self.temperature_range)

    def get_melting_temperature(self, trajectory, bind_states, umbrella_weights, opt_params) -> Scalar:
        """Interpolated Tm (simulation units)."""
        ratios = self.get_extrap_ratios(trajectory, bind_states, umbrella_weights, opt_params)
        return find_melting_temp(self.temperature_range, ratios)

    def get_melting_curve(self, trajectory, bind_states, umbrella_weights, opt_params) -> tuple[Arr, Arr]:
        """(temperatures, corrected bound fractions)."""
        ratios = self.get_extrap_ratios(trajectory, bind_states, umbrella_weights, opt_params)
        return self.temperature_range, ratios

    def get_melting_curve_width(self, trajectory, bind_states, umbrella_weights, opt_params) -> Scalar:
        """Width of the melting curve between bound fractions 0.2 and 0.8."""
        ratios = self.get_extrap_ratios(trajectory, bind_states, umbrella_weights, opt_params)
        return compute_curve_width(self.temperature_range, ratios)
