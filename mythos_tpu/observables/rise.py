"""Axial rise observable.

Parity reference: mythos/observables/rise.py:20-80.
"""

from __future__ import annotations

import dataclasses as dc
from collections.abc import Callable

import chex
import jax
import jax.numpy as jnp

import mythos_tpu.observables.base as obs_base
import mythos_tpu.utils.units as units
from mythos_tpu.simulators.io import SimulatorTrajectory
from mythos_tpu.utils.types import ARR_OR_SCALAR, Arr

TARGETS = {
    "oxDNA": 3.4,  # Angstroms
}


def single_rise(quartet: Arr, base_sites: Arr, displacement_fn: Callable) -> ARR_OR_SCALAR:
    """Midpoint displacement of adjacent bps projected on the local axis (A)."""
    bp1, bp2 = quartet
    (a1, b1), (a2, b2) = bp1, bp2

    axis = obs_base.local_helical_axis(quartet, base_sites, displacement_fn)
    midp1 = (base_sites[a1] + base_sites[b1]) / 2.0
    midp2 = (base_sites[a2] + base_sites[b2]) / 2.0
    dr = displacement_fn(midp2, midp1)
    return jnp.sum(dr * axis) * units.ANGSTROMS_PER_OXDNA_LENGTH


single_rise_mapped = jax.vmap(single_rise, (0, None, None))


@chex.dataclass(frozen=True, kw_only=True)
class Rise(obs_base.BaseObservable):
    """Mean rise (Angstroms) per state over the given quartets."""

    quartets: Arr = dc.field(hash=False)
    displacement_fn: Callable

    def __post_init__(self) -> None:
        if self.rigid_body_transform_fn is None:
            raise ValueError(obs_base.ERR_RIGID_BODY_TRANSFORM_FN_REQUIRED)

    def __call__(self, trajectory: SimulatorTrajectory) -> ARR_OR_SCALAR:
        """(n_states,) mean rise in Angstroms."""
        nucleotides = jax.vmap(self.rigid_body_transform_fn)(trajectory)
        rises = jax.vmap(single_rise_mapped, (None, 0, None))(
            self.quartets, nucleotides.base_sites, self.displacement_fn
        )
        return jnp.mean(rises, axis=1)
