"""Helical diameter observable.

Parity reference: mythos/observables/diameter.py:23-91.
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
from mythos_tpu.utils.types import ARR_OR_SCALAR, Arr, Scalar

TARGETS = {
    "oxDNA": 23.0,  # Angstroms (experimental helical radius 11.5-12 A)
}

ERR_DISPLACEMENT_FN_REQUIRED = "A displacement function is required for computing the helical diameter."


def single_diameter(
    bp: Arr, back_sites: Arr, displacement_fn: Callable, sigma_backbone: Scalar
) -> ARR_OR_SCALAR:
    """Backbone-backbone distance plus the excluded-volume extent (A)."""
    bp1, bp2 = bp
    r = jnp.linalg.norm(displacement_fn(back_sites[bp1], back_sites[bp2]))
    return (r + sigma_backbone) * units.ANGSTROMS_PER_OXDNA_LENGTH


single_diameter_mapped = jax.vmap(single_diameter, (0, None, None, None))


@chex.dataclass(frozen=True, kw_only=True)
class Diameter(obs_base.BaseObservable):
    """Mean helical diameter (Angstroms) per state over h-bonded pairs."""

    h_bonded_base_pairs: Arr = dc.field(hash=False)
    displacement_fn: Callable

    def __post_init__(self) -> None:
        if self.rigid_body_transform_fn is None:
            raise ValueError(obs_base.ERR_RIGID_BODY_TRANSFORM_FN_REQUIRED)
        if self.displacement_fn is None:
            raise ValueError(ERR_DISPLACEMENT_FN_REQUIRED)

    def __call__(self, trajectory: SimulatorTrajectory, sigma_backbone: Scalar) -> ARR_OR_SCALAR:
        """(n_states,) mean helical diameter in Angstroms."""
        nucleotides = jax.vmap(self.rigid_body_transform_fn)(trajectory)
        diameters = jax.vmap(single_diameter_mapped, (None, 0, None, None))(
            self.h_bonded_base_pairs, nucleotides.back_sites, self.displacement_fn, sigma_backbone
        )
        return jnp.mean(diameters, axis=1)
