"""Helical pitch observable.

Parity reference: mythos/observables/pitch.py:20-102.
"""

from __future__ import annotations

import dataclasses as dc
from collections.abc import Callable

import chex
import jax
import jax.numpy as jnp

import mythos_tpu.observables.base as obs_base
from mythos_tpu.simulators.io import SimulatorTrajectory
from mythos_tpu.utils.math import safe_arccos
from mythos_tpu.utils.types import ARR_OR_SCALAR, Arr

TARGETS = {
    "oxDNA": 10.5,  # bp/turn
}


def compute_pitch(avg_pitch_angle: ARR_OR_SCALAR) -> ARR_OR_SCALAR:
    """Pitch (bp/turn) from the trajectory-averaged pitch angle (radians)."""
    return jnp.pi / avg_pitch_angle


def single_pitch_angle(
    quartet: Arr, base_sites: Arr, back_sites: Arr, displacement_fn: Callable
) -> ARR_OR_SCALAR:
    """Angle between backbone-backbone vectors of adjacent bps, projected
    into the plane perpendicular to the local helical axis."""
    bp1, bp2 = quartet
    (a1, b1), (a2, b2) = bp1, bp2

    axis = obs_base.local_helical_axis(quartet, base_sites, displacement_fn)

    bb1 = displacement_fn(back_sites[b1], back_sites[a1])
    bb2 = displacement_fn(back_sites[b2], back_sites[a2])

    bb1_proj = displacement_fn(bb1, jnp.sum(axis * bb1) * axis)
    bb2_proj = displacement_fn(bb2, jnp.sum(axis * bb2) * axis)
    bb1_dir = bb1_proj / jnp.linalg.norm(bb1_proj)
    bb2_dir = bb2_proj / jnp.linalg.norm(bb2_proj)

    return safe_arccos(jnp.sum(bb1_dir * bb2_dir))


single_pitch_angle_mapped = jax.vmap(single_pitch_angle, in_axes=(0, None, None, None))


@chex.dataclass(frozen=True, kw_only=True)
class PitchAngle(obs_base.BaseObservable):
    """Mean pitch angle (radians) per state over the given quartets."""

    quartets: Arr = dc.field(hash=False)
    displacement_fn: Callable

    def __post_init__(self) -> None:
        if self.rigid_body_transform_fn is None:
            raise ValueError(obs_base.ERR_RIGID_BODY_TRANSFORM_FN_REQUIRED)

    def __call__(self, trajectory: SimulatorTrajectory) -> ARR_OR_SCALAR:
        """(n_states,) mean pitch angles in radians."""
        nucleotides = jax.vmap(self.rigid_body_transform_fn)(trajectory)
        angles = jax.vmap(single_pitch_angle_mapped, (None, 0, 0, None))(
            self.quartets, nucleotides.base_sites, nucleotides.back_sites, self.displacement_fn
        )
        return jnp.mean(angles, axis=1)
