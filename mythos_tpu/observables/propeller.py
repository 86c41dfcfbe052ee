"""Propeller twist observable.

Parity reference: mythos/observables/propeller.py:19-71. Mean angle (degrees,
as 180 - angle) between the base normals of h-bonded pairs.
"""

from __future__ import annotations

import dataclasses as dc

import chex
import jax
import jax.numpy as jnp

import mythos_tpu.observables.base as obs_base
from mythos_tpu.simulators.io import SimulatorTrajectory
from mythos_tpu.utils.math import safe_arccos
from mythos_tpu.utils.types import ARR_OR_SCALAR, Arr

TARGETS = {
    "oxDNA": 21.7,  # degrees
}


def propeller_twist_rad(bps: Arr, base_normals: Arr) -> Arr:
    """Angles between base normals of each h-bonded pair, in radians.

    Vectorized over pairs in one gather + row-dot (no per-pair vmap needed).
    """
    nv1 = base_normals[bps[:, 0]]
    nv2 = base_normals[bps[:, 1]]
    return safe_arccos(jnp.sum(nv1 * nv2, axis=-1))


@chex.dataclass(frozen=True)
class PropellerTwist(obs_base.BaseObservable):
    """Mean propeller twist (degrees) per trajectory state."""

    h_bonded_base_pairs: Arr = dc.field(hash=False)

    def __post_init__(self) -> None:
        if self.rigid_body_transform_fn is None:
            raise ValueError(obs_base.ERR_RIGID_BODY_TRANSFORM_FN_REQUIRED)

    def __call__(self, trajectory: SimulatorTrajectory) -> ARR_OR_SCALAR:
        """(n_states,) propeller twist in degrees."""
        nucleotides = jax.vmap(self.rigid_body_transform_fn)(trajectory)
        base_normals = nucleotides.base_normals

        def per_state(bn: Arr) -> Arr:
            return 180.0 - propeller_twist_rad(self.h_bonded_base_pairs, bn) * (180.0 / jnp.pi)

        return jnp.mean(jax.vmap(per_state)(base_normals), axis=1)
