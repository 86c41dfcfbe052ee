"""Stretch-torsion observables and moduli fits.

Parity reference: mythos/observables/stretch_torsion.py:16-230 (following
Assenza & Perez, JCTC 2022).
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
from mythos_tpu.utils.types import ARR_OR_SCALAR, Arr, Scalar


def single_angle_xy(quartet: Arr, base_sites: Arr, displacement_fn: Callable) -> ARR_OR_SCALAR:
    """In-plane (X-Y) angle between base-base vectors of adjacent bps."""
    bp1, bp2 = quartet
    (a1, b1), (a2, b2) = bp1, bp2

    bb1 = displacement_fn(base_sites[b1], base_sites[a1])[:2]
    bb2 = displacement_fn(base_sites[b2], base_sites[a2])[:2]
    bb1 = bb1 / jnp.linalg.norm(bb1)
    bb2 = bb2 / jnp.linalg.norm(bb2)
    return safe_arccos(jnp.sum(bb1 * bb2))


@chex.dataclass(frozen=True, kw_only=True)
class TwistXY(obs_base.BaseObservable):
    """Total duplex twist in the X-Y plane (radians) per state."""

    quartets: Arr = dc.field(hash=False)
    displacement_fn: Callable

    def __post_init__(self) -> None:
        if self.rigid_body_transform_fn is None:
            raise ValueError(obs_base.ERR_RIGID_BODY_TRANSFORM_FN_REQUIRED)

    def __call__(self, trajectory: SimulatorTrajectory) -> ARR_OR_SCALAR:
        """(n_states,) summed X-Y twist angles."""
        nucleotides = jax.vmap(self.rigid_body_transform_fn)(trajectory)
        per_state = jax.vmap(single_angle_xy, (0, None, None))
        angles = jax.vmap(per_state, (None, 0, None))(
            self.quartets, nucleotides.base_sites, self.displacement_fn
        )
        return jnp.sum(angles, axis=1)


def single_extension_z(center: Arr, bp1: Arr, bp2: Arr, displacement_fn: Callable) -> ARR_OR_SCALAR:
    """|z| distance between the midpoints of two base pairs."""
    a1, b1 = bp1
    a2, b2 = bp2
    bp1_midp = center[a1] + displacement_fn(center[b1], center[a1]) / 2
    bp2_midp = center[a2] + displacement_fn(center[b2], center[a2]) / 2
    return jnp.abs(displacement_fn(bp2_midp, bp1_midp)[2])


@chex.dataclass(frozen=True, kw_only=True)
class ExtensionZ(obs_base.BaseObservable):
    """Duplex extension along Z between two marked base pairs, per state."""

    bp1: Arr = dc.field(hash=False)
    bp2: Arr = dc.field(hash=False)
    displacement_fn: Callable

    def __post_init__(self) -> None:
        if self.rigid_body_transform_fn is None:
            raise ValueError(obs_base.ERR_RIGID_BODY_TRANSFORM_FN_REQUIRED)

    def __call__(self, trajectory: SimulatorTrajectory) -> ARR_OR_SCALAR:
        """(n_states,) extensions in simulation units."""
        nucleotides = jax.vmap(self.rigid_body_transform_fn)(trajectory)
        return jax.vmap(single_extension_z, (0, None, None, None))(
            nucleotides.center, self.bp1, self.bp2, self.displacement_fn
        )


def stretch(forces: Arr, extensions: Arr) -> tuple[Scalar, Scalar, Scalar]:
    """(slope, L0, effective stretch modulus) from a linear force-extension fit."""
    design = jnp.stack([jnp.ones_like(forces), forces], axis=1)
    fit = jnp.linalg.lstsq(design, extensions)
    l0, a1 = fit[0]
    return a1, l0, l0 / a1


def torsion(torques: Arr, extensions: Arr, twists: Arr) -> tuple[Scalar, Scalar]:
    """Slopes of linear extension(torque) and twist(torque) fits."""
    design = jnp.stack([jnp.ones_like(torques), torques], axis=1)
    a3 = jnp.linalg.lstsq(design, extensions)[0][1]
    a4 = jnp.linalg.lstsq(design, twists)[0][1]
    return a3, a4


def stretch_torsion(
    forces: Arr,
    force_extensions: Arr,
    torques: Arr,
    torque_extensions: Arr,
    torque_twists: Arr,
) -> tuple[Scalar, Scalar, Scalar]:
    """(S_eff, torsional modulus C, twist-stretch coupling g)."""
    a1, l0, s_eff = stretch(forces, force_extensions)
    a3, a4 = torsion(torques, torque_extensions, torque_twists)
    denominator = a4 * a1 - a3**2
    c = a1 * l0 / denominator
    g = -(a3 * l0) / denominator
    return s_eff, c, g
