"""Simulation spaces: free and periodic displacement/shift functions.

Replaces ``jax_md.space`` (used at mythos/energy/__init__.py:10 and throughout
the reference). Displacement functions here are natively vectorized over
leading axes -- no ``map_bond`` wrapper is needed; they are plain jnp
broadcasts that XLA fuses into the surrounding energy computation.

Convention (matches jax-md): ``displacement(Ra, Rb) =`` the minimum-image
vector from Rb to Ra, i.e. ``Ra - Rb`` in free space.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Union

import jax.numpy as jnp

from mythos_tpu.utils.types import Arr

Displacement = Callable[[Arr, Arr], Arr]
Shift = Callable[[Arr, Arr], Arr]
Space = tuple[Displacement, Shift]


def free() -> Space:
    """Unbounded space."""

    def displacement(ra: Arr, rb: Arr) -> Arr:
        return ra - rb

    def shift(r: Arr, dr: Arr) -> Arr:
        return r + dr

    displacement.is_periodic = shift.is_periodic = False
    return displacement, shift


def periodic(box_size: Union[float, Arr]) -> Space:
    """Cubic/orthorhombic periodic box with minimum-image displacements."""

    def displacement(ra: Arr, rb: Arr) -> Arr:
        dr = ra - rb
        box = jnp.asarray(box_size, dtype=dr.dtype)
        return dr - box * jnp.round(dr / box)

    def shift(r: Arr, dr: Arr) -> Arr:
        box = jnp.asarray(box_size, dtype=r.dtype)
        return jnp.mod(r + dr, box)

    displacement.is_periodic = shift.is_periodic = True
    return displacement, shift


# SoA variants -----------------------------------------------------------------
#
# The hot loop runs on component arrays (see mythos_tpu/soa.py for why);
# these spaces operate on Vec3 NamedTuples per component. Same jax-md
# conventions as above.


def free_soa() -> Space:
    """Unbounded space over Vec3 component fields."""

    def displacement(ra, rb):
        return ra - rb

    def shift(r, dr):
        return r + dr

    displacement.is_periodic = shift.is_periodic = False
    return displacement, shift


def periodic_soa(box_size: Union[float, Arr]) -> Space:
    """Periodic box over Vec3 component fields (box scalar or (3,))."""
    import numpy as np

    b = np.asarray(box_size, dtype=np.float64).reshape(-1)
    bx, by, bz = (float(b[0]),) * 3 if b.size == 1 else (float(b[0]), float(b[1]), float(b[2]))

    def displacement(ra, rb):
        from mythos_tpu.soa import Vec3

        return Vec3(
            *(d - bb * jnp.round(d / bb) for d, bb in zip(ra - rb, (bx, by, bz), strict=True))
        )

    def shift(r, dr):
        from mythos_tpu.soa import Vec3

        return Vec3(*(jnp.mod(c + dc, bb) for c, dc, bb in zip(r, dr, (bx, by, bz), strict=True)))

    displacement.is_periodic = shift.is_periodic = True
    return displacement, shift
