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

    return displacement, shift
