"""Observable base class and duplex-geometry helpers.

Parity reference: mythos/observables/base.py:14-66. An observable maps a
SimulatorTrajectory (optionally with reweighting weights) to per-state values
or a scalar; trajectory-state vectorization is a plain vmap (the axis shards
trivially over a device mesh).
"""

from __future__ import annotations

import itertools
from collections.abc import Callable

import chex
import jax.numpy as jnp

from mythos_tpu.simulators.io import SimulatorTrajectory
from mythos_tpu.utils.types import Arr

ERR_RIGID_BODY_TRANSFORM_FN_REQUIRED = "rigid_body_transform_fn must be provided"


@chex.dataclass(frozen=True)
class BaseObservable:
    """Base class: __call__(trajectory) -> per-state values."""

    rigid_body_transform_fn: Callable

    def __call__(self, trajectory: SimulatorTrajectory) -> Arr:
        """Calculate the observable."""


def local_helical_axis_with_norm(
    quartet: Arr, base_sites: Arr, displacement_fn: Callable
) -> tuple[Arr, Arr]:
    """Normalized local helical axis (and its norm) defined by two base pairs."""
    bp1, bp2 = quartet
    (a1, b1), (a2, b2) = bp1, bp2
    midp1 = (base_sites[a1] + base_sites[b1]) / 2.0
    midp2 = (base_sites[a2] + base_sites[b2]) / 2.0
    dr = displacement_fn(midp2, midp1)
    norm = jnp.linalg.norm(dr)
    return dr / norm, norm


def local_helical_axis(quartet: Arr, base_sites: Arr, displacement_fn: Callable) -> Arr:
    """Normalized local helical axis defined by two base pairs."""
    return local_helical_axis_with_norm(quartet, base_sites, displacement_fn)[0]


def get_duplex_quartets(n_nucs_per_strand: int) -> Arr:
    """All pairs of adjacent base pairs for an antiparallel duplex."""
    s1 = list(range(n_nucs_per_strand))
    s2 = list(range(n_nucs_per_strand, 2 * n_nucs_per_strand))[::-1]
    bps = list(zip(s1, s2, strict=True))
    return jnp.array(list(map(list, itertools.pairwise(bps))), dtype=jnp.int32)
