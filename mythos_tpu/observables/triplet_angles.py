"""Per-angle-name triplet-angle distributions from a MARTINI trajectory.

Parity reference: mythos/observables/triplet_angles.py:15-136.
"""

from __future__ import annotations

from collections.abc import Callable

import chex
import jax
import jax.numpy as jnp

from mythos_tpu.energy.martini.base import MartiniTopology, get_periodic
from mythos_tpu.energy.martini.m2 import compute_angles
from mythos_tpu.simulators.io import SimulatorTrajectory
from mythos_tpu.utils.types import Arr


@chex.dataclass(frozen=True, kw_only=True)
class TripletAngles:
    """Angles at the central atom of triplets matching one angle name."""

    topology: MartiniTopology
    angle_name: str
    displacement_fn: Callable = get_periodic

    def _matching_triplets(self) -> Arr:
        all_names = self.topology.angle_names
        indices = [i for i, name in enumerate(all_names) if name == self.angle_name]
        if not indices:
            raise ValueError(
                f"No angles matching '{self.angle_name}' found in the topology. "
                f"Available angle names: {sorted(set(all_names))}"
            )
        return jnp.asarray(self.topology.angles)[jnp.array(indices)]

    def __call__(self, trajectory: SimulatorTrajectory) -> Arr:
        """(n_states, n_matching_angles) angles in radians."""
        triplets = self._matching_triplets()

        def per_state(centers: Arr, box: Arr) -> Arr:
            disp = self.displacement_fn(box)
            r_ij = disp(centers[triplets[:, 0]], centers[triplets[:, 1]])
            r_kj = disp(centers[triplets[:, 2]], centers[triplets[:, 1]])
            return compute_angles(r_ij, r_kj)

        return jax.vmap(per_state)(trajectory.center, trajectory.box_size)


@chex.dataclass(frozen=True, kw_only=True)
class TripletAnglesMapped:
    """TripletAngles for several angle names, keyed by name."""

    topology: MartiniTopology
    angle_names: tuple[str, ...]
    displacement_fn: Callable = get_periodic

    def __call__(self, trajectory: SimulatorTrajectory) -> dict[str, Arr]:
        """name -> (n_states, n_matching_angles) angles."""
        return {
            name: TripletAngles(
                topology=self.topology, angle_name=name, displacement_fn=self.displacement_fn
            )(trajectory)
            for name in self.angle_names
        }
