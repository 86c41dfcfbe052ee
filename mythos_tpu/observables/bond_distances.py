"""Per-bond-name distance distributions from a MARTINI trajectory.

Parity reference: mythos/observables/bond_distances.py:15-113. Distances are
one vectorized gather + norm per state (no per-pair vmap).
"""

from __future__ import annotations

from collections.abc import Callable

import chex
import jax
import jax.numpy as jnp

from mythos_tpu.energy.martini.base import MartiniTopology, get_periodic
from mythos_tpu.simulators.io import SimulatorTrajectory
from mythos_tpu.utils.types import Arr


@chex.dataclass(frozen=True, kw_only=True)
class BondDistances:
    """Distances of all bonds matching one ``RESIDUE_BEAD1_BEAD2`` name."""

    topology: MartiniTopology
    bond_name: str
    displacement_fn: Callable = get_periodic

    def _matching_pairs(self) -> Arr:
        all_names = self.topology.bond_names
        indices = [i for i, name in enumerate(all_names) if name == self.bond_name]
        if not indices:
            raise ValueError(
                f"No bonds matching '{self.bond_name}' found in the topology. "
                f"Available bond names: {sorted(set(all_names))}"
            )
        return jnp.asarray(self.topology.bonded_neighbors)[jnp.array(indices)]

    def __call__(self, trajectory: SimulatorTrajectory) -> Arr:
        """(n_states, n_matching_bonds) distances."""
        pairs = self._matching_pairs()

        def per_state(centers: Arr, box: Arr) -> Arr:
            disp = self.displacement_fn(box)
            dr = disp(centers[pairs[:, 0]], centers[pairs[:, 1]])
            return jnp.linalg.norm(dr, axis=-1)

        return jax.vmap(per_state)(trajectory.center, trajectory.box_size)


@chex.dataclass(frozen=True, kw_only=True)
class BondDistancesMapped:
    """BondDistances for several bond names, keyed by name."""

    topology: MartiniTopology
    bond_names: tuple[str, ...]
    displacement_fn: Callable = get_periodic

    def __call__(self, trajectory: SimulatorTrajectory) -> dict[str, Arr]:
        """name -> (n_states, n_matching_bonds) distances."""
        return {
            name: BondDistances(
                topology=self.topology, bond_name=name, displacement_fn=self.displacement_fn
            )(trajectory)
            for name in self.bond_names
        }
