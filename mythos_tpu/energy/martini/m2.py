"""MARTINI 2 terms: harmonic bonds, G96 angles, shifted LJ.

Parity reference: mythos/energy/martini/m2/{bond,angle,lj}.py. TPU-first
differences: bonds and angles are evaluated as single vectorized gathers (not
per-pair vmaps), and the nonbonded LJ computes the dense (N, N) interaction
matrix with a triangular + bonded mask -- a layout XLA tiles cleanly --
instead of vmapping a scalar kernel over O(N^2) index tuples.
"""

from __future__ import annotations

from typing import ClassVar

import chex
import jax
import jax.numpy as jnp

from mythos_tpu.energy.martini.base import MartiniEnergyConfiguration, MartiniEnergyFunction
from mythos_tpu.simulators.io import SimulatorTrajectory
from mythos_tpu.utils.types import Arr, Scalar

BOND_K_PREFIX = "bond_k_"
BOND_R0_PREFIX = "bond_r0_"
ANGLE_K_PREFIX = "angle_k_"
ANGLE_THETA0_PREFIX = "angle_theta0_"
LJ_SIGMA_PREFIX = "lj_sigma_"
LJ_EPSILON_PREFIX = "lj_epsilon_"

LJ_CUTOFF = 1.1  # nm, fixed MARTINI cutoff


class BondConfiguration(MartiniEnergyConfiguration):
    """Bond params: paired ``bond_k_NAME`` / ``bond_r0_NAME`` per bond name."""

    def __post_init__(self) -> None:
        for param in self.params:
            if not param.startswith((BOND_K_PREFIX, BOND_R0_PREFIX)):
                raise ValueError(f"Unexpected parameter {param} for BondConfiguration")
        if len(self.params) == 0 or len(self.params) % 2 != 0:
            raise ValueError("BondConfiguration requires pairs of k and r0 parameters")


@chex.dataclass(frozen=True, kw_only=True)
class Bond(MartiniEnergyFunction):
    """Harmonic bonds: 0.5 k (r - r0)^2, vectorized over all bonds."""

    params: BondConfiguration

    def __post_init__(self, topology: None = None) -> None:
        MartiniEnergyFunction.__post_init__(self)
        k = [self.params[BOND_K_PREFIX + name] for name in self.bond_names]
        r0 = [self.params[BOND_R0_PREFIX + name] for name in self.bond_names]
        object.__setattr__(self, "_bonds_k", jnp.array(k))
        object.__setattr__(self, "_bonds_r0", jnp.array(r0))

    def compute_energy(self, trajectory: SimulatorTrajectory) -> Scalar:
        displacement_fn = self.displacement_fn(trajectory.box_size)
        centers = trajectory.center
        bn = jnp.asarray(self.bonded_neighbors)
        dr = displacement_fn(centers[bn[:, 0]], centers[bn[:, 1]])
        r = jnp.linalg.norm(dr, axis=-1)
        return jnp.sum(0.5 * self._bonds_k * (r - self._bonds_r0) ** 2)


class AngleConfiguration(MartiniEnergyConfiguration):
    """Angle params: paired ``angle_k_NAME`` / ``angle_theta0_NAME``."""

    def __post_init__(self) -> None:
        for param in self.params:
            if not param.startswith((ANGLE_K_PREFIX, ANGLE_THETA0_PREFIX)):
                raise ValueError(f"Unexpected parameter {param} for AngleConfiguration")
        if len(self.params) == 0 or len(self.params) % 2 != 0:
            raise ValueError("AngleConfiguration requires pairs of k and theta0 parameters")


def compute_angles(r_ij: Arr, r_kj: Arr) -> Arr:
    """Angles at the central atoms, arctan2(|cross|, dot) (vectorized)."""
    nij = r_ij / jnp.linalg.norm(r_ij, axis=-1, keepdims=True)
    nkj = r_kj / jnp.linalg.norm(r_kj, axis=-1, keepdims=True)
    cross = jnp.cross(nij, nkj)
    dot = jnp.sum(nij * nkj, axis=-1)
    return jnp.arctan2(jnp.linalg.norm(cross, axis=-1), dot)


@chex.dataclass(frozen=True, kw_only=True)
class Angle(MartiniEnergyFunction):
    """Cosine-harmonic (G96, MARTINI 2) or harmonic angles.

    MARTINI 2 uses the GROMACS type-2 angle: 0.5 k (cos t - cos t0)^2;
    MARTINI 3 flips ``use_G96`` to the plain harmonic form.
    """

    params: AngleConfiguration
    use_G96: ClassVar[bool] = True  # noqa: N815 - GROMACS naming

    def __post_init__(self, topology: None = None) -> None:
        MartiniEnergyFunction.__post_init__(self)
        k = [self.params[ANGLE_K_PREFIX + name] for name in self.angle_names]
        theta0 = [self.params[ANGLE_THETA0_PREFIX + name] for name in self.angle_names]
        object.__setattr__(self, "_angles_k", jnp.array(k))
        object.__setattr__(self, "_angles_theta0", jnp.array(theta0))

    def compute_energy(self, trajectory: SimulatorTrajectory) -> Scalar:
        displacement_fn = self.displacement_fn(trajectory.box_size)
        centers = trajectory.center
        ang = jnp.asarray(self.angles)
        r_ij = displacement_fn(centers[ang[:, 0]], centers[ang[:, 1]])
        r_kj = displacement_fn(centers[ang[:, 2]], centers[ang[:, 1]])
        theta = compute_angles(r_ij, r_kj)
        if self.use_G96:
            term = jnp.cos(theta) - jnp.cos(self._angles_theta0)
        else:
            term = theta - self._angles_theta0
        return jnp.sum(0.5 * self._angles_k * term**2)


class LJConfiguration(MartiniEnergyConfiguration):
    """LJ params ``lj_sigma_A_B`` / ``lj_epsilon_A_B`` per bead-type pair.

    Pair order is ignored unless both orderings are provided. Builds dense
    per-type lookup matrices for the kernels.
    """

    def __post_init__(self) -> None:
        bead_types: set[str] = set()
        for param in self.params:
            if not param.startswith((LJ_SIGMA_PREFIX, LJ_EPSILON_PREFIX)):
                raise ValueError(f"Unexpected parameter {param} for LJConfiguration")
            bead_types.update(param.split("_")[2:4])
        self.bead_types = tuple(sorted(bead_types))

        def get_param(prefix: str, a: str, b: str) -> float:
            param = self.params.get(f"lj_{prefix}_{a}_{b}", self.params.get(f"lj_{prefix}_{b}_{a}"))
            if param is None:
                raise ValueError(f"Missing LJ {prefix} parameter for pair {a}_{b} ({b}_{a})")
            return param

        self.sigmas = jnp.array(
            [[get_param("sigma", i, j) for j in self.bead_types] for i in self.bead_types]
        )
        self.epsilons = jnp.array(
            [[get_param("epsilon", i, j) for j in self.bead_types] for i in self.bead_types]
        )


def lennard_jones(r: Arr, eps: Arr, sigma: Arr) -> Arr:
    """Shifted 12-6 LJ: V(r) - V(cutoff) inside the fixed 1.1 nm cutoff."""
    x6 = (sigma / r) ** 6
    v = 4.0 * eps * (x6 * x6 - x6)
    c6 = (sigma / LJ_CUTOFF) ** 6
    v_c = 4.0 * eps * (c6 * c6 - c6)
    return jnp.where(r < LJ_CUTOFF, v - v_c, 0.0)


@chex.dataclass(frozen=True, kw_only=True)
class LJ(MartiniEnergyFunction):
    """Nonbonded shifted LJ over all non-bonded pairs (dense-matrix kernel)."""

    params: LJConfiguration

    def __post_init__(self, topology: None = None) -> None:
        MartiniEnergyFunction.__post_init__(self)
        type_map = {t: i for i, t in enumerate(self.params.bead_types)}
        object.__setattr__(
            self, "_atom_type_map", jnp.array([type_map[t] for t in self.atom_types])
        )

    def _pair_mask(self) -> Arr:
        """(N, N) upper-triangular mask excluding self and bonded pairs."""
        n = len(self.atom_types)
        mask = jnp.triu(jnp.ones((n, n), dtype=bool), k=1)
        bn = jnp.asarray(self.bonded_neighbors)
        mask = mask.at[bn[:, 0], bn[:, 1]].set(False)
        mask = mask.at[bn[:, 1], bn[:, 0]].set(False)
        return mask

    def map(self, body_sequence: SimulatorTrajectory) -> Arr:
        """Precompute the pair mask once per trajectory, then lax.map."""
        pair_mask = self._pair_mask()

        def map_fn(trajectory: SimulatorTrajectory) -> Scalar:
            if self.transform_fn is not None:
                trajectory = self.transform_fn(trajectory)
            return self.compute_energy(trajectory, _pair_mask=pair_mask)

        inner = jax.checkpoint(map_fn) if self.map_checkpoint else map_fn
        return jax.lax.map(inner, body_sequence, batch_size=self.map_batch_size)

    def compute_energy(self, trajectory: SimulatorTrajectory, _pair_mask: Arr | None = None) -> Scalar:
        displacement_fn = self.displacement_fn(trajectory.box_size)
        centers = trajectory.center
        if _pair_mask is None:
            _pair_mask = self._pair_mask()

        dr = displacement_fn(centers[:, None, :], centers[None, :, :])
        r = jnp.sqrt(jnp.sum(dr * dr, axis=-1) + 1e-18)  # guarded for the diagonal
        # clamp masked entries BEFORE the potential: r ~ 1e-9 on the diagonal
        # overflows r^-12 and its cotangent, and inf * 0 under the outer
        # where poisons the force gradient with NaNs
        r = jnp.where(_pair_mask, r, 1.0)

        t = self._atom_type_map
        sigma = self.params.sigmas[t[:, None], t[None, :]]
        eps = self.params.epsilons[t[:, None], t[None, :]]
        energies = lennard_jones(r, eps, sigma)
        return jnp.sum(jnp.where(_pair_mask, energies, 0.0))


__all__ = [
    "LJ",
    "Angle",
    "AngleConfiguration",
    "Bond",
    "BondConfiguration",
    "LJConfiguration",
    "compute_angles",
    "lennard_jones",
]
