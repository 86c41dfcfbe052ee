"""RMSD-to-target observable (Kabsch/SVD alignment).

Parity reference: mythos/observables/rmse.py:19-147 (whose __post_init__
references an undefined name; fixed here).
"""

from __future__ import annotations

import chex
import jax
import jax.numpy as jnp

import mythos_tpu.observables.base as obs_base
import mythos_tpu.utils.units as units
from mythos_tpu.rigid_body import RigidBody
from mythos_tpu.simulators.io import SimulatorTrajectory
from mythos_tpu.utils.types import ARR_OR_SCALAR, Arr

ERR_SINGLE_TARGET_STATE_REQUIRED = "the target state must be a single conformation"
ERR_TARGET_STATE_DIM = "the target state must have center positions in (x, y, z) format"


def svd_align(ref_coords: Arr, coords: Arr) -> tuple[Arr, Arr, Arr]:
    """Align (positions, back-base vectors, base normals) to a centered reference.

    ``coords`` stacks the three (N, 3) arrays; the rotation minimizing RMSD of
    the positions (Kabsch via SVD, reflection-corrected) is applied to all
    three.
    """
    centroid = jnp.mean(coords[0], axis=0)
    coords = coords.at[0].set(coords[0] - centroid)

    a = jnp.matmul(coords[0].T, ref_coords, precision=jax.lax.Precision.HIGHEST)
    u, _, vt = jnp.linalg.svd(a)
    rot = jnp.matmul(vt.T, u.T, precision=jax.lax.Precision.HIGHEST).T

    # reflection correction keeps it a proper rotation
    reflected = jnp.linalg.det(rot) < 0
    vt = jnp.where(reflected, vt.at[2].set(-vt[2]), vt)
    rot = jnp.where(reflected, jnp.matmul(vt.T, u.T, precision=jax.lax.Precision.HIGHEST).T, rot)

    return tuple(jnp.matmul(c, rot, precision=jax.lax.Precision.HIGHEST) for c in coords[:3])


def single_rmse(target: RigidBody, state_nts) -> ARR_OR_SCALAR:
    """RMSD (Angstroms) of one aligned state vs the centered target."""
    conf = jnp.asarray([state_nts.center, state_nts.back_base_vectors, state_nts.base_normals])
    aligned = svd_align(target.center, conf)[0]
    fluc_sq = jnp.sum((aligned - target.center) ** 2, axis=1)
    return jnp.sqrt(jnp.mean(fluc_sq)) * units.ANGSTROMS_PER_OXDNA_LENGTH


@chex.dataclass(frozen=True, kw_only=True)
class RMSE(obs_base.BaseObservable):
    """Per-state RMSD (Angstroms) to a target configuration."""

    target_state: RigidBody

    def __post_init__(self) -> None:
        if self.rigid_body_transform_fn is None:
            raise ValueError(obs_base.ERR_RIGID_BODY_TRANSFORM_FN_REQUIRED)
        if self.target_state.center.ndim != 2:
            raise ValueError(ERR_SINGLE_TARGET_STATE_REQUIRED)
        if self.target_state.center.shape[1] != 3:
            raise ValueError(ERR_TARGET_STATE_DIM)

    def __call__(self, trajectory: SimulatorTrajectory) -> ARR_OR_SCALAR:
        """(n_states,) RMSD in Angstroms."""
        nucleotides = jax.vmap(self.rigid_body_transform_fn)(trajectory)
        centered_target = self.target_state.replace(
            center=self.target_state.center - jnp.mean(self.target_state.center, axis=0)
        )
        return jax.vmap(single_rmse, (None, 0))(centered_target, nucleotides)
