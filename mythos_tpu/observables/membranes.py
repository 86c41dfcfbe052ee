"""Membrane observables: area per lipid, thickness, melting temperature.

Parity reference: mythos/observables/{area_per_lipid,membrane_thickness,
membrane_melting_temp}.py. The reference computes leaflets/APL via the
host-side lipyphilic/MDAnalysis stack; here the default implementations are
native JAX (differentiable, TPU-resident):

* leaflet assignment: sign of the head-bead z relative to the membrane
  midplane (valid for flat bilayers, which is what APL/thickness measure);
* area per lipid: lateral box area / lipids per leaflet;
* thickness: difference of mean leaflet z of the reference beads.

The sigmoid Tm fit uses the native Levenberg-Marquardt in utils.fits.
"""

from __future__ import annotations

import chex
import jax
import jax.numpy as jnp

from mythos_tpu.simulators.io import SimulatorTrajectory
from mythos_tpu.utils.fits import levenberg_marquardt
from mythos_tpu.utils.types import Arr, Scalar


@chex.dataclass(frozen=True, kw_only=True)
class AreaPerLipid:
    """Mean area per lipid (nm^2) per state.

    ``head_indices``: bead indices used for leaflet assignment (one per
    lipid, e.g. the PO4 beads).
    """

    head_indices: Arr

    def __call__(self, trajectory: SimulatorTrajectory) -> Arr:
        """(n_states,) area per lipid."""
        heads = jnp.asarray(self.head_indices)

        def per_state(centers: Arr, box: Arr) -> Scalar:
            z = centers[heads, 2]
            midplane = jnp.mean(z)
            upper = z > midplane
            # average over both leaflets
            n_upper = jnp.sum(upper)
            n_lower = heads.shape[0] - n_upper
            lateral_area = box[0] * box[1]
            return 0.5 * (lateral_area / n_upper + lateral_area / n_lower)

        return jax.vmap(per_state)(trajectory.center, trajectory.box_size)


@chex.dataclass(frozen=True, kw_only=True)
class MembraneThickness:
    """Mean membrane thickness (nm) per state from reference-bead z spread."""

    thickness_indices: Arr

    def __call__(self, trajectory: SimulatorTrajectory) -> Arr:
        """(n_states,) thickness."""
        beads = jnp.asarray(self.thickness_indices)

        def per_state(centers: Arr) -> Scalar:
            z = centers[beads, 2]
            midplane = jnp.mean(z)
            upper = z > midplane
            z_up = jnp.sum(jnp.where(upper, z, 0.0)) / jnp.sum(upper)
            z_lo = jnp.sum(jnp.where(upper, 0.0, z)) / jnp.sum(~upper)
            return z_up - z_lo

        return jax.vmap(per_state)(trajectory.center)


# -- melting temperature (sigmoid APL(T) fit) -------------------------------------


def calculate_apl(t: Arr, apl0, c_p_g, dAPL, k, Tm) -> Arr:  # noqa: N803 - jax-martini naming
    """APL sigmoid model: apl0 + c_p_g T + dAPL / (1 + exp(-k (T - Tm)))."""
    return apl0 + c_p_g * t + dAPL / (1 + jnp.exp(-k * (t - Tm)))


def apl_residual(coeffs: Arr, data: tuple[Arr, Arr]) -> Arr:
    """Residuals for the sigmoid fit; coeffs = [apl0, c_p_g, dAPL, k, Tm]."""
    sim_apls, sim_temps = data
    apl0, c_p_g, dAPL, k, Tm = coeffs  # noqa: N806
    return sim_apls - calculate_apl(sim_temps, apl0, c_p_g, dAPL, k, Tm)


def get_initial_guess(sim_apls: Arr, sim_temps: Arr) -> Arr:
    """Heuristic start: gel baseline, small slope, APL jump, unit steepness."""
    apl0 = jnp.min(sim_apls) - 0.0001 * 276
    dAPL = jnp.max(sim_apls) - jnp.min(sim_apls)  # noqa: N806
    return jnp.array([apl0, 1e-4, dAPL, 1.0, jnp.median(sim_temps)])


def fit_apl_sigmoid(
    sim_apls: Arr,
    sim_temps: Arr,
    *,
    implicit_diff: bool = True,  # noqa: ARG001 - API parity; solver unrolls
    maxiter: int = 200,
) -> Arr:
    """Fit [apl0, c_p_g, dAPL, k, Tm] by Levenberg-Marquardt."""
    init = get_initial_guess(sim_apls, sim_temps)
    return levenberg_marquardt(apl_residual, init, n_iters=maxiter, data=(sim_apls, sim_temps))


def compute_membrane_tm(sim_apls: Arr, sim_temps: Arr, *, implicit_diff: bool = True) -> Scalar:
    """Tm (Kelvin) from the sigmoid fit."""
    return fit_apl_sigmoid(sim_apls, sim_temps, implicit_diff=implicit_diff)[4]


@chex.dataclass(frozen=True, kw_only=True)
class MembraneMeltingTemp:
    """Tm from multi-temperature trajectories: per-T weighted APL -> sigmoid fit.

    Frames are grouped by ``trajectory.temperature`` (within temp_rtol);
    the group APLs (optionally DiffTRe-weighted) feed the sigmoid fit.
    """

    head_indices: Arr
    temperatures: Arr
    implicit_diff: bool = True
    temp_rtol: float = 1e-3

    def __call__(self, trajectory: SimulatorTrajectory, weights: Arr | None = None) -> Scalar:
        """Melting temperature in Kelvin."""
        if weights is None:
            weights = jnp.ones(trajectory.length())

        apl_fn = AreaPerLipid(head_indices=self.head_indices)
        all_apls = apl_fn(trajectory)

        expected_apls = []
        for temp in self.temperatures:
            mask = jnp.abs(trajectory.temperature - temp) < self.temp_rtol * jnp.abs(temp)
            weight_sum = jnp.sum(jnp.where(mask, weights, 0.0))
            expected_apls.append(jnp.sum(jnp.where(mask, weights * all_apls, 0.0)) / weight_sum)

        return compute_membrane_tm(
            jnp.stack(expected_apls), jnp.asarray(self.temperatures), implicit_diff=self.implicit_diff
        )


def universe_from_trajectory(topology, trajectory: SimulatorTrajectory):
    """Rebuild an MDAnalysis Universe from a SimulatorTrajectory (host-side).

    Optional-dependency helper kept for interop with MDAnalysis-based
    analyses (parity: mythos/observables/martini_utils.py:12-34). Positions
    convert nm -> Angstrom; the box gains 90-degree angles.
    """
    import numpy as np
    from MDAnalysis.coordinates.memory import MemoryReader

    positions = np.array(trajectory.center) * 10.0
    box3 = np.array(trajectory.box_size) * 10.0
    angles = np.broadcast_to(np.array([90.0, 90.0, 90.0], dtype=box3.dtype), box3.shape)
    dimensions = np.concatenate([box3, angles], axis=-1)

    new_universe = topology.copy()
    new_universe.load_new(positions, format=MemoryReader, dimensions=dimensions, order="fac")
    return new_universe
