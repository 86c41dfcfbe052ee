"""Persistence length observable.

Parity reference: mythos/observables/persistence_length.py:20-184. The
correlation computation is reformulated as one V @ V^T Gram matrix (an
MXU matmul) with per-offset traces, instead of the reference's O(n^2)
vmap-and-roll; results are identical.
"""

from __future__ import annotations

import dataclasses as dc
from collections.abc import Callable

import chex
import jax
import jax.numpy as jnp

import mythos_tpu.observables.base as obs_base
from mythos_tpu.simulators.io import SimulatorTrajectory
from mythos_tpu.utils.types import ARR_OR_SCALAR, Arr, Scalar

TARGETS = {
    "oxDNA": 47.5,  # nm
}


def persistence_length_fit(correlations: Arr, l0_av: Scalar) -> tuple[Scalar, Scalar]:
    """Lp from log-linear fit of <l_n . l_0> = exp(-n <l_0> / Lp)."""
    y = jnp.log(correlations)
    x = jnp.arange(correlations.shape[0])
    design = jnp.stack([jnp.ones_like(x), x], axis=1)
    fit = jnp.linalg.lstsq(design, y)
    offset, slope = fit[0]
    return -l0_av / slope, offset


def vector_autocorrelate(vecs: Arr) -> Arr:
    """Mean dot products of vector pairs at each separation d.

    corr[d] = sum_i dot(v_i, v_{i+d}) / (n - d), via the Gram matrix.
    """
    n = vecs.shape[0]
    gram = jnp.matmul(vecs, vecs.T, precision=jax.lax.Precision.HIGHEST)  # (n, n) pair dots
    corr = jnp.stack([jnp.trace(gram, offset=d) for d in range(n)])
    return corr / jnp.arange(n, 0, -1)


get_all_l_vectors = jax.vmap(obs_base.local_helical_axis_with_norm, in_axes=(0, None, None))


def compute_metadata(
    base_sites: Arr,
    quartets: Arr,
    displacement_fn: Callable,
    skip_ends: bool,  # noqa: FBT001 - vmapped positional
) -> tuple[Arr, Scalar]:
    """(alignment-decay correlations, mean adjacent-bp distance) for a state."""
    all_l_vectors, l0_vals = get_all_l_vectors(quartets, base_sites, displacement_fn)
    if skip_ends:
        all_l_vectors = all_l_vectors[2:-2, :]
        l0_vals = l0_vals[2:-2]
    return vector_autocorrelate(all_l_vectors), jnp.mean(l0_vals)


@chex.dataclass(frozen=True, kw_only=True)
class PersistenceLength(obs_base.BaseObservable):
    """Fitted persistence length from tangent-correlation decay.

    __call__ returns the (optionally DiffTRe-weighted) fitted Lp;
    lp_fit also returns the fit offset; get_all_corrs_and_l0s exposes the
    per-state statistics.
    """

    quartets: Arr = dc.field(hash=False)
    displacement_fn: Callable
    truncate: int | None = None
    skip_ends: bool = True

    def __post_init__(self) -> None:
        if self.rigid_body_transform_fn is None:
            raise ValueError(obs_base.ERR_RIGID_BODY_TRANSFORM_FN_REQUIRED)

    def __call__(self, trajectory: SimulatorTrajectory, weights: Arr | None = None) -> Scalar:
        """Fitted Lp (oxDNA length units)."""
        lp, _ = self.lp_fit(trajectory, weights)
        return lp

    def lp_fit(self, trajectory: SimulatorTrajectory, weights: Arr | None = None) -> tuple[Scalar, Scalar]:
        """(Lp, fit offset); weights reweight states (DiffTRe form)."""
        all_corrs, all_l0s = self.get_all_corrs_and_l0s(trajectory)

        if weights is not None:
            corr_mean = jnp.matmul(weights, all_corrs, precision=jax.lax.Precision.HIGHEST)
            l0_mean = jnp.sum(weights * all_l0s)
        else:
            corr_mean = jnp.mean(all_corrs, axis=0)
            l0_mean = jnp.mean(all_l0s, axis=0)

        if self.truncate:
            corr_mean = corr_mean[: self.truncate]
        return persistence_length_fit(corr_mean, l0_mean)

    def get_all_corrs_and_l0s(self, trajectory: SimulatorTrajectory) -> tuple[Arr, ARR_OR_SCALAR]:
        """Per-state (correlations (S, n_quartets'), mean l0 (S,))."""
        nucleotides = jax.vmap(self.rigid_body_transform_fn)(trajectory)
        return jax.vmap(compute_metadata, (0, None, None, None))(
            nucleotides.base_sites, self.quartets, self.displacement_fn, self.skip_ends
        )
