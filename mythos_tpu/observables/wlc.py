"""Worm-like-chain force-extension model and fit.

Parity reference: mythos/observables/wlc.py:9-103 (jaxopt.GaussNewton
replaced by the native solver in mythos_tpu.utils.fits).
"""

from __future__ import annotations

import jax.numpy as jnp

from mythos_tpu.utils.fits import gauss_newton
from mythos_tpu.utils.types import ARR_OR_SCALAR, Arr, Scalar


def coth(x: ARR_OR_SCALAR) -> ARR_OR_SCALAR:
    """Hyperbolic cotangent."""
    return (jnp.exp(2 * x) + 1) / (jnp.exp(2 * x) - 1)


def calculate_extension(
    force: ARR_OR_SCALAR,
    l0: ARR_OR_SCALAR,
    lp: ARR_OR_SCALAR,
    k: ARR_OR_SCALAR,
    kT: Scalar,  # noqa: N803 - unit variable
) -> ARR_OR_SCALAR:
    """Extensible WLC extension: x = L0 (1 + F/K - kT/(2 F L0) [1 + y coth y]),
    y = sqrt(F L0^2 / (Lp kT))."""
    y = jnp.sqrt(force * l0**2 / (lp * kT))
    return l0 * (1 + force / k - kT / (2 * force * l0) * (1 + y * coth(y)))


def loss(coeffs: Arr, extensions: Arr, forces: Arr, kT: Scalar) -> Arr:  # noqa: N803
    """Residuals of measured extensions vs WLC prediction; coeffs = [L0, Lp, K]."""
    l0, lp, k = coeffs[0], coeffs[1], coeffs[2]
    return extensions - calculate_extension(forces, l0, lp, k, kT)


def fit_wlc(
    extensions: Arr,
    forces: Arr,
    init_guess: Arr,
    kT: Scalar,  # noqa: N803 - unit variable
    *,
    implicit_diff: bool = True,  # noqa: ARG001 - API parity; solver unrolls
) -> Arr:
    """Fit [L0, Lp, K] by nonlinear least squares."""
    return gauss_newton(loss, init_guess, extensions=extensions, forces=forces, kT=kT)
