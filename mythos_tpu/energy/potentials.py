"""Analytic potential primitives of the oxDNA models.

Parity reference: mythos/energy/potentials.py:11-70 (eqs. 2.1-2.6 of the
oxDNA thesis). All are dtype-polymorphic elementwise jnp expressions; XLA
fuses them into the surrounding pair kernels.
"""

import jax.numpy as jnp

from mythos_tpu.utils.types import ARR_OR_SCALAR, Scalar


def v_fene(r: ARR_OR_SCALAR, eps: Scalar, r0: Scalar, delt: Scalar) -> ARR_OR_SCALAR:
    """FENE backbone spring (eq. 2.1)."""
    x = (r - r0) ** 2 / delt**2
    return -eps / 2.0 * jnp.log(1 - x)


def v_morse(r: ARR_OR_SCALAR, eps: Scalar, r0: Scalar, a: Scalar) -> ARR_OR_SCALAR:
    """Morse well for stacking / hydrogen bonding (eq. 2.2)."""
    return eps * (1 - jnp.exp(-(r - r0) * a)) ** 2


def v_harmonic(r: ARR_OR_SCALAR, k: Scalar, r0: Scalar) -> ARR_OR_SCALAR:
    """Harmonic well for cross/coaxial stacking (eq. 2.3)."""
    return k / 2 * (r - r0) ** 2


def v_lj(r: ARR_OR_SCALAR, eps: Scalar, sigma: Scalar) -> ARR_OR_SCALAR:
    """Lennard-Jones repulsion (eq. 2.4)."""
    x = (sigma / r) ** 12 - (sigma / r) ** 6
    return 4 * eps * x


def v_mod(theta: ARR_OR_SCALAR, a: Scalar, theta0: Scalar) -> ARR_OR_SCALAR:
    """Quadratic angular modulation (eq. 2.5)."""
    return 1 - a * (theta - theta0) ** 2


def v_smooth(x: ARR_OR_SCALAR, b: Scalar, x_c: Scalar) -> ARR_OR_SCALAR:
    """Quadratic truncation smoothing (eq. 2.6)."""
    return b * (x_c - x) ** 2
