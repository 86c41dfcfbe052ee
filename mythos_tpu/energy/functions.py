"""Piecewise smoothed base functions f1-f6 of the oxDNA models.

Parity reference: mythos/energy/dna1/base_functions.py:13-129 (f1-f5) and
mythos/energy/dna2/base_functions.py:13-17 (f6). Branches are expressed as
nested ``jnp.where`` selects -- branch-free elementwise code for the VPU.
"""

from __future__ import annotations

import mythos_tpu.energy.potentials as pot
from mythos_tpu.utils.types import ARR_OR_SCALAR, Scalar

import jax.numpy as jnp


def f1(
    r: ARR_OR_SCALAR,
    r_low: Scalar,
    r_high: Scalar,
    r_c_low: Scalar,
    r_c_high: Scalar,
    eps: Scalar,
    a: Scalar,
    r0: Scalar,
    r_c: Scalar,
    b_low: Scalar,
    b_high: Scalar,
) -> ARR_OR_SCALAR:
    """Radial part of stacking / hydrogen bonding (Morse with smoothed tails)."""
    oob = jnp.where(
        (r_c_low < r) & (r < r_low),
        eps * pot.v_smooth(r, b_low, r_c_low),
        jnp.where((r_high < r) & (r < r_c_high), eps * pot.v_smooth(r, b_high, r_c_high), 0.0),
    )
    return jnp.where(
        (r_low < r) & (r < r_high),
        pot.v_morse(r, eps, r0, a) - pot.v_morse(r_c, eps, r0, a),
        oob,
    )


def f2(
    r: ARR_OR_SCALAR,
    r_low: Scalar,
    r_high: Scalar,
    r_c_low: Scalar,
    r_c_high: Scalar,
    k: Scalar,
    r0: Scalar,
    r_c: Scalar,
    b_low: Scalar,
    b_high: Scalar,
) -> ARR_OR_SCALAR:
    """Radial part of cross/coaxial stacking (harmonic with smoothed tails)."""
    oob = jnp.where(
        (r_c_low < r) & (r < r_low),
        k * pot.v_smooth(r, b_low, r_c_low),
        jnp.where((r_high < r) & (r < r_c_high), k * pot.v_smooth(r, b_high, r_c_high), 0.0),
    )
    return jnp.where(
        (r_low < r) & (r < r_high),
        pot.v_harmonic(r, k, r0) - pot.v_harmonic(r_c, k, r0),
        oob,
    )


def f3(
    r: ARR_OR_SCALAR,
    r_star: Scalar,
    r_c: Scalar,
    eps: Scalar,
    sigma: Scalar,
    b: Scalar,
) -> ARR_OR_SCALAR:
    """Radial part of excluded volume (LJ with smoothed cutoff)."""
    oob = jnp.where((r_star < r) & (r < r_c), eps * pot.v_smooth(r, b, r_c), 0.0)
    return jnp.where(r < r_star, pot.v_lj(r, eps, sigma), oob)


def f4(
    theta: ARR_OR_SCALAR,
    theta0: Scalar,
    delta_theta_star: Scalar,
    delta_theta_c: Scalar,
    a: Scalar,
    b: Scalar,
) -> ARR_OR_SCALAR:
    """Angular modulation used by every anisotropic term."""
    oob = jnp.where(
        (theta0 - delta_theta_c < theta) & (theta < theta0 - delta_theta_star),
        pot.v_smooth(theta, b, theta0 - delta_theta_c),
        jnp.where(
            (theta0 + delta_theta_star < theta) & (theta < theta0 + delta_theta_c),
            pot.v_smooth(theta, b, theta0 + delta_theta_c),
            0.0,
        ),
    )
    return jnp.where(
        (theta0 - delta_theta_star < theta) & (theta < theta0 + delta_theta_star),
        pot.v_mod(theta, a, theta0),
        oob,
    )


def f5(
    x: ARR_OR_SCALAR,
    x_star: Scalar,
    x_c: Scalar,
    a: Scalar,
    b: Scalar,
) -> ARR_OR_SCALAR:
    """One-sided modulation imposing right-handedness."""
    return jnp.where(
        x > 0.0,
        1.0,
        jnp.where(
            (x_star < x) & (x < 0.0),
            pot.v_mod(x, a, 0),
            jnp.where((x_c < x) & (x < x_star), pot.v_smooth(x, b, x_c), 0.0),
        ),
    )


def f6(theta: ARR_OR_SCALAR, a: Scalar, theta0: Scalar) -> ARR_OR_SCALAR:
    """One-sided quadratic modulation (oxDNA2 coaxial stacking)."""
    return jnp.where(theta > theta0, 0.5 * a * (theta - theta0) ** 2, 0.0)
