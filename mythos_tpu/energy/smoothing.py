"""Closed-form smoothing-parameter solvers for the piecewise base functions.

Parity reference: mythos/energy/dna1/base_smoothing_functions.py:13-142, which
ships long sympy-derived expressions. Here each solver is derived generically:
a truncation quadratic ``s(r) = B * (x_s - r)^2`` must match the target
function's value g and derivative g' at the matching point x, giving

    B   = g'(x)^2 / (4 g(x))        (vertex-form curvature)
    x_s = x - 2 g(x) / g'(x)        (the zero/vertex point)

which is algebraically identical to the reference's expanded forms (verified
for f2/f4/f5 by hand and for all of them against golden oxDNA energies). The
derivation runs inside the jit trace, so parameter gradients flow through it.
"""

from __future__ import annotations

import jax.numpy as jnp

from mythos_tpu.utils.types import Scalar


def _match_quadratic(g: Scalar, gp: Scalar) -> tuple[Scalar, Scalar]:
    """(B, offset) for s(r) = B (x_s - r)^2 given value g and slope gp at x.

    Returns B and (x_s - x); callers add x.
    """
    b = gp * gp / (4.0 * g)
    return b, -2.0 * g / gp


def _morse_shifted(x: Scalar, a: Scalar, x0: Scalar, xc: Scalar) -> tuple[Scalar, Scalar]:
    """eps-normalized Morse minus its value at xc, with derivative, at x."""
    ex = jnp.exp(-a * (x - x0))
    exc = jnp.exp(-a * (xc - x0))
    g = (1.0 - ex) ** 2 - (1.0 - exc) ** 2
    gp = 2.0 * a * ex * (1.0 - ex)
    return g, gp


def get_f1_smoothing_params(
    x0: Scalar, a: Scalar, xc: Scalar, x_low: Scalar, x_high: Scalar
) -> tuple[Scalar, Scalar, Scalar, Scalar]:
    """(b_low, x_c_low, b_high, x_c_high) for the Morse-based f1."""
    g_lo, gp_lo = _morse_shifted(x_low, a, x0, xc)
    b_lo, off_lo = _match_quadratic(g_lo, gp_lo)
    g_hi, gp_hi = _morse_shifted(x_high, a, x0, xc)
    b_hi, off_hi = _match_quadratic(g_hi, gp_hi)
    return b_lo, x_low + off_lo, b_hi, x_high + off_hi


def _harmonic_shifted(x: Scalar, x0: Scalar, xc: Scalar) -> tuple[Scalar, Scalar]:
    """k-normalized harmonic minus its value at xc, with derivative, at x."""
    g = 0.5 * ((x - x0) ** 2 - (xc - x0) ** 2)
    gp = x - x0
    return g, gp


def get_f2_smoothing_params(
    x0: Scalar, xc: Scalar, x_low: Scalar, x_high: Scalar
) -> tuple[Scalar, Scalar, Scalar, Scalar]:
    """(b_low, x_c_low, b_high, x_c_high) for the harmonic-based f2."""
    g_lo, gp_lo = _harmonic_shifted(x_low, x0, xc)
    b_lo, off_lo = _match_quadratic(g_lo, gp_lo)
    g_hi, gp_hi = _harmonic_shifted(x_high, x0, xc)
    b_hi, off_hi = _match_quadratic(g_hi, gp_hi)
    return b_lo, x_low + off_lo, b_hi, x_high + off_hi


def get_f3_smoothing_params(r_star: Scalar, sigma: Scalar) -> tuple[Scalar, Scalar]:
    """(b, x_c) for the LJ-based f3, matching v_lj at r_star."""
    s6 = (sigma / r_star) ** 6
    g = 4.0 * (s6 * s6 - s6)
    gp = 4.0 * (-12.0 * s6 * s6 + 6.0 * s6) / r_star
    b, off = _match_quadratic(g, gp)
    return b, r_star + off


def get_f4_smoothing_params(a: Scalar, x0: Scalar, delta_x_star: Scalar) -> tuple[Scalar, Scalar]:
    """(b, delta_x_c) for the angular-modulation f4, matching v_mod at x0 + dx*."""
    g = 1.0 - a * delta_x_star**2
    gp = -2.0 * a * delta_x_star
    b, off = _match_quadratic(g, gp)
    return b, delta_x_star + off


def get_f5_smoothing_params(a: Scalar, x_star: Scalar) -> tuple[Scalar, Scalar]:
    """(b, x_c) for the one-sided f5, matching v_mod(., a, 0) at x_star < 0."""
    g = 1.0 - a * x_star**2
    gp = -2.0 * a * x_star
    b, off = _match_quadratic(g, gp)
    return b, x_star + off
