"""Numerics helpers: orientation conversions and smooth primitives.

Parity reference: mythos/utils/math.py:9-88 (Euler/quaternion conversions used
by the oxDNA trajectory reader, smooth_abs, clamp, row-wise dot).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mythos_tpu.utils.types import ARR_OR_SCALAR, Arr, Scalar


def pmm(a: Arr, b: Arr) -> Arr:
    """f32-exact matmul.

    The default matmul precision rounds f32 operands to bf16 on the TPU MXU
    (~4e-3 relative error) — never acceptable for physical tables or
    geometry. Use for every small contraction on a compute path.
    """
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def principal_axes_to_euler_angles(x: Arr, y: Arr, z: Arr) -> tuple[Arr, Arr, Arr]:
    """Tait-Bryan (ZYX) Euler angles from a set of principal axes.

    The axes are the rows of the rotation matrix columns (x = first column of
    R, i.e. the lab-frame image of e_x, etc.). Uses the arctan2 formulation for
    numerical stability near the poles.
    """
    psi = np.arctan2(x[:, 1], x[:, 0])
    theta = np.arcsin(-np.clip(x[:, 2], -1.0, 1.0))
    phi = np.arctan2(y[:, 2], z[:, 2])
    return psi, theta, phi


def euler_angles_to_quaternion(psi: Arr, theta: Arr, phi: Arr) -> Arr:
    """ZYX Euler angles -> unit quaternions, shape (N, 4) with scalar first."""
    sp, cp = np.sin(0.5 * psi), np.cos(0.5 * psi)
    st, ct = np.sin(0.5 * theta), np.cos(0.5 * theta)
    sf, cf = np.sin(0.5 * phi), np.cos(0.5 * phi)

    q0 = sp * st * sf + cp * ct * cf
    q1 = -sp * st * cf + sf * cp * ct
    q2 = sp * ct * sf + cp * st * cf
    q3 = sp * ct * cf - cp * st * sf
    return np.stack([q0, q1, q2, q3], axis=-1)


def smooth_abs(x: ARR_OR_SCALAR, eps: Scalar = 1e-10) -> ARR_OR_SCALAR:
    """|x| with continuous first derivatives (sqrt(x^2 + eps))."""
    return jnp.sqrt(x**2 + eps)


def clamp(x: ARR_OR_SCALAR, lo: Scalar = -1.0, hi: Scalar = 1.0) -> ARR_OR_SCALAR:
    """Clamp into [lo, hi] using where (keeps gradients zero outside)."""
    clipped = jnp.where(x >= hi, hi, x)
    return jnp.where(clipped <= lo, lo, clipped)


def safe_arccos(x: ARR_OR_SCALAR) -> ARR_OR_SCALAR:
    """arccos of a cosine-valued expression, NaN-free under autodiff.

    ``arccos(clamp(x))`` has an inf * 0 = NaN gradient exactly at |x| = 1
    (arccos' diverges where the clamp's derivative is zero). Clamping strictly
    inside (-1, 1) by a few dtype ulps keeps arccos' finite there, so the
    constant clamp branch zeroes the gradient cleanly. The value changes by
    at most arccos(1 - 8 eps) ~ 1e-7 (f64) / 1e-3 (f32) at the boundary
    itself, where every modulation factor is anyway evaluated on a plateau.
    """
    eps = 8 * jnp.finfo(jnp.result_type(x, jnp.float32)).eps
    return jnp.arccos(clamp(x, -1.0 + eps, 1.0 - eps))


def mult(a: Arr, b: Arr) -> Arr:
    """Row-wise dot product of two (N, 3) arrays -> (N,)."""
    return jnp.sum(a * b, axis=-1)


def arccos_poly(x: ARR_OR_SCALAR) -> ARR_OR_SCALAR:
    """Polynomial arccos for Pallas TPU kernels (Mosaic has no acos prim).

    Abramowitz & Stegun 4.4.45: arccos(x) = sqrt(1-x) * P7(x) on [0, 1],
    |abs error| <= 2e-8 (below f32 resolution of arccos near pi/2), extended
    by arccos(-x) = pi - arccos(x). Clamped like :func:`safe_arccos` so the
    gradient stays finite at |x| = 1; autodiff of the polynomial
    approximates arccos' to the same order.
    """
    eps = 8 * jnp.finfo(jnp.result_type(x, jnp.float32)).eps
    xc = clamp(x, -1.0 + eps, 1.0 - eps)
    a = jnp.abs(xc)
    p = -0.0012624911
    for c in (0.0066700901, -0.0170881256, 0.0308918810, -0.0501743046,
              0.0889789874, -0.2145988016, 1.5707963050):
        p = p * a + c
    r = jnp.sqrt(1.0 - a) * p
    return jnp.where(xc < 0, jnp.pi - r, r)
