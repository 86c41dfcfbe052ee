"""Native rigid-body core: quaternions, frames, and the RigidBody pytree.

This replaces the reference's dependency on ``jax_md.rigid_body`` (see
mythos/energy/base.py:48, mythos/simulators/io.py:19 in the reference): the
TPU build owns its rigid-body math so the whole simulation step can be traced
and fused by XLA without any external library.

Conventions
-----------
* Quaternions are raw ``(..., 4)`` arrays, scalar-first ``[w, x, y, z]``.
* The nucleotide frame is the rotation-matrix columns:
  ``a1 = R @ e_x`` (back->base vector), ``a2 = R @ e_y`` (cross product),
  ``a3 = R @ e_z`` (base normal). These match the oxDNA conventions used by
  the reference (mythos/energy/utils.py:18-36).
"""

from __future__ import annotations

import chex
import jax.numpy as jnp

from mythos_tpu.utils.types import Arr


@chex.dataclass(frozen=True)
class RigidBody:
    """Centers-of-mass plus quaternion orientations.

    ``center``: (..., 3); ``orientation``: (..., 4) unit quaternions.
    Also used as a generic two-slot container (e.g. per-DOF gamma/mass with
    scalar leaves), mirroring the reference's use of jax-md's RigidBody.
    """

    center: Arr
    orientation: Arr

    def __getitem__(self, key) -> "RigidBody":
        return RigidBody(center=self.center[key], orientation=self.orientation[key])

    def __add__(self, other: "RigidBody") -> "RigidBody":
        return RigidBody(
            center=self.center + other.center,
            orientation=self.orientation + other.orientation,
        )

    def __mul__(self, other) -> "RigidBody":
        if isinstance(other, RigidBody):
            return RigidBody(
                center=self.center * other.center,
                orientation=self.orientation * other.orientation,
            )
        return RigidBody(center=self.center * other, orientation=self.orientation * other)

    __rmul__ = __mul__


# Quaternion algebra ----------------------------------------------------------


def quat_multiply(p: Arr, q: Arr) -> Arr:
    """Hamilton product p * q for scalar-first quaternions, broadcasting."""
    pw, px, py, pz = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            pw * qw - px * qx - py * qy - pz * qz,
            pw * qx + px * qw + py * qz - pz * qy,
            pw * qy - px * qz + py * qw + pz * qx,
            pw * qz + px * qy - py * qx + pz * qw,
        ],
        axis=-1,
    )


def quat_conjugate(q: Arr) -> Arr:
    """Quaternion conjugate (inverse for unit quaternions)."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q: Arr, eps: float = 1e-30) -> Arr:
    """Normalize to unit length."""
    return q / jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + eps)


def quat_rotate(q: Arr, v: Arr) -> Arr:
    """Rotate 3-vectors v by unit quaternions q (lab frame = R(q) @ v)."""
    w = q[..., 0:1]
    u = q[..., 1:4]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_about_axis(angle: Arr, axis: int, dtype=None) -> Arr:
    """Unit quaternion for a rotation by ``angle`` about body axis e_{axis}."""
    half = 0.5 * angle
    c, s = jnp.cos(half), jnp.sin(half)
    z = jnp.zeros_like(c)
    comps = [c, z, z, z]
    comps[1 + axis] = s
    out = jnp.stack(comps, axis=-1)
    return out if dtype is None else out.astype(dtype)


# Frames ----------------------------------------------------------------------


def quat_frame(q: Arr) -> tuple[Arr, Arr, Arr]:
    """All three rotation-matrix columns (a1, a2, a3) in one fused pass.

    Equivalent to three separate conversions in the reference
    (mythos/energy/utils.py:18-36) but shares the quadratic quaternion
    products; XLA sees a single elementwise DAG.
    """
    q0, q1, q2, q3 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    q00, q11, q22, q33 = q0 * q0, q1 * q1, q2 * q2, q3 * q3
    q01, q02, q03 = q0 * q1, q0 * q2, q0 * q3
    q12, q13, q23 = q1 * q2, q1 * q3, q2 * q3

    a1 = jnp.stack([q00 + q11 - q22 - q33, 2.0 * (q12 + q03), 2.0 * (q13 - q02)], axis=-1)
    a2 = jnp.stack([2.0 * (q12 - q03), q00 - q11 + q22 - q33, 2.0 * (q23 + q01)], axis=-1)
    a3 = jnp.stack([2.0 * (q13 + q02), 2.0 * (q23 - q01), q00 - q11 - q22 + q33], axis=-1)
    return a1, a2, a3


def q_to_back_base(q: Arr) -> Arr:
    """Back->base vector a1 (first rotation column)."""
    q0, q1, q2, q3 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [q0**2 + q1**2 - q2**2 - q3**2, 2.0 * (q1 * q2 + q0 * q3), 2.0 * (q1 * q3 - q0 * q2)],
        axis=-1,
    )


def q_to_cross_prod(q: Arr) -> Arr:
    """Cross-product vector a2 (second rotation column)."""
    q0, q1, q2, q3 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [2.0 * (q1 * q2 - q0 * q3), q0**2 - q1**2 + q2**2 - q3**2, 2.0 * (q2 * q3 + q0 * q1)],
        axis=-1,
    )


def q_to_base_normal(q: Arr) -> Arr:
    """Base-normal vector a3 (third rotation column)."""
    q0, q1, q2, q3 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [2.0 * (q1 * q3 + q0 * q2), 2.0 * (q2 * q3 - q0 * q1), q0**2 - q1**2 - q2**2 + q3**2],
        axis=-1,
    )


def quat_map_angular(q: Arr, omega_body: Arr) -> Arr:
    """dq/dt for body angular velocity: 0.5 * q * (0, omega_body)."""
    zero = jnp.zeros_like(omega_body[..., :1])
    return 0.5 * quat_multiply(q, jnp.concatenate([zero, omega_body], axis=-1))


def quat_cotangent_to_torque(q: Arr, dE_dq: Arr) -> Arr:
    """Body-frame torque from the energy gradient w.r.t. the quaternion.

    With dq = 0.5 * q * (0, omega_b) dt, the conjugate generalized force gives
    tau_body = -0.5 * S(q)^T dE/dq where S(q) columns are q * e_i.
    """
    # S(q)^T g = vector part of (q^-1 * g) for unit q.
    qinv_g = quat_multiply(quat_conjugate(q), dE_dq)
    return -0.5 * qinv_g[..., 1:4]
