"""Structure-of-arrays (SoA) rigid-body core: the TPU hot-loop layout.

Why this exists: TPU vector registers are (8 sublanes, 128 lanes) tiles, and
XLA lays arrays out with the LAST dimension in lanes. An ``(N, 3)`` position
array therefore occupies 3/128 lanes -- every materialized ``(N, 3)`` or
``(N, 4)`` intermediate wastes ~40x memory bandwidth and compute. Measured on
a v5e: one scan step of the quaternion free-rotor costs 155 us with (N, 4)
arrays vs 0.6 us with four separate (N,) component arrays (260x), identical
math.

So the hot loop -- integrator state, site transform, tile geometry -- runs on
component arrays. ``Vec3``/``Quat``/``BodySoA`` are NamedTuples (pytrees), so
they flow through jit/grad/scan natively, and ``jax.grad`` of an energy
defined on ``BodySoA`` yields component gradients with the same layout.

The AoS ``RigidBody`` (rigid_body.py) remains the public/user-facing
container (file IO, observables, trajectories); conversion happens once per
simulation segment, never inside the stepped loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mythos_tpu.rigid_body import RigidBody
from mythos_tpu.utils.types import Arr, Scalar


class Vec3(NamedTuple):
    """A 3-vector field as separate component arrays (any common shape)."""

    x: Arr
    y: Arr
    z: Arr

    def __add__(self, o: "Vec3") -> "Vec3":
        return Vec3(self.x + o.x, self.y + o.y, self.z + o.z)

    def __sub__(self, o: "Vec3") -> "Vec3":
        return Vec3(self.x - o.x, self.y - o.y, self.z - o.z)

    def __mul__(self, s) -> "Vec3":
        return Vec3(self.x * s, self.y * s, self.z * s)

    __rmul__ = __mul__

    def __neg__(self) -> "Vec3":
        return Vec3(-self.x, -self.y, -self.z)


def vdot(a: Vec3, b: Vec3) -> Arr:
    return a.x * b.x + a.y * b.y + a.z * b.z

def vcross(a: Vec3, b: Vec3) -> Vec3:
    return Vec3(
        a.y * b.z - a.z * b.y,
        a.z * b.x - a.x * b.z,
        a.x * b.y - a.y * b.x,
    )

def vnorm2(a: Vec3) -> Arr:
    return vdot(a, a)

def vnorm(a: Vec3, eps: float = 0.0) -> Arr:
    return jnp.sqrt(vnorm2(a) + eps)


class Quat(NamedTuple):
    """Scalar-first quaternion as separate component arrays."""

    w: Arr
    x: Arr
    y: Arr
    z: Arr


class BodySoA(NamedTuple):
    """Rigid-body state: center Vec3 + orientation Quat, all (N,) leaves."""

    center: Vec3
    orientation: Quat


def to_soa(body: RigidBody) -> BodySoA:
    """AoS RigidBody -> SoA (use outside the hot loop)."""
    c, q = body.center, body.orientation
    return BodySoA(
        center=Vec3(c[..., 0], c[..., 1], c[..., 2]),
        orientation=Quat(q[..., 0], q[..., 1], q[..., 2], q[..., 3]),
    )


def from_soa(soa: BodySoA) -> RigidBody:
    """SoA -> AoS RigidBody (use outside the hot loop)."""
    return RigidBody(
        center=jnp.stack(tuple(soa.center), axis=-1),
        orientation=jnp.stack(tuple(soa.orientation), axis=-1),
    )


def quat_multiply_soa(p: Quat, q: Quat) -> Quat:
    """Hamilton product p * q."""
    return Quat(
        p.w * q.w - p.x * q.x - p.y * q.y - p.z * q.z,
        p.w * q.x + p.x * q.w + p.y * q.z - p.z * q.y,
        p.w * q.y - p.x * q.z + p.y * q.w + p.z * q.x,
        p.w * q.z + p.x * q.y - p.y * q.x + p.z * q.w,
    )


def quat_normalize_soa(q: Quat, eps: float = 1e-30) -> Quat:
    inv = jax.lax.rsqrt(q.w * q.w + q.x * q.x + q.y * q.y + q.z * q.z + eps)
    return Quat(q.w * inv, q.x * inv, q.y * inv, q.z * inv)


def quat_rotate_soa(q: Quat, v: Vec3) -> Vec3:
    """Rotate vectors v by unit quaternions q (lab frame = R(q) @ v)."""
    u = Vec3(q.x, q.y, q.z)
    uv = vcross(u, v)
    t = Vec3(q.w * uv.x, q.w * uv.y, q.w * uv.z) + vcross(u, uv)
    return Vec3(v.x + 2.0 * t.x, v.y + 2.0 * t.y, v.z + 2.0 * t.z)


def quat_frame_soa(q: Quat) -> tuple[Vec3, Vec3, Vec3]:
    """Rotation-matrix columns (a1, a2, a3), all elementwise (no stacking).

    Matches rigid_body.quat_frame (mythos/energy/utils.py:18-36 conventions).
    """
    q00, q11, q22, q33 = q.w * q.w, q.x * q.x, q.y * q.y, q.z * q.z
    q01, q02, q03 = q.w * q.x, q.w * q.y, q.w * q.z
    q12, q13, q23 = q.x * q.y, q.x * q.z, q.y * q.z
    a1 = Vec3(q00 + q11 - q22 - q33, 2.0 * (q12 + q03), 2.0 * (q13 - q02))
    a2 = Vec3(2.0 * (q12 - q03), q00 - q11 + q22 - q33, 2.0 * (q23 + q01))
    a3 = Vec3(2.0 * (q13 + q02), 2.0 * (q23 - q01), q00 - q11 - q22 + q33)
    return a1, a2, a3


#: NO_SQUISH stage sequence: (axis, dt fraction)
_NO_SQUISH_STAGES = ((2, 0.5), (1, 0.5), (0, 1.0), (1, 0.5), (2, 0.5))


def free_rotor_soa(
    q: Quat, angmom: Vec3, inv_inertia: tuple[Scalar, Scalar, Scalar], dt: Scalar
) -> tuple[Quat, Vec3]:
    """Exact NO_SQUISH free rigid-rotor flow for time dt, fully elementwise.

    Semantically identical to integrators.free_rotor (Miller et al. 2002
    5-stage splitting): per principal axis k, q <- q * rho_k(phi/2-angle),
    L <- R_k(-phi) L with phi = dt L_k / I_k. Component-array form: each
    stage is a fused multiply pattern, no lane slicing or stacking.
    """
    w = q.w
    qs = [q.x, q.y, q.z]
    Ls = [angmom.x, angmom.y, angmom.z]  # noqa: N806
    for axis, frac in _NO_SQUISH_STAGES:
        phi = (dt * frac) * Ls[axis] * inv_inertia[axis]
        h = 0.5 * phi
        c, s = jnp.cos(h), jnp.sin(h)
        # q * rho_axis(h): rho = (c, s*e_axis)
        if axis == 0:
            w, qs[0], qs[1], qs[2] = (
                w * c - qs[0] * s,
                w * s + qs[0] * c,
                qs[1] * c + qs[2] * s,
                qs[2] * c - qs[1] * s,
            )
        elif axis == 1:
            w, qs[0], qs[1], qs[2] = (
                w * c - qs[1] * s,
                qs[0] * c - qs[2] * s,
                w * s + qs[1] * c,
                qs[2] * c + qs[0] * s,
            )
        else:
            w, qs[0], qs[1], qs[2] = (
                w * c - qs[2] * s,
                qs[0] * c + qs[1] * s,
                qs[1] * c - qs[0] * s,
                w * s + qs[2] * c,
            )
        # L <- R_axis(-phi) L
        cc, ss = jnp.cos(phi), jnp.sin(phi)
        j, k = (axis + 1) % 3, (axis + 2) % 3
        Lj, Lk = Ls[j], Ls[k]  # noqa: N806
        Ls[j] = cc * Lj + ss * Lk
        Ls[k] = -ss * Lj + cc * Lk
    qn = quat_normalize_soa(Quat(w, qs[0], qs[1], qs[2]))
    return qn, Vec3(Ls[0], Ls[1], Ls[2])


def quat_cotangent_to_torque_soa(q: Quat, g: Quat) -> Vec3:
    """Body-frame torque from dE/dq: tau = -0.5 * vec(q^-1 * g)."""
    # q^-1 = conjugate for unit q
    qc = Quat(q.w, -q.x, -q.y, -q.z)
    prod = quat_multiply_soa(qc, g)
    return Vec3(-0.5 * prod.x, -0.5 * prod.y, -0.5 * prod.z)
