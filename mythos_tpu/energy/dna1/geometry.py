"""Shared pair-geometry computations for the oxDNA-family terms.

The angle definitions follow the oxDNA1 paper as implemented in the reference
term classes (mythos/energy/dna1/{stacking,hydrogen_bonding,cross_stacking,
coaxial_stacking}.py). Each function gathers per-pair site/frame data and
returns the full angle set for one interaction family; terms sharing pairs
reuse the same geometry, and XLA CSE dedupes any remaining overlap inside a
jitted step.

Pair-direction conventions (must match the reference exactly):
* bonded pairs:   dr_site = displacement(site[i], site[j])  (i minus j)
* unbonded pairs: dr_site = displacement(site[j], site[i])  (j minus i)
"""

from __future__ import annotations

from collections.abc import Callable
from typing import NamedTuple

import jax.numpy as jnp

from mythos_tpu.energy.base import BaseNucleotide
from mythos_tpu.utils.math import safe_arccos
from mythos_tpu.utils.types import Arr


def _safe(r: Arr, eps: float = 1e-12) -> Arr:
    """Guard a pair distance away from zero (padded entries have r == 0;
    they are masked downstream, the guard keeps their gradients finite)."""
    return jnp.where(r > eps, r, 1.0)


def _angle(u: Arr, v: Arr) -> Arr:
    """NaN-safe arccos of the row-wise dot."""
    return safe_arccos(jnp.sum(u * v, axis=-1))


def _outer_dot3(u: Arr, v: Arr) -> Arr:
    """(N,3) x (M,3) -> (N,M) pairwise dots, exact f32 on the VPU."""
    return (
        u[:, 0, None] * v[None, :, 0]
        + u[:, 1, None] * v[None, :, 1]
        + u[:, 2, None] * v[None, :, 2]
    )


def _field_dot3_i(u: Arr, field: Arr) -> Arr:
    """(N,3) x (N,M,3) -> (N,M): dot of each row vector with the field."""
    return (
        u[:, None, 0] * field[..., 0]
        + u[:, None, 1] * field[..., 1]
        + u[:, None, 2] * field[..., 2]
    )


def _field_dot3_j(u: Arr, field: Arr) -> Arr:
    """(M,3) x (N,M,3) -> (N,M): dot of each column vector with the field."""
    return (
        u[None, :, 0] * field[..., 0]
        + u[None, :, 1] * field[..., 1]
        + u[None, :, 2] * field[..., 2]
    )


def _angle_dr(u: Arr, dr: Arr, r: Arr) -> Arr:
    """NaN-safe arccos of (u . dr) / r."""
    return safe_arccos(jnp.sum(u * dr, axis=-1) / _safe(r))


class BondedGeometry(NamedTuple):
    """Geometry for one bonded (backbone-connected) pair set."""

    dr_back: Arr
    r_back: Arr
    dr_stack: Arr
    r_stack: Arr
    dr_base: Arr
    dr_back_base: Arr
    dr_base_back: Arr
    theta4: Arr
    theta5: Arr
    theta6: Arr
    cosphi1: Arr
    cosphi2: Arr


def bonded_geometry(
    nuc: BaseNucleotide,
    nn_i: Arr,
    nn_j: Arr,
    displacement_fn: Callable,
    back_sites: Arr | None = None,
) -> BondedGeometry:
    """All geometry used by FENE / bonded-exc-vol / stacking in one pass.

    ``back_sites`` overrides the backbone-site array (oxDNA2 stacking uses the
    dna1-compatible backbone site, mythos/energy/dna2/stacking.py:27-29).
    """
    bs = nuc.back_sites if back_sites is None else back_sites
    back_i, back_j = bs[nn_i], bs[nn_j]
    base_i, base_j = nuc.base_sites[nn_i], nuc.base_sites[nn_j]
    n_i, n_j = nuc.base_normals[nn_i], nuc.base_normals[nn_j]

    dr_back = displacement_fn(back_i, back_j)
    r_back = jnp.linalg.norm(dr_back, axis=-1)

    dr_stack = displacement_fn(nuc.stack_sites[nn_i], nuc.stack_sites[nn_j])
    r_stack = jnp.linalg.norm(dr_stack, axis=-1)

    theta4 = _angle(n_i, n_j)
    theta5 = jnp.pi - _angle_dr(n_j, dr_stack, r_stack)
    theta6 = jnp.pi - _angle_dr(n_i, dr_stack, r_stack)
    cosphi1 = -jnp.sum(nuc.cross_prods[nn_i] * dr_back, axis=-1) / _safe(r_back)
    cosphi2 = -jnp.sum(nuc.cross_prods[nn_j] * dr_back, axis=-1) / _safe(r_back)

    return BondedGeometry(
        dr_back=dr_back,
        r_back=r_back,
        dr_stack=dr_stack,
        r_stack=r_stack,
        dr_base=displacement_fn(base_i, base_j),
        dr_back_base=displacement_fn(back_i, base_j),
        dr_base_back=displacement_fn(base_i, back_j),
        theta4=theta4,
        theta5=theta5,
        theta6=theta6,
        cosphi1=cosphi1,
        cosphi2=cosphi2,
    )


class UnbondedGeometry(NamedTuple):
    """Geometry for the unbonded pair set (base-site centric: HB/cross)."""

    dr_base: Arr
    r_base: Arr
    theta1: Arr
    theta2: Arr
    theta3: Arr
    theta4: Arr
    theta7: Arr
    theta8: Arr


def unbonded_geometry(
    nuc_i: BaseNucleotide,
    nuc_j: BaseNucleotide,
    op_i: Arr,
    op_j: Arr,
    displacement_fn: Callable,
) -> UnbondedGeometry:
    """Angle set shared by hydrogen bonding and cross stacking."""
    a1_i, a1_j = nuc_i.back_base_vectors[op_i], nuc_j.back_base_vectors[op_j]
    n_i, n_j = nuc_i.base_normals[op_i], nuc_j.base_normals[op_j]

    dr_base = displacement_fn(nuc_j.base_sites[op_j], nuc_i.base_sites[op_i])
    r_base = jnp.linalg.norm(dr_base, axis=-1)

    return UnbondedGeometry(
        dr_base=dr_base,
        r_base=r_base,
        theta1=_angle(-a1_i, a1_j),
        theta2=_angle_dr(-a1_j, dr_base, r_base),
        theta3=_angle_dr(a1_i, dr_base, r_base),
        theta4=_angle(n_i, n_j),
        theta7=_angle_dr(-n_j, dr_base, r_base),
        theta8=jnp.pi - _angle_dr(n_i, dr_base, r_base),
    )


def unbonded_geometry_dense(
    nuc_i: BaseNucleotide,
    nuc_j: BaseNucleotide,
    displacement_fn: Callable,
) -> UnbondedGeometry:
    """Dense (N, N) variant of unbonded_geometry: no index gathers.

    TPU gathers are the dominant cost of the pair-list path (profiled at
    ~70% of the energy evaluation); broadcasting the per-nucleotide site
    arrays instead turns the whole angle set into vectorized (N, N) math.
    dr[i, j] = displacement(site_j, site_i), matching the pair-list
    convention.
    """
    a1_i = nuc_i.back_base_vectors
    a1_j = nuc_j.back_base_vectors
    n_i = nuc_i.base_normals
    n_j = nuc_j.base_normals

    dr_base = displacement_fn(nuc_j.base_sites[None, :, :], nuc_i.base_sites[:, None, :])
    # epsilon inside the sqrt keeps the diagonal's gradient finite (r=0 there)
    r_base = jnp.sqrt(jnp.sum(dr_base * dr_base, axis=-1) + 1e-18)
    inv_r = 1.0 / _safe(r_base)

    # frame-frame angles are plain (N,3)@(3,N) contractions (MXU)
    # elementwise 3-component dots, NOT einsum: the default matmul precision
    # rounds f32 operands to bf16 on the TPU MXU, which loses ~4e-3 in each
    # cosine and up to 1e-2 per pair energy through arccos near |x|=1
    theta1 = safe_arccos(-_outer_dot3(a1_i, a1_j))
    theta4 = safe_arccos(_outer_dot3(n_i, n_j))
    # frame-dr angles contract the (N,N,3) displacement field once each
    theta2 = safe_arccos(-_field_dot3_j(a1_j, dr_base) * inv_r)
    theta3 = safe_arccos(_field_dot3_i(a1_i, dr_base) * inv_r)
    theta7 = safe_arccos(-_field_dot3_j(n_j, dr_base) * inv_r)
    theta8 = jnp.pi - safe_arccos(_field_dot3_i(n_i, dr_base) * inv_r)

    return UnbondedGeometry(
        dr_base=dr_base,
        r_base=r_base,
        theta1=theta1,
        theta2=theta2,
        theta3=theta3,
        theta4=theta4,
        theta7=theta7,
        theta8=theta8,
    )


def coax_geometry_dense(
    nuc_i: BaseNucleotide,
    nuc_j: BaseNucleotide,
    displacement_fn: Callable,
) -> CoaxGeometry:
    """Dense (N, N) variant of coax_geometry."""
    a1_i = nuc_i.back_base_vectors
    a1_j = nuc_j.back_base_vectors
    n_i = nuc_i.base_normals
    n_j = nuc_j.base_normals

    dr_stack = displacement_fn(nuc_j.stack_sites[None, :, :], nuc_i.stack_sites[:, None, :])
    r_stack = jnp.sqrt(jnp.sum(dr_stack * dr_stack, axis=-1) + 1e-18)
    dr_stack_norm = dr_stack * (1.0 / _safe(r_stack))[..., None]

    dr_back = displacement_fn(nuc_j.back_sites[None, :, :], nuc_i.back_sites[:, None, :])
    r_back = jnp.sqrt(jnp.sum(dr_back * dr_back, axis=-1) + 1e-18)
    dr_back_norm = dr_back * (1.0 / _safe(r_back))[..., None]

    # elementwise 3-component dots, NOT einsum (see unbonded_geometry_dense)
    theta1 = safe_arccos(-_outer_dot3(a1_i, a1_j))
    theta4 = safe_arccos(_outer_dot3(n_i, n_j))
    theta5 = safe_arccos(_field_dot3_i(n_i, dr_stack_norm))
    theta6 = safe_arccos(-_field_dot3_j(n_j, dr_stack_norm))
    cosphi3 = jnp.sum(dr_stack_norm * jnp.cross(dr_back_norm, a1_j[None, :, :]), axis=-1)
    cosphi4 = jnp.sum(dr_stack_norm * jnp.cross(dr_back_norm, a1_i[:, None, :]), axis=-1)

    return CoaxGeometry(
        dr_stack=dr_stack,
        r_stack=r_stack,
        theta1=theta1,
        theta4=theta4,
        theta5=theta5,
        theta6=theta6,
        cosphi3=cosphi3,
        cosphi4=cosphi4,
    )


class CoaxGeometry(NamedTuple):
    """Geometry for coaxial stacking (stack/backbone-site centric)."""

    dr_stack: Arr
    r_stack: Arr
    theta1: Arr
    theta4: Arr
    theta5: Arr
    theta6: Arr
    cosphi3: Arr
    cosphi4: Arr


def coax_geometry(
    nuc_i: BaseNucleotide,
    nuc_j: BaseNucleotide,
    op_i: Arr,
    op_j: Arr,
    displacement_fn: Callable,
) -> CoaxGeometry:
    """Angle set for dna1 coaxial stacking."""
    a1_i, a1_j = nuc_i.back_base_vectors[op_i], nuc_j.back_base_vectors[op_j]
    n_i, n_j = nuc_i.base_normals[op_i], nuc_j.base_normals[op_j]

    dr_stack = displacement_fn(nuc_j.stack_sites[op_j], nuc_i.stack_sites[op_i])
    r_stack = jnp.linalg.norm(dr_stack, axis=-1)
    dr_stack_norm = dr_stack / _safe(r_stack)[..., None]

    dr_back = displacement_fn(nuc_j.back_sites[op_j], nuc_i.back_sites[op_i])
    dr_back_norm = dr_back / _safe(jnp.linalg.norm(dr_back, axis=-1))[..., None]

    return CoaxGeometry(
        dr_stack=dr_stack,
        r_stack=r_stack,
        theta1=_angle(-a1_i, a1_j),
        theta4=_angle(n_i, n_j),
        theta5=_angle(n_i, dr_stack_norm),
        theta6=_angle(-n_j, dr_stack_norm),
        cosphi3=jnp.sum(dr_stack_norm * jnp.cross(dr_back_norm, a1_j), axis=-1),
        cosphi4=jnp.sum(dr_stack_norm * jnp.cross(dr_back_norm, a1_i), axis=-1),
    )


# SoA variants -------------------------------------------------------------------
#
# Component-array geometry for the TPU hot loop (see mythos_tpu/soa.py).
# The returned NamedTuples carry (B, B) tile leaves (unbonded) or (B,) pair
# leaves (bonded) but keep the SAME field names, so the term product
# functions (stack_product, hb_product, ...) evaluate them unchanged.

from mythos_tpu.soa import Vec3, vcross, vdot  # noqa: E402


def _rows(v: Vec3) -> Vec3:
    """(B,) -> (B, 1) row broadcast."""
    return Vec3(v.x[:, None], v.y[:, None], v.z[:, None])


def _cols(v: Vec3) -> Vec3:
    """(B,) -> (1, B) column broadcast."""
    return Vec3(v.x[None, :], v.y[None, :], v.z[None, :])


def _vnorm_tile(v: Vec3) -> Arr:
    """Norm with an epsilon: zero-distance (diagonal/padded) entries keep
    finite gradients (they are masked downstream)."""
    return jnp.sqrt(vdot(v, v) + 1e-18)


def unbonded_geometry_tile_soa(
    nuc_i,  # NucleotideSoA rows, (B,) leaves
    nuc_j,  # NucleotideSoA cols, (B,) leaves
    displacement_fn,  # SoA displacement over Vec3
) -> UnbondedGeometry:
    """(B, M) tile of the HB/cross-stacking angle set, fully elementwise."""
    return unbonded_geometry_vec(
        _rows(nuc_i.base), _cols(nuc_j.base),
        _rows(nuc_i.a1), _cols(nuc_j.a1),
        _rows(nuc_i.a3), _cols(nuc_j.a3),
        displacement_fn,
    )


def coax_geometry_tile_soa(nuc_i, nuc_j, displacement_fn) -> CoaxGeometry:
    """(B, M) tile of the coaxial-stacking angle set."""
    return coax_geometry_vec(
        _rows(nuc_i.stack), _cols(nuc_j.stack),
        _rows(nuc_i.back), _cols(nuc_j.back),
        _rows(nuc_i.a1), _cols(nuc_j.a1),
        _rows(nuc_i.a3), _cols(nuc_j.a3),
        displacement_fn,
    )


def _gather_vec3(v: Vec3, idx) -> Vec3:
    return Vec3(v.x[idx], v.y[idx], v.z[idx])


def bonded_geometry_soa(
    nuc,  # NucleotideSoA, (N,) leaves
    nn_i: Arr,
    nn_j: Arr,
    displacement_fn,
    back: Vec3 | None = None,
) -> BondedGeometry:
    """(B,) bonded-pair geometry from SoA fields (1-D gathers only).

    ``back`` overrides the backbone-site field (oxDNA2 stacking uses the
    dna1-compatible backbone site).
    """
    bs = nuc.back if back is None else back
    back_i, back_j = _gather_vec3(bs, nn_i), _gather_vec3(bs, nn_j)
    base_i, base_j = _gather_vec3(nuc.base, nn_i), _gather_vec3(nuc.base, nn_j)
    n_i, n_j = _gather_vec3(nuc.a3, nn_i), _gather_vec3(nuc.a3, nn_j)
    stack_i, stack_j = _gather_vec3(nuc.stack, nn_i), _gather_vec3(nuc.stack, nn_j)

    dr_back = displacement_fn(back_i, back_j)
    r_back = jnp.sqrt(vdot(dr_back, dr_back) + 1e-18)
    dr_stack = displacement_fn(stack_i, stack_j)
    r_stack = jnp.sqrt(vdot(dr_stack, dr_stack) + 1e-18)
    inv_r_stack = 1.0 / r_stack
    inv_r_back = 1.0 / r_back

    return BondedGeometry(
        dr_back=dr_back,
        r_back=r_back,
        dr_stack=dr_stack,
        r_stack=r_stack,
        dr_base=displacement_fn(base_i, base_j),
        dr_back_base=displacement_fn(back_i, base_j),
        dr_base_back=displacement_fn(base_i, back_j),
        theta4=safe_arccos(vdot(n_i, n_j)),
        theta5=jnp.pi - safe_arccos(vdot(n_j, dr_stack) * inv_r_stack),
        theta6=jnp.pi - safe_arccos(vdot(n_i, dr_stack) * inv_r_stack),
        cosphi1=-vdot(_gather_vec3(nuc.a2, nn_i), dr_back) * inv_r_back,
        cosphi2=-vdot(_gather_vec3(nuc.a2, nn_j), dr_back) * inv_r_back,
    )


def _roll_vec3(v: Vec3) -> Vec3:
    """Partner fields for consecutive bonded pairs: j = i + 1 via lane roll."""
    return Vec3(jnp.roll(v.x, -1), jnp.roll(v.y, -1), jnp.roll(v.z, -1))


def bonded_geometry_shift_soa(
    nuc,  # NucleotideSoA, (N,) leaves
    displacement_fn,
    back: Vec3 | None = None,
) -> BondedGeometry:
    """(N,) bonded geometry with partner j = i + 1 via jnp.roll (no gathers).

    Valid only where the term's ``bonded_next_mask`` is True -- rows whose
    successor is not a bonded partner (strand ends, wrap-around) compute
    finite garbage that callers mask to zero. Roll is a lane rotate on TPU,
    and its transpose is a roll the other way: the whole bonded gradient
    becomes gather/scatter-free.
    """
    bs = nuc.back if back is None else back
    back_i, back_j = bs, _roll_vec3(bs)
    base_i, base_j = nuc.base, _roll_vec3(nuc.base)
    n_i, n_j = nuc.a3, _roll_vec3(nuc.a3)
    stack_i, stack_j = nuc.stack, _roll_vec3(nuc.stack)

    dr_back = displacement_fn(back_i, back_j)
    r_back = jnp.sqrt(vdot(dr_back, dr_back) + 1e-18)
    dr_stack = displacement_fn(stack_i, stack_j)
    r_stack = jnp.sqrt(vdot(dr_stack, dr_stack) + 1e-18)
    inv_r_stack = 1.0 / r_stack
    inv_r_back = 1.0 / r_back

    return BondedGeometry(
        dr_back=dr_back,
        r_back=r_back,
        dr_stack=dr_stack,
        r_stack=r_stack,
        dr_base=displacement_fn(base_i, base_j),
        dr_back_base=displacement_fn(back_i, base_j),
        dr_base_back=displacement_fn(base_i, back_j),
        theta4=safe_arccos(vdot(n_i, n_j)),
        theta5=jnp.pi - safe_arccos(vdot(n_j, dr_stack) * inv_r_stack),
        theta6=jnp.pi - safe_arccos(vdot(n_i, dr_stack) * inv_r_stack),
        cosphi1=-vdot(nuc.a2, dr_back) * inv_r_back,
        cosphi2=-vdot(_roll_vec3(nuc.a2), dr_back) * inv_r_back,
    )


def unbonded_geometry_vec(
    base_i: Vec3, base_j: Vec3, a1_i: Vec3, a1_j: Vec3, n_i: Vec3, n_j: Vec3, displacement_fn,
    arccos=safe_arccos,
) -> UnbondedGeometry:
    """HB/cross angle set from pre-broadcast Vec3 fields (any shapes).

    The single source of the tile formulas: the (B, M) XLA tile path and the
    Pallas kernels (ops/oxdna_tiles.py) both call this, so parity is by
    construction.
    """
    dr_base = displacement_fn(base_j, base_i)
    r_base = jnp.sqrt(vdot(dr_base, dr_base) + 1e-18)
    inv_r = 1.0 / r_base
    return UnbondedGeometry(
        dr_base=dr_base,
        r_base=r_base,
        theta1=arccos(-vdot(a1_i, a1_j)),
        theta2=arccos(-vdot(a1_j, dr_base) * inv_r),
        theta3=arccos(vdot(a1_i, dr_base) * inv_r),
        theta4=arccos(vdot(n_i, n_j)),
        theta7=arccos(-vdot(n_j, dr_base) * inv_r),
        theta8=jnp.pi - arccos(vdot(n_i, dr_base) * inv_r),
    )


def coax_geometry_vec(
    stack_i: Vec3, stack_j: Vec3, back_i: Vec3, back_j: Vec3,
    a1_i: Vec3, a1_j: Vec3, n_i: Vec3, n_j: Vec3, displacement_fn,
    arccos=safe_arccos,
) -> CoaxGeometry:
    """Coaxial-stacking angle set from pre-broadcast Vec3 fields."""
    dr_stack = displacement_fn(stack_j, stack_i)
    r_stack = jnp.sqrt(vdot(dr_stack, dr_stack) + 1e-18)
    dr_stack_norm = dr_stack * (1.0 / r_stack)
    dr_back = displacement_fn(back_j, back_i)
    dr_back_norm = dr_back * (1.0 / jnp.sqrt(vdot(dr_back, dr_back) + 1e-18))
    return CoaxGeometry(
        dr_stack=dr_stack,
        r_stack=r_stack,
        theta1=arccos(-vdot(a1_i, a1_j)),
        theta4=arccos(vdot(n_i, n_j)),
        theta5=arccos(vdot(n_i, dr_stack_norm)),
        theta6=arccos(-vdot(n_j, dr_stack_norm)),
        cosphi3=vdot(dr_stack_norm, vcross(dr_back_norm, a1_j)),
        cosphi4=vdot(dr_stack_norm, vcross(dr_back_norm, a1_i)),
    )
