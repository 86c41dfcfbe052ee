"""Fused pairwise LJ energy kernel (Pallas, tiled dense pair matrix).

The MARTINI nonbonded path evaluates a shifted 12-6 LJ over all non-bonded
pairs (mythos_tpu/energy/martini/m2.py). This kernel tiles the (N, N) pair
matrix into VMEM blocks: each grid cell loads a TILE x TILE block of
positions/types, computes minimum-image distances, the per-type-pair
sigma/epsilon lookup (via one-hot contraction against the small type tables,
an MXU-shaped contraction), the shifted LJ, masks (triangular + bonded +
padding), and accumulates a partial energy.

A custom VJP supplies the analytic position gradient (forces): d/dr of the
shifted LJ has the same masked-tile structure, so the backward pass is a
second Pallas kernel rather than autodiff through the forward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mythos_tpu.utils.types import Arr

TILE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _lj_terms(r2: Arr, sigma: Arr, eps: Arr, cutoff: float) -> tuple[Arr, Arr]:
    """(shifted energy, dV/d(r^2) / 1) per pair given squared distances."""
    inv_r2 = sigma * sigma / r2
    x6 = inv_r2 * inv_r2 * inv_r2
    v = 4.0 * eps * (x6 * x6 - x6)
    c6 = (sigma / cutoff) ** 6
    v_c = 4.0 * eps * (c6 * c6 - c6)
    inside = r2 < cutoff * cutoff
    energy = jnp.where(inside, v - v_c, 0.0)
    # dV/dr2 = 4 eps (-12 x12 + 6 x6) / (2 r2)
    dv_dr2 = jnp.where(inside, 4.0 * eps * (-12.0 * x6 * x6 + 6.0 * x6) / (2.0 * r2), 0.0)
    return energy, dv_dr2


def _pair_block(
    pos_i, pos_j, onehot_i, onehot_j, box, sigmas, epsilons, cutoff
):
    """Per-tile pair geometry + parameter lookup shared by fwd/bwd."""
    dr = pos_i[:, None, :] - pos_j[None, :, :]
    dr = dr - box * jnp.round(dr / box)
    r2 = jnp.sum(dr * dr, axis=-1) + 1e-18

    # per-pair sigma/eps via one-hot contractions (small matmuls -> MXU)
    sig_rows = jnp.dot(onehot_i, sigmas, preferred_element_type=pos_i.dtype)  # (T, n_types)
    sigma = jnp.einsum("ik,jk->ij", sig_rows, onehot_j)
    eps_rows = jnp.dot(onehot_i, epsilons, preferred_element_type=pos_i.dtype)
    eps = jnp.einsum("ik,jk->ij", eps_rows, onehot_j)
    return dr, r2, sigma, eps


def _fwd_kernel(pos_ref, onehot_ref, mask_ref, box_ref, sig_ref, eps_ref, out_ref, *, cutoff):
    i = pl.program_id(0)
    j = pl.program_id(1)

    pos_i = pos_ref[pl.ds(i * TILE, TILE), :]
    pos_j = pos_ref[pl.ds(j * TILE, TILE), :]
    oh_i = onehot_ref[pl.ds(i * TILE, TILE), :]
    oh_j = onehot_ref[pl.ds(j * TILE, TILE), :]
    mask = mask_ref[pl.ds(i * TILE, TILE), pl.ds(j * TILE, TILE)]
    box = box_ref[0, :]

    _, r2, sigma, eps = _pair_block(pos_i, pos_j, oh_i, oh_j, box, sig_ref[:, :], eps_ref[:, :], cutoff)
    energy, _ = _lj_terms(r2, sigma, eps, cutoff)
    partial = jnp.sum(jnp.where(mask, energy, 0.0))

    @pl.when((i == 0) & (j == 0))
    def _():
        out_ref[0, 0] = jnp.zeros((), pos_i.dtype)

    out_ref[0, 0] += partial


def _bwd_kernel(pos_ref, onehot_ref, mask_ref, box_ref, sig_ref, eps_ref, grad_ref, *, cutoff):
    i = pl.program_id(0)
    n_j = pl.num_programs(1)
    j = pl.program_id(1)

    pos_i = pos_ref[pl.ds(i * TILE, TILE), :]
    pos_j = pos_ref[pl.ds(j * TILE, TILE), :]
    oh_i = onehot_ref[pl.ds(i * TILE, TILE), :]
    oh_j = onehot_ref[pl.ds(j * TILE, TILE), :]
    mask = mask_ref[pl.ds(i * TILE, TILE), pl.ds(j * TILE, TILE)]
    box = box_ref[0, :]

    dr, r2, sigma, eps = _pair_block(pos_i, pos_j, oh_i, oh_j, box, sig_ref[:, :], eps_ref[:, :], cutoff)
    _, dv_dr2 = _lj_terms(r2, sigma, eps, cutoff)
    # dE/dpos_i for pair (i, j) = dV/dr2 * 2 dr; mask covers both triangles
    coeff = jnp.where(mask, 2.0 * dv_dr2, 0.0)
    grad_i = jnp.sum(coeff[:, :, None] * dr, axis=1)

    @pl.when(j == 0)
    def _():
        grad_ref[pl.ds(i * TILE, TILE), :] = jnp.zeros_like(grad_i)

    grad_ref[pl.ds(i * TILE, TILE), :] += grad_i


def _prepare(positions, types, pair_mask, n_types):
    n = positions.shape[0]
    n_pad = _round_up(max(n, TILE), TILE)
    dtype = positions.dtype

    pos = jnp.zeros((n_pad, 3), dtype).at[:n].set(positions)
    onehot = jnp.zeros((n_pad, max(n_types, 8)), dtype)
    onehot = onehot.at[jnp.arange(n), types].set(1.0)
    mask = jnp.zeros((n_pad, n_pad), bool).at[:n, :n].set(pair_mask)
    return pos, onehot, mask, n_pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def lj_pair_energy(positions, types, pair_mask, box, tables, cutoff=1.1):
    """Total shifted-LJ energy over masked pairs (Pallas-tiled).

    Args:
        positions: (N, 3) bead positions.
        types: (N,) int type indices.
        pair_mask: (N, N) bool, True where the pair interacts (caller supplies
            the full symmetric-or-triangular mask; energies sum over True).
        box: (3,) periodic box.
        tables: (sigmas, epsilons) per-type-pair matrices.
        cutoff: LJ cutoff distance (static).
    """
    return _lj_fwd_impl(positions, types, pair_mask, box, tables, cutoff)


def _lj_fwd_impl(positions, types, pair_mask, box, tables, cutoff):
    sigmas, epsilons = tables
    dtype = positions.dtype
    n_types = sigmas.shape[0]
    pos, onehot, mask, n_pad = _prepare(positions, types, pair_mask, n_types)
    grid = (n_pad // TILE, n_pad // TILE)

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, cutoff=float(cutoff)),
        out_shape=jax.ShapeDtypeStruct((1, 1), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 6,
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        grid=grid,
        interpret=_interpret(),
    )(
        pos,
        onehot,
        mask,
        jnp.asarray(box, dtype).reshape(1, 3),
        jnp.asarray(sigmas, dtype).astype(dtype),
        jnp.asarray(epsilons, dtype).astype(dtype),
    )
    return out[0, 0]


def _lj_vjp_fwd(positions, types, pair_mask, box, tables, cutoff):
    energy = _lj_fwd_impl(positions, types, pair_mask, box, tables, cutoff)
    return energy, (positions, types, pair_mask, box, tables)


def _lj_vjp_bwd(cutoff, residuals, g):
    positions, types, pair_mask, box, tables = residuals
    sigmas, epsilons = tables
    dtype = positions.dtype
    n = positions.shape[0]
    n_types = sigmas.shape[0]
    # symmetrize: each unordered pair must contribute to both endpoints
    sym_mask = pair_mask | pair_mask.T
    pos, onehot, mask, n_pad = _prepare(positions, types, sym_mask, n_types)
    grid = (n_pad // TILE, n_pad // TILE)

    grad = pl.pallas_call(
        functools.partial(_bwd_kernel, cutoff=float(cutoff)),
        out_shape=jax.ShapeDtypeStruct((n_pad, 3), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 6,
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        grid=grid,
        interpret=_interpret(),
    )(
        pos,
        onehot,
        mask,
        jnp.asarray(box, dtype).reshape(1, 3),
        jnp.asarray(sigmas, dtype).astype(dtype),
        jnp.asarray(epsilons, dtype).astype(dtype),
    )
    return (g * grad[:n], None, None, None, None)


lj_pair_energy.defvjp(_lj_vjp_fwd, _lj_vjp_bwd)


def lj_energy_forces_reference(positions, types, pair_mask, box, tables, cutoff=1.1):
    """Pure-jnp reference (energy, forces) the kernel is validated against."""
    sigmas, epsilons = tables

    def energy_fn(pos):
        dr = pos[:, None, :] - pos[None, :, :]
        dr = dr - box * jnp.round(dr / box)
        r2 = jnp.sum(dr * dr, axis=-1) + 1e-18
        sigma = sigmas[types[:, None], types[None, :]]
        eps = epsilons[types[:, None], types[None, :]]
        energy, _ = _lj_terms(r2, sigma, eps, cutoff)
        return jnp.sum(jnp.where(pair_mask, energy, 0.0))

    energy, grad = jax.value_and_grad(energy_fn)(positions)
    return energy, -grad
