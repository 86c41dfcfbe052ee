"""Fused pairwise LJ energy kernel (Pallas, tiled dense pair matrix).

The MARTINI nonbonded path evaluates a shifted 12-6 LJ over all non-bonded
pairs (mythos_tpu/energy/martini/m2.py). This kernel tiles the (N, N) pair
matrix: each grid cell receives TILE-row/TILE-column blocks of positions and
type one-hots (BlockSpec-pipelined HBM -> VMEM), computes minimum-image
distances, the per-type-pair sigma/epsilon lookup as one-hot contractions
(MXU-shaped matmuls against the small type tables), the shifted LJ, masks
(caller-supplied pair mask + padding), and accumulates into a resident
output block (TPU grids iterate sequentially, so the revisited block pattern
is the standard reduction idiom).

A custom VJP supplies the analytic position gradient (forces): d/dr of the
shifted LJ has the same masked-tile structure, so the backward pass is a
second Pallas kernel rather than autodiff through the forward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from mythos_tpu.utils.types import Arr

TILE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _interpret() -> bool:
    import os

    override = os.environ.get("MYTHOS_TPU_PALLAS_INTERPRET")
    if override is not None:
        return override not in ("0", "false", "")
    return jax.default_backend() != "tpu"


def _lj_terms(r2: Arr, sigma: Arr, eps: Arr, cutoff: float) -> tuple[Arr, Arr]:
    """(shifted energy, dV/d(r^2)) per pair given squared distances."""
    inv_r2 = sigma * sigma / r2
    # clamp keeps padded zero-distance pairs finite in f32 (masked later;
    # 1e15 is still an astronomically repulsive wall for real pairs)
    x6 = jnp.minimum(inv_r2 * inv_r2 * inv_r2, 1e15)
    v = 4.0 * eps * (x6 * x6 - x6)
    c6 = (sigma / cutoff) ** 6
    v_c = 4.0 * eps * (c6 * c6 - c6)
    inside = r2 < cutoff * cutoff
    energy = jnp.where(inside, v - v_c, 0.0)
    dv_dr2 = jnp.where(inside, 4.0 * eps * (-12.0 * x6 * x6 + 6.0 * x6) / (2.0 * r2), 0.0)
    return energy, dv_dr2


def _pair_block(pos_i, pos_j, onehot_i, onehot_j, box, sigmas, epsilons):
    """Per-tile pair geometry + parameter lookup shared by fwd/bwd."""
    dr = pos_i[:, None, :] - pos_j[None, :, :]
    dr = dr - box * jnp.round(dr / box)
    r2 = jnp.sum(dr * dr, axis=-1) + 1e-18

    # per-pair sigma/eps via one-hot contractions (small matmuls -> MXU);
    # HIGHEST precision keeps the table values un-rounded (default TPU matmul
    # precision would bf16-round the inputs)
    dot = functools.partial(
        jnp.dot, preferred_element_type=pos_i.dtype, precision=jax.lax.Precision.HIGHEST
    )
    sigma = dot(dot(onehot_i, sigmas), onehot_j.T)
    eps = dot(dot(onehot_i, epsilons), onehot_j.T)
    return dr, r2, sigma, eps


def _fwd_kernel(pos_i_ref, pos_j_ref, oh_i_ref, oh_j_ref, mask_ref, box_ref, sig_ref, eps_ref, out_ref, *, cutoff):
    i = pl.program_id(0)
    j = pl.program_id(1)

    _, r2, sigma, eps = _pair_block(
        pos_i_ref[:, :], pos_j_ref[:, :], oh_i_ref[:, :], oh_j_ref[:, :],
        box_ref[0, :], sig_ref[:, :], eps_ref[:, :],
    )
    energy, _ = _lj_terms(r2, sigma, eps, cutoff)
    partial = jnp.sum(energy * mask_ref[:, :]).reshape(1, 1)

    @pl.when((i == 0) & (j == 0))
    def _():
        out_ref[:, :] = jnp.zeros((1, 1), partial.dtype)

    out_ref[:, :] += partial


def _bwd_kernel(pos_i_ref, pos_j_ref, oh_i_ref, oh_j_ref, mask_ref, box_ref, sig_ref, eps_ref, grad_ref, *, cutoff):
    j = pl.program_id(1)

    dr, r2, sigma, eps = _pair_block(
        pos_i_ref[:, :], pos_j_ref[:, :], oh_i_ref[:, :], oh_j_ref[:, :],
        box_ref[0, :], sig_ref[:, :], eps_ref[:, :],
    )
    _, dv_dr2 = _lj_terms(r2, sigma, eps, cutoff)
    # select, don't multiply: dv_dr2 is +-inf at the zero-distance diagonal
    # (r2 ~ 1e-18 under the f32 wall cap) and inf * 0-mask would give NaN
    coeff = jnp.where(mask_ref[:, :] > 0, 2.0 * dv_dr2, 0.0)
    grad_i = jnp.einsum("tk,tkd->td", coeff, dr, precision=jax.lax.Precision.HIGHEST)

    @pl.when(j == 0)
    def _():
        grad_ref[:, :] = jnp.zeros_like(grad_i)

    grad_ref[:, :] += grad_i


def _prepare(positions, types, pair_mask, n_types):
    n = positions.shape[0]
    n_pad = _round_up(max(n, TILE), TILE)
    t_pad = max(n_types, 8)
    dtype = positions.dtype

    pos = jnp.zeros((n_pad, 3), dtype).at[:n].set(positions)
    onehot = jnp.zeros((n_pad, t_pad), dtype)
    onehot = onehot.at[jnp.arange(n), types].set(1.0)
    mask = jnp.zeros((n_pad, n_pad), dtype).at[:n, :n].set(pair_mask.astype(dtype))
    return pos, onehot, mask, n_pad, t_pad


def _pad_table(table, t_pad, dtype):
    t = table.shape[0]
    out = jnp.ones((t_pad, t_pad), dtype)  # ones keep padded sigma/r2 finite
    return out.at[:t, :t].set(table.astype(dtype))


def _specs(n_pad: int, t_pad: int):
    """(in_specs) shared by both kernels: i-blocks, j-blocks, mask, consts."""
    return [
        pl.BlockSpec((TILE, 3), lambda i, j: (i, 0)),       # pos_i
        pl.BlockSpec((TILE, 3), lambda i, j: (j, 0)),       # pos_j
        pl.BlockSpec((TILE, t_pad), lambda i, j: (i, 0)),   # onehot_i
        pl.BlockSpec((TILE, t_pad), lambda i, j: (j, 0)),   # onehot_j
        pl.BlockSpec((TILE, TILE), lambda i, j: (i, j)),    # mask tile
        pl.BlockSpec((1, 3), lambda i, j: (0, 0)),          # box
        pl.BlockSpec((t_pad, t_pad), lambda i, j: (0, 0)),  # sigmas
        pl.BlockSpec((t_pad, t_pad), lambda i, j: (0, 0)),  # epsilons
    ]


def _common_args(positions, types, pair_mask, box, tables):
    # Mosaic kernels compute in float32 (the TPU production dtype);
    # float64 inputs are downcast at the boundary.
    sigmas, epsilons = tables
    positions = positions.astype(jnp.float32)
    dtype = positions.dtype
    pos, onehot, mask, n_pad, t_pad = _prepare(positions, types, pair_mask, sigmas.shape[0])
    args = (
        pos,
        pos,
        onehot,
        onehot,
        mask,
        jnp.asarray(box, dtype).reshape(1, 3),
        _pad_table(jnp.asarray(sigmas), t_pad, dtype),
        _pad_table(jnp.asarray(epsilons), t_pad, dtype),
    )
    return args, n_pad, t_pad, dtype


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def lj_pair_energy(positions, types, pair_mask, box, tables, cutoff=1.1):
    """Total shifted-LJ energy over masked pairs (Pallas-tiled).

    Args:
        positions: (N, 3) bead positions.
        types: (N,) int type indices.
        pair_mask: (N, N) bool/0-1, True where the pair interacts.
        box: (3,) periodic box.
        tables: (sigmas, epsilons) per-type-pair matrices.
        cutoff: LJ cutoff distance (static).
    """
    return _lj_fwd_impl(positions, types, pair_mask, box, tables, cutoff)


def _lj_fwd_impl(positions, types, pair_mask, box, tables, cutoff):
    args, n_pad, t_pad, dtype = _common_args(positions, types, pair_mask, box, tables)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, cutoff=float(cutoff)),
        out_shape=jax.ShapeDtypeStruct((1, 1), dtype),
        in_specs=_specs(n_pad, t_pad),
        out_specs=pl.BlockSpec((1, 1), lambda i, j: (0, 0)),
        grid=(n_pad // TILE, n_pad // TILE),
        interpret=_interpret(),
    )(*args)
    return out[0, 0]


def _lj_vjp_fwd(positions, types, pair_mask, box, tables, cutoff):
    return _lj_fwd_impl(positions, types, pair_mask, box, tables, cutoff), (
        positions,
        types,
        pair_mask,
        box,
        tables,
    )


def _lj_vjp_bwd(cutoff, residuals, g):
    positions, types, pair_mask, box, tables = residuals
    n = positions.shape[0]
    # symmetrize: each unordered pair contributes to both endpoints
    sym_mask = (pair_mask | pair_mask.T) if pair_mask.dtype == jnp.bool_ else (pair_mask + pair_mask.T)
    args, n_pad, t_pad, dtype = _common_args(positions, types, sym_mask, box, tables)

    grad = pl.pallas_call(
        functools.partial(_bwd_kernel, cutoff=float(cutoff)),
        out_shape=jax.ShapeDtypeStruct((n_pad, 3), dtype),
        in_specs=_specs(n_pad, t_pad),
        out_specs=pl.BlockSpec((TILE, 3), lambda i, j: (i, 0)),
        grid=(n_pad // TILE, n_pad // TILE),
        interpret=_interpret(),
    )(*args)
    return ((g * grad[:n]).astype(positions.dtype), None, None, None, None)


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
