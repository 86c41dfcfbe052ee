"""Fused Pallas kernels for the oxDNA unbonded interactions (v2).

Why: the XLA block-tile path splits the unbonded energy gradient into ~40
separate fusions, each round-tripping (nb, B, M) intermediates through HBM
(~3 ms/step for 10k nt on a v5e). The round-1 kernel fused the tile math but
kept a per-row-block grid (1250 steps) whose per-step parameter unpacking
(~170 scalar VMEM reads x 1250) and an XLA-side (nb, F, M) column gather
dominated the profile (1.9 ms/step). This version restructures the data
movement:

* **Slim fields.** Per-nucleotide data is one (n_pad, 24) f32 array holding
  com/a1/a3 frames plus hb weights, one-hots, charge factor, bonded-partner
  ids and the global id. Interaction sites (stack/back/base) are affine in
  (com, a1, a2=a3xa1) and derived in-register -- col-side on (1, M) lane
  vectors they cost 1/8 per pair slot.
* **In-kernel column assembly.** The field array stays resident in VMEM; the
  kernel builds each row block's (F, M) column panel with `cap` dynamic
  sublane slices + one (M, F) -> (F, M) transpose, indexed by the block
  table from SMEM. No HBM column panel exists at all. (Dynamic *lane*
  slicing needs 128-aligned offsets on Mosaic, so the slices run on the
  sublane axis first.) For systems too large for residency the panel falls
  back to an XLA gather with pipelined (G, F, M) blocks.
* **Few grid steps.** The grid covers G row blocks per invocation (inner
  fori), so parameters are unpacked ~nb/G times instead of nb times.
* **Symmetric table + row-side gradients.** As in v1: with a symmetric
  block table and pair-symmetric energies, dE/d(row fields) under the full
  (non-triangular) mask equals the per-row force -- no scatter. The forward
  uses the triangular mask (each unordered pair once). The hb weight field
  `hw` appears only row-side in the triangular sum, so its gradient is
  computed under the triangular mask directly (a (B, M) @ (M, 4) matmul of
  the masked hb product against the column one-hots) -- the symmetric-mask
  shortcut would double it.
* **Parameters** ride as one (1, P) packed vector; dE/dP comes from an XLA
  autodiff over the same tile functions (`_params_grad_xla`), which is
  cheap relative to Mosaic's serialized scalar accumulations and only runs
  when the params cotangent is consumed (DiffTRe / direct diff).

Reference context: replaces the hot path of the reference's per-term JAX
energies (mythos/energy/dna1/*.py) with a TPU-native fused kernel.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mythos_tpu.energy.dna1 import geometry as geom
from mythos_tpu.soa import Vec3
from mythos_tpu.utils.types import Arr

#: field layout of the packed per-nucleotide array (offsets into the F axis)
#: a2 rides as explicit fields (not cross(a3, a1)): the values agree for a
#: unit quaternion, but the off-manifold quaternion gradient differs, and
#: parity with the XLA path is checked on raw cotangents
_COM = 0  # center of mass                     (3)
_A1 = 3  # back-base frame vector              (3)
_A2 = 6  # cross-product frame vector          (3)
_A3 = 9  # base-normal frame vector            (3)
_HW = 12  # hw = one_hot(seq) @ eps_hb_weights (4)
_OH = 16  # one_hot(seq)                       (4)
_QF = 20  # Debye end-charge factor            (1)
_PREV = 21  # bonded 3' partner id as f32, -1 if none
_NXT = 22  # bonded 5' partner id as f32, -1 if none
_GID = 23  # global id as f32 (huge when padded)
N_FIELDS = 24
#: row-gradient layout: com/a1/a2/a3 (symmetric mask) + hw (triangular mask)
N_GRAD_FIELDS = 16

_BIG = 1e9  # invalid-gid marker (any value > max real id)

#: above this many padded rows the resident (n_pad, F) VMEM array would
#: crowd out the ~16 MB VMEM budget (F pads to 128 lanes); fall back to the
#: pipelined XLA column gather
_RESIDENT_MAX_ROWS = 16384


def _interpret() -> bool:
    import os

    override = os.environ.get("MYTHOS_TPU_PALLAS_INTERPRET")
    if override is not None:
        return override not in ("0", "false", "")
    return jax.default_backend() != "tpu"


class TileSpec(NamedTuple):
    """Static configuration of the fused kernel (hashable)."""

    block_size: int  # B: rows per block
    cap: int  # K: symmetric column-block slots per row block (padded)
    n: int  # real row count
    n_blocks: int  # real block count (table invalid marker)
    nb_pad: int  # padded block count (multiple of grid_g)
    grid_g: int  # row blocks handled per grid step
    has_debye: bool
    coax_variant: str  # "dna1" | "dna2"
    geometry: tuple  # ("dna1", (bb, hb, st)) | ("dna2", (bx, by, hb, st))
    params_treedef: object  # treedef of the packed params tuple
    leaf_shapes: tuple  # (("n", shape, size) | ("s", value, 0), ...) per leaf
    resident: bool  # in-kernel assembly (True) vs XLA gather panels

    @property
    def panel(self) -> int:
        return self.cap * self.block_size

    @property
    def n_pad(self) -> int:
        return self.nb_pad * self.block_size


def _is_numeric(leaf) -> bool:
    if isinstance(leaf, (bool, str)):
        return False
    if isinstance(leaf, (int, float)):
        return True
    return hasattr(leaf, "dtype") and jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating)


def pack_params(param_structs) -> tuple[Arr, "tuple"]:
    """Flatten term configs into one (1, P) f32 vector (+ static meta).

    Non-numeric leaves (metadata strings, bools, int flags) are baked into
    the static meta and restored verbatim at unpack time.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tuple(param_structs))
    flat = []
    meta = []
    for leaf in leaves:
        if _is_numeric(leaf):
            flat.append(jnp.ravel(jnp.asarray(leaf, jnp.float32)))
            meta.append(("n", tuple(np.shape(leaf)), int(np.size(leaf))))
        else:
            meta.append(("s", leaf, 0))
    vec = jnp.concatenate(flat) if flat else jnp.zeros((1,), jnp.float32)
    return vec[None, :], (treedef, tuple(meta))


def _unpack_params(p_ref, treedef, leaf_meta):
    """Rebuild the params tuple from the packed vector inside the kernel."""
    leaves = []
    off = 0
    for kind, info, size in leaf_meta:
        if kind == "s":
            leaves.append(info)
            continue
        if size == 1:
            leaves.append(p_ref[0, off])
        else:
            leaves.append(p_ref[0, off : off + size].reshape(info))
        off += size
    return jax.tree_util.tree_unflatten(treedef, leaves)


# Shared tile formulas (Pallas kernels + XLA parameter-gradient path) ---------


def _vec(arr, off, take_rows: bool) -> Vec3:
    """Three consecutive fields as a Vec3 of (B, 1) rows or (1, M) cols."""
    if take_rows:
        return Vec3(
            arr[:, off : off + 1], arr[:, off + 1 : off + 2], arr[:, off + 2 : off + 3]
        )
    return Vec3(arr[off : off + 1, :], arr[off + 1 : off + 2, :], arr[off + 2 : off + 3, :])


def _disp(a, b):
    return a - b


def _derive_sites(com: Vec3, a1: Vec3, a2: Vec3, geometry) -> tuple[Vec3, Vec3, Vec3]:
    """(stack, back, base) sites from the frame; matches the Nucleotide
    transforms (energy/dna1/nucleotide.py, energy/dna2/nucleotide.py)."""
    variant, offs = geometry
    if variant == "dna2":
        bx, by, hb, st = offs
        back = com + bx * a1 + by * a2
    else:
        bb, hb, st = offs
        back = com + bb * a1
    return com + st * a1, back, com + hb * a1


def _r(v: Vec3):
    from mythos_tpu.soa import vdot

    return jnp.sqrt(vdot(v, v) + 1e-18)


def _tile_energies(rows, panel, params, spec: TileSpec):
    """All unbonded term energies on one (B, M) tile panel.

    rows: (B, F) row fields; panel: (F, M) column fields. Returns
    (energies, hb_prod): energies is a list of (B, M) arrays in term order
    [exc_vol, hb, cross, coax, (debye)]; hb_prod is the weight-free
    hydrogen-bonding product (for the triangular hw gradient).
    Formula source: the same product functions as the XLA tile path
    (energy/dna1/terms.py, energy/dna2/terms.py).
    """
    import mythos_tpu.energy.dna1.terms as t1
    from mythos_tpu.utils.math import arccos_poly

    def _bare(cls, prm):
        obj = object.__new__(cls)
        object.__setattr__(obj, "params", prm)
        return obj

    if spec.has_debye:
        (p_exc, p_hb, p_cross, p_coax, p_debye) = params
    else:
        p_exc, p_hb, p_cross, p_coax = params
        p_debye = None

    com_i, a1_i, a2_i, a3_i = (_vec(rows, o, True) for o in (_COM, _A1, _A2, _A3))
    com_j, a1_j, a2_j, a3_j = (_vec(panel, o, False) for o in (_COM, _A1, _A2, _A3))
    stack_i, back_i, base_i = _derive_sites(com_i, a1_i, a2_i, spec.geometry)
    stack_j, back_j, base_j = _derive_sites(com_j, a1_j, a2_j, spec.geometry)

    out = []

    # excluded volume: 4 site-pair f3 terms
    out.append(
        t1._exc_vol_f3(_r(_disp(base_j, base_i)), p_exc.eps_exc, p_exc.dr_star_base, p_exc.sigma_base, p_exc.b_base, p_exc.dr_c_base)
        + t1._exc_vol_f3(_r(_disp(base_j, back_i)), p_exc.eps_exc, p_exc.dr_star_back_base, p_exc.sigma_back_base, p_exc.b_back_base, p_exc.dr_c_back_base)
        + t1._exc_vol_f3(_r(_disp(back_j, base_i)), p_exc.eps_exc, p_exc.dr_star_base_back, p_exc.sigma_base_back, p_exc.b_base_back, p_exc.dr_c_base_back)
        + t1._exc_vol_f3(_r(_disp(back_j, back_i)), p_exc.eps_exc, p_exc.dr_star_backbone, p_exc.sigma_backbone, p_exc.b_backbone, p_exc.dr_c_backbone)
    )

    # hydrogen bonding + cross stacking share the base-site geometry.
    # Mosaic has no acos primitive: use the polynomial arccos (f32-exact)
    g_ub = geom.unbonded_geometry_vec(
        base_i, base_j, a1_i, a1_j, a3_i, a3_j, _disp, arccos=arccos_poly
    )
    hb_prod = _bare(t1.HydrogenBonding, p_hb).hb_product(g_ub)
    hw_i = rows[:, _HW : _HW + 4]  # (B, 4)
    oh_j = panel[_OH : _OH + 4, :]  # (4, M)
    weight = jax.lax.dot(
        hw_i, oh_j, precision=jax.lax.Precision.HIGHEST, preferred_element_type=rows.dtype
    )
    out.append(hb_prod * weight)

    out.append(_bare(t1.CrossStacking, p_cross).cross_product_term(g_ub))

    # coaxial stacking: share theta1/theta4 with g_ub instead of recomputing
    from mythos_tpu.soa import vcross, vdot

    dr_stack = _disp(stack_j, stack_i)
    r_stack = _r(dr_stack)
    dr_stack_n = dr_stack * (1.0 / r_stack)
    dr_back = _disp(back_j, back_i)
    dr_back_n = dr_back * (1.0 / _r(dr_back))
    g_cx = geom.CoaxGeometry(
        dr_stack=dr_stack,
        r_stack=r_stack,
        theta1=g_ub.theta1,
        theta4=g_ub.theta4,
        theta5=arccos_poly(vdot(a3_i, dr_stack_n)),
        theta6=arccos_poly(-vdot(a3_j, dr_stack_n)),
        cosphi3=vdot(dr_stack_n, vcross(dr_back_n, a1_j)),
        cosphi4=vdot(dr_stack_n, vcross(dr_back_n, a1_i)),
    )
    if spec.coax_variant == "dna2":
        import mythos_tpu.energy.dna2.terms as t2

        out.append(_bare(t2.CoaxialStacking, p_coax)._coax_value(g_cx))
    else:
        out.append(_bare(t1.CoaxialStacking, p_coax).coax_product(g_cx))

    if spec.has_debye:
        import mythos_tpu.energy.dna2.terms as t2

        r_bb = _r(_disp(back_j, back_i))
        dgs = t2.debye_potential(
            r_bb, p_debye.kappa, p_debye.prefactor, p_debye.smoothing_coeff, p_debye.r_cut, p_debye.r_high
        )
        qf = rows[:, _QF : _QF + 1] * panel[_QF : _QF + 1, :]
        out.append(dgs * qf)

    return out, hb_prod


def _tile_mask(rows, panel, blk0, spec: TileSpec, *, triangular: bool):
    """(B, M) validity mask: no self, no bonded, real rows/cols only.

    ``triangular=True`` keeps only j > i: over a SYMMETRIC table that
    selects each unordered pair exactly once (used by the forward sums and
    the parameter gradient, whose orientation-asymmetric parameters --
    theta2/theta3-type pairs -- would otherwise be mixed). The row-side
    force gradient uses the full symmetric mask instead.
    """
    b_sz = spec.block_size
    # int32 iota then cast: Mosaic's tpu.iota is integer-only
    ig = blk0 + jax.lax.broadcasted_iota(jnp.int32, (b_sz, 1), 0).astype(jnp.float32)
    jg = panel[_GID : _GID + 1, :]  # (1, M); _BIG when padded
    prev_i = rows[:, _PREV : _PREV + 1]
    nxt_i = rows[:, _NXT : _NXT + 1]
    keep = (jg > ig) if triangular else (jg != ig)
    return (
        keep
        & (ig < spec.n)
        & (jg < spec.n)
        & (jg != prev_i)
        & (jg != nxt_i)
    )


def _n_terms(spec: TileSpec) -> int:
    return 5 if spec.has_debye else 4


_HB_TERM = 1  # index of hydrogen bonding in the term order


# Pallas kernels ---------------------------------------------------------------


def _assemble_panel(ids_ref, g, src_ref, panel_rows, spec: TileSpec):
    """Fill the (M, F) panel scratch from `cap` sublane slices of the
    resident field array, then hand back the (F, M) transpose."""
    b_sz, nb = spec.block_size, spec.n_blocks
    for k in range(spec.cap):
        idk = ids_ref[g, k]
        # invalid slots (>= n_blocks) clamp to the first PAD block: its rows
        # carry gid = _BIG already, so the pair masks drop them without a
        # per-slot branch (build_tile_inputs guarantees nb_pad > n_blocks)
        safe = jnp.minimum(idk, nb) * b_sz
        panel_rows[k * b_sz : (k + 1) * b_sz, :] = src_ref[pl.ds(safe, b_sz), :]

    return panel_rows[...].T  # (F, M)


def _fwd_kernel_body(panel, rows_g, blk0, params, gt, spec: TileSpec):
    mask = _tile_mask(rows_g, panel, blk0, spec, triangular=True)
    energies, _ = _tile_energies(rows_g, panel, params, spec)
    return jnp.stack([jnp.where(mask, e, 0.0).sum() for e in energies] + [0.0] * (8 - len(energies)))


def _bwd_kernel_body(panel, rows_g, blk0, params, gt, spec: TileSpec):
    """(B, N_GRAD_FIELDS) row-side gradients for one row block."""
    oh_j = panel[_OH : _OH + 4, :]

    def total(rows_in):
        # hw enters only row-side in the triangular forward; stop its
        # symmetric-mask gradient here and differentiate it under the
        # triangular mask below (the symmetric shortcut would double it)
        rows_sg = jnp.concatenate(
            [
                rows_in[:, :_HW],
                jax.lax.stop_gradient(rows_in[:, _HW : _HW + 4]),
                rows_in[:, _HW + 4 :],
            ],
            axis=1,
        )
        mask = _tile_mask(rows_sg, panel, blk0, spec, triangular=False)
        energies, hb_prod = _tile_energies(rows_sg, panel, params, spec)
        tot = 0.0
        for t, e in enumerate(energies):
            tot = tot + gt[t] * jnp.where(mask, e, 0.0).sum()
        mask_tri = _tile_mask(rows_in, panel, blk0, spec, triangular=True)
        return tot, jnp.where(mask_tri, hb_prod, 0.0)

    (_, hb_tri), g_rows = jax.value_and_grad(total, has_aux=True)(rows_g)
    g_hw = gt[_HB_TERM] * jax.lax.dot(
        hb_tri, oh_j.T, precision=jax.lax.Precision.HIGHEST, preferred_element_type=rows_g.dtype
    )
    return jnp.concatenate([g_rows[:, :_HW], g_hw], axis=1)


def _make_kernel(body_fn, writes_rows: bool, spec: TileSpec):
    """Kernel over G row blocks per grid step.

    Inputs: ids (G, cap) in SMEM, row blocks (G*B, F), the column source
    (resident (n_pad, F) array, or pre-gathered (G, F, M) panels), packed
    params (1, P), gt (1, 8) cotangents. Output: per-term sums (1, 8)
    accumulated across the grid, or (G*B, N_GRAD_FIELDS) row gradients.
    """
    b_sz, g_blocks = spec.block_size, spec.grid_g

    def kernel(ids_ref, rows_ref, col_ref, p_ref, gt_ref, out_ref, panel_scratch):
        step = pl.program_id(0)
        params = _unpack_params(p_ref, spec.params_treedef, spec.leaf_shapes)
        gt = gt_ref[0, :]

        if writes_rows:

            def body(g, carry):
                if spec.resident:
                    panel = _assemble_panel(ids_ref, g, col_ref, panel_scratch, spec)
                else:
                    panel = col_ref[g]
                rows_g = rows_ref[pl.ds(g * b_sz, b_sz), :]
                blk0 = jnp.asarray(step * g_blocks * b_sz + g * b_sz, jnp.float32)
                out_ref[pl.ds(g * b_sz, b_sz), :] = body_fn(
                    panel, rows_g, blk0, params, gt, spec
                )
                return carry

            jax.lax.fori_loop(0, g_blocks, body, 0)
        else:

            def body(g, sums):
                if spec.resident:
                    panel = _assemble_panel(ids_ref, g, col_ref, panel_scratch, spec)
                else:
                    panel = col_ref[g]
                rows_g = rows_ref[pl.ds(g * b_sz, b_sz), :]
                blk0 = jnp.asarray(step * g_blocks * b_sz + g * b_sz, jnp.float32)
                return sums + body_fn(panel, rows_g, blk0, params, gt, spec)

            sums = jax.lax.fori_loop(
                0, g_blocks, body, jnp.zeros((8,), jnp.float32)
            )

            @pl.when(step == 0)
            def _():
                out_ref[...] = jnp.zeros_like(out_ref)

            out_ref[0, :] += sums

    return kernel


def _pallas_args(rows_rf, params_vec, sym_ids, gt_pad, spec: TileSpec):
    """Common in_specs + inputs for both kernels."""
    b_sz, g_blocks, m = spec.block_size, spec.grid_g, spec.panel
    p = params_vec.shape[-1]
    in_specs = [
        pl.BlockSpec((g_blocks, spec.cap), lambda s: (s, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((g_blocks * b_sz, N_FIELDS), lambda s: (s, 0)),
    ]
    if spec.resident:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # whole array
        col_arg = rows_rf
    else:
        in_specs.append(pl.BlockSpec((g_blocks, N_FIELDS, m), lambda s: (s, 0, 0)))
        col_arg = _gather_cols(rows_rf, sym_ids, spec)
    in_specs += [
        pl.BlockSpec((1, p), lambda s: (0, 0)),
        pl.BlockSpec((1, 8), lambda s: (0, 0)),
    ]
    args = (sym_ids, rows_rf, col_arg, params_vec, gt_pad)
    scratch = [pltpu.VMEM((m, N_FIELDS), jnp.float32)]
    return in_specs, args, scratch


def _fwd_impl(rows_rf, params_vec, sym_ids, spec: TileSpec):
    gt_pad = jnp.zeros((1, 8), jnp.float32)
    in_specs, args, scratch = _pallas_args(rows_rf, params_vec, sym_ids, gt_pad, spec)
    out = pl.pallas_call(
        _make_kernel(_fwd_kernel_body, writes_rows=False, spec=spec),
        out_shape=jax.ShapeDtypeStruct((1, 8), jnp.float32),
        grid=(spec.nb_pad // spec.grid_g,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 8), lambda s: (0, 0)),
        scratch_shapes=scratch,
        interpret=_interpret(),
    )(*args)
    return out[0, : _n_terms(spec)]


def _bwd_rows_impl(rows_rf, params_vec, sym_ids, gt, spec: TileSpec):
    """Row-side gradients (d sum(gt . energies) / d rows) via the Pallas
    backward kernel alone -- no forward pass, no parameter gradients. This
    is the whole force evaluation of the Langevin hot loop."""
    gt_pad = jnp.zeros((1, 8), jnp.float32).at[0, : _n_terms(spec)].set(gt)
    in_specs, args, scratch = _pallas_args(rows_rf, params_vec, sym_ids, gt_pad, spec)
    return pl.pallas_call(
        _make_kernel(_bwd_kernel_body, writes_rows=True, spec=spec),
        out_shape=jax.ShapeDtypeStruct((spec.n_pad, N_GRAD_FIELDS), jnp.float32),
        grid=(spec.nb_pad // spec.grid_g,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (spec.grid_g * spec.block_size, N_GRAD_FIELDS), lambda s: (s, 0)
        ),
        scratch_shapes=scratch,
        interpret=_interpret(),
    )(*args)


def _bwd_impl(rows_rf, params_vec, sym_ids, gt, spec: TileSpec):
    """(row grads, param grads); the parameter kernel is a separate XLA
    computation so it is dropped whenever the params cotangent is unused."""
    g_rows = _bwd_rows_impl(rows_rf, params_vec, sym_ids, gt, spec)
    g_p = _params_grad_xla(rows_rf, params_vec, sym_ids, gt, spec)
    return g_rows, g_p


# XLA parameter-gradient path --------------------------------------------------


def _gather_cols(rows_rf: Arr, sym_ids: Arr, spec: TileSpec) -> Arr:
    """(nb_pad, F, M) column panels gathered in XLA (fallback + params path).

    The gid field of invalid slots is overridden with _BIG so the masks drop
    them (the clamped gather pulls real rows whose gids would otherwise
    alias)."""
    nb, cap = sym_ids.shape
    b_sz = spec.block_size
    safe = jnp.minimum(sym_ids, spec.n_blocks - 1)
    rows_b = rows_rf.reshape(spec.nb_pad, b_sz, N_FIELDS)
    cols = rows_b[safe]  # (nb_pad, cap, B, F)
    invalid = (sym_ids >= spec.n_blocks)[:, :, None, None]
    gid_mask = jnp.arange(N_FIELDS)[None, None, None, :] == _GID
    cols = jnp.where(invalid & gid_mask, _BIG, cols)
    return cols.reshape(nb, cap * b_sz, N_FIELDS).transpose(0, 2, 1)  # (nb, F, M)


def _params_grad_xla(rows_rf, params_vec, sym_ids, gt, spec: TileSpec):
    """dE/d(params vector) via XLA autodiff over the same tiles.

    The in-kernel parameter VJP transposes ~170 scalar reads into scalar
    accumulations, which Mosaic serializes pathologically (measured ~80x
    slower than this path). Parameter gradients are an O(P) reduction the
    XLA tile evaluation handles fine. Triangular mask: each unordered pair
    exactly once (a symmetric sum would mix theta2/theta3-type asymmetric
    pairs).
    """
    nb, b_sz = spec.nb_pad, spec.block_size
    rows_b = rows_rf.reshape(nb, b_sz, N_FIELDS)
    cols = _gather_cols(rows_rf, sym_ids, spec)
    blk0s = (jnp.arange(nb) * b_sz).astype(jnp.float32)

    def total(p_vec):
        params = _unpack_params(p_vec, spec.params_treedef, spec.leaf_shapes)

        def blk(rows_blk, cols_blk, blk0):
            mask = _tile_mask(rows_blk, cols_blk, blk0, spec, triangular=True)
            energies, _ = _tile_energies(rows_blk, cols_blk, params, spec)
            return jnp.stack([jnp.where(mask, e, 0.0).sum() for e in energies])

        sums = jax.vmap(blk)(rows_b, cols, blk0s)
        return jnp.dot(gt, jnp.sum(sums, axis=0))

    return jax.grad(total)(params_vec)


# custom-vjp wrapper -----------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def unbonded_tile_energies(rows_rf, params_vec, sym_ids, spec: TileSpec):
    """Per-term unbonded energies over a symmetric block table.

    Args:
        rows_rf: (n_pad, N_FIELDS) packed per-nucleotide fields.
        params_vec: (1, P) packed term parameters (pack_params).
        sym_ids: (nb_pad, cap) symmetric block-neighbor table (>= n_blocks
            marks an empty slot).
        spec: static TileSpec.

    Returns:
        (T,) per-term sums: [exc_vol, hb, cross, coax, (debye)].
    """
    return _fwd_impl(rows_rf, params_vec, sym_ids, spec)


def _vjp_fwd(rows_rf, params_vec, sym_ids, spec):
    return _fwd_impl(rows_rf, params_vec, sym_ids, spec), (rows_rf, params_vec, sym_ids)


def _vjp_bwd(spec, residuals, gt):
    rows_rf, params_vec, sym_ids = residuals
    g_rows, g_p = _bwd_impl(rows_rf, params_vec, sym_ids, gt, spec)
    pad = jnp.zeros((rows_rf.shape[0], N_FIELDS - N_GRAD_FIELDS), rows_rf.dtype)
    return jnp.concatenate([g_rows, pad], axis=1), g_p, None


unbonded_tile_energies.defvjp(_vjp_fwd, _vjp_bwd)


# Integration: composed energy function -> fused kernel energy ----------------

_UNBONDED_ORDER = (
    "UnbondedExcludedVolume",
    "HydrogenBonding",
    "CrossStacking",
    "CoaxialStacking",
    "Debye",
)

#: term modules the fused tile formulas implement
_SUPPORTED_MODULES = ("mythos_tpu.energy.dna1.terms", "mythos_tpu.energy.dna2.terms")

ERR_UNSUPPORTED_MODEL = (
    "the fused Pallas path supports dna1/dna2 terms only (got {}); use a "
    "non-symmetric block table (symmetric=False) for the XLA tile path"
)
ERR_TRANSFORM = (
    "the fused Pallas path derives interaction sites in-kernel and needs the "
    "geometry offsets from a functools.partial transform_soa_fn (got {}); "
    "use a non-symmetric block table for the XLA tile path"
)
ERR_X64 = (
    "the fused Pallas kernels compute in float32 and their interpret-mode "
    "trace breaks under jax_enable_x64; disable x64 (or use the XLA tile "
    "path via a non-symmetric block table) for fused evaluation"
)


def _geometry_of(first) -> tuple:
    """Extract the static site-offset geometry from the transform partial."""
    fn = first.transform_soa_fn
    kw = getattr(fn, "keywords", None)
    if not kw:
        raise ValueError(ERR_TRANSFORM.format(fn))
    try:
        if "com_to_backbone_x" in kw:
            return (
                "dna2",
                (
                    float(kw["com_to_backbone_x"]),
                    float(kw["com_to_backbone_y"]),
                    float(kw["com_to_hb"]),
                    float(kw["com_to_stacking"]),
                ),
            )
        return (
            "dna1",
            (
                float(kw["com_to_backbone"]),
                float(kw["com_to_hb"]),
                float(kw["com_to_stacking"]),
            ),
        )
    except (KeyError, TypeError) as exc:
        raise ValueError(ERR_TRANSFORM.format(fn)) from exc


def _pick_grid_g(nb: int, block_size: int) -> tuple[int, int]:
    """(grid_g, nb_pad): amortize per-grid-step costs over ~64 row blocks.

    Always pads at least one block past nb: the kernel's panel assembly
    clamps invalid slot ids onto the first pad block (whose gid field is
    poisoned) instead of branching per slot."""
    g = min(nb, max(1, 512 // block_size))
    nb_pad = -(-nb // g) * g
    if nb_pad == nb:
        if nb <= g:
            # single grid step: keep block shape == array shape (Mosaic's
            # divisibility exemption) by growing the step with the pad block
            g = nb_pad = nb + 1
        else:
            nb_pad += g
    return g, nb_pad


def build_tile_inputs(composed, body_soa, sym_ids, block_size: int):
    """(rows_rf, params_vec, sym_ids_padded, spec, unbonded_idx) for the
    fused kernels; shared by fused_energy_soa and diagnostics."""
    from mythos_tpu.energy import blocks
    from mythos_tpu.soa import quat_frame_soa

    if jax.config.jax_enable_x64:
        raise ValueError(ERR_X64)
    by_name = {type(fn).__name__: (i, fn) for i, fn in enumerate(composed.energy_fns)}
    unbonded = [by_name[nm] for nm in _UNBONDED_ORDER if nm in by_name]
    terms = [fn for _, fn in unbonded]
    for fn in terms:
        if type(fn).__module__ not in _SUPPORTED_MODULES:
            raise ValueError(ERR_UNSUPPORTED_MODEL.format(type(fn).__module__))
    has_debye = any(type(fn).__name__ == "Debye" for fn in terms)
    coax_variant = "dna1"
    for fn in terms:
        if type(fn).__name__ == "CoaxialStacking":
            coax_variant = "dna2" if type(fn).__module__.endswith("dna2.terms") else "dna1"

    first = terms[0]
    seq = jnp.asarray(first.seq)
    n = seq.shape[0]
    nb, cap = sym_ids.shape
    # pad cap so the panel is a multiple of 128 lanes (vreg width)
    while (cap * block_size) % 128:
        cap += 1
    grid_g, nb_pad = _pick_grid_g(nb, block_size)
    if cap != sym_ids.shape[1] or nb_pad != nb:
        sym_ids = jnp.pad(
            sym_ids,
            ((0, nb_pad - nb), (0, cap - sym_ids.shape[1])),
            constant_values=nb,
        )
    n_pad = nb_pad * block_size

    params_vec, (treedef, leaf_shapes) = pack_params([fn.params for fn in terms])
    spec = TileSpec(
        block_size=block_size,
        cap=cap,
        n=n,
        n_blocks=nb,
        nb_pad=nb_pad,
        grid_g=grid_g,
        has_debye=has_debye,
        coax_variant=coax_variant,
        geometry=_geometry_of(first),
        params_treedef=treedef,
        leaf_shapes=leaf_shapes,
        resident=n_pad <= _RESIDENT_MAX_ROWS,
    )

    # packed row fields
    hb = next(fn for fn in terms if type(fn).__name__ == "HydrogenBonding")
    oh = jax.nn.one_hot(seq, 4, dtype=jnp.float32)
    hw = jnp.dot(oh, hb.params.eps_hb_weights.astype(jnp.float32), precision=jax.lax.Precision.HIGHEST)
    if has_debye:
        debye = next(fn for fn in terms if type(fn).__name__ == "Debye")
        is_end = jnp.asarray(debye.is_end)
        qf = jnp.where(
            jnp.asarray(debye.params.half_charged_ends, bool),
            jnp.where(is_end.astype(bool), 0.5, 1.0),
            1.0,
        )
    else:
        qf = jnp.ones((n,), jnp.float32)
    prev, nxt = blocks.bonded_partner_table(n_pad, first.bonded_neighbors)
    gid = jnp.where(jnp.arange(n_pad) < n, jnp.arange(n_pad), _BIG).astype(jnp.float32)

    com = body_soa.center
    a1, a2, a3 = quat_frame_soa(body_soa.orientation)
    cols = (
        [com.x, com.y, com.z]
        + [a1.x, a1.y, a1.z, a2.x, a2.y, a2.z, a3.x, a3.y, a3.z]
        + [hw[:, k] for k in range(4)]
        + [oh[:, k] for k in range(4)]
        + [qf]
    )
    pad = n_pad - n
    stacked = [jnp.pad(c.astype(jnp.float32), (0, pad)) for c in cols]
    stacked.append(prev.astype(jnp.float32))
    stacked.append(nxt.astype(jnp.float32))
    stacked.append(gid)
    stacked += [jnp.zeros((n_pad,), jnp.float32)] * (N_FIELDS - len(stacked))
    rows_rf = jnp.stack(stacked, axis=-1)  # (n_pad, N_FIELDS)
    return rows_rf, params_vec, sym_ids, spec, unbonded


def fused_energy_soa(composed, body_soa, sym_ids, block_size: int):
    """Total SoA energy with the unbonded terms on the Pallas tile kernels.

    ``composed`` must already carry updated params (with_params applied).
    Bonded terms evaluate on the (cheap) XLA shift path; the unbonded group
    runs through :func:`unbonded_tile_energies`. Weighted like
    ``ComposedEnergyFunction.__call__``.
    """
    rows_rf, params_vec, sym_ids, spec, unbonded = build_tile_inputs(
        composed, body_soa, sym_ids, block_size
    )
    per_term = unbonded_tile_energies(rows_rf, params_vec, sym_ids, spec)

    first = unbonded[0][1]
    nuc = first.transform_soa_fn(body_soa)
    seq = jnp.asarray(first.seq)
    unbonded_idx = {i for i, _ in unbonded}
    w = composed.weights
    total = 0.0
    for k, (i, _) in enumerate(unbonded):
        wi = 1.0 if w is None else w[i]
        total = total + wi * per_term[k]
    for i, fn in enumerate(composed.energy_fns):
        if i in unbonded_idx:
            continue
        wi = 1.0 if w is None else w[i]
        total = total + wi * fn.energy_soa(nuc, seq)
    return total


def fused_grads_soa(composed, body_soa, sym_ids, block_size: int):
    """d(total SoA energy)/d(body) without evaluating the energy.

    ``jax.grad(fused_energy_soa)`` pays the forward Pallas kernel (the
    custom-vjp primal) only to discard its value; the Langevin hot loop
    consumes forces alone. This runs the backward rows kernel directly with
    the term weights as cotangents and transposes the row-field packing back
    to the body via one XLA vjp, roughly halving the per-step kernel cost.
    Returns a BodySoA-shaped cotangent (same pytree as
    ``jax.grad(fused_energy_soa)(body_soa)``).
    """

    # the non-row outputs (params_vec/ids/spec/term objects) must not pass
    # through the vjp: energy-fn dataclasses are not tree-transparent (their
    # __post_init__ takes a topology InitVar). They don't depend on the body,
    # so fetch them from a separate call; under jit the duplicated rows build
    # is CSE'd with the vjp primal.
    _, params_vec, ids_p, spec, unbonded = build_tile_inputs(
        composed, body_soa, sym_ids, block_size
    )

    def rows_of(body):
        return build_tile_inputs(composed, body, sym_ids, block_size)[0]

    rows_rf, vjp_fn = jax.vjp(rows_of, body_soa)

    w = composed.weights
    gt = jnp.stack(
        [jnp.asarray(1.0 if w is None else w[i], jnp.float32) for i, _ in unbonded]
    )
    g_rows = _bwd_rows_impl(rows_rf, params_vec, ids_p, gt, spec)
    pad = jnp.zeros((rows_rf.shape[0], N_FIELDS - N_GRAD_FIELDS), rows_rf.dtype)
    (g_body,) = vjp_fn(jnp.concatenate([g_rows, pad], axis=1))

    unbonded_idx = {i for i, _ in unbonded}
    first = unbonded[0][1]
    seq = jnp.asarray(first.seq)
    bonded = [
        (1.0 if w is None else w[i], fn)
        for i, fn in enumerate(composed.energy_fns)
        if i not in unbonded_idx
    ]
    if bonded:

        def bonded_energy(body):
            nuc = first.transform_soa_fn(body)
            return sum(wi * fn.energy_soa(nuc, seq) for wi, fn in bonded)

        g_bonded = jax.grad(bonded_energy)(body_soa)
        g_body = jax.tree.map(jnp.add, g_body, g_bonded)
    return g_body
