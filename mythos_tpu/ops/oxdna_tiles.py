"""Fused Pallas kernels for the oxDNA unbonded interactions.

Why: the XLA block-tile path splits the unbonded energy gradient into ~40
separate fusions, each round-tripping (nb, B, M) intermediates through HBM
(profiled at ~3 ms/step for 10k nt on a v5e). These kernels evaluate every
unbonded term on a (B, M) tile panel entirely in VMEM: the forward
accumulates per-term sums; the backward recomputes the tile and applies the
VJP in-register, writing only the (B, F) per-row field gradients and the
packed parameter gradient.

Design notes:

* **Symmetric neighbor table + row-side gradients.** With a symmetric block
  table (pair (a, b) listed from both sides) and pair-symmetric energies,
  dE/d(row fields of block a) equals the row-side-only derivative of block
  a's tiles -- no scatter in the backward, outputs are block-aligned. The
  forward double-counts, so energies are halved outside the kernel. (oxDNA
  unbonded terms are pair-symmetric by physics; parity tests pin this
  against the triangular XLA path.)
* **Field packing.** Per-nucleotide data rides as one (n_pad, F) f32 array
  (rows) plus a transposed (nb, F, M) gather (cols) so row fields slice to
  (B, 1) sublane vectors and column fields to (1, M) lane vectors -- the tile
  broadcast then fills whole (8, 128) vector registers.
* **Shared formulas.** Tiles are computed by the same
  ``geometry.unbonded_geometry_vec`` / ``coax_geometry_vec`` + term product
  functions as the XLA path, so kernel parity is by construction.
* **Parameters** are packed into one (1, P) vector; the backward kernel
  produces dE/dP via the same in-kernel VJP, so DiffTRe/direct-diff
  parameter gradients remain exact.

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

#: rows-array field layout (offsets into the F axis)
_VEC_FIELDS = ("stack", "back", "base", "a1", "a3")  # 5 x 3 = 15
_HW_OFF = 15  # hw = one_hot(seq) @ eps_hb_weights  (4)
_OH_OFF = 19  # one_hot(seq)                         (4)
_QF_OFF = 23  # Debye end-charge factor              (1)
_PREV_OFF = 24  # bonded 3' partner index as f32     (1)
_NXT_OFF = 25  # bonded 5' partner index as f32      (1)
N_FIELDS = 26
#: fields that receive gradients (sites + frames + hw; oh/qf/prev/nxt are
#: static or integral)
N_GRAD_FIELDS = _OH_OFF


def _interpret() -> bool:
    import os

    override = os.environ.get("MYTHOS_TPU_PALLAS_INTERPRET")
    if override is not None:
        return override not in ("0", "false", "")
    return jax.default_backend() != "tpu"


class TileSpec(NamedTuple):
    """Static configuration of the fused kernel (hashable)."""

    block_size: int  # B: rows per block
    cap: int  # K: symmetric column-block slots per row block
    n: int  # real row count
    n_blocks: int
    has_debye: bool
    coax_variant: str  # "dna1" | "dna2"
    params_treedef: object  # treedef of the packed params tuple
    leaf_shapes: tuple  # ((shape, size), ...) per leaf

    @property
    def panel(self) -> int:
        return self.cap * self.block_size


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


def _row_vec(rows, off) -> Vec3:
    return Vec3(
        rows[:, off : off + 1], rows[:, off + 1 : off + 2], rows[:, off + 2 : off + 3]
    )


def _col_vec(cols, off) -> Vec3:
    return Vec3(
        cols[off : off + 1, :], cols[off + 1 : off + 2, :], cols[off + 2 : off + 3, :]
    )


def _disp(a, b):
    return a - b


def _tile_energies(rows, cols, params, spec: TileSpec):
    """All unbonded term energies on one (B, M) tile panel.

    rows: (B, F) row fields; cols: (F, M) column fields. Returns a list of
    (B, M) arrays in term order: [exc_vol, hb, cross, coax, (debye)].
    Formula source: the same vec-geometry + product functions as the XLA
    tile path (energy/dna1/geometry.py, terms.py).
    """
    import mythos_tpu.energy.dna1.terms as t1

    def _bare(cls, prm):
        obj = object.__new__(cls)
        object.__setattr__(obj, "params", prm)
        return obj

    if spec.has_debye:
        import mythos_tpu.energy.dna2.terms as t2

        (p_exc, p_hb, p_cross, p_coax, p_debye) = params
    else:
        p_exc, p_hb, p_cross, p_coax = params
        p_debye = None

    fields = {}
    for k, name in enumerate(_VEC_FIELDS):
        fields[name + "_i"] = _row_vec(rows, 3 * k)
        fields[name + "_j"] = _col_vec(cols, 3 * k)

    out = []

    # excluded volume: 4 site-pair f3 terms
    base_i, base_j = fields["base_i"], fields["base_j"]
    back_i, back_j = fields["back_i"], fields["back_j"]

    def _r(v):
        from mythos_tpu.soa import vdot

        return jnp.sqrt(vdot(v, v) + 1e-18)

    out.append(
        t1._exc_vol_f3(_r(_disp(base_j, base_i)), p_exc.eps_exc, p_exc.dr_star_base, p_exc.sigma_base, p_exc.b_base, p_exc.dr_c_base)
        + t1._exc_vol_f3(_r(_disp(base_j, back_i)), p_exc.eps_exc, p_exc.dr_star_back_base, p_exc.sigma_back_base, p_exc.b_back_base, p_exc.dr_c_back_base)
        + t1._exc_vol_f3(_r(_disp(back_j, base_i)), p_exc.eps_exc, p_exc.dr_star_base_back, p_exc.sigma_base_back, p_exc.b_base_back, p_exc.dr_c_base_back)
        + t1._exc_vol_f3(_r(_disp(back_j, back_i)), p_exc.eps_exc, p_exc.dr_star_backbone, p_exc.sigma_backbone, p_exc.b_backbone, p_exc.dr_c_backbone)
    )

    # hydrogen bonding + cross stacking share the base-site geometry.
    # Mosaic has no acos primitive: use the polynomial arccos (f32-exact)
    from mythos_tpu.utils.math import arccos_poly

    g_ub = geom.unbonded_geometry_vec(
        base_i, base_j, fields["a1_i"], fields["a1_j"], fields["a3_i"], fields["a3_j"], _disp,
        arccos=arccos_poly,
    )
    hb_self = _bare(t1.HydrogenBonding, p_hb)
    hb_prod = hb_self.hb_product(g_ub)
    hw_i = rows[:, _HW_OFF : _HW_OFF + 4]  # (B, 4)
    oh_j = cols[_OH_OFF : _OH_OFF + 4, :]  # (4, M)
    weight = jax.lax.dot(hw_i, oh_j, precision=jax.lax.Precision.HIGHEST, preferred_element_type=rows.dtype)
    out.append(hb_prod * weight)

    cross_self = _bare(t1.CrossStacking, p_cross)
    out.append(cross_self.cross_product_term(g_ub))

    # coaxial stacking
    g_cx = geom.coax_geometry_vec(
        fields["stack_i"], fields["stack_j"], back_i, back_j,
        fields["a1_i"], fields["a1_j"], fields["a3_i"], fields["a3_j"], _disp,
        arccos=arccos_poly,
    )
    if spec.coax_variant == "dna2":
        import mythos_tpu.energy.dna2.terms as t2

        coax_self = _bare(t2.CoaxialStacking, p_coax)
        out.append(coax_self._coax_value(g_cx))
    else:
        coax_self = _bare(t1.CoaxialStacking, p_coax)
        out.append(coax_self.coax_product(g_cx))

    if spec.has_debye:
        import mythos_tpu.energy.dna2.terms as t2

        r_bb = _r(_disp(back_j, back_i))
        dgs = t2.debye_potential(
            r_bb, p_debye.kappa, p_debye.prefactor, p_debye.smoothing_coeff, p_debye.r_cut, p_debye.r_high
        )
        qf = rows[:, _QF_OFF : _QF_OFF + 1] * cols[_QF_OFF : _QF_OFF + 1, :]
        out.append(dgs * qf)

    return out


def _tile_mask(rows, jg, spec: TileSpec, a, *, triangular: bool):
    """(B, M) validity mask: no self, no bonded, real rows/cols only.

    ``triangular=True`` keeps only j > i: over a SYMMETRIC table that
    selects each unordered pair exactly once (used by the forward sums and
    the parameter gradient, whose orientation-asymmetric parameters --
    theta2/theta3-type pairs -- would otherwise be mixed). The row-side
    force gradient uses the full symmetric mask instead.
    """
    b_sz = spec.block_size
    ig = (a * b_sz + jax.lax.broadcasted_iota(jnp.int32, (b_sz, 1), 0)).astype(jnp.float32)
    jg_row = jg[0:1, :]  # (1, M) f32 global col ids (huge when padded)
    prev_i = rows[:, _PREV_OFF : _PREV_OFF + 1]
    nxt_i = rows[:, _NXT_OFF : _NXT_OFF + 1]
    keep = (jg_row > ig) if triangular else (jg_row != ig)
    return (
        keep
        & (ig < spec.n)
        & (jg_row < spec.n)
        & (jg_row != prev_i)
        & (jg_row != nxt_i)
    )


def _n_terms(spec: TileSpec) -> int:
    return 5 if spec.has_debye else 4


def _fwd_kernel(rows_ref, cols_ref, jg_ref, p_ref, out_ref, *, spec: TileSpec):
    a = pl.program_id(0)
    rows = rows_ref[...]
    cols = cols_ref[0]
    params = _unpack_params(p_ref, spec.params_treedef, spec.leaf_shapes)
    mask = _tile_mask(rows, jg_ref[0], spec, a, triangular=True)
    energies = _tile_energies(rows, cols, params, spec)
    sums = jnp.stack([jnp.where(mask, e, 0.0).sum() for e in energies])

    @pl.when(a == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[0, : len(energies)] += sums


def _bwd_rows_kernel(rows_ref, cols_ref, jg_ref, p_ref, gt_ref, grows_ref, *, spec: TileSpec):
    a = pl.program_id(0)
    cols = cols_ref[0]
    jg = jg_ref[0]
    gt = gt_ref[0, : _n_terms(spec)]  # (T,) per-term cotangents
    params_fixed = _unpack_params(p_ref, spec.params_treedef, spec.leaf_shapes)

    def total_rows(rows_in):
        # symmetric mask: row-side-only derivative == full per-row force
        mask = _tile_mask(rows_in, jg, spec, a, triangular=False)
        energies = _tile_energies(rows_in, cols, params_fixed, spec)
        return sum(
            gt[t] * jnp.where(mask, e, 0.0).sum() for t, e in enumerate(energies)
        )

    g_rows = jax.grad(total_rows)(rows_ref[...])
    grows_ref[...] = g_rows[:, :N_GRAD_FIELDS]


def _params_grad_xla(rows_rf, params_vec, cols, jg, gt, spec: TileSpec):
    """dE/d(params vector) via XLA autodiff over the same tiles.

    The in-kernel parameter VJP transposes ~170 scalar reads into scalar
    accumulations, which Mosaic serializes pathologically (measured ~80x
    slower than this path). Parameter gradients don't need the kernel's
    fusion win -- they are an O(P) reduction the XLA tile evaluation
    handles fine. Triangular mask: each unordered pair exactly once (a
    symmetric sum would mix theta2/theta3-type asymmetric pairs).
    """
    nb, b_sz = spec.n_blocks, spec.block_size
    rows_b = rows_rf.reshape(nb, b_sz, N_FIELDS)

    def total(p_vec):
        params = _unpack_params(p_vec, spec.params_treedef, spec.leaf_shapes)

        def blk(rows_blk, cols_blk, jg_blk, a):
            mask = _tile_mask(rows_blk, jg_blk, spec, a, triangular=True)
            energies = _tile_energies(rows_blk, cols_blk, params, spec)
            return jnp.stack([jnp.where(mask, e, 0.0).sum() for e in energies])

        sums = jax.vmap(blk)(rows_b, cols, jg, jnp.arange(nb))
        return jnp.dot(gt, jnp.sum(sums, axis=0)[: _n_terms(spec)])

    return jax.grad(total)(params_vec)


def _gather_cols(rows_rf: Arr, sym_ids: Arr, spec: TileSpec) -> tuple[Arr, Arr]:
    """(nb, F, M) column panels + (nb, M) f32 global col ids."""
    nb, cap = sym_ids.shape
    b_sz = spec.block_size
    safe = jnp.minimum(sym_ids, nb - 1)
    n_pad = nb * b_sz
    rows_b = rows_rf.reshape(nb, b_sz, N_FIELDS)
    cols = rows_b[safe]  # (nb, cap, B, F)
    cols = cols.reshape(nb, cap * b_sz, N_FIELDS).transpose(0, 2, 1)  # (nb, F, M)
    loc = jnp.arange(b_sz, dtype=jnp.int32)
    jg = jnp.where(
        (sym_ids < nb)[:, :, None],
        safe[:, :, None] * b_sz + loc[None, None, :],
        n_pad + 10,
    ).reshape(nb, 1, cap * b_sz)
    return cols, jg.astype(jnp.float32)


def _fwd_impl(rows_rf, params_vec, sym_ids, spec: TileSpec):
    cols, jg = _gather_cols(rows_rf, sym_ids, spec)
    nb = spec.n_blocks
    b_sz, m = spec.block_size, spec.panel
    p = params_vec.shape[-1]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, spec=spec),
        out_shape=jax.ShapeDtypeStruct((1, 8), jnp.float32),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((b_sz, N_FIELDS), lambda a: (a, 0)),
            pl.BlockSpec((1, N_FIELDS, m), lambda a: (a, 0, 0)),
            pl.BlockSpec((1, 1, m), lambda a: (a, 0, 0)),
            pl.BlockSpec((1, p), lambda a: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 8), lambda a: (0, 0)),
        interpret=_interpret(),
    )(rows_rf, cols, jg, params_vec)
    return out[0, : _n_terms(spec)]


def _bwd_impl(rows_rf, params_vec, sym_ids, gt, spec: TileSpec):
    """(row grads, param grads) as two pallas_calls.

    Separate calls so XLA drops the (expensive) parameter-gradient kernel
    entirely whenever the params cotangent is unused -- i.e. in the Langevin
    hot loop, where only forces are consumed.
    """
    cols, jg = _gather_cols(rows_rf, sym_ids, spec)
    nb = spec.n_blocks
    b_sz, m = spec.block_size, spec.panel
    p = params_vec.shape[-1]
    gt_pad = jnp.zeros((1, 8), jnp.float32).at[0, : _n_terms(spec)].set(gt)
    common_in = [
        pl.BlockSpec((b_sz, N_FIELDS), lambda a: (a, 0)),
        pl.BlockSpec((1, N_FIELDS, m), lambda a: (a, 0, 0)),
        pl.BlockSpec((1, 1, m), lambda a: (a, 0, 0)),
        pl.BlockSpec((1, p), lambda a: (0, 0)),
        pl.BlockSpec((1, 8), lambda a: (0, 0)),
    ]
    args = (rows_rf, cols, jg, params_vec, gt_pad)
    g_rows = pl.pallas_call(
        functools.partial(_bwd_rows_kernel, spec=spec),
        out_shape=jax.ShapeDtypeStruct((rows_rf.shape[0], N_GRAD_FIELDS), jnp.float32),
        grid=(nb,),
        in_specs=common_in,
        out_specs=pl.BlockSpec((b_sz, N_GRAD_FIELDS), lambda a: (a, 0)),
        interpret=_interpret(),
    )(*args)
    g_p = _params_grad_xla(rows_rf, params_vec, cols, jg, gt, spec)
    return g_rows, g_p


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def unbonded_tile_energies(rows_rf, params_vec, sym_ids, spec: TileSpec):
    """Per-term unbonded energies over a symmetric block table.

    Args:
        rows_rf: (n_pad, N_FIELDS) packed per-nucleotide fields.
        params_vec: (1, P) packed term parameters (pack_params).
        sym_ids: (nb, cap) symmetric block-neighbor table (padded with nb).
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


def fused_energy_soa(composed, body_soa, sym_ids, block_size: int):
    """Total SoA energy with the unbonded terms on the Pallas tile kernels.

    ``composed`` must already carry updated params (with_params applied).
    Bonded terms evaluate on the (cheap) XLA shift path; the unbonded group
    runs through :func:`unbonded_tile_energies`. Weighted like
    ``ComposedEnergyFunction.__call__``.
    """
    from mythos_tpu.energy import blocks

    by_name = {type(fn).__name__: (i, fn) for i, fn in enumerate(composed.energy_fns)}
    unbonded = [by_name[nm] for nm in _UNBONDED_ORDER if nm in by_name]
    unbonded_idx = {i for i, _ in unbonded}
    terms = [fn for _, fn in unbonded]
    has_debye = any(type(fn).__name__ == "Debye" for fn in terms)
    coax_variant = "dna1"
    for fn in terms:
        if type(fn).__name__ == "CoaxialStacking":
            coax_variant = "dna2" if type(fn).__module__.endswith("dna2.terms") else "dna1"

    first = terms[0]
    nuc = first.transform_soa_fn(body_soa)
    seq = jnp.asarray(first.seq)
    n = seq.shape[0]
    nb, cap = sym_ids.shape
    # Mosaic requires the tile panel minor dim to be a multiple of 128:
    # pad the slot table with invalid (== nb) columns
    m = cap * block_size
    short = (-m) % 128
    if short:
        extra = -(-short // block_size)
        sym_ids = jnp.pad(sym_ids, ((0, 0), (0, extra)), constant_values=nb)
        cap += extra
    n_pad = nb * block_size

    params_vec, (treedef, leaf_shapes) = pack_params([fn.params for fn in terms])
    spec = TileSpec(
        block_size=block_size,
        cap=cap,
        n=n,
        n_blocks=nb,
        has_debye=has_debye,
        coax_variant=coax_variant,
        params_treedef=treedef,
        leaf_shapes=leaf_shapes,
    )

    # packed row fields
    hb = next(fn for fn in terms if type(fn).__name__ == "HydrogenBonding")
    oh = jax.nn.one_hot(seq, 4, dtype=jnp.float32)
    hw = oh @ hb.params.eps_hb_weights.astype(jnp.float32)
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

    cols = (
        [nuc.stack.x, nuc.stack.y, nuc.stack.z]
        + [nuc.back.x, nuc.back.y, nuc.back.z]
        + [nuc.base.x, nuc.base.y, nuc.base.z]
        + [nuc.a1.x, nuc.a1.y, nuc.a1.z]
        + [nuc.a3.x, nuc.a3.y, nuc.a3.z]
        + [hw[:, k] for k in range(4)]
        + [oh[:, k] for k in range(4)]
        + [qf]
    )
    pad = n_pad - n
    stacked = [jnp.pad(c.astype(jnp.float32), (0, pad)) for c in cols]
    stacked.append(prev.astype(jnp.float32))
    stacked.append(nxt.astype(jnp.float32))
    rows_rf = jnp.stack(stacked, axis=-1)  # (n_pad, N_FIELDS)

    per_term = unbonded_tile_energies(rows_rf, params_vec, sym_ids, spec)

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
