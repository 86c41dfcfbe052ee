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
_HW = 12  # left hb-weight factor: one_hot(seq) @ W, or marginal @ W (pseq)  (4)
_OH = 16  # right hb-weight factor: one_hot(seq), or marginal (pseq)         (4)
_CORR = 20  # pseq same-base-pair weight correction (0 when discrete)
_QF = 21  # Debye end-charge factor            (1)
_PARTNER = 22  # pseq bp-partner slot id as f32 (own gid when inapplicable)
_PREV = 23  # bonded 3' partner id as f32, -1 if none
_NXT = 24  # bonded 5' partner id as f32, -1 if none
_GID = 25  # global id as f32 (huge when padded)
N_FIELDS = 26
#: row-gradient layout: com/a1/a2/a3 (symmetric mask) + hw (triangular mask)
N_GRAD_FIELDS = 16
#: pseq adds the right factor (reverse-triangular, role-swapped product) and
#: the correction (triangular) so sequence-distribution gradients flow
N_GRAD_FIELDS_PSEQ = 21

#: slim field layout of the ``debye`` kind (the wide-cutoff Debye-Hueckel
#: term only needs the backbone site and the end-charge factor)
_DB_BACK = 0  # backbone interaction site       (3)
_DB_QF = 3  # end-charge factor                 (1)
_DB_PREV = 4
_DB_NXT = 5
_DB_GID = 6
N_FIELDS_DEBYE = 8
N_GRAD_FIELDS_DEBYE = 4  # back site + qf

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
    """Static configuration of the fused kernel (hashable).

    ``kind`` selects the term set and field layout:

    * ``"full"``  -- all unbonded terms on one table (24 fields).
    * ``"short"`` -- the short-cutoff terms (exc_vol/hb/cross/coax) on a
      tight table; Debye runs separately on the wide table.
    * ``"debye"`` -- Debye-Hueckel alone on the wide table (8 slim fields).

    ``q`` packs that many row blocks into one 128-lane panel (each with
    ``cap`` column-block slots): tiles stay full vector registers while the
    per-row-block candidate count shrinks by q.
    """

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
    kind: str = "full"  # "full" | "short" | "debye"
    q: int = 1  # row blocks sharing one panel
    pseq: bool = False  # hb weights from sequence-distribution marginals
    #: the table's cap slots per row are CONSECUTIVE block ids (a banded
    #: window, simulators/neighbors.BlockNeighborList(banded=True)): panel
    #: assembly takes one contiguous (cap*B, F) slice per lane group instead
    #: of cap scattered (B, F) slices
    banded: bool = False

    @property
    def panel(self) -> int:
        return self.q * self.cap * self.block_size

    @property
    def n_pad(self) -> int:
        return self.nb_pad * self.block_size

    @property
    def n_fields(self) -> int:
        return N_FIELDS_DEBYE if self.kind == "debye" else N_FIELDS

    @property
    def n_grad_fields(self) -> int:
        if self.kind == "debye":
            return N_GRAD_FIELDS_DEBYE
        return N_GRAD_FIELDS_PSEQ if self.pseq else N_GRAD_FIELDS

    @property
    def id_offsets(self) -> tuple[int, int, int]:
        """(gid, prev, nxt) field offsets for the mask."""
        if self.kind == "debye":
            return _DB_GID, _DB_PREV, _DB_NXT
        return _GID, _PREV, _NXT


def _is_numeric(leaf) -> bool:
    if isinstance(leaf, (bool, str)):
        return False
    if isinstance(leaf, (int, float)):
        return True
    return hasattr(leaf, "dtype") and jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating)


def _is_static_struct(leaf) -> bool:
    """Containers kept as ONE opaque static leaf (never traced).

    SequenceConstraints carries validation in __post_init__ that would run
    on tracers if its int fields were flattened through the packed vector.
    """
    from mythos_tpu.io.sequence_constraints import SequenceConstraints

    return isinstance(leaf, SequenceConstraints)


class _FrozenStatic:
    """Hashable pickle wrapper for static (unhashable) leaves.

    TileSpec rides through custom_vjp nondiff_argnums and jit static args,
    so every static leaf must be hashable; array-bearing containers (e.g.
    SequenceConstraints when pseq is set) are frozen to bytes here and
    thawed verbatim at unpack time.
    """

    __slots__ = ("data",)

    def __init__(self, leaf):
        import pickle

        self.data = pickle.dumps(leaf)

    def thaw(self):
        import pickle

        return pickle.loads(self.data)

    def __hash__(self):
        return hash(self.data)

    def __eq__(self, other):
        return isinstance(other, _FrozenStatic) and self.data == other.data


def pack_params(param_structs) -> tuple[Arr, "tuple"]:
    """Flatten term configs into one (1, P) f32 vector (+ static meta).

    Non-numeric leaves (metadata strings, bools, int flags, index tables)
    are baked into the static meta and restored verbatim at unpack time.
    """
    leaves, treedef = jax.tree_util.tree_flatten(
        tuple(param_structs), is_leaf=_is_static_struct
    )
    flat = []
    meta = []
    for leaf in leaves:
        if _is_static_struct(leaf):
            meta.append(("s", _FrozenStatic(leaf), 0))
        elif _is_numeric(leaf):
            flat.append(jnp.ravel(jnp.asarray(leaf, jnp.float32)))
            meta.append(("n", tuple(np.shape(leaf)), int(np.size(leaf))))
        elif hasattr(leaf, "dtype"):
            meta.append(("s", _FrozenStatic(np.asarray(leaf)), 0))
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
            leaves.append(info.thaw() if isinstance(info, _FrozenStatic) else info)
            continue
        if size == 0:
            # zero-size leaves (e.g. an all-paired pseq's empty unpaired
            # table) lower to invalid Mosaic vector types if sliced
            leaves.append(jnp.zeros(info, jnp.float32))
        elif size == 1:
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


def _is_interleave2(perm: np.ndarray) -> bool:
    """True for the canonical duplex interleave: perm[2i]=i, perm[2i+1]=N-1-i."""
    n = perm.shape[0]
    if n % 2:
        return False
    h = n // 2
    return bool(
        np.array_equal(perm[0::2], np.arange(h))
        and np.array_equal(perm[1::2], n - 1 - np.arange(h))
    )


@jax.custom_vjp
def _interleave2(x):
    """Duplex-interleave reorder via pure vector ops (stack/reverse/reshape).

    Equivalent to x[perm] for the strand_interleave_perm permutation, but
    ~200x faster on TPU: XLA lowers 1D index gathers through scalar-memory
    copies and a serial loop (~60 us per 10k-element gather), while this
    form stays on the vector unit (~0.2 us).
    """
    h = x.shape[0] // 2
    return jnp.stack([x[:h], x[h:][::-1]], axis=1).reshape(-1)


def _interleave2_inv(y):
    m = y.reshape(-1, 2)
    return jnp.concatenate([m[:, 0], m[:, 1][::-1]])


_interleave2.defvjp(lambda x: (_interleave2(x), None), lambda _res, g: (_interleave2_inv(g),))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _permute(x, perm: tuple, inv_perm: tuple):
    """x[perm] with a gather-based vjp (generic fallback).

    The autodiff transpose of a gather is a scatter-add, which XLA lowers
    to a serialized loop on TPU; for a bijective permutation the transpose
    is itself a gather by the inverse permutation. Structured permutations
    (the duplex interleave) should use :func:`_interleave2` instead -- even
    the forward 1D gather runs on the scalar core.
    """
    return x[jnp.asarray(np.asarray(perm))]


def _permute_fwd(x, perm: tuple, inv_perm: tuple):
    return _permute(x, perm, inv_perm), None


def _permute_bwd(perm: tuple, inv_perm: tuple, _res, g):
    return (g[jnp.asarray(np.asarray(inv_perm))],)


_permute.defvjp(_permute_fwd, _permute_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _bcast_groups(col, q: int, w: int):
    """(q*B, 1) row-field column -> (B, q*w) lane-group expansion.

    Lane group k (width w) broadcasts row block k's (B, 1) values. The
    custom vjp transposes via masked full-width lane reductions: the
    autodiff default (lane slices at sub-vreg offsets + partial reduces)
    lowers pathologically in Mosaic (~3x on the backward kernel).
    """
    b = col.shape[0] // q
    return jnp.concatenate(
        [jnp.broadcast_to(col[k * b : (k + 1) * b], (b, w)) for k in range(q)], axis=1
    )


def _bcast_groups_fwd(col, q: int, w: int):
    return _bcast_groups(col, q, w), None


def _bcast_groups_bwd(q: int, w: int, _res, g):
    lane = jax.lax.broadcasted_iota(jnp.int32, g.shape, 1)
    parts = [
        jnp.sum(
            jnp.where((lane >= k * w) & (lane < (k + 1) * w), g, 0.0),
            axis=1,
            keepdims=True,
        )
        for k in range(q)
    ]
    return (jnp.concatenate(parts, axis=0),)


_bcast_groups.defvjp(_bcast_groups_fwd, _bcast_groups_bwd)


class _Rows:
    """Row-field operands broadcastable against (1, M) column panels.

    q == 1: thin (B, 1) slices (implicit lane broadcast, as in v2).
    q > 1: lane-group-expanded (B, M) arrays -- lane group k (width M/q)
    carries row block k's values, so one (B, M) tile evaluates q row blocks
    against their own column slots in full vector registers.
    """

    def __init__(self, rows, spec: TileSpec):
        self.rows = rows  # (q*B, F)
        self.spec = spec

    def field(self, off: int):
        q = self.spec.q
        if q == 1:
            return self.rows[:, off : off + 1]
        return _bcast_groups(self.rows[:, off : off + 1], q, self.spec.panel // q)

    def vec3(self, off: int) -> Vec3:
        return Vec3(self.field(off), self.field(off + 1), self.field(off + 2))


def _disp(a, b):
    return a - b


def _derive_sites(
    com: Vec3,
    a1: Vec3,
    a2: Vec3,
    geometry,
    need_stack: bool = True,
    need_back: bool = True,
    need_base: bool = True,
    a3: Vec3 | None = None,
) -> tuple[Vec3 | None, Vec3 | None, Vec3 | None]:
    """(stack, back, base) sites from the frame; matches the Nucleotide
    transforms (energy/dna1/nucleotide.py, energy/dna2/nucleotide.py,
    energy/rna2/nucleotide.py — the rna2 backbone offset spans (a1, a3)).
    ``need_*=False`` skips a site (returns None) — the stencil kernel prunes
    site derivation per active term subset."""
    variant, offs = geometry
    back = None
    if need_back:
        if variant == "dna2":
            bx, by, _hb, _st = offs
            back = com + bx * a1 + by * a2
        elif variant == "rna2":
            bx, by, _hb, _st = offs
            if a3 is None:
                raise ValueError("rna2 site derivation needs a3")
            back = com + bx * a1 + by * a3
        else:
            bb, _hb, _st = offs
            back = com + bb * a1
    st_off = offs[-1]
    hb_off = offs[-2]
    stack = com + st_off * a1 if need_stack else None
    base = com + hb_off * a1 if need_base else None
    return stack, back, base


def _r(v: Vec3):
    from mythos_tpu.soa import vdot

    return jnp.sqrt(vdot(v, v) + 1e-18)


def _bare(cls, prm):
    """Instantiate a term class with params alone (the product functions
    read nothing else)."""
    obj = object.__new__(cls)
    object.__setattr__(obj, "params", prm)
    return obj


def _tile_energies(rows: "_Rows", panel, params, spec: TileSpec):
    """All term energies on one (B, M) tile panel.

    rows: _Rows accessor over the (q*B, F) row fields; panel: (F, M) column
    fields. Returns (energies, (hb_prod, hb_prod_t)): energies is a list of
    (B, M) arrays in term order [exc_vol, hb, cross, coax, (debye)] (or
    [debye] for the slim kind); hb_prod is the weight-free hydrogen-bonding
    product (for the triangular hw gradient) and hb_prod_t its role-swapped
    twin (pseq right-factor gradient; None otherwise). Formula source: the
    same product
    functions as the XLA tile path (energy/dna1/terms.py,
    energy/dna2/terms.py).
    """
    import mythos_tpu.energy.dna1.terms as t1
    from mythos_tpu.utils.math import arccos_poly

    if spec.kind == "debye":
        import mythos_tpu.energy.dna2.terms as t2

        (p_debye,) = params
        back_i = rows.vec3(_DB_BACK)
        back_j = _vec(panel, _DB_BACK, False)
        dgs = t2.debye_potential(
            _r(_disp(back_j, back_i)),
            p_debye.kappa, p_debye.prefactor, p_debye.smoothing_coeff, p_debye.r_cut, p_debye.r_high,
        )
        qf = rows.field(_DB_QF) * panel[_DB_QF : _DB_QF + 1, :]
        return [dgs * qf], (None, None)

    if spec.has_debye:
        (p_exc, p_hb, p_cross, p_coax, p_debye) = params
    else:
        p_exc, p_hb, p_cross, p_coax = params
        p_debye = None

    com_i, a1_i, a2_i, a3_i = (rows.vec3(o) for o in (_COM, _A1, _A2, _A3))
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
    hb_term = _bare(t1.HydrogenBonding, p_hb)
    hb_prod = hb_term.hb_product(g_ub)
    # hb weight = sum_k hw_i[k] * oh_j[k], elementwise on the VPU (a K=4 MXU
    # dot is slower and would mix lane groups when q > 1). For pseq, hw/oh
    # hold the marginal factors (seqdep.factorized_weights) and the
    # partner-sparse same-base-pair correction is added on top.
    weight = 0.0
    for k in range(4):
        weight = weight + rows.field(_HW + k) * panel[_OH + k : _OH + k + 1, :]
    hb_prod_t = None
    if spec.pseq:
        jg = panel[_GID : _GID + 1, :]
        same = jg == rows.field(_PARTNER)
        weight = weight + jnp.where(same, rows.field(_CORR), 0.0)
        # role-swapped product for the right-factor gradient: exchanging the
        # pair swaps theta2<->theta3 and theta7<->theta8 (theta1/theta4/r are
        # exchange-symmetric), so hb_prod(j, i) is this tile's product with
        # the swapped modulations -- exact even when the 2/3 (7/8) f4
        # parameters differ (no symmetry assumption)
        g_sw = g_ub._replace(
            theta2=g_ub.theta3, theta3=g_ub.theta2, theta7=g_ub.theta8, theta8=g_ub.theta7
        )
        hb_prod_t = hb_term.hb_product(g_sw)
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
        qf = rows.field(_QF) * panel[_QF : _QF + 1, :]
        out.append(dgs * qf)

    return out, (hb_prod, hb_prod_t)


def _tile_mask(rows: "_Rows", panel, spec: TileSpec, *, triangular: bool, reverse: bool = False):
    """(B, M) validity mask: no self, no bonded, real rows/cols only.

    Row identity comes from the gid FIELD (not a recomputed block index),
    so it is correct for any q and drops padded rows via their _BIG gid.

    ``triangular=True`` keeps only j > i: over a SYMMETRIC table that
    selects each unordered pair exactly once (used by the forward sums and
    the parameter gradient, whose orientation-asymmetric parameters --
    theta2/theta3-type pairs -- would otherwise be mixed). The row-side
    force gradient uses the full symmetric mask instead.
    """
    gid_off, prev_off, nxt_off = spec.id_offsets
    ig = rows.field(gid_off)
    jg = panel[gid_off : gid_off + 1, :]  # (1, M); _BIG when padded
    prev_i = rows.field(prev_off)
    nxt_i = rows.field(nxt_off)
    if triangular:
        keep = (jg < ig) if reverse else (jg > ig)
    else:
        keep = jg != ig
    return (
        keep
        & (ig < spec.n)
        & (jg < spec.n)
        & (jg != prev_i)
        & (jg != nxt_i)
    )


def _n_terms(spec: TileSpec) -> int:
    if spec.kind == "debye":
        return 1
    return 5 if spec.has_debye else 4


_HB_TERM = 1  # index of hydrogen bonding in the term order


# Pallas kernels ---------------------------------------------------------------


def _assemble_panel(ids_ref, g0, src_ref, panel_rows, spec: TileSpec):
    """Fill the (M, F) panel scratch from the resident field array, then
    hand back the (F, M) transpose.

    The panel serves row blocks g0 .. g0+q-1 of this grid step: lane group
    k holds row block g0+k's ``cap`` column-block slots as sublane slices.
    """
    b_sz, nb = spec.block_size, spec.n_blocks
    if spec.banded:
        # consecutive slots: one contiguous window slice per lane group.
        # Slot 0 is the window start; clamp so the slice stays inside the
        # padded rows array (pad_ids lane-padding may widen cap past the
        # build's window; shifted windows pull real rows that are beyond
        # every cutoff, which contribute exactly zero)
        w = spec.cap * b_sz
        for qq in range(spec.q):
            start = jnp.minimum(ids_ref[g0 + qq, 0], spec.nb_pad - spec.cap) * b_sz
            panel_rows[qq * w : (qq + 1) * w, :] = src_ref[pl.ds(start, w), :]
        return panel_rows[...].T  # (F, M)
    for qq in range(spec.q):
        for k in range(spec.cap):
            idk = ids_ref[g0 + qq, k]
            # invalid slots (>= n_blocks) clamp to the first PAD block: its
            # rows carry gid = _BIG already, so the pair masks drop them
            # without a per-slot branch (build_tile_inputs guarantees
            # nb_pad > n_blocks)
            safe = jnp.minimum(idk, nb) * b_sz
            s = (qq * spec.cap + k) * b_sz
            panel_rows[s : s + b_sz, :] = src_ref[pl.ds(safe, b_sz), :]

    return panel_rows[...].T  # (F, M)


def _fwd_kernel_body(panel, rows_g, params, gt, spec: TileSpec):
    rv = _Rows(rows_g, spec)
    mask = _tile_mask(rv, panel, spec, triangular=True)
    energies, _ = _tile_energies(rv, panel, params, spec)
    return jnp.stack([jnp.where(mask, e, 0.0).sum() for e in energies] + [0.0] * (8 - len(energies)))


def _lane_group_mask(spec: TileSpec, qq: int):
    """(1, M) mask of lane group qq (row block qq's slots in the panel)."""
    w = spec.panel // spec.q
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, spec.panel), 1)
    return (lane >= qq * w) & (lane < (qq + 1) * w)


def _group_dot(mat, cols, spec: TileSpec):
    """(B, M) @ (M, K) -> (q*B, K), each row block summing only its own
    lane group (mat's sublane r + lane group qq = row r of row block qq)."""
    kw = dict(precision=jax.lax.Precision.HIGHEST, preferred_element_type=mat.dtype)
    if spec.q == 1:
        return jax.lax.dot(mat, cols, **kw)
    parts = []
    for qq in range(spec.q):
        masked = jnp.where(_lane_group_mask(spec, qq), mat, 0.0)
        parts.append(jax.lax.dot(masked, cols, **kw))
    return jnp.concatenate(parts, axis=0)


def _bwd_kernel_body(panel, rows_g, params, gt, spec: TileSpec):
    """(q*B, n_grad_fields) row-side gradients for q row blocks."""

    def total(rows_in):
        if spec.kind == "debye":
            rows_sg = rows_in
        else:
            # hw (and the pseq correction) enter only row-side in the
            # triangular forward; stop their symmetric-mask gradients here
            # and differentiate them under the correct triangle below (the
            # symmetric shortcut would double them)
            stop_hi = _CORR + 1 if spec.pseq else _HW + 4
            rows_sg = jnp.concatenate(
                [
                    rows_in[:, :_HW],
                    jax.lax.stop_gradient(rows_in[:, _HW:stop_hi]),
                    rows_in[:, stop_hi:],
                ],
                axis=1,
            )
        rv = _Rows(rows_sg, spec)
        mask = _tile_mask(rv, panel, spec, triangular=False)
        energies, (hb_prod, hb_prod_t) = _tile_energies(rv, panel, params, spec)
        tot = 0.0
        for t, e in enumerate(energies):
            tot = tot + gt[t] * jnp.where(mask, e, 0.0).sum()
        if spec.kind == "debye":
            return tot, (jnp.zeros_like(energies[0]),) * 3
        rv_raw = _Rows(rows_in, spec)
        mask_tri = _tile_mask(rv_raw, panel, spec, triangular=True)
        hb_tri = jnp.where(mask_tri, hb_prod, 0.0)
        if not spec.pseq:
            return tot, (hb_tri, hb_tri, hb_tri)
        # right-factor gradient: pairs where this row is the COLUMN, i.e.
        # j < i over the symmetric table, with the role-swapped product
        mask_rtri = _tile_mask(rv_raw, panel, spec, triangular=True, reverse=True)
        hbt_rtri = jnp.where(mask_rtri, hb_prod_t, 0.0)
        same = panel[_GID : _GID + 1, :] == rv_raw.field(_PARTNER)
        eqhb_tri = jnp.where(mask_tri & same, hb_prod, 0.0)
        return tot, (hb_tri, hbt_rtri, eqhb_tri)

    (_, (hb_tri, hbt_rtri, eqhb_tri)), g_rows = jax.value_and_grad(
        total, has_aux=True
    )(rows_g)
    if spec.kind == "debye":
        return g_rows[:, : spec.n_grad_fields]

    oh_j = panel[_OH : _OH + 4, :]
    g_hw = gt[_HB_TERM] * _group_dot(hb_tri, oh_j.T, spec)
    if not spec.pseq:
        return jnp.concatenate([g_rows[:, :_HW], g_hw], axis=1)
    # d/d right factor: sum over j < i of the swapped product times the
    # column-side LEFT factors; d/d corr: triangular partner-matched sum
    hw_j = panel[_HW : _HW + 4, :]
    g_oh = gt[_HB_TERM] * _group_dot(hbt_rtri, hw_j.T, spec)
    ones_m = jnp.ones((spec.panel, 1), rows_g.dtype)
    g_corr = gt[_HB_TERM] * _group_dot(eqhb_tri, ones_m, spec)
    return jnp.concatenate([g_rows[:, :_HW], g_hw, g_oh, g_corr], axis=1)


#: forces-only row-gradient widths: com/a1/a2/a3 (full/short kinds) or the
#: backbone site alone (debye kind) -- the static fields (hb weights, charge
#: factor) have no body dependence, so the Langevin force path skips their
#: gradient machinery entirely (triangular hw matmuls, pseq swapped product)
N_FORCE_FIELDS = 12
N_FORCE_FIELDS_DEBYE = 3


def _bwd_forces_kernel_body(panel, rows_g, params, gt, spec: TileSpec):
    """(q*B, n_force_fields) body-field gradients only (the Langevin path).

    Identical to :func:`_bwd_kernel_body` for the com/frame fields, but every
    static field (hw/oh/corr/qf/partner) is stop_gradient'ed, so none of the
    hb-weight gradient machinery is traced into the kernel.
    """

    def total(rows_in):
        cut = _DB_QF if spec.kind == "debye" else _HW
        rows_sg = jnp.concatenate(
            [rows_in[:, :cut], jax.lax.stop_gradient(rows_in[:, cut:])], axis=1
        )
        rv = _Rows(rows_sg, spec)
        mask = _tile_mask(rv, panel, spec, triangular=False)
        energies, _ = _tile_energies(rv, panel, params, spec)
        tot = 0.0
        for t, e in enumerate(energies):
            tot = tot + gt[t] * jnp.where(mask, e, 0.0).sum()
        return tot

    g_rows = jax.grad(total)(rows_g)
    n_out = N_FORCE_FIELDS_DEBYE if spec.kind == "debye" else N_FORCE_FIELDS
    return g_rows[:, :n_out]


#: use the hand-Jacobian forces body for the Langevin hot loop (tests flip
#: this to cross-check the two force computations against each other)
ANALYTIC_FORCES = True


def _reduce_row_fields(fields, spec: TileSpec):
    """Lane-group row reductions: each (B, M) tile sums to (q*B, 1) -- lane
    group qq carries row block qq's columns -- concatenated over fields."""
    cols = []
    for t in fields:
        if spec.q == 1:
            cols.append(t.sum(axis=1, keepdims=True))
        else:
            cols.append(
                jnp.concatenate(
                    [
                        jnp.where(_lane_group_mask(spec, qq), t, 0.0).sum(
                            axis=1, keepdims=True
                        )
                        for qq in range(spec.q)
                    ],
                    axis=0,
                )
            )
    return jnp.concatenate(cols, axis=1)


def _bwd_forces_analytic_body(panel, rows_g, params, gt, spec: TileSpec):
    """(q*B, n_force_fields) body gradients with hand-coded geometry Jacobians.

    Same contract as :func:`_bwd_forces_kernel_body`, restructured for the
    VPU: the tile energy is expressed through a scalar bottleneck S (five
    pair distances, eight arccos arguments, two dihedral cosines); reverse
    mode runs only through the elementwise f1..f6/arccos chains (dE/dS), and
    dS/d(com, a1, a2, a3) is accumulated with the closed-form vector
    Jacobians

        d r / dv            = u                      (u = v/r)
        d (sigma a.v/r) /dv = (sigma a - c u) / r    (c the arccos argument)
        d (u.w) / dv        = (w - (u.w) u) / r      (w independent of v)

    for each pair vector v (j minus i). This avoids replaying the vector
    geometry graph in reverse -- the broadcast transposes and per-field
    reductions that dominated the AD backward (benchmarks/RESULTS.md kernel
    profile); the only cross-lane work left is one masked reduction per
    output field. Energy formula source: :func:`_tile_energies` (the scalar
    definitions mirror geometry.unbonded_geometry_vec / coax_geometry_vec).
    """
    from mythos_tpu.soa import vcross, vdot
    from mythos_tpu.utils.math import arccos_poly

    import mythos_tpu.energy.dna1.terms as t1

    rv = _Rows(rows_g, spec)
    mask = _tile_mask(rv, panel, spec, triangular=False)

    if spec.kind == "debye":
        import mythos_tpu.energy.dna2.terms as t2

        (p_debye,) = params
        back_i = rv.vec3(_DB_BACK)
        back_j = _vec(panel, _DB_BACK, False)
        v = _disp(back_j, back_i)
        r = _r(v)
        qf = rv.field(_DB_QF) * panel[_DB_QF : _DB_QF + 1, :]

        def total_db(r_):
            e = (
                t2.debye_potential(
                    r_,
                    p_debye.kappa,
                    p_debye.prefactor,
                    p_debye.smoothing_coeff,
                    p_debye.r_cut,
                    p_debye.r_high,
                )
                * qf
            )
            return gt[0] * jnp.where(mask, e, 0.0).sum()

        s = jax.grad(total_db)(r) / r  # dE/dback_i = -(dE/dr) u
        return _reduce_row_fields([-s * v.x, -s * v.y, -s * v.z], spec)

    if spec.has_debye:
        p_exc, p_hb, p_cross, p_coax, p_debye = params
    else:
        (p_exc, p_hb, p_cross, p_coax), p_debye = params, None

    com_i, a1_i, a2_i, a3_i = (rv.vec3(o) for o in (_COM, _A1, _A2, _A3))
    com_j, a1_j, a2_j, a3_j = (_vec(panel, o, False) for o in (_COM, _A1, _A2, _A3))
    stack_i, back_i, base_i = _derive_sites(com_i, a1_i, a2_i, spec.geometry)
    stack_j, back_j, base_j = _derive_sites(com_j, a1_j, a2_j, spec.geometry)

    # pair vectors (j minus i) and the scalar bottleneck
    v_ee = _disp(base_j, base_i)
    r_ee = _r(v_ee)
    inv_ee = 1.0 / r_ee
    u_ee = v_ee * inv_ee
    v_eb = _disp(base_j, back_i)
    r_eb = _r(v_eb)
    v_be = _disp(back_j, base_i)
    r_be = _r(v_be)
    v_bb = _disp(back_j, back_i)
    r_bb = _r(v_bb)
    inv_bb = 1.0 / r_bb
    u_bb = v_bb * inv_bb
    v_st = _disp(stack_j, stack_i)
    r_st = _r(v_st)
    inv_st = 1.0 / r_st
    u_st = v_st * inv_st

    ct1 = -vdot(a1_i, a1_j)
    ct2 = -vdot(a1_j, v_ee) * inv_ee
    ct3 = vdot(a1_i, v_ee) * inv_ee
    ct4 = vdot(a3_i, a3_j)
    ct7 = -vdot(a3_j, v_ee) * inv_ee
    ct8 = vdot(a3_i, v_ee) * inv_ee
    ct5 = vdot(a3_i, u_st)
    ct6 = -vdot(a3_j, u_st)
    w3 = vcross(u_bb, a1_j)
    p3 = vdot(u_st, w3)
    w4 = vcross(u_bb, a1_i)
    p4 = vdot(u_st, w4)

    # static hb weight / charge factors (forces never differentiate them)
    weight = 0.0
    for k in range(4):
        weight = weight + rv.field(_HW + k) * panel[_OH + k : _OH + k + 1, :]
    if spec.pseq:
        same = panel[_GID : _GID + 1, :] == rv.field(_PARTNER)
        weight = weight + jnp.where(same, rv.field(_CORR), 0.0)
    qf = rv.field(_QF) * panel[_QF : _QF + 1, :] if spec.has_debye else None

    def total(S):
        (r_ee_, r_eb_, r_be_, r_bb_, r_st_, c1, c2, c3, c4, c7, c8, c5, c6, q3, q4) = S
        e_exc = (
            t1._exc_vol_f3(r_ee_, p_exc.eps_exc, p_exc.dr_star_base, p_exc.sigma_base, p_exc.b_base, p_exc.dr_c_base)
            + t1._exc_vol_f3(r_eb_, p_exc.eps_exc, p_exc.dr_star_back_base, p_exc.sigma_back_base, p_exc.b_back_base, p_exc.dr_c_back_base)
            + t1._exc_vol_f3(r_be_, p_exc.eps_exc, p_exc.dr_star_base_back, p_exc.sigma_base_back, p_exc.b_base_back, p_exc.dr_c_base_back)
            + t1._exc_vol_f3(r_bb_, p_exc.eps_exc, p_exc.dr_star_backbone, p_exc.sigma_backbone, p_exc.b_backbone, p_exc.dr_c_backbone)
        )
        g_ub = geom.UnbondedGeometry(
            dr_base=None,
            r_base=r_ee_,
            theta1=arccos_poly(c1),
            theta2=arccos_poly(c2),
            theta3=arccos_poly(c3),
            theta4=arccos_poly(c4),
            theta7=arccos_poly(c7),
            theta8=jnp.pi - arccos_poly(c8),
        )
        e_hb = _bare(t1.HydrogenBonding, p_hb).hb_product(g_ub) * weight
        e_cross = _bare(t1.CrossStacking, p_cross).cross_product_term(g_ub)
        g_cx = geom.CoaxGeometry(
            dr_stack=None,
            r_stack=r_st_,
            theta1=g_ub.theta1,
            theta4=g_ub.theta4,
            theta5=arccos_poly(c5),
            theta6=arccos_poly(c6),
            cosphi3=q3,
            cosphi4=q4,
        )
        if spec.coax_variant == "dna2":
            import mythos_tpu.energy.dna2.terms as t2

            e_coax = _bare(t2.CoaxialStacking, p_coax)._coax_value(g_cx)
        else:
            e_coax = _bare(t1.CoaxialStacking, p_coax).coax_product(g_cx)
        terms = [e_exc, e_hb, e_cross, e_coax]
        if p_debye is not None:
            import mythos_tpu.energy.dna2.terms as t2

            terms.append(
                t2.debye_potential(
                    r_bb_,
                    p_debye.kappa,
                    p_debye.prefactor,
                    p_debye.smoothing_coeff,
                    p_debye.r_cut,
                    p_debye.r_high,
                )
                * qf
            )
        tot = 0.0
        for t, e in enumerate(terms):
            tot = tot + gt[t] * jnp.where(mask, e, 0.0).sum()
        return tot

    S = (r_ee, r_eb, r_be, r_bb, r_st, ct1, ct2, ct3, ct4, ct7, ct8, ct5, ct6, p3, p4)
    (
        g_ree, g_reb, g_rbe, g_rbb, g_rst,
        g_c1, g_c2, g_c3, g_c4, g_c7, g_c8, g_c5, g_c6, g_p3, g_p4,
    ) = jax.grad(total)(S)

    # dE/d(pair vector) per pair vector; the _bare _Rows accessor makes these
    # (B, M) tiles, lane-grouped when q > 1
    m3 = vcross(a1_j, u_st)  # dp3/dv_bb direction: p3 = u_bb . (a1_j x u_st)
    m4 = vcross(a1_i, u_st)
    g_ee = (
        u_ee * (g_ree - (g_c2 * ct2 + g_c3 * ct3 + g_c7 * ct7 + g_c8 * ct8) * inv_ee)
        + (a1_i * g_c3 - a1_j * g_c2 + a3_i * g_c8 - a3_j * g_c7) * inv_ee
    )
    g_eb = v_eb * (g_reb / r_eb)
    g_be = v_be * (g_rbe / r_be)
    g_bb = (
        u_bb * (g_rbb - (g_p3 * p3 + g_p4 * p4) * inv_bb)
        + (m3 * g_p3 + m4 * g_p4) * inv_bb
    )
    g_st = (
        u_st * (g_rst - (g_c5 * ct5 + g_c6 * ct6 + g_p3 * p3 + g_p4 * p4) * inv_st)
        + (a3_i * g_c5 - a3_j * g_c6 + w3 * g_p3 + w4 * g_p4) * inv_st
    )

    variant, offs = spec.geometry
    if variant == "dna2":
        bx, by, hb_off, st_off = offs
        a1_back, a2_back = bx, by
    else:
        bb_off, hb_off, st_off = offs
        a1_back, a2_back = bb_off, 0.0

    g_base = g_ee + g_be  # pair vectors whose i-side site is base_i
    g_back = g_eb + g_bb  # ... back_i
    d_com = -(g_base + g_back + g_st)
    d_a1 = (
        -(g_base * hb_off + g_back * a1_back + g_st * st_off)
        - a1_j * g_c1
        + u_ee * g_c3
        + vcross(u_st, u_bb) * g_p4
    )
    d_a2 = g_back * (-a2_back)
    d_a3 = a3_j * g_c4 + u_ee * g_c8 + u_st * g_c5

    return _reduce_row_fields(
        [
            d_com.x, d_com.y, d_com.z,
            d_a1.x, d_a1.y, d_a1.z,
            d_a2.x, d_a2.y, d_a2.z,
            d_a3.x, d_a3.y, d_a3.z,
        ],
        spec,
    )


def _make_kernel(body_fn, writes_rows: bool, spec: TileSpec):
    """Kernel over G row blocks (G/q panel groups) per grid step.

    Inputs: ids (G, cap) in SMEM, row blocks (G*B, F), the column source
    (resident (n_pad, F) array, or pre-gathered (G/q, F, M) panels), packed
    params (1, P), gt (1, 8) cotangents. Output: per-term sums (1, 8)
    accumulated across the grid, or (G*B, n_grad_fields) row gradients.
    """
    b_sz, q = spec.block_size, spec.q
    n_groups = spec.grid_g // q

    def kernel(ids_ref, rows_ref, col_ref, p_ref, gt_ref, out_ref, panel_scratch):
        step = pl.program_id(0)
        params = _unpack_params(p_ref, spec.params_treedef, spec.leaf_shapes)
        gt = gt_ref[0, :]

        if writes_rows:

            def body(g, carry):
                if spec.resident:
                    panel = _assemble_panel(ids_ref, g * q, col_ref, panel_scratch, spec)
                else:
                    panel = col_ref[g]
                rows_g = rows_ref[pl.ds(g * q * b_sz, q * b_sz), :]
                out_ref[pl.ds(g * q * b_sz, q * b_sz), :] = body_fn(
                    panel, rows_g, params, gt, spec
                )
                return carry

            jax.lax.fori_loop(0, n_groups, body, 0)
        else:

            def body(g, sums):
                if spec.resident:
                    panel = _assemble_panel(ids_ref, g * q, col_ref, panel_scratch, spec)
                else:
                    panel = col_ref[g]
                rows_g = rows_ref[pl.ds(g * q * b_sz, q * b_sz), :]
                return sums + body_fn(panel, rows_g, params, gt, spec)

            sums = jax.lax.fori_loop(
                0, n_groups, body, jnp.zeros((8,), jnp.float32)
            )

            @pl.when(step == 0)
            def _():
                out_ref[...] = jnp.zeros_like(out_ref)

            out_ref[0, :] += sums

    return kernel


def _pallas_args(rows_rf, params_vec, sym_ids, gt_pad, spec: TileSpec):
    """Common in_specs + inputs for both kernels."""
    b_sz, g_blocks, m, f = spec.block_size, spec.grid_g, spec.panel, spec.n_fields
    p = params_vec.shape[-1]
    in_specs = [
        pl.BlockSpec((g_blocks, spec.cap), lambda s: (s, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((g_blocks * b_sz, f), lambda s: (s, 0)),
    ]
    if spec.resident:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # whole array
        col_arg = rows_rf
    else:
        in_specs.append(pl.BlockSpec((g_blocks // spec.q, f, m), lambda s: (s, 0, 0)))
        col_arg = _gather_cols(rows_rf, sym_ids, spec)
    in_specs += [
        pl.BlockSpec((1, p), lambda s: (0, 0)),
        pl.BlockSpec((1, 8), lambda s: (0, 0)),
    ]
    args = (sym_ids, rows_rf, col_arg, params_vec, gt_pad)
    scratch = [pltpu.VMEM((m, f), jnp.float32)]
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


def _bwd_rows_impl(rows_rf, params_vec, sym_ids, gt, spec: TileSpec, forces_only: bool = False):
    """Row-side gradients (d sum(gt . energies) / d rows) via the Pallas
    backward kernel alone -- no forward pass, no parameter gradients. This
    is the whole force evaluation of the Langevin hot loop; ``forces_only``
    restricts the output to the body-dependent fields (com/frames)."""
    gt_pad = jnp.zeros((1, 8), jnp.float32).at[0, : _n_terms(spec)].set(gt)
    in_specs, args, scratch = _pallas_args(rows_rf, params_vec, sym_ids, gt_pad, spec)
    if forces_only:
        body, width = (
            _bwd_forces_analytic_body if ANALYTIC_FORCES else _bwd_forces_kernel_body
        ), (N_FORCE_FIELDS_DEBYE if spec.kind == "debye" else N_FORCE_FIELDS)
    else:
        body, width = _bwd_kernel_body, spec.n_grad_fields
    return pl.pallas_call(
        _make_kernel(body, writes_rows=True, spec=spec),
        out_shape=jax.ShapeDtypeStruct((spec.n_pad, width), jnp.float32),
        grid=(spec.nb_pad // spec.grid_g,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (spec.grid_g * spec.block_size, width), lambda s: (s, 0)
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
    """(nb_pad/q, F, M) column panels gathered in XLA (fallback + params
    path); q consecutive row blocks share one panel as lane groups.

    The gid field of invalid slots is overridden with _BIG so the masks drop
    them (the clamped gather pulls real rows whose gids would otherwise
    alias)."""
    nb, cap = sym_ids.shape
    b_sz, f = spec.block_size, spec.n_fields
    gid_off = spec.id_offsets[0]
    safe = jnp.minimum(sym_ids, spec.n_blocks - 1)
    rows_b = rows_rf.reshape(spec.nb_pad, b_sz, f)
    cols = rows_b[safe]  # (nb_pad, cap, B, F)
    invalid = (sym_ids >= spec.n_blocks)[:, :, None, None]
    gid_mask = jnp.arange(f)[None, None, None, :] == gid_off
    cols = jnp.where(invalid & gid_mask, _BIG, cols)
    return cols.reshape(nb // spec.q, spec.q * cap * b_sz, f).transpose(0, 2, 1)


def _params_grad_xla(rows_rf, params_vec, sym_ids, gt, spec: TileSpec):
    """dE/d(params vector) via XLA autodiff over the same tiles.

    The in-kernel parameter VJP transposes ~170 scalar reads into scalar
    accumulations, which Mosaic serializes pathologically (measured ~80x
    slower than this path). Parameter gradients are an O(P) reduction the
    XLA tile evaluation handles fine. Triangular mask: each unordered pair
    exactly once (a symmetric sum would mix theta2/theta3-type asymmetric
    pairs).
    """
    spec1 = spec._replace(q=1)  # per-row-block tiles; q-packing is a
    # kernel-side lane optimization with no effect on the parameter sums
    nb, b_sz = spec1.nb_pad, spec1.block_size
    rows_b = rows_rf.reshape(nb, b_sz, spec1.n_fields)
    cols = _gather_cols(rows_rf, sym_ids, spec1)

    def total(p_vec):
        params = _unpack_params(p_vec, spec1.params_treedef, spec1.leaf_shapes)

        def blk(rows_blk, cols_blk):
            rv = _Rows(rows_blk, spec1)
            mask = _tile_mask(rv, cols_blk, spec1, triangular=True)
            energies, _ = _tile_energies(rv, cols_blk, params, spec1)
            return jnp.stack([jnp.where(mask, e, 0.0).sum() for e in energies])

        sums = jax.vmap(blk)(rows_b, cols)
        return jnp.sum(gt[: _n_terms(spec1)] * jnp.sum(sums, axis=0))

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
    pad = jnp.zeros((rows_rf.shape[0], spec.n_fields - spec.n_grad_fields), rows_rf.dtype)
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
        if "p3_x" in kw:
            # rna2: backbone offset spans (a1, a3); stack/base along a1
            return (
                "rna2",
                (
                    float(kw["com_to_backbone_x"]),
                    float(kw["com_to_backbone_y"]),  # a3 coefficient
                    float(kw["com_to_hb"]),
                    float(kw["com_to_stacking"]),
                ),
            )
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


def back_axes(geometry) -> tuple[float, float, float]:
    """(a1, a2, a3) coefficients of the backbone-site offset per variant."""
    variant, offs = geometry
    if variant == "dna2":
        return float(offs[0]), float(offs[1]), 0.0
    if variant == "rna2":
        return float(offs[0]), 0.0, float(offs[1])
    return float(offs[0]), 0.0, 0.0


def _pick_q(cap: int, block_size: int) -> tuple[int, int]:
    """(q, padded cap): the largest row-block packing with S = 128/(B*q)
    slots per block still >= cap, so panels stay exactly one vreg wide.
    Falls back to q=1 with cap padded to a multiple of the 128-lane quantum
    when cap alone exceeds it."""
    for q in (16, 8, 4, 2):
        if block_size * q > 128:
            continue
        s = 128 // (block_size * q)
        if s * block_size * q == 128 and s >= cap:
            return q, s
    cap_pad = cap
    while (cap_pad * block_size) % 128:
        cap_pad += 1
    return 1, cap_pad


def _pick_grid_g(nb: int, block_size: int, q: int = 1) -> tuple[int, int]:
    """(grid_g, nb_pad): amortize per-grid-step costs over ~64 row blocks.

    grid_g is a multiple of q (whole panel groups per grid step). Always
    pads at least one block past nb: the kernel's panel assembly clamps
    invalid slot ids onto the first pad block (whose gid field is poisoned)
    instead of branching per slot."""
    if nb <= max(1, 512 // block_size):
        # single grid step: keep block shape == array shape (Mosaic's
        # divisibility exemption) by growing the step with the pad block
        g = nb_pad = -(-(nb + 1) // q) * q
        return g, nb_pad
    g = max(q, (max(1, 512 // block_size) // q) * q)
    nb_pad = -(-nb // g) * g
    if nb_pad == nb:
        nb_pad += g
    return g, nb_pad


class TileContext(NamedTuple):
    """Loop-invariant inputs of the fused kernels, prepared once per run.

    XLA does not hoist code out of while-loop bodies and its constant
    folding is budget-limited, so parameter packing, the bonded-partner
    table, one-hot/hb-weight fields and padding (~500 us of tiny ops at 10k
    nt) must be computed OUTSIDE the stepping scan and flow in as
    loop-invariant values. ``dynamic_rows`` then assembles the per-step
    (n_pad, F) rows array from the body state + ``static_tail``.
    """

    spec: TileSpec
    params_vec: Arr  # (1, P) packed term parameters
    static_tail: Arr  # (n_pad, F - n_dynamic) body-independent fields
    unbonded: tuple  # ((composed index, term), ...)
    perm_t: tuple | None  # perm as a hashable tuple (None = identity)
    inv_t: tuple | None
    perm_kind: str | None = None  # "interleave2" (vector ops) | "generic"

    def apply_perm(self, c):
        if self.perm_kind == "interleave2":
            return _interleave2(c)
        return _permute(c, self.perm_t, self.inv_t)


def prepare_tile_context(
    composed, sym_ids, block_size: int, kind: str = "full", perm=None,
    banded: bool = False,
) -> TileContext:
    """Build the loop-invariant TileContext for one block table.

    ``kind``: "full" evaluates every unbonded term over one table; "short"
    drops Debye (whose wide cutoff would otherwise inflate the table);
    "debye" packs the slim Debye-only layout for the wide table.

    ``perm`` (static (N,) int array, perm[slot] = original index) reorders
    nucleotides into a spatially coherent layout before blocking -- e.g.
    strand-interleaving a duplex halves block AABB extents, shrinking the
    table caps (simulators/neighbors.strand_interleave_perm). The sym_ids
    table must be built over the SAME permutation; gradients scatter back
    to the original order through the rows-build vjp automatically.
    """
    from mythos_tpu.energy import blocks

    if jax.config.jax_enable_x64:
        raise ValueError(ERR_X64)
    by_name = {type(fn).__name__: (i, fn) for i, fn in enumerate(composed.energy_fns)}
    order = _UNBONDED_ORDER
    if kind == "short":
        order = tuple(nm for nm in order if nm != "Debye")
    elif kind == "debye":
        order = ("Debye",)
    unbonded = tuple(by_name[nm] for nm in order if nm in by_name)
    terms = [fn for _, fn in unbonded]
    for fn in terms:
        if type(fn).__module__ not in _SUPPORTED_MODULES:
            raise ValueError(ERR_UNSUPPORTED_MODEL.format(type(fn).__module__))
    has_debye = kind != "short" and any(type(fn).__name__ == "Debye" for fn in terms)
    coax_variant = "dna1"
    for fn in terms:
        if type(fn).__name__ == "CoaxialStacking":
            coax_variant = "dna2" if type(fn).__module__.endswith("dna2.terms") else "dna1"

    # geometry offsets come from a term carrying the transform partial;
    # the Debye term has one too (it binds the same transform_soa_fn)
    first = terms[0]
    seq = jnp.asarray(first.seq)
    n = seq.shape[0]
    inv_perm = None
    if perm is not None:
        perm = np.asarray(perm)  # static: baked into the compiled gathers
        inv_perm = np.argsort(perm)
        seq = seq[perm]
    nb, cap = sym_ids.shape
    q, cap = _pick_q(cap, block_size)
    grid_g, nb_pad = _pick_grid_g(nb, block_size, q)
    n_pad = nb_pad * block_size

    params_vec, (treedef, leaf_shapes) = pack_params([fn.params for fn in terms])
    geometry = _geometry_of(first)
    pseq_flag = kind != "debye" and bool(
        next(
            (fn.params.pseq for fn in terms if type(fn).__name__ == "HydrogenBonding"),
            None,
        )
    )
    spec = TileSpec(
        block_size=block_size,
        cap=cap,
        n=n,
        n_blocks=nb,
        nb_pad=nb_pad,
        grid_g=grid_g,
        has_debye=has_debye,
        coax_variant=coax_variant,
        geometry=geometry,
        params_treedef=treedef,
        leaf_shapes=leaf_shapes,
        resident=n_pad <= _RESIDENT_MAX_ROWS,
        kind=kind,
        q=q,
        pseq=pseq_flag,
        banded=banded,
    )

    bonded = np.asarray(first.bonded_neighbors)
    if perm is not None and bonded.size:
        bonded = inv_perm[bonded]  # bonded pairs in permuted slots
    prev, nxt = blocks.bonded_partner_table(n_pad, bonded)
    gid = jnp.where(jnp.arange(n_pad) < n, jnp.arange(n_pad), _BIG).astype(jnp.float32)
    pad = n_pad - n

    def _qf_of(debye):
        is_end = jnp.asarray(debye.is_end)
        if perm is not None:
            is_end = is_end[perm]
        return jnp.where(
            jnp.asarray(debye.params.half_charged_ends, bool),
            jnp.where(is_end.astype(bool), 0.5, 1.0),
            1.0,
        ) * jnp.ones((n,), jnp.float32)

    if kind == "debye":
        tail = [jnp.pad(_qf_of(terms[0]), (0, pad))]
        tail += [prev.astype(jnp.float32), nxt.astype(jnp.float32), gid]
        tail += [jnp.zeros((n_pad,), jnp.float32)] * (N_FIELDS_DEBYE - 3 - len(tail))
    else:
        hw, oh, corr, partner, qf = pair_static_fields(
            terms, seq, perm, inv_perm, pseq_flag, has_debye
        )
        cols = [hw[:, k] for k in range(4)] + [oh[:, k] for k in range(4)]
        cols += [corr, qf, partner]
        tail = [jnp.pad(c.astype(jnp.float32), (0, pad)) for c in cols]
        # padded rows: partner -1 never matches a real column gid
        tail[-1] = jnp.pad(partner.astype(jnp.float32), (0, pad), constant_values=-1.0)
        tail += [prev.astype(jnp.float32), nxt.astype(jnp.float32), gid]

    perm_kind = None
    if perm is not None:
        perm_kind = "interleave2" if _is_interleave2(perm) else "generic"
    return TileContext(
        spec=spec,
        params_vec=params_vec,
        static_tail=jnp.stack(tail, axis=-1),
        unbonded=unbonded,
        perm_t=None if perm is None else tuple(perm.tolist()),
        inv_t=None if perm is None else tuple(inv_perm.tolist()),
        perm_kind=perm_kind,
    )


def pair_static_fields(terms, seq, perm, inv_perm, pseq_flag: bool, has_debye: bool):
    """Static per-slot pair fields shared by the tile and stencil paths.

    Returns (hw (n, 4), oh (n, 4), corr (n,), partner (n,), qf (n,)) in SLOT
    order (``seq`` must already be permuted; the pseq tables are permuted
    here). hw/oh are the left/right factors of the hydrogen-bonding weight
    bilinear form (one_hot @ table / one_hot, or the sequence-distribution
    marginal factors under pseq), corr/partner the partner-sparse pseq
    same-base-pair correction, qf the Debye end-charge factor.
    """
    n = seq.shape[0]
    hb = next(fn for fn in terms if type(fn).__name__ == "HydrogenBonding")
    if pseq_flag:
        # marginal factors of the expected weight table: hw/oh become
        # left/right (identical bilinear form), plus the partner-sparse
        # same-base-pair correction fields
        from mythos_tpu.energy import seqdep

        sc = hb.params.pseq_constraints
        marg = seqdep.nucleotide_marginals(hb.params.pseq, sc)
        hw_full = jnp.matmul(
            marg,
            hb.params.eps_hb_weights.astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
        )
        _, _, partner_j, corr_full = seqdep.factorized_weights(
            hb.params.pseq, hb.params.eps_hb_weights, sc, marginals=marg
        )
        partner_np = np.asarray(partner_j)  # static (from sc.bps)
        if perm is not None:
            hw = hw_full[perm]
            oh = marg[perm]
            corr = corr_full[perm]
            partner_np = inv_perm[partner_np[perm]]
        else:
            hw, oh, corr = hw_full, marg, corr_full
        partner = jnp.asarray(partner_np, jnp.float32)
    else:
        oh = jax.nn.one_hot(seq, 4, dtype=jnp.float32)
        hw = jnp.dot(
            oh,
            hb.params.eps_hb_weights.astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
        )
        corr = jnp.zeros((n,), jnp.float32)
        partner = jnp.full((n,), -1.0, jnp.float32)
    if has_debye:
        debye = next(fn for fn in terms if type(fn).__name__ == "Debye")
        is_end = jnp.asarray(debye.is_end)
        if perm is not None:
            is_end = is_end[perm]
        qf = jnp.where(
            jnp.asarray(debye.params.half_charged_ends, bool),
            jnp.where(is_end.astype(bool), 0.5, 1.0),
            1.0,
        ) * jnp.ones((n,), jnp.float32)
    else:
        qf = jnp.ones((n,), jnp.float32)
    return hw, oh, corr, partner, qf


def pad_ids(spec: TileSpec, sym_ids: Arr) -> Arr:
    """Pad a raw (n_blocks, capacity) table to the spec's (nb_pad, cap)."""
    nb, cap = sym_ids.shape
    if cap == spec.cap and nb == spec.nb_pad:
        return sym_ids
    return jnp.pad(
        sym_ids,
        ((0, spec.nb_pad - nb), (0, spec.cap - cap)),
        constant_values=spec.n_blocks,
    )


def dynamic_rows(ctx: TileContext, body_soa) -> Arr:
    """Per-step (n_pad, F) rows array: body-dependent fields + static tail."""
    from mythos_tpu.soa import quat_frame_soa

    spec = ctx.spec
    pad = spec.n_pad - spec.n
    com = body_soa.center
    quat = body_soa.orientation
    if ctx.perm_t is not None:
        # permute state components before deriving frames (7 arrays, not
        # 12); apply_perm keeps both directions on the vector unit
        com = Vec3(*(ctx.apply_perm(c) for c in com))
        quat = type(quat)(*(ctx.apply_perm(c) for c in quat))
    a1, a2, a3 = quat_frame_soa(quat)

    if spec.kind == "debye":
        variant, offs = spec.geometry
        if variant == "dna2":
            bx, by = offs[0], offs[1]
            back = Vec3(
                com.x + bx * a1.x + by * a2.x,
                com.y + bx * a1.y + by * a2.y,
                com.z + bx * a1.z + by * a2.z,
            )
        else:
            bb = offs[0]
            back = Vec3(com.x + bb * a1.x, com.y + bb * a1.y, com.z + bb * a1.z)
        dyn = [back.x, back.y, back.z]
    else:
        dyn = [com.x, com.y, com.z,
               a1.x, a1.y, a1.z, a2.x, a2.y, a2.z, a3.x, a3.y, a3.z]
    dyn_stack = jnp.stack([jnp.pad(c.astype(jnp.float32), (0, pad)) for c in dyn], axis=-1)
    return jnp.concatenate([dyn_stack, ctx.static_tail], axis=1)


def build_tile_inputs(
    composed, body_soa, sym_ids, block_size: int, kind: str = "full", perm=None
):
    """(rows_rf, params_vec, sym_ids_padded, spec, unbonded) for the fused
    kernels; one-shot wrapper over prepare_tile_context/dynamic_rows (hot
    loops should prepare once and call dynamic_rows per step instead)."""
    ctx = prepare_tile_context(composed, sym_ids, block_size, kind, perm)
    rows_rf = dynamic_rows(ctx, body_soa)
    return rows_rf, ctx.params_vec, pad_ids(ctx.spec, sym_ids), ctx.spec, ctx.unbonded


def prepare_contexts(
    composed, sym_ids, block_size: int, perm=None, banded: bool = False
) -> tuple:
    """TileContexts for one table ("full") or a (tight, wide) pair
    ("short" + "debye"). Call ONCE per run, outside any stepping scan."""
    if isinstance(sym_ids, (tuple, list)):
        return (
            prepare_tile_context(composed, sym_ids[0], block_size, "short", perm, banded),
            prepare_tile_context(composed, sym_ids[1], block_size, "debye", perm, banded),
        )
    return (prepare_tile_context(composed, sym_ids, block_size, "full", perm, banded),)


def _as_tables(sym_ids) -> tuple:
    return tuple(sym_ids) if isinstance(sym_ids, (tuple, list)) else (sym_ids,)


def fused_energy_ctx(composed, ctxs: tuple, body_soa, sym_ids):
    """Total SoA energy from prepared contexts (the hot-loop entry).

    ``composed`` must already carry updated params (with_params applied).
    Bonded terms evaluate on the (cheap) XLA shift path; the unbonded group
    runs through :func:`unbonded_tile_energies`. Weighted like
    ``ComposedEnergyFunction.__call__``.
    """
    per_term: list = []
    unbonded: tuple = ()
    for ctx, ids in zip(ctxs, _as_tables(sym_ids), strict=True):
        rows = dynamic_rows(ctx, body_soa)
        per_term += list(
            unbonded_tile_energies(rows, ctx.params_vec, pad_ids(ctx.spec, ids), ctx.spec)
        )
        unbonded = unbonded + ctx.unbonded

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


def fused_energy_soa(
    composed, body_soa, sym_ids, block_size: int, perm=None, banded: bool = False
):
    """One-shot wrapper: prepare contexts + fused_energy_ctx.

    ``sym_ids`` may be one symmetric block table, or a (tight, wide) pair
    from a two-level neighbor list: the short-cutoff terms then run on the
    tight table and Debye alone on the wide one (its ~3x larger cutoff
    would otherwise size the whole table). Hot loops should call
    :func:`prepare_contexts` once and :func:`fused_energy_ctx` per step --
    XLA re-executes the loop-invariant preparation on every iteration
    otherwise (no hoisting out of while-loop bodies).
    """
    return fused_energy_ctx(
        composed,
        prepare_contexts(composed, sym_ids, block_size, perm, banded),
        body_soa,
        sym_ids,
    )


def fused_grads_ctx(composed, ctxs: tuple, body_soa, sym_ids):
    """d(total SoA energy)/d(body) from prepared contexts (hot-loop entry).

    ``jax.grad(fused_energy_ctx)`` pays the forward Pallas kernel (the
    custom-vjp primal) only to discard its value; the Langevin hot loop
    consumes forces alone. This runs the backward rows kernel directly with
    the term weights as cotangents and transposes the row-field packing back
    to the body via one XLA vjp, roughly halving the per-step kernel cost.
    Returns a BodySoA-shaped cotangent (same pytree as
    ``jax.grad(fused_energy_ctx)(body_soa)``).
    """
    w = composed.weights

    def _gt_of(unb):
        return jnp.stack(
            [jnp.asarray(1.0 if w is None else w[i], jnp.float32) for i, _ in unb]
        )

    tables = _as_tables(sym_ids)

    def rows_of(body):
        return tuple(dynamic_rows(ctx, body) for ctx in ctxs)

    rows_all, vjp_fn = jax.vjp(rows_of, body_soa)
    cots = []
    unbonded: tuple = ()
    for ctx, ids, rows in zip(ctxs, tables, rows_all, strict=True):
        spec = ctx.spec
        g_rows = _bwd_rows_impl(
            rows, ctx.params_vec, pad_ids(spec, ids), _gt_of(ctx.unbonded), spec,
            forces_only=True,
        )
        pad = jnp.zeros((rows.shape[0], spec.n_fields - g_rows.shape[1]), rows.dtype)
        cots.append(jnp.concatenate([g_rows, pad], axis=1))
        unbonded = unbonded + ctx.unbonded
    (g_body,) = vjp_fn(tuple(cots))

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


def fused_grads_soa(
    composed, body_soa, sym_ids, block_size: int, perm=None, banded: bool = False
):
    """One-shot wrapper: prepare contexts + fused_grads_ctx (see
    fused_energy_soa for why hot loops must prepare once instead)."""
    return fused_grads_ctx(
        composed,
        prepare_contexts(composed, sym_ids, block_size, perm, banded),
        body_soa,
        sym_ids,
    )
