"""Fixed-shape neighbor lists for TPU scan loops.

Replaces jax-md's ``partition.neighbor_list`` (used with
``disable_cell_list=True`` and reallocation-on-overflow at
mythos/simulators/jax_md/utils.py:70-126 in the reference). Reallocation
changes array shapes, which would force XLA recompilation inside the hot
loop; here capacity is fixed up front and overflow is *detected* (a flag the
host can check) instead of reallocated.

Two implementations:

* :class:`NoNeighborList` -- static precomputed pair list (small systems).
* :class:`FixedCapacityNeighborList` -- distance-culled pair list of fixed
  capacity rebuilt functionally from an O(N^2) distance matrix with a
  TPU-friendly top-k-free compaction (argsort over the mask). Suitable up to
  ~20k nucleotides.

Scaling limits (measured, benchmarks/RESULTS.md): the block AABB rebuild is
a dense (n_blocks, n_blocks) pass -- fine through ~50k nucleotides (a 6.2k^2
f32 tile at block_size=8), quadratic beyond. There is NO cell-list builder
yet; systems past ~100k nucleotides need one (hierarchical block AABB or a
binned Pallas build) before the rebuild dominates stepping.

Convention: pair lists are (2, capacity) index arrays padded with N; energy
terms mask padded entries via ``op_i < N``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Protocol

import chex
import jax
import jax.numpy as jnp
import numpy as np

from mythos_tpu.utils.types import Arr


class NeighborHelper(Protocol):
    """Interface shared by the neighbor-list strategies."""

    @property
    def idx(self) -> Arr:
        """(2, P) unbonded pair indices, padded with N."""
        ...

    def allocate(self, centers: Arr) -> "NeighborHelper":
        """Build the list for the given positions."""
        ...

    def update(self, centers: Arr) -> "NeighborHelper":
        """Rebuild the list functionally (jit-safe, fixed shapes)."""
        ...


@chex.dataclass
class NoNeighborList:
    """All unbonded pairs, statically precomputed (exact, O(N^2) memory)."""

    unbonded_nbrs: Arr  # (U, 2) or (2, U)

    @property
    def idx(self) -> Arr:
        nbrs = jnp.asarray(self.unbonded_nbrs)
        return nbrs if nbrs.shape[0] == 2 else nbrs.T

    def allocate(self, centers: Arr) -> "NoNeighborList":
        return self

    def update(self, centers: Arr) -> "NoNeighborList":
        return self


def bonded_exclusion_mask(n: int, bonded_neighbors: np.ndarray) -> np.ndarray:
    """(N, N) boolean mask of excluded (self + bonded) pairs."""
    mask = np.eye(n, dtype=bool)
    for i, j in np.asarray(bonded_neighbors):
        mask[i, j] = mask[j, i] = True
    return mask


def dense_pair_mask(topology) -> np.ndarray:
    """(N, N) upper-triangular unbonded-pair mask for the dense energy path."""
    n = topology.n_nucleotides
    excluded = bonded_exclusion_mask(n, topology.bonded_neighbors)
    return np.triu(~excluded, k=1)


@chex.dataclass
class DensePairs:
    """Neighbor strategy marker for the dense (N, N) energy path.

    The energy terms carry the (constant) dense mask themselves; there is
    nothing to rebuild, and the simulator skips neighbor plumbing entirely.
    """

    @property
    def idx(self) -> None:
        return None

    def allocate(self, centers: Arr) -> "DensePairs":
        return self

    def update(self, centers: Arr) -> "DensePairs":
        return self


@chex.dataclass
class FixedCapacityNeighborList:
    """Distance-culled unbonded pairs with static capacity.

    The rebuild computes the (N, N) pair-distance matrix (upper triangle),
    masks bonded/self pairs, and compacts the hits into a (2, capacity)
    list via argsort on the miss flag -- fixed shapes, no host sync. The
    ``did_overflow`` flag records capacity overflow; results remain valid
    (energies of dropped pairs are lost) so the host should enlarge capacity.

    Attributes:
        displacement_fn: minimum-image displacement.
        exclusion_mask: (N, N) bool, True = never a neighbor.
        r_cutoff: include pairs with r < r_cutoff + dr_threshold.
        dr_threshold: skin distance (list stays valid while nothing moves
            more than dr_threshold / 2).
        capacity: max number of pairs kept.
    """

    displacement_fn: Callable
    exclusion_mask: Arr
    r_cutoff: float
    dr_threshold: float
    capacity: int
    idx_: Arr | None = None
    did_overflow: Arr | None = None

    @property
    def idx(self) -> Arr:
        return self.idx_

    def _build(self, centers: Arr, prev: Arr | None = None) -> tuple[Arr, Arr]:
        n = centers.shape[0]
        dr = self.displacement_fn(centers[:, None, :], centers[None, :, :])
        dist2 = jnp.sum(dr * dr, axis=-1)
        cut2 = (self.r_cutoff + self.dr_threshold) ** 2

        iu = jnp.triu_indices(n, k=1)
        d2u = dist2[iu]
        hit = (d2u < cut2) & ~jnp.asarray(self.exclusion_mask)[iu]

        # distance-prioritized compaction: the dropped pairs (if any) are the
        # farthest — skin-zone pairs not interacting yet. Overflow is flagged
        # only when pairs inside the BARE cutoff don't fit, or (given the
        # previous list) when a pair interacting NOW was absent from it — the
        # exact condition under which the last interval's forces were wrong.
        order = jnp.argsort(jnp.where(hit, d2u, jnp.inf))[: self.capacity]
        valid = hit[order]
        pair_i = jnp.where(valid, iu[0][order], n)
        pair_j = jnp.where(valid, iu[1][order], n)
        hard = (d2u < self.r_cutoff * self.r_cutoff) & ~jnp.asarray(self.exclusion_mask)[iu]
        overflow = jnp.sum(hard) > self.capacity
        if prev is not None:
            member = (
                jnp.zeros((n + 1, n + 1), jnp.bool_)
                .at[prev[0], prev[1]]
                .set(True)[:n, :n]
            )
            overflow = overflow | jnp.any(hard & ~member[iu])
        return jnp.stack([pair_i, pair_j]), overflow

    def build(self, centers: Arr, prev: Arr | None = None, orientation=None) -> tuple[Arr, Arr]:
        """Alias used by the simulator's carry-only-arrays scan path."""
        return self._build(centers, prev=prev)

    def allocate(self, centers: Arr) -> "FixedCapacityNeighborList":
        idx, overflow = self._build(centers)
        return self.replace(idx_=idx, did_overflow=overflow)

    def update(self, centers: Arr) -> "FixedCapacityNeighborList":
        idx, overflow = self._build(centers, prev=self.idx_)
        return self.replace(idx_=idx, did_overflow=self.did_overflow | overflow)


@chex.dataclass
class BlockNeighborList:
    """Block-level neighbor table for the block-sparse tile path.

    Particles are grouped into index blocks of ``block_size``; for each row
    block the table keeps up to ``capacity`` interacting column blocks
    (b >= a, padded with n_blocks). A block pair is active when the distance
    between the blocks' axis-aligned bounding boxes is below
    ``r_cutoff + dr_threshold``. All arithmetic stays dense (B, B) tiles --
    see mythos_tpu.energy.blocks for why per-pair gathers lose on TPU.

    The integrator carries only ``block_ids``/``did_overflow`` (arrays);
    block_size/capacity are static Python ints baked into the compiled step.
    """

    displacement_fn: Callable
    block_size: int
    capacity: int
    r_cutoff: float
    dr_threshold: float
    n: int
    #: list every pair from both sides (b < a too). The Pallas fused-force
    #: kernels need this: row-side-only gradients over a symmetric table
    #: equal the full per-row force (ops/oxdna_tiles.py).
    symmetric: bool = False
    #: two-level mode: when set, ``build`` returns a (tight, wide) pair of
    #: tables compacted from the same AABB pass -- the tight one thresholds
    #: at r_cutoff_inner (the short-range terms' max cutoff), the wide one
    #: at r_cutoff (Debye). The fused kernels run the expensive terms on the
    #: tight table only (ops/oxdna_tiles.fused_energy_soa).
    r_cutoff_inner: float | None = None
    capacity_inner: int = 0
    #: static spatial reordering: perm[slot] = original index. Blocks are
    #: formed over the PERMUTED layout (see strand_interleave_perm); the
    #: fused kernels must receive the same perm (ops/oxdna_tiles).
    perm: Arr | None = None
    #: banded compaction: each row's ``capacity`` slots are CONSECUTIVE
    #: block ids (a contiguous window covering all hits). The fused kernels
    #: then assemble each panel lane group with one contiguous slice instead
    #: of ``capacity`` scattered ones (ops/oxdna_tiles TileSpec.banded).
    #: Within-window non-hits are included and contribute exactly zero (all
    #: potentials vanish beyond their cutoffs); hits outside the window
    #: raise the overflow flag. Only meaningful with ``symmetric=True``.
    banded: bool = False
    #: two-level (cell-list) rebuild: > 0 groups this many blocks per
    #: superblock and replaces the dense O(n_blocks^2) AABB pass with a
    #: super-level candidate window refined per row (_ids_hierarchical).
    #: Requires banded symmetric mode; super_capacity is the consecutive
    #: superblock window size (sized by the builder from init positions).
    super_group: int = 0
    super_capacity: int = 0
    block_ids_: Arr | None = None
    did_overflow: Arr | None = None

    @property
    def idx(self) -> Arr:
        return self.block_ids_

    @property
    def n_blocks(self) -> int:
        return -(-self.n // self.block_size)

    def _block_aabbs(self, x: Arr, y: Arr, z: Arr):
        """(lo, hi): per-component (nb,) AABB bounds of each index block."""
        nb, b_sz = self.n_blocks, self.block_size
        n_pad = nb * b_sz
        row_valid = (jnp.arange(n_pad) < self.n).reshape(nb, b_sz)
        big = jnp.asarray(jnp.finfo(x.dtype).max, x.dtype)
        lo, hi = [], []
        for c in (x, y, z):
            pad = n_pad - c.shape[0]
            cb = (jnp.pad(c, (0, pad)) if pad else c).reshape(nb, b_sz)
            lo.append(jnp.min(jnp.where(row_valid, cb, big), axis=1))
            hi.append(jnp.max(jnp.where(row_valid, cb, -big), axis=1))
        return lo, hi

    def _ids_hierarchical(self, x: Arr, y: Arr, z: Arr, prev=None) -> tuple[Arr, Arr]:
        """Two-level (cell-list) banded build: O(nsb^2 + nb * M) instead of
        the dense O(nb^2) AABB pass.

        Level 1 groups ``super_group`` blocks into superblocks and finds a
        consecutive window of ``super_capacity`` candidate superblocks per
        super-row from the dense (nsb, nsb) super-AABB gaps. Level 2
        refines only those M = super_capacity * super_group candidate
        columns per row block (gathered AABB gaps) into the usual banded
        window. Exactness chain: the super AABB contains its member blocks,
        so a block pair inside the cutoff implies its super pair is too —
        any hard hit outside the candidates raises a super-level overflow,
        and within candidates the window/missed semantics match the dense
        banded path. Requires symmetric banded mode.
        """
        if not (self.banded and self.symmetric):
            raise ValueError("hierarchical build requires symmetric banded tables")
        nb, b_sz = self.n_blocks, self.block_size
        g = self.super_group
        nsb = -(-nb // g)
        lo, hi = self._block_aabbs(x, y, z)
        big = jnp.asarray(jnp.finfo(x.dtype).max, x.dtype)

        def supered(v, reduce_min):
            pad = nsb * g - nb
            fill = big if reduce_min else -big
            vp = jnp.pad(v, (0, pad), constant_values=fill) if pad else v
            vs = vp.reshape(nsb, g)
            return jnp.min(vs, axis=1) if reduce_min else jnp.max(vs, axis=1)

        sdist2 = 0.0
        for k in range(3):
            slo = supered(lo[k], True)
            shi = supered(hi[k], False)
            gap = jnp.maximum(
                jnp.maximum(slo[:, None] - shi[None, :], slo[None, :] - shi[:, None]),
                0.0,
            )
            sdist2 = sdist2 + gap * gap

        scol = jnp.arange(nsb, dtype=jnp.int32)
        cut_wide = self.r_cutoff + self.dr_threshold
        s_hit = sdist2 < cut_wide * cut_wide
        s_cap = self.super_capacity
        sstart = jnp.min(jnp.where(s_hit, scol[None, :], nsb), axis=1)
        sstart = jnp.clip(sstart, 0, max(0, nsb - s_cap)).astype(jnp.int32)
        # hard hit outside the super window -> candidates missed a pair
        s_hard = sdist2 < self.r_cutoff * self.r_cutoff
        s_out = (scol[None, :] < sstart[:, None]) | (
            scol[None, :] >= sstart[:, None] + s_cap
        )
        overflow = jnp.any(s_hard & s_out)

        # level 2: refine the M candidate columns per row block
        m = s_cap * g
        row = jnp.arange(nb, dtype=jnp.int32)
        cand = sstart[row // g][:, None] * g + jnp.arange(m, dtype=jnp.int32)[None, :]
        cand_c = jnp.minimum(cand, nb - 1)  # clamp gathers; masked below
        cdist2 = 0.0
        for k in range(3):
            clo = lo[k][cand_c]
            chi = hi[k][cand_c]
            gap = jnp.maximum(
                jnp.maximum(lo[k][:, None] - chi, clo - hi[k][:, None]), 0.0
            )
            cdist2 = cdist2 + gap * gap
        valid = cand < nb
        col_ids = jnp.where(valid, cand, nb)

        def window(cut_bare: float, capacity: int):
            cut = cut_bare + self.dr_threshold
            hit = valid & (cdist2 < cut * cut)
            start = jnp.min(jnp.where(hit, col_ids, nb), axis=1)
            start = jnp.clip(start, 0, max(0, nb - capacity)).astype(jnp.int32)
            ids = start[:, None] + jnp.arange(capacity, dtype=jnp.int32)[None, :]
            hard = valid & (cdist2 < cut_bare * cut_bare)
            outside = (col_ids < start[:, None]) | (col_ids >= start[:, None] + capacity)
            ovf = jnp.any(hard & outside)
            return ids, hard, ovf

        def missed(prev_ids: Arr, hard: Arr) -> Arr:
            # prev windows are consecutive: membership is interval arithmetic
            p_start = prev_ids[:, 0][:, None]
            p_end = p_start + prev_ids.shape[1]
            inside_prev = (col_ids >= p_start) & (col_ids < p_end)
            return jnp.any(hard & ~inside_prev)

        ids, hard, ovf = window(self.r_cutoff, self.capacity)
        overflow = overflow | ovf
        if self.r_cutoff_inner is None:
            if prev is not None:
                overflow = overflow | missed(prev, hard)
            return ids, overflow
        ids_in, hard_in, ovf_in = window(self.r_cutoff_inner, self.capacity_inner)
        overflow = overflow | ovf_in
        if prev is not None:
            prev_in, prev_wide = prev
            overflow = overflow | missed(prev_in, hard_in)
            overflow = overflow | missed(prev_wide, hard)
        return (ids_in, ids), overflow

    def _ids_from_components(
        self, x: Arr, y: Arr, z: Arr, prev=None
    ) -> tuple[Arr, Arr]:
        """Shared AABB + compaction given (N,) position components.

        ``prev`` (the table(s) from the previous rebuild, same structure as
        the return value) switches on the missed-interaction detector: the
        overflow flag is raised when a block pair is inside the *bare*
        cutoff now but was absent from the previous table — the exact
        condition under which forces were wrong during the last interval.
        """
        if self.super_group > 0:
            return self._ids_hierarchical(x, y, z, prev=prev)
        nb, b_sz = self.n_blocks, self.block_size
        n_pad = nb * b_sz

        def blocked(c: Arr) -> Arr:
            pad = n_pad - c.shape[0]
            c = jnp.pad(c, (0, pad)) if pad else c
            return c.reshape(nb, b_sz)

        row_valid = (jnp.arange(n_pad) < self.n).reshape(nb, b_sz)
        big = jnp.asarray(jnp.finfo(x.dtype).max, x.dtype)

        dist2 = 0.0
        for c in (x, y, z):
            cb = blocked(c)
            lo = jnp.min(jnp.where(row_valid, cb, big), axis=1)  # (nb,)
            hi = jnp.max(jnp.where(row_valid, cb, -big), axis=1)
            gap = jnp.maximum(
                jnp.maximum(lo[:, None] - hi[None, :], lo[None, :] - hi[:, None]), 0.0
            )
            dist2 = dist2 + gap * gap

        col = jnp.arange(nb, dtype=jnp.int32)

        def tri(hit: Arr) -> Arr:
            if not self.symmetric:
                return hit & (col[None, :] >= col[:, None])  # b >= a only
            return hit

        def compact_banded(cut_bare: float, capacity: int) -> tuple[Arr, Arr]:
            cut = cut_bare + self.dr_threshold
            hit = tri(dist2 < cut * cut)
            # window start: first hit, clamped so [start, start+cap) stays
            # in range; span-overflow = any bare-cutoff hit outside the
            # window (skin-zone drops are validated by the missed-interaction
            # detector, as in the scattered path)
            start = jnp.min(jnp.where(hit, col[None, :], nb), axis=1)
            start = jnp.clip(start, 0, max(0, nb - capacity)).astype(jnp.int32)
            ids = start[:, None] + jnp.arange(capacity, dtype=jnp.int32)[None, :]
            hard = tri(dist2 < cut_bare * cut_bare)
            outside = (col[None, :] < start[:, None]) | (
                col[None, :] >= start[:, None] + capacity
            )
            overflow = jnp.any(hard & outside)
            return ids, overflow

        def compact(cut_bare: float, capacity: int) -> tuple[Arr, Arr]:
            if self.banded:
                return compact_banded(cut_bare, capacity)
            cut = cut_bare + self.dr_threshold
            hit = tri(dist2 < cut * cut)
            # distance-prioritized compaction: when a row holds more hits
            # than capacity, the FARTHEST blocks (the skin-zone ones) are the
            # ones dropped. Overflow is then only flagged when blocks inside
            # the BARE cutoff don't fit — a pair actually interacting now —
            # while skin-zone drops are validated retroactively by the
            # missed-interaction detector below.
            score = jnp.where(hit, -dist2, -jnp.inf)
            k = min(capacity, nb)
            vals, idxs = jax.lax.top_k(score, k)
            ids = jnp.where(vals > -jnp.inf, idxs.astype(jnp.int32), nb)
            ids = jnp.sort(ids, axis=1)  # deterministic ascending-column layout
            if k < capacity:  # keep the advertised (nb, capacity) shape
                ids = jnp.pad(ids, ((0, 0), (0, capacity - k)), constant_values=nb)
            hard = tri(dist2 < cut_bare * cut_bare)
            overflow = jnp.any(jnp.sum(hard, axis=1) > capacity)
            return ids, overflow

        def missed(prev_ids: Arr, cut_bare: float) -> Arr:
            hit = tri(dist2 < cut_bare * cut_bare)
            member = (
                jnp.zeros((nb, nb + 1), jnp.bool_)
                .at[jnp.arange(nb)[:, None], prev_ids]
                .set(True)[:, :nb]
            )
            return jnp.any(hit & ~member)

        ids, overflow = compact(self.r_cutoff, self.capacity)
        if self.r_cutoff_inner is None:
            if prev is not None:
                overflow = overflow | missed(prev, self.r_cutoff)
            return ids, overflow
        ids_in, ovf_in = compact(self.r_cutoff_inner, self.capacity_inner)
        overflow = overflow | ovf_in
        if prev is not None:
            prev_in, prev_wide = prev
            overflow = overflow | missed(prev_in, self.r_cutoff_inner)
            overflow = overflow | missed(prev_wide, self.r_cutoff)
        return (ids_in, ids), overflow

    def _apply_perm(self, c: Arr) -> Arr:
        from mythos_tpu.ops.oxdna_tiles import _interleave2, _is_interleave2

        if _is_interleave2(np.asarray(self.perm)):
            return _interleave2(c)
        return c[jnp.asarray(self.perm)]

    def build_ids(self, centers: Arr, prev=None) -> tuple[Arr, Arr]:
        """(n_blocks, capacity) active column-block table + overflow flag."""
        if self.perm is not None:
            centers = jnp.stack([self._apply_perm(centers[:, k]) for k in range(3)], axis=-1)
        return self._ids_from_components(
            centers[:, 0], centers[:, 1], centers[:, 2], prev=prev
        )

    def build(self, centers, prev=None, orientation=None) -> tuple[Arr, Arr]:
        """Alias used by the simulator's scan path; accepts (N, 3) or Vec3.

        ``prev`` (the previous rebuild's table) arms the missed-interaction
        detector — the simulator threads it through the scan carry.
        ``orientation`` is accepted for interface parity with the site-mode
        StencilBand (block AABBs are COM-based).
        """
        if isinstance(centers, tuple):  # soa.Vec3 NamedTuple
            if self.perm is not None:
                centers = type(centers)(*(self._apply_perm(c) for c in centers))
            return self._ids_from_components(*centers, prev=prev)
        return self.build_ids(centers, prev=prev)

    def allocate(self, centers: Arr) -> "BlockNeighborList":
        ids, overflow = self.build_ids(centers)
        return self.replace(block_ids_=ids, did_overflow=overflow)

    def update(self, centers: Arr) -> "BlockNeighborList":
        ids, overflow = self.build_ids(centers, prev=self.block_ids_)
        return self.replace(
            block_ids_=ids,
            did_overflow=overflow if self.did_overflow is None else self.did_overflow | overflow,
        )


def strand_interleave_perm(topology) -> np.ndarray | None:
    """Static duplex-interleave permutation, or None when not applicable.

    For a two-strand topology whose strands pair antiparallel (the common
    duplex layout: partner of strand-A index i is index N-1-i), interleaving
    A_i with its partner makes index blocks spatially compact -- block AABB
    extents halve, which shrinks the neighbor-table capacity the fused
    kernels must process (ops/oxdna_tiles q-packing). Purely a layout
    optimization: energies/forces are permutation-invariant.
    """
    counts = getattr(topology, "strand_counts", None)
    if counts is None or len(counts) != 2 or counts[0] != counts[1]:
        return None
    n = int(sum(counts))
    perm = np.empty(n, dtype=np.int64)
    perm[0::2] = np.arange(n // 2)
    perm[1::2] = n - 1 - np.arange(n // 2)
    return perm


def _max_span(ids: np.ndarray, nblk: int) -> int:
    """Largest contiguous block-index span covering a row's hits (the
    banded-window size a row needs)."""
    valid = ids < nblk
    anyv = valid.any(axis=1)
    first = np.where(valid, ids, nblk).min(axis=1)
    last = np.where(valid, ids, -1).max(axis=1)
    return int(np.max(np.where(anyv, last - first + 1, 0)))


def _snap_capacity(hits: int, block_size: int, multiplier: float, symmetric: bool) -> int:
    """Capacity from an observed per-row hit count.

    The fused Pallas kernels pack q row blocks per 128-lane panel with
    S = 128/(B*q) column slots each (ops/oxdna_tiles._pick_q), so on the
    symmetric path capacity is snapped to the smallest slot quantum with at
    least one spare block of margin -- a smaller cap is padded back up to a
    quantum anyway, and a cap one quantum too large halves the kernel's
    packing. Overflow is detected at rebuild time either way.
    """
    if symmetric and 128 % block_size == 0:
        quanta = sorted(
            128 // (block_size * q)
            for q in (1, 2, 4, 8, 16)
            if block_size * q <= 128
        )
        for s in quanta:
            if s >= hits + 1:
                return s
    return max(2, int(np.ceil(hits * multiplier)))


def block_neighbor_list_for_topology(
    displacement_fn: Callable,
    topology,
    r_cutoff: float,
    dr_threshold: float = 0.5,
    block_size: int = 64,
    capacity: int | None = None,
    capacity_multiplier: float = 1.5,
    init_centers: Arr | None = None,
    symmetric: bool = False,
    r_cutoff_inner: float | None = None,
    perm: Arr | None = None,
    banded: bool | None = None,
    super_group: int | None = None,
) -> BlockNeighborList:
    """Build a BlockNeighborList sized from initial positions.

    ``r_cutoff_inner`` switches on the two-level mode: ``build`` then
    returns a (tight, wide) table pair and the fused kernels keep the
    expensive short-range terms off the wide (Debye-sized) table.
    ``perm`` applies a static spatial reordering before blocking (see
    strand_interleave_perm).

    ``banded=None`` auto-enables banded (consecutive-slot) tables on the
    symmetric path when the initial hits are contiguous enough that the
    window costs no extra capacity (spatially coherent layouts -- e.g. the
    duplex interleave -- make hits near-contiguous in block index).
    """
    n = topology.n_nucleotides
    # the block tile masks exclude bonded pairs via 3'/5' partner rows
    # (energy/blocks.bonded_partner_table), which encodes at most two bonds
    # per particle -- enough for any linear/circular nucleic topology.
    # Branched topologies (e.g. MARTINI lipids) would silently lose
    # exclusions, so refuse them here.
    bn = np.asarray(topology.bonded_neighbors)
    if bn.size:
        counts = np.bincount(bn.ravel(), minlength=n)
        if counts.max() > 2:
            raise ValueError(
                "block neighbor lists support at most 2 bonded partners per "
                f"particle (got {int(counts.max())}); branched topologies need "
                "the pair-list path"
            )
    nbl = BlockNeighborList(
        displacement_fn=displacement_fn,
        block_size=block_size,
        capacity=capacity or 0,
        r_cutoff=r_cutoff,
        dr_threshold=dr_threshold,
        n=n,
        symmetric=symmetric,
        r_cutoff_inner=r_cutoff_inner,
        capacity_inner=(capacity or 0) if r_cutoff_inner is not None else 0,
        perm=None if perm is None else np.asarray(perm),
    )
    if capacity is None:
        if init_centers is None:
            raise ValueError("capacity or init_centers must be provided")
        probe = nbl.replace(
            capacity=nbl.n_blocks, capacity_inner=nbl.n_blocks if r_cutoff_inner else 0
        )
        ids, _ = probe.build_ids(jnp.asarray(init_centers))
        ids_in = None
        if r_cutoff_inner is not None:
            ids_in, ids = ids
        hits = int(np.max(np.sum(np.asarray(ids) < probe.n_blocks, axis=1)))
        cap = min(probe.n_blocks, _snap_capacity(hits, block_size, capacity_multiplier, symmetric))
        span = _max_span(np.asarray(ids), probe.n_blocks)
        cap_band = min(
            probe.n_blocks, _snap_capacity(span, block_size, capacity_multiplier, symmetric)
        )
        use_banded = (
            symmetric
            and probe.n_blocks > cap_band
            and (banded if banded is not None else cap_band <= cap)
        )
        if use_banded:
            cap = cap_band
        cap_in = 0
        if ids_in is not None:
            if use_banded:
                n_in = _max_span(np.asarray(ids_in), probe.n_blocks)
            else:
                n_in = int(np.max(np.sum(np.asarray(ids_in) < probe.n_blocks, axis=1)))
            cap_in = min(
                probe.n_blocks, _snap_capacity(n_in, block_size, capacity_multiplier, symmetric)
            )
            if cap_in >= cap:
                # the tight table snapped to the same capacity as the wide
                # one: two kernels would just double the panel-assembly cost
                nbl = nbl.replace(r_cutoff_inner=None)
                cap_in = 0
        nbl = nbl.replace(capacity=cap, capacity_inner=cap_in, banded=use_banded)
    elif banded:
        if not symmetric:
            raise ValueError(
                "banded tables require symmetric=True: a triangular consumer "
                "would double-count the window's b < a slots"
            )
        nbl = nbl.replace(banded=True)

    # two-level (cell-list) rebuild: EXPLICIT OPT-IN ONLY. Measured on v5e
    # (benchmarks/RESULTS.md): the per-row candidate gathers are 37-65x
    # SLOWER than the dense AABB pass at 2.5k-6.25k blocks — dense (nb, nb)
    # elementwise work is what the TPU is good at (439-621 us), scattered
    # gathers are what it is bad at. The dense pass stays the default
    # through ~12.5k blocks (100k nt, ~2.5 ms/rebuild amortized over the
    # interval); beyond that a sort-based binning formulation is needed,
    # not this refine. Kept (with dense-parity tests) as the correctness
    # skeleton for that future build.
    if super_group is None:
        super_group = 0
    if super_group and nbl.banded and init_centers is not None:
        g = int(super_group)
        nbs = nbl.n_blocks
        nsb = -(-nbs // g)
        c = np.asarray(init_centers)
        if perm is not None:
            c = c[np.asarray(perm)]
        n_pad = nbs * block_size
        cp = np.pad(c, ((0, n_pad - len(c)), (0, 0)), constant_values=np.nan)
        cb = cp.reshape(nbs, block_size, 3)
        lo = np.nanmin(cb, axis=1)
        hi = np.nanmax(cb, axis=1)
        sp = nsb * g - nbs
        slo = np.pad(lo, ((0, sp), (0, 0)), constant_values=np.inf).reshape(nsb, g, 3).min(1)
        shi = np.pad(hi, ((0, sp), (0, 0)), constant_values=-np.inf).reshape(nsb, g, 3).max(1)
        gap = np.maximum(
            np.maximum(slo[:, None] - shi[None, :], slo[None, :] - shi[:, None]), 0.0
        )
        sd2 = (gap * gap).sum(-1)
        cutw = nbl.r_cutoff + nbl.dr_threshold
        hitm = sd2 < cutw * cutw
        sidx = np.arange(nsb)
        first = np.where(hitm.any(1), np.where(hitm, sidx[None, :], nsb).min(1), 0)
        last = np.where(hitm.any(1), np.where(hitm, sidx[None, :], -1).max(1), -1)
        span = int(np.max(np.where(hitm.any(1), last - first + 1, 1)))
        # +2 supers of margin; the window must also cover the block window
        s_cap = min(nsb, max(span + 2, -(-(nbl.capacity + 2) // g) + 1))
        nbl = nbl.replace(super_group=g, super_capacity=int(s_cap))
    return nbl.allocate(jnp.asarray(init_centers)) if init_centers is not None else nbl


@chex.dataclass
class StencilBand:
    """Static band validity for the stencil path (ops/stencil.py).

    The stencil kernels evaluate EVERY pair at slot offsets 1..w_wide each
    step, so there is no table to build; ``build`` only re-VALIDATES the
    band: the overflow flag is raised when a pair within the bare cutoff
    has slot distance beyond the band -- the condition under which the last
    interval's forces were wrong (a fold-back conformation).

    Two check modes:

    * **site mode** (``site_checks`` set): per-offset EXACT site-pair
      distances via rolls for slot offsets up to ``check_dm`` (no
      quantization, no false flags near the band edge), plus a site-union
      block-AABB sweep for far offsets (fold-back detection). Requires the
      orientation (sites derive from com + frame offsets).
    * **legacy COM mode**: block AABBs with COM-inflated cutoffs; the AABB
      gap lower-bounds pair distance and the block index distance UPPER-
      bounds slot distance. Near the band edge this double conservatism
      false-flags thermally equilibrated duplexes (observed at 10k nt /
      20k steps) — prefer site mode.
    """

    displacement_fn: Callable  # interface parity; the check is free-space
    n: int
    r_cutoff: float
    dr_threshold: float
    w_wide: int  # one-sided slot reach of the full band
    w_short: int  # reach of the full-physics (non-Debye) terms
    r_cutoff_inner: float | None = None
    check_block: int = 4
    perm: Arr | None = None
    did_overflow: Arr | None = None
    idx_: Arr | None = None
    #: per-term (exc, hb, cross, coax) one-sided reaches and their bare
    #: cutoffs: ((w, r_cutoff), ...) in ops.stencil._UNBONDED_ORDER. The
    #: kernel skips a term beyond its own reach; _check validates each
    #: level so a fold-back that crosses only a narrow term's band still
    #: raises the overflow flag.
    term_levels: tuple | None = None
    #: site mode (all-or-none): ordered ((name, (a1_coeff, a2_coeff)), ...)
    #: site definitions; ((fa, fb, bare_cutoff, d_lo, d_hi), ...) exact
    #: roll checks (require min cross-site distance >= cutoff for slot
    #: offsets d in (d_lo, d_hi]); exact-check extent; far-AABB cutoff; and
    #: the per-term (exc, hb, cross, coax) reaches for the kernel.
    site_geometry: tuple | None = None
    site_checks: tuple | None = None
    check_dm: int = 0
    far_cutoff: float = 0.0
    site_w_terms: tuple | None = None

    @property
    def w_terms(self) -> tuple | None:
        if self.site_w_terms is not None:
            return self.site_w_terms
        return None if self.term_levels is None else tuple(w for w, _ in self.term_levels)

    @property
    def idx(self) -> Arr:
        """Placeholder carried through the scan (the band is static)."""
        return self.idx_ if self.idx_ is not None else jnp.zeros((1,), jnp.int32)

    def _apply_perm(self, c: Arr) -> Arr:
        from mythos_tpu.ops.oxdna_tiles import _interleave2, _is_interleave2

        if _is_interleave2(np.asarray(self.perm)):
            return _interleave2(c)
        return c[jnp.asarray(self.perm)]

    def _check_site(self, comps, orientation, already_permuted: bool = False) -> Arr:
        """Exact per-offset site checks + far site-union AABB sweep."""
        import jax

        if isinstance(orientation, tuple):  # soa.Quat NamedTuple
            qc = tuple(orientation)
        else:
            qc = tuple(orientation[:, k] for k in range(4))
        if self.perm is not None and not already_permuted:
            qc = tuple(self._apply_perm(c) for c in qc)
        from mythos_tpu.soa import Quat, Vec3, quat_frame_soa

        com = Vec3(*comps)
        a1, a2, a3 = quat_frame_soa(Quat(*qc))
        sites = {
            name: com + cs[0] * a1 + cs[1] * a2 + cs[2] * a3
            for name, cs in ((nm, _site_coeffs(c)) for nm, c in self.site_geometry)
        }
        n = self.n
        dm = self.check_dm
        idx = jnp.arange(n)
        fams = sorted({(fa, fb) for fa, fb, _, _, _ in self.site_checks})

        # ONE packed roll per offset (site components ride together: C
        # separate (n,) rolls pay per-op relayout shuffles, the packed
        # (C, n) roll doesn't — same trick as ops.stencil._pack_rolled),
        # then every family distance reads the single rolled copy.
        names = sorted(sites)
        pk = jnp.stack([c for nm in names for c in sites[nm]])  # (3*|sites|, n)
        comp_of = {nm: 3 * k for k, nm in enumerate(names)}

        def fam_mins_all():
            tables = {f: [] for f in fams}
            for d in range(1, dm + 1):
                ok = idx + d < n
                rolled = jnp.roll(pk, -d, axis=1)
                for fa, fb in fams:
                    ia, ib = comp_of[fa], comp_of[fb]
                    d2 = sum(
                        (rolled[ib + k] - pk[ia + k]) ** 2 for k in range(3)
                    )
                    m = jnp.min(jnp.where(ok, d2, jnp.inf))
                    if fa != fb:
                        d2r = sum(
                            (rolled[ia + k] - pk[ib + k]) ** 2 for k in range(3)
                        )
                        m = jnp.minimum(m, jnp.min(jnp.where(ok, d2r, jnp.inf)))
                    tables[(fa, fb)].append(m)
            return {f: jnp.stack(v) for f, v in tables.items()}

        fam_tables = fam_mins_all()
        viol = jnp.asarray(False)
        for fa, fb, cutoff, d_lo, d_hi in self.site_checks:
            if d_hi <= d_lo:
                continue
            t = fam_tables[(fa, fb)][d_lo:d_hi]  # offsets d_lo+1 .. d_hi
            viol = viol | jnp.any(t < cutoff * cutoff)

        # far fold-back sweep: site-union block AABBs, bare max cutoff,
        # only block pairs whose slot distances can exceed check_dm
        b_sz = self.check_block
        nb = -(-n // b_sz)
        n_pad = nb * b_sz
        pad = n_pad - n
        row_valid = (jnp.arange(n_pad) < n).reshape(nb, b_sz)
        big = jnp.asarray(jnp.finfo(comps[0].dtype).max, comps[0].dtype)
        dist2 = 0.0
        for k in range(3):
            lo_c = hi_c = None
            for s in sites.values():
                c = s[k]
                if pad:
                    c = jnp.pad(c, (0, pad))
                cb = c.reshape(nb, b_sz)
                lo_k = jnp.min(jnp.where(row_valid, cb, big), axis=1)
                hi_k = jnp.max(jnp.where(row_valid, cb, -big), axis=1)
                lo_c = lo_k if lo_c is None else jnp.minimum(lo_c, lo_k)
                hi_c = hi_k if hi_c is None else jnp.maximum(hi_c, hi_k)
            gap = jnp.maximum(
                jnp.maximum(lo_c[:, None] - hi_c[None, :], lo_c[None, :] - hi_c[:, None]),
                0.0,
            )
            dist2 = dist2 + gap * gap
        col = jnp.arange(nb, dtype=jnp.int32)
        # blocks at index distance D contain pairs at slot distances in
        # [(D-1)*b_sz + 1, (D+1)*b_sz - 1], and a pair at slot distance s
        # can sit at index distance as low as floor(s/b_sz). Sizing sets
        # check_dm = k*b_sz - 1 (stencil_band_for_site_cutoffs), so the
        # sweep at D >= k = floor(check_dm/b_sz) + 1 covers every
        # s > check_dm (floor(s/b_sz) >= k) — zero gap — while its block
        # pairs contain only slot distances >= (k-1)*b_sz + 1 > every band
        # reach, so the conservative AABB gap cannot false-flag
        # band-covered equilibrium pairs (the r4 A-form regression; the
        # sweep start is the same block distance r4 shipped).
        delta_far = dm // b_sz + 1
        far = jnp.abs(col[:, None] - col[None, :]) >= delta_far
        viol = viol | jnp.any(far & (dist2 < self.far_cutoff * self.far_cutoff))
        return viol

    def _check(self, centers, orientation=None, already_permuted: bool = False) -> Arr:
        if isinstance(centers, tuple):  # soa.Vec3 NamedTuple
            comps = tuple(centers)
        else:
            comps = tuple(centers[:, k] for k in range(3))
        if self.perm is not None and not already_permuted:
            comps = tuple(self._apply_perm(c) for c in comps)
        if self.site_checks is not None:
            if orientation is None:
                raise ValueError(
                    "site-mode StencilBand validity needs the orientation "
                    "(sites derive from the body frame)"
                )
            return self._check_site(
                comps, orientation, already_permuted=already_permuted
            )
        b_sz = self.check_block
        nb = -(-self.n // b_sz)
        n_pad = nb * b_sz
        pad = n_pad - comps[0].shape[0]
        row_valid = (jnp.arange(n_pad) < self.n).reshape(nb, b_sz)
        big = jnp.asarray(jnp.finfo(comps[0].dtype).max, comps[0].dtype)
        dist2 = 0.0
        for c in comps:
            if pad:
                c = jnp.pad(c, (0, pad))
            cb = c.reshape(nb, b_sz)
            lo = jnp.min(jnp.where(row_valid, cb, big), axis=1)
            hi = jnp.max(jnp.where(row_valid, cb, -big), axis=1)
            gap = jnp.maximum(
                jnp.maximum(lo[:, None] - hi[None, :], lo[None, :] - hi[:, None]), 0.0
            )
            dist2 = dist2 + gap * gap
        col = jnp.arange(nb, dtype=jnp.int32)
        reach = jnp.abs(col[:, None] - col[None, :]) * b_sz + (b_sz - 1)
        viol = (dist2 < self.r_cutoff * self.r_cutoff) & (reach > self.w_wide)
        if self.r_cutoff_inner is not None:
            viol = viol | (
                (dist2 < self.r_cutoff_inner * self.r_cutoff_inner)
                & (reach > self.w_short)
            )
        if self.term_levels is not None:
            for w_t, r_t in self.term_levels:
                viol = viol | ((dist2 < r_t * r_t) & (reach > w_t))
        return jnp.any(viol)

    def far_check(self, centers, orientation, already_permuted: bool = False) -> Arr:
        """Far fold-back sweep ONLY (site-union AABB beyond check_dm).

        For callers that run the exact per-offset part elsewhere — the
        fused multi-step kernel computes it in-kernel over sublane rolls
        (ops.stencil MultiStepSpec.site_checks) where it is nearly free.
        """
        if self.site_checks is None:
            raise ValueError("far_check requires a site-mode StencilBand")
        sub = self.replace(site_checks=())
        return sub._check(
            centers, orientation=orientation, already_permuted=already_permuted
        )

    def build(
        self,
        centers: Arr,
        prev: Arr | None = None,
        orientation=None,
        already_permuted: bool = False,
    ) -> tuple[Arr, Arr]:
        return self.idx, self._check(
            centers, orientation=orientation, already_permuted=already_permuted
        )

    def allocate(self, centers: Arr, orientation=None) -> "StencilBand":
        # one jitted dispatch: eager op-by-op execution of the AABB check is
        # pathological on remote-tunnel backends
        return self.replace(
            idx_=jnp.zeros((1,), jnp.int32),
            did_overflow=jax.jit(self._check)(centers, orientation=orientation),
        )

    def update(self, centers: Arr, orientation=None) -> "StencilBand":
        return self.replace(
            did_overflow=self.did_overflow
            | jax.jit(self._check)(centers, orientation=orientation)
        )


def _band_reach(c: np.ndarray, cutoff: float, group: int = 64) -> int:
    """Max slot distance |i - j| over pairs within ``cutoff``.

    Two passes, exact: a coarse block-AABB sweep (O((N/group)^2), the AABB
    gap lower-bounds every member pair distance) bounds the largest
    interacting slot offset, then shifted-view scans refine only offsets up
    to that bound (O(N x bound)). The previous all-pairs chunked scan was
    O(N^2) in time AND allocated chunk x N temporaries — ~6 minutes of
    setup at 50k nt across the per-term calls."""
    c = np.asarray(c, np.float32)
    n = c.shape[0]
    if n < 2:
        return 0
    nb = -(-n // group)
    n_pad = nb * group
    cp = np.pad(c, ((0, n_pad - n), (0, 0)), constant_values=np.nan)
    cb = cp.reshape(nb, group, 3)
    lo = np.nanmin(cb, axis=1)  # (nb, 3)
    hi = np.nanmax(cb, axis=1)
    gap = np.maximum(
        np.maximum(lo[:, None, :] - hi[None, :, :], lo[None, :, :] - hi[:, None, :]),
        0.0,
    )
    dist2 = (gap * gap).sum(-1)
    bi = np.arange(nb)
    hit_b = dist2 < cutoff * cutoff
    if not hit_b.any():
        return 0
    bd = int(np.abs(bi[:, None] - bi[None, :])[hit_b].max())
    # blocks at index distance bd contain pairs at slot offsets in
    # ((bd-1)*group, (bd+1)*group); scan down from the upper bound
    hi_reach = min(n - 1, (bd + 1) * group - 1)
    for d in range(hi_reach, 0, -1):
        dd = c[d:] - c[:-d]
        if ((dd * dd).sum(-1) < cutoff * cutoff).any():
            return d
    return 0


def _band_reach2(ca: np.ndarray, cb: np.ndarray, cutoff: float, group: int = 64) -> int:
    """Max slot distance |i - j| over cross-site pairs (a_i, b_j) or
    (b_i, a_j) within ``cutoff`` (both directions; exact, AABB-bounded)."""
    ca = np.asarray(ca, np.float32)
    cb = np.asarray(cb, np.float32)
    n = ca.shape[0]
    if n < 2:
        return 0
    nb = -(-n // group)
    n_pad = nb * group

    def aabb(c):
        cp = np.pad(c, ((0, n_pad - n), (0, 0)), constant_values=np.nan)
        cbk = cp.reshape(nb, group, 3)
        return np.nanmin(cbk, axis=1), np.nanmax(cbk, axis=1)

    lo_a, hi_a = aabb(ca)
    lo_b, hi_b = aabb(cb)
    lo = np.minimum(lo_a, lo_b)
    hi = np.maximum(hi_a, hi_b)
    gap = np.maximum(
        np.maximum(lo[:, None, :] - hi[None, :, :], lo[None, :, :] - hi[:, None, :]), 0.0
    )
    dist2 = (gap * gap).sum(-1)
    bi = np.arange(nb)
    hit_b = dist2 < cutoff * cutoff
    if not hit_b.any():
        return 0
    bd = int(np.abs(bi[:, None] - bi[None, :])[hit_b].max())
    hi_reach = min(n - 1, (bd + 1) * group - 1)
    c2 = cutoff * cutoff
    for d in range(hi_reach, 0, -1):
        dd = cb[d:] - ca[:-d]
        if ((dd * dd).sum(-1) < c2).any():
            return d
        dd = ca[d:] - cb[:-d]
        if ((dd * dd).sum(-1) < c2).any():
            return d
    return 0


def _np_frames(quats: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(a1, a2, a3) rotation-matrix columns from (N, 4) quaternions (numpy;
    matches soa.quat_frame_soa)."""
    w, x, y, z = (quats[:, k] for k in range(4))
    a1 = np.stack(
        [w * w + x * x - y * y - z * z, 2 * (x * y + w * z), 2 * (x * z - w * y)], -1
    )
    a2 = np.stack(
        [2 * (x * y - w * z), w * w - x * x + y * y - z * z, 2 * (y * z + w * x)], -1
    )
    a3 = np.stack(
        [2 * (x * z + w * y), 2 * (y * z - w * x), w * w - x * x - y * y + z * z], -1
    )
    return a1, a2, a3


def _site_coeffs(c) -> tuple[float, float, float]:
    """Normalize a site-offset spec to (a1, a2, a3) coefficients (dna
    packages emit 2-tuples over (a1, a2); rna2 emits 3-tuples)."""
    c = tuple(float(v) for v in c)
    return c if len(c) == 3 else (c[0], c[1], 0.0)


def _delta_min_gaps(spos: dict, b_sz: int, n: int) -> np.ndarray:
    """(nb,) per-block-index-distance min site-union AABB gap at init."""
    nb = -(-n // b_sz)
    n_pad = nb * b_sz
    lo = hi = None
    for s in spos.values():
        sp = np.pad(
            np.asarray(s, np.float32), ((0, n_pad - n), (0, 0)), constant_values=np.nan
        ).reshape(nb, b_sz, 3)
        lo_s = np.nanmin(sp, axis=1)
        hi_s = np.nanmax(sp, axis=1)
        lo = lo_s if lo is None else np.minimum(lo, lo_s)
        hi = hi_s if hi is None else np.maximum(hi, hi_s)
    gaps = np.full(nb, np.inf, np.float32)
    for delta in range(1, nb):
        g = np.maximum(lo[delta:] - hi[:-delta], 0.0)
        g = np.maximum(g, np.maximum(lo[:-delta] - hi[delta:], 0.0))
        gaps[delta] = float(np.sqrt((g * g).sum(-1).min()))
    return gaps


def stencil_band_for_site_cutoffs(
    displacement_fn: Callable,
    topology,
    site_cutoffs: dict,
    init_centers: Arr,
    init_orientation: Arr,
    dr_threshold: float = 0.5,
    perm: Arr | None = None,
    site_slack: float = 0.5,
    site_margin: int = 1,
    check_block: int = 4,
    fam_slack_overrides: dict | None = None,
    far_slack: float | None = None,
) -> StencilBand:
    """Size a site-mode StencilBand (exact per-offset validity checks).

    Per-term reaches are measured on the actual interaction-SITE distances
    (``site_cutoffs`` from e.g. energy.dna2.per_term_site_cutoffs()) with
    ``site_slack`` of headroom over the bare cutoffs plus ``site_margin``
    slots — much tighter than the COM-inflated reaches of the legacy
    builder, and guarded exactly: every rebuild re-checks, per slot offset
    beyond each term's reach, that no site pair is inside the bare cutoff
    (rolls, no quantization), plus a far site-union AABB sweep for
    fold-backs. ``init_orientation``: (N, 4) quaternions (sites derive from
    the frame).
    """
    n = topology.n_nucleotides
    bn = np.asarray(topology.bonded_neighbors)
    if bn.size:
        counts = np.bincount(bn.ravel(), minlength=n)
        if counts.max() > 2:
            raise ValueError(
                "stencil bands support at most 2 bonded partners per particle "
                f"(got {int(counts.max())}); branched topologies need the "
                "pair-list path"
            )
    c = np.asarray(init_centers, np.float32)
    q = np.asarray(init_orientation, np.float32)
    if perm is not None:
        c = c[np.asarray(perm)]
        q = q[np.asarray(perm)]
    a1, a2, a3 = _np_frames(q)
    sdefs = dict(site_cutoffs["sites"])
    spos = {
        nm: c + cs[0] * a1 + cs[1] * a2 + cs[2] * a3
        for nm, cs in ((nm, _site_coeffs(v)) for nm, v in sdefs.items())
    }
    terms_sc = dict(site_cutoffs["terms"])
    order = (
        "UnbondedExcludedVolume",
        "HydrogenBonding",
        "CrossStacking",
        "CoaxialStacking",
    )
    missing = [nm for nm in order if nm not in terms_sc]
    if missing:
        raise ValueError(f"site_cutoffs missing short-range terms {missing}")

    # family-specific headroom over the bare cutoff when measuring reaches
    # on the IDEAL init geometry: thermally equilibrated duplexes approach
    # closer than the ideal helix, and by different amounts per site family
    # (measured on a 10k-nt duplex at 296 K over 20k steps: backbone-
    # backbone minima dip ~0.86 su below init at the minor-groove contact
    # offsets, back-base ~0.5, base/stack ~0.2). Reaches sized with these
    # slacks keep the EXACT per-rebuild checks (bare cutoffs) from flagging
    # equilibrium breathing as violations; the checks remain the guard for
    # anything beyond it.
    _fam_slack = {
        ("back", "back"): max(site_slack, 0.9),
        ("back", "base"): max(site_slack, 0.75),
        ("base", "back"): max(site_slack, 0.75),
    }
    # helix-form-specific calibration (e.g. A-form rna2 breathes further
    # than the B-DNA defaults above: benchmarks/calibrate_aform.py); keys
    # are unordered family pairs, mirrored into both orders here
    if fam_slack_overrides:
        for (fa, fb), v in fam_slack_overrides.items():
            _fam_slack[(fa, fb)] = max(site_slack, float(v))
            _fam_slack[(fb, fa)] = max(site_slack, float(v))

    def reach_of(pairs) -> int:
        r = 0
        for fa, fb, cutoff in pairs:
            slack = _fam_slack.get((fa, fb), site_slack)
            r = max(
                r, _band_reach2(spos[fa], spos[fb], float(cutoff) + slack)
            )
        return r + site_margin

    w_t = {nm: max(1, reach_of(terms_sc[nm])) for nm in order}
    w_short = max(w_t.values())
    has_debye = "Debye" in terms_sc
    w_wide = max(1, reach_of(terms_sc["Debye"])) if has_debye else w_short
    w_wide = max(w_wide, w_short)
    if w_wide > max(8, n // 2):
        raise ValueError(
            f"initial layout is not banded (site reach {w_wide} of {n} slots); "
            "use block_neighbor_list_for_topology instead"
        )

    all_cuts = [float(cu) for prs in terms_sc.values() for _, _, cu in prs]
    far_cutoff = max(all_cuts)
    b_sz = max(check_block, -(-n // 4096))
    gaps = _delta_min_gaps(spos, b_sz, n)
    # generous margin: between init and equilibrium the AABB gap shrinks by
    # the thermal approach (~0.9 su for B-DNA; up to ~3 su for A-form
    # rna2, see benchmarks/calibrate_aform.py — callers pass ``far_slack``
    # to widen it) PLUS block-span growth; the offsets this pushes into
    # the exact-check range are nearly free in-kernel
    far_slack = max(site_slack, far_slack if far_slack is not None else 1.5)
    ok = gaps > far_cutoff + far_slack
    suffix_ok = np.flip(np.logical_and.accumulate(np.flip(ok)))
    cand = np.nonzero(suffix_ok)[0]
    cand = cand[cand >= 1]
    if cand.size == 0:
        raise ValueError(
            "initial layout has fold-back contacts at every scale; "
            "use block_neighbor_list_for_topology instead"
        )
    delta_far = int(cand[0])
    # rounded UP to a block multiple, then extended by b_sz - 1: the far
    # sweep covers block-index distances >= dm/b_sz + 1 (see _check_site),
    # but a pair at slot distance s can sit in a block pair at index
    # distance floor(s/b_sz) — so the sweep only GUARANTEES coverage for
    # s >= (dm/b_sz + 1)*b_sz = dm + b_sz. The exact checks must therefore
    # reach check_dm = dm + b_sz - 1 or slot distances dm+1..dm+b_sz-1 go
    # unchecked when block-misaligned (a silent-wrong-forces hole). The
    # sweep's START is unchanged (its block pairs contain only slot
    # distances > dm, all beyond every band reach, so no false far flags).
    dm = max(w_wide + 2, delta_far * b_sz)
    dm = -(-dm // b_sz) * b_sz
    check_dm = dm + b_sz - 1

    site_checks = []
    for nm in order:
        for fa, fb, cutoff in terms_sc[nm]:
            if w_t[nm] < check_dm:
                site_checks.append((fa, fb, float(cutoff), w_t[nm], check_dm))
    if has_debye:
        for fa, fb, cutoff in terms_sc["Debye"]:
            if w_wide < check_dm:
                site_checks.append((fa, fb, float(cutoff), w_wide, check_dm))

    band = StencilBand(
        displacement_fn=displacement_fn,
        n=n,
        r_cutoff=far_cutoff,
        dr_threshold=dr_threshold,
        w_wide=w_wide,
        w_short=w_short,
        r_cutoff_inner=None,
        check_block=b_sz,
        perm=None if perm is None else np.asarray(perm),
        site_geometry=tuple(sorted(sdefs.items())),
        site_checks=tuple(site_checks),
        check_dm=int(check_dm),
        far_cutoff=float(far_cutoff),
        site_w_terms=tuple(w_t[nm] for nm in order),
    )
    return band.allocate(jnp.asarray(init_centers), orientation=jnp.asarray(init_orientation))


def stencil_band_for_topology(
    displacement_fn: Callable,
    topology,
    r_cutoff: float,
    dr_threshold: float = 0.5,
    init_centers: Arr | None = None,
    r_cutoff_inner: float | None = None,
    perm: Arr | None = None,
    margin: int = 4,
    check_block: int = 4,
    term_cutoffs: dict[str, float] | None = None,
) -> StencilBand:
    """Size a StencilBand from initial positions.

    The one-sided reaches are measured exactly (max |i - j| over pairs
    within cutoff + skin in the permuted slot layout) plus ``margin`` slots
    of headroom, which also absorbs the validity check's block quantization
    (check_block - 1 slots). Raises if the initial layout is not banded
    enough to profit (reach > n/4): fold-back conformations need the block
    table path.

    ``term_cutoffs`` (optional): per-term effective COM cutoffs keyed
    'UnbondedExcludedVolume'/'HydrogenBonding'/'CrossStacking'/
    'CoaxialStacking' (e.g. energy.dna2.per_term_neighbor_cutoffs). When
    given, each term gets its own (smaller) band reach and the stencil
    kernel skips it beyond that -- exact, since the smoothed potentials
    are zero past their cutoffs, and guarded per level by the rebuild
    check.
    """
    n = topology.n_nucleotides
    bn = np.asarray(topology.bonded_neighbors)
    if bn.size:
        counts = np.bincount(bn.ravel(), minlength=n)
        if counts.max() > 2:
            raise ValueError(
                "stencil bands support at most 2 bonded partners per particle "
                f"(got {int(counts.max())}); branched topologies need the "
                "pair-list path"
            )
    if init_centers is None:
        raise ValueError("init_centers must be provided")
    c = np.asarray(init_centers)
    if perm is not None:
        c = c[np.asarray(perm)]
    w_wide = _band_reach(c, r_cutoff + dr_threshold) + margin
    if r_cutoff_inner is not None:
        w_short = _band_reach(c, r_cutoff_inner + dr_threshold) + margin
    else:
        w_short = w_wide
    term_levels = None
    if term_cutoffs is not None:
        order = (
            "UnbondedExcludedVolume",
            "HydrogenBonding",
            "CrossStacking",
            "CoaxialStacking",
        )
        missing = [nm for nm in order if nm not in term_cutoffs]
        if missing:
            raise ValueError(f"term_cutoffs missing {missing}")
        term_levels = tuple(
            (
                min(_band_reach(c, term_cutoffs[nm] + dr_threshold) + margin, w_short),
                float(term_cutoffs[nm]),
            )
            for nm in order
        )
    if w_wide > max(8, n // 2):
        raise ValueError(
            f"initial layout is not banded (reach {w_wide} of {n} slots); "
            "use block_neighbor_list_for_topology instead"
        )
    band = StencilBand(
        displacement_fn=displacement_fn,
        n=n,
        r_cutoff=r_cutoff,
        dr_threshold=dr_threshold,
        w_wide=w_wide,
        w_short=w_short,
        r_cutoff_inner=r_cutoff_inner,
        check_block=check_block,
        perm=None if perm is None else np.asarray(perm),
        term_levels=term_levels,
    )
    return band.allocate(jnp.asarray(init_centers))


def neighbor_list_for_topology(
    displacement_fn: Callable,
    topology,
    r_cutoff: float,
    dr_threshold: float = 0.2,
    capacity: int | None = None,
    capacity_multiplier: float = 1.25,
    init_centers: Arr | None = None,
) -> FixedCapacityNeighborList:
    """Build a FixedCapacityNeighborList sized from initial positions."""
    n = topology.n_nucleotides
    mask = bonded_exclusion_mask(n, topology.bonded_neighbors)
    nbl = FixedCapacityNeighborList(
        displacement_fn=displacement_fn,
        exclusion_mask=jnp.asarray(mask),
        r_cutoff=r_cutoff,
        dr_threshold=dr_threshold,
        capacity=capacity or 0,
    )
    if capacity is None:
        if init_centers is None:
            raise ValueError("capacity or init_centers must be provided")
        _, _ = nbl._build(init_centers)  # shape check
        dr = displacement_fn(init_centers[:, None, :], init_centers[None, :, :])
        dist2 = np.asarray(jnp.sum(dr * dr, axis=-1))
        cut2 = (r_cutoff + dr_threshold) ** 2
        iu = np.triu_indices(n, k=1)
        hits = int(np.sum((dist2[iu] < cut2) & ~np.asarray(mask)[iu]))
        cap = max(16, int(hits * capacity_multiplier))
        nbl = nbl.replace(capacity=cap)
    return nbl.allocate(init_centers) if init_centers is not None else nbl
