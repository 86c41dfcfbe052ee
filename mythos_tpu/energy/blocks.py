"""Block-sparse pair evaluation: dense tiles + block-level culling.

The TPU-native replacement for per-pair neighbor lists. Per-pair gathers are
the dominant cost of a sparse pair list on TPU (profiled: a 4k-pair cutoff
list evaluates ~2x SLOWER than the full 130k-pair dense (N, N) path at
N = 512), while dense broadcasts scale O(N^2). Block sparsity keeps the
arithmetic dense -- (B, B) tiles evaluated with the same broadcasting code as
the dense path -- but culls interaction *blocks* whose axis-aligned bounding
boxes are farther apart than the interaction cutoff. Gathers happen only at
block granularity (dynamic slices of B contiguous rows), which TPUs handle
efficiently.

This is the cluster-pair idea used by modern MD engines, re-expressed for
XLA's static-shape world: a fixed-capacity (n_blocks, K) table of interacting
column-block ids per row-block, padded with ``n_blocks`` and masked in-tile.

Reference context: the reference framework precomputes ALL O(N^2) unbonded
pairs (mythos/input/topology.py:186-190) or uses jax-md neighbor lists with
``disable_cell_list=True`` (mythos/utils/neighbors.py:51-59) -- neither
scales; this module is the from-scratch TPU answer.
"""

from __future__ import annotations

from collections.abc import Callable

import jax
import jax.numpy as jnp

from mythos_tpu.utils.types import Arr, PyTree

ERR_BLOCK_IDS = "block_ids must be (n_blocks, K) int32"
ERR_PLACEHOLDER = (
    "block_ids is an empty placeholder; allocate a BlockNeighborList and bind "
    "it via energy_fn.with_props(block_ids=nbl.idx) before evaluating"
)


def n_blocks_for(n: int, block_size: int) -> int:
    """Number of blocks covering n rows."""
    return -(-n // block_size)


def pad_rows(tree: PyTree, n_pad: int) -> PyTree:
    """Zero-pad every leaf's leading (row) axis to ``n_pad``."""

    def pad(x: Arr) -> Arr:
        pad_n = n_pad - x.shape[0]
        if pad_n <= 0:
            return x
        return jnp.pad(x, [(0, pad_n)] + [(0, 0)] * (x.ndim - 1))

    return jax.tree.map(pad, tree)


def bonded_partner_table(n_pad: int, bonded_neighbors: Arr) -> tuple[Arr, Arr]:
    """Per-row 3'/5' bonded-partner indices (-1 where absent).

    Every nucleotide has at most two backbone bonds, so two int32 rows encode
    the full exclusion structure without an (N, N) mask. Loop-invariant in a
    scan body; XLA hoists the scatters out of the hot loop.
    """
    bn = jnp.asarray(bonded_neighbors)
    prev = jnp.full((n_pad,), -1, dtype=jnp.int32).at[bn[:, 0]].set(bn[:, 1].astype(jnp.int32))
    nxt = jnp.full((n_pad,), -1, dtype=jnp.int32).at[bn[:, 1]].set(bn[:, 0].astype(jnp.int32))
    return prev, nxt


def _slice_rows(tree: PyTree, start: Arr, size: int) -> PyTree:
    """Dynamic slice of ``size`` rows from every leaf."""
    return jax.tree.map(
        lambda x: jax.lax.dynamic_slice_in_dim(x, start, size, axis=0), tree
    )


def block_pair_sum(
    tile_fn: Callable[[PyTree, PyTree], Arr],
    rows: PyTree,
    block_ids: Arr,
    block_size: int,
    n: int,
    bonded_neighbors: Arr,
    *,
    rows_batch: int | None = None,
) -> Arr:
    """Sum of masked pair energies over active (row-block, col-block) tiles.

    Args:
        tile_fn: maps (rows_i, rows_j) pytrees of (B, ...) row data to a
            (B, B) tile of pair energies. Any ``dense_energies``-style
            broadcasting implementation works unchanged.
        rows: pytree of per-row arrays, leading axis >= n (padded rows are
            masked out).
        block_ids: (n_blocks, K) int32 table of interacting column blocks per
            row block, entries in [a, n_blocks) or == n_blocks for padding.
            Only b >= a appears: each unordered pair is evaluated once, and
            the in-tile ``j > i`` mask handles the diagonal block.
        block_size: rows per block (B).
        n: number of real rows.
        bonded_neighbors: (B?, 2) bonded pair indices -- these pairs (and
            self-pairs) are excluded, matching the reference's "all pairs
            minus bonded minus self" convention (topology.py:186-190).
        rows_batch: if set, evaluate row-blocks in lax.map batches of this
            size to bound live memory (default: one vmap over all blocks).

    Returns:
        Scalar sum of pair energies over all included pairs.
    """
    if block_ids.ndim != 2:
        raise ValueError(ERR_BLOCK_IDS)
    if block_ids.shape[1] == 0:
        raise ValueError(ERR_PLACEHOLDER)
    nb = block_ids.shape[0]
    b_sz = block_size
    n_pad = nb * b_sz
    rows_p = pad_rows(rows, n_pad)
    prev, nxt = bonded_partner_table(n_pad, bonded_neighbors)
    loc = jnp.arange(b_sz, dtype=jnp.int32)

    def row_block(a: Arr, slots: Arr) -> Arr:
        rows_i = _slice_rows(rows_p, a * b_sz, b_sz)
        ig = a * b_sz + loc  # (B,) global row indices
        prev_i = jax.lax.dynamic_slice_in_dim(prev, a * b_sz, b_sz)
        nxt_i = jax.lax.dynamic_slice_in_dim(nxt, a * b_sz, b_sz)

        def slot(b: Arr) -> Arr:
            valid_block = b < nb
            b_c = jnp.minimum(b, nb - 1)
            rows_j = _slice_rows(rows_p, b_c * b_sz, b_sz)
            jg = b_c * b_sz + loc  # (B,) global col indices
            tile = tile_fn(rows_i, rows_j)  # (B, B)
            mask = (
                (jg[None, :] > ig[:, None])
                & (ig[:, None] < n)
                & (jg[None, :] < n)
                & (jg[None, :] != prev_i[:, None])
                & (jg[None, :] != nxt_i[:, None])
                & valid_block
            )
            return jnp.where(mask, tile, 0.0).sum()

        return jax.vmap(slot)(slots).sum()

    blocks_a = jnp.arange(nb, dtype=jnp.int32)
    if rows_batch is None:
        return jax.vmap(row_block)(blocks_a, block_ids).sum()
    per_row = jax.lax.map(
        lambda ab: row_block(*ab), (blocks_a, block_ids), batch_size=rows_batch
    )
    return per_row.sum()
