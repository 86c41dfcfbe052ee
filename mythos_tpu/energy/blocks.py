"""Block-sparse pair evaluation: dense tiles + block-level culling.

The TPU-native replacement for per-pair neighbor lists. Per-pair gathers are
the dominant cost of a sparse pair list on TPU (profiled: a 4k-pair cutoff
list evaluates ~2x SLOWER than the full 130k-pair dense (N, N) path at
N = 512), while dense broadcasts scale O(N^2). Block sparsity keeps the
arithmetic dense -- (B, B) tiles evaluated with the same broadcasting code as
the dense path -- but culls interaction *blocks* whose axis-aligned bounding
boxes are farther apart than the interaction cutoff.

Two design rules keep this fast on TPU:

1. **Gather once, at block granularity.** Row blocks are a plain reshape of
   the padded row arrays; column blocks are ONE advanced-index gather
   ``rows[block_ids]`` per field for the whole table. (An earlier variant
   dynamic-sliced each (row-block, slot) pair under vmap, which lowered to a
   gather per term per slot and was 5x slower than the dense path.)
2. **Evaluate every term on the same tile.** :func:`block_pair_sums` takes a
   list of tile functions and evaluates all of them inside one vmapped tile
   program, so the shared pair geometry (displacements, angles) is computed
   once and CSE'd across terms, and the column gather is amortized over the
   whole interaction model.

Reference context: the reference framework precomputes ALL O(N^2) unbonded
pairs (mythos/input/topology.py:186-190) or uses jax-md neighbor lists with
``disable_cell_list=True`` (mythos/utils/neighbors.py:51-59) -- neither
scales; this module is the from-scratch TPU answer.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

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


def block_reshape(tree: PyTree, n_blocks: int, block_size: int) -> PyTree:
    """Pad rows to n_blocks * block_size and reshape to (n_blocks, B, ...)."""
    padded = pad_rows(tree, n_blocks * block_size)
    return jax.tree.map(
        lambda x: x.reshape(n_blocks, block_size, *x.shape[1:]), padded
    )


def block_pair_sums(
    tile_fns: Sequence[Callable[[PyTree, PyTree], Arr]],
    rows: PyTree,
    block_ids: Arr,
    block_size: int,
    n: int,
    bonded_neighbors: Arr,
    *,
    rows_batch: int | None = None,
) -> Arr:
    """Per-term sums of masked pair energies over active block tiles.

    Args:
        tile_fns: each maps (rows_i, rows_j) pytrees of (B, ...) row data to a
            (B, B) tile of pair energies. Any ``dense_energies``-style
            broadcasting implementation works unchanged. All terms evaluate
            on the SAME gathered tiles (shared geometry CSE's inside the
            traced tile program).
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
        (len(tile_fns),) per-term sums over all included pairs.
    """
    if block_ids.ndim != 2:
        raise ValueError(ERR_BLOCK_IDS)
    if block_ids.shape[1] == 0:
        raise ValueError(ERR_PLACEHOLDER)
    nb, cap = block_ids.shape
    b_sz = block_size
    n_pad = nb * b_sz

    rows_b = block_reshape(rows, nb, b_sz)  # (nb, B, ...)
    safe_ids = jnp.minimum(block_ids, nb - 1)
    # one gather per field; the K slot axis is FLATTENED into the column
    # axis so every tile is (B, K*B) -- with cap * block_size a multiple of
    # 128 the minor dimension fills whole lane groups (a (B, K, B) layout
    # wastes 1 - B/128 of every vector register)
    cols_b = jax.tree.map(
        lambda x: x[safe_ids].reshape(nb, cap * b_sz, *x.shape[2:]), rows_b
    )  # (nb, K*B, ...)

    prev, nxt = bonded_partner_table(n_pad, bonded_neighbors)
    loc = jnp.arange(b_sz, dtype=jnp.int32)
    ig = jnp.arange(nb, dtype=jnp.int32)[:, None] * b_sz + loc[None, :]  # (nb, B)
    jg = jnp.where(
        (block_ids < nb)[:, :, None],
        safe_ids[:, :, None] * b_sz + loc[None, None, :],
        n_pad,  # padded slots point past every real row -> masked below
    ).reshape(nb, cap * b_sz)  # (nb, K*B)
    prev_b = prev.reshape(nb, b_sz)
    nxt_b = nxt.reshape(nb, b_sz)

    def row_block(rows_i, cols_i, ig_i, jg_j, prev_i, nxt_i):
        # rows_i: (B, ...), cols_i: (K*B, ...); mask built in-tile so XLA
        # fuses it with the energy evaluation.
        mask = (
            (jg_j[None, :] > ig_i[:, None])
            & (ig_i[:, None] < n)
            & (jg_j[None, :] < n)
            & (jg_j[None, :] != prev_i[:, None])
            & (jg_j[None, :] != nxt_i[:, None])
        )
        return jnp.stack(
            [jnp.where(mask, fn(rows_i, cols_i), 0.0).sum() for fn in tile_fns]
        )

    args = (rows_b, cols_b, ig, jg, prev_b, nxt_b)
    if rows_batch is None:
        per_row = jax.vmap(row_block)(*args)
    else:
        per_row = jax.lax.map(lambda a: row_block(*a), args, batch_size=rows_batch)
    return per_row.sum(axis=0)


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
    """Scalar sum of masked pair energies for a single tile function."""
    return block_pair_sums(
        [tile_fn],
        rows,
        block_ids,
        block_size,
        n,
        bonded_neighbors,
        rows_batch=rows_batch,
    )[0]
