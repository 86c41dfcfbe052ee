"""Probabilistic-sequence expectation of pairwise weight tables.

Parity reference: mythos/energy/utils.py:45-132 (``compute_seq_dep_weight``),
which evaluates four pairing cases per pair with nested vmaps over the 4x4
tables. Here the computation is reformulated for the TPU:

For a pair (i, j) the weight is E[W[s_i, s_j]] over the sequence distribution.
Unless i and j sit in the *same* base pair, s_i and s_j are independent, so
the expectation factorizes through per-nucleotide marginals m_i (4,):

    w_ind(i, j) = m_i @ W @ m_j

The marginals are computed once for all nucleotides as an (N, 4) table, and
the pair weights become one batched bilinear form (an MXU-friendly matmul
against W) plus a small same-base-pair correction summed over the 4 bp types.
This is algebraically identical to the reference's four-case evaluation
(verified by the brute-force enumeration test).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import mythos_tpu.utils.constants as const
from mythos_tpu.io.sequence_constraints import SequenceConstraints
from mythos_tpu.utils.types import Arr, Probabilistic_Sequence


def nucleotide_marginals(pseq: Probabilistic_Sequence, sc: SequenceConstraints) -> Arr:
    """(N, 4) per-nucleotide marginal base distributions."""
    up_pseq, bp_pseq = pseq
    up_pseq = jnp.asarray(up_pseq)
    bp_pseq = jnp.asarray(bp_pseq)
    # dummy rows keep gathers in range when one partition is empty
    if up_pseq.shape[0] == 0:
        up_pseq = jnp.zeros((1, up_pseq.shape[1]), dtype=up_pseq.dtype)
    if bp_pseq.shape[0] == 0:
        bp_pseq = jnp.zeros((1, bp_pseq.shape[1]), dtype=bp_pseq.dtype)

    is_unpaired = jnp.asarray(sc.is_unpaired)
    idx_to_up = jnp.clip(jnp.asarray(sc.idx_to_unpaired_idx), 0, up_pseq.shape[0] - 1)
    idx_to_bp = jnp.asarray(sc.idx_to_bp_idx)

    # bp-type -> nucleotide one-hots, for each within-pair position: (2, 4bp, 4nt)
    bp_idxs = jnp.asarray(const.BP_IDXS)  # (4, 2)
    onehot = jnp.eye(const.N_NT)
    bp_to_nt = jnp.stack([onehot[bp_idxs[:, 0]], onehot[bp_idxs[:, 1]]])  # (2, 4, 4)

    # paired marginal: beta_i @ bp_to_nt[k_i]
    beta = bp_pseq[idx_to_bp[:, 0]]  # (N, 4), junk rows for unpaired (masked)
    k = jnp.clip(idx_to_bp[:, 1], 0, 1)
    paired_marg = jnp.einsum("nt,nta->na", beta, bp_to_nt[k], precision=jax.lax.Precision.HIGHEST)

    unpaired_marg = up_pseq[idx_to_up]  # junk rows for paired (masked)
    return jnp.where(is_unpaired[:, None], unpaired_marg, paired_marg)


def factorized_weights(
    pseq: Probabilistic_Sequence,
    weights_table: Arr,
    sc: SequenceConstraints,
    marginals: Arr | None = None,
) -> tuple[Arr, Arr, Arr, Arr]:
    """Rank-4 + sparse-correction form of the expected pair-weight matrix.

    Returns ``(left, right, partner, corr)`` with, for every i != j::

        E[W[s_i, s_j]] == left[i] @ right[j] + (j == partner[i]) * corr[i]

    ``left = M @ W`` and ``right = M`` ((N, 4) marginal factors), so the
    independent-pair expectation is the SAME bilinear structure the discrete
    paths use for one-hots -- the dense (N, N) weight matrix, the block-tile
    contraction, and the fused Pallas kernel's in-tile ``hw . oh`` product
    all take pseq marginals without changing shape. The only pairs where
    independence fails are the two members of one constrained base pair;
    ``partner`` maps each nucleotide to its bp partner (itself when
    unpaired, so the correction can never fire on i != j) and ``corr`` is
    the exact-minus-factorized residual there.

    Parity: equals :func:`pair_weights` elementwise (test_seqdep brute
    force); reference semantics mythos/energy/utils.py:45-132.
    """
    if marginals is None:
        marginals = nucleotide_marginals(pseq, sc)
    weights_table = jnp.asarray(weights_table)
    left = jnp.matmul(marginals, weights_table, precision=jax.lax.Precision.HIGHEST)
    right = marginals

    n = sc.n_nucleotides
    partner_np = np.arange(n)
    bps = np.asarray(sc.bps).reshape(-1, 2).astype(int)
    if bps.size:
        partner_np[bps[:, 0]] = bps[:, 1]
        partner_np[bps[:, 1]] = bps[:, 0]
    partner = jnp.asarray(partner_np, jnp.int32)

    idx = jnp.arange(n)
    exact = pair_weights(pseq, idx, partner, weights_table, sc, marginals=marginals)
    w_ind = jnp.sum(left * right[partner], axis=-1)
    corr = jnp.where(partner != idx, exact - w_ind, 0.0)
    return left, right, partner, corr


def pair_weights(
    pseq: Probabilistic_Sequence,
    op_i: Arr,
    op_j: Arr,
    weights_table: Arr,
    sc: SequenceConstraints,
    marginals: Arr | None = None,
) -> Arr:
    """(P,) expected weights W[s_i, s_j] for index vectors op_i, op_j.

    ``marginals`` may be passed to share the (N, 4) table across terms.
    Out-of-range (padded) indices are allowed if the caller masks the result.
    """
    _, bp_pseq = pseq
    bp_pseq = jnp.asarray(bp_pseq)
    weights_table = jnp.asarray(weights_table)

    if marginals is None:
        marginals = nucleotide_marginals(pseq, sc)

    n = sc.n_nucleotides
    op_i = jnp.clip(jnp.asarray(op_i), 0, n - 1)
    op_j = jnp.clip(jnp.asarray(op_j), 0, n - 1)

    m_i = marginals[op_i]
    m_j = marginals[op_j]
    w_ind = jnp.einsum("pa,ab,pb->p", m_i, weights_table, m_j, precision=jax.lax.Precision.HIGHEST)

    # Same-base-pair correction: sum over the 4 bp types of
    # beta[t] * W[nt(t, k_i), nt(t, k_j)].
    idx_to_bp = jnp.asarray(sc.idx_to_bp_idx)
    is_unpaired = jnp.asarray(sc.is_unpaired)
    bp_idxs = jnp.asarray(const.BP_IDXS)  # (4, 2)

    bp_i, k_i = idx_to_bp[op_i, 0], jnp.clip(idx_to_bp[op_i, 1], 0, 1)
    bp_j, k_j = idx_to_bp[op_j, 0], jnp.clip(idx_to_bp[op_j, 1], 0, 1)
    beta_i = bp_pseq[bp_i]  # (P, 4)

    # nucleotides per bp type at each pair's within-bp position: (P, 4 types)
    nts_i = bp_idxs.T[k_i]
    nts_j = bp_idxs.T[k_j]
    w_same = jnp.sum(beta_i * weights_table[nts_i, nts_j], axis=-1)

    same_bp = (bp_i == bp_j) & (is_unpaired[op_i] == 0) & (is_unpaired[op_j] == 0)
    return jnp.where(same_bp, w_same, w_ind)
