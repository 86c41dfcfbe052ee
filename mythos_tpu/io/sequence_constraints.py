"""Sequence constraints for probabilistic-sequence optimization.

Parity reference: mythos/input/sequence_constraints.py:76-216. A
``SequenceConstraints`` partitions nucleotides into unpaired positions and
base pairs, with index mappers used by the probabilistic sequence-dependent
weight computation (see mythos_tpu.energy.seqdep).
"""

from __future__ import annotations

import chex
import numpy as np

import mythos_tpu.utils.constants as const
from mythos_tpu.utils.types import Arr, Discrete_Sequence, Probabilistic_Sequence

ERR_INVALID_N = "Invalid number of nucleotides"
ERR_INVALID_BP_SHAPE = "Invalid shape for base pairs"
ERR_BP_DUPLICATES = "Array specifying base paired indices cannot contain duplicates"
ERR_BP_RANGE = "Base paired indices must be between 0 and n_nucleotides-1"
ERR_COVER = "Unpaired and coupled nucleotides do not cover all nucleotides"
ERR_COUNTS = (
    "Number of nucleotides should equal the number of unpaired base pairs plus "
    "the number of coupled base pairs"
)
ERR_INVALID_BP = "Invalid base pair encountered when converting discrete sequence to probabilistic sequence"


@chex.dataclass(frozen=True)
class SequenceConstraints:
    """Partition of nucleotides into unpaired positions and base pairs.

    Attributes:
        n_nucleotides: total nucleotide count.
        n_unpaired / n_bp: partition sizes (n_unpaired + 2 n_bp == n).
        is_unpaired: (N,) 0/1 flags.
        unpaired: (n_unpaired,) indices of unpaired nucleotides.
        bps: (n_bp, 2) nucleotide-index pairs.
        idx_to_unpaired_idx: (N,) map into unpaired_pseq rows (-1 if paired).
        idx_to_bp_idx: (N, 2) map into (bp row, position within bp) (-1s if unpaired).
    """

    n_nucleotides: int
    n_unpaired: int
    n_bp: int
    is_unpaired: Arr
    unpaired: Arr
    bps: Arr
    idx_to_unpaired_idx: Arr
    idx_to_bp_idx: Arr

    def __post_init__(self) -> None:
        if self.n_nucleotides < 1:
            raise ValueError(ERR_INVALID_N)
        unpaired = np.asarray(self.unpaired)
        bps = np.asarray(self.bps).reshape(-1, 2) if self.n_bp else np.zeros((0, 2), int)
        if self.n_unpaired + 2 * self.n_bp != self.n_nucleotides:
            raise ValueError(ERR_COUNTS)
        covered = set(np.concatenate([unpaired, bps.flatten()]).astype(int))
        if covered != set(range(self.n_nucleotides)):
            raise ValueError(ERR_COVER)


def from_bps(n_nucleotides: int, bps: Arr) -> SequenceConstraints:
    """Build constraints from a (n_bp, 2) base-pair array; rest is unpaired."""
    bps = np.asarray(bps)
    if bps.ndim != const.TWO_DIMENSIONS or bps.shape[1] != const.N_NT_PER_BP or 2 * bps.shape[0] > n_nucleotides:
        raise ValueError(ERR_INVALID_BP_SHAPE)

    paired = bps.flatten()
    if len(np.unique(paired)) < len(paired):
        raise ValueError(ERR_BP_DUPLICATES)
    if not np.all((paired >= 0) & (paired < n_nucleotides)):
        raise ValueError(ERR_BP_RANGE)

    unpaired = np.setdiff1d(np.arange(n_nucleotides), paired)

    idx_to_unpaired_idx = np.full((n_nucleotides,), -1, dtype=np.int32)
    idx_to_unpaired_idx[unpaired] = np.arange(len(unpaired), dtype=np.int32)

    idx_to_bp_idx = np.full((n_nucleotides, 2), -1, dtype=np.int32)
    for bp_idx, (nt1, nt2) in enumerate(bps):
        idx_to_bp_idx[nt1] = [bp_idx, 0]
        idx_to_bp_idx[nt2] = [bp_idx, 1]

    is_unpaired = np.zeros(n_nucleotides, dtype=np.int32)
    is_unpaired[unpaired] = 1

    return SequenceConstraints(
        n_nucleotides=n_nucleotides,
        n_unpaired=len(unpaired),
        n_bp=bps.shape[0],
        is_unpaired=is_unpaired,
        unpaired=unpaired,
        bps=bps,
        idx_to_unpaired_idx=idx_to_unpaired_idx,
        idx_to_bp_idx=idx_to_bp_idx,
    )


def dseq_to_pseq(dseq: Discrete_Sequence, sc: SequenceConstraints) -> Probabilistic_Sequence:
    """One-hot a discrete sequence into a probabilistic sequence.

    With zero base pairs, bp_pseq gets a dummy row so -1 indexing used in the
    pair-weight computation stays in bounds.
    """
    dseq = np.asarray(dseq)

    up_pseq = np.zeros((sc.n_unpaired, const.N_NT), dtype=np.float64)
    for up_idx, idx in enumerate(np.asarray(sc.unpaired)):
        up_pseq[up_idx, dseq[idx]] = 1.0

    bp_pseq = np.zeros((max(sc.n_bp, 1), const.N_BP_TYPES), dtype=np.float64)
    for bp_idx, (i, j) in enumerate(np.asarray(sc.bps).reshape(-1, 2)):
        key = (int(dseq[i]), int(dseq[j]))
        if key not in const.BP_IDX_MAP:
            raise ValueError(ERR_INVALID_BP)
        bp_pseq[bp_idx, const.BP_IDX_MAP[key]] = 1.0

    return up_pseq, bp_pseq
