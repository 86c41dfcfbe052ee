"""oxDNA topology parsing (classic and new formats).

Parity reference: mythos/input/topology.py:85-327. Differences from the
reference are deliberate and TPU-motivated:

* ``unbonded_neighbors`` (all pairs minus bonded minus self) is generated
  vectorized with numpy instead of Python set algebra -- it is O(N^2) data
  either way, so large systems should use the neighbor-list path in
  ``mythos_tpu.simulators.neighbors`` instead; this field remains for the
  small-system static-pair-list path and for API parity.
"""

from __future__ import annotations

import dataclasses as dc
import itertools
import warnings
from collections.abc import Callable
from enum import IntEnum
from pathlib import Path

import numpy as np

import mythos_tpu.utils.constants as const
from mythos_tpu.utils.types import Arr, PathOrStr, Sequence, oxDNAFormat

N_1ST_LINE_OXDNA_CLASSIC = 2
N_1ST_LINE_OXDNA_NEW = 3

ERR_INVALID_NUMBER_NUCLEOTIDES = "Invalid number of nucleotides"
ERR_INVALID_STRAND_COUNTS = "Invalid strand counts"
ERR_STRAND_COUNTS_NOT_MATCH = "Strand counts do not match number of nucleotides"
ERR_BONDED_NEIGHBORS_INVALID_SHAPE = "Invalid bonded neighbors shape"
ERR_UNBONDED_NEIGHBORS_INVALID_SHAPE = "Invalid unbonded neighbors shape"
ERR_INVALID_SEQUENCE_NUCLEOTIDES = "Invalid sequence nucleotides"
ERR_INVALID_DISCRETE_SEQUENCE_SHAPE = "Invalid discrete sequence shape"
ERR_INVALID_UNPAIRED_PSEQ_SHAPE = "Invalid unpaired probabilistic sequence shape"
ERR_MISMATCH_PSEQ_SHAPE = "Pseq shape does not match number of nucleotides"
ERR_INVALID_BP_PSEQ_SHAPE = "Invalid base-paired probabilistic sequence shape"
ERR_INVALID_PROBABILITIES = "Probabilities must be > 0"
ERR_PSEQ_NOT_NORMALIZED = "Probabilities must be normalized"
ERR_INVALID_OXDNA_FORMAT = (
    "Invalid oxDNA topology format. See "
    "https://lorenzo-rovigatti.github.io/oxDNA/configurations.html#topology-file"
)
ERR_STRAND_COUNTS_CIRCULAR_MISMATCH = "Strand counts and circularity do not match"
ERR_FILE_NOT_FOUND = "Topology file not found"
ERR_INVALID_SEQUENCE_TYPE = "Invalid sequence type. Must be discrete or probabilistic"

WARN_UNSPECIFIED_NT_TYPE = "Type of strand {strand_idx} not specified"


class NucleotideType(IntEnum):
    """Nucleotide types (also used per-strand)."""

    UNSPECIFIED = 0
    DNA = 1
    RNA = 2


def check_valid_seq(seq: Sequence, n_nucleotides: int) -> None:
    """Validate a discrete or probabilistic sequence."""
    if isinstance(seq, tuple) and len(seq) == const.TWO_DIMENSIONS:
        up_pseq, bp_pseq = np.asarray(seq[0]), np.asarray(seq[1])
        if up_pseq.ndim != const.TWO_DIMENSIONS or up_pseq.shape[1] != const.N_NT:
            raise ValueError(ERR_INVALID_UNPAIRED_PSEQ_SHAPE)
        if bp_pseq.ndim != const.TWO_DIMENSIONS or bp_pseq.shape[1] != const.N_BP_TYPES:
            raise ValueError(ERR_INVALID_BP_PSEQ_SHAPE)
        if up_pseq.shape[0] + const.N_NT_PER_BP * bp_pseq.shape[0] != n_nucleotides:
            raise ValueError(ERR_MISMATCH_PSEQ_SHAPE)
        if (up_pseq < 0).any() or (bp_pseq < 0).any():
            raise ValueError(ERR_INVALID_PROBABILITIES)
        if not np.allclose(up_pseq.sum(axis=1), 1) or not np.allclose(bp_pseq.sum(axis=1), 1):
            raise ValueError(ERR_PSEQ_NOT_NORMALIZED)
    elif hasattr(seq, "shape"):
        arr = np.asarray(seq)
        if arr.ndim != 1:
            # shape before values: a 2-D array's tolist() rows are unhashable
            raise ValueError(ERR_INVALID_DISCRETE_SEQUENCE_SHAPE)
        if len(set(arr.tolist()) - {0, 1, 2, 3}) > 0:
            raise ValueError(ERR_INVALID_SEQUENCE_NUCLEOTIDES)
        if arr.shape != (n_nucleotides,):
            raise ValueError(ERR_INVALID_DISCRETE_SEQUENCE_SHAPE)
    else:
        raise ValueError(ERR_INVALID_SEQUENCE_TYPE)


@dc.dataclass(frozen=True)
class Topology:
    """Connectivity and sequence of a nucleic-acid system.

    ``bonded_neighbors``: (B, 2) int pairs (i 3'-side, j 5'-side).
    ``unbonded_neighbors``: (U, 2) int pairs = all pairs - bonded - self.
    ``seq``: discrete (N,) int array or probabilistic sequence tuple.
    ``is_end``: (N,) 1 at non-circular strand termini.
    ``nt_type``: (N,) NucleotideType values.
    """

    n_nucleotides: int
    strand_counts: np.ndarray
    bonded_neighbors: np.ndarray
    seq: Sequence
    is_end: Arr
    nt_type: Arr
    #: optional explicit (U, 2) pair list; left unset it derives lazily on
    #: first access -- the O(N^2) list is never materialized by workflows
    #: that use the dense-mask or block-sparse unbonded paths
    unbonded_neighbors: dc.InitVar[np.ndarray | None] = None

    def __post_init__(self, unbonded_neighbors: np.ndarray | None) -> None:
        if self.n_nucleotides < 1:
            raise ValueError(ERR_INVALID_NUMBER_NUCLEOTIDES)
        if len(self.strand_counts) == 0 or sum(self.strand_counts) == 0:
            raise ValueError(ERR_INVALID_STRAND_COUNTS)
        if self.n_nucleotides != sum(self.strand_counts):
            raise ValueError(ERR_STRAND_COUNTS_NOT_MATCH)
        if self.bonded_neighbors.ndim != 2 or self.bonded_neighbors.shape[1] != 2:
            raise ValueError(ERR_BONDED_NEIGHBORS_INVALID_SHAPE)
        if isinstance(unbonded_neighbors, property):
            unbonded_neighbors = None  # dataclass default sentinel
        if unbonded_neighbors is not None and (
            unbonded_neighbors.ndim != 2 or unbonded_neighbors.shape[1] != 2
        ):
            raise ValueError(ERR_UNBONDED_NEIGHBORS_INVALID_SHAPE)
        object.__setattr__(self, "_unbonded_neighbors", unbonded_neighbors)
        check_valid_seq(self.seq, self.n_nucleotides)

    @property
    def unbonded_neighbors(self) -> np.ndarray:
        """(U, 2) all i<j pairs minus bonded, derived lazily and cached."""
        if self._unbonded_neighbors is None:
            object.__setattr__(
                self,
                "_unbonded_neighbors",
                unbonded_pairs(self.n_nucleotides, self.bonded_neighbors),
            )
        return self._unbonded_neighbors


def from_oxdna_file(
    path: PathOrStr, *, return_format: bool = False
) -> Topology | tuple[Topology, oxDNAFormat]:
    """Read a topology from either oxDNA file format (sniffed from line 1)."""
    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(ERR_FILE_NOT_FOUND)

    lines = path.read_text().splitlines()
    fmt, parse_f = _determine_oxdna_format(lines[0])
    top = parse_f(lines)
    return (top, fmt) if return_format else top


def _determine_oxdna_format(first_line: str) -> tuple[oxDNAFormat, Callable[[list[str]], Topology]]:
    tokens = first_line.strip().split()
    if len(tokens) == N_1ST_LINE_OXDNA_CLASSIC:
        return oxDNAFormat.CLASSIC, _from_lines_classic
    if len(tokens) == N_1ST_LINE_OXDNA_NEW:
        return oxDNAFormat.NEW, _from_lines_new
    raise ValueError(ERR_INVALID_OXDNA_FORMAT)


def _bonded_neighbors(strand_lengths: list[int], is_circular: list[bool]) -> np.ndarray:
    """Consecutive-index bonds per strand; circular strands close the loop."""
    if len(strand_lengths) != len(is_circular):
        raise ValueError(ERR_STRAND_COUNTS_CIRCULAR_MISMATCH)
    pairs: list[tuple[int, int]] = []
    start = 0
    for length, circ in zip(strand_lengths, is_circular, strict=True):
        pairs.extend(itertools.pairwise(range(start, start + length)))
        if circ:
            # Wraparound bond keeps the (3'-side, 5'-side) convention: the
            # strand is stored 3'->5', so the last nucleotide's 5' neighbor
            # is the first nucleotide. Emitting (start, last) instead would
            # mirror directional stacking angles AND collide with the
            # (start, start+1) bond in bonded_partner_table's prev[] row.
            pairs.append((start + length - 1, start))
        start += length
    return np.array(pairs, dtype=np.int32)


def unbonded_pairs(n: int, bonded: np.ndarray) -> np.ndarray:
    """(U, 2) array of all i<j pairs excluding bonded pairs, vectorized."""
    iu, ju = np.triu_indices(n, k=1)
    keep = np.ones(len(iu), dtype=bool)
    # mark bonded pairs (either orientation) as excluded via flat i*n+j keys
    lo = np.minimum(bonded[:, 0], bonded[:, 1])
    hi = np.maximum(bonded[:, 0], bonded[:, 1])
    bonded_keys = lo.astype(np.int64) * n + hi
    pair_keys = iu.astype(np.int64) * n + ju
    keep &= ~np.isin(pair_keys, bonded_keys)
    return np.stack([iu[keep], ju[keep]], axis=1).astype(np.int32)


def _strand_ends_and_type(nucleotides: str, circ: bool) -> tuple[list[int], NucleotideType]:
    is_end = [0] * len(nucleotides)
    if not circ:
        is_end[0] = 1
        is_end[-1] = 1
    if "T" in nucleotides:
        nt_type = NucleotideType.DNA
    elif "U" in nucleotides:
        nt_type = NucleotideType.RNA
    else:
        nt_type = NucleotideType.UNSPECIFIED
    return is_end, nt_type


def _from_lines_classic(lines: list[str]) -> Topology:
    """Classic 4-column format (3'->5' per strand)."""
    n_nucleotides, n_strands = map(int, lines[0].strip().split())

    rows = [line.strip().split() for line in lines[1 : 1 + n_nucleotides]]
    strand_ids = np.array([int(r[0]) for r in rows])
    bases = [r[1] for r in rows]
    neighbor_5p = np.array([int(r[3]) for r in rows])

    _, strand_counts = np.unique(strand_ids, return_counts=True)

    sequence: list[str] = []
    is_circular: list[bool] = []
    is_end: list[int] = []
    nt_type: list[int] = []
    for sid in range(1, n_strands + 1):
        idxs = np.where(strand_ids == sid)[0]
        strand_bases = "".join(bases[i] for i in idxs)
        circ = neighbor_5p[idxs[-1]] != -1
        is_circular.append(circ)
        sequence.append(strand_bases)
        ends, stype = _strand_ends_and_type(strand_bases, circ)
        if stype == NucleotideType.UNSPECIFIED:
            warnings.warn(WARN_UNSPECIFIED_NT_TYPE.format(strand_idx=sid), stacklevel=2)
        is_end.extend(ends)
        nt_type.extend([stype] * len(strand_bases))

    return _assemble(n_nucleotides, strand_counts, "".join(sequence), is_circular, is_end, nt_type)


def _from_lines_new(lines: list[str]) -> Topology:
    """New format: one line per strand, 5'->3' sequences with k=v options."""
    n_nucleotides = int(lines[0].strip().split()[0])

    sequence: list[str] = []
    strand_counts: list[int] = []
    is_circular: list[bool] = []
    is_end: list[int] = []
    nt_type: list[int] = []
    for line in lines[1:]:
        if not line.strip():
            continue
        nucleotides = line.strip().split()[0]
        sequence.append(nucleotides[::-1])  # store 3'->5' internally
        strand_counts.append(len(nucleotides))
        circ = "circular=true" in line.lower()
        is_circular.append(circ)
        ends, _ = _strand_ends_and_type(nucleotides, circ)
        is_end.extend(ends)
        if "type=DNA" in line:
            stype = NucleotideType.DNA
        elif "type=RNA" in line:
            stype = NucleotideType.RNA
        else:
            warnings.warn(WARN_UNSPECIFIED_NT_TYPE.format(strand_idx=line), stacklevel=2)
            stype = NucleotideType.UNSPECIFIED
        nt_type.extend([stype] * len(nucleotides))

    return _assemble(
        n_nucleotides, np.array(strand_counts), "".join(sequence), is_circular, is_end, nt_type
    )


def _assemble(
    n_nucleotides: int,
    strand_counts: np.ndarray,
    sequence: str,
    is_circular: list[bool],
    is_end: list[int],
    nt_type: list[int],
) -> Topology:
    bonded = _bonded_neighbors([int(c) for c in strand_counts], is_circular)
    return Topology(
        n_nucleotides=n_nucleotides,
        strand_counts=np.asarray(strand_counts),
        bonded_neighbors=bonded,
        seq=np.array([const.NUCLEOTIDES_IDX[s] for s in sequence], dtype=np.int32),
        is_end=np.array(is_end, dtype=np.int32),
        nt_type=np.array(nt_type, dtype=np.int32),
    )
