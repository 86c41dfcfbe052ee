"""oxDNA trajectory (.dat) reading/writing.

Parity reference: mythos/input/trajectory.py:39-331. The reference parses
line-by-line in Python with byte-range multiprocessing; here the whole file is
parsed in one vectorized numpy pass (np.fromstring over the concatenated state
rows), which is faster single-threaded than the reference's parallel reader
for typical trajectory sizes. ``n_processes`` is accepted for API parity.
"""

from __future__ import annotations

from pathlib import Path
from typing import TextIO

import chex
import numpy as np

import mythos_tpu.utils.math as jdm
from mythos_tpu.rigid_body import RigidBody
from mythos_tpu.utils.types import Arr, PathOrStr, Vector3D

N_STATE_COLS = 15

ERR_FILE_NOT_FOUND = "Trajectory file not found: {}"
ERR_N_NUCLEOTIDE_STRAND_LENGTHS = "n_nucleotides and sum(strand_lengths) do not match"
ERR_T_E_S_LENGTHS = "times, energies, and states do not have the same length"
ERR_TIMES_DIMS = "times must be a 1D array"
ERR_ENERGIES_SHAPE = "energies must be a 2D array with shape (n_states, 3)"
ERR_STATE_SHAPE = "Invalid shape for nucleotide states:"
ERR_FIXED_BOX_SIZE = "Only trajectories in a fixed box size are supported"
ERR_MALFORMED = "Malformed trajectory file: {}"


@chex.dataclass(frozen=True)
class NucleotideState:
    """A single (N, 15) state: com, a1, a3, velocity, angular momentum."""

    array: np.ndarray

    def __post_init__(self) -> None:
        if not isinstance(self.array, np.ndarray):
            raise TypeError(ERR_STATE_SHAPE + str(type(self.array)))
        if self.array.ndim != 2 or self.array.shape[1] != N_STATE_COLS:
            raise ValueError(ERR_STATE_SHAPE + str(self.array.shape))

    @property
    def com(self) -> Arr:
        return self.array[:, :3]

    @property
    def back_base_vector(self) -> Arr:
        return self.array[:, 3:6]

    @property
    def base_normal(self) -> Arr:
        return self.array[:, 6:9]

    @property
    def velocity(self) -> Arr:
        return self.array[:, 9:12]

    @property
    def angular_velocity(self) -> Arr:
        return self.array[:, 12:15]

    @property
    def euler_angles(self) -> tuple[Arr, Arr, Arr]:
        """Tait-Bryan angles of the (a1, a3 x a1, a3) frame."""
        return jdm.principal_axes_to_euler_angles(
            self.back_base_vector,
            np.cross(self.base_normal, self.back_base_vector),
            self.base_normal,
        )

    @property
    def quaternions(self) -> Arr:
        return jdm.euler_angles_to_quaternion(*self.euler_angles)

    def to_rigid_body(self) -> RigidBody:
        return RigidBody(center=self.com, orientation=self.quaternions)


@chex.dataclass(frozen=True)
class Trajectory:
    """A parsed oxDNA trajectory."""

    n_nucleotides: int
    strand_lengths: list[int]
    times: Arr
    energies: Arr
    states: list[NucleotideState]
    box_size: Vector3D | None = None

    def __post_init__(self) -> None:
        if self.n_nucleotides != sum(self.strand_lengths):
            raise ValueError(ERR_N_NUCLEOTIDE_STRAND_LENGTHS)
        if not isinstance(self.times, np.ndarray):
            raise TypeError("times must be a numpy array")
        if not isinstance(self.energies, np.ndarray):
            raise TypeError("energies must be a numpy array")
        if len(self.times) != len(self.energies) or len(self.times) != len(self.states):
            raise ValueError(ERR_T_E_S_LENGTHS)
        if self.times.ndim != 1:
            raise ValueError(ERR_TIMES_DIMS)
        if self.energies.ndim != 2 or self.energies.shape[1] != 3:
            raise ValueError(ERR_ENERGIES_SHAPE)

    @property
    def state_rigid_bodies(self) -> list[RigidBody]:
        return [s.to_rigid_body() for s in self.states]

    @property
    def state_rigid_body(self) -> RigidBody:
        """All states stacked into one (S, N, ...) RigidBody."""
        return RigidBody(
            center=np.stack([s.com for s in self.states]),
            orientation=np.stack([s.quaternions for s in self.states]),
        )

    def slice(self, key: int | slice) -> "Trajectory":
        return Trajectory(
            n_nucleotides=self.n_nucleotides,
            strand_lengths=self.strand_lengths,
            times=self.times[key],
            energies=self.energies[key],
            states=self.states[key],
            box_size=self.box_size,
        )

    def __repr__(self) -> str:
        return (
            f"Trajectory(n_nucleotides={self.n_nucleotides}, "
            f"strand_lengths={self.strand_lengths}, n_states={len(self.states)})"
        )

    def to_file(self, filepath: PathOrStr) -> None:
        """Write in oxDNA text format (box '0 0 0' if unknown)."""
        box = self.box_size if self.box_size is not None else (0, 0, 0)
        with Path(filepath).open("w") as f:
            for i in range(len(self.times)):
                _write_state(f, self.times[i], self.energies[i], self.states[i].array, box)


def validate_box_size(state_box_sizes: np.ndarray) -> None:
    """Require the box to be constant over the trajectory."""
    if not np.all(state_box_sizes == state_box_sizes[0]):
        raise ValueError(ERR_FIXED_BOX_SIZE)


def from_file(
    path: PathOrStr,
    strand_lengths: list[int] | np.ndarray,
    *,
    is_5p_3p: bool = True,
    n_processes: int = 1,  # noqa: ARG001 - API parity; vectorized parse needs no workers
) -> Trajectory:
    """Parse an oxDNA trajectory file.

    File format per state::

        t = <time>
        b = <bx> <by> <bz>
        E = <e1> <e2> <e3>
        <15 floats> x n_nucleotides

    If ``is_5p_3p`` the per-strand nucleotide order is flipped to the internal
    3'->5' layout.
    """
    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(ERR_FILE_NOT_FOUND.format(path))

    strand_lengths = [int(x) for x in strand_lengths]
    n = sum(strand_lengths)

    # native C++ parser first (mmap + strtod, ~100x the Python reader);
    # vectorized numpy text parse as the fallback
    from mythos_tpu.io import native

    parsed = native.parse_trajectory(path, n)
    if parsed is not None:
        times_arr, bs_arr, es_arr, states = parsed
        ts = list(times_arr)
        bs = list(bs_arr)
        es = list(es_arr)
    else:
        text = path.read_text()
        ts, bs, es, rows = [], [], [], []
        for line in text.splitlines():
            c = line[0] if line else ""
            if c == "t":
                ts.append(float(line.split("=", 1)[1]))
            elif c == "b":
                bs.append(np.fromstring(line.split("=", 1)[1], sep=" "))
            elif c == "E":
                es.append(np.fromstring(line.split("=", 1)[1], sep=" "))
            elif line.strip():
                rows.append(line)

        data = np.fromstring(" ".join(rows), sep=" ", dtype=np.float64)
        if data.size != len(ts) * n * N_STATE_COLS:
            raise ValueError(ERR_MALFORMED.format(path))
        states = data.reshape(len(ts), n, N_STATE_COLS)

    if is_5p_3p:
        order = np.concatenate(
            [np.arange(s, e)[::-1] for s, e in _strand_bounds(strand_lengths)]
        )
        states = states[:, order]

    validate_box_size(np.array(bs))

    return Trajectory(
        box_size=bs[0],
        n_nucleotides=n,
        strand_lengths=strand_lengths,
        times=np.array(ts, dtype=np.float64),
        energies=np.array(es, dtype=np.float64),
        states=[NucleotideState(array=np.ascontiguousarray(s)) for s in states],
    )


def _strand_bounds(strand_lengths: list[int]) -> list[tuple[int, int]]:
    bounds = []
    start = 0
    for length in strand_lengths:
        bounds.append((start, start + length))
        start += length
    return bounds


def _write_state(
    file: TextIO, time: float, energies: Vector3D, state: np.ndarray, box_size: Vector3D = (0, 0, 0)
) -> None:
    file.write(f"t = {time}\n")
    file.write(f"b = {box_size[0]} {box_size[1]} {box_size[2]}\n")
    file.write(f"E = {energies[0]} {energies[1]} {energies[2]}\n")
    for nucleotide in state:
        file.write(" ".join(map(str, nucleotide)) + "\n")
