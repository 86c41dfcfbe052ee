"""Minimal GROMACS TRR trajectory reader (pure numpy, no MDAnalysis).

The reference reads GROMACS trajectories through MDAnalysis
(mythos/simulators/gromacs/utils.py read_trajectory_mdanalysis); this image
ships without it, and TRR is a simple big-endian XDR container, so the
frames are parsed directly: per frame a fixed header (magic 1993, version
string, section byte sizes), the 3x3 box, optional virial/pressure tensors,
then x/v/f arrays. Single and double precision files are auto-detected from
the section sizes.
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np

_MAGIC = 1993


class TrrFrame:
    __slots__ = ("time", "step", "box", "positions", "velocities", "forces")

    def __init__(self, time, step, box, positions, velocities, forces):
        self.time = time
        self.step = step
        self.box = box
        self.positions = positions
        self.velocities = velocities
        self.forces = forces


def read_trr(path: str | Path) -> list[TrrFrame]:
    """All frames of a .trr file; positions in nm, box as (3,) diagonal."""
    data = Path(path).read_bytes()
    off = 0
    frames: list[TrrFrame] = []

    def u32() -> int:
        nonlocal off
        v = struct.unpack_from(">i", data, off)[0]
        off += 4
        return v

    while off + 4 <= len(data):
        magic = u32()
        if magic != _MAGIC:
            raise ValueError(f"bad TRR magic {magic} at offset {off - 4}")
        u32()  # version tag
        slen = u32()
        off += (slen + 3) // 4 * 4  # version string, XDR-padded
        (
            _ir,
            _e,
            box_size,
            vir_size,
            pres_size,
            _top,
            _sym,
            x_size,
            v_size,
            f_size,
        ) = (u32() for _ in range(10))
        natoms, step, _nre = u32(), u32(), u32()
        double = box_size == 9 * 8 or x_size == natoms * 3 * 8
        fsize = 8 if double else 4
        dt = ">f8" if double else ">f4"
        time = struct.unpack_from(">d" if double else ">f", data, off)[0]
        off += fsize
        off += fsize  # lambda

        def arr(nbytes: int, shape: tuple):
            nonlocal off
            if nbytes == 0:
                return None
            a = np.frombuffer(data, dtype=dt, count=nbytes // fsize, offset=off)
            off += nbytes
            return np.ascontiguousarray(a.reshape(shape).astype(np.float64))

        box = arr(box_size, (3, 3))
        arr(vir_size, (3, 3))
        arr(pres_size, (3, 3))
        x = arr(x_size, (natoms, 3))
        v = arr(v_size, (natoms, 3))
        f = arr(f_size, (natoms, 3))
        frames.append(
            TrrFrame(time, step, None if box is None else np.diag(box), x, v, f)
        )
    return frames


def trajectory_from_trr(path: str | Path):
    """Stacked SimulatorTrajectory (identity orientations) from a .trr."""
    import jax.numpy as jnp

    from mythos_tpu.simulators.io import SimulatorTrajectory

    frames = read_trr(path)
    centers = jnp.asarray(np.stack([f.positions for f in frames]))
    boxes = jnp.asarray(np.stack([f.box for f in frames]))
    n = centers.shape[1]
    quats = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0, 0.0]), (len(frames), n, 4))
    return SimulatorTrajectory(center=centers, orientation=quats, box_size=boxes)


def read_xvg(path: str | Path) -> np.ndarray:
    """(rows, cols) numeric data of a GROMACS .xvg (comments stripped)."""
    rows = []
    for line in Path(path).read_text().splitlines():
        if line.startswith(("#", "@")) or not line.strip():
            continue
        rows.append([float(tok) for tok in line.split()])
    return np.asarray(rows)
