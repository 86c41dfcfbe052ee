"""GROMACS interop helpers: trajectory reading and grompp preprocessing.

Parity reference: mythos/simulators/gromacs/utils.py:20-55. MDAnalysis is an
optional host-side dependency (imported lazily).
"""

from __future__ import annotations

import logging
import shutil
from pathlib import Path

import jax.numpy as jnp
import numpy as np

import mythos_tpu.simulators.io as sio
from mythos_tpu.io.gromacs_input import update_mdp_params
from mythos_tpu.utils.helpers import run_command

ANGSTROMS_TO_NM = 0.1

logger = logging.getLogger(__name__)


def read_trajectory_mdanalysis(topology_file: Path, trajectory_file: Path) -> sio.SimulatorTrajectory:
    """Read a GROMACS trajectory (e.g. .tpr + .trr) via MDAnalysis.

    Positions only (identity quaternions); Angstrom -> nm; skips the initial
    frame so rows align with the energy series.
    """
    import MDAnalysis  # optional dependency

    u = MDAnalysis.Universe(str(topology_file), str(trajectory_file))
    n_frames = len(u.trajectory)
    n_atoms = len(u.atoms)
    logger.debug("Trajectory contains %d frames with %d atoms", n_frames, n_atoms)

    positions = np.stack([ts.positions.copy() for ts in u.trajectory[1:]]).astype(np.float64)
    box_sizes = np.stack([ts.dimensions[:3].copy() for ts in u.trajectory[1:]]).astype(np.float64)
    quaternions = np.tile(np.array([1.0, 0.0, 0.0, 0.0]), (n_frames - 1, n_atoms, 1))

    return sio.SimulatorTrajectory(
        center=jnp.asarray(positions * ANGSTROMS_TO_NM),
        orientation=jnp.asarray(quaternions),
        box_size=jnp.asarray(box_sizes * ANGSTROMS_TO_NM),
    )


def preprocess_topology(
    input_dir: str | Path,
    params: dict | None = None,
    copy_to: Path | None = None,
    output_prefix: str = "preprocessed",
    output_mdp_name: str = "preprocessed.mdp",
    gromacs_binary: str | Path | None = None,
    mdp_name: str = "md.mdp",
    topology_name: str = "topol.top",
    structure_name: str = "membrane.gro",
    index_name: str = "index.ndx",
    log_prefix: str = "topology_preprocess",
) -> None:
    """Run ``gmx grompp`` to macro-expand the topology (the -pp output is what
    parameter replacement edits)."""
    input_dir = Path(input_dir)

    binary_name = gromacs_binary or "gmx"
    gromacs_binary = shutil.which(str(binary_name))
    if not gromacs_binary:
        raise FileNotFoundError(f"GROMACS binary not found or does not exist at: {binary_name}")

    if copy_to is not None:
        copy_dir = Path(copy_to)
        shutil.copytree(input_dir, copy_dir)
        input_dir = copy_dir

    update_mdp_params(input_dir / mdp_name, params or {}, out_file=input_dir / output_mdp_name)
    run_command(
        [
            gromacs_binary,
            "grompp",
            "-p", topology_name,
            "-f", output_mdp_name,
            "-c", structure_name,
            "-n", index_name,
            "-pp", f"{output_prefix}.top",
            "-o", f"{output_prefix}.tpr",
        ],
        cwd=input_dir,
        log_prefix=log_prefix,
    )
