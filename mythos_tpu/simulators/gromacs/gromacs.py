"""Wrapper around the external GROMACS engine (MARTINI validation backend).

Parity reference: mythos/simulators/gromacs/gromacs.py:27-206. Parameter
injection rewrites the grompp-preprocessed topology; an optional
equilibration phase precedes production; trajectories read back via
MDAnalysis with kT = KB * ref_t.
"""

from __future__ import annotations

import logging
import shutil
from dataclasses import field
from pathlib import Path
from typing import Any

import chex
import jax.numpy as jnp
import numpy as np

import mythos_tpu.simulators.io as sio
from mythos_tpu.energy.base import EnergyFunction
from mythos_tpu.io.gromacs_input import read_mdp, replace_params_in_topology
from mythos_tpu.simulators.base import InputDirSimulator, SimulatorOutput
from mythos_tpu.simulators.gromacs import utils as gromacs_utils
from mythos_tpu.utils.helpers import run_command, try_to_float

PREPROCESSED_PREFIX = "preprocessed"
OUTPUT_PREFIX = "output"
KB = 0.0083144621  # kJ/(mol K)

logger = logging.getLogger(__name__)


@chex.dataclass(frozen=True, kw_only=True)
class GromacsSimulator(InputDirSimulator):
    """Run GROMACS from an input directory, injecting framework parameters."""

    energy_fn: EnergyFunction
    mdp_file: str = "md.mdp"
    topology_file: str = "topol.top"
    structure_file: str = "membrane.gro"
    index_file: str = "index.ndx"
    equilibration_steps: int = 0
    simulation_steps: int | None = None
    binary_path: Path | None = None
    input_overrides: dict[str, Any] = field(default_factory=dict)

    def __post_init__(self, *args, **kwds) -> None:
        input_dir = Path(self.input_dir)
        if not input_dir.exists():
            raise FileNotFoundError(f"Input directory not found: {input_dir}")
        for file in (self.mdp_file, self.topology_file, self.structure_file, self.index_file):
            if not (input_dir / file).exists():
                raise FileNotFoundError(f"Required input file '{file}' not found in {input_dir}")

    def run_simulation(
        self,
        input_dir: Path,
        opt_params: dict[str, Any] | None = None,
        seed: int | None = None,
        **_,
    ) -> SimulatorOutput:
        """Inject params into the preprocessed topology, equilibrate
        (optional), run production, read the trajectory back."""
        self._update_topology_params(input_dir, opt_params or {})

        seed = seed or np.random.default_rng().integers(0, 2**31)
        sim_steps_override = (
            {"nsteps": self.simulation_steps} if self.simulation_steps is not None else {}
        )
        overrides = {**self.input_overrides, "gen-seed": seed, **sim_steps_override}

        if self.equilibration_steps > 0:
            logger.info("Running equilibration for %d steps", self.equilibration_steps)
            eq_overrides = {
                **overrides,
                "nsteps": self.equilibration_steps,
                "nstxout": 0,
                "nstenergy": 0,
            }
            self._run_simulation_step(
                structure_file=self.structure_file,
                overrides=eq_overrides,
                input_dir=input_dir,
                step="equilibration",
            )

        prod_structure = f"{OUTPUT_PREFIX}.gro" if self.equilibration_steps > 0 else self.structure_file
        logger.info("Starting GROMACS production run")
        self._run_simulation_step(
            structure_file=prod_structure,
            overrides=overrides,
            input_dir=input_dir,
            step="production",
        )

        prod_mdp = read_mdp(input_dir / f"production_{self.mdp_file}")
        ref_t = try_to_float(prod_mdp.get("ref-t") or prod_mdp.get("ref_t"))

        return SimulatorOutput(observables=[self._read_trajectory(input_dir, ref_t=ref_t)])

    def _run_simulation_step(
        self, structure_file: str, overrides: dict[str, Any], input_dir: Path, step: str
    ) -> None:
        step_mdp = f"{step}_{self.mdp_file}"
        gromacs_utils.preprocess_topology(
            input_dir=input_dir,
            params=overrides,
            output_prefix=OUTPUT_PREFIX,
            output_mdp_name=step_mdp,
            log_prefix=f"{step}_grompp",
            gromacs_binary=self.binary_path,
            mdp_name=self.mdp_file,
            structure_name=structure_file,
            topology_name=f"{PREPROCESSED_PREFIX}.top",
            index_name=self.index_file,
        )
        self._run_gromacs(
            ["mdrun", "-deffnm", OUTPUT_PREFIX, "-ntmpi", "1", "-rdd", "1.5"],
            cwd=input_dir,
            log_prefix=f"{step}_mdrun",
        )

    def _run_gromacs(self, cmd: list[str], cwd: Path, log_prefix: str) -> None:
        gmx_binary = self.binary_path or shutil.which("gmx")
        if gmx_binary is None:
            raise FileNotFoundError(
                "GROMACS binary not found. Install GROMACS into PATH or provide binary_path."
            )
        run_command([gmx_binary, *cmd], cwd=cwd, log_prefix=log_prefix)

    def _read_trajectory(self, input_dir: Path, ref_t: float | None = None) -> sio.SimulatorTrajectory:
        trajectory = gromacs_utils.read_trajectory_mdanalysis(
            topology_file=input_dir / f"{OUTPUT_PREFIX}.tpr",
            trajectory_file=input_dir / f"{OUTPUT_PREFIX}.trr",
        )
        if ref_t is not None:
            trajectory = trajectory.replace(
                temperature=jnp.full(trajectory.length(), KB * ref_t)
            )
        return trajectory

    def _update_topology_params(self, input_dir: Path, params: dict[str, Any]) -> None:
        """grompp -pp to macro-expand, then rewrite parameter lines."""
        gromacs_utils.preprocess_topology(
            input_dir=input_dir,
            params=self.input_overrides,
            output_prefix=PREPROCESSED_PREFIX,
            output_mdp_name=f"{PREPROCESSED_PREFIX}.mdp",
            log_prefix="topology_pp",
            gromacs_binary=self.binary_path,
            mdp_name=self.mdp_file,
            structure_name=self.structure_file,
            topology_name=self.topology_file,
            index_name=self.index_file,
        )
        topo_pp = input_dir / f"{PREPROCESSED_PREFIX}.top"
        if not topo_pp.exists():
            raise FileNotFoundError(f"Preprocessed topology file not found after grompp: {topo_pp}")
        replace_params_in_topology(topo_pp, params, topo_pp)
