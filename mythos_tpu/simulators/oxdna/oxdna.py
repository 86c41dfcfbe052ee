"""Wrapper around the standalone oxDNA C++/CUDA engine.

Parity reference: mythos/simulators/oxdna/oxdna.py:52-275. This backend is
kept for validation/interop: parameter updates are compiled into the binary
by writing a ``model.h`` macro header and re-running cmake+make; the run
shells out to the binary and reads back the text trajectory. The
differentiable TPU engine (simulators/tpu.py) is the primary path.
"""

from __future__ import annotations

import logging
import os
import shutil
from dataclasses import field
from pathlib import Path
from typing import Any, ClassVar

import chex
import jax.numpy as jnp
import numpy as np
import pandas as pd

import mythos_tpu.io.oxdna_input as oxdna_io
import mythos_tpu.simulators.io as sio
import mythos_tpu.simulators.oxdna.utils as oxdna_utils
from mythos_tpu.energy.base import EnergyFunction
from mythos_tpu.simulators.base import InputDirSimulator, SimulatorOutput
from mythos_tpu.utils.helpers import run_command
from mythos_tpu.utils.types import Params
from mythos_tpu.utils.units import get_kt_from_string

MAKE_BIN_ENV_VAR = "MAKE_BIN_PATH"
CMAKE_BIN_ENV_VAR = "CMAKE_BIN_PATH"

logger = logging.getLogger(__name__)


def _guess_binary_location(bin_name: str, env_var: str) -> Path:
    if bin_loc := os.environ.get(env_var, shutil.which(bin_name)):
        return bin_loc
    raise FileNotFoundError(f"executable {bin_name}")


@chex.dataclass(frozen=True, kw_only=True)
class oxDNASimulator(InputDirSimulator):  # noqa: N801 - domain naming
    """Run the external oxDNA binary, optionally recompiling with new params.

    Exactly one of ``binary_path`` (precompiled; params must be ignored) or
    ``source_path`` (compile with params baked into model.h) must be set.
    """

    energy_fn: EnergyFunction
    n_build_threads: int = 4
    logger_config: dict[str, Any] | None = None
    binary_path: Path | None = None
    source_path: Path | None = None
    ignore_params: bool = False
    input_overrides: dict[str, Any] = field(default_factory=dict)

    def __post_init__(self, *args, **kwds) -> None:
        if not (bool(self.binary_path) ^ bool(self.source_path)):
            raise ValueError("Must set one and only one of binary_path or source_path")
        if not (Path(self.input_dir) / "input").exists():
            raise FileNotFoundError(f"Input file not found at: {Path(self.input_dir) / 'input'}")

    def with_cached_build(self, binary_path: Path) -> "oxDNASimulator":
        """Switch to a precompiled binary (shared-filesystem clusters)."""
        return self.replace(binary_path=binary_path, source_path=None, ignore_params=True)

    def run_simulation(
        self, input_dir: Path, opt_params: Params | None = None, seed: float | None = None, **_
    ) -> SimulatorOutput:
        """Seed + override the input file, (re)build if needed, run, read back."""
        input_config = oxdna_io.read(input_dir / "input")
        input_config.update(self.input_overrides)
        input_config["seed"] = seed or np.random.default_rng().integers(0, 2**32)
        oxdna_io.write(input_config, input_dir / "input")

        if opt_params is not None:
            if self.source_path:
                self.build(input_dir=input_dir, new_params=opt_params, input_config=input_config)
            elif not self.ignore_params:
                raise ValueError("params provided without source_path. Set ignore_params to override")
        elif self.source_path:
            self.build(input_dir=input_dir, new_params={}, input_config=input_config)
        binary_path = self.binary_path or input_dir / "oxdna-build" / "bin" / "oxDNA"

        # stale outputs would otherwise be appended to
        for output in ("trajectory_file", "energy_file"):
            if file := input_config.get(output):
                input_dir.joinpath(file).unlink(missing_ok=True)

        logger.info("Starting oxDNA simulation")
        run_command([binary_path, "input"], cwd=input_dir, log_prefix="oxdna")
        logger.info("oxDNA simulation complete")

        return SimulatorOutput(observables=[self._read_trajectory(input_dir, input_config)])

    def _read_trajectory(self, input_dir: Path, input_config: dict) -> sio.SimulatorTrajectory:
        trajectory = oxdna_utils.read_output_trajectory(input_file=input_dir / "input")
        kt = self._extract_kt(input_config)
        n_states = trajectory.state_rigid_body.center.shape[0]
        temperature = jnp.full(n_states, kt) if kt is not None else None
        return sio.SimulatorTrajectory.from_rigid_body(
            trajectory.state_rigid_body, temperature=temperature
        )

    @staticmethod
    def _extract_kt(input_config: dict) -> float | None:
        t_value = input_config.get("T")
        return None if t_value is None else get_kt_from_string(str(t_value))

    def build(self, *, input_dir: Path, new_params: Params, input_config: dict | None = None) -> None:
        """Bake params into model.h and recompile the oxDNA binary."""
        cmake_bin = _guess_binary_location("cmake", CMAKE_BIN_ENV_VAR)
        make_bin = _guess_binary_location("make", MAKE_BIN_ENV_VAR)

        build_dir = input_dir / "oxdna-build"
        logger.info("Updating oxDNA parameters (build path: %s)", build_dir)
        build_dir.mkdir(parents=True, exist_ok=True)

        model_h = build_dir / "model.h"
        if not model_h.exists():
            model_h.write_text(Path(self.source_path).joinpath("src/model.h").read_text())

        updated_params = self.energy_fn.with_params(new_params).params_dict(exclude_non_optimizable=True)
        oxdna_utils.update_params(model_h, updated_params)

        input_config = input_config or oxdna_io.read(input_dir / "input")

        if not (build_dir / "CMakeLists.txt").exists():
            cmd = [cmake_bin, self.source_path, f"-DCMAKE_CXX_FLAGS=--include {model_h}"]
            if input_config.get("backend") == "CUDA":
                cmd = [*cmd, "-DCUDA=ON", "-DCUDA_COMMON_ARCH=OFF"]
            run_command(cmd, cwd=build_dir, log_prefix="oxdna.cmake")

        # clean since model.h is not tracked by the build system
        run_command(
            [make_bin, f"-j{self.n_build_threads}", "clean", "oxDNA"],
            cwd=build_dir,
            log_prefix="oxdna.make",
        )
        logger.info("oxDNA binary rebuilt")


class UmbrellaEnergyInfo(pd.DataFrame):
    """Energy DataFrame wrapper enabling type-based observable filtering."""


def _reweight_from_histogram(hist: pd.DataFrame) -> pd.DataFrame:
    """Next-iteration umbrella weights: w proportional to 1/unbiased_count."""
    op_cols = list(hist.columns[: hist.columns.get_loc("count")])
    hist = hist.set_index(op_cols)
    weights = hist.query("unbiased_count > 0").eval("weights = 1 / unbiased_count")[["weights"]]
    weights /= weights.min()  # numerical stability
    return weights.reindex(hist.index, fill_value=0)


@chex.dataclass(frozen=True, kw_only=True)
class oxDNAUmbrellaSampler(oxDNASimulator):  # noqa: N801 - domain naming
    """oxDNA umbrella sampling: exposes trajectory + energy_info and feeds
    recomputed weights (from the last histogram) to the next run."""

    exposed_observables: ClassVar[list[str]] = ["trajectory", "energy_info"]

    def __post_init__(self, *args, **kwds) -> None:
        oxDNASimulator.__post_init__(self, *args, **kwds)
        input_config = oxdna_io.read(Path(self.input_dir) / "input")
        for key in ("umbrella_sampling", "op_file", "weights_file"):
            if key not in input_config:
                raise ValueError("Missing required umbrella sampling config in input file: " + key)
        if input_config["umbrella_sampling"] != 1:
            raise ValueError("umbrella_sampling must be set to 1 in input file")

    def run_simulation(
        self, input_dir: Path, opt_params: Params | None = None, weights: pd.DataFrame | None = None, **kwargs
    ) -> SimulatorOutput:
        """Optionally rewrite the weights file, run, and recompute weights."""
        if weights is not None:
            wfile = oxdna_io.read(input_dir / "input")["weights_file"]
            weights.to_csv(input_dir / wfile, sep=" ", header=False)

        output = oxDNASimulator.run_simulation(self, input_dir, opt_params=opt_params, **kwargs)
        trajectory = output.observables[0]
        energy_df = UmbrellaEnergyInfo(oxdna_utils.read_energy(input_dir))

        hist = oxdna_utils.read_last_hist(input_dir)
        output.state["weights"] = _reweight_from_histogram(hist)

        return SimulatorOutput(observables=[trajectory, energy_df], state=output.state)
