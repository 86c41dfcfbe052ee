"""Simulator base classes.

Parity reference: mythos/simulators/base.py:17-82. A Simulator's ``run``
returns a SimulatorOutput whose observables are matched to objectives by the
exposed names ``"{obs}.{Class}.{name}"``.
"""

from __future__ import annotations

import shutil
import uuid
from abc import ABC, abstractmethod
from dataclasses import field
from pathlib import Path
from tempfile import TemporaryDirectory
from typing import Any, ClassVar

import chex

from mythos_tpu.utils.scheduler import SchedulerUnit


@chex.dataclass(frozen=True)
class SimulatorOutput:
    """Observables (by position, matching exposes()) plus simulator state."""

    observables: list[Any]
    state: dict[str, Any] = field(default_factory=dict)


@chex.dataclass(frozen=True, kw_only=True)
class Simulator(SchedulerUnit):
    """Base class for simulation backends."""

    name: str = field(default_factory=lambda: str(uuid.uuid4()))
    exposed_observables: ClassVar[list[str]] = ["trajectory"]

    def run(self, *_args, opt_params: dict[str, Any], **_kwargs) -> SimulatorOutput:
        """Run the simulation."""

    def exposes(self) -> list[str]:
        """Fully-qualified observable names this simulator produces."""
        return [f"{obs}.{self.__class__.__name__}.{self.name}" for obs in self.exposed_observables]

    @classmethod
    def create_n(cls, n: int, name: str | None = None, **kwargs) -> list["Simulator"]:
        """N replica simulators with unique names."""
        name = name or str(uuid.uuid4())
        return [cls(name=f"{name}.{i}", **kwargs) for i in range(n)]


@chex.dataclass(frozen=True, kw_only=True)
class BoundSimulator(Simulator):
    """Adapt an in-process simulator to the optimizer run protocol.

    Optimizers call ``run(opt_params, **state)``; the in-process simulators
    (TpuSimulator, MartiniSimulator) take positional ``(init, n_steps,
    key)``. This adapter binds the positional arguments and derives a fresh
    PRNG key per invocation -- ``seed`` folded with an invocation counter
    threaded through the optimizer's component state -- so DiffTRe
    resimulation requests actually draw NEW trajectories instead of
    replaying the old one. (The reference reaches the same effect by
    seeding its external engines per task,
    mythos/simulators/oxdna/oxdna.py:119-122.)
    """

    simulator: Any
    run_args: tuple = ()
    seed: int = 0

    def run(self, opt_params: dict[str, Any] | None, seq: int = 0, **_state) -> SimulatorOutput:
        """Run the bound simulator with a per-invocation key."""
        import jax

        key = jax.random.fold_in(jax.random.PRNGKey(self.seed), seq)
        out = self.simulator.run(opt_params, *self.run_args, key)
        return SimulatorOutput(
            observables=out.observables, state={**out.state, "seq": seq + 1}
        )


@chex.dataclass(frozen=True, kw_only=True)
class InputDirSimulator(Simulator, ABC):
    """Simulator driven by an input directory (external engines).

    Copies ``input_dir`` to a temp dir unless ``overwrite_input``, then calls
    :meth:`run_simulation` there.
    """

    input_dir: str
    overwrite_input: bool = False

    def run(self, *args, **kwargs) -> SimulatorOutput:
        if self.overwrite_input:
            return self.run_simulation(Path(self.input_dir), *args, **kwargs)
        with TemporaryDirectory(prefix=f"mythos-tpu-sim-{self.name}") as temp_dir:
            self.copy_inputs(temp_dir)
            return self.run_simulation(Path(temp_dir), *args, **kwargs)

    def copy_inputs(self, temp_dir: str) -> None:
        """Copy input files to the working directory."""
        shutil.copytree(self.input_dir, temp_dir, dirs_exist_ok=True)

    @abstractmethod
    def run_simulation(self, input_dir: Path, *args, **kwargs) -> SimulatorOutput:
        """Run the simulation in the given directory."""
