"""Optimizer checkpoint/resume.

The reference persists state only via caller-driven pytree pickling
(mythos/input/tree.py:11-29) with no periodic checkpointing (SURVEY section 5).
Here checkpointing is first-class: an orbax-backed store saves
(opt_params, OptimizerState, PRNG key, step) periodically and restores the
latest on resume, plus a run()-compatible callback that snapshots every
``every`` steps.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any

import jax

from mythos_tpu.io.tree import load_pytree, save_pytree
from mythos_tpu.optimization.optimization import OptimizerOutput, OptimizerState
from mythos_tpu.utils.types import Params


class CheckpointManager:
    """Periodic checkpointing of the optimization loop.

    Uses orbax when available (async, multi-host safe); falls back to pytree
    pickling otherwise. Layout: ``<directory>/step_<k>`` per checkpoint.
    """

    def __init__(self, directory: str | Path, max_to_keep: int = 3, use_orbax: bool | None = None):
        self.directory = Path(directory)
        self.directory.mkdir(parents=True, exist_ok=True)
        self.max_to_keep = max_to_keep

        if use_orbax is None:
            try:
                import orbax.checkpoint  # noqa: F401

                use_orbax = True
            except ImportError:  # pragma: no cover
                use_orbax = False
        self.use_orbax = use_orbax
        self._manager = None
        if self.use_orbax:
            import orbax.checkpoint as ocp

            self._manager = ocp.CheckpointManager(
                self.directory.absolute(),
                options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
            )

    # -- core save/restore -----------------------------------------------------

    def save(self, step: int, params: Params, state: OptimizerState, key: Any = None) -> None:
        """Persist one snapshot (blocking on the fallback path)."""
        payload = {
            "params": params,
            "observables": state.observables,
            "component_state": state.component_state,
            "optimizer_state": state.optimizer_state,
            "key": key,
            "step": step,
        }
        if self._manager is not None:
            import orbax.checkpoint as ocp

            self._manager.save(step, args=ocp.args.PyTreeSave(payload))
        else:
            save_pytree(payload, self.directory / f"step_{step}.ckpt")
            self._prune()

    def restore(self, step: int | None = None) -> tuple[int, Params, OptimizerState, Any] | None:
        """(step, params, OptimizerState, key) of the given/latest snapshot."""
        if self._manager is not None:
            step = step if step is not None else self._manager.latest_step()
            if step is None:
                return None
            payload = self._manager.restore(step)
        else:
            ckpts = sorted(self.directory.glob("step_*.ckpt"), key=self._step_of)
            if not ckpts:
                return None
            path = ckpts[-1] if step is None else self.directory / f"step_{step}.ckpt"
            payload = load_pytree(path)

        state = OptimizerState(
            observables=payload["observables"],
            component_state=payload["component_state"],
            optimizer_state=payload["optimizer_state"],
        )
        return int(payload["step"]), payload["params"], state, payload["key"]

    def wait_until_finished(self) -> None:
        """Block until async orbax writes complete."""
        if self._manager is not None:
            self._manager.wait_until_finished()

    # -- run() integration ------------------------------------------------------

    def callback(self, every: int = 1):
        """An Optimizer.run callback that checkpoints every ``every`` steps."""

        def _cb(optimizer_output: OptimizerOutput, step: int):
            if step % every == 0:
                self.save(step, optimizer_output.opt_params, optimizer_output.state)
            return None, True

        return _cb

    @staticmethod
    def _step_of(path: Path) -> int:
        return int(path.stem.split("_")[1])

    def _prune(self) -> None:
        ckpts = sorted(self.directory.glob("step_*.ckpt"), key=self._step_of)
        for stale in ckpts[: -self.max_to_keep]:
            stale.unlink()


def save_run(path: str | Path, params: Params, state: OptimizerState, key: Any = None) -> None:
    """One-shot convenience save (pickle pytree)."""
    save_pytree({"params": params, "state": dataclasses.asdict(state) if dataclasses.is_dataclass(state) else dict(state), "key": key}, path)


def load_run(path: str | Path) -> dict:
    """Load a one-shot save."""
    return load_pytree(path)
