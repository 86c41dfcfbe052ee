"""Optimization loops: simple, and a concurrent multi-component scheduler.

Parity reference: mythos/optimization/optimization.py:36-398. The reference's
distributed substrate is Ray (remote simulator/objective tasks, ray.wait event
loop). In the TPU build the differentiable path runs in-process on the device
mesh (see mythos_tpu.parallel), so the host-level scheduler only needs to
coordinate *host* tasks -- external engines (oxDNA/GROMACS/LAMMPS
subprocesses) and objective evaluations. That is ``PoolOptimizer``:
the same scheduling semantics (needs_update re-runs, component state threading,
per-step objective call limits, name-uniqueness) on a concurrent.futures
executor instead of a Ray cluster.
"""

from __future__ import annotations

import concurrent.futures as cf
import logging
from abc import ABC, abstractmethod
from collections.abc import Callable
from dataclasses import field
from typing import Any

import chex
import jax
import jax.numpy as jnp
import optax

from mythos_tpu.optimization.objective import Objective
from mythos_tpu.simulators.base import Simulator
from mythos_tpu.ui.loggers import logger as jdna_logger
from mythos_tpu.utils.helpers import try_to_float
from mythos_tpu.utils.types import Grads, Params

ERR_MISSING_OBJECTIVES = "At least one objective is required."
ERR_MISSING_SIMULATORS = "At least one simulator is required."
ERR_MISSING_AGG_GRAD_FN = "An aggregate gradient function is required."
ERR_MISSING_OPTIMIZER = "An optimizer is required."
ERR_NAME_COLLISION = "All objective, simulator, and exposes names must be unique"

# The first objective attempt may use cached observables and legitimately
# request a re-simulation; after two attempts no new information can arrive.
OBJECTIVE_PER_STEP_CALL_LIMIT = 2

LOGGER = logging.getLogger(__name__)


@chex.dataclass(frozen=True, kw_only=True)
class OptimizerState:
    """All mutable optimization-loop state.

    ``component_state`` is keyed by objective/simulator name (one shared
    namespace -- names must be unique).
    """

    observables: dict[str, Any] = field(default_factory=dict)
    component_state: dict[str, dict[str, Any]] = field(default_factory=dict)
    optimizer_state: Any | None = None


@chex.dataclass(frozen=True, kw_only=True)
class OptimizerOutput:
    """One optimization step's result."""

    grads: Grads
    opt_params: Params
    state: OptimizerState
    observables: dict[str, dict[str, Any]] = field(default_factory=dict)


@chex.dataclass(frozen=True, kw_only=True)
class Optimizer(ABC):
    """Base optimizer: the run loop with callback, logging and NaN guard."""

    logger: jdna_logger.Logger = field(default_factory=lambda: jdna_logger.NullLogger())

    @abstractmethod
    def step(self, params: Params, state: OptimizerState | None = None) -> OptimizerOutput:
        """One optimization step."""

    def run(self, params: Params, n_steps: int, callback: Callable | None = None) -> OptimizerOutput:
        """Run for n_steps; callback(optimizer_output, step) -> (output|None, keep_going).

        Raises RuntimeError on NaN/Inf gradients to prevent silent failures.
        """
        if n_steps < 1:
            raise ValueError("n_steps must be at least 1.")

        state = None
        output = None
        for step in range(n_steps):
            output = self.step(params, state)

            if callback is not None:
                cb_output, keep_going = callback(optimizer_output=output, step=step)
                output = cb_output if cb_output is not None else output
            else:
                keep_going = True

            for component, obs in output.observables.items():
                for obs_name, value in obs.items():
                    if (value := try_to_float(value)) is not None:
                        self.logger.log_metric(f"{component}.{obs_name}", value, step=step)

            if not keep_going:
                LOGGER.info("Early stopping optimization at step %s based on callback signal.", step)
                break

            grad_leaves = jax.tree.leaves(output.grads)
            if any(jnp.any(~jnp.isfinite(leaf)) for leaf in grad_leaves):
                raise RuntimeError(
                    f"NaN or Inf detected in gradients at step {step}. Is your learning rate too high?"
                )

            params = output.opt_params
            state = output.state
        return output


@chex.dataclass(frozen=True)
class SimpleOptimizer(Optimizer):
    """Single simulator + objective: try cached observables, rerun sim if not ready."""

    objective: Objective
    simulator: Simulator
    optimizer: optax.GradientTransformation

    def step(self, params: Params, state: OptimizerState | None = None) -> OptimizerOutput:
        state = state or OptimizerState()
        obj_state = state.component_state.get(self.objective.name, {})
        sim_state = state.component_state.get(self.simulator.name, {})
        obj_output = None

        if state.observables:
            obj_output = self.objective.calculate(state.observables, opt_params=params, **obj_state)
            obj_state = obj_output.state

        if obj_output is None or not obj_output.is_ready:
            sim_output = self.simulator.run(params, **sim_state)
            sim_state = sim_output.state
            exposes = self.simulator.exposes()
            state = state.replace(observables=dict(zip(exposes, sim_output.observables, strict=True)))

            obj_output = self.objective.calculate(state.observables, opt_params=params, **obj_state)
            obj_state = obj_output.state
            if not obj_output.is_ready:
                raise ValueError("Objective readiness check failed after simulation run.")

        grads = obj_output.grads
        opt_state = state.optimizer_state or self.optimizer.init(params)
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)

        return OptimizerOutput(
            opt_params=new_params,
            state=state.replace(
                optimizer_state=opt_state,
                component_state={
                    **state.component_state,
                    self.objective.name: obj_state,
                    self.simulator.name: sim_state,
                },
            ),
            grads=grads,
            observables={self.objective.name: obj_output.observables},
        )


def _simulator_task(simulator: Simulator, params: Params, state: dict[str, Any]):
    output = simulator.run(opt_params=params, **state)
    return output.observables, output.state


def _objective_task(objective: Objective, obs: dict[str, Any], params: Params, state: dict[str, Any]):
    return objective.calculate(observables=obs, opt_params=params, **state)


@chex.dataclass(frozen=True, kw_only=True)
class PoolOptimizer(Optimizer):
    """Multi-objective/multi-simulator optimizer on a concurrent executor.

    The step() event loop schedules every objective whose observables are
    available; not-ready objectives invalidate their stale observables, which
    re-triggers the providing simulators. Gradients are combined by
    ``aggregate_grad_fn`` (objective order), then one optax update.

    ``executor_factory`` defaults to a thread pool (simulators that shell out
    to external engines release the GIL in subprocess waits; jitted device
    work is serialized by JAX anyway). Pass a ProcessPoolExecutor factory for
    CPU-bound host work.
    """

    objectives: list[Objective]
    simulators: list[Simulator]
    aggregate_grad_fn: Callable[[list[Grads]], Grads]
    optimizer: optax.GradientTransformation
    max_workers: int | None = None
    executor_factory: Callable[..., cf.Executor] = cf.ThreadPoolExecutor

    def _effective_max_workers(self) -> int | None:
        """Honor SchedulerHints.num_cpus: size the pool so that concurrent
        tasks' declared CPU needs fit the host (reference analog: Ray options
        from hints, mythos/optimization/optimization.py:217-223)."""
        if self.max_workers is not None:
            return self.max_workers
        import os

        declared = [
            unit.scheduler_hints.num_cpus
            for unit in (*self.objectives, *self.simulators)
            if unit.scheduler_hints is not None and unit.scheduler_hints.num_cpus
        ]
        if not declared:
            return None
        return max(1, (os.cpu_count() or 1) // max(declared))

    def _max_retries(self, unit) -> int:
        hints = getattr(unit, "scheduler_hints", None)
        return hints.max_retries if hints is not None and hints.max_retries else 0

    def __post_init__(self) -> None:
        if not self.objectives:
            raise ValueError(ERR_MISSING_OBJECTIVES)
        if not self.simulators:
            raise ValueError(ERR_MISSING_SIMULATORS)
        if self.aggregate_grad_fn is None:
            raise ValueError(ERR_MISSING_AGG_GRAD_FN)
        if self.optimizer is None:
            raise ValueError(ERR_MISSING_OPTIMIZER)

        all_names = (
            [obj.name for obj in self.objectives]
            + [sim.name for sim in self.simulators]
            + [exp for sim in self.simulators for exp in sim.exposes()]
        )
        if len(all_names) != len(set(all_names)):
            raise ValueError(ERR_NAME_COLLISION)

    # test seam (mirrors the reference's _create_and_run_remote indirection)
    def _submit(self, executor: cf.Executor, fn: Callable, *args) -> cf.Future:
        return executor.submit(fn, *args)

    def step(self, params: Params, state: OptimizerState | None = None) -> OptimizerOutput:  # noqa: C901, PLR0912
        state = state or OptimizerState()
        state_observables = state.observables.copy()
        component_state = state.component_state.copy()

        obj_lookup = {obj.name: obj for obj in self.objectives}
        call_count = dict.fromkeys(obj_lookup, 0)
        sim_lookup = {sim.name: sim for sim in self.simulators}
        expose_lookup = {exp: sim for sim in self.simulators for exp in sim.exposes()}

        futures: dict[cf.Future, str] = {}  # future -> producer tag
        running_producers: set[str] = set()
        grads_completed: dict[str, Grads] = {}
        output_observables: dict[str, dict[str, Any]] = {}
        retries_left = {
            name: self._max_retries(unit)
            for name, unit in {**obj_lookup, **sim_lookup}.items()
        }

        with self.executor_factory(max_workers=self._effective_max_workers()) as pool:
            while (needed := set(obj_lookup) - set(grads_completed)) or futures:
                for obj_name in needed:
                    objective = obj_lookup[obj_name]
                    if obj_name in running_producers:
                        continue
                    if call_count[obj_name] > OBJECTIVE_PER_STEP_CALL_LIMIT:
                        raise RuntimeError(
                            f"Objective {obj_name} could not be resolved after multiple attempts."
                        )
                    if set(objective.required_observables).issubset(state_observables):
                        obj_obs = {k: state_observables[k] for k in objective.required_observables}
                        obj_state = component_state.get(obj_name, {})
                        fut = self._submit(pool, _objective_task, objective, obj_obs, params, obj_state)
                        futures[fut] = obj_name
                        running_producers.add(obj_name)
                        call_count[obj_name] += 1
                    elif set(objective.required_observables) & running_producers:
                        continue
                    else:
                        needed_sims = {expose_lookup[e].name for e in objective.required_observables}
                        for sim_name in needed_sims - running_producers:
                            sim = sim_lookup[sim_name]
                            if set(sim.exposes()) & running_producers:
                                continue
                            sim_state = component_state.get(sim_name, {})
                            fut = self._submit(pool, _simulator_task, sim, params, sim_state)
                            futures[fut] = sim_name
                            running_producers.add(sim_name)
                            running_producers.update(sim.exposes())

                done, _ = cf.wait(list(futures), return_when=cf.FIRST_COMPLETED)
                for fut in done:
                    producer = futures.pop(fut)
                    running_producers.discard(producer)
                    if fut.exception() is not None:
                        # honor SchedulerHints.max_retries: release the
                        # producer so the scheduling pass resubmits it
                        if producer in sim_lookup:
                            running_producers.difference_update(sim_lookup[producer].exposes())
                        if retries_left.get(producer, 0) <= 0:
                            raise fut.exception()
                        retries_left[producer] -= 1
                        if producer in call_count:
                            call_count[producer] -= 1  # retry != fresh attempt
                        LOGGER.warning(
                            "Task %s failed (%s); retrying (%d retries left).",
                            producer, fut.exception(), retries_left[producer],
                        )
                        continue
                    if producer in obj_lookup:
                        output = fut.result()
                        component_state[producer] = output.state
                        if output.is_ready:
                            grads_completed[producer] = output.grads
                            output_observables[producer] = output.observables
                        else:
                            # clear stale observables so the providing
                            # simulators get rescheduled
                            state_observables = {
                                k: v
                                for k, v in state_observables.items()
                                if k not in output.needs_update
                            }
                    else:  # a simulator finished: unpack its observables + state
                        observables, sim_state = fut.result()
                        sim = sim_lookup[producer]
                        for exp, value in zip(sim.exposes(), observables, strict=True):
                            state_observables[exp] = value
                            running_producers.discard(exp)
                        component_state[producer] = sim_state

        grads = self.aggregate_grad_fn([grads_completed[obj.name] for obj in self.objectives])
        opt_state = state.optimizer_state or self.optimizer.init(params)
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)

        return OptimizerOutput(
            opt_params=new_params,
            state=state.replace(
                optimizer_state=opt_state,
                component_state=component_state,
                observables=state_observables,
            ),
            grads=grads,
            observables=output_observables,
        )
