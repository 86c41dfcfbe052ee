"""Scheduler-protocol matrix for PoolOptimizer and the Optimizer.run loop.

Ports the reference's mocked scheduling scenarios
(mythos/optimization/tests/test_optimization.py:141-980): construction
validation, state threading across retries and steps, multi-observable
simulators, unresolvable-objective errors, and the run loop's callback /
metric-logging / early-stopping contract.
"""

import chex
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mythos_tpu.optimization import (
    Objective,
    ObjectiveOutput,
    OptimizerState,
    PoolOptimizer,
)
from mythos_tpu.simulators.base import Simulator, SimulatorOutput
from mythos_tpu.simulators.io import SimulatorTrajectory
from mythos_tpu.ui.loggers.logger import Logger


def _traj(n_states: int = 2) -> SimulatorTrajectory:
    return SimulatorTrajectory(
        center=jnp.zeros((n_states, 2, 3)),
        orientation=jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (n_states, 2, 1)),
        temperature=jnp.full(n_states, 0.1),
    )


@chex.dataclass(frozen=True, kw_only=True)
class RecordingSimulator(Simulator):
    """Returns one trajectory observable; records every call's kwargs."""

    calls: list = None

    def __post_init__(self):
        if self.calls is None:
            object.__setattr__(self, "calls", [])

    def run(self, opt_params=None, **kwargs) -> SimulatorOutput:
        self.calls.append({"opt_params": opt_params, **kwargs})
        return SimulatorOutput(
            observables=[_traj()], state={"runs": kwargs.get("runs", 0) + 1}
        )


def _objective(name, obs_names, grads=None):
    grads = grads if grads is not None else {"x": jnp.array(2.0)}

    def grad_fn(_traj):
        return grads, [("loss", 4.0)]

    return Objective(name=name, required_observables=tuple(obs_names), grad_or_loss_fn=grad_fn)


def _pool(objectives, simulators, **kw):
    kw.setdefault("aggregate_grad_fn", lambda gs: gs[0])
    kw.setdefault("optimizer", optax.sgd(0.1))
    return PoolOptimizer(objectives=objectives, simulators=simulators, **kw)


# -- construction validation ------------------------------------------------------


def test_raises_when_no_objectives():
    sim = RecordingSimulator(name="sim")
    with pytest.raises(ValueError, match="objective"):
        _pool([], [sim])


def test_raises_when_no_simulators():
    obj = _objective("obj", ["t"])
    with pytest.raises(ValueError, match="simulator"):
        _pool([obj], [])


def test_raises_when_no_aggregate_grad_fn():
    sim = RecordingSimulator(name="sim")
    obj = _objective("obj", sim.exposes())
    with pytest.raises(ValueError, match="gradient function"):
        _pool([obj], [sim], aggregate_grad_fn=None)


def test_raises_when_no_optimizer():
    sim = RecordingSimulator(name="sim")
    obj = _objective("obj", sim.exposes())
    with pytest.raises(ValueError, match="optimizer"):
        _pool([obj], [sim], optimizer=None)


def test_raises_when_duplicate_objective_names():
    sim = RecordingSimulator(name="sim")
    objs = [_objective("dup", sim.exposes()), _objective("dup", sim.exposes())]
    with pytest.raises(ValueError, match="unique"):
        _pool(objs, [sim])


def test_raises_when_duplicate_exposes():
    sims = [RecordingSimulator(name="sim"), RecordingSimulator(name="sim")]
    obj = _objective("obj", sims[0].exposes())
    with pytest.raises(ValueError, match="unique"):
        _pool([obj], sims)


def test_raises_when_exposes_and_name_clash():
    sim = RecordingSimulator(name="sim")
    obj = _objective(sim.exposes()[0], sim.exposes())  # objective named like the observable
    with pytest.raises(ValueError, match="unique"):
        _pool([obj], [sim])


# -- step semantics ---------------------------------------------------------------


def test_step_returns_optimizer_output():
    sim = RecordingSimulator(name="sim")
    obj = _objective("obj", sim.exposes())
    out = _pool([obj], [sim]).step({"x": jnp.array(1.0)})
    assert float(out.grads["x"]) == 2.0
    np.testing.assert_allclose(float(out.opt_params["x"]), 0.8, atol=1e-6)
    assert "obj" in out.observables
    assert dict(out.observables["obj"])["loss"] == 4.0


def test_step_calls_simulator_with_state():
    sim = RecordingSimulator(name="sim")
    obj = _objective("obj", sim.exposes())
    opt = _pool([obj], [sim])
    state = OptimizerState(component_state={"sim": {"runs": 41}})
    out = opt.step({"x": jnp.array(1.0)}, state)
    assert sim.calls[-1]["runs"] == 41
    assert out.state.component_state["sim"]["runs"] == 42


def test_step_passes_objective_state_on_retry():
    """A not-ready objective's returned state reaches its second attempt."""
    sim = RecordingSimulator(name="sim")
    obs = sim.exposes()[0]
    seen_states = []

    @chex.dataclass(frozen=True, kw_only=True)
    class StatefulObjective(Objective):
        def calculate(self, observables, opt_params=None, **state):
            seen_states.append(dict(state))
            if not state.get("warmed"):
                return ObjectiveOutput(
                    is_ready=False, needs_update=(obs,), state={"warmed": True}
                )
            return ObjectiveOutput(
                is_ready=True, grads={"x": jnp.array(1.0)}, state={"warmed": True}
            )

    obj = StatefulObjective(name="obj", required_observables=(obs,), grad_or_loss_fn=lambda: None)
    out = _pool([obj], [sim]).step({"x": jnp.array(0.0)}, OptimizerState(observables={obs: _traj()}))
    assert seen_states[0] == {}
    assert seen_states[1] == {"warmed": True}
    assert out.state.component_state["obj"] == {"warmed": True}


def test_step_stores_component_state_in_optimizer_state():
    sim = RecordingSimulator(name="sim")
    obj = _objective("obj", sim.exposes())
    out = _pool([obj], [sim]).step({"x": jnp.array(1.0)})
    assert out.state.component_state["sim"] == {"runs": 1}
    assert "obj" in out.state.component_state


def test_optimizer_state_preserved_across_steps():
    """adam's momentum must thread through OptimizerState.optimizer_state."""
    sim = RecordingSimulator(name="sim")
    obj = _objective("obj", sim.exposes())
    opt = _pool([obj], [sim], optimizer=optax.adam(0.1))
    out1 = opt.step({"x": jnp.array(1.0)})
    assert out1.state.optimizer_state is not None
    out2 = opt.step(out1.opt_params, out1.state)
    mu = out2.state.optimizer_state[0].mu["x"]
    # two identical grads under adam: mu = g*(1-b1)*(1+b1)
    np.testing.assert_allclose(float(mu), 2.0 * (1 - 0.9) * (1 + 0.9), rtol=1e-5)


def test_step_with_multiple_objectives_and_simulators():
    sims = [RecordingSimulator(name=f"sim{i}") for i in range(3)]
    objs = [_objective(f"obj{i}", sims[i].exposes(), {"x": jnp.array(float(i))}) for i in range(3)]
    opt = _pool(
        objs, sims,
        aggregate_grad_fn=lambda gs: {"x": sum(g["x"] for g in gs)},
    )
    out = opt.step({"x": jnp.array(0.0)})
    # grads aggregate in objective order: 0 + 1 + 2
    np.testing.assert_allclose(float(out.grads["x"]), 3.0, atol=1e-12)
    assert all(s.calls for s in sims)


@chex.dataclass(frozen=True, kw_only=True)
class TwoObservableSimulator(Simulator):
    def exposes(self):
        return [f"{self.name}.a", f"{self.name}.b"]

    def run(self, opt_params=None, **kwargs) -> SimulatorOutput:
        return SimulatorOutput(observables=[_traj(), _traj(4)], state={})


def test_step_with_multi_observable_simulator():
    sim = TwoObservableSimulator(name="sim")

    def grad_fn(traj_a, traj_b):
        assert traj_a.center.shape[0] == 2 and traj_b.center.shape[0] == 4
        return {"x": jnp.array(1.0)}, []

    obj = Objective(
        name="obj", required_observables=tuple(sim.exposes()), grad_or_loss_fn=grad_fn
    )
    out = _pool([obj], [sim]).step({"x": jnp.array(0.0)})
    np.testing.assert_allclose(float(out.opt_params["x"]), -0.1, atol=1e-9)


def test_step_raises_on_unresolvable_objective():
    """An objective that keeps demanding fresh data exhausts the call limit."""
    sim = RecordingSimulator(name="sim")
    obs = sim.exposes()[0]

    @chex.dataclass(frozen=True, kw_only=True)
    class NeverReady(Objective):
        def calculate(self, observables, opt_params=None, **state):
            return ObjectiveOutput(is_ready=False, needs_update=(obs,))

    obj = NeverReady(name="obj", required_observables=(obs,), grad_or_loss_fn=lambda: None)
    with pytest.raises(RuntimeError, match="could not be resolved"):
        _pool([obj], [sim]).step({"x": jnp.array(0.0)})


# -- the run loop -----------------------------------------------------------------


class RecordingLogger(Logger):
    def __init__(self):
        self.metrics = []

    def log_metric(self, name, value, step=None):
        self.metrics.append((name, value, step))

    def update_status(self, *a, **k): ...


def _run_pool(logger=None, **kw):
    sim = RecordingSimulator(name="sim")
    obj = _objective("obj", sim.exposes())
    pool_kw = {}
    if logger is not None:
        pool_kw["logger"] = logger
    return sim, _pool([obj], [sim], **pool_kw)


def test_run_honors_number_of_steps():
    sim, opt = _run_pool()
    out = opt.run({"x": jnp.array(1.0)}, n_steps=4)
    np.testing.assert_allclose(float(out.opt_params["x"]), 1.0 - 4 * 0.2, atol=1e-6)


def test_run_with_zero_steps_errors():
    _, opt = _run_pool()
    with pytest.raises(ValueError, match="at least 1"):
        opt.run({"x": jnp.array(1.0)}, n_steps=0)


def test_run_accepts_none_callback():
    _, opt = _run_pool()
    out = opt.run({"x": jnp.array(1.0)}, n_steps=1, callback=None)
    assert out is not None


def test_run_logs_metrics_with_qualified_names():
    logger = RecordingLogger()
    _, opt = _run_pool(logger=logger)
    opt.run({"x": jnp.array(1.0)}, n_steps=2)
    names = {m[0] for m in logger.metrics}
    assert names == {"obj.loss"}
    steps = sorted(m[2] for m in logger.metrics)
    assert steps == [0, 1]


def test_run_callback_early_stopping():
    sim, opt = _run_pool()

    def stop_after_first(optimizer_output, step):
        return None, step < 0  # keep_going False immediately

    out = opt.run({"x": jnp.array(1.0)}, n_steps=10, callback=stop_after_first)
    # exactly one step ran
    np.testing.assert_allclose(float(out.opt_params["x"]), 0.8, atol=1e-6)


def test_run_callback_modifies_output():
    _, opt = _run_pool()

    def override(optimizer_output, step):
        return optimizer_output.replace(opt_params={"x": jnp.array(123.0)}), False

    out = opt.run({"x": jnp.array(1.0)}, n_steps=5, callback=override)
    assert float(out.opt_params["x"]) == 123.0


def test_run_nan_guard_names_step():
    sim = RecordingSimulator(name="sim")
    obj = _objective("obj", sim.exposes(), {"x": jnp.array(jnp.inf)})
    opt = _pool([obj], [sim])
    with pytest.raises(RuntimeError, match="step 0"):
        opt.run({"x": jnp.array(1.0)}, n_steps=3)
