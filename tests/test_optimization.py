"""Optimizer and objective tests with mock components (no heavy jit).

Mirrors the reference's mocked scheduling tests
(mythos/optimization/tests/test_optimization.py): the event-loop semantics --
needs_update re-runs, component-state threading, call limits, name-collision
validation, NaN guard -- are exercised with fake simulators/objectives.
"""

import chex
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mythos_tpu.optimization import (
    DiffTReObjective,
    Objective,
    ObjectiveOutput,
    OptimizerState,
    PoolOptimizer,
    SimpleOptimizer,
    compute_weights_and_neff,
)
from mythos_tpu.simulators.base import Simulator, SimulatorOutput
from mythos_tpu.simulators.io import SimulatorTrajectory


# -- DiffTRe math ---------------------------------------------------------------


def test_weights_and_neff_identity():
    """Equal energies -> uniform weights, n_eff = 1."""
    e = jnp.array([1.0, 2.0, 3.0, 4.0])
    weights, neff = compute_weights_and_neff(1.0, e, e)
    np.testing.assert_allclose(np.asarray(weights), 0.25, atol=1e-12)
    np.testing.assert_allclose(float(neff), 1.0, atol=1e-6)


def test_weights_and_neff_perturbed():
    """Perturbed energies -> Boltzmann weights, n_eff < 1."""
    ref = jnp.array([0.0, 0.0, 0.0, 0.0])
    new = jnp.array([0.0, 0.5, 1.0, 1.5])
    beta = 2.0
    weights, neff = compute_weights_and_neff(beta, new, ref)
    expected = np.exp(-beta * np.asarray(new - ref))
    expected /= expected.sum()
    np.testing.assert_allclose(np.asarray(weights), expected, rtol=1e-6)
    assert 0 < float(neff) < 1

    # invariance under a constant energy shift
    w2, neff2 = compute_weights_and_neff(beta, new + 100.0, ref + 100.0)
    np.testing.assert_allclose(np.asarray(w2), expected, rtol=1e-6)
    np.testing.assert_allclose(float(neff2), float(neff), rtol=1e-6)


# -- mock components ------------------------------------------------------------


@chex.dataclass(frozen=True, kw_only=True)
class MockSimulator(Simulator):
    """Returns a constant trajectory; counts runs via returned state."""

    n_states: int = 8

    def run(self, opt_params=None, runs: int = 0, **_kwargs) -> SimulatorOutput:
        traj = SimulatorTrajectory(
            center=jnp.zeros((self.n_states, 2, 3)),
            orientation=jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (self.n_states, 2, 1)),
            temperature=jnp.full(self.n_states, 0.1),
        )
        return SimulatorOutput(observables=[traj], state={"runs": runs + 1})


def _quadratic_objective(name: str, obs_name: str) -> Objective:
    def grad_fn(_traj):
        return {"x": jnp.array(2.0)}, [("loss", 4.0)]

    return Objective(name=name, required_observables=(obs_name,), grad_or_loss_fn=grad_fn)


def test_simple_optimizer_loop():
    sim = MockSimulator(name="sim")
    obs_name = sim.exposes()[0]
    objective = _quadratic_objective("obj", obs_name)
    opt = SimpleOptimizer(objective=objective, simulator=sim, optimizer=optax.sgd(0.1))

    out = opt.run({"x": jnp.array(1.0)}, n_steps=3)
    # sgd: x -= 0.1 * 2.0 per step
    np.testing.assert_allclose(float(out.opt_params["x"]), 1.0 - 3 * 0.2, atol=1e-6)
    # simulator ran once (observables cached afterwards)
    assert out.state.component_state["sim"]["runs"] == 1


def test_simple_optimizer_nan_guard():
    sim = MockSimulator(name="sim")
    obs_name = sim.exposes()[0]

    def nan_grad_fn(_traj):
        return {"x": jnp.array(jnp.nan)}, []

    objective = Objective(name="obj", required_observables=(obs_name,), grad_or_loss_fn=nan_grad_fn)
    opt = SimpleOptimizer(objective=objective, simulator=sim, optimizer=optax.sgd(0.1))
    with pytest.raises(RuntimeError, match="NaN or Inf"):
        opt.run({"x": jnp.array(1.0)}, n_steps=1)


def test_pool_optimizer_multi_objective():
    sims = [MockSimulator(name=f"sim{i}") for i in range(2)]
    objectives = [
        _quadratic_objective(f"obj{i}", sims[i].exposes()[0]) for i in range(2)
    ]
    opt = PoolOptimizer(
        objectives=objectives,
        simulators=sims,
        aggregate_grad_fn=lambda grads: {"x": sum(g["x"] for g in grads) / len(grads)},
        optimizer=optax.sgd(0.1),
    )
    out = opt.run({"x": jnp.array(1.0)}, n_steps=2)
    np.testing.assert_allclose(float(out.opt_params["x"]), 1.0 - 2 * 0.2, atol=1e-6)
    assert set(out.observables) == {"obj0", "obj1"}


def test_pool_optimizer_name_collision():
    sim = MockSimulator(name="same")
    objective = _quadratic_objective("same", sim.exposes()[0])
    with pytest.raises(ValueError, match="unique"):
        PoolOptimizer(
            objectives=[objective],
            simulators=[sim],
            aggregate_grad_fn=lambda g: g[0],
            optimizer=optax.sgd(0.1),
        )


def test_pool_optimizer_needs_update_rerun():
    """A not-ready objective clears stale observables and re-triggers its sim."""
    sim = MockSimulator(name="sim")
    obs_name = sim.exposes()[0]
    attempts = []

    @chex.dataclass(frozen=True, kw_only=True)
    class FussyObjective(Objective):
        def calculate(self, observables, opt_params=None, fresh: bool = False, **_kw):
            attempts.append(len(attempts))
            if obs_name not in observables:
                return ObjectiveOutput(is_ready=False, needs_update=(obs_name,))
            if not fresh:
                # first sight of (cached) observables: demand a re-run
                return ObjectiveOutput(
                    is_ready=False, needs_update=(obs_name,), state={"fresh": True}
                )
            return ObjectiveOutput(is_ready=True, grads={"x": jnp.array(1.0)}, state={"fresh": True})

    objective = FussyObjective(name="obj", required_observables=(obs_name,), grad_or_loss_fn=lambda: None)
    opt = PoolOptimizer(
        objectives=[objective],
        simulators=[sim],
        aggregate_grad_fn=lambda g: g[0],
        optimizer=optax.sgd(0.1),
    )
    # seed state with "cached" observables so the first attempt sees them
    state = OptimizerState(observables={obs_name: "stale"})
    out = opt.step({"x": jnp.array(0.0)}, state)
    assert float(out.opt_params["x"]) == pytest.approx(-0.1)
    # objective was attempted at least twice (stale then fresh)
    assert len(attempts) >= 2
    # simulator was re-run
    assert out.state.component_state["sim"]["runs"] == 1


# -- DiffTRe objective protocol ---------------------------------------------------


def _traj(n_states: int = 6, kt: float = 0.1) -> SimulatorTrajectory:
    rng = np.random.default_rng(0)
    return SimulatorTrajectory(
        center=jnp.asarray(rng.normal(size=(n_states, 2, 3))),
        orientation=jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (n_states, 2, 1)),
        temperature=jnp.full(n_states, kt),
    )


class _ConstEnergyFn:
    """Minimal EnergyFunction stand-in: E = scale * sum(center^2) per state."""

    def __init__(self, params=None):
        self.params = params or {"scale": jnp.array(1.0)}

    def with_params(self, p):
        return _ConstEnergyFn({**self.params, **{k: v for k, v in p.items() if k in self.params}})

    def map(self, states):
        return self.params["scale"] * jnp.sum(states.center**2, axis=(1, 2))


def test_difftre_not_ready_on_missing():
    obj = DiffTReObjective(
        name="d",
        required_observables=("traj",),
        grad_or_loss_fn=lambda *a: (jnp.array(0.0), (("obs", 0.0), None)),
        energy_fn=_ConstEnergyFn(),
    )
    out = obj.calculate({}, opt_params={"scale": jnp.array(1.0)})
    assert not out.is_ready
    assert out.needs_update == ("traj",)


def test_difftre_neff_triggers_resim():
    """Large parameter change -> n_eff below threshold -> fresh data request."""
    obj = DiffTReObjective(
        name="d",
        required_observables=("traj",),
        grad_or_loss_fn=lambda *a: (jnp.array(0.0), (("obs", 0.0), None)),
        energy_fn=_ConstEnergyFn(),
        min_n_eff_factor=0.95,
    )
    out = obj.calculate(
        {"traj": _traj()},
        opt_params={"scale": jnp.array(5.0)},
        reference_opt_params={"scale": jnp.array(1.0)},
    )
    assert not out.is_ready
    assert out.state == {"opt_steps": 0}
    assert out.observables["neff"] < 0.95


def test_difftre_gradients_flow():
    """Within tolerance: produces finite grads and increments opt_steps."""

    def loss_fn(ref_states, weights, energy_fn, opt_params, observables):
        value = jnp.sum(weights * jnp.sum(ref_states.center**2, axis=(1, 2)))
        return (value - 3.0) ** 2, (("measured", value), None)

    obj = DiffTReObjective(
        name="d",
        required_observables=("traj",),
        grad_or_loss_fn=loss_fn,
        energy_fn=_ConstEnergyFn(),
    )
    out = obj.calculate(
        {"traj": _traj()},
        opt_params={"scale": jnp.array(1.001)},
        reference_opt_params={"scale": jnp.array(1.0)},
    )
    assert out.is_ready
    assert np.isfinite(float(out.grads["scale"]))
    assert out.state["opt_steps"] == 1
    assert "loss" in out.observables and "neff" in out.observables


def test_difftre_max_valid_opt_steps():
    obj = DiffTReObjective(
        name="d",
        required_observables=("traj",),
        grad_or_loss_fn=lambda *a: (jnp.array(0.0), (("obs", 0.0), None)),
        energy_fn=_ConstEnergyFn(),
        max_valid_opt_steps=2,
    )
    out = obj.calculate({"traj": _traj()}, opt_params={"scale": jnp.array(1.0)}, opt_steps=2)
    assert not out.is_ready
    assert out.state == {"opt_steps": 0}
    assert out.needs_update == ("traj",)


def test_difftre_equilibration_slicing():
    obj = DiffTReObjective(
        name="d",
        required_observables=("traj",),
        grad_or_loss_fn=lambda ref_states, weights, *a: (
            jnp.sum(weights),
            (("n", ref_states.length()), None),
        ),
        energy_fn=_ConstEnergyFn(),
        n_equilibration_steps=2,
    )
    out = obj.calculate({"traj": _traj(6)}, opt_params={"scale": jnp.array(1.0)})
    assert out.is_ready
    assert float(out.observables["n"]) == 4


# -- SchedulerHints + overflow wiring -------------------------------------------


@chex.dataclass(frozen=True, kw_only=True)
class FlakySimulator(MockSimulator):
    """Fails the first `fail_times` runs (per-instance mutable counter)."""

    fail_times: int = 1

    def __post_init__(self):
        object.__setattr__(self, "_attempts", [0])

    def run(self, opt_params=None, runs: int = 0, **kwargs) -> SimulatorOutput:
        self._attempts[0] += 1
        if self._attempts[0] <= self.fail_times:
            raise RuntimeError("transient engine failure")
        return MockSimulator.run(self, opt_params=opt_params, runs=runs, **kwargs)


def test_pool_optimizer_honors_max_retries():
    from mythos_tpu.utils.scheduler import SchedulerHints

    sim = FlakySimulator(
        name="sim", fail_times=1, scheduler_hints=SchedulerHints(max_retries=2)
    )
    objective = _quadratic_objective("obj", sim.exposes()[0])
    opt = PoolOptimizer(
        objectives=[objective],
        simulators=[sim],
        aggregate_grad_fn=lambda gs: gs[0],
        optimizer=optax.sgd(0.1),
    )
    out = opt.step({"x": jnp.array(1.0)})
    np.testing.assert_allclose(float(out.opt_params["x"]), 0.8, atol=1e-6)
    assert sim._attempts[0] == 2  # one failure + one retried success


def test_pool_optimizer_no_retries_reraises():
    sim = FlakySimulator(name="sim", fail_times=1)  # no hints -> no retries
    objective = _quadratic_objective("obj", sim.exposes()[0])
    opt = PoolOptimizer(
        objectives=[objective],
        simulators=[sim],
        aggregate_grad_fn=lambda gs: gs[0],
        optimizer=optax.sgd(0.1),
    )
    with pytest.raises(RuntimeError, match="transient engine failure"):
        opt.step({"x": jnp.array(1.0)})


def test_difftre_rejects_overflowed_trajectory():
    import mythos_tpu.energy.dna1 as dna1
    from __graft_entry__ import _tiny_duplex

    topology, body = _tiny_duplex(4)
    energy_fn = dna1.create_default_energy_fn(topology)
    n_states = 4
    traj = SimulatorTrajectory(
        center=jnp.tile(body.center[None], (n_states, 1, 1)),
        orientation=jnp.tile(body.orientation[None], (n_states, 1, 1)),
        temperature=jnp.full(n_states, 0.1),
    ).with_state_metadata(neighbor_overflow=jnp.asarray(True))

    objective = DiffTReObjective(
        name="obj",
        required_observables=("t",),
        grad_or_loss_fn=lambda *a, **k: ({}, []),
        energy_fn=energy_fn,
    )
    with pytest.raises(RuntimeError, match="overflowed neighbor table"):
        objective.calculate({"t": traj}, opt_params=energy_fn.opt_params())


def test_bound_simulator_threads_fresh_keys():
    """BoundSimulator derives a new PRNG key per invocation via the seq
    counter threaded through component state (DiffTRe resimulation must
    draw NEW trajectories)."""
    from mythos_tpu.simulators.base import BoundSimulator

    calls = []

    class _Inner:
        def run(self, opt_params, init, n_steps, key):
            calls.append((init, n_steps, np.asarray(key)))
            traj = SimulatorTrajectory(
                center=jnp.zeros((2, 1, 3)),
                orientation=jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (2, 1, 1)),
                temperature=jnp.full(2, 0.1),
            )
            return SimulatorOutput(observables=[traj], state={})

    sim = BoundSimulator(name="b", simulator=_Inner(), run_args=("init", 7), seed=3)
    out0 = sim.run(None)
    out1 = sim.run(None, **out0.state)
    assert calls[0][:2] == ("init", 7) and calls[1][:2] == ("init", 7)
    assert not np.array_equal(calls[0][2], calls[1][2])  # fresh key per call
    assert out1.state["seq"] == 2
