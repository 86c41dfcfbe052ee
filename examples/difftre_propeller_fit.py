#!/usr/bin/env python
"""DiffTRe fit of oxDNA1 parameters to a propeller-twist target.

Instead of differentiating through the dynamics, trajectories are reweighted
under perturbed parameters; when the effective sample size degrades the
objective requests a fresh simulation automatically (the SimpleOptimizer
protocol handles re-runs).

Usage::

    python examples/difftre_propeller_fit.py sys.top init.conf
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import optax

import mythos_tpu.energy.dna1 as dna1
import mythos_tpu.io.topology as top
import mythos_tpu.io.trajectory as traj
from mythos_tpu.losses import ObservableLossFn, SquaredError
from mythos_tpu.observables import PropellerTwist
from mythos_tpu.observables.propeller import TARGETS
from mythos_tpu.optimization import DiffTReObjective, SimpleOptimizer
from mythos_tpu.simulators.base import BoundSimulator
from mythos_tpu.rigid_body import RigidBody
from mythos_tpu.ui.loggers import ConsoleLogger

from dna1_simulation import build_simulator


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("topology")
    parser.add_argument("conf")
    parser.add_argument("--sim-steps", type=int, default=10_000)
    parser.add_argument("--save-every", type=int, default=100)
    parser.add_argument("--n-eq-states", type=int, default=20)
    parser.add_argument("--opt-steps", type=int, default=50)
    parser.add_argument("--learning-rate", type=float, default=1e-3)
    parser.add_argument("--target", type=float, default=TARGETS["oxDNA"])
    args = parser.parse_args()

    topology = top.from_oxdna_file(args.topology)
    init = traj.from_file(args.conf, topology.strand_counts).states[0].to_rigid_body()
    init = RigidBody(center=jnp.asarray(init.center), orientation=jnp.asarray(init.orientation))

    base_sim = build_simulator(topology, save_every=args.save_every)
    energy_fn = base_sim.energy_fn
    params = energy_fn.opt_params()

    # freeze the simulator's run signature to (opt_params, **state); each
    # optimizer-triggered rerun draws a fresh key via the threaded counter
    simulator = BoundSimulator(
        name="propeller_sim", simulator=base_sim, run_args=(init, args.sim_steps)
    )

    n_bp = topology.n_nucleotides // 2
    bps = jnp.array([[i, topology.n_nucleotides - 1 - i] for i in range(n_bp)], dtype=jnp.int32)
    observable = PropellerTwist(
        rigid_body_transform_fn=dna1.default_transform_fn(), h_bonded_base_pairs=bps
    )
    obs_loss = ObservableLossFn(observable=observable, loss_fn=SquaredError(), return_observable=True)

    def grad_or_loss_fn(ref_states, weights, energy_fn, opt_params, observables):
        loss, measured = obs_loss(ref_states, args.target, weights)
        return loss, (("propeller_twist", measured), None)

    objective = DiffTReObjective(
        name="propeller",
        required_observables=tuple(simulator.exposes()),
        grad_or_loss_fn=grad_or_loss_fn,
        energy_fn=energy_fn,
        n_equilibration_steps=args.n_eq_states,
    )

    optimizer = SimpleOptimizer(
        objective=objective,
        simulator=simulator,
        optimizer=optax.adam(args.learning_rate),
        logger=ConsoleLogger(),
    )
    output = optimizer.run(params, n_steps=args.opt_steps)
    print("Final eps_stack_base:", float(output.opt_params["eps_stack_base"]))


if __name__ == "__main__":
    main()
