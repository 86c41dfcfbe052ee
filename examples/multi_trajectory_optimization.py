#!/usr/bin/env python
"""Multi-trajectory DiffTRe fit: several independent simulations, one objective.

Equivalent of the reference's multi-trajectory notebook
(examples/oxdna/multi_trajectory_optimization.ipynb): N simulators with
different seeds each expose a trajectory; one DiffTReObjective concatenates
them (equilibration-sliced, per-segment n_eff checked) and produces one
reweighted gradient. The PoolOptimizer schedules everything -- simulators run
concurrently in a worker pool, and when n_eff degrades the objective
re-triggers exactly the simulators it needs.

Run: python examples/multi_trajectory_optimization.py  (CPU or TPU; ~3 min)
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import optax

import mythos_tpu.energy.dna1 as dna1
from mythos_tpu.io.synthetic import synthetic_duplex
from mythos_tpu.losses import ObservableLossFn, SquaredError
from mythos_tpu.observables import PropellerTwist
from mythos_tpu.observables.propeller import TARGETS
from mythos_tpu.optimization import DiffTReObjective, PoolOptimizer
from mythos_tpu.simulators.base import BoundSimulator
from mythos_tpu.ui.loggers import ConsoleLogger

from dna1_simulation import build_simulator


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--n-bp", type=int, default=16)
    parser.add_argument("--n-replicas", type=int, default=3)
    parser.add_argument("--sim-steps", type=int, default=5_000)
    parser.add_argument("--opt-steps", type=int, default=20)
    parser.add_argument("--learning-rate", type=float, default=1e-3)
    parser.add_argument("--target", type=float, default=TARGETS["oxDNA"])
    args = parser.parse_args()

    topology, init = synthetic_duplex(args.n_bp)
    base = build_simulator(topology, save_every=100)
    energy_fn = base.energy_fn
    params = energy_fn.opt_params()

    # N independently seeded replicas of the same system: each exposes its
    # trajectory under its own name, and each optimizer-triggered rerun
    # draws a fresh key (BoundSimulator threads an invocation counter)
    sims = [
        BoundSimulator(
            name=f"replica_{i}",
            simulator=base,
            run_args=(init, args.sim_steps),
            seed=i,
        )
        for i in range(args.n_replicas)
    ]
    required = tuple(name for sim in sims for name in sim.exposes())

    n_bp = topology.n_nucleotides // 2
    bps = jnp.array(
        [[i, topology.n_nucleotides - 1 - i] for i in range(n_bp)], dtype=jnp.int32
    )
    obs_loss = ObservableLossFn(
        observable=PropellerTwist(
            rigid_body_transform_fn=dna1.default_transform_fn(), h_bonded_base_pairs=bps
        ),
        loss_fn=SquaredError(),
        return_observable=True,
    )

    def grad_or_loss_fn(ref_states, weights, energy_fn, opt_params, observables):
        loss, measured = obs_loss(ref_states, args.target, weights)
        return loss, (("propeller_twist", measured), None)

    n_states = args.sim_steps // 100  # states per replica (save_every=100)
    objective = DiffTReObjective(
        name="propeller",
        required_observables=required,
        grad_or_loss_fn=grad_or_loss_fn,
        energy_fn=energy_fn,
        n_equilibration_steps=min(10, n_states // 2),
    )

    optimizer = PoolOptimizer(
        objectives=[objective],
        simulators=sims,
        aggregate_grad_fn=lambda grads: grads[0],  # one objective
        optimizer=optax.adam(args.learning_rate),
        logger=ConsoleLogger(),
    )
    output = optimizer.run(params, n_steps=args.opt_steps)
    print("Final eps_stack_base:", float(output.opt_params["eps_stack_base"]))


if __name__ == "__main__":
    main()
