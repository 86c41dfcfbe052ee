#!/usr/bin/env python
"""Fit oxDNA1 stacking strength to a persistence-length target.

Equivalent of the reference's persistence-length notebook
(examples/oxdna/persistence_length_optimization.ipynb), on the TPU-native
differentiable path: the tangent-correlation Lp fit (observables/
persistence_length.py) is differentiated directly through the Langevin
dynamics, so d Lp / d eps_stack comes out of one jax.grad.

Usage::

    python examples/persistence_length_optimization.py sys.top init.conf
    python examples/persistence_length_optimization.py --synthetic 30

(``--synthetic N`` builds an N-bp duplex in code; no files needed.)
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import optax

import mythos_tpu.energy.dna1 as dna1
import mythos_tpu.io.topology as top
import mythos_tpu.io.trajectory as traj
from mythos_tpu import spaces
from mythos_tpu.observables import PersistenceLength
from mythos_tpu.observables.base import get_duplex_quartets
from mythos_tpu.rigid_body import RigidBody

from dna1_simulation import build_simulator


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("topology", nargs="?")
    parser.add_argument("conf", nargs="?")
    parser.add_argument("--synthetic", type=int, default=0, help="build an N-bp duplex in code")
    parser.add_argument("--sim-steps", type=int, default=5_000)
    parser.add_argument("--opt-steps", type=int, default=10)
    parser.add_argument("--target", type=float, default=47.0, help="Lp target (oxDNA su; ~40 nm)")
    parser.add_argument("--learning-rate", type=float, default=3e-3)
    args = parser.parse_args()

    if args.synthetic:
        from mythos_tpu.io.synthetic import synthetic_duplex

        topology, init = synthetic_duplex(args.synthetic)
    else:
        topology = top.from_oxdna_file(args.topology)
        init = traj.from_file(args.conf, topology.strand_counts).states[0].to_rigid_body()
        init = RigidBody(
            center=jnp.asarray(init.center), orientation=jnp.asarray(init.orientation)
        )

    # checkpoint_every trades memory for recompute when differentiating
    # through long trajectories; it must divide the emitted-state count
    sim = build_simulator(topology, checkpoint_every=0, save_every=50)
    params = sim.energy_fn.opt_params()

    n_per_strand = topology.n_nucleotides // 2
    lp_obs = PersistenceLength(
        rigid_body_transform_fn=dna1.default_transform_fn(),
        quartets=get_duplex_quartets(n_per_strand),
        displacement_fn=spaces.free()[0],
    )

    @jax.jit
    def loss_fn(opt_params, key):
        out = sim.run(opt_params, init, args.sim_steps, key)
        lp = lp_obs(out.observables[0])
        return (lp - args.target) ** 2, lp

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    opt = optax.adam(args.learning_rate)
    opt_state = opt.init(params)
    for step in range(args.opt_steps):
        (loss, lp), grads = grad_fn(params, jax.random.PRNGKey(step))
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        print(
            f"step {step}: Lp={float(lp):.2f} su (target {args.target}) "
            f"loss={float(loss):.3f} eps_stack_base={float(params['eps_stack_base']):.4f}"
        )


if __name__ == "__main__":
    main()
