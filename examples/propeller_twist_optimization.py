#!/usr/bin/env python
"""Direct-differentiation fit: tune oxDNA1 params to a propeller-twist target.

Equivalent of the reference's examples/jaxmd/propeller_twist_optimization.ipynb:
gradients flow *through* the Langevin dynamics (chunked rematerialization keeps
memory bounded), optax updates the parameters toward the oxDNA target twist.

Usage::

    python examples/propeller_twist_optimization.py sys.top init.conf
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import optax

import mythos_tpu.energy.dna1 as dna1
import mythos_tpu.io.topology as top
import mythos_tpu.io.trajectory as traj
from mythos_tpu.observables import PropellerTwist
from mythos_tpu.observables.propeller import TARGETS
from mythos_tpu.rigid_body import RigidBody

from dna1_simulation import build_simulator


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("topology")
    parser.add_argument("conf")
    parser.add_argument("--sim-steps", type=int, default=5000)
    parser.add_argument("--opt-steps", type=int, default=10)
    parser.add_argument("--checkpoint-every", type=int, default=500)
    parser.add_argument("--learning-rate", type=float, default=1e-3)
    parser.add_argument("--target", type=float, default=TARGETS["oxDNA"])
    args = parser.parse_args()

    topology = top.from_oxdna_file(args.topology)
    init = traj.from_file(args.conf, topology.strand_counts).states[0].to_rigid_body()
    init = RigidBody(center=jnp.asarray(init.center), orientation=jnp.asarray(init.orientation))

    simulator = build_simulator(topology, checkpoint_every=args.checkpoint_every)
    params = simulator.energy_fn.opt_params()

    n_bp = topology.n_nucleotides // 2
    bps = jnp.array([[i, topology.n_nucleotides - 1 - i] for i in range(n_bp)], dtype=jnp.int32)
    observable = PropellerTwist(
        rigid_body_transform_fn=dna1.default_transform_fn(), h_bonded_base_pairs=bps
    )

    def loss_fn(p, key):
        out = simulator.run(p, init, args.sim_steps, key)
        twist = jnp.mean(observable(out.observables[0]))
        return (twist - args.target) ** 2, twist

    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    opt = optax.adam(args.learning_rate)
    opt_state = opt.init(params)

    key = jax.random.PRNGKey(0)
    for step in range(args.opt_steps):
        key, subkey = jax.random.split(key)
        (loss, twist), grads = grad_fn(params, subkey)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        print(f"step {step}: twist={float(twist):.3f} deg target={args.target} loss={float(loss):.5f}")


if __name__ == "__main__":
    main()
