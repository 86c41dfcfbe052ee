#!/usr/bin/env python
"""Replica-parallel direct-diff fit over a TPU mesh.

Where the reference fanned replica simulators out as Ray tasks, here N
replicas (different PRNG streams) run as one SPMD program over a
jax.sharding.Mesh: each device integrates its own trajectory and the
gradients combine with an ICI psum. Works identically on a virtual CPU mesh::

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/replica_mesh_optimization.py sys.top init.conf
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
from mythos_tpu.parallel import make_mesh, replica_grad_fn
from mythos_tpu.rigid_body import RigidBody

from dna1_simulation import build_simulator


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("topology")
    parser.add_argument("conf")
    parser.add_argument("--sim-steps", type=int, default=2000)
    parser.add_argument("--opt-steps", type=int, default=5)
    parser.add_argument("--learning-rate", type=float, default=1e-3)
    parser.add_argument("--n-replicas", type=int, default=len(jax.devices()))
    args = parser.parse_args()

    topology = top.from_oxdna_file(args.topology)
    init = traj.from_file(args.conf, topology.strand_counts).states[0].to_rigid_body()
    init = RigidBody(center=jnp.asarray(init.center), orientation=jnp.asarray(init.orientation))

    simulator = build_simulator(topology, checkpoint_every=max(1, args.sim_steps // 10))
    params = simulator.energy_fn.opt_params()

    n_bp = topology.n_nucleotides // 2
    bps = jnp.array([[i, topology.n_nucleotides - 1 - i] for i in range(n_bp)], dtype=jnp.int32)
    observable = PropellerTwist(
        rigid_body_transform_fn=dna1.default_transform_fn(), h_bonded_base_pairs=bps
    )

    def loss_fn(p, key):
        out = simulator.run(p, init, args.sim_steps, key)
        twist = jnp.mean(observable(out.observables[0]))
        return (twist - TARGETS["oxDNA"]) ** 2

    mesh = make_mesh(args.n_replicas)
    grad_step = replica_grad_fn(loss_fn, mesh)

    opt = optax.adam(args.learning_rate)
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(0)

    for step in range(args.opt_steps):
        key, subkey = jax.random.split(key)
        keys = jax.random.key_data(jax.random.split(subkey, args.n_replicas))
        loss, grads = grad_step(params, keys)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        print(f"step {step}: replica-mean loss = {float(loss):.5f} over {args.n_replicas} devices")


if __name__ == "__main__":
    main()
