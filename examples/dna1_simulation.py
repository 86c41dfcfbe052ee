#!/usr/bin/env python
"""Simulate an oxDNA1 duplex with the native TPU Langevin engine.

Equivalent of the reference's examples/jaxmd/simulation.ipynb: build the
default oxDNA1 energy function for a topology, run NVT Langevin dynamics
under jit, and write the trajectory.

Usage::

    python examples/dna1_simulation.py sys.top init.conf --steps 20000
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

import mythos_tpu.energy.dna1 as dna1
import mythos_tpu.io.topology as top
import mythos_tpu.io.trajectory as traj
from mythos_tpu import spaces
from mythos_tpu.rigid_body import RigidBody
from mythos_tpu.simulators import NoNeighborList, StaticSimulatorParams, TpuSimulator


def build_simulator(topology, checkpoint_every: int = 0, save_every: int = 1) -> TpuSimulator:
    """Default oxDNA1 simulator for a topology."""
    energy_fn = dna1.create_default_energy_fn(topology)
    sim_cfg, _ = dna1.default_configs()
    kT, dt = float(sim_cfg["kT"]), float(sim_cfg["dt"])
    return TpuSimulator(
        energy_fn=energy_fn,
        simulator_params=StaticSimulatorParams(
            seq=jnp.asarray(topology.seq),
            mass=RigidBody(
                center=jnp.array([float(sim_cfg["nucleotide_mass"])]),
                orientation=jnp.asarray(sim_cfg["moment_of_inertia"])[None, :],
            ),
            gamma=RigidBody(
                center=jnp.array([kT / float(sim_cfg["diff_coef"])]),
                orientation=jnp.array([kT / float(sim_cfg["rot_diff_coef"])]),
            ),
            bonded_neighbors=topology.bonded_neighbors,
            checkpoint_every=checkpoint_every,
            dt=dt,
            kT=kT,
        ),
        space=spaces.free(),
        neighbors=NoNeighborList(unbonded_nbrs=topology.unbonded_neighbors),
        save_every=save_every,
    )


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("topology")
    parser.add_argument("conf")
    parser.add_argument("--steps", type=int, default=20_000)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", default="trajectory_out.dat")
    parser.add_argument("--save-every", type=int, default=100)
    args = parser.parse_args()

    topology = top.from_oxdna_file(args.topology)
    init = traj.from_file(args.conf, topology.strand_counts).states[0].to_rigid_body()
    init = RigidBody(center=jnp.asarray(init.center), orientation=jnp.asarray(init.orientation))

    simulator = build_simulator(topology, save_every=args.save_every)
    params = simulator.energy_fn.opt_params()

    print(f"Simulating {args.steps} steps of a {topology.n_nucleotides}-nt system...")
    run = jax.jit(lambda p: simulator.run(p, init, args.steps, jax.random.PRNGKey(args.seed)))
    trajectory = run(params).observables[0]
    trajectory.to_file(args.out)
    print(f"Done; wrote {trajectory.length()} states to {args.out}")


if __name__ == "__main__":
    main()
