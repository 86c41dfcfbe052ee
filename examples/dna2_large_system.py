"""Large-scale oxDNA2 simulation on the fused TPU hot path.

Demonstrates the block-sparse SoA/Pallas configuration that reaches
~30k Langevin steps/min for a 10,000-nt duplex on one TPU v5e chip:

- oxDNA2 energy with ``block_unbonded=True`` (block-sparse tile path)
- a symmetric BlockNeighborList (enables the fused Pallas force kernels)
- ``neighbor_update_every`` chunked rebuilds with a 0.5 skin
- trajectory thinning via ``save_every``

Run: python examples/dna2_large_system.py [n_bp] [n_steps]
"""

import sys

import jax
import jax.numpy as jnp

import mythos_tpu.energy.dna2 as dna2
import mythos_tpu.io.topology as top
from mythos_tpu import spaces
from mythos_tpu.rigid_body import RigidBody
from mythos_tpu.simulators import StaticSimulatorParams, TpuSimulator
from mythos_tpu.simulators.neighbors import block_neighbor_list_for_topology


def ideal_duplex(n_bp: int):
    """Synthetic B-DNA duplex (see __graft_entry__ for the full builder)."""
    sys.path.insert(0, ".")
    from __graft_entry__ import _tiny_duplex

    return _tiny_duplex(n_bp)


def main() -> None:
    n_bp = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    kT = 296.15 * 0.1 / 300.0
    block_size = 8

    topology, body = ideal_duplex(n_bp)
    energy_fn = dna2.create_default_energy_fn(
        topology, block_unbonded=True, block_size=block_size
    )
    neighbors = block_neighbor_list_for_topology(
        spaces.free()[0],
        topology,
        dna2.default_neighbor_cutoff(),
        dr_threshold=0.5,
        block_size=block_size,
        init_centers=body.center,
        symmetric=True,  # symmetric table -> fused Pallas force kernels
    )
    sim = TpuSimulator(
        energy_fn=energy_fn,
        simulator_params=StaticSimulatorParams(
            seq=jnp.asarray(topology.seq),
            mass=RigidBody(center=jnp.array([1.0]), orientation=jnp.array([[1.0, 1.0, 1.0]])),
            gamma=RigidBody(center=jnp.array([kT / 2.5]), orientation=jnp.array([kT / 7.5])),
            bonded_neighbors=jnp.asarray(topology.bonded_neighbors),
            checkpoint_every=0,
            dt=5e-3,
            kT=kT,
        ),
        space=spaces.free(),
        neighbors=neighbors,
        save_every=max(20, n_steps // 100 // 20 * 20),
        neighbor_update_every=20,
    )

    run = jax.jit(lambda p, k: sim.run(p, body, n_steps, k).observables[0])
    traj = run(energy_fn.opt_params(), jax.random.PRNGKey(0))
    print(f"{topology.n_nucleotides} nt, {n_steps} steps -> {traj.center.shape[0]} states")
    print("finite:", bool(jnp.all(jnp.isfinite(traj.center))))


if __name__ == "__main__":
    main()
