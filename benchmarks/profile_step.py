"""Differential timing of the Langevin step's components on the real chip.

Each variant is a jitted lax.scan of K iterations; we report us/iter.
Run: python benchmarks/profile_step.py [n_bp] [block]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

N_BP = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
BLOCK = int(sys.argv[2]) if len(sys.argv) > 2 else 8
K = 200


def timeit(name, fn, *args):
    out = jax.block_until_ready(jax.jit(fn)(*args))
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:42s} {dt / K * 1e6:10.1f} us/iter   ({dt * 1e3:8.2f} ms total)")
    return dt / K


def main():
    from __graft_entry__ import _build_sim, _tiny_duplex
    from mythos_tpu import soa
    from mythos_tpu.ops import oxdna_tiles

    kT = 296.15 * 0.1 / 300.0
    topology, body = _tiny_duplex(N_BP)
    energy_fn, sim = _build_sim(
        topology, kT, mode="block", init_centers=body.center, model="dna2", block_size=BLOCK
    )
    params = energy_fn.opt_params()
    n = topology.n_nucleotides
    print(f"n={n} block={BLOCK}")

    # 0. full sim step (reference point)
    def full(params, key):
        return sim.run(params, body, K, key).observables[0].center

    timeit("full sim.run (incl rebuilds)", full, params, jax.random.PRNGKey(0))

    # components ---------------------------------------------------------
    updated = energy_fn.with_params(params)
    nbl = sim.neighbors
    sym_ids = nbl.idx
    body_soa = soa.to_soa(body)

    # rows build (fused_energy_soa preamble) via energy only
    def energy_only(b):
        def step(carry, _):
            e = oxdna_tiles.fused_energy_soa(updated, carry, sym_ids, BLOCK)
            return jax.tree.map(lambda x: x + 0.0 * e, carry), None

        return jax.lax.scan(step, b, None, length=K)[0]

    timeit("fused energy fwd only (x K)", energy_only, body_soa)

    # force (grad) eval
    def force_only(b):
        def step(carry, _):
            g = jax.grad(lambda bb: oxdna_tiles.fused_energy_soa(updated, bb, sym_ids, BLOCK))(carry)
            return jax.tree.map(lambda x, gg: x - 1e-9 * gg, carry, g), None

        return jax.lax.scan(step, b, None, length=K)[0]

    timeit("fused force (grad) eval (x K)", force_only, body_soa)

    # bonded-only energy fn grad (strip unbonded terms)
    from mythos_tpu.energy.base import ComposedEnergyFunction

    unb = {"UnbondedExcludedVolume", "HydrogenBonding", "CrossStacking", "CoaxialStacking", "Debye"}
    bonded_fns = [f for f in updated.energy_fns if type(f).__name__ not in unb]
    bonded_only = ComposedEnergyFunction(energy_fns=bonded_fns)

    def bonded_force(b):
        def step(carry, _):
            g = jax.grad(lambda bb: bonded_only.energy_soa_total(bb))(carry) if hasattr(bonded_only, "energy_soa_total") else jax.grad(lambda bb: sum(f.energy_soa(f.transform_soa_fn(bb), jnp.asarray(f.seq)) for f in bonded_fns))(carry)
            return jax.tree.map(lambda x, gg: x - 1e-9 * gg, carry, g), None

        return jax.lax.scan(step, b, None, length=K)[0]

    timeit("bonded-terms force (x K)", bonded_force, body_soa)

    # integrator-only (constant zero energy)
    from mythos_tpu import spaces
    from mythos_tpu.rigid_body import RigidBody
    from mythos_tpu.simulators import integrators

    gamma = RigidBody(center=jnp.array([kT / 2.5]), orientation=jnp.array([kT / 7.5]))
    mass = RigidBody(center=jnp.array([1.0]), orientation=jnp.array([[1.0, 1.0, 1.0]]))

    def zero_e(b, **kw):
        return 0.0 * b.center.x[0]

    init_fn, step_fn = integrators.nvt_langevin_soa(zero_e, spaces.free_soa()[1], dt=5e-3, kT=kT, gamma=gamma)
    st0 = init_fn(key=jax.random.PRNGKey(1), R=body_soa, mass=mass)

    def integ_only(st):
        def step(carry, _):
            return step_fn(carry), None

        return jax.lax.scan(step, st, None, length=K)[0].position.center.x

    timeit("integrator-only SoA (zero energy)", integ_only, st0)

    # neighbor rebuild
    def rebuild(b):
        def step(carry, _):
            ids, ovf = nbl.build(carry.center)
            return jax.tree.map(lambda x: x + 0.0 * ids[0, 0], carry), None

        return jax.lax.scan(step, b, None, length=K)[0]

    timeit("neighbor rebuild (x K, real cadence /20)", rebuild, body_soa)

    # rows build (field packing) alone
    def rows_build(b):
        def step(carry, _):
            rows_rf, *_ = oxdna_tiles.build_tile_inputs(updated, carry, sym_ids, BLOCK)
            return jax.tree.map(lambda x: x + 0.0 * rows_rf[0, 0], carry), None

        return jax.lax.scan(step, b, None, length=K)[0]

    timeit("rows field packing alone (x K)", rows_build, body_soa)

    print(f"sym_ids shape={sym_ids.shape}")
    occ = float(jnp.mean((sym_ids < sym_ids.shape[0]).astype(jnp.float32)))
    print(f"block-table occupancy: {occ:.2f}")


if __name__ == "__main__":
    main()
