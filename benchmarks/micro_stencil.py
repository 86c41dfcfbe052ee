"""Microbenchmark: where does a stencil-path Langevin step spend its time.

Times (on the ambient device) the fused force evaluation alone, the energy
alone, the band validity check, and the full simulator step at the bench
configuration, so kernel work can be attributed before optimizing.

Usage: python benchmarks/micro_stencil.py [n_bp] [kernel:0|1]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

N_BP = int(sys.argv[1]) if len(sys.argv) > 1 else 5000


def timeit(fn, *args, reps=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e6  # us


def main() -> None:
    from __graft_entry__ import _build_sim, _tiny_duplex
    from mythos_tpu.ops import stencil as ops_stencil
    from mythos_tpu.simulators.neighbors import (
        stencil_band_for_topology,
        strand_interleave_perm,
    )
    import mythos_tpu.energy.dna2 as pkg
    from mythos_tpu import spaces
    from mythos_tpu.soa import to_soa

    kT = 296.15 * 0.1 / 300.0
    topology, body = _tiny_duplex(N_BP)
    band = stencil_band_for_topology(
        spaces.free()[0],
        topology,
        pkg.default_neighbor_cutoff(),
        init_centers=body.center,
        r_cutoff_inner=pkg.short_range_neighbor_cutoff(),
        perm=strand_interleave_perm(topology),
    )
    print(f"n={topology.n_nucleotides} w_short={band.w_short} w_wide={band.w_wide}")

    energy_fn = pkg.create_default_energy_fn(topology, block_unbonded=True)
    composed = energy_fn.with_params(energy_fn.opt_params())
    body_soa = to_soa(body)

    kernels = (True, False) if "--xla" in sys.argv else (True,)
    for use_kernel in kernels:
        ctx = ops_stencil.prepare_stencil_context(
            composed, band.w_short, band.w_wide, perm=band.perm, kernel=use_kernel
        )
        g = jax.jit(lambda b, c=ctx: ops_stencil.stencil_grads_ctx(composed, c, b))
        us = timeit(g, body_soa)
        print(f"forces ({'pallas' if use_kernel else 'xla'}): {us:9.1f} us", flush=True)

    if "--energy" in sys.argv:
        ctx = ops_stencil.prepare_stencil_context(
            composed, band.w_short, band.w_wide, perm=band.perm, kernel=False
        )
        e = jax.jit(lambda b: ops_stencil.stencil_energy_ctx(composed, ctx, b))
        print(f"energy (xla):     {timeit(e, body_soa):9.1f} us", flush=True)

    chk = jax.jit(band._check)
    print(f"band check:       {timeit(chk, body.center):9.1f} us", flush=True)

    # in-scan force cost: a scan of force evals with a trivial carry update,
    # so per-call dispatch (which dominates isolated timings over the
    # device tunnel) is excluded
    ctx = ops_stencil.prepare_stencil_context(
        composed, band.w_short, band.w_wide, perm=band.perm
    )

    @jax.jit
    def force_scan(b0):
        def step(carry, _):
            g = ops_stencil.stencil_grads_ctx(composed, ctx, carry)
            return jax.tree.map(lambda a, d: a + 1e-12 * d, carry, g), None

        out, _ = jax.lax.scan(step, b0, None, length=500)
        return out

    out = force_scan(body_soa)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = force_scan(body_soa)
    jax.block_until_ready(out)
    us = (time.perf_counter() - t0) / 500 * 1e6
    print(f"forces in-scan:   {us:9.1f} us", flush=True)

    # full step cost from a short scan: (50-step run) / 50
    _, sim = _build_sim(
        topology, kT, mode="stencil", init_centers=body.center, model="dna2"
    )
    sim = sim.replace(save_every=sim.neighbor_update_every * 5)
    run = jax.jit(lambda p, k: sim.run(p, body, 2000, k).observables[0].center)
    params = sim.energy_fn.opt_params()
    out = run(params, jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(3):
        out = run(params, jax.random.PRNGKey(i))
    jax.block_until_ready(out)
    us = (time.perf_counter() - t0) / 3 / 2000 * 1e6
    print(f"full step:        {us:9.1f} us  ({60e6 / us:,.0f} steps/min)")


if __name__ == "__main__":
    main()
