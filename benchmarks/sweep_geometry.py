"""Sweep the fused-kernel tile geometry on the real chip.

Explores (block_size, skin, rebuild interval) for the flagship 10k-nt oxDNA2
Langevin bench in ONE process (compile cache shared). Usage:

    python benchmarks/sweep_geometry.py [n_bp] [n_steps]
"""

from __future__ import annotations

import sys
import time

import jax

sys.path.insert(0, "/root/repo")

N_BP = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
N_STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 600

CONFIGS = [
    # (block, skin, rebuild)
    (8, 0.5, 20),  # round-2 baseline
    (8, 0.3, 20),
    (8, 0.2, 20),
    (8, 0.2, 10),
    (8, 0.1, 10),
    (8, 0.5, 40),
    (8, 0.8, 40),
    (16, 0.5, 20),
    (16, 0.2, 10),
]


def main() -> None:
    from __graft_entry__ import _build_sim, _tiny_duplex

    kT = 296.15 * 0.1 / 300.0
    topology, body = _tiny_duplex(N_BP)

    for block, skin, rebuild in CONFIGS:
        try:
            _, sim = _build_sim(
                topology,
                kT,
                mode="block",
                init_centers=body.center,
                model="dna2",
                block_size=block,
                neighbor_update_every=rebuild,
                dr_threshold=skin,
            )
        except Exception as e:  # capacity/layout failures are data too
            print(f"B={block} skin={skin} u={rebuild}: BUILD FAIL {e}")
            continue
        nb = sim.neighbors
        # one trajectory save: N_STEPS must be a multiple of every rebuild
        sim = sim.replace(save_every=N_STEPS)
        run = jax.jit(lambda p, k, s=sim: s.run(p, body, N_STEPS, k).observables[0])
        params = sim.energy_fn.opt_params()
        try:
            out = run(params, jax.random.PRNGKey(0))
            jax.block_until_ready(out.center)
        except Exception as e:
            print(f"B={block} skin={skin} u={rebuild}: RUN FAIL {type(e).__name__} {e}")
            continue
        t0 = time.perf_counter()
        out = run(params, jax.random.PRNGKey(1))
        jax.block_until_ready(out.center)
        dt = time.perf_counter() - t0
        ovf = bool(out.metadata["neighbor_overflow"].any()) if out.metadata else False
        spm = N_STEPS / dt * 60.0
        print(
            f"B={block} skin={skin} u={rebuild}: cap_in={nb.capacity_inner} "
            f"cap={nb.capacity} {spm:,.0f} steps/min ({dt / N_STEPS * 1e6:.0f} us/step)"
            + (" OVERFLOW" if ovf else "")
        )


if __name__ == "__main__":
    main()
