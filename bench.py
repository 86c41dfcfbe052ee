"""Benchmark harness: Langevin throughput on the flagship oxDNA model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The north-star target (BASELINE.json) is 1e6 Langevin steps/min for a
10k-nt oxDNA2 system on one v5e chip; ``vs_baseline`` reports
steps/min / 1e6 scaled by system size relative to 10k nt (a size-normalized
nucleotide-steps/min ratio), so progress is comparable across rounds while
the system size grows with the kernel work.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

N_BP = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
N_STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
BLOCK = int(sys.argv[3]) if len(sys.argv) > 3 else 8
MODE = sys.argv[4] if len(sys.argv) > 4 else "stencil"
MODEL = sys.argv[5] if len(sys.argv) > 5 else "dna2"
#: total helix-axis bend in degrees: a non-zero bend is the honest
#: "general conformation" benchmark — it folds the helix into an arc,
#: breaks the banded-stencil layout (true fold-back) and must run the
#: block tier (pass MODE=block)
BEND_DEG = float(sys.argv[6]) if len(sys.argv) > 6 else 0.0

TARGET_NT_STEPS_PER_MIN = 1e6 * 10_000  # 10k-nt at 1e6 steps/min


def _compile_tier(topology, body, kT: float, mode: str):
    """Build + compile + warm up one tier; returns (run, params)."""
    from __graft_entry__ import _build_sim

    _, sim = _build_sim(
        topology, kT, mode=mode, init_centers=body.center,
        init_orientation=body.orientation, model=MODEL, block_size=BLOCK
    )
    # thin trajectory emission so the benchmark measures stepping, not HBM
    # writes; keep it a multiple of neighbor_update_every
    save = max(sim.neighbor_update_every, N_STEPS // 100)
    save -= save % sim.neighbor_update_every
    sim = sim.replace(save_every=max(sim.neighbor_update_every, save))

    def run(p, k):
        traj = sim.run(p, body, N_STEPS, k).observables[0]
        ovf = traj.metadata["neighbor_overflow"] if traj.metadata else False
        return traj.center, jnp.any(jnp.asarray(ovf))

    run = jax.jit(run)
    params = sim.energy_fn.opt_params()

    out, ovf = run(params, jax.random.PRNGKey(0))
    out.block_until_ready()  # compile + warm up
    if bool(ovf):
        # flagged neighbor overflow = the reported physics was wrong;
        # treat like a compile failure so the caller can degrade tiers
        raise RuntimeError(f"neighbor overflow flagged on tier {mode!r}")
    return run, params


def main() -> None:
    import math

    from mythos_tpu.io.synthetic import synthetic_duplex

    kT = 296.15 * 0.1 / 300.0
    topology, body = synthetic_duplex(
        N_BP,
        form="A" if MODEL == "rna2" else "B",
        bend=math.radians(BEND_DEG) if BEND_DEG else None,
    )
    # oxDNA2 on the SoA hot path: the flagship configuration the north-star
    # metric (BASELINE.json) is defined against. Default tier is the banded
    # stencil (ops/stencil.py, near-linear layouts); pass mode "block" for
    # the block-sparse tile path (general conformations).
    #
    # A kernel compile failure on the requested tier DEGRADES to the block
    # tier with a warning instead of crashing the benchmark (the r02
    # postmortem: a stencil VMEM OOM turned the round's record into rc=1).
    try:
        run, params = _compile_tier(topology, body, kT, MODE)
    except Exception as e:  # noqa: BLE001 — any compile/runtime failure
        if MODE == "block":
            raise
        print(
            f"bench: tier {MODE!r} failed to compile/run ({type(e).__name__}: "
            f"{str(e)[:500]}); falling back to 'block'",
            file=sys.stderr,
        )
        run, params = _compile_tier(topology, body, kT, "block")

    t0 = time.perf_counter()
    reps = 3
    for i in range(reps):
        out, ovf = run(params, jax.random.PRNGKey(i + 1))
    out.block_until_ready()
    elapsed = (time.perf_counter() - t0) / reps
    if bool(ovf):
        print("bench: neighbor overflow flagged during timing reps", file=sys.stderr)

    steps_per_min = N_STEPS / elapsed * 60.0
    nt_steps_per_min = steps_per_min * topology.n_nucleotides
    assert bool(jnp.all(jnp.isfinite(out))), "benchmark produced non-finite trajectory"

    print(
        json.dumps(
            {
                "metric": (
                    f"langevin_steps_per_min_ox{MODEL}_{topology.n_nucleotides}nt"
                    + (f"_bent{int(BEND_DEG)}deg" if BEND_DEG else "")
                ),
                "value": round(steps_per_min, 1),
                "unit": "steps/min",
                "vs_baseline": round(nt_steps_per_min / TARGET_NT_STEPS_PER_MIN, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
