"""Benchmark suite over the BASELINE.json configurations.

Prints one JSON line per benchmark. Run on the target hardware:

    python benchmarks/run_all.py [--quick]

Configs (BASELINE.json "configs"):
- 8-bp oxDNA1 duplex Langevin (the reference's jax-md example scale)
- 40-bp oxDNA2 duplex with seq-specific params + Debye-Hueckel
- 10k-nt oxDNA2 duplex on the block-sparse SoA + fused Pallas path
- RNA (oxRNA2-terms) duplex with structural observable evaluation
- DiffTRe trajectory re-evaluation + parameter-gradient rate at 10k nt
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

QUICK = "--quick" in sys.argv
KT = 296.15 * 0.1 / 300.0


def report(metric: str, value: float, unit: str, **extra) -> None:
    print(json.dumps({"metric": metric, "value": round(value, 2), "unit": unit, **extra}))


def _time(fn, *args, reps=3):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, out)
    return (time.perf_counter() - t0) / reps


def bench_langevin(model: str, n_bp: int, mode: str, steps: int, label: str) -> None:
    from __graft_entry__ import _build_sim, _tiny_duplex

    topology, body = _tiny_duplex(n_bp)
    _, sim = _build_sim(topology, KT, mode=mode, init_centers=body.center, model=model)
    # save_every must divide n_steps and be a multiple of the rebuild stride
    u = sim.neighbor_update_every
    save = next(s for s in range(max(u, steps // 10), 0, -1) if steps % s == 0 and s % u == 0)
    sim = sim.replace(save_every=save)
    params = sim.energy_fn.opt_params()
    run = jax.jit(lambda p, k: sim.run(p, body, steps, k).observables[0].center)
    dt = _time(run, params, jax.random.PRNGKey(0))
    report(label, steps / dt * 60.0, "steps/min", n_nt=topology.n_nucleotides)


def bench_difftre(n_bp: int, n_states: int) -> None:
    from __graft_entry__ import _tiny_duplex

    import mythos_tpu.energy.dna2 as dna2
    from mythos_tpu import spaces
    from mythos_tpu.rigid_body import RigidBody
    from mythos_tpu.simulators.neighbors import block_neighbor_list_for_topology

    topology, body = _tiny_duplex(n_bp)
    nbl = block_neighbor_list_for_topology(
        spaces.free()[0], topology, dna2.default_neighbor_cutoff(),
        dr_threshold=0.5, block_size=8, init_centers=body.center, symmetric=True,
    )
    e0 = dna2.create_default_energy_fn(topology).replace(map_neighbors=nbl)
    key = jax.random.PRNGKey(0)
    centers = body.center[None] + 0.002 * jax.random.normal(key, (n_states, *body.center.shape))
    quats = jnp.tile(body.orientation[None], (n_states, 1, 1))
    traj = RigidBody(center=centers, orientation=quats)
    params = e0.opt_params()

    f = jax.jit(lambda p: e0.with_params(p).map(traj))
    dt = _time(f, params)
    report("difftre_energy_reeval", n_states / dt, "states/s", n_nt=topology.n_nucleotides)

    g = jax.jit(jax.grad(lambda p: jnp.sum(e0.with_params(p).map(traj))))
    dt = _time(g, params)
    report("difftre_param_grad", n_states / dt, "states/s", n_nt=topology.n_nucleotides)


def bench_observables(n_bp: int) -> None:
    from __graft_entry__ import _build_sim, _tiny_duplex

    import mythos_tpu.energy.dna1 as dna1
    from mythos_tpu.observables import PitchAngle, PropellerTwist, Rise

    topology, body = _tiny_duplex(n_bp)
    _, sim = _build_sim(topology, KT, mode="dense")
    steps = 200 if QUICK else 1000
    sim = sim.replace(save_every=max(1, steps // 100))
    traj = jax.jit(lambda p, k: sim.run(p, body, steps, k).observables[0])(
        sim.energy_fn.opt_params(), jax.random.PRNGKey(0)
    )
    n = topology.n_nucleotides
    bps = jnp.array([[i, n - 1 - i] for i in range(n_bp)], dtype=jnp.int32)
    quartets = jnp.array(
        [[[i, n - 1 - i], [i + 1, n - 2 - i]] for i in range(n_bp - 1)], dtype=jnp.int32
    )
    tf = dna1.default_transform_fn()
    from mythos_tpu import spaces

    disp = spaces.free()[0]
    obs = {
        "propeller_twist_deg": PropellerTwist(rigid_body_transform_fn=tf, h_bonded_base_pairs=bps),
        "pitch_angle": PitchAngle(rigid_body_transform_fn=tf, quartets=quartets, displacement_fn=disp),
        "rise": Rise(rigid_body_transform_fn=tf, quartets=quartets, displacement_fn=disp),
    }
    for name, ob in obs.items():
        val = float(jnp.mean(jax.jit(ob)(traj)))
        report(f"observable_{name}", val, "value", n_nt=n)


def main() -> None:
    steps_small = 2000 if QUICK else 10000
    steps_large = 500 if QUICK else 2000
    bench_langevin("dna1", 8, "dense", steps_small, "langevin_oxdna1_8bp")
    bench_langevin("dna2", 40, "dense", steps_small, "langevin_oxdna2_40bp")
    bench_langevin("dna2", 5000, "block", steps_large, "langevin_oxdna2_10knt_fused")
    bench_difftre(5000, 10 if QUICK else 50)
    bench_observables(8)


if __name__ == "__main__":
    main()
