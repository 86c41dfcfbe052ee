"""Hardware compile/run gate for the flagship configurations.

AOT-compiles (jit -> lower -> compile) and then executes ONE step of every
program the benchmark and DiffTRe workflows depend on, at flagship shapes,
on the REAL backend (no interpret mode). Run this before every snapshot:

    python benchmarks/compile_gate.py            # all gates
    python benchmarks/compile_gate.py --fast     # stencil + block only

Exit code 0 = all green. This exists because round 2 shipped a Pallas
VMEM OOM that only manifested at hardware compile time (BENCH_r02 rc=1):
the interpret-mode test suite validates kernel math but not Mosaic
lowering or VMEM budgets. See VERDICT.md (round 2) weakness #3.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the gate must exercise the REAL compiler; refuse to run in interpret mode
os.environ.pop("MYTHOS_TPU_PALLAS_INTERPRET", None)

import jax
import jax.numpy as jnp

FLAGSHIP_N_BP = 5000  # 10k nt, the north-star system size
SIZES_NT = (10_000, 16_000, 50_000)  # VERDICT r2 item 1: clean runs at all three


def _gate(name: str, fn, *args) -> bool:
    t0 = time.perf_counter()
    try:
        lowered = jax.jit(fn).lower(*args)
        compiled = lowered.compile()
        out = compiled(*args)
        jax.block_until_ready(out)
        leaves = jax.tree_util.tree_leaves(out)
        finite = all(
            bool(jnp.all(jnp.isfinite(x))) for x in leaves if hasattr(x, "dtype")
        )
        dt = time.perf_counter() - t0
        if not finite:
            print(f"[compile-gate] {name}: FAIL (non-finite output) [{dt:.1f}s]")
            return False
        print(f"[compile-gate] {name}: OK [{dt:.1f}s]")
        return True
    except Exception as e:  # noqa: BLE001
        dt = time.perf_counter() - t0
        print(f"[compile-gate] {name}: FAIL ({type(e).__name__}: {str(e)[:300]}) [{dt:.1f}s]")
        return False


def _sim_step_gate(n_bp: int, mode: str) -> bool:
    from __graft_entry__ import _build_sim, _tiny_duplex

    kT = 296.15 * 0.1 / 300.0
    topology, body = _tiny_duplex(n_bp)
    _, sim = _build_sim(
        topology, kT, mode=mode, init_centers=body.center, init_orientation=body.orientation, model="dna2", block_size=8
    )
    sim = sim.replace(save_every=sim.neighbor_update_every)
    params = sim.energy_fn.opt_params()
    n_steps = sim.neighbor_update_every  # one rebuild period

    def run(p, k):
        return sim.run(p, body, n_steps, k).observables[0].center

    return _gate(f"{mode}@{topology.n_nucleotides}nt", run, params, jax.random.PRNGKey(0))


def _difftre_map_gate(n_bp: int = 1000, n_states: int = 8) -> bool:
    """The DiffTRe hot path: value_and_grad of the fused energy-over-states
    map (per-state block-table rebuild through the Pallas kernels)."""
    from __graft_entry__ import _build_sim, _tiny_duplex

    kT = 296.15 * 0.1 / 300.0
    topology, body = _tiny_duplex(n_bp)
    energy_fn, _ = _build_sim(
        topology, kT, mode="block", init_centers=body.center, model="dna2"
    )
    from mythos_tpu.simulators.neighbors import (
        block_neighbor_list_for_topology,
        strand_interleave_perm,
    )
    from mythos_tpu import spaces
    import mythos_tpu.energy.dna2 as dna2

    map_nbl = block_neighbor_list_for_topology(
        spaces.free()[0],
        topology,
        dna2.default_neighbor_cutoff(),
        dr_threshold=0.5,
        block_size=8,
        init_centers=body.center,
        symmetric=True,
        r_cutoff_inner=dna2.short_range_neighbor_cutoff(),
        perm=strand_interleave_perm(topology),
    )
    map_fn = energy_fn.replace(map_neighbors=map_nbl)
    states = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (n_states,) + x.shape), body
    )
    params = energy_fn.opt_params()

    def loss(p):
        e = map_fn.with_params(p).map(states)
        return e.sum()

    return _gate(
        f"difftre-map@{topology.n_nucleotides}nt x{n_states}",
        jax.value_and_grad(loss),
        params,
    )


def _kernel_parity_gate(n_bp: int = 1000) -> bool:
    """Pallas stencil kernel (statically-unrolled band, the hardware
    default) vs the pure-XLA stencil path: force/torque cotangents must
    agree on the real chip. This covers the unrolled variant the CPU test
    suite cannot afford to compile (XLA CPU takes ~7 min for a 6-offset
    unrolled interpret-mode kernel; see tests/test_stencil.py note)."""
    import numpy as np

    import mythos_tpu.energy.dna2 as dna2
    from __graft_entry__ import _tiny_duplex
    from mythos_tpu import soa
    from mythos_tpu.ops import stencil as st
    from mythos_tpu.simulators.neighbors import strand_interleave_perm

    t0 = time.perf_counter()
    name = f"kernel-parity@{n_bp * 2}nt"
    try:
        topology, body = _tiny_duplex(n_bp)
        perm = strand_interleave_perm(topology)
        e = dna2.create_default_energy_fn(topology, block_unbonded=True, block_size=8)
        e = e.with_params(e.opt_params())
        ctx_k = st.prepare_stencil_context(e, 12, 18, perm=perm, kernel=True)
        ctx_x = st.prepare_stencil_context(e, 12, 18, perm=perm, kernel=False)
        assert ctx_k.kernel_ctx is not None and ctx_x.kernel_ctx is None
        bsoa = soa.to_soa(body)
        g_k = jax.jit(lambda b: st.stencil_grads_ctx(e, ctx_k, b))(bsoa)
        g_x = jax.jit(lambda b: st.stencil_grads_ctx(e, ctx_x, b))(bsoa)
        jax.block_until_ready((g_k, g_x))
        scale = max(float(jnp.max(jnp.abs(x))) for x in jax.tree.leaves(g_x))
        ok = True
        for x, y in zip(jax.tree.leaves(g_k), jax.tree.leaves(g_x), strict=True):
            if not np.allclose(
                np.asarray(x), np.asarray(y), atol=5e-5 * scale, rtol=2e-3
            ):
                ok = False
        dt = time.perf_counter() - t0
        print(f"[compile-gate] {name}: {'OK' if ok else 'FAIL (mismatch)'} [{dt:.1f}s]")
        return ok
    except Exception as e:  # noqa: BLE001
        dt = time.perf_counter() - t0
        print(f"[compile-gate] {name}: FAIL ({type(e).__name__}: {str(e)[:300]}) [{dt:.1f}s]")
        return False


def _longrun_overflow_gate(
    n_bp: int = FLAGSHIP_N_BP, n_steps: int = 20_000, model: str = "dna2"
) -> bool:
    """>=20k-step thermal run at the flagship size asserting the band never
    flags ``neighbor_overflow``.

    Band-margin changes (site_margin, family slacks, w_terms) were
    previously justified by one-off validation runs described in commit
    messages (r3 8453536); this makes the check standing: a reach that a
    thermally equilibrated duplex outgrows fails the gate, machine-checked
    before every snapshot. The compile gates above run ONE rebuild period
    and would miss equilibrium breathing entirely (VERDICT r3 weak #5).
    """
    from __graft_entry__ import _build_sim, _tiny_duplex

    kT = 296.15 * 0.1 / 300.0
    topology, body = _tiny_duplex(n_bp, form="A" if model == "rna2" else "B")
    _, sim = _build_sim(
        topology, kT, mode="stencil", init_centers=body.center,
        init_orientation=body.orientation, model=model, block_size=8,
    )
    save = n_steps // 10
    save -= save % sim.neighbor_update_every
    sim = sim.replace(save_every=max(sim.neighbor_update_every, save))
    params = sim.energy_fn.opt_params()

    def run(p, k):
        traj = sim.run(p, body, n_steps, k).observables[0]
        ovf = traj.metadata["neighbor_overflow"] if traj.metadata else False
        return traj.center, jnp.any(jnp.asarray(ovf))

    t0 = time.perf_counter()
    name = f"longrun-overflow-{model}@{topology.n_nucleotides}nt x{n_steps}"
    try:
        out, ovf = jax.jit(run)(params, jax.random.PRNGKey(42))
        finite = bool(jnp.all(jnp.isfinite(out)))
        overflow = bool(ovf)
        dt = time.perf_counter() - t0
        if overflow or not finite:
            print(
                f"[compile-gate] {name}: FAIL "
                f"(overflow={overflow} finite={finite}) [{dt:.1f}s]"
            )
            return False
        print(f"[compile-gate] {name}: OK [{dt:.1f}s]")
        return True
    except Exception as e:  # noqa: BLE001
        dt = time.perf_counter() - t0
        print(f"[compile-gate] {name}: FAIL ({type(e).__name__}: {str(e)[:300]}) [{dt:.1f}s]")
        return False


def main() -> int:
    fast = "--fast" in sys.argv
    print(f"[compile-gate] backend: {jax.devices()}")
    ok = True
    for n_nt in SIZES_NT if not fast else (10_000,):
        ok &= _sim_step_gate(n_nt // 2, "stencil")
    ok &= _sim_step_gate(FLAGSHIP_N_BP, "block")
    if not fast:
        ok &= _kernel_parity_gate()
        ok &= _difftre_map_gate()
        ok &= _longrun_overflow_gate()
        # rna2 rides the same gate: r4 justified its margins by 3x1000-step
        # bench cleanliness, which undersamples exactly the thermalization
        # regime where A-form violations appear (VERDICT r4 weak #3)
        ok &= _longrun_overflow_gate(model="rna2")
    print(f"[compile-gate] {'ALL GREEN' if ok else 'RED'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
