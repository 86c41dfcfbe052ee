"""Per-component ablation of the fused multi-step stencil kernel.

Times `_multistep_chunk_l` under modified static specs to attribute the
per-step cost: per-offset marginal band cost, Debye tail, in-kernel site
checks, bonded terms. Usage: python benchmarks/ablate_stencil.py [n_bp].
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N_BP = int(sys.argv[1]) if len(sys.argv) > 1 else 5000


def time_chunk(mctx, noise, state_l, inner=20, reps=8):
    """us/step, MIN over ``reps`` separately-timed dispatches.

    The axon tunnel occasionally stalls a dispatch by ~3 ms; averaging
    smears that over the samples (the r4 carry-count wild-goose chase), so
    robust per-kernel numbers need min-of-samples."""
    from mythos_tpu.ops import stencil as st

    @jax.jit
    def scanned(s):
        def f(c, _):
            out = st._multistep_chunk_l(
                mctx.mspec, mctx.params_vec, mctx.gt, noise, c,
                mctx.sctx.kernel_ctx.wt_l, mctx.sctx.kernel_ctx.pn_l,
                mctx.sctx.kernel_ctx.qf_l, mctx.bd_l,
            )
            return out[:19], None

        return jax.lax.scan(f, s, None, length=inner)[0]

    out = scanned(state_l)
    jax.block_until_ready(out)
    n_steps = mctx.mspec.n_inner * inner
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = scanned(out)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n_steps * 1e6)
    return best


def main():
    from __graft_entry__ import _build_sim, _tiny_duplex
    from mythos_tpu import soa
    from mythos_tpu.ops import stencil as st
    from mythos_tpu.simulators import integrators

    kT = 296.15 * 0.1 / 300.0
    topology, body = _tiny_duplex(N_BP)
    _, sim = _build_sim(
        topology, kT, mode="stencil", init_centers=body.center,
        init_orientation=body.orientation, model="dna2", block_size=8,
    )
    e = sim.energy_fn.with_params(sim.energy_fn.opt_params())
    nb = sim.neighbors
    sctx = st.prepare_stencil_context(
        e, nb.w_short, nb.w_wide, perm=nb.perm, w_terms=nb.w_terms
    )
    mctx = st.prepare_multistep_context(
        e, sctx, sim.simulator_params, sim.neighbor_update_every,
        site_checks=getattr(nb, "site_checks", None) or (),
        check_dm=getattr(nb, "check_dm", 0),
    )
    spec = sctx.spec
    print(
        f"n={spec.n} S={sctx.kernel_ctx.kspec.s} w_short={spec.w_short} "
        f"w_wide={spec.w_wide} w_terms={spec.w_terms} "
        f"checks={len(mctx.mspec.site_checks)} check_dm={mctx.mspec.check_dm} "
        f"n_inner={mctx.mspec.n_inner}"
    )

    # initial state via the integrator init
    bsoa = soa.to_soa(body)
    init_fn, _ = integrators.nvt_langevin_soa(
        lambda b, **kw: st.stencil_energy_ctx(e, sctx, b),
        __import__("mythos_tpu.spaces", fromlist=["free_soa"]).free_soa()[1],
        dt=5e-3, kT=kT,
        gamma=sim.simulator_params.gamma,
        grad_fn=lambda b, **kw: st.stencil_grads_ctx(e, sctx, b),
    )
    state0 = init_fn(jax.random.PRNGKey(0), bsoa, sim.simulator_params.mass)
    state_l = st.state_to_layout(mctx, state0)
    noise = st.multistep_noise(jax.random.PRNGKey(1), mctx.mspec)

    base = time_chunk(mctx, noise, state_l)
    print(f"baseline:                {base:8.2f} us/step")

    def variant(name, **changes):
        mspec2 = mctx.mspec
        spec2 = mspec2.kspec.spec
        spec_changes = {k: v for k, v in changes.items() if hasattr(spec2, k) and k in changes}
        ms_changes = {k: v for k, v in changes.items() if k in ("site_checks", "check_dm")}
        if spec_changes:
            spec2 = spec2._replace(**spec_changes)
            mspec2 = mspec2._replace(kspec=mspec2.kspec._replace(spec=spec2))
        if ms_changes:
            mspec2 = mspec2._replace(**ms_changes)
        mctx2 = mctx._replace(mspec=mspec2)
        t = time_chunk(mctx2, noise, state_l)
        print(f"{name:24s} {t:8.2f} us/step  (delta {base - t:+7.2f})")
        return t

    # per-offset marginal: shrink every short-term reach to 1..2
    variant("w_terms=(2,2,2,2):", w_terms=(2, 2, 2, 2))
    variant("w_terms=(8,6,6,4):", w_terms=(8, 6, 6, 4))
    # Debye tail off (w_wide = w_short keeps layout; tail loop skipped)
    variant("no debye tail:", w_wide=spec.w_short)
    # in-kernel site checks off
    variant("no site checks:", site_checks=(), check_dm=0)
    # bonded cost: can't easily zero via spec; approximate by flags
    mspec_nb = mctx.mspec._replace(bonded_flags=(False, False, False))
    t = time_chunk(mctx._replace(mspec=mspec_nb), noise, state_l)
    print(f"{'no bonded terms:':24s} {t:8.2f} us/step  (delta {base - t:+7.2f})")
    # fused vs per-term reverse schedule
    variant("per-term reverse:", fused_terms=False)


if __name__ == "__main__":
    main()
