"""WHERE do A-form rna2 band violations happen — frayed ends or bulk?

Runs one seed of the calibrate_aform protocol and reports, per chunk, the
global min back-base site distance at offsets BEYOND the hb reach together
with the slot index achieving it. If the minima cluster at the duplex ends
(slots < K or > n-K in the interleaved layout), the violations are end
fraying — a structural effect no uniform slack can absorb — rather than
uniform thermal breathing.

Usage: python benchmarks/diag_aform_where.py [n_bp] [n_steps]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

N_BP = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
N_STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
N_INNER = 20
D_LO = 8  # report offsets strictly beyond this
D_MAX = 40


def main():
    import mythos_tpu.energy.rna2 as rna2
    from benchmarks.calibrate_aform import _site_positions
    from mythos_tpu import soa, spaces
    from mythos_tpu.io.synthetic import synthetic_duplex
    from mythos_tpu.ops import stencil as st
    from mythos_tpu.rigid_body import RigidBody
    from mythos_tpu.simulators import integrators
    from mythos_tpu.simulators.neighbors import (
        stencil_band_for_site_cutoffs,
        strand_interleave_perm,
    )
    from mythos_tpu.simulators.tpu import StaticSimulatorParams

    kT = 296.15 * 0.1 / 300.0
    topology, body = synthetic_duplex(N_BP, form="A")
    perm = strand_interleave_perm(topology)
    nb = stencil_band_for_site_cutoffs(
        spaces.free()[0], topology, rna2.per_term_site_cutoffs(),
        init_centers=body.center, init_orientation=body.orientation,
        dr_threshold=0.5, perm=perm, site_margin=7,
    )
    e = rna2.create_default_energy_fn(topology, block_unbonded=True, block_size=8)
    e = e.with_params(e.opt_params())
    sctx = st.prepare_stencil_context(
        e, nb.w_short, nb.w_wide, perm=nb.perm, w_terms=nb.w_terms
    )
    sp = StaticSimulatorParams(
        seq=jnp.asarray(topology.seq),
        mass=RigidBody(center=jnp.array([1.0]), orientation=jnp.array([[1.0, 1.0, 1.0]])),
        gamma=RigidBody(center=jnp.array([kT / 2.5]), orientation=jnp.array([kT / 7.5])),
        bonded_neighbors=jnp.asarray(topology.bonded_neighbors),
        checkpoint_every=0, dt=5e-3, kT=kT,
    )
    mctx = st.prepare_multistep_context(
        e, sctx, sp, N_INNER, site_checks=nb.site_checks, check_dm=nb.check_dm
    )
    bsoa = soa.to_soa(body)
    init_fn, _ = integrators.nvt_langevin_soa(
        lambda b, **kw: st.stencil_energy_ctx(e, sctx, b),
        spaces.free_soa()[1], dt=5e-3, kT=kT, gamma=sp.gamma,
        grad_fn=lambda b, **kw: st.stencil_grads_ctx(e, sctx, b),
    )
    n = nb.n

    @jax.jit
    def chunk(state_l, key):
        noise = st.multistep_noise(key, mctx.mspec)
        out = st.multistep_chunk(mctx, noise, state_l)
        com, quat = st.slot_positions_from_layout(mctx, out)
        sites = _site_positions(nb, tuple(com), tuple(quat))
        back, base = sites["back"], sites["base"]
        idx = jnp.arange(n)
        best = jnp.asarray(jnp.inf)
        best_i = jnp.asarray(0)
        best_d = jnp.asarray(0)
        pkb = jnp.stack(list(back))
        pke = jnp.stack(list(base))
        for d in range(D_LO + 1, D_MAX + 1):
            ok = idx + d < n
            re_ = jnp.roll(pke, -d, axis=1)
            d2 = sum((re_[k] - pkb[k]) ** 2 for k in range(3))
            d2 = jnp.where(ok, d2, jnp.inf)
            m = jnp.min(d2)
            i = jnp.argmin(d2)
            upd = m < best
            best_i = jnp.where(upd, i, best_i)
            best_d = jnp.where(upd, d, best_d)
            best = jnp.minimum(best, m)
        return out[:19], jnp.sqrt(best), best_i, best_d, jnp.max(out[19])

    state_l = st.state_to_layout(mctx, init_fn(jax.random.PRNGKey(101), bsoa, sp.mass))
    key = jax.random.PRNGKey(1001)
    hist = []
    for c in range(N_STEPS // N_INNER):
        key, sk = jax.random.split(key)
        state_l, dmin, imin, doff, viol = chunk(state_l, sk)
        hist.append((float(dmin), int(imin), int(doff), float(viol)))
        if (c + 1) % 100 == 0:
            dm, im, do, vi = min(hist[-100:], key=lambda t: t[0])
            print(
                f"steps {(c + 1) * N_INNER:6d}: min back-base(d>{D_LO}) "
                f"{dm:6.3f} su at slot {im} (of {n}) offset {do} "
                f"(end-dist {min(im, n - im)}), viol={vi:.0f}",
                flush=True,
            )
    arr = np.asarray([h[:3] for h in hist])
    close = arr[arr[:, 0] < 0.6]
    if close.size:
        ends = np.minimum(close[:, 1], n - close[:, 1])
        print(f"\nchunks with min < 0.6 su: {len(close)}; "
              f"slot end-distance percentiles [10,50,90]: "
              f"{np.percentile(ends, [10, 50, 90])}")
    else:
        print("\nno chunk dipped below 0.6 su")


if __name__ == "__main__":
    main()
