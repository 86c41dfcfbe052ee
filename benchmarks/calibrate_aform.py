"""Measure A-form rna2 thermal site-distance breathing per family/offset.

The site-mode band sizes per-term reaches on the IDEAL init geometry with
per-family slacks that absorb how much closer thermally equilibrated
duplexes approach than the ideal helix. The shipped slacks were calibrated
on B-DNA at 296 K (simulators/neighbors.py _fam_slack); r4 measured REAL
exact violations for A-form rna2 at those slacks (thermal breathing beyond
them at thermalization peaks, noise-realization dependent), which is why
rna2 ships with site_margin 7 and pays ~1.5x throughput vs dna2.

This script runs the same procedure used for the B-DNA numbers: long
thermal runs of an A-form helix (multiple seeds), tracking the running
MINIMUM site distance per (family, slot offset) against the ideal-init
minima. The required slack per family is max over offsets of
(ideal_min - thermal_min) over every offset whose thermal minimum comes
near the family's largest bare cutoff.

Usage: python benchmarks/calibrate_aform.py [n_bp] [n_steps] [n_seeds]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

N_BP = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
N_STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
N_SEEDS = int(sys.argv[3]) if len(sys.argv) > 3 else 3
MODEL = sys.argv[4] if len(sys.argv) > 4 else "rna2"
MARGIN = int(sys.argv[5]) if len(sys.argv) > 5 else 7
D_MAX = 40  # offsets measured (>> any plausible band reach)
N_INNER = 20


def _site_positions(nb, com, quat):
    from mythos_tpu.simulators.neighbors import _site_coeffs
    from mythos_tpu.soa import Quat, Vec3, quat_frame_soa

    a1, a2, a3 = quat_frame_soa(Quat(*quat))
    comv = Vec3(*com)
    return {
        nm: comv + cs[0] * a1 + cs[1] * a2 + cs[2] * a3
        for nm, cs in ((nm, _site_coeffs(v)) for nm, v in nb.site_geometry)
    }


def _fam_offset_mins(nb, fams, com, quat):
    """(|fams|, D_MAX) min site distance per family per slot offset
    (mirrors StencilBand._check_site.fam_mins_all, which does not exclude
    bonded pairs either — they live deep inside every band reach)."""
    sites = _site_positions(nb, com, quat)
    n = nb.n
    idx = jnp.arange(n)
    names = sorted(sites)
    pk = jnp.stack([c for nm in names for c in sites[nm]])
    comp_of = {nm: 3 * k for k, nm in enumerate(names)}
    out = []
    for d in range(1, D_MAX + 1):
        ok = idx + d < n
        rolled = jnp.roll(pk, -d, axis=1)
        row = []
        for fa, fb in fams:
            ia, ib = comp_of[fa], comp_of[fb]
            d2 = sum((rolled[ib + k] - pk[ia + k]) ** 2 for k in range(3))
            m = jnp.min(jnp.where(ok, d2, jnp.inf))
            if fa != fb:
                d2r = sum((rolled[ia + k] - pk[ib + k]) ** 2 for k in range(3))
                m = jnp.minimum(m, jnp.min(jnp.where(ok, d2r, jnp.inf)))
            row.append(m)
        out.append(jnp.stack(row))
    return jnp.sqrt(jnp.stack(out, axis=1))  # (|fams|, D_MAX)


def main():
    import importlib

    pkg = importlib.import_module(f"mythos_tpu.energy.{MODEL}")
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
    topology, body = synthetic_duplex(N_BP, form="A" if MODEL == "rna2" else "B")
    perm = strand_interleave_perm(topology)
    nb = stencil_band_for_site_cutoffs(
        spaces.free()[0], topology, pkg.per_term_site_cutoffs(),
        init_centers=body.center, init_orientation=body.orientation,
        dr_threshold=0.5, perm=perm, site_margin=MARGIN,
    )
    sc = pkg.per_term_site_cutoffs()
    fam_cut = {}
    for prs in sc["terms"].values():
        for fa, fb, cu in prs:
            key = tuple(sorted((fa, fb)))
            fam_cut[key] = max(fam_cut.get(key, 0.0), float(cu))
    fams = sorted(fam_cut)
    print(f"families: {fams}")
    print(f"model={MODEL} band: w_terms={nb.w_terms} w_wide={nb.w_wide} margin={MARGIN}")

    e = pkg.create_default_energy_fn(topology, block_unbonded=True, block_size=8)
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

    @jax.jit
    def chunk(state_l, key, mins):
        noise = st.multistep_noise(key, mctx.mspec)
        out = st.multistep_chunk(mctx, noise, state_l)
        com, quat = st.slot_positions_from_layout(mctx, out)
        m = _fam_offset_mins(nb, fams, tuple(com), tuple(quat))
        return out[:19], jnp.minimum(mins, m), jnp.max(out[19])

    # ideal (init) minima
    state0 = init_fn(jax.random.PRNGKey(0), bsoa, sp.mass)
    state_l0 = st.state_to_layout(mctx, state0)
    com0, quat0 = st.slot_positions_from_layout(mctx, state_l0)
    ideal = np.asarray(
        jax.jit(lambda c, q: _fam_offset_mins(nb, fams, c, q))(
            tuple(com0), tuple(quat0)
        )
    )

    mins = jnp.full((len(fams), D_MAX), jnp.inf)
    n_chunks = N_STEPS // N_INNER
    for seed in range(N_SEEDS):
        state_l = st.state_to_layout(
            mctx, init_fn(jax.random.PRNGKey(100 + seed), bsoa, sp.mass)
        )
        key = jax.random.PRNGKey(1000 + seed)
        viol_tot = 0.0
        for c in range(n_chunks):
            key, sk = jax.random.split(key)
            state_l, mins, viol = chunk(state_l, sk, mins)
            viol_tot += float(viol)
            if (c + 1) % 200 == 0:
                print(f"seed {seed} steps {(c + 1) * N_INNER}: viol={viol_tot:.0f}",
                      flush=True)
        print(f"seed {seed} done (in-kernel viol total {viol_tot:.0f})", flush=True)

    mins_np = np.asarray(mins)
    # The band is valid iff every offset whose THERMAL minimum dips below
    # the bare cutoff lies inside the reach, and the reach is sized from
    # IDEAL distances < cutoff + slack. So the required slack per family
    # is max over offsets with thermal_min(o) < cutoff of
    # (ideal_min(o) - cutoff). Offsets are also printed in a window above
    # the cutoff so near-misses (other noise realizations!) are visible.
    print("\nfamily     cutoff   offset  ideal   thermal  req-slack  (window: thermal < cutoff + 0.5)")
    suggested = {}
    for fi, fam in enumerate(fams):
        cu = fam_cut[fam]
        need = 0.0
        for d in range(D_MAX):
            th, idl = mins_np[fi, d], ideal[fi, d]
            if th < cu + 0.5 and np.isfinite(th):
                req = idl - cu if th < cu else 0.0
                need = max(need, req)
                mark = " VIOLATES" if th < cu else ""
                print(
                    f"{fam[0]:>5}-{fam[1]:<5} {cu:6.3f}  {d + 1:4d}  "
                    f"{idl:7.3f} {th:7.3f}  {req:8.3f}{mark}"
                )
        suggested[fam] = need
    print("\nrequired A-form slacks (+0.25 safety for unsampled noise realizations):")
    for fam, v in suggested.items():
        print(f"  {fam}: measured {v:.3f} -> suggest {v + 0.25:.3f}")


if __name__ == "__main__":
    main()
