"""Which band-validity detector flags the rna2 stencil tier, and when?

Instruments the multi-step flow at the bench shape: init check, far
fold-back sweep, and the in-kernel exact per-offset checks (output row 19)
chunk by chunk. Usage: python benchmarks/debug_rna2_ovf.py [n_bp] [margin].
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

N_BP = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
MARGIN = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def main():
    from mythos_tpu import soa, spaces
    from mythos_tpu.io.synthetic import synthetic_duplex
    import mythos_tpu.energy.rna2 as rna2
    from mythos_tpu.ops import stencil as st
    from mythos_tpu.simulators import integrators
    from mythos_tpu.simulators.neighbors import (
        stencil_band_for_site_cutoffs,
        strand_interleave_perm,
    )

    kT = 296.15 * 0.1 / 300.0
    topology, body = synthetic_duplex(N_BP, form="A")
    perm = strand_interleave_perm(topology)
    nb = stencil_band_for_site_cutoffs(
        spaces.free()[0], topology, rna2.per_term_site_cutoffs(),
        init_centers=body.center, init_orientation=body.orientation,
        dr_threshold=0.5, perm=perm, site_margin=MARGIN,
    )
    print(
        f"margin={MARGIN} w_terms={nb.w_terms} w_wide={nb.w_wide} "
        f"check_dm={nb.check_dm} overflow@init={bool(nb.did_overflow)}",
        flush=True,
    )

    e = rna2.create_default_energy_fn(topology, block_unbonded=True, block_size=8)
    e = e.with_params(e.opt_params())
    sctx = st.prepare_stencil_context(
        e, nb.w_short, nb.w_wide, perm=nb.perm, w_terms=nb.w_terms
    )
    from mythos_tpu.rigid_body import RigidBody
    from mythos_tpu.simulators.tpu import StaticSimulatorParams

    sp = StaticSimulatorParams(
        seq=jnp.asarray(topology.seq),
        mass=RigidBody(center=jnp.array([1.0]), orientation=jnp.array([[1.0, 1.0, 1.0]])),
        gamma=RigidBody(center=jnp.array([kT / 2.5]), orientation=jnp.array([kT / 7.5])),
        bonded_neighbors=jnp.asarray(topology.bonded_neighbors),
        checkpoint_every=0, dt=5e-3, kT=kT,
    )
    mctx = st.prepare_multistep_context(
        e, sctx, sp, 20, site_checks=nb.site_checks, check_dm=nb.check_dm
    )
    print(f"multistep OK: S={mctx.mspec.kspec.s} checks={len(mctx.mspec.site_checks)} "
          f"check_dm={mctx.mspec.check_dm}", flush=True)

    bsoa = soa.to_soa(body)
    init_fn, _ = integrators.nvt_langevin_soa(
        lambda b, **kw: st.stencil_energy_ctx(e, sctx, b),
        spaces.free_soa()[1], dt=5e-3, kT=kT, gamma=sp.gamma,
        grad_fn=lambda b, **kw: st.stencil_grads_ctx(e, sctx, b),
    )
    state0 = init_fn(jax.random.PRNGKey(0), bsoa, sp.mass)
    state_l = st.state_to_layout(mctx, state0)

    @jax.jit
    def chunk(state_l, key):
        noise = st.multistep_noise(key, mctx.mspec)
        out = st.multistep_chunk(mctx, noise, state_l)
        com, quat = st.slot_positions_from_layout(mctx, out)
        far = nb.far_check(tuple(com), orientation=tuple(quat), already_permuted=True)
        return out[:19], jnp.max(out[19]), far

    # ALSO the init-state far + in-kernel-style check before any stepping
    com0, quat0 = st.slot_positions_from_layout(mctx, state_l)
    far0 = nb.far_check(tuple(com0), orientation=tuple(quat0), already_permuted=True)
    full0 = nb.build(tuple(com0), orientation=tuple(quat0), already_permuted=True)[1]
    print(f"t=0: far={bool(far0)} full_check={bool(full0)}", flush=True)

    key = jax.random.PRNGKey(1)
    import sys as _s; n_chunks = int(_s.argv[3]) if len(_s.argv) > 3 else 10
    for c in range(n_chunks):
        key, sk = jax.random.split(key)
        state_l, viol, far = chunk(state_l, sk)
        print(f"chunk {c:2d} (steps {(c + 1) * 20:4d}): in-kernel viol={float(viol):4.0f} "
              f"far={bool(far)}", flush=True)
        if bool(far):
            com_f, quat_f = st.slot_positions_from_layout(mctx, state_l)
            far_diag(nb, tuple(com_f), tuple(quat_f))
            break




def far_diag(nb, com, quat):
    """Min far-pair site-union AABB gap + the block pair achieving it."""
    import numpy as np
    from mythos_tpu.soa import Quat, Vec3, quat_frame_soa
    from mythos_tpu.simulators.neighbors import _site_coeffs

    comps = tuple(np.asarray(c) for c in com)
    qc = tuple(np.asarray(c) for c in quat)
    from mythos_tpu.simulators.neighbors import _np_frames

    a1, a2, a3 = _np_frames(np.stack(qc, -1))
    c = np.stack(comps, -1)
    sites = {
        nm: c + cs[0] * a1 + cs[1] * a2 + cs[2] * a3
        for nm, cs in ((nm, _site_coeffs(v)) for nm, v in nb.site_geometry)
    }
    b_sz = nb.check_block
    n = nb.n
    nbk = -(-n // b_sz)
    n_pad = nbk * b_sz
    lo = hi = None
    for s in sites.values():
        sp = np.pad(s, ((0, n_pad - n), (0, 0)), constant_values=np.nan).reshape(nbk, b_sz, 3)
        lo_s, hi_s = np.nanmin(sp, 1), np.nanmax(sp, 1)
        lo = lo_s if lo is None else np.minimum(lo, lo_s)
        hi = hi_s if hi is None else np.maximum(hi, hi_s)
    gap = np.maximum(np.maximum(lo[:, None] - hi[None, :], lo[None, :] - hi[:, None]), 0.0)
    d = np.sqrt((gap ** 2).sum(-1))
    col = np.arange(nbk)
    dm = nb.check_dm
    delta_far = -(-(dm + 1 - (b_sz - 1)) // b_sz)
    far = np.abs(col[:, None] - col[None, :]) >= delta_far
    d_far = np.where(far, d, np.inf)
    i, j = np.unravel_index(np.argmin(d_far), d_far.shape)
    print(f"far diag: min gap {d_far[i, j]:.3f} su at blocks ({i}, {j}) "
          f"(slots ~{i * b_sz}-{i * b_sz + b_sz}, {j * b_sz}-{j * b_sz + b_sz}); "
          f"far_cutoff={nb.far_cutoff:.3f} check_dm={dm} delta_far={delta_far} b_sz={b_sz}")


if __name__ == "__main__":
    main()
