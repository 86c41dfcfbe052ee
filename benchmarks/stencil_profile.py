"""Per-step cost breakdown of the stencil tier on the real chip.

Times three nested programs at the flagship shape:
  (a) the Pallas force kernel alone (layout-form in/out)
  (b) stencil_grads_ctx = layout round-trip + kernel + bonded XLA grads
  (c) one full BAOAB Langevin step (b + integrator + RNG)

The (c) - (b) and (b) - (a) gaps are the XLA overhead a fused multi-step
kernel would eliminate. Usage: python benchmarks/stencil_profile.py [n_bp].
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N_BP = int(sys.argv[1]) if len(sys.argv) > 1 else 5000


def timeit(fn, arg, inner=100, reps=5):
    """us per fn application, measured inside a lax.scan of ``inner``
    self-feeding iterations (per-call host dispatch through the TPU tunnel
    is ~1 ms — far above the kernels measured here — so standalone timing
    is meaningless; the scan amortizes it away, like the real hot loop)."""

    @jax.jit
    def scanned(x):
        return jax.lax.scan(lambda c, _: (fn(c), None), x, None, length=inner)[0]

    out = scanned(arg)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = scanned(out)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (reps * inner) * 1e6


def main():
    from __graft_entry__ import _build_sim, _tiny_duplex
    from mythos_tpu import soa
    from mythos_tpu.ops import stencil as st

    kT = 296.15 * 0.1 / 300.0
    topology, body = _tiny_duplex(N_BP)
    _, sim = _build_sim(
        topology, kT, mode="stencil", init_centers=body.center, init_orientation=body.orientation, model="dna2", block_size=8
    )
    e = sim.energy_fn.with_params(sim.energy_fn.opt_params())
    nb = sim.neighbors
    sctx = st.prepare_stencil_context(
        e, nb.w_short, nb.w_wide, perm=nb.perm, w_terms=nb.w_terms
    )
    spec = sctx.spec
    print(
        f"n={spec.n} w_short={spec.w_short} w_wide={spec.w_wide} "
        f"w_terms={spec.w_terms} fused={spec.fused_terms} "
        f"kernel={'on' if sctx.kernel_ctx else 'off'}"
        + (f" S={sctx.kernel_ctx.kspec.s}" if sctx.kernel_ctx else "")
    )
    bsoa = soa.to_soa(body)

    # (a) kernel alone
    if sctx.kernel_ctx is not None:
        kctx = sctx.kernel_ctx
        s = kctx.kspec.s
        com = bsoa.center
        quat = bsoa.orientation
        if sctx.perm_t is not None:
            com = type(com)(*(sctx.apply_perm(c) for c in com))
            quat = type(quat)(*(sctx.apply_perm(c) for c in quat))
        dyn_l = jnp.stack([st._to_layout(c.astype(jnp.float32), s) for c in (*com, *quat)])
        gt_pad = jnp.zeros((1, 8), jnp.float32).at[0, :5].set(1.0)
        def kfn(d):
            out = st._kernel_field_grads(
                kctx.kspec, kctx.params_vec, gt_pad, d, kctx.wt_l, kctx.pn_l, kctx.qf_l
            )
            # epsilon-feed: keeps the carry numerically sane while forcing a
            # data dependence between scan iterations (plain self-feed turns
            # positions into gradients -> NaN geometry)
            return dyn_l + 1e-30 * out

        t_kernel = timeit(kfn, dyn_l)
        print(f"(a) force kernel alone:      {t_kernel:8.1f} us")

    # (b) full force/torque evaluation
    def gfn(b):
        g = st.stencil_grads_ctx(e, sctx, b)
        return jax.tree.map(lambda a, gg: a + 1e-30 * gg, bsoa, g)

    t_grads = timeit(gfn, bsoa)
    print(f"(b) stencil_grads_ctx:       {t_grads:8.1f} us")

    # (c) one Langevin step
    from mythos_tpu.simulators import integrators
    from mythos_tpu import spaces

    from mythos_tpu.rigid_body import RigidBody

    gamma = RigidBody(center=jnp.array([kT / 2.5]), orientation=jnp.array([kT / 7.5]))
    mass = RigidBody(center=jnp.array([1.0]), orientation=jnp.array([[1.0, 1.0, 1.0]]))
    init_fn, step_fn = integrators.nvt_langevin_soa(
        lambda b, **kw: st.stencil_energy_ctx(e, sctx, b),
        spaces.free_soa()[1],
        dt=5e-3,
        kT=kT,
        gamma=gamma,
        grad_fn=lambda b, **kw: st.stencil_grads_ctx(e, sctx, b),
    )
    state0 = init_fn(jax.random.PRNGKey(0), bsoa, mass)
    t_step = timeit(step_fn, state0)
    print(f"(c) full BAOAB step:         {t_step:8.1f} us")
    if sctx.kernel_ctx is not None:
        print(
            f"    layout+bonded overhead:  {t_grads - t_kernel:8.1f} us; "
            f"integrator+RNG overhead: {t_step - t_grads:8.1f} us"
        )
        print(f"    steps/min at this cost:  {60e6 / t_step:,.0f}")


if __name__ == "__main__":
    main()
