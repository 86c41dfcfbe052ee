"""Reproduce + capture diagnostics for the S=784 (100k-nt) Mosaic failure.

r3 recorded: `tpu_compile_helper subprocess exit code 1, no diagnostic
surfaced`. This isolates the compile of the single-step stencil force
kernel at growing sublane extents to find the exact boundary and whatever
stderr the helper emits. Usage: python benchmarks/repro_s784.py [n_bp...].
"""

from __future__ import annotations

import sys
import traceback

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

N_BPS = [int(a) for a in sys.argv[1:]] or [30000, 40000, 50000]


def try_compile(n_bp: int) -> None:
    from __graft_entry__ import _build_sim, _tiny_duplex
    from mythos_tpu import soa
    from mythos_tpu.ops import stencil as st

    kT = 296.15 * 0.1 / 300.0
    topology, body = _tiny_duplex(n_bp)
    _, sim = _build_sim(
        topology, kT, mode="stencil", init_centers=body.center,
        init_orientation=body.orientation, model="dna2", block_size=8,
    )
    e = sim.energy_fn.with_params(sim.energy_fn.opt_params())
    nb = sim.neighbors
    sctx = st.prepare_stencil_context(
        e, nb.w_short, nb.w_wide, perm=nb.perm, w_terms=nb.w_terms
    )
    kctx = sctx.kernel_ctx
    s = kctx.kspec.s
    print(f"n={sctx.spec.n} S={s} fused={sctx.spec.fused_terms} "
          f"w_terms={sctx.spec.w_terms} w_wide={sctx.spec.w_wide}", flush=True)
    bsoa = soa.to_soa(body)
    com, quat = bsoa.center, bsoa.orientation
    if sctx.perm_t is not None:
        com = type(com)(*(sctx.apply_perm(c) for c in com))
        quat = type(quat)(*(sctx.apply_perm(c) for c in quat))
    dyn_l = jnp.stack([st._to_layout(c.astype(jnp.float32), s) for c in (*com, *quat)])
    gt_pad = jnp.zeros((1, 8), jnp.float32).at[0, :5].set(1.0)

    def f(d):
        return st._kernel_field_grads(
            kctx.kspec, kctx.params_vec, gt_pad, d, kctx.wt_l, kctx.pn_l, kctx.qf_l
        )

    try:
        jax.jit(f).lower(dyn_l).compile()
        print(f"  n_bp={n_bp}: COMPILE OK", flush=True)
    except Exception as exc:  # noqa: BLE001
        print(f"  n_bp={n_bp}: COMPILE FAIL {type(exc).__name__}", flush=True)
        traceback.print_exc()


if __name__ == "__main__":
    for n_bp in N_BPS:
        try_compile(n_bp)
