"""Split the stencil step's fixed (non-offset-loop) cost into parts.

In-scan timings of: the full force evaluation, the bonded-terms XLA
gradient alone, and the field-derivation vjp round trip alone.

Usage: python benchmarks/micro_stencil_fixed.py [n_bp]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

N_BP = int(sys.argv[1]) if len(sys.argv) > 1 else 5000


def scan_time(fn, carry, length=500):
    @jax.jit
    def loop(c0):
        def step(c, _):
            return fn(c), None

        out, _ = jax.lax.scan(step, c0, None, length=length)
        return out

    out = loop(carry)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = loop(carry)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / length * 1e6


def main() -> None:
    from __graft_entry__ import _tiny_duplex
    from mythos_tpu.ops import stencil as ops_stencil
    from mythos_tpu.simulators.neighbors import (
        stencil_band_for_topology,
        strand_interleave_perm,
    )
    import mythos_tpu.energy.dna2 as pkg
    from mythos_tpu import spaces
    from mythos_tpu.soa import to_soa

    topology, body = _tiny_duplex(N_BP)
    band = stencil_band_for_topology(
        spaces.free()[0],
        topology,
        pkg.default_neighbor_cutoff(),
        init_centers=body.center,
        r_cutoff_inner=pkg.short_range_neighbor_cutoff(),
        perm=strand_interleave_perm(topology),
    )
    energy_fn = pkg.create_default_energy_fn(topology, block_unbonded=True)
    composed = energy_fn.with_params(energy_fn.opt_params())
    bsoa = to_soa(body)
    ctx = ops_stencil.prepare_stencil_context(
        composed, band.w_short, band.w_wide, perm=band.perm
    )

    def nudge(c, g):
        return jax.tree.map(lambda a, d: a + 1e-12 * d, c, g)

    which = sys.argv[2] if len(sys.argv) > 2 else "all"

    if which in ("all", "full"):
        us = scan_time(
            lambda b: nudge(b, ops_stencil.stencil_grads_ctx(composed, ctx, b)), bsoa
        )
        print(f"full forces:        {us:9.1f} us", flush=True)
    if which not in ("all", "bonded", "fields"):
        return

    # bonded terms alone (the XLA shift path _add_bonded_grads runs)
    unbonded_idx = {i for i, _ in ctx.unbonded}
    first = ctx.unbonded[0][1]
    seq = jnp.asarray(first.seq)
    w = composed.weights
    bonded = [
        (1.0 if w is None else w[i], fn)
        for i, fn in enumerate(composed.energy_fns)
        if i not in unbonded_idx
    ]
    print("bonded terms:", [type(fn).__name__ for _, fn in bonded], flush=True)

    def bonded_energy(b):
        nuc = first.transform_soa_fn(b)
        return sum(wi * fn.energy_soa(nuc, seq) for wi, fn in bonded)

    if which in ("all", "bonded"):
        us = scan_time(lambda b: nudge(b, jax.grad(bonded_energy)(b)), bsoa)
        print(f"bonded grads only:  {us:9.1f} us", flush=True)
    if which == "bonded":
        return

    # position vjp round trip + layout transforms (no kernel): matches the
    # kernel branch's XLA-side work (perm + 7 transposes each way)
    def fields_rt(b):
        def pos_of(bb):
            com = bb.center
            quat = bb.orientation
            if ctx.perm_t is not None:
                com = ops_stencil.Vec3(*(ctx.apply_perm(c) for c in com))
                quat = type(quat)(*(ctx.apply_perm(c) for c in quat))
            return com, quat

        (com, quat), vjp_fn = jax.vjp(pos_of, b)
        s = ctx.kernel_ctx.kspec.s
        dyn_l = jnp.stack(
            [ops_stencil._to_layout(c.astype(jnp.float32), s) for c in (*com, *quat)]
        )
        comps = [ops_stencil._from_layout(dyn_l[k] * 1.0000001, ctx.spec.n) for k in range(7)]
        (g_body,) = vjp_fn(
            (ops_stencil.Vec3(*comps[0:3]), ops_stencil.Quat(*comps[3:7]))
        )
        return nudge(b, g_body)

    us = scan_time(fields_rt, bsoa)
    print(f"fields vjp+layout:  {us:9.1f} us", flush=True)


if __name__ == "__main__":
    main()
