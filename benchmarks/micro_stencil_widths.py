"""Decompose the stencil kernel's in-scan cost over band widths.

Times a scan of force evaluations at several (w_short, w_wide) settings so
per-full-physics-offset, per-tail-offset, and fixed costs can be separated
(the narrow-band runs compute wrong physics; timing only).

Usage: python benchmarks/micro_stencil_widths.py [n_bp]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

N_BP = int(sys.argv[1]) if len(sys.argv) > 1 else 5000


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
    print(f"n={topology.n_nucleotides} w_short={band.w_short} w_wide={band.w_wide}", flush=True)

    energy_fn = pkg.create_default_energy_fn(topology, block_unbonded=True)
    composed = energy_fn.with_params(energy_fn.opt_params())
    body_soa = to_soa(body)

    for w_s, w_w in [
        (band.w_short, band.w_wide),
        (8, band.w_wide),
        (band.w_short, band.w_short),
        (2, band.w_wide),
        (2, 3),
    ]:
        ctx = ops_stencil.prepare_stencil_context(composed, w_s, w_w, perm=band.perm)

        @jax.jit
        def force_scan(b0, _ctx=ctx):
            def step(carry, _):
                g = ops_stencil.stencil_grads_ctx(composed, _ctx, carry)
                return jax.tree.map(lambda a, d: a + 1e-12 * d, carry, g), None

            out, _ = jax.lax.scan(step, b0, None, length=500)
            return out

        out = force_scan(body_soa)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = force_scan(body_soa)
        jax.block_until_ready(out)
        us = (time.perf_counter() - t0) / 500 * 1e6
        print(f"w_short={w_s:3d} w_wide={w_w:3d}: {us:9.1f} us", flush=True)


if __name__ == "__main__":
    main()
