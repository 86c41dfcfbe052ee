"""Microbenchmark: where does the fused tile kernel's time go?

Variants of the forward kernel isolate (a) grid/loop overhead, (b) panel
assembly (dynamic sublane slices + transpose), (c) per-term physics math.
Run on the real chip: python benchmarks/kernel_microbench.py [n_bp] [block]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

sys.path.insert(0, "/root/repo")

N_BP = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
BLOCK = int(sys.argv[2]) if len(sys.argv) > 2 else 8
K = 50  # scan length per timing


def timeit(name, fn, *args):
    jfn = jax.jit(fn)
    out = jax.block_until_ready(jfn(*args))
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jfn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:46s} {dt / K * 1e6:10.1f} us/call")
    return dt / K


def scan_k(fn):
    def run(rows):
        def step(carry, _):
            out = fn(carry)
            return carry + 0.0 * out.reshape(-1)[0], None

        return jax.lax.scan(step, rows, None, length=K)[0]

    return run


def fwd_like(kernel_body, rows_rf, params_vec, ids_p, spec, ot):
    def one(rows):
        gt_pad = jnp.zeros((1, 8), jnp.float32)
        in_specs, args, scratch = ot._pallas_args(rows, params_vec, ids_p, gt_pad, spec)
        return pl.pallas_call(
            ot._make_kernel(kernel_body, writes_rows=False, spec=spec),
            out_shape=jax.ShapeDtypeStruct((1, 8), jnp.float32),
            grid=(spec.nb_pad // spec.grid_g,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 8), lambda s: (0, 0)),
            scratch_shapes=scratch,
            interpret=ot._interpret(),
        )(*args)

    return one


def bench_spec(label, composed, body_soa, ids, spec_kind, ot):
    rows_rf, params_vec, ids_p, spec, _ = ot.build_tile_inputs(
        composed, body_soa, ids, BLOCK, kind=spec_kind
    )
    print(
        f"[{label}] kind={spec.kind} q={spec.q} cap={spec.cap} grid_g={spec.grid_g} "
        f"nb_pad={spec.nb_pad} panel={spec.panel} resident={spec.resident}"
    )

    timeit(f"{label} fwd kernel", scan_k(
        lambda rows: ot._fwd_impl(rows, params_vec, ids_p, spec)), rows_rf)
    gt = jnp.ones((ot._n_terms(spec),), jnp.float32)
    timeit(f"{label} bwd rows kernel", scan_k(
        lambda rows: ot._bwd_rows_impl(rows, params_vec, ids_p, gt, spec)), rows_rf)
    ot.ANALYTIC_FORCES = True
    timeit(f"{label} forces analytic", scan_k(
        lambda rows: ot._bwd_rows_impl(rows, params_vec, ids_p, gt, spec, forces_only=True)), rows_rf)
    ot.ANALYTIC_FORCES = False
    timeit(f"{label} forces AD", scan_k(
        lambda rows: ot._bwd_rows_impl(rows, params_vec, ids_p, gt, spec, forces_only=True)), rows_rf)
    ot.ANALYTIC_FORCES = True

    # assembly-only: same grid/assembly, body = sum(panel)
    def assembly_body(panel, rows_g, params, gtv, s):
        val = jnp.sum(panel) + jnp.sum(rows_g)
        return jnp.stack([val] + [jnp.zeros((), jnp.float32)] * 7)

    timeit(f"{label} assembly-only", scan_k(
        fwd_like(assembly_body, rows_rf, params_vec, ids_p, spec, ot)), rows_rf)

    # per-term-group math cost: drop terms one at a time
    n_terms = ot._n_terms(spec)
    if n_terms > 1:
        names = ["exc_vol", "hb", "cross", "coax", "debye"][:n_terms]

        def body_subset(keep):
            def body_fn(panel, rows_g, params, gtv, s):
                rv = ot._Rows(rows_g, s)
                mask = ot._tile_mask(rv, panel, s, triangular=True)
                energies, _ = ot._tile_energies(rv, panel, params, s)
                zero = jnp.zeros((), jnp.float32)
                vals = [
                    jnp.where(mask, energies[i], 0.0).sum() if i in keep else zero
                    for i in range(len(energies))
                ]
                return jnp.stack(vals + [zero] * (8 - len(vals)))

            return body_fn

        for i, nm in enumerate(names):
            keep = [j for j in range(n_terms) if j != i]
            timeit(f"{label} fwd minus {nm}", scan_k(
                fwd_like(body_subset(keep), rows_rf, params_vec, ids_p, spec, ot)), rows_rf)


def main():
    from __graft_entry__ import _build_sim, _tiny_duplex
    from mythos_tpu import soa
    from mythos_tpu.ops import oxdna_tiles as ot

    kT = 296.15 * 0.1 / 300.0
    topology, body = _tiny_duplex(N_BP)
    energy_fn, sim = _build_sim(
        topology, kT, mode="block", init_centers=body.center, model="dna2", block_size=BLOCK
    )
    updated = energy_fn.with_params(energy_fn.opt_params())
    sym_ids = sim.neighbors.idx
    body_soa = soa.to_soa(body)

    if isinstance(sym_ids, tuple):
        ids_tight, ids_wide = sym_ids
        bench_spec("short", updated, body_soa, ids_tight, "short", ot)
        bench_spec("debye", updated, body_soa, ids_wide, "debye", ot)
        bench_spec("full-on-wide", updated, body_soa, ids_wide, "full", ot)
    else:
        bench_spec("full", updated, body_soa, sym_ids, "full", ot)


if __name__ == "__main__":
    main()
