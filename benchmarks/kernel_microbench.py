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
from jax.experimental.pallas import tpu as pltpu

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

    rows_rf, params_vec, ids_p, spec, _ = ot.build_tile_inputs(
        updated, body_soa, sym_ids, BLOCK
    )
    print(f"n={topology.n_nucleotides} block={BLOCK} cap={spec.cap} "
          f"grid_g={spec.grid_g} nb_pad={spec.nb_pad} resident={spec.resident}")

    def scan_k(fn):
        def run(rows):
            def step(carry, _):
                out = fn(carry)
                return carry + 0.0 * out.reshape(-1)[0], None
            return jax.lax.scan(step, rows, None, length=K)[0]
        return run

    # A. current full forward kernel
    timeit("fwd kernel (full)", scan_k(
        lambda rows: ot._fwd_impl(rows, params_vec, ids_p, spec)), rows_rf)

    # B. backward rows kernel (the Langevin force path)
    gt = jnp.ones((ot._n_terms(spec),), jnp.float32)
    timeit("bwd rows kernel (full)", scan_k(
        lambda rows: ot._bwd_rows_impl(rows, params_vec, ids_p, gt, spec)), rows_rf)

    # C. assembly-only kernel: same grid/assembly, body = sum(panel)
    def assembly_body(panel, rows_g, blk0, params, gtv, s):
        val = jnp.sum(panel) + jnp.sum(rows_g)
        return jnp.stack([val] + [jnp.zeros((), jnp.float32)] * 7)

    def assembly_only(rows):
        gt_pad = jnp.zeros((1, 8), jnp.float32)
        in_specs, args, scratch = ot._pallas_args(rows, params_vec, ids_p, gt_pad, spec)
        return pl.pallas_call(
            ot._make_kernel(assembly_body, writes_rows=False, spec=spec),
            out_shape=jax.ShapeDtypeStruct((1, 8), jnp.float32),
            grid=(spec.nb_pad // spec.grid_g,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 8), lambda s: (0, 0)),
            scratch_shapes=scratch,
            interpret=ot._interpret(),
        )(*args)

    timeit("assembly-only kernel", scan_k(assembly_only), rows_rf)

    # D. math-only: full energies on a statically-sliced panel (no table
    # indexing, no per-slot dynamic slices; one static slice + transpose)
    m = spec.panel

    def static_panel_kernel(ids_ref, rows_ref, col_ref, p_ref, gt_ref, out_ref, scratch):
        step = pl.program_id(0)
        params = ot._unpack_params(p_ref, spec.params_treedef, spec.leaf_shapes)
        gtv = gt_ref[0, :]

        def body(g, sums):
            panel = col_ref[0:m, :].T  # static slice + transpose
            rows_g = rows_ref[pl.ds(g * spec.block_size, spec.block_size), :]
            blk0 = jnp.asarray(step * spec.grid_g + g, jnp.float32) * spec.block_size
            return sums + ot._fwd_kernel_body(panel, rows_g, blk0, params, gtv, spec)

        sums = jax.lax.fori_loop(0, spec.grid_g, body, jnp.zeros((8,), jnp.float32))

        @pl.when(step == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        out_ref[0, :] += sums

    def math_only(rows):
        gt_pad = jnp.zeros((1, 8), jnp.float32)
        in_specs, args, scratch = ot._pallas_args(rows, params_vec, ids_p, gt_pad, spec)
        return pl.pallas_call(
            static_panel_kernel,
            out_shape=jax.ShapeDtypeStruct((1, 8), jnp.float32),
            grid=(spec.nb_pad // spec.grid_g,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 8), lambda s: (0, 0)),
            scratch_shapes=scratch,
            interpret=ot._interpret(),
        )(*args)

    timeit("math-only (static panel + transpose)", scan_k(math_only), rows_rf)

    # D2. non-resident path: XLA gathers (nb, F, M) panels in HBM, the kernel
    # pipelines them in -- no in-kernel assembly, no transpose
    spec_nr = spec._replace(resident=False)
    timeit("fwd kernel (XLA-gather panels)", scan_k(
        lambda rows: ot._fwd_impl(rows, params_vec, ids_p, spec_nr)), rows_rf)
    timeit("bwd rows kernel (XLA-gather panels)", scan_k(
        lambda rows: ot._bwd_rows_impl(rows, params_vec, ids_p, gt, spec_nr)), rows_rf)

    # D3. gather-only: materialize the panels, sum them (HBM gather cost)
    def gather_only(rows):
        return jnp.sum(ot._gather_cols(rows, ids_p, spec))

    timeit("XLA panel gather alone", scan_k(gather_only), rows_rf)

    # E. per-term-group math cost: drop terms one group at a time
    import mythos_tpu.energy.dna1.terms as t1  # noqa: F401

    def body_subset(keep):
        def body_fn(panel, rows_g, blk0, params, gtv, s):
            mask = ot._tile_mask(rows_g, panel, blk0, s, triangular=True)
            energies, _ = ot._tile_energies(rows_g, panel, params, s)
            zero = jnp.zeros((), jnp.float32)
            vals = [
                jnp.where(mask, energies[i], 0.0).sum() if i in keep else zero
                for i in range(len(energies))
            ]
            return jnp.stack(vals + [zero] * (8 - len(vals)))
        return body_fn

    n_terms = ot._n_terms(spec)
    names = ["exc_vol", "hb", "cross", "coax", "debye"][:n_terms]
    for i, nm in enumerate(names):
        keep = [j for j in range(n_terms) if j != i]

        def one(rows, keep=keep):
            gt_pad = jnp.zeros((1, 8), jnp.float32)
            in_specs, args, scratch = ot._pallas_args(rows, params_vec, ids_p, gt_pad, spec)
            return pl.pallas_call(
                ot._make_kernel(body_subset(keep), writes_rows=False, spec=spec),
                out_shape=jax.ShapeDtypeStruct((1, 8), jnp.float32),
                grid=(spec.nb_pad // spec.grid_g,),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((1, 8), lambda s: (0, 0)),
                scratch_shapes=scratch,
                interpret=ot._interpret(),
            )(*args)

        timeit(f"fwd minus {nm}", scan_k(one), rows_rf)


if __name__ == "__main__":
    main()
