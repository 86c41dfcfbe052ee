"""Banded-stencil path (ops/stencil.py) vs the XLA/pair-list references.

The stencil computes in float32 over rolled (N,) SoA arrays; the references
(pair-list energy, XLA SoA gradients) are pinned to oxDNA golden data in
test_dna2_golden.py, so agreement here chains to the golden energies.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mythos_tpu.energy.dna1 as dna1
import mythos_tpu.energy.dna2 as dna2
from __graft_entry__ import _build_sim, _tiny_duplex
from mythos_tpu import soa, spaces
from mythos_tpu.ops import stencil as st
from mythos_tpu.simulators.neighbors import (
    StencilBand,
    stencil_band_for_topology,
    strand_interleave_perm,
)


@pytest.fixture(autouse=True, scope="module")
def _f32_mode():
    jax.config.update("jax_enable_x64", False)
    yield
    jax.config.update("jax_enable_x64", True)


def _system(model, n_bp=40):
    pkg = dna2 if model == "dna2" else dna1
    topology, body = _tiny_duplex(n_bp)
    perm = strand_interleave_perm(topology)
    e = pkg.create_default_energy_fn(topology, block_unbonded=True, block_size=8)
    e = e.with_params(e.opt_params())
    r_inner = (
        pkg.short_range_neighbor_cutoff()
        if hasattr(pkg, "short_range_neighbor_cutoff")
        else None
    )
    band = stencil_band_for_topology(
        spaces.free()[0],
        topology,
        pkg.default_neighbor_cutoff(),
        dr_threshold=0.5,
        init_centers=body.center,
        r_cutoff_inner=r_inner,
        perm=perm,
    )
    ctx = st.prepare_stencil_context(e, band.w_short, band.w_wide, perm=perm)
    return topology, body, e, band, ctx


@pytest.fixture(scope="module")
def sys_dna2(_f32_mode):
    return _system("dna2")


@pytest.fixture(scope="module")
def sys_dna1(_f32_mode):
    return _system("dna1")


@pytest.mark.parametrize("which", ["dna1", "dna2"])
def test_stencil_energy_matches_pair_list(which, sys_dna1, sys_dna2):
    topology, body, e, _, ctx = sys_dna1 if which == "dna1" else sys_dna2
    pkg = dna1 if which == "dna1" else dna2
    ref = pkg.create_default_energy_fn(topology)
    ref = ref.with_params(ref.opt_params())
    e_ref = float(ref(body))
    e_st = float(st.stencil_energy_ctx(e, ctx, soa.to_soa(body)))
    np.testing.assert_allclose(e_st, e_ref, rtol=3e-5)


def test_stencil_band_is_tight(sys_dna2):
    _, _, _, band, ctx = sys_dna2
    assert not bool(band.did_overflow)
    assert ctx.spec.w_short < ctx.spec.w_wide  # two-level split active
    assert ctx.spec.w_wide < 40  # band, not O(N)


@pytest.mark.parametrize("which", ["dna1", "dna2"])
def test_stencil_analytic_grads_match_ad(which, sys_dna1, sys_dna2):
    """Closed-form pair Jacobians == autodiff of the stencil energy."""
    _, body, e, _, ctx = sys_dna1 if which == "dna1" else sys_dna2
    bsoa = soa.to_soa(body)
    g_ad = jax.grad(lambda b: st.stencil_energy_ctx(e, ctx, b))(bsoa)
    g_an = st.stencil_grads_ctx(e, ctx, bsoa)
    for x, y in zip(jax.tree.leaves(g_ad), jax.tree.leaves(g_an), strict=True):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=2e-4, rtol=2e-4)


def test_stencil_grads_match_xla_soa(sys_dna2):
    """Forces/torque cotangents vs the XLA SoA path (golden-chained)."""
    from mythos_tpu.simulators.neighbors import block_neighbor_list_for_topology

    topology, body, e, _, ctx = sys_dna2
    nbl = block_neighbor_list_for_topology(
        spaces.free()[0],
        topology,
        dna2.default_neighbor_cutoff(),
        dr_threshold=0.5,
        block_size=8,
        init_centers=body.center,
    )
    e_ref = e.with_props(block_ids=nbl.idx)
    bsoa = soa.to_soa(body)
    g_ref = jax.grad(lambda b: e_ref.energy_soa(b))(bsoa)
    g_st = st.stencil_grads_ctx(e, ctx, bsoa)
    scale = max(float(jnp.max(jnp.abs(x))) for x in jax.tree.leaves(g_ref))
    for x, y in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_st), strict=True):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=3e-5 * scale, rtol=1e-3
        )


def test_band_check_flags_foldback(sys_dna2):
    topology, body, _, band, _ = sys_dna2
    assert not bool(band._check(jnp.asarray(body.center)))
    # fold the far end of strand 1 onto the middle of the band: a pair
    # within the bare cutoff at large slot distance must raise the flag
    folded = np.asarray(body.center).copy()
    folded[topology.n_nucleotides // 4] = folded[0] + 0.1
    assert bool(band._check(jnp.asarray(folded)))


# NOTE: the statically-unrolled band loop (ops.stencil._unroll_band, the
# TPU-hardware default) is deliberately NOT parity-tested here: XLA CPU
# takes ~7 min to compile even a 6-offset unrolled interpret-mode kernel
# (measured r5) vs 19 s for the fori variant. Hardware parity is covered
# by benchmarks/compile_gate.py (kernel-vs-XLA-stencil force check on the
# real chip), which must be green before any snapshot.


def _line_site_band(n=64, spacing=8.0, **kw):
    """Site-mode band over a straight line of widely spaced particles:
    every reach collapses to 1 slot, so check_dm and the block sweep
    geometry are fully controlled by the sizing math alone."""
    import types as _types

    from mythos_tpu.simulators.neighbors import stencil_band_for_site_cutoffs

    bonds = np.stack([np.arange(n - 1), np.arange(1, n)], 1)
    topo = _types.SimpleNamespace(n_nucleotides=n, bonded_neighbors=bonds)
    centers = np.zeros((n, 3), np.float32)
    centers[:, 0] = spacing * np.arange(n)
    quats = np.zeros((n, 4), np.float32)
    quats[:, 0] = 1.0
    band = stencil_band_for_site_cutoffs(
        spaces.free()[0],
        topo,
        dna2.per_term_site_cutoffs(),
        init_centers=jnp.asarray(centers),
        init_orientation=jnp.asarray(quats),
        **kw,
    )
    return band, centers, quats


def test_band_check_covers_block_misaligned_gap_offsets():
    """Regression (r4 ADVICE high): slot distances dm+1..dm+b_sz-1 must be
    caught by the EXACT checks — a pair at slot distance s can sit in a
    block pair at index distance floor(s/b_sz), below the far sweep's
    start, so the sweep cannot be relied on for them."""
    band, centers, quats = _line_site_band()
    b_sz = band.check_block
    # sizing invariant the runtime sweep start relies on: check_dm+1 is a
    # block multiple, so the sweep (D >= check_dm//b_sz + 1) has zero gap
    assert (band.check_dm + 1) % b_sz == 0
    dm_old = band.check_dm - (b_sz - 1)
    q = jnp.asarray(quats)
    assert not bool(band._check(jnp.asarray(centers), orientation=q))
    for s in (dm_old + 1, band.check_dm):  # both ends of the gap range
        # with i=0 the contact's block distance is below the sweep start:
        # only the (extended) exact checks can see it
        assert s // b_sz < band.check_dm // b_sz + 1
        moved = centers.copy()
        moved[s] = centers[0] + np.asarray([0.0, 0.2, 0.0], np.float32)
        assert bool(
            band._check(jnp.asarray(moved), orientation=q)
        ), f"within-cutoff contact at slot distance {s} not flagged"


def test_band_far_sweep_still_flags_beyond_check_dm():
    band, centers, quats = _line_site_band()
    s = band.check_dm + 1 + band.check_block  # safely in the swept range
    moved = centers.copy()
    moved[s] = centers[0] + np.asarray([0.0, 0.2, 0.0], np.float32)
    assert bool(
        band._check(jnp.asarray(moved), orientation=jnp.asarray(quats))
    )


def test_simulator_stencil_run(sys_dna2):
    topology, body, _, _, _ = sys_dna2
    kT = 296.15 * 0.1 / 300.0
    _, sim = _build_sim(
        topology, kT, mode="stencil", init_centers=body.center, model="dna2"
    )
    out = sim.run(sim.energy_fn.opt_params(), body, 40, jax.random.PRNGKey(0))
    traj = out.observables[0]
    assert bool(jnp.all(jnp.isfinite(traj.center)))
    assert not bool(jnp.any(traj.metadata["neighbor_overflow"]))


@pytest.mark.slow
def test_stencil_trajectory_tracks_block_path(sys_dna2):
    """Same key, same start: stencil and block-tile Langevin runs agree to
    f32 accumulation noise over a short horizon."""
    topology, body, _, _, _ = sys_dna2
    kT = 296.15 * 0.1 / 300.0
    runs = {}
    for mode in ("stencil", "block"):
        _, sim = _build_sim(
            topology, kT, mode=mode, init_centers=body.center, model="dna2"
        )
        out = sim.run(sim.energy_fn.opt_params(), body, 20, jax.random.PRNGKey(3))
        runs[mode] = np.asarray(out.observables[0].center[-1])
    np.testing.assert_allclose(runs["stencil"], runs["block"], atol=5e-3)


def test_stencil_band_rejects_folded_init(sys_dna2):
    topology, body, _, _, _ = sys_dna2
    coiled = np.asarray(body.center).copy()
    rng = np.random.default_rng(0)
    coiled = rng.normal(size=coiled.shape).astype(np.float32)  # dense blob
    with pytest.raises(ValueError, match="not banded"):
        stencil_band_for_topology(
            spaces.free()[0],
            topology,
            dna2.default_neighbor_cutoff(),
            init_centers=jnp.asarray(coiled),
            perm=strand_interleave_perm(topology),
        )


def test_stencil_pseq_energy_matches_pair_list():
    """pseq marginals/correction ride the stencil weight table."""
    import mythos_tpu.io.sequence_constraints as scs

    topology, body = _tiny_duplex(30)  # big enough for the ~23-slot band
    n = topology.n_nucleotides
    sc = scs.from_bps(n, np.array([[i, n - 1 - i] for i in range(n // 2)]))
    rng = np.random.default_rng(1)
    bp = rng.random((sc.n_bp, 4))
    bp /= bp.sum(axis=1, keepdims=True)
    pseq = (jnp.zeros((0, 4), jnp.float32), jnp.asarray(bp, jnp.float32))

    def _with_pseq(efn):
        return efn.replace(
            energy_fns=[
                fn.replace(params=fn.params.replace(pseq=pseq, pseq_constraints=sc))
                if hasattr(fn.params, "pseq")
                else fn
                for fn in efn.energy_fns
            ]
        )

    ref = _with_pseq(dna2.create_default_energy_fn(topology))
    e_ref = float(ref(body))

    e = _with_pseq(
        dna2.create_default_energy_fn(topology, block_unbonded=True, block_size=8)
    )
    perm = strand_interleave_perm(topology)
    band = stencil_band_for_topology(
        spaces.free()[0],
        topology,
        dna2.default_neighbor_cutoff(),
        init_centers=body.center,
        r_cutoff_inner=dna2.short_range_neighbor_cutoff(),
        perm=perm,
    )
    ctx = st.prepare_stencil_context(e, band.w_short, band.w_wide, perm=perm)
    assert ctx.spec.pseq
    e_st = float(st.stencil_energy_ctx(e, ctx, soa.to_soa(body)))
    np.testing.assert_allclose(e_st, e_ref, rtol=3e-5)


def test_direct_diff_through_kernel_falls_back_to_xla(sys_dna2):
    """Direct differentiation of the kernel-tier forces (grad-through-
    dynamics) rides _kernel_field_grads' custom JVP: gradients must match
    the pure-XLA stencil tier. A deliberately narrow band keeps the doubly
    differentiated graph small -- kernel/XLA parity is band-independent."""
    topology, body, e, band, _ = sys_dna2
    perm = strand_interleave_perm(topology)
    bsoa = soa.to_soa(body)

    grads = {}
    for use_kernel in (True, False):
        ctx = st.prepare_stencil_context(e, 3, 5, perm=perm, kernel=use_kernel)

        def loss(b, _ctx=ctx):
            g = st.stencil_grads_ctx(e, _ctx, b)
            return sum(jnp.sum(c**2) for c in (*g.center, *g.orientation))

        grads[use_kernel] = jax.jit(jax.grad(loss))(bsoa)
    for x, y in zip(
        jax.tree.leaves(grads[True]), jax.tree.leaves(grads[False]), strict=True
    ):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-4, rtol=1e-3)


def _nonzero_term_reaches(ctx, bsoa):
    """Max offset with any nonzero per-pair energy, per short term (measured
    on the actual configuration; +1 slot of slack)."""
    spec = ctx.spec
    fields = st._body_fields(ctx, bsoa)
    fi = tuple(st._bcast1(v) for v in fields)
    views = st._unpack_views(
        st._pack_rolled([c for vec in fields for c in vec], 1, spec.w_short)
    )
    fj = tuple(st.Vec3(*views[3 * k : 3 * k + 3]) for k in range(4))
    qf = ctx.qf_d[: spec.w_short] if spec.has_debye else None
    mask = ctx.mask_d[: spec.w_short]
    pg = st._pair_geom(fi, fj, spec.geometry)
    terms = st._pair_terms(pg.S, ctx.params, ctx.weight_d, qf, spec)
    reaches = []
    for t in range(4):
        e_d = np.asarray(jnp.where(mask, terms[t], 0.0))
        nz = np.nonzero(np.abs(e_d).max(axis=1) > 0)[0]
        reaches.append(int(nz[-1]) + 2 if nz.size else 1)  # row d-1 -> d, +1 slack
    return tuple(min(r, spec.w_short) for r in reaches)


@pytest.mark.parametrize("which", ["dna1", "dna2"])
def test_per_term_reaches_match_full_band(which, sys_dna1, sys_dna2):
    """w_terms-pruned kernel == full-band forces: a term is EXACTLY zero
    beyond its cutoff's reach, so skipping it there must not move the
    gradient beyond summation-order noise. Reaches are measured from the
    actual configuration so the segment machinery genuinely engages (on
    this duplex the builder's per-cutoff reaches all coincide)."""
    topology, body, e, band, ctx_full = sys_dna1 if which == "dna1" else sys_dna2
    bsoa = soa.to_soa(body)
    w_terms = _nonzero_term_reaches(ctx_full, bsoa)
    assert min(w_terms) < band.w_short  # pruning engages
    ctx = st.prepare_stencil_context(
        e, band.w_short, band.w_wide, perm=strand_interleave_perm(topology),
        w_terms=w_terms,
    )
    assert len(st._segments(ctx.spec)) > 1
    g_full = st.stencil_grads_ctx(e, ctx_full, bsoa)
    g_t = st.stencil_grads_ctx(e, ctx, bsoa)
    for x, y in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_t), strict=True):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5, rtol=1e-5)


def test_band_builder_records_term_levels(sys_dna2):
    """term_cutoffs plumb through to per-term levels and the validity check."""
    topology, body, *_ = sys_dna2
    band = stencil_band_for_topology(
        spaces.free()[0],
        topology,
        dna2.default_neighbor_cutoff(),
        dr_threshold=0.5,
        init_centers=body.center,
        r_cutoff_inner=dna2.short_range_neighbor_cutoff(),
        perm=strand_interleave_perm(topology),
        term_cutoffs=dna2.per_term_neighbor_cutoffs(),
    )
    assert band.w_terms is not None and len(band.w_terms) == 4
    assert all(w <= band.w_short for w in band.w_terms)
    assert not bool(band.did_overflow)
