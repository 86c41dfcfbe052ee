"""rna2 on the stencil fast tier (VERDICT r2 item 7).

Parity chain: the pair-list rna2 composed energy is pinned to oxRNA golden
data by test_rna2_golden.py / test_rna2_soa.py; here the banded-stencil
energies and Pallas-kernel forces must match it on the same states.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mythos_tpu.energy.rna2 as rna2
from __graft_entry__ import _build_sim, _tiny_duplex
from mythos_tpu import soa
from mythos_tpu.ops import stencil as st

KT = 296.15 * 0.1 / 300.0


@pytest.fixture(autouse=True, scope="module")
def _f32_mode():
    jax.config.update("jax_enable_x64", False)
    yield
    jax.config.update("jax_enable_x64", True)


@pytest.fixture(scope="module")
def system():
    topology, body = _tiny_duplex(40)
    _, sim = _build_sim(
        topology, KT, mode="stencil", init_centers=body.center,
        init_orientation=body.orientation, model="rna2", block_size=8,
    )
    e = sim.energy_fn.with_params(sim.energy_fn.opt_params())
    nb = sim.neighbors
    sctx = st.prepare_stencil_context(
        e, nb.w_short, nb.w_wide, perm=nb.perm, w_terms=nb.w_terms
    )
    e_ref = rna2.create_default_energy_fn(topology).with_params(
        sim.energy_fn.opt_params()
    )
    return topology, body, sim, e, sctx, e_ref


def test_spec_is_rna2(system):
    _, _, _, _, sctx, _ = system
    assert sctx.spec.cross_variant == "rna2"
    assert sctx.spec.geometry[0] == "rna2"
    assert sctx.spec.has_debye


def test_stencil_energy_matches_pairlist(system):
    topology, body, sim, e, sctx, e_ref = system
    bsoa = soa.to_soa(body)
    e_st = float(jax.jit(lambda b: st.stencil_energy_ctx(e, sctx, b))(bsoa))
    e_pl = float(jax.jit(lambda b: e_ref(b))(body))
    np.testing.assert_allclose(e_st, e_pl, rtol=5e-5)


def test_stencil_grads_match_pairlist(system):
    topology, body, sim, e, sctx, e_ref = system
    bsoa = soa.to_soa(body)
    g_st = jax.jit(lambda b: st.stencil_grads_ctx(e, sctx, b))(bsoa)

    def e_soa(b):
        return e_ref(soa.from_soa(b))

    g_pl = jax.jit(jax.grad(e_soa))(bsoa)
    for name, a, b in (
        ("center", g_st.center, g_pl.center),
        ("orientation", g_st.orientation, g_pl.orientation),
    ):
        for k, (ca, cb) in enumerate(zip(a, b)):
            np.testing.assert_allclose(
                np.asarray(ca), np.asarray(cb), rtol=2e-3, atol=5e-4,
                err_msg=f"{name}[{k}]",
            )


def test_rna2_stencil_sim_runs(system):
    topology, body, sim, e, sctx, e_ref = system
    u = sim.neighbor_update_every
    sim = sim.replace(save_every=u)
    params = sim.energy_fn.opt_params()
    out = jax.jit(lambda p: sim.run(p, body, 2 * u, jax.random.PRNGKey(0)))(params)
    traj = out.observables[0]
    assert bool(np.all(np.isfinite(np.asarray(traj.center))))
    assert not bool(np.any(np.asarray(traj.metadata["neighbor_overflow"])))


def test_rna2_bonded_energy_matches_terms(system):
    """rna2 _bonded_energy (fene + bexc + rna2 stacking, offset-2 slot
    formulation) == the terms' SoA path."""
    topology, body, sim, e, sctx, e_ref = system
    mctx = st.prepare_multistep_context(
        e, sctx, sim.simulator_params, sim.neighbor_update_every
    )
    mspec = mctx.mspec
    assert mspec.rna2_geom, "rna2 stacking offsets must be extracted"
    bsoa = soa.to_soa(body)

    first = sctx.unbonded[0][1]
    nuc = first.transform_soa_fn(bsoa)
    seq = jnp.asarray(first.seq)
    unb = {i for i, _ in sctx.unbonded}
    expected = sum(
        float(fn.energy_soa(nuc, seq))
        for i, fn in enumerate(e.energy_fns)
        if i not in unb
    )

    com, a1, a2, a3 = st._body_fields(sctx, bsoa)
    fields = (com, a1, a2, a3)
    fj = tuple(type(v)(*(jnp.roll(c, -2) for c in v)) for v in fields)
    _, bparams = st._split_params(mspec, mctx.params_vec)
    n = mspec.kspec.spec.n
    wstack = st._from_layout(mctx.bd_l[0], n)
    dirf = st._from_layout(mctx.bd_l[1], n)
    got = float(
        st._bonded_energy(
            fields, fj, bparams, [1.0, 1.0, 1.0], mspec.bd1,
            mspec.kspec.spec.geometry, wstack, dirf, mspec.rna2_geom,
        )
    )
    np.testing.assert_allclose(got, expected, rtol=5e-5)


def test_rna2_multistep_vs_per_step_deterministic(monkeypatch):
    """rna2 multistep ON vs OFF at kT=0: identical damped dynamics."""
    called = {}
    orig = st.multistep_chunk
    monkeypatch.setattr(
        st, "multistep_chunk",
        lambda mctx, noise, state_l: called.setdefault("yes", True)
        and orig(mctx, noise, state_l),
    )
    topology, body = _tiny_duplex(40, form="A")
    _, sim = _build_sim(
        topology, 0.0, mode="stencil", init_centers=body.center,
        init_orientation=body.orientation, model="rna2", block_size=8,
    )
    u = sim.neighbor_update_every
    sim = sim.replace(save_every=2 * u)
    params = sim.energy_fn.opt_params()
    key = jax.random.PRNGKey(3)
    out_ms = jax.jit(lambda p: sim.run(p, body, 4 * u, key))(params)
    assert called.get("yes"), "rna2 multi-step path was not engaged"

    old = st.USE_MULTISTEP
    st.USE_MULTISTEP = False
    try:
        sim2 = sim.replace(save_every=2 * u)
        out_ps = jax.jit(lambda p: sim2.run(p, body, 4 * u, key))(params)
    finally:
        st.USE_MULTISTEP = old
    np.testing.assert_allclose(
        np.asarray(out_ms.observables[0].center),
        np.asarray(out_ps.observables[0].center),
        rtol=1e-4, atol=1e-5,
    )
