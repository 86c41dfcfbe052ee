"""Fused multi-step stencil kernel (ops/stencil.py multi-step section).

The kernel runs a whole neighbor-rebuild interval (BAOAB + bonded terms +
OU noise) in one Pallas call. Parity chain: the XLA reference
(_xla_multistep_reference) shares the kernel's exact math and noise, and
its force path is the stencil-gradient path pinned to golden data by
test_stencil.py / test_dna2_golden.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mythos_tpu.energy.dna2 as dna2
from __graft_entry__ import _build_sim, _tiny_duplex
from mythos_tpu import soa
from mythos_tpu.ops import stencil as st

KT = 296.15 * 0.1 / 300.0


@pytest.fixture(autouse=True, scope="module")
def _f32_mode():
    jax.config.update("jax_enable_x64", False)
    yield
    jax.config.update("jax_enable_x64", True)


def _ms_setup(n_bp=40, n_inner=5, kT=KT):
    topology, body = _tiny_duplex(n_bp)
    _, sim = _build_sim(
        topology, kT, mode="stencil", init_centers=body.center, init_orientation=body.orientation, model="dna2", block_size=8
    )
    e = sim.energy_fn.with_params(sim.energy_fn.opt_params())
    nb = sim.neighbors
    sctx = st.prepare_stencil_context(
        e, nb.w_short, nb.w_wide, perm=nb.perm, w_terms=nb.w_terms
    )
    mctx = st.prepare_multistep_context(e, sctx, sim.simulator_params, n_inner)
    return topology, body, sim, e, sctx, mctx


def test_bonded_energy_matches_terms():
    """_bonded_energy over (N,) slot fields == sum of the three bonded
    terms' energy_soa (layout-invariant)."""
    topology, body, sim, e, sctx, mctx = _ms_setup(n_bp=40, n_inner=2)
    bsoa = soa.to_soa(body)

    # expected: bonded terms on the composed SoA path (original order)
    first = sctx.unbonded[0][1]
    nuc = first.transform_soa_fn(bsoa)
    seq = jnp.asarray(first.seq)
    unb = {i for i, _ in sctx.unbonded}
    expected = sum(
        float(fn.energy_soa(nuc, seq))
        for i, fn in enumerate(e.energy_fns)
        if i not in unb
    )

    # actual: slot-order fields through _bonded_energy with fj = roll(-2)
    mspec = mctx.mspec
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
            mspec.kspec.spec.geometry, wstack, dirf,
        )
    )
    np.testing.assert_allclose(got, expected, rtol=2e-5)


def test_kernel_matches_xla_reference_with_noise():
    """Interpret-mode kernel chunk == XLA reference, same noise, kT > 0."""
    topology, body, sim, e, sctx, mctx = _ms_setup(n_bp=40, n_inner=4)
    from mythos_tpu.rigid_body import RigidBody
    from mythos_tpu.simulators import integrators
    from mythos_tpu import spaces

    bsoa = soa.to_soa(body)
    gamma = RigidBody(center=jnp.array([KT / 2.5]), orientation=jnp.array([KT / 7.5]))
    mass = RigidBody(center=jnp.array([1.0]), orientation=jnp.array([[1.0, 1.0, 1.0]]))
    init_fn, _ = integrators.nvt_langevin_soa(
        lambda b, **kw: st.stencil_energy_ctx(e, sctx, b),
        spaces.free_soa()[1],
        dt=5e-3, kT=KT, gamma=gamma,
        grad_fn=lambda b, **kw: st.stencil_grads_ctx(e, sctx, b),
    )
    state0 = init_fn(jax.random.PRNGKey(0), bsoa, mass)
    state_l = st.state_to_layout(mctx, state0)
    noise = st.multistep_noise(jax.random.PRNGKey(7), mctx.mspec)

    kctx = sctx.kernel_ctx
    out_k = st._multistep_chunk_l(
        mctx.mspec, mctx.params_vec, mctx.gt, noise, state_l,
        kctx.wt_l, kctx.pn_l, kctx.qf_l, mctx.bd_l,
    )
    out_r = st._xla_multistep_reference(
        mctx.mspec, mctx.params_vec, mctx.gt, noise, state_l,
        kctx.wt_l, kctx.pn_l, kctx.qf_l, mctx.bd_l,
    )
    n = mctx.mspec.kspec.spec.n
    for k in range(20):
        a = np.asarray(st._from_layout(out_k[k], n))
        b = np.asarray(st._from_layout(out_r[k], n))
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=5e-5, err_msg=f"state row {k}")


def test_simulator_multistep_vs_per_step_deterministic(monkeypatch):
    """Full TpuSimulator run, multistep ON vs OFF, kT=0 (no noise): the
    damped dynamics must agree to f32 tolerance."""
    called = {}
    orig = st.multistep_chunk
    monkeypatch.setattr(
        st,
        "multistep_chunk",
        lambda mctx, noise, state_l: called.setdefault("yes", True) and orig(mctx, noise, state_l),
    )
    topology, body = _tiny_duplex(40)
    _, sim = _build_sim(
        topology, 0.0, mode="stencil", init_centers=body.center, init_orientation=body.orientation, model="dna2", block_size=8
    )
    u = sim.neighbor_update_every
    sim = sim.replace(save_every=2 * u)
    params = sim.energy_fn.opt_params()
    n_steps = 4 * u
    key = jax.random.PRNGKey(3)

    assert st.USE_MULTISTEP

    out_ms = jax.jit(lambda p: sim.run(p, body, n_steps, key))(params)
    traj_ms = out_ms.observables[0]

    old = st.USE_MULTISTEP
    st.USE_MULTISTEP = False
    try:
        sim2 = sim.replace(save_every=2 * u)  # rebuild run fn without ms
        out_ps = jax.jit(lambda p: sim2.run(p, body, n_steps, key))(params)
    finally:
        st.USE_MULTISTEP = old
    traj_ps = out_ps.observables[0]

    assert called.get("yes"), "multi-step path was not engaged"
    np.testing.assert_allclose(
        np.asarray(traj_ms.center), np.asarray(traj_ps.center), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(traj_ms.orientation.vec if hasattr(traj_ms.orientation, "vec") else traj_ms.orientation),
        np.asarray(traj_ps.orientation.vec if hasattr(traj_ps.orientation, "vec") else traj_ps.orientation),
        rtol=1e-4, atol=1e-5,
    )
    assert not bool(np.any(np.asarray(traj_ms.metadata["neighbor_overflow"])))


def test_simulator_multistep_finite_with_noise():
    """Thermostat on: finite trajectory, unit quaternions, no overflow."""
    topology, body = _tiny_duplex(40)
    _, sim = _build_sim(
        topology, KT, mode="stencil", init_centers=body.center, model="dna2", block_size=8
    )
    u = sim.neighbor_update_every
    sim = sim.replace(save_every=u)
    params = sim.energy_fn.opt_params()
    out = jax.jit(lambda p: sim.run(p, body, 2 * u, jax.random.PRNGKey(1)))(params)
    traj = out.observables[0]
    c = np.asarray(traj.center)
    q = np.asarray(traj.orientation)
    assert np.all(np.isfinite(c))
    assert np.all(np.isfinite(q))
    qn = np.sqrt((q**2).sum(-1))
    np.testing.assert_allclose(qn, 1.0, atol=1e-5)
    assert not bool(np.any(np.asarray(traj.metadata["neighbor_overflow"])))
