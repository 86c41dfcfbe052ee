"""SoA hot-path parity: component-array energies/gradients/integrator vs AoS.

The TPU hot loop runs on structure-of-arrays state (mythos_tpu/soa.py); these
tests pin it to the AoS reference implementation, which is itself pinned to
oxDNA golden data (test_dna1_golden.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mythos_tpu.energy.dna1 as dna1
from __graft_entry__ import _tiny_duplex
from mythos_tpu import soa, spaces
from mythos_tpu.rigid_body import RigidBody, quat_frame
from mythos_tpu.simulators import StaticSimulatorParams, TpuSimulator, integrators
from mythos_tpu.simulators.neighbors import block_neighbor_list_for_topology

KT = 296.15 * 0.1 / 300.0


@pytest.fixture(scope="module")
def system():
    topology, body = _tiny_duplex(20)
    energy_fn = dna1.create_default_energy_fn(topology, block_unbonded=True, block_size=8)
    nbl = block_neighbor_list_for_topology(
        spaces.free()[0],
        topology,
        dna1.default_neighbor_cutoff(),
        dr_threshold=0.8,
        block_size=8,
        init_centers=body.center,
    )
    return topology, body, energy_fn.with_props(block_ids=nbl.idx), nbl


def test_soa_roundtrip(system):
    _, body, _, _ = system
    back = soa.from_soa(soa.to_soa(body))
    np.testing.assert_array_equal(np.asarray(back.center), np.asarray(body.center))
    np.testing.assert_array_equal(np.asarray(back.orientation), np.asarray(body.orientation))


def test_quat_frame_soa_matches_aos(system):
    _, body, _, _ = system
    a1, a2, a3 = quat_frame(body.orientation)
    s1, s2, s3 = soa.quat_frame_soa(soa.to_soa(body).orientation)
    for aos, s in ((a1, s1), (a2, s2), (a3, s3)):
        np.testing.assert_allclose(np.asarray(jnp.stack(tuple(s), -1)), np.asarray(aos), rtol=1e-12)


def test_soa_terms_match_aos(system):
    _, body, e, _ = system
    assert e.supports_soa()
    t_aos = e.compute_terms(dna1.default_transform_fn()(body))
    t_soa = e.compute_terms_soa(soa.to_soa(body))
    np.testing.assert_allclose(np.asarray(t_soa), np.asarray(t_aos), rtol=1e-10, atol=1e-12)


@pytest.mark.slow
def test_soa_gradients_match_aos(system):
    _, body, e, _ = system
    g_soa = jax.grad(lambda b: e.energy_soa(b))(soa.to_soa(body))
    g_aos = jax.grad(lambda b: e(b), allow_int=True)(body)
    np.testing.assert_allclose(
        np.asarray(jnp.stack(tuple(g_soa.center), -1)), np.asarray(g_aos.center), rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(jnp.stack(tuple(g_soa.orientation), -1)),
        np.asarray(g_aos.orientation),
        rtol=1e-8,
        atol=1e-10,
    )


def test_free_rotor_soa_matches_aos():
    key = jax.random.PRNGKey(2)
    q = jax.random.normal(key, (32, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    ell = jax.random.normal(key, (32, 3))
    inertia = jnp.array([1.1, 1.5, 2.3])
    q2, l2 = integrators.free_rotor(q, ell, inertia, 0.013)
    qs = soa.Quat(q[:, 0], q[:, 1], q[:, 2], q[:, 3])
    ls = soa.Vec3(ell[:, 0], ell[:, 1], ell[:, 2])
    q3, l3 = soa.free_rotor_soa(qs, ls, (1 / 1.1, 1 / 1.5, 1 / 2.3), 0.013)
    np.testing.assert_allclose(np.asarray(jnp.stack(tuple(q3), -1)), np.asarray(q2), rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(jnp.stack(tuple(l3), -1)), np.asarray(l2), rtol=1e-9, atol=1e-12)


@pytest.mark.slow
def test_soa_simulation_runs_and_differentiates(system):
    topology, body, _, nbl = system
    energy_fn = dna1.create_default_energy_fn(topology, block_unbonded=True, block_size=8)
    sp = StaticSimulatorParams(
        seq=jnp.asarray(topology.seq),
        mass=RigidBody(center=jnp.array([1.0]), orientation=jnp.array([[1.0, 1.0, 1.0]])),
        gamma=RigidBody(center=jnp.array([KT / 2.5]), orientation=jnp.array([KT / 7.5])),
        bonded_neighbors=jnp.asarray(topology.bonded_neighbors),
        checkpoint_every=0,
        dt=5e-3,
        kT=KT,
    )
    sim = TpuSimulator(
        energy_fn=energy_fn,
        simulator_params=sp,
        space=spaces.free(),
        neighbors=nbl,
        save_every=10,
        neighbor_update_every=5,
    )
    # the auto-detect must pick the SoA path for this configuration
    assert energy_fn.supports_soa()
    params = energy_fn.opt_params()
    traj = jax.jit(lambda p: sim.run(p, body, 20, jax.random.PRNGKey(0)).observables[0])(params)
    assert bool(jnp.all(jnp.isfinite(traj.center)))
    qn = jnp.abs(jnp.linalg.norm(traj.orientation, axis=-1) - 1.0).max()
    assert float(qn) < 1e-9

    g = jax.jit(
        jax.grad(lambda p: jnp.mean(sim.run(p, body, 20, jax.random.PRNGKey(1)).observables[0].center[-1] ** 2))
    )(params)
    assert np.isfinite(float(g["eps_stack_base"]))
    assert float(g["eps_stack_base"]) != 0.0


def test_dna2_soa_terms_and_grads_match_aos():
    import mythos_tpu.energy.dna2 as dna2

    topology, body = _tiny_duplex(20)
    e_dense = dna2.create_default_energy_fn(topology, dense_unbonded=True)
    t_ref = e_dense.compute_terms(dna2.default_transform_fn()(body))
    e_block = dna2.create_default_energy_fn(topology, block_unbonded=True, block_size=8)
    nbl = block_neighbor_list_for_topology(
        spaces.free()[0],
        topology,
        dna2.default_neighbor_cutoff(),
        dr_threshold=0.5,
        block_size=8,
        init_centers=body.center,
    )
    e = e_block.with_props(block_ids=nbl.idx)
    assert e.supports_soa()
    t_soa = e.compute_terms_soa(soa.to_soa(body))
    np.testing.assert_allclose(np.asarray(t_soa), np.asarray(t_ref), rtol=1e-10, atol=1e-12)
    g = jax.grad(lambda b: e.energy_soa(b))(soa.to_soa(body))
    ga = jax.grad(lambda b: e_dense(b), allow_int=True)(body)
    np.testing.assert_allclose(
        np.asarray(jnp.stack(tuple(g.center), -1)), np.asarray(ga.center), rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(jnp.stack(tuple(g.orientation), -1)),
        np.asarray(ga.orientation),
        rtol=1e-8,
        atol=1e-10,
    )


def test_topk_rebuild_has_all_near_blocks(system):
    topology, body, _, nbl = system
    ids, overflow = nbl.build(body.center)
    assert not bool(overflow)
    # brute-force reference: block AABB distances
    import numpy as onp

    n, b = topology.n_nucleotides, nbl.block_size
    nb = nbl.n_blocks
    x = onp.zeros((nb * b, 3))
    x[:n] = onp.asarray(body.center)
    ref = set()
    cut = nbl.r_cutoff + nbl.dr_threshold
    for a in range(nb):
        for c in range(a, nb):
            pa = x[a * b : min((a + 1) * b, n)]
            pb = x[c * b : min((c + 1) * b, n)]
            pa = pa[: max(0, min((a + 1) * b, n) - a * b)]
            if not len(pa) or not len(pb):
                continue
            lo_a, hi_a = pa.min(0), pa.max(0)
            lo_b, hi_b = pb.min(0), pb.max(0)
            gap = onp.maximum(onp.maximum(lo_a - hi_b, lo_b - hi_a), 0.0)
            if (gap**2).sum() < cut * cut:
                ref.add((a, c))
    got = set()
    ids = onp.asarray(ids)
    for a in range(nb):
        for v in ids[a]:
            if v < nb:
                got.add((a, int(v)))
    assert ref <= got
