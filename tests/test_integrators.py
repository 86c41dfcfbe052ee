"""Physics sanity tests for the native rigid-body integrators.

These are the correctness gates for the jax-md replacement: NVE energy
conservation, Langevin thermalization to kT per degree of freedom, exactness
of the free rotor for a spherical top, and quaternion norm preservation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mythos_tpu import spaces
from mythos_tpu.rigid_body import RigidBody, quat_frame, quat_normalize, quat_rotate
from mythos_tpu.simulators import integrators


def _harmonic_dimer_energy(body: RigidBody, **kwargs) -> jnp.ndarray:
    """Two rigid bodies connected by springs between offset sites.

    Site = com + 0.5 * a1; springs pull sites together and coms to unit
    distance, exercising both force and torque paths.
    """
    a1, _, _ = quat_frame(body.orientation)
    sites = body.center + 0.5 * a1
    r_sites = jnp.linalg.norm(sites[0] - sites[1])
    r_com = jnp.linalg.norm(body.center[0] - body.center[1])
    return 10.0 * (r_sites - 0.8) ** 2 + 5.0 * (r_com - 1.0) ** 2


def _dimer(key) -> RigidBody:
    q = quat_normalize(jax.random.normal(key, (2, 4)))
    centers = jnp.array([[0.0, 0.0, 0.0], [1.1, 0.2, -0.1]])
    return RigidBody(center=centers, orientation=q)


def _total_energy(state: integrators.LangevinState) -> jnp.ndarray:
    kinetic = 0.5 * jnp.sum(state.momentum**2 / state.mass.center[:, None])
    rot = 0.5 * jnp.sum(state.angmom**2 / state.mass.orientation)
    return kinetic + rot + _harmonic_dimer_energy(state.position)


def test_nve_energy_conservation():
    shift = spaces.free()[1]
    init_fn, step_fn = integrators.nve(_harmonic_dimer_energy, shift, dt=1e-3)
    mass = RigidBody(center=jnp.array([1.0]), orientation=jnp.array([[1.0, 1.0, 1.0]]))
    state = init_fn(jax.random.PRNGKey(0), _dimer(jax.random.PRNGKey(1)), mass, kT=0.2)

    e0 = _total_energy(state)

    def body(s, _):
        s = step_fn(s)
        return s, _total_energy(s)

    state, energies = jax.lax.scan(body, state, jnp.arange(2000))
    drift = jnp.max(jnp.abs(energies - e0))
    assert drift < 1e-4 * max(1.0, abs(float(e0))) + 1e-4

    norms = jnp.linalg.norm(state.position.orientation, axis=-1)
    np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-9)


def test_free_rotor_spherical_top():
    """NO_SQUISH converges O(dt^3) to the exact single-axis rotation and
    conserves lab-frame angular momentum exactly at any dt."""
    from mythos_tpu.rigid_body import quat_multiply

    q0 = quat_normalize(jnp.array([[0.9, 0.1, -0.3, 0.2]]))
    ell = jnp.array([[0.3, -1.2, 0.4]])
    inertia = jnp.ones((1, 3))

    # NOTE: XLA CPU in this environment computes sin/cos/exp at float32
    # accuracy even under x64, so "exact" invariants hold only to ~1e-7.

    # small-dt accuracy: error ~ dt^3 per step
    dt = 0.01
    q1, ell1 = integrators.free_rotor(q0, ell, inertia, dt)
    omega = ell[0]
    angle = jnp.linalg.norm(omega) * dt
    axis = omega / jnp.linalg.norm(omega)
    dq = jnp.concatenate([jnp.cos(angle / 2)[None], jnp.sin(angle / 2) * axis])
    q_exact = quat_multiply(q0[0], dq)
    np.testing.assert_allclose(np.asarray(q1[0]), np.asarray(q_exact), atol=1e-5)

    # large-dt invariants: |L| and lab-frame angular momentum conserved
    dt = 0.37
    q1, ell1 = integrators.free_rotor(q0, ell, inertia, dt)
    np.testing.assert_allclose(
        float(jnp.linalg.norm(ell1)), float(jnp.linalg.norm(ell)), rtol=1e-6
    )
    lab0 = quat_rotate(q0, ell)
    lab1 = quat_rotate(q1, ell1)
    np.testing.assert_allclose(np.asarray(lab1), np.asarray(lab0), atol=1e-6)


@pytest.mark.slow
def test_langevin_thermalization():
    """Equilibrium kinetic energy must hit kT/2 per DOF (trans + rot)."""
    kT = 0.1
    shift = spaces.free()[1]
    # strong coupling so the OU relaxation time (m/gamma = 2 time units =
    # 400 steps) is far shorter than the sampling window -> tight statistics
    gamma = RigidBody(center=jnp.array([0.5]), orientation=jnp.array([0.5]))
    init_fn, step_fn = integrators.nvt_langevin(
        _harmonic_dimer_energy, shift, dt=5e-3, kT=kT, gamma=gamma
    )
    mass = RigidBody(center=jnp.array([1.0]), orientation=jnp.array([[1.0, 1.0, 1.0]]))
    state = init_fn(jax.random.PRNGKey(0), _dimer(jax.random.PRNGKey(1)), mass)

    def body(s, _):
        s = step_fn(s)
        ke_t = 0.5 * jnp.sum(s.momentum**2) / 1.0
        ke_r = 0.5 * jnp.sum(s.angmom**2)
        return s, (ke_t, ke_r)

    state, (ke_t, ke_r) = jax.lax.scan(body, state, jnp.arange(60_000))

    # discard burn-in, average over the rest: 6 DOF total in each sector
    ke_t_mean = float(jnp.mean(ke_t[10_000:]))
    ke_r_mean = float(jnp.mean(ke_r[10_000:]))
    expected = 6 * kT / 2
    assert abs(ke_t_mean - expected) < 0.1 * expected, (ke_t_mean, expected)
    assert abs(ke_r_mean - expected) < 0.1 * expected, (ke_r_mean, expected)

    norms = jnp.linalg.norm(state.position.orientation, axis=-1)
    np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-9)


def test_grad_through_scan_matches_finite_difference():
    """d(observable)/d(param) THROUGH a short Langevin scan == central finite
    differences (same PRNG key on both sides makes the dynamics a
    deterministic function of the parameter)."""
    from __graft_entry__ import _build_sim, _tiny_duplex

    kT = 296.15 * 0.1 / 300.0
    topology, body = _tiny_duplex(4)
    energy_fn, sim = _build_sim(topology, kT)
    params = energy_fn.opt_params()
    key = jax.random.PRNGKey(3)

    @jax.jit
    def loss(eps):
        p = {**params, "eps_stack_base": eps}
        out = sim.run(p, body, 20, key)
        tr = out.observables[0]
        return jnp.mean(jnp.linalg.norm(tr.center[-1] - tr.center[-1].mean(0), axis=-1))

    eps0 = jnp.asarray(params["eps_stack_base"])
    g_ad = float(jax.jit(jax.grad(loss))(eps0))
    h = 1e-4
    g_fd = float((loss(eps0 + h) - loss(eps0 - h)) / (2 * h))
    assert np.isfinite(g_ad) and abs(g_ad) > 0
    np.testing.assert_allclose(g_ad, g_fd, rtol=5e-3)
