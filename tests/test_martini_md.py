"""Native in-process MARTINI MD (simulators/martini.py + particles.py).

Round-1 gap: every MARTINI trajectory came from the external gmx binary
(reference path mythos/simulators/gromacs/gromacs.py:27-206). These tests
pin the TPU-native replacement: BAOAB point-particle Langevin, AD-virial
pressure, semi-isotropic Berendsen coupling, and end-to-end
differentiability of a bilayer observable.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mythos_tpu.energy.martini.systems import default_bilayer_terms, lattice_bilayer
from mythos_tpu.observables.membranes import AreaPerLipid, MembraneThickness
from mythos_tpu.simulators import (
    MartiniSimulator,
    nvt_langevin_particles,
    pressure_diag,
)


@pytest.fixture(scope="module")
def bilayer():
    topology, pos, box, masses = lattice_bilayer(3, 3, water_layers=1)
    terms = default_bilayer_terms(topology)
    return topology, jnp.asarray(pos), jnp.asarray(box), jnp.asarray(masses), terms


def test_forces_match_finite_differences(bilayer):
    """AD forces == central finite differences of the total energy."""
    _, pos, box, masses, terms = bilayer
    # jitter off the symmetric lattice: exact half-box pair separations sit
    # on the minimum-image round() discontinuity and break central FD
    rng = np.random.default_rng(1)
    pos = pos + jnp.asarray(rng.normal(scale=0.03, size=pos.shape))
    sim = MartiniSimulator(energy_fns=terms, box=box, masses=masses)
    energy = sim._energy_fn(None)
    f = -jax.grad(lambda x: energy(x, box))(pos)
    eps = 1e-5
    for _ in range(4):
        i = rng.integers(pos.shape[0])
        k = rng.integers(3)
        dp = jnp.zeros_like(pos).at[i, k].set(eps)
        fd = -(energy(pos + dp, box) - energy(pos - dp, box)) / (2 * eps)
        assert float(f[i, k]) == pytest.approx(float(fd), rel=2e-3, abs=1e-3)


def test_virial_pressure_matches_finite_volume_derivative(bilayer):
    """AD strain-derivative pressure == -dU/dV (isotropic FD check)."""
    _, pos, box, masses, terms = bilayer
    sim = MartiniSimulator(energy_fns=terms, box=box, masses=masses)
    energy = sim._energy_fn(None)
    p = np.asarray(
        pressure_diag(energy, pos, jnp.zeros_like(pos), jnp.asarray(1.0 / 72.0), box)
    )
    # isotropic FD: U(x(1+e), box(1+e)); dU/de = sum of per-axis strain grads
    eps = 1e-5
    du = (energy(pos * (1 + eps), box * (1 + eps)) - energy(pos * (1 - eps), box * (1 - eps))) / (
        2 * eps
    )
    v = float(jnp.prod(box))
    p_iso_fd = -float(du) / (3 * v)
    assert np.mean(p) == pytest.approx(p_iso_fd, rel=5e-3, abs=5e-3)


def test_nvt_thermalizes(bilayer):
    """Kinetic temperature relaxes to kT (BAOAB + exact OU step) despite the
    potential energy released by the unequilibrated lattice start."""
    _, pos, box, masses, terms = bilayer
    sim = MartiniSimulator(energy_fns=terms, box=box, masses=masses, dt=0.01)
    energy = sim._energy_fn(None)
    init_fn, step_fn = nvt_langevin_particles(
        energy, lambda x, dx: x + dx, 0.01, sim.kT, sim.gamma
    )
    state = init_fn(jax.random.PRNGKey(0), pos, box, masses)

    def body(s, _):
        s = step_fn(s)
        t = jnp.sum(s.momentum**2 * s.inv_mass) / (3.0 * s.position.shape[0])
        return s, t

    state, temps = jax.jit(lambda s: jax.lax.scan(body, s, None, length=800))(state)
    kT_meas = float(jnp.mean(temps[400:]))
    assert kT_meas == pytest.approx(float(sim.kT), rel=0.12)


def test_npt_run_finite_and_apl(bilayer):
    """Semi-isotropic NPT bilayer: finite trajectory, evolving box, APL and
    thickness observables computable in-process (no gmx subprocess)."""
    topology, pos, box, masses, terms = bilayer
    sim = MartiniSimulator(
        energy_fns=terms,
        box=box,
        masses=masses,
        dt=0.01,
        save_every=25,
        barostat={"pressure0": 1.0, "tau": 4.0, "every": 10},
    )
    out = sim.run(None, pos, 200, jax.random.PRNGKey(0))
    traj = out.observables[0]
    assert bool(jnp.all(jnp.isfinite(traj.center)))
    assert traj.box_size.shape == (8, 3)
    assert not np.allclose(np.asarray(traj.box_size[0]), np.asarray(traj.box_size[-1]))
    # xy coupled together, z independent
    assert float(traj.box_size[-1][0]) == pytest.approx(float(traj.box_size[-1][1]))

    heads = jnp.asarray(
        [i for i, nm in enumerate(topology.atom_names) if nm == "PO4"], jnp.int32
    )
    apl = AreaPerLipid(head_indices=heads)(traj)
    assert apl.shape == (8,)
    assert float(apl[-1]) == pytest.approx(0.61, abs=0.25)  # ~MARTINI lipid scale

    thick = MembraneThickness(thickness_indices=heads)(traj)
    assert bool(jnp.all(thick > 0.5)) and bool(jnp.all(thick < 5.0))


def test_npt_differentiable_through_dynamics(bilayer):
    """d(mean APL)/d(LJ epsilon) through the full NPT scan is finite and
    nonzero -- the gradient a bilayer reparameterization consumes."""
    topology, pos, box, masses, terms = bilayer
    sim = MartiniSimulator(
        energy_fns=terms,
        box=box,
        masses=masses,
        dt=0.01,
        save_every=25,
        barostat={"pressure0": 1.0, "tau": 4.0, "every": 10},
    )
    heads = jnp.asarray(
        [i for i, nm in enumerate(topology.atom_names) if nm == "PO4"], jnp.int32
    )
    apl_obs = AreaPerLipid(head_indices=heads)

    def loss(eps_c1):
        out = sim.run({"lj_epsilon_C1_C1": eps_c1}, pos, 50, jax.random.PRNGKey(2))
        return jnp.mean(apl_obs(out.observables[0]))

    g = jax.jit(jax.grad(loss))(jnp.asarray(3.5))
    assert bool(jnp.isfinite(g)) and float(g) != 0.0
