"""Pallas kernel tests: kernel vs pure-jnp reference (values and gradients)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mythos_tpu.ops.lj import lj_energy_forces_reference, lj_pair_energy


@pytest.fixture
def lj_system():
    rng = np.random.default_rng(0)
    n, n_types = 40, 4
    positions = jnp.asarray(rng.uniform(0, 4.0, size=(n, 3)))
    types = jnp.asarray(rng.integers(0, n_types, size=n))
    box = jnp.array([6.0, 6.0, 6.0])
    sig = rng.uniform(0.4, 0.6, size=(n_types, n_types))
    sigmas = jnp.asarray((sig + sig.T) / 2)
    eps = rng.uniform(1.0, 4.0, size=(n_types, n_types))
    epsilons = jnp.asarray((eps + eps.T) / 2)
    mask = jnp.triu(jnp.ones((n, n), bool), k=1)
    # knock out a few "bonded" pairs
    mask = mask.at[0, 1].set(False).at[2, 3].set(False)
    return positions, types, mask, box, (sigmas, epsilons)


def test_lj_kernel_matches_reference(lj_system):
    positions, types, mask, box, tables = lj_system
    energy = lj_pair_energy(positions, types, mask, box, tables)
    ref_energy, _ = lj_energy_forces_reference(positions, types, mask, box, tables)
    # kernel computes in f32 regardless of x64 test mode
    np.testing.assert_allclose(float(energy), float(ref_energy), rtol=2e-5)


def test_lj_kernel_gradient_matches_reference(lj_system):
    positions, types, mask, box, tables = lj_system
    grad = jax.grad(lambda p: lj_pair_energy(p, types, mask, box, tables))(positions)
    _, ref_forces = lj_energy_forces_reference(positions, types, mask, box, tables)
    np.testing.assert_allclose(np.asarray(grad), -np.asarray(ref_forces), rtol=2e-4, atol=1e-4)
