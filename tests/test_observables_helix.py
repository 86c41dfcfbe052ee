"""Observable sanity on the ideal B-DNA helix (geometry-derived expectations).

Mirrors the reference's observable unit strategy: evaluate on a structure
whose geometry is known analytically and check the physically expected
ranges (propeller ~0 on the ideal helix, rise ~3.3 A, pitch ~ twist angle,
persistence length finite and large for a rigid rod).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mythos_tpu.energy.dna1 as dna1
from __graft_entry__ import _tiny_duplex
from mythos_tpu import spaces
from mythos_tpu.observables import (
    Diameter,
    PersistenceLength,
    PitchAngle,
    PropellerTwist,
    RMSE,
    Rise,
)
from mythos_tpu.simulators.io import SimulatorTrajectory

N_BP = 16


@pytest.fixture(scope="module")
def helix_traj():
    topology, body = _tiny_duplex(N_BP)
    stacked = jax.tree.map(lambda x: jnp.stack([x, x]), body)  # 2 identical states
    traj = SimulatorTrajectory.from_rigid_body(stacked, temperature=jnp.full(2, 0.1))
    n = topology.n_nucleotides
    bps = jnp.array([[i, n - 1 - i] for i in range(N_BP)], dtype=jnp.int32)
    quartets = jnp.array(
        [[[i, n - 1 - i], [i + 1, n - 2 - i]] for i in range(N_BP - 1)], dtype=jnp.int32
    )
    return topology, traj, bps, quartets


def test_propeller_twist_near_zero_on_ideal_helix(helix_traj):
    _, traj, bps, _ = helix_traj
    obs = PropellerTwist(
        rigid_body_transform_fn=dna1.default_transform_fn(), h_bonded_base_pairs=bps
    )
    vals = np.asarray(obs(traj))
    assert vals.shape == (2,)
    # paired base planes are exactly coplanar on the ideal synthetic helix
    # (a3 anti-parallel across the pair) -> zero propeller twist
    np.testing.assert_allclose(vals, 0.0, atol=1.0)


def test_rise_matches_construction(helix_traj):
    _, traj, _, quartets = helix_traj
    obs = Rise(rigid_body_transform_fn=dna1.default_transform_fn(), quartets=quartets, displacement_fn=spaces.free()[0])
    vals = np.asarray(obs(traj))
    # construction rise = 0.39 su = 3.32 A (oxDNA length = 8.518 A); base
    # sites sit off-axis so the midpoint projection differs by a few percent
    np.testing.assert_allclose(vals, 0.39 * 8.518, rtol=0.1)


def test_pitch_angle_matches_construction(helix_traj):
    _, traj, _, quartets = helix_traj
    obs = PitchAngle(rigid_body_transform_fn=dna1.default_transform_fn(), quartets=quartets, displacement_fn=spaces.free()[0])
    vals = np.asarray(obs(traj))
    np.testing.assert_allclose(vals, np.deg2rad(34.3), rtol=0.05)


def test_persistence_length_large_for_rigid_helix(helix_traj):
    _, traj, _, quartets = helix_traj
    obs = PersistenceLength(
        rigid_body_transform_fn=dna1.default_transform_fn(), quartets=quartets,
        displacement_fn=spaces.free()[0],
    )
    lp = float(obs(traj))
    # a perfectly straight rod decays ~zero -> enormous (or inf-like) Lp
    assert lp > 100.0 or not np.isfinite(lp)


def test_diameter_positive(helix_traj):
    _, traj, bps, _ = helix_traj
    obs = Diameter(
        rigid_body_transform_fn=dna1.default_transform_fn(), h_bonded_base_pairs=bps,
        displacement_fn=spaces.free()[0],
    )
    vals = np.asarray(obs(traj, sigma_backbone=0.7))
    assert np.all(vals > 0)


def test_rmse_zero_against_itself(helix_traj):
    topology, traj, _, _ = helix_traj
    from mythos_tpu.rigid_body import RigidBody

    obs = RMSE(
        rigid_body_transform_fn=dna1.default_transform_fn(),
        target_state=RigidBody(
            center=traj.center[0], orientation=traj.orientation[0]
        ),
    )
    vals = np.asarray(obs(traj))
    np.testing.assert_allclose(vals, 0.0, atol=1e-4)
