"""MARTINI term tests: config semantics, analytic energies, brute-force LJ.

The reference validates against GROMACS .tpr/.trr fixtures via MDAnalysis
(unavailable here); these tests gate the same physics with analytic cases
and a brute-force pairwise reference for the dense LJ kernel.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mythos_tpu.energy.martini import MartiniEnergyConfiguration, MartiniTopology, m2, m3
from mythos_tpu.simulators.io import SimulatorTrajectory

BOX = jnp.array([10.0, 10.0, 10.0])


def _traj(centers) -> SimulatorTrajectory:
    centers = jnp.asarray(centers)
    n = centers.shape[0]
    return SimulatorTrajectory(
        center=centers,
        orientation=jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (n, 1)),
        box_size=BOX,
    )


def _three_bead_top() -> MartiniTopology:
    return MartiniTopology(
        atom_types=("Q0", "Qa", "C1"),
        atom_names=("NC3", "PO4", "GL1"),
        residue_names=("DMPC", "DMPC", "DMPC"),
        angles=jnp.array([[0, 1, 2]]),
        bonded_neighbors=jnp.array([[0, 1], [1, 2]]),
    )


# -- configuration semantics -----------------------------------------------------


def test_configuration_coupling():
    cfg = MartiniEnergyConfiguration(
        couplings={"k_all": ["bond_k_A", "bond_k_B"]}, k_all=5.0, other=1.0
    )
    assert cfg["bond_k_A"] == 5.0
    assert cfg["bond_k_B"] == 5.0
    assert cfg["k_all"] == 5.0
    assert cfg.opt_params == {"k_all": 5.0, "other": 1.0}


def test_configuration_coupling_conflict():
    with pytest.raises(ValueError, match="more than one coupling"):
        MartiniEnergyConfiguration(couplings={"a": ["x"], "b": ["x"]})


def test_configuration_merge_preserves_couplings():
    cfg = MartiniEnergyConfiguration(couplings={"k_all": ["bond_k_A", "bond_k_B"]}, k_all=5.0)
    merged = cfg | {"k_all": 7.0}
    assert merged["bond_k_A"] == 7.0
    assert merged["bond_k_B"] == 7.0


def test_bond_config_validation():
    with pytest.raises(ValueError, match="Unexpected parameter"):
        m2.BondConfiguration(nonsense_param=1.0)
    with pytest.raises(ValueError, match="pairs"):
        m2.BondConfiguration(bond_k_A_B_C=1.0)


# -- bonds -------------------------------------------------------------------------


def _bond_fn(**params):
    return m2.Bond.from_topology(
        _three_bead_top(),
        params=m2.BondConfiguration(
            bond_k_DMPC_NC3_PO4=1250.0,
            bond_r0_DMPC_NC3_PO4=0.47,
            bond_k_DMPC_PO4_GL1=1250.0,
            bond_r0_DMPC_PO4_GL1=0.47,
            **params,
        ),
    )


def test_bond_at_equilibrium():
    fn = _bond_fn()
    centers = jnp.array([[0.0, 0.0, 0.0], [0.47, 0.0, 0.0], [0.94, 0.0, 0.0]])
    np.testing.assert_allclose(float(fn(_traj(centers))), 0.0, atol=1e-10)


def test_bond_harmonic_value():
    fn = _bond_fn()
    dx = 0.05
    centers = jnp.array([[0.0, 0.0, 0.0], [0.47 + dx, 0.0, 0.0], [0.94 + dx, 0.0, 0.0]])
    np.testing.assert_allclose(float(fn(_traj(centers))), 0.5 * 1250.0 * dx**2, rtol=1e-10)


def test_bond_periodic_wrap():
    """Bond across the box boundary uses the minimum image."""
    fn = _bond_fn()
    centers = jnp.array([[0.1, 0.0, 0.0], [9.63, 0.0, 0.0], [9.16, 0.0, 0.0]])
    # min image distance 0.1 -> 9.63 is 0.47
    np.testing.assert_allclose(float(fn(_traj(centers))), 0.0, atol=1e-9)


# -- angles ------------------------------------------------------------------------


def _angle_fn(cls=m2.Angle, theta0=2.0944, k=25.0):
    return cls.from_topology(
        _three_bead_top(),
        params=m2.AngleConfiguration(
            angle_k_DMPC_NC3_PO4_GL1=k, angle_theta0_DMPC_NC3_PO4_GL1=theta0
        ),
    )


def test_angle_at_equilibrium():
    theta0 = 2.0
    fn = _angle_fn(theta0=theta0)
    # construct an exact theta0 geometry around the central bead
    centers = jnp.array(
        [[1.0, 0.0, 0.0], [0.0, 0.0, 0.0], [np.cos(theta0), np.sin(theta0), 0.0]]
    )
    np.testing.assert_allclose(float(fn(_traj(centers))), 0.0, atol=1e-12)


def test_angle_g96_vs_harmonic():
    theta0, k = 2.0944, 25.0
    centers = jnp.array([[1.0, 0.0, 0.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0]])  # 90 deg
    g96 = float(_angle_fn(m2.Angle, theta0, k)(_traj(centers)))
    harm = float(_angle_fn(m3.Angle, theta0, k)(_traj(centers)))
    theta = np.pi / 2
    np.testing.assert_allclose(g96, 0.5 * k * (np.cos(theta) - np.cos(theta0)) ** 2, rtol=1e-7)
    np.testing.assert_allclose(harm, 0.5 * k * (theta - theta0) ** 2, rtol=1e-7)


# -- LJ ---------------------------------------------------------------------------


def _lj_fn(top: MartiniTopology):
    return m2.LJ.from_topology(
        top,
        params=m2.LJConfiguration(
            lj_sigma_Q0_Q0=0.47,
            lj_epsilon_Q0_Q0=3.5,
            lj_sigma_Q0_Qa=0.47,
            lj_epsilon_Q0_Qa=4.0,
            lj_sigma_Qa_Qa=0.47,
            lj_epsilon_Qa_Qa=5.0,
            lj_sigma_Q0_C1=0.62,
            lj_epsilon_Q0_C1=2.0,
            lj_sigma_Qa_C1=0.62,
            lj_epsilon_Qa_C1=2.0,
            lj_sigma_C1_C1=0.47,
            lj_epsilon_C1_C1=3.5,
        ),
    )


def test_lj_brute_force_parity():
    """Dense-matrix LJ == explicit pairwise loop with bonded exclusion."""
    rng = np.random.default_rng(0)
    n_res = 4
    top = MartiniTopology(
        atom_types=("Q0", "Qa", "C1") * n_res,
        atom_names=("NC3", "PO4", "GL1") * n_res,
        residue_names=tuple(f"D{i}" for i in range(n_res) for _ in range(3)),
        angles=jnp.array([[3 * i, 3 * i + 1, 3 * i + 2] for i in range(n_res)]),
        bonded_neighbors=jnp.array(
            [[3 * i, 3 * i + 1] for i in range(n_res)] + [[3 * i + 1, 3 * i + 2] for i in range(n_res)]
        ),
    )
    fn = _lj_fn(top)
    centers = rng.uniform(0, 3.0, size=(3 * n_res, 3))
    energy = float(fn(_traj(centers)))

    # brute force
    bonded = {tuple(sorted(b)) for b in np.asarray(top.bonded_neighbors).tolist()}
    types = list(top.atom_types)
    sig = {t: i for i, t in enumerate(fn.params.bead_types)}
    total = 0.0
    box = np.asarray(BOX)
    for i in range(len(types)):
        for j in range(i + 1, len(types)):
            if (i, j) in bonded:
                continue
            dr = centers[i] - centers[j]
            dr -= box * np.round(dr / box)
            r = np.linalg.norm(dr)
            s = float(fn.params.sigmas[sig[types[i]], sig[types[j]]])
            e = float(fn.params.epsilons[sig[types[i]], sig[types[j]]])
            if r < 1.1:
                v = 4 * e * ((s / r) ** 12 - (s / r) ** 6)
                vc = 4 * e * ((s / 1.1) ** 12 - (s / 1.1) ** 6)
                total += v - vc
    np.testing.assert_allclose(energy, total, rtol=1e-9)


def test_lj_map_precomputes_mask():
    top = _three_bead_top()
    fn = _lj_fn(top)
    rng = np.random.default_rng(1)
    states = jnp.asarray(rng.uniform(0, 2.0, size=(3, 3, 3)))
    traj = SimulatorTrajectory(
        center=states,
        orientation=jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (3, 3, 1)),
        box_size=jnp.tile(BOX, (3, 1)),
    )
    energies = fn.map(traj)
    assert energies.shape == (3,)
    singles = [
        float(fn(SimulatorTrajectory(center=states[i], orientation=traj.orientation[i], box_size=BOX)))
        for i in range(3)
    ]
    np.testing.assert_allclose(np.asarray(energies), singles, rtol=1e-10)


def test_topology_names():
    top = _three_bead_top()
    assert top.bond_names == ("DMPC_NC3_PO4", "DMPC_PO4_GL1")
    assert top.angle_names == ("DMPC_NC3_PO4_GL1",)
