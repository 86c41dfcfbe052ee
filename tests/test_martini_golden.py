"""MARTINI energy parity against the reference's GROMACS-generated fixtures.

Round-1 weakness: MARTINI correctness was self-referential (vectorized vs
hand-rolled Python in the same repo). These tests evaluate the m2 terms on
the actual GROMACS trajectories and parameters the reference tests use
(data/test-data/martini/energy/m2/{bond,angle,lj}; reference tests
mythos/energy/martini/m2/tests/test_{bond,angle,lj}.py) and compare against
the gmx-energy .xvg outputs. The .trr frames are read by the in-repo XDR
parser (io/trr.py) -- no MDAnalysis.

The DMPC membrane is pure lipid (1280 beads = 128 x 10-bead MARTINI DMPC);
topology is reconstructed from the standard mapping, which the fixtures'
parameter names pin exactly.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from mythos_tpu.energy.martini import m2
from mythos_tpu.energy.martini.base import MartiniTopology
from mythos_tpu.io.trr import read_xvg, trajectory_from_trr

#: standard MARTINI 2 DMPC mapping (matches the fixture bond/angle names)
DMPC_NAMES = ("NC3", "PO4", "GL1", "GL2", "C1A", "C2A", "C3A", "C1B", "C2B", "C3B")
DMPC_TYPES = ("Q0", "Qa", "Na", "Na", "C1", "C1", "C1", "C1", "C1", "C1")
DMPC_BONDS = (
    ("NC3", "PO4"), ("PO4", "GL1"), ("GL1", "GL2"), ("GL1", "C1A"),
    ("C1A", "C2A"), ("C2A", "C3A"), ("GL2", "C1B"), ("C1B", "C2B"), ("C2B", "C3B"),
)
DMPC_ANGLES = (
    ("PO4", "GL1", "GL2"), ("PO4", "GL1", "C1A"), ("GL1", "C1A", "C2A"),
    ("C1A", "C2A", "C3A"), ("GL2", "C1B", "C2B"), ("C1B", "C2B", "C3B"),
)


def _fixture_dir(test_data_dir: str, kind: str) -> Path:
    d = Path(test_data_dir) / "martini" / "energy" / "m2" / kind
    if not d.is_dir():
        pytest.skip(f"martini fixture {kind} not available")
    return d


def _dmpc_membrane_topology(n_atoms: int) -> MartiniTopology:
    per = len(DMPC_NAMES)
    assert n_atoms % per == 0
    n_lip = n_atoms // per
    idx = {nm: k for k, nm in enumerate(DMPC_NAMES)}
    bonds, angles = [], []
    for m in range(n_lip):
        base = m * per
        bonds += [[base + idx[a], base + idx[b]] for a, b in DMPC_BONDS]
        angles += [[base + idx[a], base + idx[b], base + idx[c]] for a, b, c in DMPC_ANGLES]
    return MartiniTopology(
        atom_types=DMPC_TYPES * n_lip,
        atom_names=DMPC_NAMES * n_lip,
        residue_names=("DMPC",) * n_atoms,
        angles=np.asarray(angles, np.int32),
        bonded_neighbors=np.asarray(bonds, np.int32),
    )


def _load(base: Path, params_file: str, xvg: str):
    traj = trajectory_from_trr(base / "test.trr")
    with (base / params_file).open() as f:
        params = json.load(f)
    energies = read_xvg(base / xvg)[:, 1]
    n_frames = traj.center.shape[0]
    # gmx energy logs every nstenergy step; the .trr every nstxout -- align
    # by time stride when the counts differ (reference slices [1:])
    if energies.shape[0] != n_frames:
        stride = (energies.shape[0] - 1) // (n_frames - 1)
        energies = energies[::stride][:n_frames]
    return traj, params, energies


def test_bond_energy_matches_gromacs(test_data_dir):
    base = _fixture_dir(test_data_dir, "bond")
    traj, params, ref = _load(base, "bond_params.json", "bond.xvg")
    top = _dmpc_membrane_topology(traj.center.shape[1])
    fn = m2.Bond.from_topology(top, params=m2.BondConfiguration(**params))
    got = np.asarray(fn.map(traj))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=0.5)


def test_angle_energy_matches_gromacs(test_data_dir):
    base = _fixture_dir(test_data_dir, "angle")
    traj, params, ref = _load(base, "angle_params.json", "angle.xvg")
    params = {
        k: (np.deg2rad(v) if k.startswith("angle_theta0_") else v)
        for k, v in params.items()
    }
    top = _dmpc_membrane_topology(traj.center.shape[1])
    fn = m2.Angle.from_topology(top, params=m2.AngleConfiguration(**params))
    got = np.asarray(fn.map(traj))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=0.5)


def test_lj_energy_matches_gromacs(test_data_dir):
    base = _fixture_dir(test_data_dir, "lj")
    traj, params, ref = _load(base, "ljconf.json", "lj.xvg")
    top = _dmpc_membrane_topology(traj.center.shape[1])
    # restrict the full MARTINI table to the bead set present
    beads = set(DMPC_TYPES)
    params = {
        k: v
        for k, v in params.items()
        if k.split("_")[2] in beads and k.split("_")[3] in beads
    }
    fn = m2.LJ.from_topology(top, params=m2.LJConfiguration(**params))
    got = np.asarray(fn.map(traj))
    # gmx reports the shifted-LJ sum under its cutoff scheme; allow the
    # small neighbour-list/cutoff bookkeeping differences
    np.testing.assert_allclose(got, ref, rtol=2e-3)
