"""Golden-file parity: rna2 per-term energies vs oxRNA2 split_energy.dat.

Mirrors mythos/energy/rna2/tests/test_integration.py: RNA-specific stacking /
cross-stacking plus the shared dna1 (fene, exc vols, HB, coax) and dna2
(Debye) terms under rna2 parameter values.
"""

from pathlib import Path

import numpy as np
import pytest

import mythos_tpu.energy.dna1 as dna1
import mythos_tpu.energy.dna2 as dna2
import mythos_tpu.energy.rna2 as rna2
import mythos_tpu.io.topology as top
import mythos_tpu.io.trajectory as traj
from mythos_tpu import spaces

COLUMN_NAMES = [
    "t",
    "fene",
    "bonded_excluded_volume",
    "stacking",
    "unbonded_excluded_volume",
    "hydrogen_bonding",
    "cross_stacking",
    "coaxial_stacking",
    "debye",
]

KT_296 = 296.15 * 0.1 / 300.0

TERM_BUILDERS = {
    "fene": (dna1.Fene, dna1.FeneConfiguration, "fene"),
    "bonded_excluded_volume": (
        dna1.BondedExcludedVolume,
        dna1.BondedExcludedVolumeConfiguration,
        "bonded_excluded_volume",
    ),
    "stacking": (rna2.Stacking, rna2.StackingConfiguration, "stacking"),
    "unbonded_excluded_volume": (
        dna1.UnbondedExcludedVolume,
        dna1.UnbondedExcludedVolumeConfiguration,
        "unbonded_excluded_volume",
    ),
    "hydrogen_bonding": (dna1.HydrogenBonding, dna1.HydrogenBondingConfiguration, "hydrogen_bonding"),
    "cross_stacking": (rna2.CrossStacking, rna2.CrossStackingConfiguration, "cross_stacking"),
    "coaxial_stacking": (dna1.CoaxialStacking, dna1.CoaxialStackingConfiguration, "coaxial_stacking"),
    "debye": (dna2.Debye, dna2.DebyeConfiguration, "debye"),
}

TOLS = {"cross_stacking": 1e-3, "hydrogen_bonding": 1e-3, "debye": 1e-3}


def setup(base_dir: str):
    topology = top.from_oxdna_file(Path(base_dir) / "generated.top")
    trajectory = traj.from_file(Path(base_dir) / "output.dat", topology.strand_counts, is_5p_3p=False)
    _, params = rna2.default_configs()
    displacement_fn, _ = spaces.periodic(20.0)
    return topology, trajectory, params, displacement_fn


def build_term(term: str, topology, params, displacement_fn):
    cls, cfg_cls, key = TERM_BUILDERS[term]
    kwargs = dict(params[key])
    if term == "stacking":
        kwargs["kt"] = KT_296
    if term == "debye":
        kwargs.update({"kt": KT_296, "salt_conc": 1.0, "half_charged_ends": False})
    return cls(
        displacement_fn=displacement_fn,
        transform_fn=rna2.default_transform_fn(),
        topology=topology,
        params=cfg_cls(**kwargs).init_params(),
    )


def golden(base_dir: str, term: str) -> np.ndarray:
    data = np.loadtxt(Path(base_dir) / "split_energy.dat", skiprows=1)
    return data[:, COLUMN_NAMES.index(term)]


@pytest.mark.parametrize("term", list(TERM_BUILDERS))
def test_term_parity_simple_helix(test_data_dir, term):
    base_dir = f"{test_data_dir}/rna2/simple-helix-12bp"
    topology, trajectory, params, displacement_fn = setup(base_dir)
    energy_fn = build_term(term, topology, params, displacement_fn)
    energy = energy_fn.map(trajectory.state_rigid_body)
    energy = np.around(np.asarray(energy) / topology.n_nucleotides, 6)
    np.testing.assert_allclose(energy, golden(base_dir, term), atol=TOLS.get(term, 1e-6))


def test_coax_parity_simple_coax(test_data_dir):
    base_dir = f"{test_data_dir}/rna2/simple-coax"
    topology, trajectory, params, displacement_fn = setup(base_dir)
    energy_fn = build_term("coaxial_stacking", topology, params, displacement_fn)
    energy = energy_fn.map(trajectory.state_rigid_body)
    energy = np.around(np.asarray(energy) / topology.n_nucleotides, 6)
    np.testing.assert_allclose(energy, golden(base_dir, "coaxial_stacking"), atol=1e-6)
