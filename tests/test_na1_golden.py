"""Golden-file parity: oxNA hybrid per-term energies vs split_energy.dat.

Mirrors mythos/energy/na1/tests/test_integration.py over the dna-dna,
rna-rna, and dna-rna helix systems.
"""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

import mythos_tpu.energy.na1 as na1
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
    "fene": (na1.Fene, na1.FeneConfiguration, "fene"),
    "bonded_excluded_volume": (
        na1.BondedExcludedVolume,
        na1.BondedExcludedVolumeConfiguration,
        "bonded_excluded_volume",
    ),
    "stacking": (na1.Stacking, na1.StackingConfiguration, "stacking"),
    "unbonded_excluded_volume": (
        na1.UnbondedExcludedVolume,
        na1.UnbondedExcludedVolumeConfiguration,
        "unbonded_excluded_volume",
    ),
    "hydrogen_bonding": (na1.HydrogenBonding, na1.HydrogenBondingConfiguration, "hydrogen_bonding"),
    "cross_stacking": (na1.CrossStacking, na1.CrossStackingConfiguration, "cross_stacking"),
    "coaxial_stacking": (na1.CoaxialStacking, na1.CoaxialStackingConfiguration, "coaxial_stacking"),
    "debye": (na1.Debye, na1.DebyeConfiguration, "debye"),
}

TOLS = {"cross_stacking": 1e-3, "hydrogen_bonding": 1e-3, "debye": 1e-3}

SYSTEMS = [
    "na1/simple-helix-dna-dna",
    "na1/simple-helix-rna-rna",
    "na1/simple-helix-dna-rna",
]


def setup(base_dir: str):
    topology = top.from_oxdna_file(Path(base_dir) / "generated.top")
    trajectory = traj.from_file(
        Path(base_dir) / "output.dat", topology.strand_counts, is_5p_3p=True
    )
    _, params = na1.default_configs()
    displacement_fn, _ = spaces.periodic(20.0)
    return topology, trajectory, params, displacement_fn


def build_term(term: str, topology, params, displacement_fn):
    cls, cfg_cls, key = TERM_BUILDERS[term]
    kwargs = dict(params[key]) | {"nt_type": jnp.asarray(topology.nt_type)}
    if term == "stacking":
        kwargs["kt"] = KT_296
    if term == "debye":
        kwargs.update({"kt": KT_296, "salt_conc": 0.5, "half_charged_ends": False})
    return cls(
        displacement_fn=displacement_fn,
        transform_fn=na1.default_transform_fn(),
        topology=topology,
        params=cfg_cls(**kwargs).init_params(),
    )


def golden(base_dir: str, term: str) -> np.ndarray:
    data = np.loadtxt(Path(base_dir) / "split_energy.dat", skiprows=1)
    return data[:, COLUMN_NAMES.index(term)]


@pytest.mark.parametrize("system", SYSTEMS)
@pytest.mark.parametrize("term", list(TERM_BUILDERS))
def test_term_parity(test_data_dir, system, term):
    base_dir = f"{test_data_dir}/{system}"
    topology, trajectory, params, displacement_fn = setup(base_dir)
    energy_fn = build_term(term, topology, params, displacement_fn)
    energy = energy_fn.map(trajectory.state_rigid_body)
    energy = np.around(np.asarray(energy) / topology.n_nucleotides, 6)
    np.testing.assert_allclose(energy, golden(base_dir, term), atol=TOLS.get(term, 1e-6))
