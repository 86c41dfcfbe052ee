"""Golden-file parity: dna2 per-term energies vs oxDNA2 split_energy.dat.

Mirrors mythos/energy/dna2/tests/test_integration.py.
"""

from pathlib import Path

import numpy as np
import pytest

import mythos_tpu.energy.dna2 as dna2
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
    "fene": (dna2.Fene, dna2.FeneConfiguration, "fene"),
    "bonded_excluded_volume": (
        dna2.BondedExcludedVolume,
        dna2.BondedExcludedVolumeConfiguration,
        "bonded_excluded_volume",
    ),
    "stacking": (dna2.Stacking, dna2.StackingConfiguration, "stacking"),
    "unbonded_excluded_volume": (
        dna2.UnbondedExcludedVolume,
        dna2.UnbondedExcludedVolumeConfiguration,
        "unbonded_excluded_volume",
    ),
    "hydrogen_bonding": (dna2.HydrogenBonding, dna2.HydrogenBondingConfiguration, "hydrogen_bonding"),
    "cross_stacking": (dna2.CrossStacking, dna2.CrossStackingConfiguration, "cross_stacking"),
    "coaxial_stacking": (dna2.CoaxialStacking, dna2.CoaxialStackingConfiguration, "coaxial_stacking"),
    "debye": (dna2.Debye, dna2.DebyeConfiguration, "debye"),
}

TOLS = {"cross_stacking": 1e-3, "hydrogen_bonding": 1e-3, "debye": 1e-3}


def setup(base_dir: str):
    topology = top.from_oxdna_file(Path(base_dir) / "generated.top")
    trajectory = traj.from_file(Path(base_dir) / "output.dat", topology.strand_counts, is_5p_3p=False)
    _, params = dna2.default_configs()
    displacement_fn, _ = spaces.periodic(20.0)
    return topology, trajectory, params, displacement_fn


def build_term(term: str, topology, params, displacement_fn, extra: dict | None = None):
    cls, cfg_cls, key = TERM_BUILDERS[term]
    kwargs = dict(params[key])
    if term == "stacking":
        kwargs["kt"] = KT_296
    if term == "debye":
        kwargs.update({"kt": KT_296, "salt_conc": 0.5, "half_charged_ends": False})
    if extra:
        kwargs.update(extra)
    return cls(
        displacement_fn=displacement_fn,
        transform_fn=dna2.default_transform_fn(),
        topology=topology,
        params=cfg_cls(**kwargs).init_params(),
    )


def golden(base_dir: str, term: str) -> np.ndarray:
    data = np.loadtxt(Path(base_dir) / "split_energy.dat", skiprows=1)
    return data[:, COLUMN_NAMES.index(term)]


@pytest.mark.parametrize("term", list(TERM_BUILDERS))
def test_term_parity_simple_helix(test_data_dir, term):
    base_dir = f"{test_data_dir}/dna2/simple-helix"
    topology, trajectory, params, displacement_fn = setup(base_dir)
    energy_fn = build_term(term, topology, params, displacement_fn)
    energy = energy_fn.map(trajectory.state_rigid_body)
    energy = np.around(np.asarray(energy) / topology.n_nucleotides, 6)
    np.testing.assert_allclose(energy, golden(base_dir, term), atol=TOLS.get(term, 1e-6))


def test_coax_parity_simple_coax(test_data_dir):
    base_dir = f"{test_data_dir}/dna2/simple-coax"
    topology, trajectory, params, displacement_fn = setup(base_dir)
    energy_fn = build_term("coaxial_stacking", topology, params, displacement_fn)
    energy = energy_fn.map(trajectory.state_rigid_body)
    energy = np.around(np.asarray(energy) / topology.n_nucleotides, 6)
    np.testing.assert_allclose(energy, golden(base_dir, "coaxial_stacking"), atol=1e-6)


def test_debye_half_charged_ends(test_data_dir):
    base_dir = f"{test_data_dir}/dna2/simple-helix-half-charged-ends"
    topology, trajectory, params, displacement_fn = setup(base_dir)
    energy_fn = build_term("debye", topology, params, displacement_fn, {"half_charged_ends": True})
    energy = energy_fn.map(trajectory.state_rigid_body)
    energy = np.around(np.asarray(energy) / topology.n_nucleotides, 6)
    np.testing.assert_allclose(energy, golden(base_dir, "debye"), atol=1e-3)


def test_debye_is_end_plumbing(test_data_dir):
    base_dir = f"{test_data_dir}/dna2/simple-helix"
    topology, _, params, displacement_fn = setup(base_dir)
    cfg = dna2.DebyeConfiguration(
        **(dict(params["debye"]) | {"kt": KT_296, "salt_conc": 0.5, "half_charged_ends": True})
    ).init_params()

    from_top = dna2.Debye(
        displacement_fn=displacement_fn, topology=topology, params=cfg,
        transform_fn=dna2.default_transform_fn(),
    )
    assert (np.asarray(from_top.is_end) == np.asarray(topology.is_end)).all()

    with pytest.raises(ValueError, match="is_end must be provided"):
        dna2.Debye(
            displacement_fn=displacement_fn,
            bonded_neighbors=topology.bonded_neighbors,
            unbonded_neighbors=topology.unbonded_neighbors,
            seq=topology.seq,
            params=cfg,
            transform_fn=dna2.default_transform_fn(),
        )


def test_total_energy(test_data_dir):
    base_dir = f"{test_data_dir}/dna2/simple-helix"
    topology, trajectory, params, displacement_fn = setup(base_dir)
    # goldens were generated without half-charged ends, at 0.5 M salt
    from mythos_tpu.energy.base import ComposedEnergyFunction

    energy_fn = ComposedEnergyFunction.from_lists(
        energy_fns=dna2.default_energy_fns(),
        energy_configs=dna2.default_energy_configs(overrides={"half_charged_ends": False}),
        transform_fn=dna2.default_transform_fn(),
        displacement_fn=displacement_fn,
        topology=topology,
    )
    energies = np.asarray(energy_fn.map(trajectory.state_rigid_body)) / topology.n_nucleotides
    golden_total = np.loadtxt(Path(base_dir) / "energy.dat")[1:, 1]
    np.testing.assert_allclose(energies, golden_total, rtol=1e-4, atol=1e-4)
