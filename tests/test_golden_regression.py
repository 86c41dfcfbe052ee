"""Golden-file regression breadth: top-level oxDNA fixture dirs.

Extends the model-subdir golden tests (test_dna1_golden.py etc.) to the
reference's wider regression set (/root/reference/data/test-data/*): circular
topologies, larger helices, reversed coax geometries, sequence-dependent
parameter files, and half-charged-end electrostatics -- per-term energies vs
oxDNA-generated split_energy.dat and totals vs energy.dat.
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
from mythos_tpu.energy.base import ComposedEnergyFunction
from mythos_tpu.io import oxdna_input
from mythos_tpu.io.sequence_dependence import read_ss_weights

KT_296 = 296.15 * 0.1 / 300.0

DNA2_COLUMNS = [
    "t", "fene", "bonded_excluded_volume", "stacking", "unbonded_excluded_volume",
    "hydrogen_bonding", "cross_stacking", "coaxial_stacking", "debye",
]

#: dir -> (model pkg, topology file, conf for box, overrides)
DNA2_SPLIT_DIRS = {
    "regr-circle": ("sys.top", {"half_charged_ends": True}),
    "regr-burns-natnano-2015": ("sys.top", {"half_charged_ends": True}),
    "simple-coax-oxdna2": ("generated.top", {"half_charged_ends": False}),
    "simple-coax-oxdna2-rev": ("generated.top", {"half_charged_ends": False}),
    "simple-helix-oxdna2-12bp": ("sys.top", {"half_charged_ends": False}),
}

TOLS = {"cross_stacking": 1e-3, "hydrogen_bonding": 1e-3, "debye": 1e-3}


def _load(base_dir: Path, top_file: str):
    topology = top.from_oxdna_file(base_dir / top_file)
    trajectory = traj.from_file(base_dir / "output.dat", topology.strand_counts, is_5p_3p=False)
    inp = oxdna_input.read(base_dir / "input")
    conf = base_dir / str(inp.get("conf_file", "init.conf"))
    box = oxdna_input.read_box_size(conf)
    displacement_fn, _ = spaces.periodic(float(np.max(np.asarray(box))))
    return topology, trajectory, displacement_fn


def _dna2_energy_fn(topology, displacement_fn, overrides):
    return ComposedEnergyFunction.from_lists(
        energy_fns=dna2.default_energy_fns(),
        energy_configs=dna2.default_energy_configs(overrides=overrides),
        transform_fn=dna2.default_transform_fn(),
        displacement_fn=displacement_fn,
        topology=topology,
    )


def _split(base_dir: Path, term: str) -> np.ndarray:
    data = np.loadtxt(base_dir / "split_energy.dat", skiprows=1)
    return data[:, DNA2_COLUMNS.index(term)]


@pytest.mark.parametrize("dirname", list(DNA2_SPLIT_DIRS))
@pytest.mark.parametrize("term", DNA2_COLUMNS[1:])
def test_dna2_regression_split(test_data_dir, dirname, term):
    base_dir = Path(test_data_dir) / dirname
    top_file, overrides = DNA2_SPLIT_DIRS[dirname]
    topology, trajectory, displacement_fn = _load(base_dir, top_file)
    energy_fn = _dna2_energy_fn(topology, displacement_fn, {"kT": KT_296, **overrides})

    term_map = {
        "fene": "Fene", "bonded_excluded_volume": "BondedExcludedVolume",
        "stacking": "Stacking", "unbonded_excluded_volume": "UnbondedExcludedVolume",
        "hydrogen_bonding": "HydrogenBonding", "cross_stacking": "CrossStacking",
        "coaxial_stacking": "CoaxialStacking", "debye": "Debye",
    }
    keep = term_map[term]
    single = energy_fn.without_terms(*(v for k, v in term_map.items() if k != term))
    assert len(single.energy_fns) == 1, keep

    energy = single.map(trajectory.state_rigid_body)
    energy = np.around(np.asarray(energy) / topology.n_nucleotides, 6)
    np.testing.assert_allclose(energy, _split(base_dir, term), atol=TOLS.get(term, 2e-6))


@pytest.mark.parametrize(
    "dirname",
    [
        "regr-circle",
        "regr-burns-natnano-2015",
        "simple-coax-oxdna2",
        "simple-coax-oxdna2-rev",
        "simple-helix-oxdna2-12bp",
        "simple-helix-60bp-oxdna2",
    ],
)
def test_dna2_regression_total(test_data_dir, dirname):
    base_dir = Path(test_data_dir) / dirname
    top_file = DNA2_SPLIT_DIRS.get(dirname, ("sys.top", None))[0]
    overrides = DNA2_SPLIT_DIRS.get(dirname, (None, {"half_charged_ends": False}))[1]
    topology, trajectory, displacement_fn = _load(base_dir, top_file)
    energy_fn = _dna2_energy_fn(topology, displacement_fn, {"kT": KT_296, **overrides})

    energies = np.asarray(energy_fn.map(trajectory.state_rigid_body)) / topology.n_nucleotides
    golden_total = np.loadtxt(base_dir / "energy.dat")
    golden_total = golden_total[-len(energies):, 1]
    np.testing.assert_allclose(energies, golden_total, rtol=1e-4, atol=2e-4)


def test_dna1_seq_dep_total(test_data_dir):
    """simple-helix-ss: oxDNA1 sequence-dependent stacking/HB weights."""
    base_dir = Path(test_data_dir) / "simple-helix-ss"
    topology, trajectory, displacement_fn = _load(base_dir, "generated.top")
    ss = read_ss_weights(base_dir / "oxDNA1_sequence_dependent_parameters.txt")

    energy_fn = ComposedEnergyFunction.from_lists(
        energy_fns=dna1.default_energy_fns(),
        energy_configs=dna1.default_energy_configs(
            overrides={
                "kT": KT_296,
                "stacking": {
                    "ss_stack_weights": ss["ss_stack_weights"],
                    "eps_stack_kt_coeff": ss["eps_stack_kt_coeff"],
                },
                "hydrogen_bonding": {"ss_hb_weights": ss["ss_hb_weights"]},
            }
        ),
        transform_fn=dna1.default_transform_fn(),
        displacement_fn=displacement_fn,
        topology=topology,
    )
    energies = np.asarray(energy_fn.map(trajectory.state_rigid_body)) / topology.n_nucleotides
    golden_total = np.loadtxt(base_dir / "energy.dat")
    golden_total = golden_total[-len(energies):, 1]
    np.testing.assert_allclose(energies, golden_total, rtol=1e-4, atol=2e-4)


# Debye-Hueckel derived parameters vs oxDNA's own derivation, as printed in
# the fixture sim.logs ("DEBUGGING: rhigh is ... RC huckel is ... B huckel is
# ... lambda is ...", e.g. regr-rna2-2ht-293.15-sa/sim.log). Covers the
# regr-rna2-* (both temps), and regr-circle-rna fixture configurations
# (all at salt_concentration = 1.0 with the oxRNA2 charge parameters).
RNA2_DEBYE_GOLDEN = {
    # T_kelvin: (lambda, r_high, r_cut, smoothing_coeff)
    293.15: (0.362515, 1.08754, 1.63132, 0.0132838),
    296.15: (0.364365, 1.0931, 1.63964, 0.0130825),
}


@pytest.mark.parametrize("t_kelvin", sorted(RNA2_DEBYE_GOLDEN))
def test_rna2_debye_derived_params(t_kelvin):
    lam, r_high, r_cut, b = RNA2_DEBYE_GOLDEN[t_kelvin]
    _, params = rna2.default_configs()
    cfg = dna2.DebyeConfiguration(
        **dict(params["debye"]) | {"kt": 0.1 * t_kelvin / 300.0, "salt_conc": 1.0, "half_charged_ends": False}
    ).init_params()
    assert float(cfg.lambda_) == pytest.approx(lam, rel=2e-5)
    assert float(cfg.r_high) == pytest.approx(r_high, rel=2e-5)
    assert float(cfg.r_cut) == pytest.approx(r_cut, rel=2e-5)
    assert float(cfg.smoothing_coeff) == pytest.approx(b, rel=2e-5)


# Melting temperature via umbrella-sampling histogram reweighting: the
# reference pins Tm = 0.1009298 and a 20-point melting curve on the
# melting_temp fixture (mythos/observables/tests/test_melting_temp.py:22-47).
MELTING_KT = 0.10238333333333333
MELTING_KT_RANGE = 0.1 * np.linspace(280.0, 350.0, 20) / 300.0
MELTING_FINF = np.array([
    9.54661208e-01, 9.30589100e-01, 8.94485689e-01, 8.41267687e-01,
    7.64995709e-01, 6.60578535e-01, 5.27863030e-01, 3.77845592e-01,
    2.35185564e-01, 1.26478977e-01, 6.05169415e-02, 2.70268531e-02,
    1.17361152e-02, 5.08819979e-03, 2.24055667e-03, 1.01612059e-03,
    4.81753103e-04, 2.43235060e-04, 1.33714983e-04, 8.17874679e-05,
])


def test_melting_temp_golden(test_data_dir):
    import jax.numpy as jnp

    from mythos_tpu.observables.melting_temp import MeltingTemp, jax_interp1d
    from mythos_tpu.simulators.io import SimulatorTrajectory
    from mythos_tpu.simulators.oxdna.utils import read_energy

    base_dir = Path(test_data_dir) / "melting_temp"
    topology = top.from_oxdna_file(base_dir / "sys.top")
    trajectory = traj.from_file(base_dir / "trajectory.dat", topology.strand_counts, is_5p_3p=False)

    energy_fn = (
        ComposedEnergyFunction.from_lists(
            energy_fns=dna1.default_energy_fns(),
            energy_configs=dna1.default_energy_configs(),
            transform_fn=dna1.default_transform_fn(),
            displacement_fn=spaces.periodic(20.0)[0],
            topology=topology,
        )
        .with_noopt("ss_stack_weights", "ss_hb_weights", "kt")
        .with_params(kt=MELTING_KT)
    )
    melting_temp = MeltingTemp(
        rigid_body_transform_fn=dna1.default_transform_fn(),
        sim_temperature=MELTING_KT,
        temperature_range=jnp.asarray(MELTING_KT_RANGE),
        energy_fn=energy_fn,
    )
    sim_traj = SimulatorTrajectory.from_rigid_body(trajectory.state_rigid_body)
    energy = read_energy(base_dir)

    assert float(jax_interp1d(jnp.asarray(MELTING_FINF), jnp.asarray(MELTING_KT_RANGE), 0.5)) == pytest.approx(0.1009298, rel=1e-5)

    temps, curve = melting_temp.get_melting_curve(
        trajectory=sim_traj,
        bind_states=energy["bond"].to_numpy(),
        umbrella_weights=energy["weight"].to_numpy(),
        opt_params=energy_fn.opt_params(),
    )
    np.testing.assert_allclose(np.asarray(temps), MELTING_KT_RANGE, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(curve), MELTING_FINF, rtol=1e-4)

    tm = melting_temp(
        trajectory=sim_traj,
        bind_states=energy["bond"].to_numpy(),
        umbrella_weights=energy["weight"].to_numpy(),
        opt_params=energy_fn.opt_params(),
    )
    assert float(tm) == pytest.approx(0.1009298, rel=1e-5)


RNA2_HCE = "simple-helix-rna2-12bp-half-charged-ends"


@pytest.mark.parametrize("term", DNA2_COLUMNS[1:])
def test_rna2_hce_split(test_data_dir, term):
    """rna2 at 1.0 M salt with half-charged ends (top-level fixture)."""
    base_dir = Path(test_data_dir) / RNA2_HCE
    topology, trajectory, displacement_fn = _load(base_dir, "generated.top")

    _, params = rna2.default_configs()
    builders = {
        "fene": (dna1.Fene, dna1.FeneConfiguration, "fene", {}),
        "bonded_excluded_volume": (
            dna1.BondedExcludedVolume, dna1.BondedExcludedVolumeConfiguration,
            "bonded_excluded_volume", {},
        ),
        "stacking": (rna2.Stacking, rna2.StackingConfiguration, "stacking", {"kt": KT_296}),
        "unbonded_excluded_volume": (
            dna1.UnbondedExcludedVolume, dna1.UnbondedExcludedVolumeConfiguration,
            "unbonded_excluded_volume", {},
        ),
        "hydrogen_bonding": (
            dna1.HydrogenBonding, dna1.HydrogenBondingConfiguration, "hydrogen_bonding", {},
        ),
        "cross_stacking": (rna2.CrossStacking, rna2.CrossStackingConfiguration, "cross_stacking", {}),
        "coaxial_stacking": (
            dna1.CoaxialStacking, dna1.CoaxialStackingConfiguration, "coaxial_stacking", {},
        ),
        "debye": (
            dna2.Debye, dna2.DebyeConfiguration, "debye",
            {"kt": KT_296, "salt_conc": 1.0, "half_charged_ends": True},
        ),
    }
    cls, cfg_cls, key, extra = builders[term]
    energy_fn = cls(
        displacement_fn=displacement_fn,
        transform_fn=rna2.default_transform_fn(),
        topology=topology,
        params=cfg_cls(**(dict(params[key]) | extra)).init_params(),
    )
    energy = energy_fn.map(trajectory.state_rigid_body)
    energy = np.around(np.asarray(energy) / topology.n_nucleotides, 6)
    np.testing.assert_allclose(energy, _split(base_dir, term), atol=TOLS.get(term, 2e-6))


# -- input-only regression dirs -------------------------------------------------
#
# The regr-rna2-* and regr-circle-rna fixtures ship inputs (oxDNA input
# file, RNA sequence-dependent parameter table, circular RNA topology) but
# no energy outputs; the 30/80bp helices ship init.conf only. They pin the
# parsers and the cross-path consistency contract: the pair-list and dense
# evaluations of the full model must agree on the initial configuration at
# the input's temperature/salt.

RNA2_INPUT_DIRS = [
    "regr-rna2-2ht-293.15-ss",
    "regr-rna2-2ht-293.15-sa",
    "regr-rna2-2ht-296.15-ss",
    "regr-rna2-2ht-296.15-sa",
    "regr-rna2-5ht-293.15-sa",
    "regr-circle-rna",
]


def _rna2_fn_from_input(base_dir: Path, dense: bool):
    from mythos_tpu.utils import units

    inp = oxdna_input.read(base_dir / "input")
    conf_path = base_dir / str(inp.get("conf_file", "init.conf"))
    if not conf_path.exists():
        # the 5ht dir ships topology + input only: pin the topology parse
        top.from_oxdna_file(next(base_dir.glob("*.top")))
        pytest.skip(f"{base_dir.name}: no configuration file shipped")
    topology = top.from_oxdna_file(base_dir / str(inp.get("topology", "sys.top")))
    trajectory = traj.from_file(
        base_dir / str(inp.get("conf_file", "init.conf")),
        topology.strand_counts,
        is_5p_3p=False,
    )
    box = oxdna_input.read_box_size(base_dir / str(inp.get("conf_file", "init.conf")))
    displacement_fn, _ = spaces.periodic(float(np.max(np.asarray(box))))

    kt = units.get_kt_from_string(str(inp["T"]))
    salt = float(inp["salt_concentration"])
    hce = str(inp.get("dh_half_charged_ends", "1")).lower() in ("1", "true")

    overrides: dict = {}
    if str(inp.get("use_average_seq", "1")).lower() in ("0", "false"):
        ss = read_ss_weights(base_dir / str(inp["seq_dep_file"]))
        overrides["stacking"] = {"ss_stack_weights": ss["ss_stack_weights"]}
        overrides["hydrogen_bonding"] = {"ss_hb_weights": ss["ss_hb_weights"]}

    _, params = rna2.default_configs()
    import mythos_tpu.energy.na1  # noqa: F401 - keep import graph warm

    common = dict(
        displacement_fn=displacement_fn,
        transform_fn=rna2.default_transform_fn(),
        topology=topology,
    )
    if dense:
        from mythos_tpu.simulators.neighbors import dense_pair_mask
        import jax.numpy as jnp

        common["dense_mask"] = jnp.asarray(dense_pair_mask(topology))

    terms = [
        ("fene", dna1.Fene, dna1.FeneConfiguration, {}),
        ("bonded_excluded_volume", dna1.BondedExcludedVolume,
         dna1.BondedExcludedVolumeConfiguration, {}),
        ("stacking", rna2.Stacking, rna2.StackingConfiguration,
         {"kt": kt, **overrides.get("stacking", {})}),
        ("unbonded_excluded_volume", dna1.UnbondedExcludedVolume,
         dna1.UnbondedExcludedVolumeConfiguration, {}),
        ("hydrogen_bonding", dna1.HydrogenBonding, dna1.HydrogenBondingConfiguration,
         overrides.get("hydrogen_bonding", {})),
        ("cross_stacking", rna2.CrossStacking, rna2.CrossStackingConfiguration, {}),
        ("coaxial_stacking", dna1.CoaxialStacking, dna1.CoaxialStackingConfiguration, {}),
        ("debye", dna2.Debye, dna2.DebyeConfiguration,
         {"kt": kt, "salt_conc": salt, "half_charged_ends": hce}),
    ]
    fns = []
    for key, cls, cfg_cls, extra in terms:
        kwargs = dict(common)
        if dense and key in ("fene", "bonded_excluded_volume", "stacking"):
            kwargs = {k: v for k, v in kwargs.items() if k != "dense_mask"}
        fns.append(cls(params=cfg_cls(**(dict(params[key]) | extra)).init_params(), **kwargs))
    return ComposedEnergyFunction(energy_fns=fns), trajectory


@pytest.mark.parametrize("dirname", RNA2_INPUT_DIRS)
def test_rna2_input_dirs_cross_path(test_data_dir, dirname):
    base_dir = Path(test_data_dir) / dirname
    if not base_dir.is_dir():
        pytest.skip(f"{dirname} not available")
    fn_pairs, trajectory = _rna2_fn_from_input(base_dir, dense=False)
    fn_dense, _ = _rna2_fn_from_input(base_dir, dense=True)
    state = trajectory.states[0].to_rigid_body()
    e_pairs = float(fn_pairs(state))
    e_dense = float(fn_dense(state))
    assert np.isfinite(e_pairs)
    np.testing.assert_allclose(e_dense, e_pairs, rtol=1e-9)


@pytest.mark.parametrize("dirname", ["simple-helix-30bp", "simple-helix-80bp"])
def test_dna1_large_helix_cross_path(test_data_dir, dirname):
    """30/80bp helices (init.conf-only fixtures): pair vs dense parity."""
    base_dir = Path(test_data_dir) / dirname
    if not base_dir.is_dir():
        pytest.skip(f"{dirname} not available")
    topology = top.from_oxdna_file(base_dir / "sys.top")
    inp = oxdna_input.read(base_dir / "input")
    conf = base_dir / str(inp.get("conf_file", "init.conf"))
    trajectory = traj.from_file(conf, topology.strand_counts, is_5p_3p=False)
    box = oxdna_input.read_box_size(conf)
    displacement_fn, _ = spaces.periodic(float(np.max(np.asarray(box))))
    state = trajectory.states[0].to_rigid_body()

    e_pairs = float(dna1.create_default_energy_fn(topology, displacement_fn)(state))
    e_dense = float(
        dna1.create_default_energy_fn(topology, displacement_fn, dense_unbonded=True)(state)
    )
    assert np.isfinite(e_pairs)
    np.testing.assert_allclose(e_dense, e_pairs, rtol=1e-9)
