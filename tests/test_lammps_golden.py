"""oxDNA2 energy parity against LAMMPS CG-DNA thermo output.

The reference's analog lives at
mythos/simulators/lammps/tests/test_lammps_oxdna.py:538-595 (template
dirs); here the shipped regression fixtures
data/test-data/lammps-oxdna2-40bp[-sa] are used: `data.oxdna` is the
initial configuration (TacoxDNA conversion of the LAMMPS data file) and
`log.lammps`'s first thermo row reports LAMMPS's per-nucleotide energies
for exactly that state, split per term
(E_bond=fene, c_stk=stacking, c_hbond=HB, c_excv=unbonded excluded volume,
c_xstk=cross, c_coaxstk=coax, c_dh=Debye-Hueckel). LAMMPS does not
implement the bonded excluded volume, so that term is dropped.

The -sa dir runs sequence-averaged coefficients; the plain dir runs
`seqdep`, i.e. the standard oxDNA2 sequence-dependent weight tables.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

import mythos_tpu.energy.dna2 as dna2
import mythos_tpu.io.topology as top
import mythos_tpu.io.trajectory as traj
from mythos_tpu import spaces
from mythos_tpu.io.sequence_dependence import read_ss_weights

#: thermo column -> (our term name, ...) of the custom thermo_style
_THERMO_COLS = (
    "v_tns", "Temp", "E_vdwl", "E_coul", "E_bond", "E_angle", "E_dihed",
    "PotEng", "v_cpuh", "c_hbondEnergy", "c_excvEnergy", "c_stkEnergy",
    "c_xstkEnergy", "c_coaxstkEnergy", "c_dhEnergy",
)
_TERM_MAP = {
    "fene": "E_bond",
    "stacking": "c_stkEnergy",
    "hydrogen_bonding": "c_hbondEnergy",
    "unbonded_excluded_volume": "c_excvEnergy",
    "cross_stacking": "c_xstkEnergy",
    "coaxial_stacking": "c_coaxstkEnergy",
    "debye": "c_dhEnergy",
}


def _first_thermo_row(log_file: Path) -> dict[str, float]:
    lines = log_file.read_text().splitlines()
    for i, line in enumerate(lines):
        if line.split() == list(_THERMO_COLS):
            vals = [float(v) for v in lines[i + 1].split()]
            return dict(zip(_THERMO_COLS, vals, strict=True))
    raise AssertionError("thermo header not found")


@pytest.mark.parametrize("dirname", ["lammps-oxdna2-40bp-sa", "lammps-oxdna2-40bp"])
def test_lammps_oxdna2_term_parity(test_data_dir, dirname):
    base = Path(test_data_dir) / dirname
    if not base.is_dir():
        pytest.skip(f"{dirname} not available")
    topology = top.from_oxdna_file(base / "data.top")
    trajectory = traj.from_file(base / "data.oxdna", topology.strand_counts, is_5p_3p=False)
    state = trajectory.states[0].to_rigid_body()

    # the LAMMPS run: T = 0.1, [Na+] = 0.15, q_eff = 0.815 (pair_coeff
    # oxdna2/dh line in `in`), no half-charged ends
    overrides = {
        "kT": 0.1,
        "salt_conc": 0.15,
        "half_charged_ends": False,
        "debye": {"q_eff": 0.815},
    }
    if not dirname.endswith("-sa"):  # seqdep = standard oxDNA2 weight tables
        ss_file = Path(test_data_dir) / "simple-helix-oxdna2-ss" / (
            "oxDNA2_sequence_dependent_parameters.txt"
        )
        if not ss_file.exists():
            pytest.skip("oxDNA2 seq-dep table not available")
        ss = read_ss_weights(ss_file)
        overrides["stacking"] = {
            "ss_stack_weights": ss["ss_stack_weights"],
            "eps_stack_kt_coeff": ss["eps_stack_kt_coeff"],
        }
        overrides["hydrogen_bonding"] = {"ss_hb_weights": ss["ss_hb_weights"]}

    box = 51.479698
    energy_fn = dna2.create_default_energy_fn(
        topology,
        displacement_fn=spaces.periodic(box)[0],
        overrides=overrides,
    ).without_terms("BondedExcludedVolume")

    ref = _first_thermo_row(base / "log.lammps")
    n = topology.n_nucleotides
    terms = np.asarray(energy_fn.compute_terms(state)) / n
    names = [type(fn).__name__ for fn in energy_fn.energy_fns]

    by_name = {
        "Fene": "fene",
        "Stacking": "stacking",
        "HydrogenBonding": "hydrogen_bonding",
        "UnbondedExcludedVolume": "unbonded_excluded_volume",
        "CrossStacking": "cross_stacking",
        "CoaxialStacking": "coaxial_stacking",
        "Debye": "debye",
    }
    got_total = 0.0
    for name, val in zip(names, terms, strict=True):
        key = _TERM_MAP[by_name[name]]
        np.testing.assert_allclose(
            val, ref[key], atol=2e-4, rtol=2e-3,
            err_msg=f"{dirname}: term {name} vs {key}",
        )
        got_total += val
    np.testing.assert_allclose(got_total, ref["PotEng"], atol=5e-4, rtol=1e-3)
