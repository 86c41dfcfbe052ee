"""External-engine input rewrite -> readback round trips (VERDICT r2 item 8).

Mirrors the reference's wrapper test patterns
(mythos/simulators/{oxdna,gromacs,lammps}/tests/): mocked binaries are
covered by test_external_engines.py / test_gromacs_umbrella.py; here the
FORMAT contracts round-trip — oxDNA model.h macros (incl. expression values,
the OXDNA->OXDNA2 mirror and the CXST_THETA1_SA / 2 convention), oxDNA
input files (nested dicts), GROMACS .mdp variants and preprocessed-topology
parameter rewrites (deg<->rad), LAMMPS coefficient orderings incl. the
theta7/theta8 swaps, and the oxDNA sequence-dependence file parser.
"""

import numpy as np
import pytest

import mythos_tpu.io.gromacs_input as gmx_io
import mythos_tpu.io.oxdna_input as ox_io
from mythos_tpu.io.sequence_dependence import read_ss_weights
from mythos_tpu.simulators.lammps import lammps_oxdna as lmp
from mythos_tpu.simulators.oxdna import utils as oxu


# oxDNA model.h ----------------------------------------------------------------


def test_src_h_roundtrip_with_expressions(tmp_path):
    src = tmp_path / "model.h"
    src.write_text(
        "\n".join(
            [
                "#ifndef MODEL_H_",
                "#define MODEL_H_",
                "#define HYDR_EPS 1.077f",
                "#define HYDR_THETA4_T0 (PI*0.5f)  // expression macro",
                "#define FENE_DELTA 2.f",
                "#define STCK_FACT_EPS_OXDNA 0.18f",
                "#define MAX_N 1024",
                "#endif /* MODEL_H_ */",
                "",
            ]
        )
    )
    params = oxu.read_src_h(src)
    assert params["HYDR_EPS"] == pytest.approx(1.077)
    assert params["HYDR_THETA4_T0"] == pytest.approx(np.pi * 0.5)
    assert params["MAX_N"] == 1024

    out = tmp_path / "model_out.h"
    oxu.write_src_h(out, params)
    again = oxu.read_src_h(out)
    # FENE_DELTA2 is derived on write
    assert again.pop("FENE_DELTA2") == pytest.approx(4.0)
    for k, v in params.items():
        assert again[k] == pytest.approx(v), k


def test_update_params_mirrors_oxdna2_and_halves_cxst_theta1(tmp_path):
    src = tmp_path / "model.h"
    mapper = oxu.DEFAULT_OXDNA_VARIABLE_MAPPER
    # pick a parameter whose macro has an OXDNA2 mirror
    eps_name = next(k for k, m in mapper.items() if "OXDNA" in m and k.startswith("eps_stack"))
    eps_macro = mapper[eps_name]
    coax_name = next(k for k, m in mapper.items() if m == "CXST_THETA1_SA")
    oxu.write_src_h(
        src,
        {
            eps_macro: 1.0,
            eps_macro.replace("OXDNA", "OXDNA2"): 1.0,
            "CXST_THETA1_SA": 0.0,
        },
    )
    oxu.update_params(src, {eps_name: 2.5, coax_name: 1.8})
    params = oxu.read_src_h(src)
    assert params[eps_macro] == pytest.approx(2.5)
    assert params[eps_macro.replace("OXDNA", "OXDNA2")] == pytest.approx(2.5)
    # the standalone engine stores CXST_THETA1_SA pre-divided by 2
    assert params["CXST_THETA1_SA"] == pytest.approx(0.9)


def test_update_params_rejects_unknown_only(tmp_path):
    src = tmp_path / "model.h"
    oxu.write_src_h(src, {"HYDR_EPS": 1.0})
    with pytest.raises(ValueError, match="No valid oxDNA parameters"):
        oxu.update_params(src, {"not_a_param": 1.0})


# oxDNA input files --------------------------------------------------------


def test_oxdna_input_roundtrip_nested(tmp_path):
    cfg = {
        "backend": "CPU",
        "steps": 20000,
        "T": "296.15K",
        "salt_concentration": 1.0,
        "data_output_1": {"print_every": 100, "name": "split_energy.dat"},
    }
    f = tmp_path / "input"
    ox_io.write(cfg, f)
    again = ox_io.read(f)
    assert again["steps"] == 20000
    assert again["T"] == "296.15K"
    assert again["salt_concentration"] == pytest.approx(1.0)
    assert again["data_output_1"]["print_every"] == 100
    assert again["data_output_1"]["name"] == "split_energy.dat"


# GROMACS ------------------------------------------------------------------


def test_mdp_roundtrip_format_variants(tmp_path):
    f = tmp_path / "run.mdp"
    f.write_text(
        "\n".join(
            [
                "; production run",
                "integrator = md",
                "nsteps     = 50000 ; inline comment",
                "dt         = 0.02",
                "gen-vel    = yes",
                "constraints= no",
                "ref_t      = 310",
                "",
            ]
        )
    )
    cfg = gmx_io.read_mdp(f)
    assert cfg["integrator"] == "md"
    assert cfg["nsteps"] == 50000
    assert cfg["dt"] == pytest.approx(0.02)
    assert cfg["gen_vel"] is True  # '-' key normalized, yes -> bool
    assert cfg["constraints"] is False

    out = tmp_path / "out.mdp"
    gmx_io.write_mdp(cfg, out)
    assert gmx_io.read_mdp(out) == cfg

    gmx_io.update_mdp_params(out, {"nsteps": 123, "dt": 0.01})
    updated = gmx_io.read_mdp(out)
    assert updated["nsteps"] == 123
    assert updated["dt"] == pytest.approx(0.01)
    assert updated["gen_vel"] is True


_TOP = """\
; preprocessed topology fixture
[ defaults ]
1 2 no 1.0 1.0
[ atomtypes ]
P4 72.0 0.0 A 0.0 0.0
C1 72.0 0.0 A 0.0 0.0
[ nonbond_params ]
P4 C1 1 0.470000 2.700000
[ moleculetype ]
DPPC 1
[ atoms ]
1 P4 1 DPPC NC3 1 1.0
2 C1 1 DPPC PO4 2 -1.0
3 C1 1 DPPC GL1 3 0.0
[ bonds ]
1 2 1 0.470000 1250.000000
[ angles ]
1 2 3 2 120.000000 25.000000
"""


def test_gromacs_topology_param_roundtrip(tmp_path):
    top = tmp_path / "processed.top"
    top.write_text(_TOP)
    params = gmx_io.read_params_from_topology(top)
    assert params["bond_params"]["bond_k_DPPC_NC3_PO4"] == pytest.approx(1250.0)
    assert params["bond_params"]["bond_r0_DPPC_NC3_PO4"] == pytest.approx(0.47)
    # angles are exposed in radians
    assert params["angle_params"]["angle_theta0_DPPC_NC3_PO4_GL1"] == pytest.approx(
        np.deg2rad(120.0)
    )
    assert params["nonbond_params"]["lj_sigma_P4_C1"] == pytest.approx(0.47)

    new = {
        "bond_k_DPPC_NC3_PO4": 999.0,
        "angle_theta0_DPPC_NC3_PO4_GL1": float(np.deg2rad(111.0)),
        "lj_epsilon_P4_C1": 3.3,
    }
    out = tmp_path / "rewritten.top"
    gmx_io.replace_params_in_topology(top, new, out)
    again = gmx_io.read_params_from_topology(out)
    assert again["bond_params"]["bond_k_DPPC_NC3_PO4"] == pytest.approx(999.0)
    # untouched values survive the rewrite
    assert again["bond_params"]["bond_r0_DPPC_NC3_PO4"] == pytest.approx(0.47)
    assert again["angle_params"]["angle_theta0_DPPC_NC3_PO4_GL1"] == pytest.approx(
        np.deg2rad(111.0), rel=1e-5
    )
    assert again["nonbond_params"]["lj_epsilon_P4_C1"] == pytest.approx(3.3)
    assert again["nonbond_params"]["lj_sigma_P4_C1"] == pytest.approx(0.47)
    # comments / sections / defaults lines pass through verbatim
    assert out.read_text().splitlines()[0] == "; preprocessed topology fixture"


# LAMMPS coefficient orderings ----------------------------------------------


def test_lammps_hbond_theta78_swap_declared():
    """The per-style argument orderings encode the LAMMPS grammar's
    theta7/theta8 swap for hbond (and cross-stacking's 2/3 + 7/8 swaps)."""
    swapped = lmp._hbond_args("eps_hb", swap78=True)
    plain = lmp._hbond_args("eps_hb", swap78=False)
    i7s, i8s = swapped.index("theta0_hb_7"), swapped.index("theta0_hb_8")
    i7p, i8p = plain.index("theta0_hb_7"), plain.index("theta0_hb_8")
    assert i8s < i7s, "swap78 puts the theta8 triplet first"
    assert i7p < i8p
    cross = lmp.REPLACEMENT_MAP["pair_coeff * * oxdna/xstk"]
    i2, i3 = cross.index("theta0_cross_2"), cross.index("theta0_cross_3")
    assert i3 < i2, "LAMMPS xstk grammar swaps cross theta 2/3"


def _coeff_line(key: str, repl: tuple) -> str:
    """A synthetic input line with sentinel args matching the style arity."""
    n_cmd = len(key.split())
    return key + " " + " ".join(f"{k}.25" for k in range(len(repl) - n_cmd))


@pytest.mark.parametrize(
    "key",
    [
        "pair_coeff * * oxdna/hbond",
        "pair_coeff 2 3 oxdna/hbond",
        "pair_coeff * * oxdna/xstk",
        "pair_coeff * * oxdna2/coaxstk",
        "bond_coeff * oxdna2/fene",
    ],
)
def test_lammps_coeff_rewrite_positions(key):
    if key not in lmp.REPLACEMENT_MAP:
        pytest.skip(f"{key} not in REPLACEMENT_MAP")
    repl = lmp.REPLACEMENT_MAP[key]
    line = _coeff_line(key, repl)
    # give every named slot a distinct value
    named = [r for r in repl if r is not None]
    params = {name: 100.0 + i for i, name in enumerate(dict.fromkeys(named))}
    out = lmp._replace_parts_in_line(line, repl, params)
    parts = out.split()
    for i, r in enumerate(repl):
        if r is None:
            assert parts[i] == line.split()[i], f"slot {i} must pass through"
        else:
            expected = lmp._transform_param(r, params[r])
            assert float(parts[i]) == pytest.approx(expected), f"slot {i} ({r})"


def test_lammps_phi_star_sign_transform():
    assert lmp._transform_param("neg_cos_phi1_star_stack", 0.65) == pytest.approx(-0.65)
    assert lmp._transform_param("theta0_stack_5", 0.65) == pytest.approx(0.65)


def test_lammps_variable_seed_and_multiline(tmp_path):
    lines = [
        "variable seed equal 12345",
        "variable T equal 0.1",
        "dump out all custom 10000 trajectory.dat &",
        "    id mol type x y z ix iy iz vx vy vz &",
        "    c_quat[1] c_quat[2] c_quat[3] c_quat[4] angmomx angmomy angmomz",
    ]
    new = lmp._lammps_oxdna_replace_inputs(lines, {}, seed=777, variables={"T": 0.2})
    joined = "\n".join(new)
    assert "variable seed equal 777" in joined
    assert "variable T equal 0.2" in joined


# oxDNA sequence-dependence files -------------------------------------------


def test_sequence_dependence_file_parse(tmp_path):
    f = tmp_path / "seq_dep.txt"
    alpha = "ACGT"
    lines = ["STCK_FACT_EPS = 0.18"]
    for i, a in enumerate(alpha):
        for j, b in enumerate(alpha):
            v = 1.11 if (a, b) == ("A", "A") else 1.22 if (a, b) == ("A", "C") else 1.0
            lines.append(f"STCK_{a}_{b} = {v}")
    lines += ["HYDR_A_T = 0.88", "HYDR_G_C = 1.12", ""]
    f.write_text("\n".join(lines))
    w = read_ss_weights(str(f))
    assert w["eps_stack_kt_coeff"] == pytest.approx(0.18)
    from mythos_tpu.utils.constants import NUCLEOTIDES_IDX

    a, c, g, t = (NUCLEOTIDES_IDX[x] for x in "ACGT")
    assert w["ss_stack_weights"][a, a] == pytest.approx(1.11)
    assert w["ss_stack_weights"][a, c] == pytest.approx(1.22)
    assert w["ss_hb_weights"][a, t] == pytest.approx(0.88)
    assert w["ss_hb_weights"][t, a] == pytest.approx(0.88)
    assert w["ss_hb_weights"][g, c] == pytest.approx(1.12)
