"""IO-layer tests: parsers, round-trips, seq-dep machinery, mapper contract."""

import textwrap

import jax.numpy as jnp
import numpy as np
import pytest

import mythos_tpu.io.oxdna_input as oxdna_io
import mythos_tpu.io.topology as top
import mythos_tpu.io.trajectory as traj
from mythos_tpu.io.gromacs_input import (
    read_mdp,
    read_params_from_topology,
    replace_params_in_topology,
    write_mdp,
)
from mythos_tpu.io.sequence_constraints import dseq_to_pseq, from_bps
from mythos_tpu.io.toml import parse_toml
from mythos_tpu.simulators.oxdna.utils import (
    DEFAULT_OXDNA_VARIABLE_MAPPER,
    read_src_h,
    update_params,
    write_src_h,
)

CLASSIC_TOP = """\
4 2
1 A -1 1
1 T 0 -1
2 G -1 3
2 C 2 -1
"""

NEW_TOP = """\
4 2 5->3
AT type=DNA
GC type=DNA
"""


def test_topology_classic(tmp_path):
    p = tmp_path / "sys.top"
    p.write_text(CLASSIC_TOP)
    t = top.from_oxdna_file(p)
    assert t.n_nucleotides == 4
    assert list(t.strand_counts) == [2, 2]
    assert t.bonded_neighbors.tolist() == [[0, 1], [2, 3]]
    # 6 pairs total - 2 bonded = 4 unbonded
    assert t.unbonded_neighbors.shape == (4, 2)
    assert t.seq.tolist() == [0, 3, 2, 1]
    assert t.is_end.tolist() == [1, 1, 1, 1]


def test_topology_new_format_reverses(tmp_path):
    p = tmp_path / "sys.top"
    p.write_text(NEW_TOP)
    t, fmt = top.from_oxdna_file(p, return_format=True)
    assert fmt == top.oxDNAFormat.NEW
    # sequences stored 3'->5': "AT" reversed -> "TA"
    assert t.seq.tolist() == [3, 0, 1, 2]


def test_topology_circular(tmp_path):
    p = tmp_path / "sys.top"
    p.write_text("3 1\n1 A 2 1\n1 C 0 2\n1 G 1 0\n")
    t = top.from_oxdna_file(p)
    # wraparound bond keeps (3'-side, 5'-side) order: last nucleotide first
    assert t.bonded_neighbors.tolist() == [[0, 1], [1, 2], [2, 0]]
    assert t.is_end.tolist() == [0, 0, 0]


def test_trajectory_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n, s = 4, 3
    states = rng.normal(size=(s, n, 15))
    # normalize a1/a3 (parser doesn't require it, but realistic)
    t = traj.Trajectory(
        n_nucleotides=n,
        strand_lengths=[2, 2],
        times=np.arange(s, dtype=float),
        energies=rng.normal(size=(s, 3)),
        states=[traj.NucleotideState(array=states[i]) for i in range(s)],
        box_size=np.array([20.0, 20.0, 20.0]),
    )
    path = tmp_path / "out.dat"
    t.to_file(path)
    t2 = traj.from_file(path, [2, 2], is_5p_3p=False)
    np.testing.assert_allclose(t2.states[1].array, states[1], rtol=1e-12)
    np.testing.assert_allclose(t2.times, t.times)
    np.testing.assert_allclose(t2.energies, t.energies, rtol=1e-12)


def test_native_parser_matches_python(tmp_path):
    """If the native parser builds, it must agree with the Python path."""
    from mythos_tpu.io import native

    rng = np.random.default_rng(1)
    n, s = 3, 5
    states = rng.normal(size=(s, n, 15))
    t = traj.Trajectory(
        n_nucleotides=n,
        strand_lengths=[3],
        times=np.arange(s, dtype=float),
        energies=rng.normal(size=(s, 3)),
        states=[traj.NucleotideState(array=states[i]) for i in range(s)],
        box_size=np.array([10.0, 10.0, 10.0]),
    )
    path = tmp_path / "traj.dat"
    t.to_file(path)

    parsed = native.parse_trajectory(path, n)
    if parsed is None:
        pytest.skip("native parser unavailable (no compiler)")
    times, boxes, energies, parsed_states = parsed
    np.testing.assert_allclose(parsed_states, states, rtol=1e-12)
    np.testing.assert_allclose(times, t.times)


def test_oxdna_input_roundtrip(tmp_path):
    p = tmp_path / "input"
    p.write_text(
        textwrap.dedent(
            """
            backend = CPU
            steps = 1000
            T = 296.15K
            use_average_seq = true
            analysis = {
            name = energy
            }
            """
        )
    )
    cfg = oxdna_io.read(p)
    assert cfg["steps"] == 1000
    assert cfg["use_average_seq"] is True
    assert cfg["analysis"] == {"name": "energy"}
    out = tmp_path / "input2"
    oxdna_io.write(cfg, out)
    assert oxdna_io.read(out) == cfg


def test_toml_sympy_expressions(tmp_path):
    p = tmp_path / "cfg.toml"
    p.write_text('kT = "296.15 * 0.1 / 300.0"\nangle = "pi / 2"\nplain = 2.5\n')
    cfg = parse_toml(p)
    assert cfg["kT"] == pytest.approx(296.15 * 0.1 / 300.0)
    assert cfg["angle"] == pytest.approx(np.pi / 2)
    assert cfg["plain"] == 2.5


def test_mdp_roundtrip(tmp_path):
    p = tmp_path / "md.mdp"
    write_mdp({"nsteps": 100, "gen-vel": True, "ref_t": 303.0}, p)
    cfg = read_mdp(p)
    assert cfg["nsteps"] == 100
    assert cfg["gen_vel"] is True
    assert cfg["ref_t"] == 303.0


GMX_TOP = """\
[ atomtypes ]
Q0 72.0 0.0 A 0.0 0.0
Qa 72.0 0.0 A 0.0 0.0

[ nonbond_params ]
  Q0 Qa 1 0.47 3.5

[ moleculetype ]
DMPC 1

[ atoms ]
 1 Q0 1 DMPC NC3 1 1.0
 2 Qa 1 DMPC PO4 2 -1.0

[ bonds ]
  1 2 1 0.47 1250.0

[ angles ]
"""


def test_gromacs_topology_params_roundtrip(tmp_path):
    p = tmp_path / "pp.top"
    p.write_text(GMX_TOP)
    params = read_params_from_topology(p)
    assert params["bond_params"]["bond_k_DMPC_NC3_PO4"] == 1250.0
    assert params["bond_params"]["bond_r0_DMPC_NC3_PO4"] == 0.47
    assert params["nonbond_params"]["lj_sigma_Q0_Qa"] == 0.47

    out = tmp_path / "new.top"
    replace_params_in_topology(p, {"bond_k_DMPC_NC3_PO4": 999.0, "lj_epsilon_Q0_Qa": 4.2}, out)
    new = read_params_from_topology(out)
    assert new["bond_params"]["bond_k_DMPC_NC3_PO4"] == 999.0
    assert new["bond_params"]["bond_r0_DMPC_NC3_PO4"] == 0.47
    assert new["nonbond_params"]["lj_epsilon_Q0_Qa"] == 4.2


def test_sequence_constraints_pseq():
    sc = from_bps(6, np.array([[0, 5], [1, 4]]))
    assert sc.n_unpaired == 2
    assert sc.n_bp == 2
    assert sc.unpaired.tolist() == [2, 3]
    dseq = jnp.array([0, 2, 1, 3, 1, 3])  # A G C T C T: bps (A,T),(G,C)
    up, bp = dseq_to_pseq(dseq, sc)
    assert up.shape == (2, 4)
    assert bp.shape == (2, 4)
    assert bp[0, 0] == 1.0  # AT
    assert bp[1, 2] == 1.0  # GC


# -- oxDNA model.h interop contract ----------------------------------------------


def test_mapper_contract_spot_checks():
    """Representative entries of the param -> macro map (interop contract)."""
    m = DEFAULT_OXDNA_VARIABLE_MAPPER
    expected = {
        "eps_backbone": "FENE_EPS",
        "r0_backbone": "FENE_R0_OXDNA",
        "sigma_backbone": "EXCL_S1",
        "dr_star_base": "EXCL_R2",
        "b_back_base": "EXCL_B3",
        "dr_c_base_back": "EXCL_RC4",
        "eps_stack_base": "STCK_BASE_EPS_OXDNA",
        "eps_stack_kt_coeff": "STCK_FACT_EPS_OXDNA",
        "dr_low_stack": "STCK_RLOW",
        "b_stack_5": "STCK_THETA5_B",
        "neg_cos_phi2_star_stack": "STCK_PHI2_XS",
        "eps_hb": "HYDR_EPS_OXDNA",
        "delta_theta_hb_8_c": "HYDR_THETA8_TC",
        "k_cross": "CRST_K",
        "r0_cross": "CRST_R0",
        "delta_theta_star_cross_7": "CRST_THETA7_TS",
        "k_coax": "CXST_K_OXDNA",
        "dr0_coax": "CXST_R0",
        "theta0_coax_1": "CXST_THETA1_T0_OXDNA",
        "theta0_coax_4": "CXST_THETA4_T0",
        "cos_phi3_c_coax": "CXST_PHI3_XC",
        "a_coax_4p": "CXST_PHI4_A",
        "a_coax_1_f6": "CXST_THETA1_SA",
        "b_coax_1_f6": "CXST_THETA1_SB",
    }
    for k, v in expected.items():
        assert m[k] == v, (k, m[k], v)


def test_model_h_roundtrip(tmp_path):
    src = tmp_path / "model.h"
    src.write_text(
        "#ifndef MODEL_H_\n#define MODEL_H_\n"
        "#define FENE_EPS 2.0f\n"
        "#define FENE_DELTA 0.25f\n"
        "#define FENE_R0_OXDNA 0.7525f\n"
        "#define FENE_R0_OXDNA2 0.7564f\n"
        "#define HYDR_THETA8_T0 (PI*0.5f)\n"
        "#define CXST_THETA1_SA 20.0f\n"
        "#endif /* MODEL_H_ */\n"
    )
    params = read_src_h(src)
    assert params["FENE_EPS"] == 2.0
    assert params["HYDR_THETA8_T0"] == pytest.approx(np.pi / 2)

    update_params(src, {"r0_backbone": 0.8, "a_coax_1_f6": 40.0})
    updated = read_src_h(src)
    assert updated["FENE_R0_OXDNA"] == 0.8
    assert updated["FENE_R0_OXDNA2"] == 0.8  # OXDNA mirrors into OXDNA2
    assert updated["CXST_THETA1_SA"] == 20.0  # stored pre-divided by 2
    assert "FENE_DELTA2" in updated  # derived on write


def test_write_src_h_fene_delta2(tmp_path):
    src = tmp_path / "model.h"
    write_src_h(src, {"FENE_DELTA": 0.25})
    params = read_src_h(src)
    assert params["FENE_DELTA2"] == pytest.approx(0.0625)
