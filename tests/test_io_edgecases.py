"""Topology/trajectory format edge cases.

Ports the reference's format matrices
(mythos/input/tests/test_topology.py, test_trajectory.py): construction
validation errors, format sniffing (classic vs new), circular strands,
bonded-neighbor generation, 5'->3' flipping, box-size validation, writer
round trips, and NucleotideState conversions.
"""

import numpy as np
import pytest

import mythos_tpu.io.topology as top
import mythos_tpu.io.trajectory as traj
from mythos_tpu.utils.types import oxDNAFormat

# -- Topology construction validation --------------------------------------------


def _valid_kwargs(n=4):
    return dict(
        n_nucleotides=n,
        strand_counts=np.array([n]),
        bonded_neighbors=np.array([[i, i + 1] for i in range(n - 1)]),
        seq=np.zeros(n, dtype=int),
        is_end=np.zeros(n),
        nt_type=np.zeros(n, dtype=int),
    )


@pytest.mark.parametrize(
    ("override", "msg"),
    [
        ({"n_nucleotides": 0}, top.ERR_INVALID_NUMBER_NUCLEOTIDES),
        ({"strand_counts": np.array([], dtype=int)}, top.ERR_INVALID_STRAND_COUNTS),
        ({"strand_counts": np.array([0])}, top.ERR_INVALID_STRAND_COUNTS),
        ({"strand_counts": np.array([3])}, top.ERR_STRAND_COUNTS_NOT_MATCH),
        ({"bonded_neighbors": np.zeros((3,))}, top.ERR_BONDED_NEIGHBORS_INVALID_SHAPE),
        ({"bonded_neighbors": np.zeros((3, 3))}, top.ERR_BONDED_NEIGHBORS_INVALID_SHAPE),
        ({"seq": np.array([9, 0, 0, 0])}, top.ERR_INVALID_SEQUENCE_NUCLEOTIDES),
        ({"seq": np.zeros((4, 2), dtype=int)}, top.ERR_INVALID_DISCRETE_SEQUENCE_SHAPE),
    ],
)
def test_topology_validation_raises(override, msg):
    with pytest.raises(ValueError, match=msg):
        top.Topology(**{**_valid_kwargs(), **override})


def test_topology_unbonded_shape_validation():
    with pytest.raises(ValueError, match=top.ERR_UNBONDED_NEIGHBORS_INVALID_SHAPE):
        top.Topology(**_valid_kwargs(), unbonded_neighbors=np.zeros((2, 3)))


def test_topology_pseq_validation():
    n = 4
    kw = _valid_kwargs(n)
    # 2 unpaired + 1 bp = 4 nucleotides; bp rows sum to 1, unpaired don't
    unpaired = np.full((2, 4), 0.3)
    bp = np.full((1, 4), 0.25)
    kw["seq"] = (unpaired, bp)
    with pytest.raises(ValueError, match=top.ERR_PSEQ_NOT_NORMALIZED):
        top.Topology(**kw)
    # count mismatch detected before normalization
    kw["seq"] = (np.full((4, 4), 0.25), bp)
    with pytest.raises(ValueError, match=top.ERR_MISMATCH_PSEQ_SHAPE):
        top.Topology(**kw)
    # negative probabilities
    bad = np.full((2, 4), 0.25)
    bad[0] = [-0.25, 0.5, 0.5, 0.25]
    kw["seq"] = (bad, bp)
    with pytest.raises(ValueError, match=top.ERR_INVALID_PROBABILITIES):
        top.Topology(**kw)


def test_topology_unbonded_lazily_derived():
    t = top.Topology(**_valid_kwargs(4))
    ub = t.unbonded_neighbors
    # all i<j pairs (6) minus 3 bonded
    assert ub.shape == (3, 2)
    as_set = {tuple(p) for p in ub.tolist()}
    assert as_set == {(0, 2), (0, 3), (1, 3)}


# -- format sniffing --------------------------------------------------------------


CLASSIC = """4 1
1 A -1 1
1 T 0 2
1 G 1 3
1 C 2 -1
"""

NEW = """4 1 5->3
ACGT type=DNA
"""

NEW_CIRCULAR = """4 1 5->3
ACGT type=DNA circular=true
"""

NEW_RNA = """4 1 5->3
ACGU type=RNA
"""


def _write(tmp_path, text, name="sys.top"):
    p = tmp_path / name
    p.write_text(text)
    return p


def test_sniff_classic(tmp_path):
    t, fmt = top.from_oxdna_file(_write(tmp_path, CLASSIC), return_format=True)
    assert fmt == oxDNAFormat.CLASSIC
    assert t.n_nucleotides == 4
    assert list(t.strand_counts) == [4]
    # classic is 3'->5' on disk; bonded pairs follow the file's neighbor ids
    assert t.bonded_neighbors.shape == (3, 2)


def test_sniff_new(tmp_path):
    t, fmt = top.from_oxdna_file(_write(tmp_path, NEW), return_format=True)
    assert fmt == oxDNAFormat.NEW
    assert t.n_nucleotides == 4
    assert int(np.sum(t.is_end)) == 2  # two open ends
    from mythos_tpu.io.topology import NucleotideType

    assert all(int(x) == NucleotideType.DNA for x in np.asarray(t.nt_type))


def test_sniff_new_circular(tmp_path):
    t = top.from_oxdna_file(_write(tmp_path, NEW_CIRCULAR))
    assert int(np.sum(t.is_end)) == 0
    # circular: N bonds, not N-1
    assert t.bonded_neighbors.shape == (4, 2)


def test_sniff_new_rna(tmp_path):
    from mythos_tpu.io.topology import NucleotideType

    t = top.from_oxdna_file(_write(tmp_path, NEW_RNA))
    assert all(int(x) == NucleotideType.RNA for x in np.asarray(t.nt_type))


def test_sniff_invalid_format(tmp_path):
    with pytest.raises(ValueError, match="format"):
        top.from_oxdna_file(_write(tmp_path, "1 2 3 4 5\n"))


def test_from_oxdna_file_not_found(tmp_path):
    with pytest.raises(FileNotFoundError):
        top.from_oxdna_file(tmp_path / "nope.top")


def test_classic_new_sequence_agreement(tmp_path):
    """The same duplex through both formats yields identical connectivity."""
    t_c = top.from_oxdna_file(_write(tmp_path, CLASSIC, "c.top"))
    t_n = top.from_oxdna_file(_write(tmp_path, NEW, "n.top"))
    assert t_c.n_nucleotides == t_n.n_nucleotides
    assert {frozenset(p) for p in t_c.bonded_neighbors.tolist()} == {
        frozenset(p) for p in t_n.bonded_neighbors.tolist()
    }


# -- bonded-neighbor generation ---------------------------------------------------


@pytest.mark.parametrize(
    ("lengths", "circular", "expected"),
    [
        ([3], [False], {(0, 1), (1, 2)}),
        ([3], [True], {(0, 1), (1, 2), (2, 0)}),
        ([2, 2], [False, False], {(0, 1), (2, 3)}),
        ([2, 3], [False, True], {(0, 1), (2, 3), (3, 4), (4, 2)}),
    ],
)
def test_bonded_neighbors_generation(lengths, circular, expected):
    bn = top._bonded_neighbors(lengths, circular)
    assert {tuple(sorted(p)) for p in bn.tolist()} == {
        tuple(sorted(p)) for p in expected
    }


def test_bonded_neighbors_mismatched_circular():
    with pytest.raises(ValueError, match="do not match"):
        top._bonded_neighbors([3, 3], [False])


# -- trajectory parsing -----------------------------------------------------------


def _state_text(n, t=0.0, scale=1.0):
    lines = [f"t = {t}", "b = 20.0 20.0 20.0", "E = 0.0 0.0 0.0"]
    rng = np.random.RandomState(int(t) + 1)
    rows = []
    for i in range(n):
        com = rng.uniform(0, 10, 3) * scale
        a1 = [1.0, 0.0, 0.0]
        a3 = [0.0, 0.0, 1.0]
        v = [0.1, 0.0, 0.0]
        L = [0.0, 0.1, 0.0]
        row = np.concatenate([com, a1, a3, v, L])
        rows.append(" ".join(f"{x:.8f}" for x in row))
    return "\n".join(lines + rows) + "\n"


def test_trajectory_from_file_roundtrip(tmp_path):
    n = 4
    p = tmp_path / "out.dat"
    p.write_text(_state_text(n, 0.0) + _state_text(n, 100.0))
    tr = traj.from_file(p, [n], is_5p_3p=False)
    assert len(tr.states) == 2
    assert tr.times.tolist() == [0.0, 100.0]
    assert tr.n_nucleotides == n

    # writer round trip
    out = tmp_path / "rt.dat"
    tr.to_file(out)
    tr2 = traj.from_file(out, [n], is_5p_3p=False)
    np.testing.assert_allclose(
        tr2.states[0].array[:, :9], tr.states[0].array[:, :9], atol=1e-6
    )
    assert tr2.times.tolist() == tr.times.tolist()


def test_trajectory_strand_flipping(tmp_path):
    """is_5p_3p=True reverses per-strand nucleotide order."""
    n = 4
    p = tmp_path / "out.dat"
    p.write_text(_state_text(n, 0.0))
    plain = traj.from_file(p, [2, 2], is_5p_3p=False)
    flipped = traj.from_file(p, [2, 2], is_5p_3p=True)
    a = plain.states[0].array
    b = flipped.states[0].array
    np.testing.assert_allclose(b[0], a[1])
    np.testing.assert_allclose(b[1], a[0])
    np.testing.assert_allclose(b[2], a[3])
    np.testing.assert_allclose(b[3], a[2])


def test_trajectory_malformed_raises(tmp_path):
    p = tmp_path / "bad.dat"
    # truncated nucleotide rows
    text = _state_text(4, 0.0).splitlines()
    p.write_text("\n".join(text[:-1]) + "\n")
    with pytest.raises(ValueError):
        traj.from_file(p, [4], is_5p_3p=False)


def test_trajectory_file_not_found(tmp_path):
    with pytest.raises(FileNotFoundError):
        traj.from_file(tmp_path / "nope.dat", [4])


def test_validate_box_size_rejects_mixed():
    with pytest.raises(ValueError):
        traj.validate_box_size(np.array([[20.0, 20.0, 20.0], [10.0, 20.0, 20.0]]))


def test_nucleotide_state_to_rigid_body(tmp_path):
    n = 3
    p = tmp_path / "out.dat"
    p.write_text(_state_text(n, 0.0))
    tr = traj.from_file(p, [n], is_5p_3p=False)
    rb = tr.states[0].to_rigid_body()
    assert rb.center.shape == (n, 3)
    assert rb.orientation.shape == (n, 4)
    # quaternions are unit
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(rb.orientation), axis=-1), 1.0, atol=1e-6
    )
    # and reproduce the a1/a3 axes from the file
    from mythos_tpu.soa import Quat, quat_frame_soa

    q = np.asarray(rb.orientation)
    a1, _, a3 = quat_frame_soa(Quat(q[:, 0], q[:, 1], q[:, 2], q[:, 3]))
    np.testing.assert_allclose(np.stack(a1, -1), tr.states[0].array[:, 3:6], atol=1e-5)
    np.testing.assert_allclose(np.stack(a3, -1), tr.states[0].array[:, 6:9], atol=1e-5)


# -- synthetic generator ----------------------------------------------------------


def test_synthetic_bend_preserves_local_structure():
    """The bent-arc conformation (the general-conformation benchmark
    geometry) keeps the local helix ideal: near-identical bonded energies,
    unit quaternions, and a strongly reduced end-to-end distance."""
    import jax
    import jax.numpy as jnp

    from mythos_tpu.io.synthetic import synthetic_duplex
    import mythos_tpu.energy.dna1 as dna1

    t0, b0 = synthetic_duplex(48)
    t1, b1 = synthetic_duplex(48, bend=np.pi / 2)
    # quats stay unit
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(b1.orientation), axis=-1), 1.0, atol=1e-6
    )
    e0 = dna1.create_default_energy_fn(t0, dense_unbonded=True)
    e1 = dna1.create_default_energy_fn(t1, dense_unbonded=True)
    en0 = float(jax.jit(lambda b: e0(b))(b0)) / t0.n_nucleotides
    en1 = float(jax.jit(lambda b: e1(b))(b1)) / t1.n_nucleotides
    # gentle curvature: small per-nucleotide energy penalty only (bench
    # scale bends 5000 bp over 270 deg -> curvature radius ~400 su, far
    # gentler than this 48-bp quarter turn)
    assert abs(en1 - en0) < 0.03, (en0, en1)
    # the arc shortens the end-to-end distance (chord/arc at 90 deg ~ 0.90)
    d0 = float(jnp.linalg.norm(b0.center[47] - b0.center[0]))
    d1 = float(jnp.linalg.norm(b1.center[47] - b1.center[0]))
    assert d1 < 0.95 * d0
