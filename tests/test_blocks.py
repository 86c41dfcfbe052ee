"""Block-sparse tile path: parity vs the dense path + neighbor-table logic.

The block path must reproduce the dense (N, N) energies and gradients exactly
(same pairs, same math, different iteration order), for every block size and
for topologies whose N is not a multiple of the block size.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mythos_tpu.energy.dna1 as dna1
import mythos_tpu.io.topology as top
import mythos_tpu.io.trajectory as traj
from mythos_tpu import spaces
from mythos_tpu.energy import blocks
from mythos_tpu.simulators.neighbors import (
    BlockNeighborList,
    block_neighbor_list_for_topology,
)


@pytest.fixture(scope="module")
def helix(test_data_dir):
    base = f"{test_data_dir}/simple-helix"
    topology = top.from_oxdna_file(base + "/generated.top")
    trajectory = traj.from_file(base + "/output.dat", topology.strand_counts, is_5p_3p=False)
    return topology, trajectory.states[0].to_rigid_body()


def _block_fn(topology, body, block_size):
    efn = dna1.create_default_energy_fn(topology, block_unbonded=True, block_size=block_size)
    nbl = block_neighbor_list_for_topology(
        spaces.free()[0],
        topology,
        r_cutoff=dna1.default_neighbor_cutoff(),
        block_size=block_size,
        init_centers=np.asarray(body.center),
    )
    return efn.with_props(block_ids=nbl.idx), nbl


@pytest.mark.parametrize("block_size", [4, 8, 16, 5])
def test_block_energy_matches_dense(helix, block_size):
    topology, body = helix
    efn_dense = dna1.create_default_energy_fn(topology, dense_unbonded=True)
    efn_block, nbl = _block_fn(topology, body, block_size)
    e_dense = float(jax.jit(lambda b: efn_dense(b))(body))
    e_block = float(jax.jit(lambda b: efn_block(b))(body))
    assert not bool(nbl.did_overflow)
    np.testing.assert_allclose(e_block, e_dense, rtol=1e-10)


def test_block_gradients_match_dense(helix):
    topology, body = helix
    efn_dense = dna1.create_default_energy_fn(topology, dense_unbonded=True)
    efn_block, _ = _block_fn(topology, body, 8)
    gd = jax.jit(jax.grad(lambda b: efn_dense(b)))(body)
    gb = jax.jit(jax.grad(lambda b: efn_block(b)))(body)
    np.testing.assert_allclose(np.asarray(gb.center), np.asarray(gd.center), atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(gb.orientation), np.asarray(gd.orientation), atol=1e-10
    )


def test_placeholder_block_ids_raise(helix):
    topology, body = helix
    efn = dna1.create_default_energy_fn(topology, block_unbonded=True, block_size=8)
    with pytest.raises(ValueError, match="placeholder"):
        efn(body)


def test_block_table_covers_bruteforce_pairs():
    """Every pair within cutoff must live in a listed (row, col) block pair."""
    rng = np.random.default_rng(0)
    n, b_sz, cutoff = 37, 8, 1.0
    centers = jnp.asarray(rng.uniform(0, 6.0, (n, 3)))
    nbl = BlockNeighborList(
        displacement_fn=spaces.free()[0],
        block_size=b_sz,
        capacity=5,
        r_cutoff=cutoff,
        dr_threshold=0.0,
        n=n,
    )
    ids, overflow = jax.jit(nbl.build_ids)(centers)
    ids = np.asarray(ids)
    listed = {(a, b) for a in range(ids.shape[0]) for b in ids[a] if b < nbl.n_blocks}
    d = np.linalg.norm(np.asarray(centers)[:, None] - np.asarray(centers)[None, :], axis=-1)
    for i, j in zip(*np.where(np.triu(d < cutoff, k=1))):
        pair = (i // b_sz, j // b_sz)
        assert pair in listed or bool(overflow)


def test_block_overflow_flag():
    """Capacity 1 on a dense cluster of blocks must raise the overflow flag."""
    n, b_sz = 32, 4
    centers = jnp.zeros((n, 3))  # everything within cutoff of everything
    nbl = BlockNeighborList(
        displacement_fn=spaces.free()[0],
        block_size=b_sz,
        capacity=1,
        r_cutoff=1.0,
        dr_threshold=0.0,
        n=n,
    )
    _, overflow = jax.jit(nbl.build_ids)(centers)
    assert bool(overflow)


def _line_of_blocks(xs, b_sz=4):
    """Blocks of b_sz coincident particles at x positions ``xs``."""
    centers = np.zeros((len(xs) * b_sz, 3))
    for k, x in enumerate(xs):
        centers[k * b_sz : (k + 1) * b_sz, 0] = x
    return jnp.asarray(centers)


def test_block_drop_keeps_nearest_no_false_overflow():
    """Skin-zone blocks are dropped first and don't raise the overflow flag."""
    b_sz = 4
    centers = _line_of_blocks([0.0, 0.9, 1.7, 2.5], b_sz)
    nbl = BlockNeighborList(
        displacement_fn=spaces.free()[0],
        block_size=b_sz,
        capacity=2,
        r_cutoff=1.0,
        dr_threshold=1.0,
        n=centers.shape[0],
    )
    ids, overflow = jax.jit(nbl.build_ids)(centers)
    # row 0 hits {0, 1, 2} at cutoff+skin but only {0, 1} at the bare
    # cutoff: capacity 2 must keep the two NEAREST and not flag overflow
    assert list(np.asarray(ids)[0]) == [0, 1]
    assert not bool(overflow)


def test_block_missed_interaction_detector():
    """A pair inside the bare cutoff absent from the previous table flags."""
    b_sz = 4
    centers = _line_of_blocks([0.0, 0.9, 1.7], b_sz)
    nbl = BlockNeighborList(
        displacement_fn=spaces.free()[0],
        block_size=b_sz,
        capacity=3,
        r_cutoff=1.0,
        dr_threshold=1.0,
        n=centers.shape[0],
    )
    ids, overflow = nbl.build_ids(centers)
    assert not bool(overflow)
    # a complete previous table is clean
    _, ovf_clean = nbl.build_ids(centers, prev=ids)
    assert not bool(ovf_clean)
    # censor (0, 1) — within the bare cutoff — from the previous table
    nb = nbl.n_blocks
    censored = np.asarray(ids).copy()
    censored[0][censored[0] == 1] = nb
    _, ovf = nbl.build_ids(centers, prev=jnp.asarray(censored))
    assert bool(ovf)
    # censoring a SKIN-zone block (0, 2 at distance 1.7 > r_cutoff) is fine
    censored2 = np.asarray(ids).copy()
    censored2[0][censored2[0] == 2] = nb
    _, ovf2 = nbl.build_ids(centers, prev=jnp.asarray(censored2))
    assert not bool(ovf2)


def test_pair_list_drop_keeps_nearest_and_missed_detector():
    """FixedCapacityNeighborList: same drop-farthest + missed-pair semantics."""
    from mythos_tpu.simulators.neighbors import FixedCapacityNeighborList

    centers = jnp.asarray([[0.0, 0, 0], [0.9, 0, 0], [1.7, 0, 0]])
    n = 3
    nbl = FixedCapacityNeighborList(
        displacement_fn=spaces.free()[0],
        exclusion_mask=jnp.zeros((n, n), bool),
        r_cutoff=1.0,
        dr_threshold=1.0,
        capacity=2,
    )
    # hits at cutoff+skin: (0,1) d=0.9, (0,2) d=1.7, (1,2) d=0.8 — capacity 2
    # keeps the two nearest; only (0,2) is beyond the bare cutoff: no flag
    idx, overflow = nbl._build(centers)
    pairs = {tuple(p) for p in np.asarray(idx).T if p[0] < n}
    assert pairs == {(1, 2), (0, 1)}
    assert not bool(overflow)
    # previous list missing the interacting pair (0, 1) must flag
    prev = jnp.asarray([[1, n], [2, n]])
    _, ovf = nbl._build(centers, prev=prev)
    assert bool(ovf)
    # previous list missing only the skin pair (0, 2) is clean
    prev2 = jnp.asarray([[1, 0], [2, 1]])
    _, ovf2 = nbl._build(centers, prev=prev2)
    assert not bool(ovf2)


def test_bonded_partner_table():
    bonded = np.array([[0, 1], [1, 2], [4, 5]])
    prev, nxt = blocks.bonded_partner_table(8, bonded)
    prev, nxt = np.asarray(prev), np.asarray(nxt)
    assert prev[0] == 1 and prev[1] == 2 and prev[4] == 5
    assert nxt[1] == 0 and nxt[2] == 1 and nxt[5] == 4
    assert prev[3] == -1 and nxt[0] == -1


@pytest.mark.slow
def test_block_simulation_runs(helix):
    """A short Langevin run on the block path stays finite, no overflow."""
    from mythos_tpu.rigid_body import RigidBody
    from mythos_tpu.simulators import StaticSimulatorParams, TpuSimulator

    topology, body = helix
    kT = 296.15 * 0.1 / 300.0
    efn = dna1.create_default_energy_fn(topology, block_unbonded=True, block_size=8)
    nbl = block_neighbor_list_for_topology(
        spaces.free()[0],
        topology,
        r_cutoff=dna1.default_neighbor_cutoff(),
        block_size=8,
        init_centers=np.asarray(body.center),
    )
    sim = TpuSimulator(
        energy_fn=efn,
        simulator_params=StaticSimulatorParams(
            seq=jnp.asarray(topology.seq),
            mass=RigidBody(center=jnp.array([1.0]), orientation=jnp.array([[1.0, 1.0, 1.0]])),
            gamma=RigidBody(center=jnp.array([kT / 2.5]), orientation=jnp.array([kT / 7.5])),
            bonded_neighbors=jnp.asarray(topology.bonded_neighbors),
            checkpoint_every=0,
            dt=5e-3,
            kT=kT,
        ),
        space=spaces.free(),
        neighbors=nbl,
        neighbor_update_every=5,
    )
    out = jax.jit(lambda p: sim.run(p, body, 20, jax.random.PRNGKey(0)))(efn.opt_params())
    tr = out.observables[0]
    assert np.isfinite(np.asarray(tr.center)).all()
    qn = np.abs(np.linalg.norm(np.asarray(tr.orientation), axis=-1) - 1.0).max()
    assert qn < 1e-6
