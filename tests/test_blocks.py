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
