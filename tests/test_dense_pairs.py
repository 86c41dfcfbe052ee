"""Dense (N, N) unbonded path must match the pair-list path exactly."""

import jax.numpy as jnp
import numpy as np

import mythos_tpu.energy.dna1 as dna1
import mythos_tpu.energy.dna2 as dna2
import mythos_tpu.io.topology as top
import mythos_tpu.io.trajectory as traj
from mythos_tpu import spaces


def _setup(test_data_dir, pkg, system):
    topology = top.from_oxdna_file(f"{test_data_dir}/{system}/generated.top")
    trajectory = traj.from_file(
        f"{test_data_dir}/{system}/output.dat", topology.strand_counts, is_5p_3p=False
    )
    body = trajectory.states[0].to_rigid_body()
    body = body.replace(center=jnp.asarray(body.center), orientation=jnp.asarray(body.orientation))
    displacement_fn, _ = spaces.periodic(20.0)
    sparse = pkg.create_default_energy_fn(topology, displacement_fn)
    dense = pkg.create_default_energy_fn(topology, displacement_fn, dense_unbonded=True)
    return sparse, dense, body


def test_dna1_dense_matches_sparse(test_data_dir):
    sparse, dense, body = _setup(test_data_dir, dna1, "dna1/simple-helix")
    e_sparse = sparse.compute_terms(body)
    e_dense = dense.compute_terms(body)
    np.testing.assert_allclose(np.asarray(e_dense), np.asarray(e_sparse), rtol=1e-10)


def test_dna2_dense_matches_sparse(test_data_dir):
    sparse, dense, body = _setup(test_data_dir, dna2, "dna2/simple-helix")
    e_sparse = sparse.compute_terms(body)
    e_dense = dense.compute_terms(body)
    np.testing.assert_allclose(np.asarray(e_dense), np.asarray(e_sparse), rtol=1e-10)
