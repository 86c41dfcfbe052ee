"""rna2 SoA/block-path parity against the pair-list path on golden data."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mythos_tpu.energy.dna1 as dna1
import mythos_tpu.energy.dna2 as dna2
import mythos_tpu.energy.rna2 as rna2
import mythos_tpu.io.topology as top
import mythos_tpu.io.trajectory as traj
from mythos_tpu import soa, spaces
from mythos_tpu.energy.base import ComposedEnergyFunction
from mythos_tpu.energy.blocks import n_blocks_for
from mythos_tpu.simulators.neighbors import block_neighbor_list_for_topology

KT_296 = 296.15 * 0.1 / 300.0
BOX = 20.0
B = 8

TERMS = [
    ("fene", dna1.Fene, dna1.FeneConfiguration),
    ("bonded_excluded_volume", dna1.BondedExcludedVolume, dna1.BondedExcludedVolumeConfiguration),
    ("stacking", rna2.Stacking, rna2.StackingConfiguration),
    ("unbonded_excluded_volume", dna1.UnbondedExcludedVolume, dna1.UnbondedExcludedVolumeConfiguration),
    ("hydrogen_bonding", dna1.HydrogenBonding, dna1.HydrogenBondingConfiguration),
    ("cross_stacking", rna2.CrossStacking, rna2.CrossStackingConfiguration),
    ("coaxial_stacking", dna1.CoaxialStacking, dna1.CoaxialStackingConfiguration),
    ("debye", dna2.Debye, dna2.DebyeConfiguration),
]


def _build(topology, block: bool):
    _, params = rna2.default_configs()
    disp, _ = spaces.periodic(BOX)
    disp_soa, _ = spaces.periodic_soa(BOX)
    common = dict(
        displacement_fn=disp,
        displacement_soa_fn=disp_soa,
        transform_fn=rna2.default_transform_fn(),
        transform_soa_fn=rna2.default_transform_soa_fn(),
        topology=topology,
    )
    if block:
        nb = n_blocks_for(topology.n_nucleotides, B)
        common["block_ids"] = jnp.zeros((nb, 0), dtype=jnp.int32)
        common["block_size"] = B
    fns = []
    for key, cls, cfg_cls in TERMS:
        kwargs = dict(params[key])
        if key == "stacking":
            kwargs["kt"] = KT_296
        if key == "debye":
            kwargs.update({"kt": KT_296, "salt_conc": 1.0, "half_charged_ends": False})
        fns.append(cls(params=cfg_cls(**kwargs).init_params(), **common))
    return ComposedEnergyFunction(energy_fns=fns)


@pytest.fixture(scope="module")
def system(test_data_dir):
    base = Path(test_data_dir) / "rna2" / "simple-helix-12bp"
    topology = top.from_oxdna_file(base / "generated.top")
    trajectory = traj.from_file(base / "output.dat", topology.strand_counts, is_5p_3p=False)
    sr = trajectory.state_rigid_body
    from mythos_tpu.rigid_body import RigidBody

    body = RigidBody(center=jnp.asarray(sr.center[0]), orientation=jnp.asarray(sr.orientation[0]))
    return topology, body


def test_rna2_soa_terms_match_pairlist(system):
    topology, body = system
    e_ref = _build(topology, block=False)
    e_blk = _build(topology, block=True)
    nbl = block_neighbor_list_for_topology(
        spaces.periodic(BOX)[0],
        topology,
        max(c for f in e_ref.energy_fns if (c := f.pair_cutoff()) is not None) + 2.0,
        dr_threshold=0.5,
        block_size=B,
        init_centers=body.center,
    )
    e = e_blk.with_props(block_ids=nbl.idx)
    assert e.supports_soa()
    t_ref = e_ref.compute_terms(e_ref.energy_fns[2].transform_fn(body))
    t_soa = e.compute_terms_soa(soa.to_soa(body))
    np.testing.assert_allclose(np.asarray(t_soa), np.asarray(t_ref), rtol=1e-8, atol=1e-10)


@pytest.mark.slow
def test_rna2_soa_grads_match_pairlist(system):
    topology, body = system
    e_ref = _build(topology, block=False)
    e_blk = _build(topology, block=True)
    nbl = block_neighbor_list_for_topology(
        spaces.periodic(BOX)[0],
        topology,
        max(c for f in e_ref.energy_fns if (c := f.pair_cutoff()) is not None) + 2.0,
        dr_threshold=0.5,
        block_size=B,
        init_centers=body.center,
    )
    e = e_blk.with_props(block_ids=nbl.idx)
    g = jax.grad(lambda b: e.energy_soa(b))(soa.to_soa(body))
    ga = jax.grad(lambda b: e_ref(b), allow_int=True)(body)
    np.testing.assert_allclose(
        np.asarray(jnp.stack(tuple(g.center), -1)), np.asarray(ga.center), rtol=1e-7, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(jnp.stack(tuple(g.orientation), -1)),
        np.asarray(ga.orientation),
        rtol=1e-7,
        atol=1e-9,
    )
