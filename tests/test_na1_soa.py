"""oxNA hybrid SoA/block-path parity vs the pair-list path on golden data."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mythos_tpu.energy.na1 as na1
import mythos_tpu.io.topology as top
import mythos_tpu.io.trajectory as traj
from mythos_tpu import soa, spaces
from mythos_tpu.energy.base import ComposedEnergyFunction
from mythos_tpu.energy.blocks import n_blocks_for
from mythos_tpu.rigid_body import RigidBody
from mythos_tpu.simulators.neighbors import block_neighbor_list_for_topology

KT_296 = 296.15 * 0.1 / 300.0
BOX = 20.0
B = 8

TERMS = [
    ("fene", na1.Fene, na1.FeneConfiguration),
    ("bonded_excluded_volume", na1.BondedExcludedVolume, na1.BondedExcludedVolumeConfiguration),
    ("stacking", na1.Stacking, na1.StackingConfiguration),
    ("unbonded_excluded_volume", na1.UnbondedExcludedVolume, na1.UnbondedExcludedVolumeConfiguration),
    ("hydrogen_bonding", na1.HydrogenBonding, na1.HydrogenBondingConfiguration),
    ("cross_stacking", na1.CrossStacking, na1.CrossStackingConfiguration),
    ("coaxial_stacking", na1.CoaxialStacking, na1.CoaxialStackingConfiguration),
    ("debye", na1.Debye, na1.DebyeConfiguration),
]


def _build(topology, block: bool):
    _, params = na1.default_configs()
    disp, _ = spaces.periodic(BOX)
    disp_soa, _ = spaces.periodic_soa(BOX)
    common = dict(
        displacement_fn=disp,
        displacement_soa_fn=disp_soa,
        transform_fn=na1.default_transform_fn(),
        transform_soa_fn=na1.default_transform_soa_fn(),
        topology=topology,
    )
    if block:
        nb = n_blocks_for(topology.n_nucleotides, B)
        common["block_ids"] = jnp.zeros((nb, 0), dtype=jnp.int32)
        common["block_size"] = B
    fns = []
    for key, cls, cfg_cls in TERMS:
        kwargs = dict(params[key]) | {"nt_type": jnp.asarray(topology.nt_type)}
        if key == "stacking":
            kwargs["kt"] = KT_296
        if key == "debye":
            kwargs.update({"kt": KT_296, "salt_conc": 0.5, "half_charged_ends": False})
        fns.append(cls(params=cfg_cls(**kwargs).init_params(), **common))
    return ComposedEnergyFunction(energy_fns=fns)


@pytest.mark.parametrize("system", ["na1/simple-helix-dna-rna", "na1/simple-helix-dna-dna"])
@pytest.mark.slow
def test_na1_soa_terms_and_grads_match(test_data_dir, system):
    base = Path(test_data_dir) / system
    topology = top.from_oxdna_file(base / "generated.top")
    trajectory = traj.from_file(base / "output.dat", topology.strand_counts, is_5p_3p=True)
    sr = trajectory.state_rigid_body
    body = RigidBody(center=jnp.asarray(sr.center[0]), orientation=jnp.asarray(sr.orientation[0]))

    e_ref = _build(topology, block=False)
    e_blk = _build(topology, block=True)
    cutoff = max(c for f in e_blk.energy_fns if (c := f.pair_cutoff()) is not None) + 2.0
    nbl = block_neighbor_list_for_topology(
        spaces.periodic(BOX)[0], topology, cutoff, dr_threshold=0.5, block_size=B,
        init_centers=body.center,
    )
    e = e_blk.with_props(block_ids=nbl.idx)
    assert e.supports_soa()

    t_ref = e_ref.compute_terms(body)
    t_soa = e.compute_terms_soa(soa.to_soa(body))
    np.testing.assert_allclose(np.asarray(t_soa), np.asarray(t_ref), rtol=1e-8, atol=1e-10)

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
