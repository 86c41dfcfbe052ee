"""Probabilistic sequences on every energy path (dense/block/fused/SoA).

The reference supports pseq wherever its energies run
(mythos/energy/dna1/stacking.py:261-288, hydrogen_bonding.py); round 1 only
had it on the pair-list path. These tests pin the factorized-marginal
implementation (energy/seqdep.factorized_weights) against the pair-list
ground truth on the dense, block-XLA-tile, SoA and fused-Pallas paths,
including the sequence-distribution GRADIENT through the fused kernel --
the quantity sequence design optimizes.

The whole module runs in f32 (the fused kernels' dtype); the pair-list
reference is evaluated in the same precision, so tolerances reflect op
ordering only.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mythos_tpu.energy.dna1 as dna1
import mythos_tpu.energy.rna2 as rna2
from mythos_tpu import soa, spaces
from mythos_tpu.io import sequence_constraints as scs
from mythos_tpu.ops import oxdna_tiles as ot
from mythos_tpu.simulators.neighbors import block_neighbor_list_for_topology

from __graft_entry__ import _tiny_duplex

N_BP = 8


@pytest.fixture(autouse=True, scope="module")
def _f32_mode():
    jax.config.update("jax_enable_x64", False)
    yield
    jax.config.update("jax_enable_x64", True)


@pytest.fixture(scope="module")
def setup(_f32_mode):
    topology, body = _tiny_duplex(N_BP)
    n = topology.n_nucleotides
    sc = scs.from_bps(n, np.array([[i, n - 1 - i] for i in range(N_BP)]))
    rng = np.random.default_rng(0)
    bp = rng.random((sc.n_bp, 4))
    bp /= bp.sum(axis=1, keepdims=True)
    pseq = (jnp.zeros((0, 4), jnp.float32), jnp.asarray(bp, jnp.float32))
    return topology, body, sc, pseq


def _with_pseq(efn, pseq, sc):
    return efn.replace(
        energy_fns=[
            fn.replace(params=fn.params.replace(pseq=pseq, pseq_constraints=sc))
            if hasattr(fn.params, "pseq")
            else fn
            for fn in efn.energy_fns
        ]
    )


def _pairs_energy(topology, body, pseq, sc, pkg=dna1):
    return float(_with_pseq(pkg.create_default_energy_fn(topology), pseq, sc)(body))


def test_pseq_dense_matches_pairs(setup):
    topology, body, sc, pseq = setup
    ref = _pairs_energy(topology, body, pseq, sc)
    efn = _with_pseq(dna1.create_default_energy_fn(topology, dense_unbonded=True), pseq, sc)
    assert float(efn(body)) == pytest.approx(ref, rel=1e-6)


def test_pseq_block_matches_pairs(setup):
    topology, body, sc, pseq = setup
    ref = _pairs_energy(topology, body, pseq, sc)
    efn = _with_pseq(
        dna1.create_default_energy_fn(topology, block_unbonded=True, block_size=8), pseq, sc
    )
    nbl = block_neighbor_list_for_topology(
        spaces.free()[0], topology, dna1.default_neighbor_cutoff(),
        block_size=8, init_centers=body.center,
    )
    efn = efn.replace(
        energy_fns=[
            fn.with_props(block_ids=nbl.idx) if getattr(fn, "block_ids", None) is not None else fn
            for fn in efn.energy_fns
        ]
    )
    assert float(efn(body)) == pytest.approx(ref, rel=1e-6)


def test_pseq_onehot_matches_discrete(setup):
    """One-hot pseq == discrete-sequence energies (reference integration
    pattern, mythos/energy/dna1/tests/test_integration.py:230-233)."""
    topology, body, sc, _ = setup
    pseq_oh = scs.dseq_to_pseq(np.asarray(topology.seq), sc)
    efn0 = dna1.create_default_energy_fn(topology, dense_unbonded=True)
    ref = float(efn0(body))
    efn = _with_pseq(efn0, jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), pseq_oh), sc)
    assert float(efn(body)) == pytest.approx(ref, rel=1e-5)


@pytest.mark.parametrize("pkg_name", ["dna1", "rna2"])
def test_pseq_shift_weights_match_pair_weights(setup, pkg_name):
    """The gather-free (i, i+1) shift weights (stacking SoA hot path) equal
    seqdep.pair_weights on the explicit bonded pairs, for both the dna1 and
    rna2 Stacking implementations."""
    from mythos_tpu.energy import seqdep

    topology, body, sc, pseq = setup
    n = topology.n_nucleotides
    disp, _ = spaces.free()
    if pkg_name == "dna1":
        _, params = dna1.default_configs()
        kwargs = dict(params["stacking"])
        kwargs["kt"] = 296.15 * 0.1 / 300.0
        fn = dna1.Stacking(
            params=dna1.StackingConfiguration(**kwargs).init_params(),
            displacement_fn=disp,
            transform_fn=dna1.default_transform_fn(),
            topology=topology,
        )
    else:
        _, params = rna2.default_configs()
        kwargs = dict(params["stacking"])
        kwargs["kt"] = 296.15 * 0.1 / 300.0
        fn = rna2.Stacking(
            params=rna2.StackingConfiguration(**kwargs).init_params(),
            displacement_fn=disp,
            transform_fn=rna2.default_transform_fn(),
            topology=topology,
        )
    fn_p = fn.replace(params=fn.params.replace(pseq=pseq, pseq_constraints=sc))
    w_shift = np.asarray(fn_p._seq_pair_weights_shift(jnp.asarray(topology.seq)))
    bn = np.asarray(topology.bonded_neighbors)
    w_ref = np.asarray(
        seqdep.pair_weights(pseq, bn[:, 0], bn[:, 1], fn_p.params.eps_stack, sc)
    )
    # shift row i holds the (i, i+1) weight; bonded pairs are exactly those
    # rows (strand-internal), other rows are masked by bonded_next_mask
    np.testing.assert_allclose(w_shift[bn[:, 0]], w_ref, rtol=1e-6)


@pytest.fixture(scope="module")
def fused_setup(setup):
    topology, body, sc, pseq = setup
    nbl_sym = block_neighbor_list_for_topology(
        spaces.free()[0], topology, dna1.default_neighbor_cutoff(),
        block_size=8, init_centers=body.center, symmetric=True,
    )
    return topology, body, soa.to_soa(body), sc, pseq, nbl_sym


def _fused_energy(topology, body_soa, nbl_sym, pseq, sc):
    efn = _with_pseq(
        dna1.create_default_energy_fn(topology, block_unbonded=True, block_size=8), pseq, sc
    )
    return ot.fused_energy_soa(efn, body_soa, nbl_sym.idx, 8)


def test_pseq_fused_energy_matches_pairs(fused_setup):
    topology, body, body_soa, sc, pseq, nbl_sym = fused_setup
    ref = _pairs_energy(topology, body, pseq, sc)
    got = float(_fused_energy(topology, body_soa, nbl_sym, pseq, sc))
    assert got == pytest.approx(ref, rel=5e-6)


@pytest.mark.slow
def test_pseq_fused_gradient_matches_pairs(fused_setup):
    """d(total energy)/d(bp distribution) through the fused custom-vjp
    (left/right/corr row-field cotangents) vs pair-list jax.grad -- the
    sequence-design hot path (round-1 VERDICT item 4)."""
    topology, body, body_soa, sc, pseq, nbl_sym = fused_setup

    def loss_fused(bp_arr):
        ps = (jnp.zeros((0, 4), jnp.float32), bp_arr)
        return _fused_energy(topology, body_soa, nbl_sym, ps, sc)

    def loss_pairs(bp_arr):
        ps = (jnp.zeros((0, 4), jnp.float32), bp_arr)
        efn = _with_pseq(dna1.create_default_energy_fn(topology), ps, sc)
        return efn(body)

    g_f = jax.grad(loss_fused)(pseq[1])
    g_p = jax.grad(loss_pairs)(pseq[1])
    scale = np.abs(np.asarray(g_p)).max()
    np.testing.assert_allclose(
        np.asarray(g_f) / scale, np.asarray(g_p) / scale, atol=5e-5
    )
