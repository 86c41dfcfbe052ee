"""Two-level (cell-list) banded block build vs the dense AABB pass.

The hierarchical rebuild (_ids_hierarchical) replaces the O(n_blocks^2)
dense gap matrix with a super-level candidate window plus a linear refine;
on any in-band configuration its tables must be IDENTICAL to the dense
banded build (same window-start semantics over the same geometry).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mythos_tpu.energy.dna2 as dna2
from __graft_entry__ import _tiny_duplex
from mythos_tpu import spaces
from mythos_tpu.simulators.neighbors import (
    block_neighbor_list_for_topology,
    strand_interleave_perm,
)


@pytest.fixture(autouse=True, scope="module")
def _f32_mode():
    jax.config.update("jax_enable_x64", False)
    yield
    jax.config.update("jax_enable_x64", True)


def _build(topology, body, super_group):
    return block_neighbor_list_for_topology(
        spaces.free()[0],
        topology,
        dna2.default_neighbor_cutoff(),
        dr_threshold=0.5,
        block_size=8,
        init_centers=body.center,
        symmetric=True,
        r_cutoff_inner=dna2.short_range_neighbor_cutoff(),
        perm=strand_interleave_perm(topology),
        banded=True,
        super_group=super_group,
    )


@pytest.mark.parametrize("super_group", [4, 16])
def test_hierarchical_matches_dense(super_group):
    topology, body = _tiny_duplex(512)  # 1024 nt, 128 blocks
    dense = _build(topology, body, super_group=0)
    hier = _build(topology, body, super_group=super_group)
    assert hier.super_group == super_group
    assert hier.super_capacity >= 1
    assert dense.banded and hier.banded

    ids_d, ovf_d = dense.build_ids(jnp.asarray(body.center))
    ids_h, ovf_h = hier.build_ids(jnp.asarray(body.center))
    if dense.r_cutoff_inner is not None:
        (in_d, wide_d), (in_h, wide_h) = ids_d, ids_h
        np.testing.assert_array_equal(np.asarray(in_d), np.asarray(in_h))
        np.testing.assert_array_equal(np.asarray(wide_d), np.asarray(wide_h))
    else:
        np.testing.assert_array_equal(np.asarray(ids_d), np.asarray(ids_h))
    assert bool(ovf_d) == bool(ovf_h) == False  # noqa: E712

    # perturbed positions: parity must hold off the ideal geometry too
    key = jax.random.PRNGKey(0)
    centers = jnp.asarray(body.center) + 0.05 * jax.random.normal(
        key, body.center.shape
    )
    ids_d, ovf_d = dense.build_ids(centers, prev=ids_d)
    ids_h, ovf_h = hier.build_ids(centers, prev=ids_h)
    a = ids_d[0] if isinstance(ids_d, tuple) else ids_d
    b = ids_h[0] if isinstance(ids_h, tuple) else ids_h
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert bool(ovf_d) == bool(ovf_h)


def test_explicit_opt_in_for_large_systems():
    topology, body = _tiny_duplex(10000)  # 20k nt, 2500 blocks > 2048
    nbl = _build(topology, body, super_group=32)
    assert nbl.super_group == 32
    assert nbl.super_capacity >= 1
    assert not bool(nbl.did_overflow)
