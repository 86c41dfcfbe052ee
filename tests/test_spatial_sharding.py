"""Spatial (particle-axis) sharding of one stencil system (parallel/spatial.py).

The band splits over the mesh axis with halo columns pulled via ppermute;
energies psum, j-side halo forces return to their owners. Parity target:
the single-device XLA stencil (ops/stencil.py), itself pinned to oxDNA
golden data via test_stencil.py / test_dna2_golden.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from __graft_entry__ import _build_sim, _tiny_duplex
from mythos_tpu import soa
from mythos_tpu.ops import stencil as st
from mythos_tpu.parallel.spatial import spatial_unbonded_fns
from jax.sharding import Mesh

KT = 296.15 * 0.1 / 300.0


@pytest.fixture(autouse=True, scope="module")
def _f32_mode():
    jax.config.update("jax_enable_x64", False)
    yield
    jax.config.update("jax_enable_x64", True)


@pytest.fixture(scope="module")
def system():
    topology, body = _tiny_duplex(64)  # 128 nt: divides 2- and 4-device meshes
    _, sim = _build_sim(
        topology, KT, mode="stencil", init_centers=body.center,
        init_orientation=body.orientation, model="dna2", block_size=8,
    )
    e = sim.energy_fn.with_params(sim.energy_fn.opt_params())
    nb = sim.neighbors
    sctx = st.prepare_stencil_context(
        e, nb.w_short, nb.w_wide, perm=nb.perm, w_terms=None, kernel=False
    )
    bsoa = soa.to_soa(body)
    # slot-order body (the spatial module shards slot ranges)
    com = soa.Vec3(*(sctx.apply_perm(c) for c in bsoa.center))
    quat = soa.Quat(*(sctx.apply_perm(c) for c in bsoa.orientation))
    slot_body = soa.BodySoA(center=com, orientation=quat)
    return e, sctx, slot_body


def _reference(e, sctx, slot_body):
    spec = sctx.spec
    (fa1, fa2, fa3), frame_vjp = jax.vjp(soa.quat_frame_soa, slot_body.orientation)
    fields = (slot_body.center, fa1, fa2, fa3)
    energies = st.unbonded_stencil_energies(sctx, fields)
    gt = st._gt_of(e, sctx.unbonded)
    e_tot = sum(w * v for w, v in zip(gt, energies))
    acc = st._xla_unbonded_field_grads(
        spec, sctx.params, sctx.weight_d, sctx.qf_d, sctx.mask_d, gt, fields
    )
    (g_quat,) = frame_vjp((acc[1], acc[2], acc[3]))
    return e_tot, acc[0], g_quat


@pytest.mark.parametrize("n_dev", [2, 4])
def test_spatial_parity(system, n_dev):
    if len(jax.devices()) < n_dev:
        pytest.skip("needs the virtual device mesh")
    e, sctx, slot_body = system
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("space",))
    energy_fn, grads_fn = spatial_unbonded_fns(e, sctx, mesh)

    e_ref, g_com_ref, g_quat_ref = jax.jit(lambda b: _reference(e, sctx, b))(slot_body)
    e_sh = energy_fn(slot_body)
    np.testing.assert_allclose(float(e_sh), float(e_ref), rtol=2e-5)

    g_com, g_quat = grads_fn(slot_body)
    for k, (a, b) in enumerate(zip(g_com, g_com_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5, err_msg=f"com[{k}]"
        )
    for k, (a, b) in enumerate(zip(g_quat, g_quat_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5, err_msg=f"quat[{k}]"
        )
