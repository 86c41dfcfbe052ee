"""Sharded MD over a particle-sharded mesh (parallel/spatial.spatial_md_run_fn).

The full Langevin hot loop — unbonded band + bonded offset-2 stencil +
exact-OU BAOAB — runs per-shard with ppermute halo exchange. The parity
oracle is the SAME program on a 1-device mesh (the noise protocol is a
global (6, n) draw sliced per device, so trajectories are identical across
device counts); the 1-device forces are themselves pinned to the XLA
stencil by test_spatial_sharding.py and to oxDNA golden data upstream.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from __graft_entry__ import _build_sim, _tiny_duplex
from mythos_tpu import soa
from mythos_tpu.ops import stencil as st
from mythos_tpu.parallel.spatial import spatial_md_run_fn
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
    return e, sctx, sim, soa.to_soa(body), nb


def _mesh(n_dev):
    return Mesh(np.array(jax.devices()[:n_dev]), ("space",))


_RUNS = {}


def _run(e, sctx, sim, bsoa, band, n_dev, n_steps=40):
    """Run (memoized per device count — the 1-device oracle is reused by
    every parity test; CPU wall time dominates this module)."""
    if n_dev not in _RUNS:
        run = spatial_md_run_fn(
            e, sctx, _mesh(n_dev), sim.simulator_params, band,
            save_every=20, neighbor_update_every=20,
        )
        _RUNS[n_dev] = jax.jit(lambda b, k: run(b, n_steps, k))(
            bsoa, jax.random.PRNGKey(7)
        )
    return _RUNS[n_dev]


def test_spatial_md_single_device_physical(system):
    e, sctx, sim, bsoa, nb = system
    traj, ovf = _run(e, sctx, sim, bsoa, nb, 1)
    coms = np.stack([np.asarray(c) for c in traj.center])
    quats = np.stack([np.asarray(c) for c in traj.orientation])
    assert coms.shape[1:] == (2, 128)
    assert np.all(np.isfinite(coms)) and np.all(np.isfinite(quats))
    qn = np.abs(np.sqrt((quats**2).sum(0)) - 1.0).max()
    assert qn < 1e-4, f"quaternion norm drift {qn}"
    assert not bool(ovf)
    # thermal motion happened but nothing exploded
    disp = np.abs(coms[:, -1] - coms[:, 0]).max()
    assert 1e-4 < disp < 5.0


@pytest.mark.parametrize("n_dev", [2, 4])
def test_spatial_md_parity_across_device_counts(system, n_dev):
    if len(jax.devices()) < n_dev:
        pytest.skip("needs the virtual device mesh")
    e, sctx, sim, bsoa, nb = system
    ref, ovf_ref = _run(e, sctx, sim, bsoa, nb, 1)
    out, ovf = _run(e, sctx, sim, bsoa, nb, n_dev)
    assert bool(ovf) == bool(ovf_ref) is False
    for name, a, b in (
        ("com", out.center, ref.center),
        ("quat", out.orientation, ref.orientation),
    ):
        for k, (x, y) in enumerate(zip(a, b)):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=2e-4, atol=2e-5,
                err_msg=f"{name}[{k}] at {n_dev} devices",
            )


def test_spatial_md_differentiable_through_dynamics(system):
    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual device mesh")
    e, sctx, sim, bsoa, nb = system
    # 3 steps bound the CPU backprop cost; depth is exercised, not length
    run = spatial_md_run_fn(
        e, sctx, _mesh(2), sim.simulator_params, None,
        save_every=3, neighbor_update_every=3,
    )

    def loss(cx):
        body = soa.BodySoA(
            center=soa.Vec3(cx, bsoa.center.y, bsoa.center.z),
            orientation=bsoa.orientation,
        )
        traj, _ = run(body, 3, jax.random.PRNGKey(3))
        return jnp.mean(traj.center.x[-1] ** 2)

    g = jax.jit(jax.grad(loss))(bsoa.center.x)
    g = np.asarray(g)
    assert np.all(np.isfinite(g))
    assert np.abs(g).max() > 0.0
