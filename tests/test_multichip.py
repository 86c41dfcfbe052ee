"""Multi-chip replica parallelism on the virtual 8-device CPU mesh.

Pins the same path the driver's dryrun_multichip exercises: a full
simulate -> observable loss -> psum'd replica gradients training step over a
jax.sharding.Mesh, plus checkpoint save/restore of the optimizer state.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mythos_tpu.energy.dna1 as dna1
from __graft_entry__ import _build_sim, _tiny_duplex
from mythos_tpu.observables import PropellerTwist
from mythos_tpu.parallel import make_mesh, replica_grad_fn

KT = 296.15 * 0.1 / 300.0


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs the virtual device mesh")
def test_replica_run_over_mesh():
    """Always-on mesh MD: forward replica episodes sharded over devices.

    Cheap to compile (no grad-of-scan), so it stays in the default suite —
    the only other multi-device coverage (the grad test below) is
    slow-marked and the driver dryrun runs out-of-process.
    """
    from mythos_tpu.parallel import replica_run_fn

    n_bp = 4
    topology, body = _tiny_duplex(n_bp)
    energy_fn, sim = _build_sim(topology, KT, mode="dense")
    params = energy_fn.opt_params()

    def run_fn(opt_params, key):
        traj = sim.run(opt_params, body, 4, key).observables[0]
        return traj.center[-1]

    n_dev = min(len(jax.devices()), 8)
    mesh = make_mesh(n_dev)
    sharded = replica_run_fn(run_fn, mesh)
    keys = jax.random.split(jax.random.PRNGKey(3), n_dev)
    out = sharded(params, jax.random.key_data(keys))
    assert out.shape == (n_dev, topology.n_nucleotides, 3)
    assert bool(jnp.all(jnp.isfinite(out)))
    # replicas use distinct keys: final positions must differ across devices
    assert float(jnp.max(jnp.abs(out[0] - out[1]))) > 0.0
    # replica 0 must match a single-device replay with the same key
    ref = run_fn(params, keys[0])
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref), rtol=1e-5, atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs the virtual device mesh")
@pytest.mark.slow
def test_replica_grad_over_mesh():
    n_bp = 4
    topology, body = _tiny_duplex(n_bp)
    energy_fn, sim = _build_sim(topology, KT, mode="dense")
    params = energy_fn.opt_params()

    n = topology.n_nucleotides
    bps = jnp.array([[i, n - 1 - i] for i in range(n_bp)], dtype=jnp.int32)
    observable = PropellerTwist(
        rigid_body_transform_fn=dna1.default_transform_fn(), h_bonded_base_pairs=bps
    )

    def loss_fn(opt_params, key):
        traj = sim.run(opt_params, body, 4, key).observables[0]
        return jnp.mean((observable(traj) - 21.7) ** 2)

    n_dev = min(len(jax.devices()), 8)
    mesh = make_mesh(n_dev)
    grad_step = replica_grad_fn(loss_fn, mesh)
    keys = jax.random.split(jax.random.PRNGKey(7), n_dev)
    loss, grads = grad_step(params, jax.random.key_data(keys))
    assert np.isfinite(float(loss))
    for k, g in grads.items():
        assert bool(jnp.all(jnp.isfinite(g))), k
    # gradients are psum-averaged: identical on every... scalar already
    assert float(jnp.abs(grads["eps_stack_base"])) >= 0.0


def test_checkpoint_roundtrip(tmp_path):
    import optax

    from mythos_tpu.optimization.checkpoint import CheckpointManager
    from mythos_tpu.optimization.optimization import OptimizerState

    params = {"a": jnp.array(1.5), "b": jnp.array([2.0, 3.0])}
    opt = optax.adam(1e-3)
    state = OptimizerState(
        observables={}, component_state={}, optimizer_state=opt.init(params)
    )
    mgr = CheckpointManager(tmp_path, use_orbax=False)
    mgr.save(step=3, params=params, state=state, key=jax.random.PRNGKey(0))
    restored = mgr.restore()
    assert restored is not None
    step, r_params, r_state, _key = restored
    assert step == 3
    np.testing.assert_allclose(np.asarray(r_params["a"]), 1.5)
    np.testing.assert_allclose(np.asarray(r_params["b"]), [2.0, 3.0])
