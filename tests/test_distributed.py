"""Multi-host runtime: a real 2-process jax.distributed job on CPU.

The reference's analog is its Ray cluster path
(mythos/optimization/optimization.py:172-336): work distributed across
hosts. Here the whole program is SPMD; this test launches two OS processes
that join one jax.distributed job over localhost, build a global replica
mesh spanning both, and run a psum'd replica gradient step — the DCN story
docs/parallelism.md describes.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import jax

from mythos_tpu.parallel import initialize_distributed, make_mesh, replica_grad_fn

initialize_distributed(
    coordinator_address=os.environ["COORD"],
    num_processes=2,
    process_id=int(os.environ["PROC_ID"]),
)

import jax.numpy as jnp

assert jax.process_count() == 2, jax.process_count()
n = len(jax.devices())
assert n == 4, f"expected 4 global devices, got {n}"  # 2 local per process

mesh = make_mesh()  # spans both processes

# a REAL Langevin episode per replica (not a toy loss): 4-bp dna1 duplex,
# direct-diff of a trajectory statistic through the dynamics, psum'd over
# the cross-process mesh
import mythos_tpu.energy.dna1 as dna1
from __graft_entry__ import _build_sim, _tiny_duplex
from mythos_tpu.observables import PropellerTwist

kT = 296.15 * 0.1 / 300.0
n_bp = 4
topology, body = _tiny_duplex(n_bp)
energy_fn, sim = _build_sim(topology, kT, mode="dense")
params = energy_fn.opt_params()
nn = topology.n_nucleotides
bps = jnp.array([[i, nn - 1 - i] for i in range(n_bp)], dtype=jnp.int32)
observable = PropellerTwist(
    rigid_body_transform_fn=dna1.default_transform_fn(), h_bonded_base_pairs=bps
)


def loss_fn(opt_params, key):
    traj = sim.run(opt_params, body, 4, key).observables[0]
    return jnp.mean((observable(traj) - 21.7) ** 2)


grad_step = replica_grad_fn(loss_fn, mesh)
keys = jax.random.split(jax.random.PRNGKey(0), n)
loss, grads = grad_step(params, jax.random.key_data(keys))

assert jnp.isfinite(loss), loss
g = grads["eps_stack_base"]
assert jnp.all(jnp.isfinite(g)), g

# the psum'd gradient must equal the local mean over all 4 replica episodes
ref = jnp.mean(
    jnp.stack([jax.grad(loss_fn)(params, k)["eps_stack_base"] for k in keys])
)
assert abs(float(g) - float(ref)) < 1e-4, (g, ref)
print(f"proc {jax.process_index()}: loss={float(loss):.6f} OK", flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_replica_gradient(tmp_path):
    port = _free_port()
    env_base = dict(
        os.environ,
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2"
        " --xla_backend_optimization_level=0 --xla_llvm_disable_expensive_passes=true",
        COORD=f"127.0.0.1:{port}",
        JAX_ENABLE_X64="0",
    )
    env_base.pop("JAX_NUM_PROCESSES", None)
    procs = []
    for pid in range(2):
        env = dict(env_base, PROC_ID=str(pid))
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _WORKER],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert "OK" in out, out[-3000:]
