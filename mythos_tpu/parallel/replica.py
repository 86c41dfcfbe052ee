"""Replica parallelism over a jax.sharding.Mesh.

The reference runs replica simulators as Ray remote tasks and aggregates
gradients driver-side (mythos/optimization/optimization.py:151-169,321-335).
On TPU the same workload is one SPMD program: the replica axis is a mesh
axis, each device integrates its own replica (own PRNG key / temperature),
and gradients are combined with an ICI psum. No object store, no host
round-trips inside the loop.
"""

from __future__ import annotations

from collections.abc import Callable
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

shard_map = jax.shard_map

from mythos_tpu.utils.types import Arr, Params, PyTree

REPLICA_AXIS = "replica"


def make_mesh(n_devices: int | None = None, axis: str = REPLICA_AXIS) -> Mesh:
    """1-D device mesh over the first n_devices (default: all)."""
    devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.array(devices), (axis,))


def replica_run_fn(
    run_fn: Callable[[Params, Arr], PyTree],
    mesh: Mesh,
    axis: str = REPLICA_AXIS,
) -> Callable[[Params, Arr], PyTree]:
    """SPMD-batch ``run_fn(params, key) -> pytree`` over replica keys.

    ``keys`` has shape (n_replicas, 2) (raw PRNG key data), sharded over the
    replica axis; outputs come back stacked with a leading replica axis.
    """

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    def sharded(params: Params, keys: Arr) -> PyTree:
        out = run_fn(params, keys[0])
        return jax.tree.map(lambda x: jnp.expand_dims(x, 0), out)

    return jax.jit(sharded)


def replica_grad_fn(
    loss_fn: Callable[[Params, Arr], Arr],
    mesh: Mesh,
    axis: str = REPLICA_AXIS,
) -> Callable[[Params, Arr], tuple[Arr, Params]]:
    """Mean loss and psum-averaged gradient over replicas.

    ``loss_fn(params, key) -> scalar`` runs independently per device (e.g. a
    full simulate-and-measure episode); the returned function computes
    (mean loss, mean grads) with gradient aggregation riding ICI.
    """

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def sharded(params: Params, keys: Arr) -> tuple[Arr, Params]:
        loss, grads = jax.value_and_grad(loss_fn)(params, keys[0])
        loss = jax.lax.pmean(loss, axis)
        grads = jax.tree.map(lambda g: jax.lax.pmean(g, axis), grads)
        return loss, grads

    return jax.jit(sharded)


def sharded_energy_map(
    energy_fn: Callable,
    mesh: Mesh,
    axis: str = REPLICA_AXIS,
) -> Callable:
    """Shard ``EnergyFunction.map`` over the trajectory-state axis.

    The DiffTRe hot path re-evaluates energies over all reference states
    (mythos/energy/base.py:90-93 in the reference); states shard trivially,
    each device maps its slice, results gather back. State count must divide
    the mesh size (pad upstream if needed).
    """

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis),),
        out_specs=P(axis),
        check_vma=False,
    )
    def sharded(states: PyTree) -> Arr:
        return energy_fn.map(states)

    return jax.jit(sharded)
