"""Multi-host (DCN) runtime initialization.

The reference scales across hosts by launching a Ray cluster and shipping
simulator tasks to remote workers (mythos/optimization/optimization.py:172-336).
The TPU-native equivalent is one SPMD program spanning hosts: each host
process calls :func:`initialize_distributed` at startup, after which
``jax.devices()`` is the GLOBAL device list and the existing mesh helpers
(:func:`mythos_tpu.parallel.make_mesh`) span DCN transparently -- the
replica axis is laid out process-major, so ``psum``/``pmean`` collectives
reduce within a host over ICI first and across hosts over DCN.

Launch pattern (one process per host)::

    # host 0                                # host k
    initialize_distributed(                 initialize_distributed(
        "10.0.0.1:8476", num_processes=N,       "10.0.0.1:8476", num_processes=N,
        process_id=0)                           process_id=k)
    mesh = make_mesh()                      mesh = make_mesh()
    step = replica_grad_fn(loss, mesh)      step = replica_grad_fn(loss, mesh)

On Cloud TPU pods the arguments may all be omitted: ``jax.distributed``
auto-discovers the coordinator and process topology from the TPU metadata
(it also honors the standard ``JAX_COORDINATOR_ADDRESS`` /
``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID`` environment variables).
"""

from __future__ import annotations

import jax

_initialized = False


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids: list[int] | None = None,
) -> None:
    """Join the multi-host runtime (idempotent wrapper of jax.distributed).

    Must run before any other JAX call in the process (platform selection
    freezes on first use). After it returns, ``jax.devices()`` lists every
    device in the job and ``jax.process_index()`` identifies this host.

    Args:
        coordinator_address: ``"host:port"`` of process 0. ``None`` on
            environments that support auto-discovery (Cloud TPU pods) or
            when ``JAX_COORDINATOR_ADDRESS`` is set.
        num_processes: total host processes in the job.
        process_id: this process's rank in ``[0, num_processes)``.
        local_device_ids: restrict this process to a subset of its local
            devices (e.g. one process per chip layouts).
    """
    global _initialized
    if _initialized:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True


def is_distributed() -> bool:
    """True once initialize_distributed has joined this process to a job."""
    return _initialized


def shutdown_distributed() -> None:
    """Leave the multi-host runtime (test teardown / clean exit)."""
    global _initialized
    if _initialized:
        jax.distributed.shutdown()
        _initialized = False
