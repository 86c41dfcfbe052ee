"""Mesh parallelism: replica batching and state-axis sharding.

This replaces the reference's Ray-based replica/task parallelism
(mythos/optimization/optimization.py:151-336) for the differentiable path:
independent simulators (seeds/temperatures) become one shard_mapped program
over a device mesh with psum gradient aggregation over ICI.
"""

from mythos_tpu.parallel.distributed import (
    initialize_distributed,
    is_distributed,
    shutdown_distributed,
)
from mythos_tpu.parallel.replica import (
    make_mesh,
    replica_grad_fn,
    replica_run_fn,
    sharded_energy_map,
)
from mythos_tpu.parallel.spatial import spatial_md_run_fn, spatial_unbonded_fns

__all__ = [
    "initialize_distributed",
    "is_distributed",
    "make_mesh",
    "replica_grad_fn",
    "replica_run_fn",
    "sharded_energy_map",
    "shutdown_distributed",
    "spatial_md_run_fn",
    "spatial_unbonded_fns",
]
