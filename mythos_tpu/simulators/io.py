"""Common simulator I/O: the SimulatorTrajectory currency.

Parity reference: mythos/simulators/io.py:18-213. A SimulatorTrajectory is a
stacked (S, N, ...) RigidBody with optional per-state box size, temperature
(kT, drives DiffTRe reweighting), and metadata arrays.
"""

from __future__ import annotations

from collections.abc import Callable
from pathlib import Path
from typing import Any

import chex
import jax.numpy as jnp
from jax.tree_util import tree_map

from mythos_tpu.io.trajectory import _write_state
from mythos_tpu.rigid_body import RigidBody, q_to_back_base, q_to_base_normal
from mythos_tpu.utils.helpers import tree_concatenate
from mythos_tpu.utils.types import ARR_OR_SCALAR, Arr, Vector3D


@chex.dataclass(frozen=True)
class SimulatorTrajectory(RigidBody):
    """Trajectory of simulation states (optionally a single state).

    Attributes:
        box_size: optional per-state box, shape (S, ...).
        temperature: optional per-state kT, shape (S,); beta = 1/kT feeds
            DiffTRe reweighting.
        metadata: optional dict of per-state arrays (leading axis S).
    """

    box_size: Arr | None = None
    temperature: Arr | None = None
    metadata: dict[str, Arr] | None = None

    @classmethod
    def from_rigid_body(cls, rigid_body: RigidBody, **kwargs: Any) -> "SimulatorTrajectory":
        """Wrap a stacked RigidBody."""
        return cls(center=rigid_body.center, orientation=rigid_body.orientation, **kwargs)

    def with_state_metadata(self, **metadata: dict[str, ARR_OR_SCALAR]) -> "SimulatorTrajectory":
        """Attach the same metadata value to every state."""
        new_metadata = dict(self.metadata) if self.metadata is not None else {}
        for key, value in metadata.items():
            new_metadata[key] = jnp.stack([jnp.asarray(value)] * self.length())
        return self.replace(metadata=new_metadata)

    def filter(self, filter_fn: Callable[[Any], Arr]) -> "SimulatorTrajectory":
        """Keep states where filter_fn(metadata) is True."""
        indices = jnp.where(filter_fn(self.metadata))[0]
        return self.slice(indices)

    def slice(self, key: int | slice | Arr | list) -> "SimulatorTrajectory":
        """Slice along the state axis (an int keeps a length-1 axis)."""
        if isinstance(key, int):
            key = slice(key, key + 1)
        if not isinstance(key, slice):
            key = jnp.asarray(key)

        opt = lambda x: None if x is None else x[key, ...]  # noqa: E731
        metadata = None if self.metadata is None else tree_map(lambda x: x[key, ...], self.metadata)
        return self.replace(
            center=self.center[key, ...],
            orientation=self.orientation[key, ...],
            box_size=opt(self.box_size),
            temperature=opt(self.temperature),
            metadata=metadata,
        )

    def length(self) -> int:
        """Number of states (chex.dataclass reserves __len__)."""
        return self.center.shape[0]

    @classmethod
    def concat(cls, trajectories: list["SimulatorTrajectory"]) -> "SimulatorTrajectory":
        """Concatenate along the state axis, NaN-filling missing metadata."""
        if not trajectories:
            raise ValueError("Cannot concatenate an empty list of trajectories.")
        if len(trajectories) == 1:
            return trajectories[0]

        box_size = _concat_optional_field([t.box_size for t in trajectories], "box sizes")
        temperature = _concat_optional_field([t.temperature for t in trajectories], "temperatures")
        metadata = _merge_metadata(
            [t.metadata for t in trajectories], [t.length() for t in trajectories]
        )

        return trajectories[0].replace(
            center=jnp.concatenate([t.center for t in trajectories], axis=0),
            orientation=jnp.concatenate([t.orientation for t in trajectories], axis=0),
            box_size=box_size,
            temperature=temperature,
            metadata=metadata,
        )

    def __add__(self, other: "SimulatorTrajectory") -> "SimulatorTrajectory":
        return self.__class__.concat([self, other])

    def to_file(self, filepath: Path, box_size: Vector3D = (0, 0, 0)) -> None:
        """Write to oxDNA text format (times synthesized, vel/energy zeroed)."""
        with Path(filepath).open("w") as f:
            for i in range(self.length()):
                coms = self.center[i]
                bb_vecs = q_to_back_base(self.orientation[i])
                base_norms = q_to_base_normal(self.orientation[i])
                dummy = jnp.zeros((coms.shape[0], 6))
                state = jnp.hstack([coms, bb_vecs, base_norms, dummy])
                box = self.box_size[i] if self.box_size is not None else box_size
                _write_state(f, time=float(i), energies=jnp.zeros(3), state=state, box_size=box)


def _concat_optional_field(values: list[Arr | None], label: str) -> Arr | None:
    if all(v is None for v in values):
        return None
    if any(v is None for v in values):
        raise ValueError(f"Cannot concatenate, trajectories have incompatible {label}.")
    return jnp.concatenate(values, axis=0)


def _merge_metadata(
    metadata_list: list[dict[str, Arr] | None], lengths: list[int]
) -> dict[str, Arr] | None:
    if all(not m for m in metadata_list):
        return None
    dicts = [dict(m) if m else {} for m in metadata_list]
    for key in {k for d in dicts for k in d}:
        present = [d[key] for d in dicts if key in d]
        shape = present[0].shape[1:]
        if any(p.shape[1:] != shape for p in present[1:]):
            raise ValueError(f"Metadata key '{key}' has mismatched shapes when adding trajectories.")
        for d, length in zip(dicts, lengths, strict=True):
            d.setdefault(key, jnp.full((length, *shape), jnp.nan))
    return tree_concatenate(dicts)
