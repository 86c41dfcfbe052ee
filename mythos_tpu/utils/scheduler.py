"""Engine-agnostic scheduler hints.

Parity reference: mythos/utils/scheduler.py:14-75. In the TPU build the
differentiable path runs in-process over a device mesh, but external-engine
workflows (oxDNA/GROMACS/LAMMPS wrappers) still schedule host tasks; hints
translate to whatever executor backs them (thread/process pool, or a cluster
engine if one is attached).
"""

from __future__ import annotations

from dataclasses import field
from typing import Any

import chex


@chex.dataclass(frozen=True, kw_only=True)
class SchedulerHints:
    """Resource requirements and scheduling preferences.

    ``custom`` holds engine-specific options keyed by engine name, e.g.
    ``{"pool": {"priority": 3}}``.
    """

    num_cpus: int | None = None
    num_gpus: float | None = None
    num_tpus: float | None = None
    mem_mb: int | None = None
    max_retries: int | None = None
    custom: dict[str, dict[str, Any]] = field(default_factory=dict)

    def to_dict(self, engine: str, rewrite_options: dict[str, str] | None = None) -> dict[str, Any]:
        """Translate to an engine-specific option dict."""
        rewrite_options = rewrite_options or {}
        options = {
            rewrite_options.get(k, k): v
            for k, v in self.items()
            if v is not None and k != "custom"
        }
        return {**options, **self.custom.get(engine, {})}


@chex.dataclass(frozen=True, kw_only=True)
class SchedulerUnit:
    """Mixin carried by every Simulator and Objective."""

    scheduler_hints: SchedulerHints | None = None
