"""Aim experiment-tracking logger (optional dependency).

Parity reference: mythos/ui/loggers/aim.py:10-34.
"""

from __future__ import annotations

from mythos_tpu.ui.loggers.logger import Logger, Status, StatusKind


class AimLogger(Logger):
    """Stream metrics/statuses to an Aim run."""

    def __init__(self, repo: str | None = None, experiment: str | None = None, **run_kwargs):
        try:
            import aim
        except ImportError as e:  # pragma: no cover - optional dependency
            raise ImportError("AimLogger requires the 'aim' package") from e
        self.run = aim.Run(repo=repo, experiment=experiment, **run_kwargs)

    def log_metric(self, name: str, value: float, step: int) -> None:
        self.run.track(value, name=name, step=step)

    def update_status(self, name: str, kind: StatusKind, status: Status) -> None:
        self.run.track(status.value, name=f"status/{kind.name.lower()}/{name}")
