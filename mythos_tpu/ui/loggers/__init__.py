"""Loggers: metric streaming and status tracking for optimization runs.

PlotlyLogger/JupyterLogger/AimLogger live in their own modules (optional
dependencies; import them explicitly).
"""

from mythos_tpu.ui.loggers.logger import Logger, NullLogger, Status, StatusKind
from mythos_tpu.ui.loggers.sinks import (
    ConsoleLogger,
    DiskLogger,
    FileLogger,
    MultiLogger,
    PerMetricFileLogger,
)

__all__ = [
    "ConsoleLogger",
    "DiskLogger",
    "FileLogger",
    "Logger",
    "MultiLogger",
    "NullLogger",
    "PerMetricFileLogger",
    "Status",
    "StatusKind",
]
