"""Logger sink tests (reference parity: mythos/ui/loggers)."""

import pytest

from mythos_tpu.ui.loggers import (
    ConsoleLogger,
    FileLogger,
    MultiLogger,
    NullLogger,
    PerMetricFileLogger,
)
from mythos_tpu.ui.loggers.logger import Status, StatusKind


def test_null_logger_noops():
    lg = NullLogger()
    lg.log_metric("a.b", 1.0, 0)
    lg.set_simulator_started("sim")
    lg.set_objective_complete("obj")


def test_status_api_generated_methods():
    lg = NullLogger()
    for kind in ("simulator", "objective", "observable"):
        assert hasattr(lg, f"update_{kind}_status")
        for status in ("started", "running", "complete", "error"):
            assert hasattr(lg, f"set_{kind}_{status}"), f"set_{kind}_{status}"


def test_console_logger(capsys):
    lg = ConsoleLogger()
    lg.log_metric("loss", 0.5, step=3)
    lg.set_simulator_started("sim0")
    out = capsys.readouterr().out
    assert "loss" in out and "0.5" in out


def test_file_logger_appends_csv(tmp_path):
    f = tmp_path / "log.csv"
    lg = FileLogger(f)
    lg.log_metric("loss", 1.25, step=0)
    lg.log_metric("loss", 1.0, step=1)
    lines = f.read_text().strip().splitlines()
    assert len(lines) == 2
    assert "loss" in lines[0] and "1.25" in lines[0]


def test_per_metric_file_logger(tmp_path):
    lg = PerMetricFileLogger(tmp_path)
    lg.log_metric("sim.PropellerTwist", 21.7, step=0)
    lg.log_metric("loss", 0.1, step=0)
    files = sorted(p.name for p in tmp_path.iterdir())
    assert len(files) == 2


def test_multi_logger_fans_out(tmp_path):
    f1, f2 = tmp_path / "a.csv", tmp_path / "b.csv"
    lg = MultiLogger([FileLogger(f1), FileLogger(f2)])
    lg.log_metric("m", 2.0, step=0)
    lg.set_simulator_error("sim")
    assert "m" in f1.read_text() and "m" in f2.read_text()


def test_update_status_roundtrip():
    events = []

    class Rec(NullLogger):
        def update_status(self, name, kind, status):
            events.append((name, kind, status))

    lg = Rec()
    lg.set_objective_running("obj1")
    assert events == [("obj1", StatusKind.OBJECTIVE, Status.RUNNING)]
