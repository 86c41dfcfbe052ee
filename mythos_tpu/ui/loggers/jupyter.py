"""Live Jupyter loggers (plotly FigureWidget grid + status panel).

Parity reference: mythos/ui/loggers/jupyter.py:1-286. plotly/ipywidgets are
optional: construction raises a clear ImportError when they're absent, and
everything degrades to in-memory history (inspectable in tests/headless).
"""

from __future__ import annotations

from collections import defaultdict

from mythos_tpu.ui.loggers.logger import Logger, Status, StatusKind

ERR_PLOTLY_REQUIRED = (
    "PlotlyLogger/JupyterLogger require plotly (and ipywidgets for the status "
    "panel); install them or use ConsoleLogger/DiskLogger."
)


class MetricHistory:
    """In-memory metric series: name -> (steps, values)."""

    def __init__(self) -> None:
        self.series: dict[str, tuple[list[int], list[float]]] = defaultdict(lambda: ([], []))

    def add(self, name: str, value: float, step: int) -> None:
        steps, values = self.series[name]
        steps.append(step)
        values.append(value)


class PlotlyLogger(Logger):
    """Live plotly FigureWidget subplot grid, one subplot per metric."""

    def __init__(self, n_cols: int = 2, height_per_row: int = 260) -> None:
        try:
            import plotly.graph_objects as go  # noqa: F401
            from plotly.subplots import make_subplots  # noqa: F401
        except ImportError as e:
            raise ImportError(ERR_PLOTLY_REQUIRED) from e
        self.n_cols = n_cols
        self.height_per_row = height_per_row
        self.history = MetricHistory()
        self._fig = None
        self._trace_idx: dict[str, int] = {}

    def _rebuild_figure(self) -> None:
        import plotly.graph_objects as go
        from plotly.subplots import make_subplots

        names = list(self.history.series)
        n_rows = max(1, -(-len(names) // self.n_cols))
        fig = make_subplots(rows=n_rows, cols=self.n_cols, subplot_titles=names)
        for i, name in enumerate(names):
            steps, values = self.history.series[name]
            fig.add_trace(
                go.Scatter(x=steps, y=values, name=name, mode="lines"),
                row=i // self.n_cols + 1,
                col=i % self.n_cols + 1,
            )
            self._trace_idx[name] = i
        fig.update_layout(height=n_rows * self.height_per_row, showlegend=False)
        self._fig = go.FigureWidget(fig)

    def display(self):
        """Return the live figure widget for notebook display."""
        if self._fig is None:
            self._rebuild_figure()
        return self._fig

    def log_metric(self, name: str, value: float, step: int) -> None:
        new_metric = name not in self.history.series
        self.history.add(name, value, step)
        if self._fig is None or new_metric:
            self._rebuild_figure()
        else:
            steps, values = self.history.series[name]
            with self._fig.batch_update():
                trace = self._fig.data[self._trace_idx[name]]
                trace.x = tuple(steps)
                trace.y = tuple(values)

    def update_status(self, name: str, kind: StatusKind, status: Status) -> None:
        """Plot-only logger; statuses are ignored."""


class JupyterLogger(PlotlyLogger):
    """PlotlyLogger plus an ipywidgets status panel and progress bar."""

    def __init__(self, n_steps: int | None = None, n_cols: int = 2) -> None:
        super().__init__(n_cols=n_cols)
        try:
            import ipywidgets  # noqa: F401
        except ImportError as e:
            raise ImportError(ERR_PLOTLY_REQUIRED) from e
        self.n_steps = n_steps
        self.statuses: dict[tuple[StatusKind, str], Status] = {}
        self._panel = None
        self._progress = None

    def display(self):
        """Return a VBox of (status panel, progress bar, figure grid)."""
        import ipywidgets as widgets

        if self._fig is None:
            self._rebuild_figure()
        self._panel = widgets.HTML(value=self._status_html())
        self._progress = widgets.IntProgress(
            value=0, min=0, max=self.n_steps or 1, description="steps"
        )
        return widgets.VBox([self._panel, self._progress, self._fig])

    def _status_html(self) -> str:
        rows = "".join(
            f"<tr><td>{kind.name.lower()}</td><td>{name}</td><td>{status.name}</td></tr>"
            for (kind, name), status in sorted(self.statuses.items(), key=lambda kv: str(kv[0]))
        )
        return f"<table><tr><th>kind</th><th>name</th><th>status</th></tr>{rows}</table>"

    def log_metric(self, name: str, value: float, step: int) -> None:
        super().log_metric(name, value, step)
        if self._progress is not None:
            self._progress.value = max(self._progress.value, step + 1)

    def update_status(self, name: str, kind: StatusKind, status: Status) -> None:
        self.statuses[(kind, name)] = status
        if self._panel is not None:
            self._panel.value = self._status_html()
