"""Small pytree / subprocess helpers.

Parity reference: mythos/utils/helpers.py:19-96.
"""

from __future__ import annotations

import contextlib
import itertools
import subprocess
from collections import deque
from collections.abc import Iterable
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp

from mythos_tpu.utils.types import PyTree


def batched(iterable: Iterable[Any], n: int) -> Iterable[Any]:
    """Batch an iterable into chunks of size n (last chunk may be short)."""
    if n < 1:
        raise ValueError("n must be at least one")
    return itertools.batched(iterable, n)


def tree_stack(trees: list[PyTree]) -> PyTree:
    """Stack corresponding leaves along a new leading axis."""
    return jax.tree.map(lambda *v: jnp.stack(v), *trees)


def tree_concatenate(trees: list[PyTree]) -> PyTree:
    """Concatenate corresponding leaves along the first axis."""
    return jax.tree.map(lambda *v: jnp.concatenate(v), *trees)


def tail_file(path: Path, n: int = 10) -> str:
    """Last n lines of a text file."""
    buf = deque(maxlen=n)
    with Path(path).open("r") as f:
        for line in f:
            buf.append(line.rstrip("\n"))
    return "\n".join(buf)


def run_command(
    cmd: list[str],
    cwd: Path,
    log_prefix: str = "command-output",
    err_tail_lines: int = 20,
) -> None:
    """Run a subprocess, capturing stdout/stderr to log files in ``cwd``.

    On failure raises RuntimeError carrying the tail of both logs, so external
    engine failures (oxDNA/GROMACS/LAMMPS) surface with context.
    """
    out_file = Path(cwd) / f"{log_prefix}.out.log"
    err_file = Path(cwd) / f"{log_prefix}.err.log"
    try:
        with out_file.open("w") as f_out, err_file.open("w") as f_err:
            subprocess.check_call(cmd, cwd=cwd, shell=False, stdout=f_out, stderr=f_err)
    except subprocess.CalledProcessError as e:
        raise RuntimeError(
            f"Command {cmd} failed with exit code {e.returncode}.\n"
            f"  Last {err_tail_lines} lines of stdout:\n{tail_file(out_file, err_tail_lines)}\n"
            f"  Last {err_tail_lines} lines of stderr:\n{tail_file(err_file, err_tail_lines)}\n"
        ) from e


def try_to_float(value: Any) -> float | None:
    """float(value) or None."""
    with contextlib.suppress(Exception):
        return float(value)
    return None
