"""TOML parameter-file loading with sympy-evaluated expressions.

Parity reference: mythos/input/toml.py:21-57. String leaves like
``"296.15 * 0.1 / 300.0"`` or ``"pi / 2"`` evaluate to floats (32 digits).
"""

from __future__ import annotations

import tomllib
from pathlib import Path
from typing import Any

import jax
import numpy as np
import sympy

SYMPY_EVAL_N = 32

ERR_MISSING_TOML_ENTRY = "Missing entry {entry} in TOML file"


def parse_str(value: str) -> str | float:
    """Parse a string to a float, trying a sympy expression as fallback."""
    try:
        return float(value)
    except ValueError:
        try:
            return float(sympy.parse_expr(value).evalf(n=SYMPY_EVAL_N))
        except (AttributeError, TypeError, ValueError, SyntaxError):
            return value


def parse_value(value: Any) -> Any:
    """Parse a leaf value: strings via parse_str, float lists to arrays."""
    if isinstance(value, str):
        return parse_str(value)
    if isinstance(value, list):
        leaves = jax.tree_util.tree_leaves(value)
        if all(isinstance(x, str) for x in leaves):
            return jax.tree_util.tree_map(parse_str, value)
        if all(isinstance(x, float) for x in leaves):
            return np.array(value)
    return value


def parse_toml(file_path: Path | str, key: str | None = None) -> dict[str, Any]:
    """Load a TOML file, evaluating expression-valued leaves."""
    with Path(file_path).open("rb") as f:
        config = tomllib.load(f)

    if key is not None:
        if key not in config:
            raise ValueError(ERR_MISSING_TOML_ENTRY.format(entry=key))
        config = config[key]

    return jax.tree_util.tree_map(
        parse_value, config, is_leaf=lambda x: isinstance(x, (str, float, list))
    )
