"""Default-configuration loading for the model packages.

Parity reference: mythos/energy/utils.py:135-148 (``default_configs_for``).
Each model package (dna1/dna2/rna2/na1) ships ``defaults/simulation.toml``
and ``defaults/energy.toml`` next to its code.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp

from mythos_tpu.io import toml
from mythos_tpu.utils.types import PyTree

_ENERGY_DIR = Path(__file__).parent


def default_configs_for(model: str) -> tuple[PyTree, PyTree]:
    """(simulation_config, energy_config) parsed from the model's defaults."""
    config_dir = _ENERGY_DIR / model / "defaults"

    def cast_f(x):
        return jnp.asarray(x, dtype=jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)

    sim_path = config_dir / "simulation.toml"
    sim_config = jax.tree.map(cast_f, toml.parse_toml(sim_path)) if sim_path.exists() else {}
    return sim_config, jax.tree.map(cast_f, toml.parse_toml(config_dir / "energy.toml"))
