"""GROMACS input handling: .mdp files and preprocessed-topology parameters.

Parity reference: mythos/input/gromacs_input.py:63-370. Parameter keys are
the cross-framework contract:

* bonds:  ``bond_k_MOL_A_B`` / ``bond_r0_MOL_A_B``
* angles: ``angle_k_MOL_A_B_C`` / ``angle_theta0_MOL_A_B_C`` (radians
  internally; degrees in the file)
* LJ:     ``lj_sigma_T1_T2`` / ``lj_epsilon_T1_T2``

The topology walker below is one generator that yields classified lines;
parse and replace are two small consumers of the same stream (the reference
uses a stateful dual-mode class).
"""

from __future__ import annotations

import io
import logging
from collections.abc import Iterator
from pathlib import Path
from typing import TypeAlias

import numpy as np

logger = logging.getLogger(__name__)

ParamsDict: TypeAlias = dict[str, float]


# -- .mdp files --------------------------------------------------------------------


def _parse_value(value: str) -> str | float | int | bool:
    value = value.split(";", maxsplit=1)[0].strip()
    if not value:
        return ""
    for caster in (int, float):
        try:
            return caster(value)
        except ValueError:
            continue
    lowered = value.lower()
    if lowered in ("yes", "true", "on"):
        return True
    if lowered in ("no", "false", "off"):
        return False
    return value


def read_mdp(input_file: Path) -> dict[str, str | float | int | bool]:
    """Read a .mdp file (``;`` comments, ``-`` keys normalized to ``_``)."""
    parsed = {}
    with Path(input_file).open("r") as f:
        for raw_line in f:
            line = raw_line.strip()
            if not line or line.startswith(";"):
                continue
            if "=" in line:
                key, str_value = (v.strip() for v in line.split("=", 1))
                parsed[key.replace("-", "_")] = _parse_value(str_value)
    return parsed


def write_mdp_to(input_config: dict, f: io.TextIOWrapper) -> None:
    """Serialize a config dict in .mdp format (booleans become yes/no)."""
    for key, value in input_config.items():
        parsed = ("yes" if value else "no") if isinstance(value, bool) else str(value)
        f.write(f"{key.replace('-', '_')} = {parsed}\n")


def write_mdp(input_config: dict, input_file: Path) -> None:
    """Write a .mdp file."""
    with Path(input_file).open("w") as f:
        write_mdp_to(input_config, f)


def update_mdp_params(mdp_file: Path, params: dict, out_file: Path | None = None) -> None:
    """Merge params into an existing .mdp file (in place by default)."""
    config = read_mdp(mdp_file)
    config.update(params)
    write_mdp(config, out_file or mdp_file)


# -- preprocessed topology parameters -----------------------------------------------


class _Event:
    """One classified topology line."""

    __slots__ = ("kind", "line", "parts", "molname", "atom_names")

    def __init__(self, kind, line, parts=None, molname=None, atom_names=None):
        self.kind = kind
        self.line = line
        self.parts = parts
        self.molname = molname
        self.atom_names = atom_names


def _walk_topology(topology_file: Path) -> Iterator[_Event]:
    """Yield classified events for every line of a preprocessed topology."""
    bead_types: set[str] = set()
    section: str | None = None
    molname: str | None = None
    atom_names: dict[int, str] = {}

    with Path(topology_file).open("r") as f:
        for line in f:
            stripped = line.strip()
            if not stripped or stripped.startswith(";"):
                yield _Event("passthrough", line)
                continue

            if stripped.startswith("["):
                section = stripped.replace(" ", "").strip("[]").lower()
                if section == "moleculetype":
                    molname, atom_names = None, {}
                yield _Event("passthrough", line)
                continue

            parts = stripped.split()
            if section == "atomtypes":
                bead_types.add(parts[0])
                yield _Event("passthrough", line)
            elif section == "nonbond_params":
                if parts[0] not in bead_types or parts[1] not in bead_types:
                    raise ValueError(f"Unknown atom types in nonbond_params: {parts[0]}, {parts[1]}")
                yield _Event("nonbond", line, parts)
            elif section == "moleculetype" and molname is None:
                molname = parts[0]
                yield _Event("passthrough", line)
            elif molname is not None and section == "atoms":
                atom_names[int(parts[0])] = parts[4]
                yield _Event("passthrough", line)
            elif molname is not None and section == "bonds":
                names = (atom_names[int(parts[0])], atom_names[int(parts[1])])
                yield _Event("bond", line, parts, molname, names)
            elif molname is not None and section == "angles":
                names = tuple(atom_names[int(parts[i])] for i in range(3))
                yield _Event("angle", line, parts, molname, names)
            else:
                yield _Event("passthrough", line)


def read_params_from_topology(topology_file: Path) -> dict[str, ParamsDict]:
    """Extract structured parameters from a preprocessed topology."""
    bond_params: ParamsDict = {}
    angle_params: ParamsDict = {}
    nonbond_params: ParamsDict = {}

    for ev in _walk_topology(topology_file):
        if ev.kind == "bond":
            name = f"{ev.molname}_{ev.atom_names[0]}_{ev.atom_names[1]}"
            bond_params[f"bond_k_{name}"] = float(ev.parts[4])
            bond_params[f"bond_r0_{name}"] = float(ev.parts[3])
        elif ev.kind == "angle":
            name = f"{ev.molname}_{'_'.join(ev.atom_names)}"
            angle_params[f"angle_theta0_{name}"] = float(np.deg2rad(float(ev.parts[4])))
            angle_params[f"angle_k_{name}"] = float(ev.parts[5])
        elif ev.kind == "nonbond":
            pair = f"{ev.parts[0]}_{ev.parts[1]}"
            nonbond_params[f"lj_sigma_{pair}"] = float(ev.parts[3])
            nonbond_params[f"lj_epsilon_{pair}"] = float(ev.parts[4])

    return {
        "nonbond_params": nonbond_params,
        "bond_params": bond_params,
        "angle_params": angle_params,
    }


def replace_params_in_topology(topology_file: Path, params: ParamsDict, output_file: Path) -> None:
    """Rewrite a preprocessed topology with substituted parameter values.

    Lines whose parameters are not in ``params`` pass through unchanged;
    angle theta0 values convert radians -> degrees on the way out.
    """
    out_lines: list[str] = []
    for ev in _walk_topology(topology_file):
        if ev.kind == "bond":
            name = f"{ev.molname}_{ev.atom_names[0]}_{ev.atom_names[1]}"
            k = params.get(f"bond_k_{name}", float(ev.parts[4]))
            r0 = params.get(f"bond_r0_{name}", float(ev.parts[3]))
            out_lines.append(f"    {ev.parts[0]} {ev.parts[1]} {ev.parts[2]} {r0} {k}\n")
        elif ev.kind == "angle":
            name = f"{ev.molname}_{'_'.join(ev.atom_names)}"
            theta0_rad = params.get(f"angle_theta0_{name}", np.deg2rad(float(ev.parts[4])))
            theta0 = np.rad2deg(theta0_rad)
            k = params.get(f"angle_k_{name}", float(ev.parts[5]))
            out_lines.append(
                f"    {ev.parts[0]} {ev.parts[1]} {ev.parts[2]} {ev.parts[3]} {theta0} {k}\n"
            )
        elif ev.kind == "nonbond":
            pair = f"{ev.parts[0]}_{ev.parts[1]}"
            sigma = params.get(f"lj_sigma_{pair}", float(ev.parts[3]))
            epsilon = params.get(f"lj_epsilon_{pair}", float(ev.parts[4]))
            out_lines.append(f"    {ev.parts[0]} {ev.parts[1]} {ev.parts[2]} {sigma} {epsilon}\n")
        else:
            out_lines.append(ev.line)

    Path(output_file).write_text("".join(out_lines))
