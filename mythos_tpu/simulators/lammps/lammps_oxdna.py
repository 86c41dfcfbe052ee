"""Wrapper around LAMMPS' CG-DNA (oxDNA/oxDNA2) package.

Parity reference: mythos/simulators/lammps/lammps_oxdna.py:21-437. Parameter
injection positionally rewrites ``pair_coeff``/``bond_coeff`` lines using the
per-style argument orderings below (the interop contract with LAMMPS' input
grammar, including its theta7/theta8 and theta2/theta3 swaps); the dump parser
converts LAMMPS units and quaternions back to oxDNA (a1, a3) rows.

Note: BondedExcludedVolume must be excluded from energy functions used here;
LAMMPS' oxDNA styles do not implement it compatibly.
"""

from __future__ import annotations

import re
from dataclasses import field
from pathlib import Path
from typing import Any

import chex
import jax.numpy as jnp
import numpy as np

from mythos_tpu.energy.base import EnergyFunction
from mythos_tpu.io.trajectory import NucleotideState, Trajectory, validate_box_size
from mythos_tpu.simulators.base import InputDirSimulator, SimulatorOutput
from mythos_tpu.simulators.io import SimulatorTrajectory
from mythos_tpu.utils.helpers import run_command
from mythos_tpu.utils.types import Params

# LAMMPS velocity/angular momentum unit conversions to oxDNA reduced units
VEL_SCALE = np.sqrt(3.1575)
ANGMOM_SCALE = 1.0 / np.sqrt(0.435179)

LAMMPS_REQUIRED_FIELDS = {
    "x", "y", "z",
    "vx", "vy", "vz",
    "c_quat[1]", "c_quat[2]", "c_quat[3]", "c_quat[4]",
    "angmomx", "angmomy", "angmomz",
}

# f4-theta blocks appear as (a, theta0, delta_theta_star) triplets
def _theta(term: str, k: int) -> tuple[str, str, str]:
    return (f"a_{term}_{k}", f"theta0_{term}_{k}", f"delta_theta_star_{term}_{k}")


def _hbond_args(eps: str | None, *, swap78: bool) -> tuple:
    """oxdna/hbond argument order; generic entries swap theta7/theta8."""
    t7, t8 = _theta("hb", 7), _theta("hb", 8)
    first, second = (t8, t7) if swap78 else (t7, t8)
    return (
        None,
        eps if eps else "HYDR_F1",  # generic row has no eps replacement
        "a_hb", "dr0_hb", "dr_c_hb", "dr_low_hb", "dr_high_hb",
        *_theta("hb", 1), *_theta("hb", 2), *_theta("hb", 3), *_theta("hb", 4),
        *first, *second,
    )


REPLACEMENT_MAP: dict[str, tuple] = {
    "bond_coeff *": ("eps_backbone", "delta_backbone", "r0_backbone"),
    "pair_coeff * * oxdna/excv": (
        "eps_exc", "sigma_backbone", "dr_star_backbone",
        "eps_exc", "sigma_back_base", "dr_star_back_base",
        "eps_exc", "sigma_base", "dr_star_base",
    ),
    "pair_coeff * * oxdna/stk": (
        None, None,
        "eps_stack_base", "eps_stack_kt_coeff",
        "a_stack", "dr0_stack", "dr_c_stack", "dr_low_stack", "dr_high_stack",
        *_theta("stack", 4), *_theta("stack", 5), *_theta("stack", 6),
        "a_stack_1", "neg_cos_phi1_star_stack",
        "a_stack_2", "neg_cos_phi2_star_stack",
    ),
    "pair_coeff * * oxdna/hbond": _hbond_args(None, swap78=True),
    "pair_coeff 1 4 oxdna/hbond": _hbond_args("eps_hb", swap78=True),
    "pair_coeff 2 3 oxdna/hbond": _hbond_args("eps_hb", swap78=False),
    "pair_coeff * * oxdna/xstk": (
        "k_cross", "r0_cross", "dr_c_cross", "dr_low_cross", "dr_high_cross",
        *_theta("cross", 1),
        *_theta("cross", 3),  # 3 and 2 swapped in the LAMMPS input grammar
        *_theta("cross", 2),
        *_theta("cross", 4),
        *_theta("cross", 8),  # 8 and 7 swapped in the LAMMPS input grammar
        *_theta("cross", 7),
    ),
    "pair_coeff * * oxdna/coaxstk": (
        "k_coax", "dr0_coax", "dr_c_coax", "dr_low_coax", "dr_high_coax",
        *_theta("coax", 1), *_theta("coax", 4), *_theta("coax", 5), *_theta("coax", 6),
        "a_coax_3p", "cos_phi3_star_coax",
        "a_coax_4p", "cos_phi4_star_coax",
    ),
}
# oxdna2 styles share orderings except coaxial stacking (f6 form) and Debye
REPLACEMENT_MAP = {
    **REPLACEMENT_MAP,
    **{k.replace("oxdna/", "oxdna2/"): v for k, v in REPLACEMENT_MAP.items() if "oxdna/" in k},
    "pair_coeff * * oxdna2/coaxstk": (
        "k_coax", "dr0_coax", "dr_c_coax", "dr_low_coax", "dr_high_coax",
        *_theta("coax", 1), *_theta("coax", 4), *_theta("coax", 5), *_theta("coax", 6),
        "a_coax_1_f6", "b_coax_1_f6",
    ),
    "pair_coeff * * oxdna2/dh": (None, "salt_conc", "q_eff"),
}


def _transform_param(param: str, value: float) -> float:
    # LAMMPS stores the phi star values un-negated
    if param in ("neg_cos_phi1_star_stack", "neg_cos_phi2_star_stack"):
        return -value
    return value


@chex.dataclass(frozen=True, kw_only=True)
class LAMMPSoxDNASimulator(InputDirSimulator):  # noqa: N801 - domain naming
    """Run LAMMPS' oxDNA model via the ``lmp`` binary."""

    energy_fn: EnergyFunction
    input_file_name: str = "input"
    variables: dict[str, Any] = field(default_factory=dict)
    temperature_variable: str = "kt"

    def __post_init__(self) -> None:
        if not (Path(self.input_dir) / self.input_file_name).is_file():
            raise FileNotFoundError(f"LAMMPS input file not found: {self.input_file_name}")

    def run_simulation(self, input_dir: Path, params: Params, seed: int | None = None) -> SimulatorOutput:
        """Rewrite coefficients/variables, run lmp, parse the dump."""
        self._replace_parameters(input_dir, params, seed)
        run_command(["lmp", "-in", self.input_file_name], cwd=input_dir, log_prefix="lammps")
        traj = _read_lammps_output(input_dir.joinpath("trajectory.dat"))

        temperature = None
        if (kt := self.variables.get(self.temperature_variable)) is not None:
            n_states = traj.state_rigid_body.center.shape[0]
            temperature = jnp.full(n_states, float(kt))

        return SimulatorOutput(
            observables=[
                SimulatorTrajectory.from_rigid_body(traj.state_rigid_body, temperature=temperature)
            ]
        )

    def _replace_parameters(self, input_dir: Path, params: Params, seed: int | None) -> None:
        updated = self.energy_fn.with_params(params).params_dict(exclude_non_optimizable=True)
        input_path = input_dir.joinpath(self.input_file_name)
        new_lines = _lammps_oxdna_replace_inputs(
            input_path.read_text().splitlines(), updated, seed, variables=self.variables
        )
        input_path.write_text("\n".join(new_lines))


def _lammps_oxdna_replace_inputs(
    input_lines: list[str],
    params: dict[str, float],
    seed: int | None,
    variables: dict[str, Any] | None = None,
) -> list[str]:
    """Rewrite variable and coefficient lines; validate the required dump."""
    variable_replacements = {
        "seed": seed or np.random.default_rng().integers(0, 2**24),
        **(variables or {}),
    }
    new_lines: list[str] = []
    dump_found = False
    multiline_buffer = ""

    for input_l in input_lines:
        line = re.sub(r"\s+", " ", input_l.strip())
        if line.endswith("&"):
            multiline_buffer += line.removesuffix("&") + " "
            continue
        if multiline_buffer:
            line = multiline_buffer + line
            multiline_buffer = ""

        if line.startswith("variable "):
            var = line.split()[1]
            if var in variable_replacements:
                line = f"variable {var} equal {variable_replacements.pop(var)}"
        elif line.startswith("dump "):
            parts = line.split()
            if len(parts) > 6 and parts[5] == "trajectory.dat" and LAMMPS_REQUIRED_FIELDS.issubset(set(parts[6:])):
                dump_found = True

        for key, replacements in REPLACEMENT_MAP.items():
            if line.startswith(key):
                line = f"{key} {_replace_parts_in_line(line.removeprefix(key), replacements, params)}"

        new_lines.append(line)

    if not dump_found:
        raise ValueError(
            f"Required dump not found. Must dump to trajectory.dat fields {LAMMPS_REQUIRED_FIELDS}."
        )
    if variable_replacements:
        raise ValueError("Missing variable for replacements: " + ", ".join(variable_replacements))
    return new_lines


def _replace_parts_in_line(inputs: str, replacements: tuple, params: dict[str, float]) -> str:
    parts = inputs.split()

    def repl(part: str, replacement: str | None) -> str:
        if replacement is None or replacement not in params:
            return part
        return f"{_transform_param(replacement, params[replacement]):f}"

    return " ".join(repl(p, r) for p, r in zip(parts, replacements, strict=True))


def _transform_lammps_quat(quat: np.ndarray) -> np.ndarray:
    """Quaternion -> (a1, a3) frame rows in oxDNA convention."""
    q2 = quat**2
    inv = 1.0 / q2.sum()
    a1 = np.array(
        [
            (q2[0] + q2[1] - q2[2] - q2[3]),
            2 * (quat[1] * quat[2] + quat[0] * quat[3]),
            2 * (quat[1] * quat[3] - quat[0] * quat[2]),
        ]
    )
    a3 = np.array(
        [
            2 * (quat[1] * quat[3] + quat[0] * quat[2]),
            2 * (quat[2] * quat[3] - quat[0] * quat[1]),
            (q2[0] + q2[3] - q2[1] - q2[2]),
        ]
    )
    return np.concatenate([a1, a3]) * inv


def _transform_lammps_state(state: np.ndarray, fields: list[str]) -> np.ndarray:
    """One dump row -> oxDNA 15-column row (com, a1, a3, v, L)."""

    def get(*names: str) -> np.ndarray:
        return state[[fields.index(n) for n in names]]

    pos = get("x", "y", "z")
    vel = get("vx", "vy", "vz") * VEL_SCALE
    quat = get("c_quat[1]", "c_quat[2]", "c_quat[3]", "c_quat[4]")
    angmom = get("angmomx", "angmomy", "angmomz") * ANGMOM_SCALE
    return np.concatenate([pos, _transform_lammps_quat(quat), vel, angmom])


def _read_lammps_output(output_file: Path) -> Trajectory:
    """Parse a LAMMPS custom dump (quaternion fields required)."""
    ts: list[float] = []
    bs: list[np.ndarray] = []
    states: list[np.ndarray] = []
    num_atoms: int | None = None

    with Path(output_file).open() as f:
        for line in f:
            if line.startswith("ITEM: TIMESTEP"):
                t = float(next(f))
                if t == 0:  # skip initial frame
                    continue
                ts.append(t)
            if not ts:
                continue
            if line.startswith("ITEM: NUMBER OF ATOMS") and num_atoms is None:
                num_atoms = int(next(f))
            elif line.startswith("ITEM: BOX BOUNDS"):
                bounds = " ".join(next(f).replace("\n", " ") for _ in range(3))
                bx1, bx2, by1, by2, bz1, bz2 = np.fromstring(bounds, dtype=np.float64, sep=" ")
                bs.append(np.array([bx2 - bx1, by2 - by1, bz2 - bz1]))
            elif line.startswith("ITEM: ATOMS"):
                state_fields = line[12:].strip().split()
                if LAMMPS_REQUIRED_FIELDS - set(state_fields):
                    raise ValueError("LAMMPS output file missing required fields.")
                states.append(
                    np.array(
                        [
                            _transform_lammps_state(
                                np.fromstring(next(f), dtype=np.float64, sep=" "), state_fields
                            )
                            for _ in range(num_atoms)
                        ]
                    )
                )

    validate_box_size(np.array(bs))

    return Trajectory(
        n_nucleotides=num_atoms,
        strand_lengths=[num_atoms],  # strand structure is not recoverable from the dump
        times=np.array(ts, dtype=np.float64),
        energies=np.zeros((len(ts), 3), dtype=np.float64),
        states=[NucleotideState(array=s) for s in states],
    )
