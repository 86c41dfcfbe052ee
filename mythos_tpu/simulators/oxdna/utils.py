"""oxDNA interop utilities: model.h parameter export, output readers.

Parity reference: mythos/simulators/oxdna/utils.py:23-429. The
framework-parameter -> oxDNA ``model.h`` macro map is the interop contract
(validation backend: the standalone C++/CUDA oxDNA engine compiles parameters
into the binary).
"""

from __future__ import annotations

import datetime
from functools import reduce
from operator import or_
from pathlib import Path

import jax
import jax.numpy as jnp
import pandas as pd
import sympy

from mythos_tpu.io import oxdna_input, topology, trajectory
from mythos_tpu.io.trajectory import Trajectory
from mythos_tpu.utils.types import Params, PathOrStr, oxDNAFormat

ERR_CANNOT_PROCESS_SRC_H = "Cannot process src/model.h file. Failed parsing: {}"
ERR_INVALID_HEADER_TYPE = "Invalid header value variable {} with value {}"

SYMPY_EVAL_N = 32
_MIN_HEADER_TOKENS = 3


def _mapper() -> dict[str, str]:
    """Build the param-name -> model.h macro map from systematic patterns.

    The oxDNA macros follow a regular grammar per term (radial constants,
    f4 theta blocks as {A, T0, TS, B, TC}, f5 phi blocks as {A, XS, B, XC});
    generating them keeps the ~130-entry contract auditable.
    """
    m: dict[str, str] = {
        # fene
        "eps_backbone": "FENE_EPS",
        "delta_backbone": "FENE_DELTA",
        "r0_backbone": "FENE_R0_OXDNA",
        # excluded volume (site order: backbone, base, back-base, base-back)
        "eps_exc": "EXCL_EPS",
    }
    for i, site in enumerate(("backbone", "base", "back_base", "base_back"), start=1):
        m[f"sigma_{site}"] = f"EXCL_S{i}"
        m[f"dr_star_{site}"] = f"EXCL_R{i}"
        m[f"b_{site}"] = f"EXCL_B{i}"
        m[f"dr_c_{site}"] = f"EXCL_RC{i}"

    def radial(term: str, macro: str, *, morse: bool, eps_suffix: str = "") -> None:
        if morse:
            m[f"a_{term}"] = f"{macro}_A"
            m[f"dr0_{term}"] = f"{macro}_R0"
        else:
            m[f"k_{term}"] = f"{macro}_K{eps_suffix}"
            m[f"dr0_{term}" if term == "coax" else f"r0_{term}"] = f"{macro}_R0"
        m[f"dr_c_{term}"] = f"{macro}_RC"
        m[f"dr_low_{term}"] = f"{macro}_RLOW"
        m[f"dr_high_{term}"] = f"{macro}_RHIGH"
        m[f"b_low_{term}"] = f"{macro}_BLOW"
        m[f"b_high_{term}"] = f"{macro}_BHIGH"
        m[f"dr_c_low_{term}"] = f"{macro}_RCLOW"
        m[f"dr_c_high_{term}"] = f"{macro}_RCHIGH"

    def theta(term: str, macro: str, k: int, t0_suffix: str = "") -> None:
        m[f"a_{term}_{k}"] = f"{macro}_THETA{k}_A"
        m[f"theta0_{term}_{k}"] = f"{macro}_THETA{k}_T0{t0_suffix}"
        m[f"delta_theta_star_{term}_{k}"] = f"{macro}_THETA{k}_TS"
        m[f"b_{term}_{k}"] = f"{macro}_THETA{k}_B"
        m[f"delta_theta_{term}_{k}_c"] = f"{macro}_THETA{k}_TC"

    # stacking
    m["eps_stack_base"] = "STCK_BASE_EPS_OXDNA"
    m["eps_stack_kt_coeff"] = "STCK_FACT_EPS_OXDNA"
    radial("stack", "STCK", morse=True)
    for k in (4, 5, 6):
        theta("stack", "STCK", k)
    for k, phi in ((1, "PHI1"), (2, "PHI2")):
        m[f"a_stack_{k}"] = f"STCK_{phi}_A"
        m[f"neg_cos_phi{k}_star_stack"] = f"STCK_{phi}_XS"
        m[f"b_neg_cos_phi{k}_stack"] = f"STCK_{phi}_B"
        m[f"neg_cos_phi{k}_c_stack"] = f"STCK_{phi}_XC"

    # hydrogen bonding
    m["eps_hb"] = "HYDR_EPS_OXDNA"
    radial("hb", "HYDR", morse=True)
    for k in (1, 2, 3, 4, 7, 8):
        theta("hb", "HYDR", k)

    # cross stacking
    radial("cross", "CRST", morse=False)
    for k in (1, 2, 3, 4, 7, 8):
        theta("cross", "CRST", k)

    # coaxial stacking
    radial("coax", "CXST", morse=False, eps_suffix="_OXDNA")
    theta("coax", "CXST", 1, t0_suffix="_OXDNA")
    for k in (4, 5, 6):
        theta("coax", "CXST", k)
    for k, phi in ((3, "PHI3"), (4, "PHI4")):
        m[f"a_coax_{k}p"] = f"CXST_{phi}_A"
        m[f"cos_phi{k}_star_coax"] = f"CXST_{phi}_XS"
        m[f"b_cos_phi{k}_coax"] = f"CXST_{phi}_B"
        m[f"cos_phi{k}_c_coax"] = f"CXST_{phi}_XC"

    # oxDNA2-specific coaxial f6 params
    m["a_coax_1_f6"] = "CXST_THETA1_SA"
    m["b_coax_1_f6"] = "CXST_THETA1_SB"
    return m


DEFAULT_OXDNA_VARIABLE_MAPPER: dict[str, str] = _mapper()


def _parse_value_in(value: str) -> int | float | str:
    try:
        return int(value)
    except ValueError:
        pass
    try:
        return float(sympy.parse_expr(value.replace("f", "").lower()).evalf(n=SYMPY_EVAL_N))
    except (AttributeError, ValueError, SyntaxError, TypeError):
        return value


def _parse_value_out(value) -> str:
    if isinstance(value, int) or (isinstance(value, jax.Array) and jnp.issubdtype(value.dtype, jnp.integer)):
        return str(value)
    if isinstance(value, float) or (isinstance(value, jax.Array) and jnp.issubdtype(value.dtype, jnp.floating)):
        return f"{value}f"
    if isinstance(value, str):
        return value
    raise TypeError(ERR_INVALID_HEADER_TYPE.format(type(value), value))


def read_src_h(src_h: Path) -> dict[str, int | float | str]:
    """Parse ``#define`` parameters out of oxDNA's src/model.h."""
    params: dict[str, int | float | str] = {}
    with Path(src_h).open("r") as f:
        for line in f:
            if line.startswith("#define") and "MODEL_H_" not in line:
                parts = line.split()
                if len(parts) >= _MIN_HEADER_TOKENS:
                    raw = " ".join(parts[2:]).split("//")[0].strip()
                    params[parts[1]] = _parse_value_in(raw)
                else:
                    raise ValueError(ERR_CANNOT_PROCESS_SRC_H.format(line))
    return params


def write_src_h(src_h: Path, params: dict) -> None:
    """Emit a model.h with the given macros (FENE_DELTA2 derived)."""
    with Path(src_h).open("w") as f:
        stamp = datetime.datetime.now(tz=datetime.UTC).strftime("%b %d, %Y")
        f.write(
            "\n".join(
                [
                    "/**",
                    " * @file model.h",
                    f" * @date {stamp}",
                    " * @author generated by mythos_tpu",
                    " */",
                    "",
                    "#ifndef MODEL_H_",
                    "#define MODEL_H_\n",
                ]
            )
        )
        for key, value in params.items():
            f.write(f"#define {key} {_parse_value_out(value)}\n")
            if key == "FENE_DELTA":
                f.write(f"#define FENE_DELTA2 {value**2}f\n")
        f.write("#endif /* MODEL_H_ */\n")


def update_params(src_h: Path, new_params: Params | list[Params]) -> None:
    """Write framework parameters into model.h macros.

    OXDNA-suffixed macros mirror into their OXDNA2 variants; CXST_THETA1_SA
    is stored pre-divided by 2 (the standalone engine's convention).
    """
    params = read_src_h(src_h)
    flattened = reduce(or_, new_params, {}) if isinstance(new_params, list) else new_params
    if set(flattened).isdisjoint(DEFAULT_OXDNA_VARIABLE_MAPPER):
        raise ValueError("No valid oxDNA parameters found to update in src/model.h")

    for name in filter(lambda k: k in DEFAULT_OXDNA_VARIABLE_MAPPER, flattened):
        macro = DEFAULT_OXDNA_VARIABLE_MAPPER[name]
        if macro not in params:
            raise ValueError(f"Parameter {name} not found in src/model.h")
        params[macro] = flattened[name]
        oxdna2_macro = macro.replace("OXDNA", "OXDNA2")
        if "OXDNA" in macro and oxdna2_macro in params:
            params[oxdna2_macro] = flattened[name]
        if macro == "CXST_THETA1_SA":
            params[macro] = flattened[name] / 2

    write_src_h(src_h, params)


def _get_order_parameter_names(op_file: Path) -> list[str]:
    with Path(op_file).open("r") as f:
        return [line.strip().split("=")[1].strip() for line in f if line.strip().startswith("order_parameter")]


def read_energy(simulation_dir: Path) -> pd.DataFrame:
    """energy.dat as a DataFrame (umbrella-aware column naming)."""
    inputs = oxdna_input.read(Path(simulation_dir) / "input")
    energy_file = Path(simulation_dir) / inputs["energy_file"]
    base_cols = ["time", "potential_energy", "acc_ratio_trans", "acc_ratio_rot", "acc_ratio_vol"]

    # row 0 is the initial state, which the trajectory file omits
    energy_df = pd.read_table(energy_file, sep=r"\s+", header=None, skiprows=1)
    if not inputs.get("umbrella_sampling"):
        energy_df.columns = base_cols
        return energy_df

    op_types = _get_order_parameter_names(Path(simulation_dir) / inputs["op_file"])
    energy_df.columns = base_cols + op_types + ["weight"]
    return energy_df


def read_output_trajectory(input_file: PathOrStr) -> Trajectory:
    """Read the trajectory referenced by an oxDNA input file."""
    input_dict = oxdna_input.read(Path(input_file))
    oxdna_dir = Path(input_file).parent
    top, fmt = topology.from_oxdna_file(oxdna_dir / input_dict["topology"], return_format=True)
    return trajectory.from_file(
        oxdna_dir / input_dict["trajectory_file"],
        top.strand_counts,
        is_5p_3p=(fmt == oxDNAFormat.NEW),
    )


def read_last_hist(simulation_dir: Path) -> pd.DataFrame:
    """Last umbrella-sampling histogram (incl. extrapolation temperatures)."""
    inputs = oxdna_input.read(Path(simulation_dir) / "input")
    hist_file = Path(simulation_dir) / inputs["last_hist_file"]
    extrap_temps = inputs.get("extrapolate_hist", "").split(",")
    op_types = _get_order_parameter_names(Path(simulation_dir) / inputs["op_file"])
    columns = [*op_types, "count", "unbiased_count", *extrap_temps]
    return pd.read_table(hist_file, sep=r"\s+", header=None, skiprows=1, names=columns)
