"""oxDNA sequence-dependent weights-file parser.

Parity reference: mythos/input/sequence_dependence.py:12-51. Produces the
4x4 stacking / hydrogen-bonding weight tables and the stacking kT coefficient.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from mythos_tpu.utils.constants import DNA_ALPHA
from mythos_tpu.utils.constants import NUCLEOTIDES_IDX as N_IDX


def read_ss_weights(file: str) -> dict[str, np.ndarray]:
    """Read an oxDNA seq-dep file (``STCK_X_Y``/``HYDR_X_Y``/``STCK_FACT_EPS``).

    Lines are ``KEY = VALUE``; whitespace ignored; float values may carry an
    ``f`` suffix.
    """
    param_map: dict[str, float] = {}
    with Path(file).open("r") as f:
        for line in f:
            if kv := line.strip().replace(" ", ""):
                key, val = kv.split("=")
                param_map[key] = float(val.replace("f", ""))

    stack = np.zeros((4, 4), dtype=np.float64)
    for i, a in enumerate(DNA_ALPHA):
        for j, b in enumerate(DNA_ALPHA):
            stack[i, j] = param_map[f"STCK_{a}_{b}"]

    # oxDNA sets the bonding-pair mirrors to the same value; read one of each.
    hb_a_t = param_map.get("HYDR_A_T", param_map.get("HYDR_T_A"))
    hb_g_c = param_map.get("HYDR_G_C", param_map.get("HYDR_C_G"))
    hb = np.zeros((4, 4), dtype=np.float64)
    hb[N_IDX["A"], N_IDX["T"]] = hb[N_IDX["T"], N_IDX["A"]] = hb_a_t
    hb[N_IDX["G"], N_IDX["C"]] = hb[N_IDX["C"], N_IDX["G"]] = hb_g_c
    # oxRNA tables add the G-U wobble pair (T slot encodes U)
    hb_g_t = param_map.get("HYDR_G_T", param_map.get("HYDR_T_G"))
    if hb_g_t is not None:
        hb[N_IDX["G"], N_IDX["T"]] = hb[N_IDX["T"], N_IDX["G"]] = hb_g_t

    out = {
        "ss_stack_weights": stack,
        "ss_hb_weights": hb,
    }
    # RNA tables carry no STCK_FACT_EPS (oxRNA bakes the kT slope into the
    # per-pair entries); leave the coefficient to the model default then
    if "STCK_FACT_EPS" in param_map:
        out["eps_stack_kt_coeff"] = np.float64(param_map["STCK_FACT_EPS"])
    return out
