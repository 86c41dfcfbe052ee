"""ctypes bindings to the native IO runtime (native/traj_parser.cpp).

The shared library is compiled on demand with g++ (cached next to the
source); all callers fall back to the pure-Python path when no compiler is
available, so the native runtime is an accelerator, never a requirement.
"""

from __future__ import annotations

import ctypes
import logging
import shutil
import subprocess
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SRC = _NATIVE_DIR / "traj_parser.cpp"
_LIB = _NATIVE_DIR / "libmythos_traj.so"

_lib: ctypes.CDLL | None = None
_lib_failed = False


def _build() -> bool:
    gxx = shutil.which("g++") or shutil.which("c++")
    if gxx is None or not _SRC.exists():
        return False
    cmd = [gxx, "-O3", "-march=native", "-shared", "-fPIC", str(_SRC), "-o", str(_LIB)]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, OSError) as e:
        logger.debug("native traj parser build failed: %s", e)
        return False
    return True


def get_lib() -> ctypes.CDLL | None:
    """The loaded native library, building it on first use (None if unavailable)."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                _lib_failed = True
                return None
        lib = ctypes.CDLL(str(_LIB))
        lib.oxdna_count_states.argtypes = [ctypes.c_char_p]
        lib.oxdna_count_states.restype = ctypes.c_long
        lib.oxdna_parse.argtypes = [
            ctypes.c_char_p,
            ctypes.c_long,
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.oxdna_parse.restype = ctypes.c_int
        _lib = lib
    except OSError as e:  # pragma: no cover - environment-specific
        logger.debug("native traj parser unavailable: %s", e)
        _lib_failed = True
    return _lib


def parse_trajectory(
    path: str | Path, n_nucleotides: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray] | None:
    """(times, boxes, energies, states) via the native parser, or None.

    states has shape (S, N, 15). Returns None when the library is
    unavailable or the file is malformed (callers fall back to Python).
    """
    lib = get_lib()
    if lib is None:
        return None

    path_b = str(path).encode()
    n_states = lib.oxdna_count_states(path_b)
    if n_states <= 0:
        return None

    times = np.empty(n_states, dtype=np.float64)
    boxes = np.empty((n_states, 3), dtype=np.float64)
    energies = np.empty((n_states, 3), dtype=np.float64)
    states = np.empty((n_states, n_nucleotides, 15), dtype=np.float64)

    def ptr(a: np.ndarray):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))

    rc = lib.oxdna_parse(
        path_b, n_nucleotides, n_states, ptr(times), ptr(boxes), ptr(energies), ptr(states)
    )
    if rc != 0:
        logger.debug("native traj parse failed with code %d; falling back", rc)
        return None
    return times, boxes, energies, states
