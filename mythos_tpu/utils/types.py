"""Type aliases and enums shared across the framework.

Parity reference: mythos/utils/types.py:10-73 (jaxtyping aliases and enums).
We keep plain ``jax.Array`` aliases instead of shaped jaxtyping annotations:
shapes are enforced structurally (static shapes everywhere) which is what the
XLA compilation model needs anyway.
"""

from __future__ import annotations

from enum import Enum
from os import PathLike
from typing import Any, Union

import jax
import numpy as np

# Scalars / arrays -----------------------------------------------------------

Scalar = Union[float, jax.Array]
Arr = Union[np.ndarray, jax.Array]
ARR_OR_SCALAR = Union[Scalar, Arr]
Vector3D = Arr

PathOrStr = Union[str, PathLike]

# Sequence representations ---------------------------------------------------

#: integer (N,) array of nucleotide indices into DNA_ALPHA
Discrete_Sequence = Arr
#: probabilistic sequence: (unpaired_pseq (U,4), bp_pseq (B,4))
Probabilistic_Sequence = tuple[Arr, Arr]
Sequence = Union[Discrete_Sequence, Probabilistic_Sequence]

# Optimization ---------------------------------------------------------------

Params = dict[str, Any]
Grads = dict[str, Any]

PyTree = Any


class oxDNAFormat(Enum):  # noqa: N801 - domain name
    """The two oxDNA topology file formats."""

    CLASSIC = "classic"
    NEW = "new"


class oxDNASimulatorType(Enum):  # noqa: N801 - domain name
    """Type of standalone oxDNA run."""

    DNA1 = "DNA1"
    DNA2 = "DNA2"
    RNA2 = "RNA2"
    NA1 = "NA1"


class oxDNAModelHType(Enum):  # noqa: N801 - domain name
    """Which model.h header family a parameter belongs to."""

    OXDNA = "OXDNA"
    OXDNA2 = "OXDNA2"
    BOTH = "BOTH"
