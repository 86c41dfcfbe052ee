"""MARTINI 3 terms: reuses MARTINI 2 with a harmonic (non-G96) angle.

Parity reference: mythos/energy/martini/m3/angle.py:8-11.
"""

from typing import ClassVar

import chex

from mythos_tpu.energy.martini.m2 import Angle as Martini2Angle
from mythos_tpu.energy.martini.m2 import AngleConfiguration, Bond, BondConfiguration


@chex.dataclass(frozen=True, kw_only=True)
class Angle(Martini2Angle):
    """Plain harmonic angle (MARTINI 3)."""

    use_G96: ClassVar[bool] = False  # noqa: N815 - GROMACS naming


__all__ = ["Angle", "AngleConfiguration", "Bond", "BondConfiguration"]
