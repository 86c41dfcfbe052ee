"""Energy models: composable parameterized potentials for CG simulation.

Parity reference: mythos/energy/__init__.py. The default displacement is free
space; periodic systems pass spaces.periodic(box)[0].
"""

from mythos_tpu import spaces
from mythos_tpu.energy.base import (
    BaseEnergyFunction,
    BaseNucleotide,
    ComposedEnergyFunction,
    EnergyFunction,
    QualifiedComposedEnergyFunction,
)
from mythos_tpu.energy.configuration import BaseConfiguration
from mythos_tpu.energy.defaults import default_configs_for

DEFAULT_DISPLACEMENT = spaces.free()[0]

__all__ = [
    "DEFAULT_DISPLACEMENT",
    "BaseConfiguration",
    "BaseEnergyFunction",
    "BaseNucleotide",
    "ComposedEnergyFunction",
    "EnergyFunction",
    "QualifiedComposedEnergyFunction",
    "default_configs_for",
]
