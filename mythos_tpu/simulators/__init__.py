"""Simulation backends: native TPU scan simulator + external engine wrappers."""

from mythos_tpu.simulators.base import InputDirSimulator, Simulator, SimulatorOutput
from mythos_tpu.simulators.io import SimulatorTrajectory
from mythos_tpu.simulators.neighbors import (
    BlockNeighborList,
    DensePairs,
    FixedCapacityNeighborList,
    NoNeighborList,
    StencilBand,
    block_neighbor_list_for_topology,
    neighbor_list_for_topology,
    stencil_band_for_topology,
)
from mythos_tpu.simulators.martini import MartiniSimulator
from mythos_tpu.simulators.particles import (
    ParticleLangevinState,
    berendsen_semi_isotropic,
    nvt_langevin_particles,
    pressure_diag,
)
from mythos_tpu.simulators.tpu import StaticSimulatorParams, TpuSimulator, checkpoint_scan

__all__ = [
    "BlockNeighborList",
    "DensePairs",
    "FixedCapacityNeighborList",
    "InputDirSimulator",
    "MartiniSimulator",
    "NoNeighborList",
    "ParticleLangevinState",
    "Simulator",
    "SimulatorOutput",
    "SimulatorTrajectory",
    "StaticSimulatorParams",
    "StencilBand",
    "TpuSimulator",
    "berendsen_semi_isotropic",
    "block_neighbor_list_for_topology",
    "checkpoint_scan",
    "neighbor_list_for_topology",
    "nvt_langevin_particles",
    "pressure_diag",
    "stencil_band_for_topology",
]
