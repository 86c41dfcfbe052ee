"""LAMMPS CG-DNA external-engine wrapper."""

from mythos_tpu.simulators.lammps.lammps_oxdna import LAMMPSoxDNASimulator

__all__ = ["LAMMPSoxDNASimulator"]
