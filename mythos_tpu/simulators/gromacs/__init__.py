"""GROMACS external-engine wrapper (MARTINI validation backend)."""

from mythos_tpu.simulators.gromacs.gromacs import GromacsSimulator

__all__ = ["GromacsSimulator"]
