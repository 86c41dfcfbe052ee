"""Common MARTINI machinery: topology, dict-backed configuration, base term.

Parity reference: mythos/energy/martini/base.py:15-208. MDAnalysis is an
optional host-side dependency (gated import): topologies can also be built
directly from arrays.
"""

from __future__ import annotations

from pathlib import Path

import chex
import jax.numpy as jnp

from mythos_tpu import spaces
from mythos_tpu.energy.base import BaseEnergyFunction
from mythos_tpu.utils.types import Arr, Vector3D


def get_periodic(box_size: Vector3D) -> callable:
    """Displacement function for a periodic box (positions in nm)."""
    return spaces.periodic(box_size)[0]


def derive_bond_names(
    residue_names: tuple[str, ...],
    atom_names: tuple[str, ...],
    bonded_neighbors: Arr,
) -> tuple[str, ...]:
    """``RESIDUE_BEAD1_BEAD2`` names aligned with bonded_neighbors."""
    return tuple(
        f"{residue_names[b[0]]}_{atom_names[b[0]]}_{atom_names[b[1]]}" for b in bonded_neighbors
    )


def derive_angle_names(
    residue_names: tuple[str, ...],
    atom_names: tuple[str, ...],
    angles: Arr,
) -> tuple[str, ...]:
    """``RESIDUE_BEAD1_BEAD2_BEAD3`` names aligned with angles."""
    return tuple(
        f"{residue_names[a[0]]}_{atom_names[a[0]]}_{atom_names[a[1]]}_{atom_names[a[2]]}"
        for a in angles
    )


@chex.dataclass(frozen=True, kw_only=True)
class MartiniTopology:
    """Bead types/names/residues, bonds, and angles of a MARTINI system."""

    atom_types: tuple[str, ...]
    atom_names: tuple[str, ...]
    residue_names: tuple[str, ...]
    angles: Arr
    bonded_neighbors: Arr

    @classmethod
    def from_universe(cls, universe) -> "MartiniTopology":
        """From an MDAnalysis Universe (optional dependency)."""
        return cls(
            atom_types=tuple(universe.atoms.types),
            atom_names=tuple(universe.atoms.names),
            residue_names=tuple(universe.atoms.resnames),
            angles=jnp.array(universe.angles.indices),
            bonded_neighbors=jnp.array(universe.bonds.indices),
        )

    @classmethod
    def from_tpr(cls, tpr_file: Path) -> "MartiniTopology":
        """From a GROMACS TPR file via MDAnalysis (optional dependency)."""
        try:
            import MDAnalysis
        except ImportError as e:  # pragma: no cover - env without MDAnalysis
            raise ImportError(
                "MDAnalysis is required to read TPR topologies; install it or "
                "build the MartiniTopology from arrays."
            ) from e
        return cls.from_universe(MDAnalysis.Universe(tpr_file))

    @property
    def bond_names(self) -> tuple[str, ...]:
        return derive_bond_names(self.residue_names, self.atom_names, self.bonded_neighbors)

    @property
    def angle_names(self) -> tuple[str, ...]:
        return derive_angle_names(self.residue_names, self.atom_names, self.angles)


@chex.dataclass(frozen=True, kw_only=True)
class MartiniEnergyFunction(BaseEnergyFunction):
    """Base MARTINI term: point particles in a periodic box.

    ``displacement_fn`` is a factory taking the per-state box size (the box is
    a trajectory property in MARTINI runs).
    """

    atom_types: tuple[str, ...]
    atom_names: tuple[str, ...]
    residue_names: tuple[str, ...]
    angles: Arr
    displacement_fn: callable = get_periodic

    def __post_init__(self, topology: None = None) -> None:
        if self.unbonded_neighbors is not None:
            raise ValueError("MartiniEnergyFunction does not support user-input unbonded_neighbors.")

    @classmethod
    def from_topology(cls, topology: MartiniTopology, **kwargs) -> "MartiniEnergyFunction":
        """Build from a MartiniTopology."""
        return cls(
            atom_types=topology.atom_types,
            atom_names=topology.atom_names,
            residue_names=topology.residue_names,
            angles=topology.angles,
            bonded_neighbors=topology.bonded_neighbors,
            **kwargs,
        )

    @property
    def bond_names(self) -> tuple[str, ...]:
        return derive_bond_names(self.residue_names, self.atom_names, self.bonded_neighbors)

    @property
    def angle_names(self) -> tuple[str, ...]:
        return derive_angle_names(self.residue_names, self.atom_names, self.angles)


class MartiniEnergyConfiguration:
    """Dict-backed parameter container with coupling support.

    MARTINI parameter spaces are large and sparse (per bond/angle/type-pair
    names), so parameters live in a dict rather than dataclass fields.
    A *coupling* lets one proxy parameter drive many targets: couplings is
    ``{proxy: [target, ...]}``; constructor kwargs given under the proxy name
    are fanned out to the targets; opt_params reports the proxy.
    """

    def __init__(self, couplings: dict[str, list[str]] | None = None, **kwargs):
        self.couplings = couplings or {}
        all_targets = [v for vals in self.couplings.values() for v in vals]
        if len(all_targets) != len(set(all_targets)):
            raise ValueError("Parameters cannot appear in more than one coupling")
        self.reversed_couplings = {v: k for k, vals in self.couplings.items() for v in vals}

        self.params: dict = {}
        for key, value in kwargs.items():
            if key in self.couplings:
                for subkey in self.couplings[key]:
                    self.params[subkey] = value
            elif key not in self.reversed_couplings:
                self.params[key] = value

        self.__post_init__()

    def __post_init__(self) -> None:
        """Hook for additional initialization in subclasses."""

    def init_params(self) -> "MartiniEnergyConfiguration":
        """Dependent-parameter initialization (no-op by default)."""
        return self

    @property
    def opt_params(self) -> dict:
        """Optimizable view: coupled targets reported under their proxy."""
        out: dict = {}
        for key, value in self.params.items():
            if key in self.reversed_couplings:
                out[self.reversed_couplings[key]] = value
            else:
                out[key] = value
        return out

    def __getitem__(self, key: str):
        if key in self.params:
            return self.params[key]
        if key in self.couplings:
            return self.params[self.couplings[key][0]]  # all targets share value
        raise KeyError(f"Parameter '{key}' not found in configuration.")

    def __contains__(self, key: str) -> bool:
        return key in self.params or key in self.couplings

    def __or__(self, other) -> "MartiniEnergyConfiguration":
        """Merge (other wins); couplings are preserved."""
        new_params = self.params.copy()
        if isinstance(other, MartiniEnergyConfiguration):
            new_params.update(other.params)
        else:
            new_params.update(dict(other))
        return self.__class__(couplings=self.couplings, **new_params)
