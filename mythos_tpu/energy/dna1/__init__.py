"""oxDNA1 model package: default configs, terms, and assembly.

Parity reference: mythos/energy/dna1/__init__.py:27-102.
"""

from __future__ import annotations

import functools
from types import MappingProxyType

from mythos_tpu.energy import DEFAULT_DISPLACEMENT
from mythos_tpu.energy.base import BaseEnergyFunction, ComposedEnergyFunction, EnergyFunction
from mythos_tpu.energy.configuration import BaseConfiguration
from mythos_tpu.energy.defaults import default_configs_for
from mythos_tpu.energy.dna1.nucleotide import Nucleotide
from mythos_tpu.energy.dna1.terms import (
    BondedExcludedVolume,
    BondedExcludedVolumeConfiguration,
    CoaxialStacking,
    CoaxialStackingConfiguration,
    CrossStacking,
    CrossStackingConfiguration,
    Fene,
    FeneConfiguration,
    HydrogenBonding,
    HydrogenBondingConfiguration,
    Stacking,
    StackingConfiguration,
    UnbondedExcludedVolume,
    UnbondedExcludedVolumeConfiguration,
)
from mythos_tpu.io.topology import Topology
from mythos_tpu.utils.types import PyTree


def default_configs() -> tuple[PyTree, PyTree]:
    """(simulation, energy) default configuration trees for dna1."""
    return default_configs_for("dna1")


def default_energy_configs(
    overrides: dict = MappingProxyType({}), opts: dict = MappingProxyType({})
) -> list[BaseConfiguration]:
    """Default per-term configurations, with optional per-term overrides."""
    default_sim_config, default_config = default_configs()

    def get_param(x: str) -> dict:
        return default_config[x] | overrides.get(x, {})

    def get_opts(x: str, defaults: tuple[str, ...] = BaseConfiguration.OPT_ALL) -> tuple[str, ...]:
        return opts.get(x, defaults)

    # stacking optimizes its independent TOML params; kt stays fixed
    stacking_opts = tuple(set(default_config["stacking"].keys()) - {"kT", "ss_stack_weights"})

    return [
        FeneConfiguration.from_dict(get_param("fene"), get_opts("fene")),
        BondedExcludedVolumeConfiguration.from_dict(
            get_param("bonded_excluded_volume"), get_opts("bonded_excluded_volume")
        ),
        StackingConfiguration.from_dict(
            get_param("stacking") | {"kt": overrides.get("kT", default_sim_config["kT"])},
            get_opts("stacking", stacking_opts),
        ),
        UnbondedExcludedVolumeConfiguration.from_dict(
            get_param("unbonded_excluded_volume"), get_opts("unbonded_excluded_volume")
        ),
        HydrogenBondingConfiguration.from_dict(get_param("hydrogen_bonding"), get_opts("hydrogen_bonding")),
        CrossStackingConfiguration.from_dict(get_param("cross_stacking"), get_opts("cross_stacking")),
        CoaxialStackingConfiguration.from_dict(get_param("coaxial_stacking"), get_opts("coaxial_stacking")),
    ]


def default_energy_fns() -> list[type[BaseEnergyFunction]]:
    """Term classes, in the order matching default_energy_configs."""
    return [
        Fene,
        BondedExcludedVolume,
        Stacking,
        UnbondedExcludedVolume,
        HydrogenBonding,
        CrossStacking,
        CoaxialStacking,
    ]


def default_transform_fn() -> callable:
    """RigidBody -> Nucleotide transform with the default oxDNA1 geometry."""
    _, default_config = default_configs()
    geometry = default_config["geometry"]
    return functools.partial(
        Nucleotide.from_rigid_body,
        com_to_backbone=geometry["com_to_backbone"],
        com_to_hb=geometry["com_to_hb"],
        com_to_stacking=geometry["com_to_stacking"],
    )


def create_default_energy_fn(
    topology: Topology,
    displacement_fn: callable = DEFAULT_DISPLACEMENT,
    dense_unbonded: bool = False,
) -> EnergyFunction:
    """The full default oxDNA1 composed energy function for a topology.

    ``dense_unbonded=True`` evaluates unbonded terms over dense (N, N) masks
    instead of pair index lists -- the gather-free TPU fast path (pair with
    simulators.DensePairs).
    """
    kwargs = {}
    if dense_unbonded:
        import jax.numpy as jnp

        from mythos_tpu.simulators.neighbors import dense_pair_mask

        kwargs["dense_mask"] = jnp.asarray(dense_pair_mask(topology))
    return ComposedEnergyFunction.from_lists(
        energy_fns=default_energy_fns(),
        energy_configs=default_energy_configs(),
        transform_fn=default_transform_fn(),
        displacement_fn=displacement_fn,
        topology=topology,
        **kwargs,
    )


__all__ = [
    "BondedExcludedVolume",
    "BondedExcludedVolumeConfiguration",
    "CoaxialStacking",
    "CoaxialStackingConfiguration",
    "CrossStacking",
    "CrossStackingConfiguration",
    "Fene",
    "FeneConfiguration",
    "HydrogenBonding",
    "HydrogenBondingConfiguration",
    "Nucleotide",
    "Stacking",
    "StackingConfiguration",
    "UnbondedExcludedVolume",
    "UnbondedExcludedVolumeConfiguration",
    "create_default_energy_fn",
    "default_configs",
    "default_energy_configs",
    "default_energy_fns",
    "default_transform_fn",
]
