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


def default_transform_soa_fn() -> callable:
    """BodySoA -> NucleotideSoA transform (component-array hot path)."""
    from mythos_tpu.energy.dna1.nucleotide import NucleotideSoA

    _, default_config = default_configs()
    geometry = default_config["geometry"]
    return functools.partial(
        NucleotideSoA.from_body_soa,
        com_to_backbone=geometry["com_to_backbone"],
        com_to_hb=geometry["com_to_hb"],
        com_to_stacking=geometry["com_to_stacking"],
    )


def max_site_offset() -> float:
    """Largest |site - COM| offset in the default dna1 geometry.

    Converts a site-site interaction cutoff (EnergyFunction.pair_cutoff) into
    a COM-COM neighbor-list cutoff: r_com <= r_site + 2 * max_site_offset.
    """
    _, default_config = default_configs()
    return max(abs(float(v)) for v in default_config["geometry"].values())


def default_neighbor_cutoff(energy_fn: EnergyFunction | None = None) -> float:
    """COM-distance cutoff covering every unbonded term of the default model."""
    fn = energy_fn
    if fn is None:
        import numpy as np

        fn = ComposedEnergyFunction.from_lists(
            energy_fns=default_energy_fns(),
            energy_configs=default_energy_configs(),
            seq=np.zeros(2, dtype=int),
            bonded_neighbors=np.zeros((1, 2), dtype=int),
            unbonded_neighbors=np.zeros((2, 1), dtype=int),
            displacement_fn=DEFAULT_DISPLACEMENT,
        )
    return float(fn.pair_cutoff()) + 2.0 * max_site_offset()


def per_term_neighbor_cutoffs() -> dict[str, float]:
    """Effective COM-distance cutoff per unbonded term (see the dna2
    counterpart; dna1 has no Debye term, so every term is short-range)."""
    out = {}
    for cls, cfg in zip(default_energy_fns(), default_energy_configs(), strict=True):
        probe = object.__new__(cls)
        object.__setattr__(probe, "params", cfg.init_params())
        c = probe.pair_cutoff()
        if c is not None:
            out[cls.__name__] = float(c) + 2.0 * max_site_offset()
    return out


def create_default_energy_fn(
    topology: Topology,
    displacement_fn: callable = DEFAULT_DISPLACEMENT,
    dense_unbonded: bool = False,
    block_unbonded: bool = False,
    block_size: int = 64,
    overrides: dict = MappingProxyType({}),
    opts: dict = MappingProxyType({}),
) -> EnergyFunction:
    """The full default oxDNA1 composed energy function for a topology.

    ``dense_unbonded=True`` evaluates unbonded terms over dense (N, N) masks
    instead of pair index lists -- the gather-free TPU fast path (pair with
    simulators.DensePairs). ``block_unbonded=True`` selects the block-sparse
    tile path (pair with simulators.BlockNeighborList); the returned function
    carries an empty placeholder table and must be given a real one via
    ``with_props(block_ids=...)`` before evaluation. ``overrides``/``opts``
    forward to :func:`default_energy_configs` (reference parity:
    mythos/energy/dna1/__init__.py:84-102).
    """
    kwargs = {}
    if block_unbonded:
        import jax.numpy as jnp

        from mythos_tpu.energy.blocks import n_blocks_for

        nb = n_blocks_for(topology.n_nucleotides, block_size)
        kwargs["block_ids"] = jnp.zeros((nb, 0), dtype=jnp.int32)
        kwargs["block_size"] = block_size
    elif dense_unbonded:
        import jax.numpy as jnp

        from mythos_tpu.simulators.neighbors import dense_pair_mask

        kwargs["dense_mask"] = jnp.asarray(dense_pair_mask(topology))
    return ComposedEnergyFunction.from_lists(
        energy_fns=default_energy_fns(),
        energy_configs=default_energy_configs(overrides=overrides, opts=opts),
        transform_fn=default_transform_fn(),
        transform_soa_fn=default_transform_soa_fn(),
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
    "default_neighbor_cutoff",
    "default_energy_configs",
    "default_energy_fns",
    "default_transform_fn",
    "max_site_offset",
]


def per_term_site_cutoffs() -> dict:
    """SITE-level radial supports per unbonded term (see the dna2
    counterpart for semantics; dna1 has one backbone site and no Debye)."""
    _, default_config = default_configs()
    g = default_config["geometry"]
    sites = {
        "back": (float(g["com_to_backbone"]), 0.0),
        "base": (float(g["com_to_hb"]), 0.0),
        "stack": (float(g["com_to_stacking"]), 0.0),
    }
    params = {}
    for cls, cfg in zip(default_energy_fns(), default_energy_configs(), strict=True):
        params[cls.__name__] = cfg.init_params()
    px = params["UnbondedExcludedVolume"]
    terms = {
        "UnbondedExcludedVolume": (
            ("base", "base", float(px.dr_c_base)),
            ("back", "base", max(float(px.dr_c_back_base), float(px.dr_c_base_back))),
            ("back", "back", float(px.dr_c_backbone)),
        ),
        "HydrogenBonding": (("base", "base", float(params["HydrogenBonding"].dr_c_high_hb)),),
        "CrossStacking": (("base", "base", float(params["CrossStacking"].dr_c_high_cross)),),
        "CoaxialStacking": (("stack", "stack", float(params["CoaxialStacking"].dr_c_high_coax)),),
    }
    return {"sites": sites, "terms": terms}
