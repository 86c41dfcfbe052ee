"""oxDNA2 model package.

Parity reference: mythos/energy/dna2/__init__.py:10-120. Shares Fene,
excluded volumes, HB and cross-stacking with dna1; adds the site-override
stacking, the f4+f6 coaxial stacking, and Debye-Hueckel electrostatics.
"""

from __future__ import annotations

import functools
from types import MappingProxyType

from mythos_tpu.energy import DEFAULT_DISPLACEMENT
from mythos_tpu.energy.base import BaseEnergyFunction, ComposedEnergyFunction, EnergyFunction
from mythos_tpu.energy.configuration import BaseConfiguration
from mythos_tpu.energy.defaults import default_configs_for
from mythos_tpu.energy.dna1.terms import (
    BondedExcludedVolume,
    BondedExcludedVolumeConfiguration,
    CrossStacking,
    CrossStackingConfiguration,
    Fene,
    FeneConfiguration,
    HydrogenBonding,
    HydrogenBondingConfiguration,
    StackingConfiguration,
    UnbondedExcludedVolume,
    UnbondedExcludedVolumeConfiguration,
)
from mythos_tpu.energy.dna2.nucleotide import Nucleotide
from mythos_tpu.energy.dna2.terms import (
    CoaxialStacking,
    CoaxialStackingConfiguration,
    Debye,
    DebyeConfiguration,
    Stacking,
)
from mythos_tpu.io.topology import Topology
from mythos_tpu.utils.types import PyTree


def default_configs() -> tuple[PyTree, PyTree]:
    """(simulation, energy) default configuration trees for dna2."""
    return default_configs_for("dna2")


def default_energy_configs(
    overrides: dict = MappingProxyType({}), opts: dict = MappingProxyType({})
) -> list[BaseConfiguration]:
    """Default per-term configurations, with optional overrides."""
    default_sim_config, default_config = default_configs()

    def get_param(x: str) -> dict:
        return default_config[x] | overrides.get(x, {})

    def get_opts(x: str, defaults: tuple[str, ...] = BaseConfiguration.OPT_ALL) -> tuple[str, ...]:
        return opts.get(x, defaults)

    stacking_opts = tuple(set(default_config["stacking"].keys()) - {"kT", "ss_stack_weights"})
    debye_opts = tuple(set(default_config["debye"].keys()) - {"kT", "salt_conc"})
    debye_overrides = {
        "kt": overrides.get("kT", default_sim_config["kT"]),
        "salt_conc": overrides.get("salt_conc", default_sim_config["salt_conc"]),
        "half_charged_ends": overrides.get(
            "half_charged_ends", bool(default_sim_config["half_charged_ends"])
        ),
    }

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
        DebyeConfiguration.from_dict(get_param("debye") | debye_overrides, get_opts("debye", debye_opts)),
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
        Debye,
    ]


def default_transform_fn() -> callable:
    """RigidBody -> dna2 Nucleotide transform with default geometry."""
    _, default_config = default_configs()
    geometry = default_config["geometry"]
    return functools.partial(
        Nucleotide.from_rigid_body,
        com_to_backbone_x=geometry["com_to_backbone_x"],
        com_to_backbone_y=geometry["com_to_backbone_y"],
        com_to_backbone_dna1=geometry["com_to_backbone_dna1"],
        com_to_hb=geometry["com_to_hb"],
        com_to_stacking=geometry["com_to_stacking"],
    )


def default_transform_soa_fn() -> callable:
    """BodySoA -> dna2 NucleotideSoA transform (component-array hot path)."""
    from mythos_tpu.energy.dna2.nucleotide import NucleotideSoA

    _, default_config = default_configs()
    geometry = default_config["geometry"]
    return functools.partial(
        NucleotideSoA.from_body_soa,
        com_to_backbone_x=geometry["com_to_backbone_x"],
        com_to_backbone_y=geometry["com_to_backbone_y"],
        com_to_backbone_dna1=geometry["com_to_backbone_dna1"],
        com_to_hb=geometry["com_to_hb"],
        com_to_stacking=geometry["com_to_stacking"],
    )


def max_site_offset() -> float:
    """Largest |site - COM| offset in the default dna2 geometry."""
    import numpy as np

    _, default_config = default_configs()
    g = default_config["geometry"]
    back = float(np.hypot(float(g["com_to_backbone_x"]), float(g["com_to_backbone_y"])))
    others = max(
        abs(float(g["com_to_backbone_dna1"])),
        abs(float(g["com_to_hb"])),
        abs(float(g["com_to_stacking"])),
    )
    return max(back, others)


def default_neighbor_cutoff(energy_fn: EnergyFunction | None = None) -> float:
    """COM-distance cutoff covering every unbonded term of the default model."""
    if energy_fn is not None:
        return float(energy_fn.pair_cutoff()) + 2.0 * max_site_offset()
    cutoffs = []
    for cls, cfg in zip(default_energy_fns(), default_energy_configs(), strict=True):
        # params-only probe: pair_cutoff depends solely on self.params
        probe = object.__new__(cls)
        object.__setattr__(probe, "params", cfg.init_params())
        c = probe.pair_cutoff()
        if c is not None:
            cutoffs.append(float(c))
    return max(cutoffs) + 2.0 * max_site_offset()


def short_range_neighbor_cutoff() -> float:
    """COM-distance cutoff over every unbonded term EXCEPT Debye-Hueckel.

    Debye's salt-dependent cutoff is ~3x the short-range terms'; a two-level
    block neighbor list (simulators/neighbors.py r_cutoff_inner) keeps the
    expensive terms on a table sized by this value while Debye alone runs on
    the wide one.
    """
    cutoffs = []
    for cls, cfg in zip(default_energy_fns(), default_energy_configs(), strict=True):
        if cls.__name__ == "Debye":
            continue
        probe = object.__new__(cls)
        object.__setattr__(probe, "params", cfg.init_params())
        c = probe.pair_cutoff()
        if c is not None:
            cutoffs.append(float(c))
    return max(cutoffs) + 2.0 * max_site_offset()


def per_term_neighbor_cutoffs() -> dict[str, float]:
    """Effective COM-distance cutoff per SHORT-RANGE unbonded term.

    Feeds simulators.neighbors.stencil_band_for_topology(term_cutoffs=...):
    the stencil kernel then skips each term beyond its own band reach
    (exact -- the smoothed potentials vanish past their cutoffs) instead of
    running every term out to the widest short-range reach.
    """
    out = {}
    for cls, cfg in zip(default_energy_fns(), default_energy_configs(), strict=True):
        if cls.__name__ == "Debye":
            continue
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
    block_size: int = 16,
    overrides: dict = MappingProxyType({}),
    opts: dict = MappingProxyType({}),
) -> EnergyFunction:
    """The full default oxDNA2 composed energy function for a topology.

    ``dense_unbonded=True`` evaluates unbonded terms over dense (N, N) masks
    (gather-free TPU fast path); ``block_unbonded=True`` selects the
    block-sparse tile path (pair with simulators.BlockNeighborList and bind
    the table via ``with_props(block_ids=...)``).
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
    "Debye",
    "DebyeConfiguration",
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


def per_term_site_cutoffs() -> dict:
    """SITE-level radial supports per unbonded term.

    Feeds simulators.neighbors.stencil_band_for_topology(site_cutoffs=...):
    per-term band reaches measured on the actual interaction-site distances
    instead of COM distances inflated by 2 x max_site_offset — the COM
    inflation makes every short-range term's reach collapse to the same
    value (measured: w_terms=(15,15,15,15) at 10k nt, no pruning at all),
    while site-level reaches separate them (hb/cross/coax stop ~6-9 slots).

    Returns ``{"sites": {name: (a1_coeff, a2_coeff)}, "terms": {term_name:
    ((site_a, site_b, bare_cutoff), ...)}}``; site positions are
    com + a1_coeff * a1 + a2_coeff * a2.

    CAVEAT (shared with short_range_neighbor_cutoff): cutoffs derive from
    the DEFAULT configurations. An optimization run whose bound params
    ENLARGE a cutoff (e.g. a wider dr_c) outgrows the band without the
    validity checks noticing — re-derive the band from the bound params
    (or assert the bound cutoffs <= these at prepare time) in that case.
    """
    _, default_config = default_configs()
    g = default_config["geometry"]
    sites = {
        "back": (float(g["com_to_backbone_x"]), float(g["com_to_backbone_y"])),
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
        "Debye": (("back", "back", float(params["Debye"].r_cut)),),
    }
    return {"sites": sites, "terms": terms}
