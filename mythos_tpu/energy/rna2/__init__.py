"""oxRNA2 model package.

Parity reference: mythos/energy/rna2/__init__.py:3-13 (exports only the
RNA-specific Stacking/CrossStacking/Nucleotide; fene/exc-vol/HB/coax come
from dna1 and Debye from dna2, parameterized by the rna2 defaults).
"""

import functools

from mythos_tpu.energy.defaults import default_configs_for
from mythos_tpu.energy.rna2.nucleotide import Nucleotide
from mythos_tpu.energy.rna2.terms import (
    CrossStacking,
    CrossStackingConfiguration,
    Stacking,
    StackingConfiguration,
)
from mythos_tpu.utils.types import PyTree


def default_configs() -> tuple[PyTree, PyTree]:
    """(simulation, energy) default configuration trees for rna2."""
    return default_configs_for("rna2")


def default_transform_fn() -> callable:
    """RigidBody -> rna2 Nucleotide with the default oxRNA2 geometry."""
    _, config = default_configs()
    g = config["geometry"]
    return functools.partial(
        Nucleotide.from_rigid_body,
        com_to_backbone_x=g["pos_back_a1"],
        com_to_backbone_y=g["pos_back_a3"],
        com_to_stacking=g["pos_stack"],
        com_to_hb=g["pos_base"],
        p3_x=g["p3_x"],
        p3_y=g["p3_y"],
        p3_z=g["p3_z"],
        p5_x=g["p5_x"],
        p5_y=g["p5_y"],
        p5_z=g["p5_z"],
        pos_stack_3_a1=g["pos_stack_3_a1"],
        pos_stack_3_a2=g["pos_stack_3_a2"],
        pos_stack_5_a1=g["pos_stack_5_a1"],
        pos_stack_5_a2=g["pos_stack_5_a2"],
    )


def default_transform_soa_fn() -> callable:
    """BodySoA -> rna2 NucleotideSoA (component-array hot path)."""
    from mythos_tpu.energy.rna2.nucleotide import NucleotideSoA

    _, config = default_configs()
    g = config["geometry"]
    return functools.partial(
        NucleotideSoA.from_body_soa,
        com_to_backbone_x=g["pos_back_a1"],
        com_to_backbone_y=g["pos_back_a3"],
        com_to_stacking=g["pos_stack"],
        com_to_hb=g["pos_base"],
        p3_x=g["p3_x"],
        p3_y=g["p3_y"],
        p3_z=g["p3_z"],
        p5_x=g["p5_x"],
        p5_y=g["p5_y"],
        p5_z=g["p5_z"],
        pos_stack_3_a1=g["pos_stack_3_a1"],
        pos_stack_3_a2=g["pos_stack_3_a2"],
        pos_stack_5_a1=g["pos_stack_5_a1"],
        pos_stack_5_a2=g["pos_stack_5_a2"],
    )


__all__ = [
    "CrossStacking",
    "CrossStackingConfiguration",
    "Nucleotide",
    "Stacking",
    "StackingConfiguration",
    "default_configs",
    "default_transform_fn",
    "default_transform_soa_fn",
]


# TPU fast-tier assembly ----------------------------------------------------
#
# The reference exposes rna2 terms for manual composition
# (mythos/energy/rna2/__init__.py:3-13); this package additionally ships the
# same assembly surface as dna1/dna2 so the simulator fast tiers (stencil /
# block kernels) treat all models uniformly. rna2 = dna1 fene/bexc/exc/hb/
# coax + rna2 Stacking/CrossStacking + dna2 Debye, under the rna2 defaults
# (reference parity: mythos/energy/rna2/interactions.py forms).

from types import MappingProxyType

from mythos_tpu.energy import DEFAULT_DISPLACEMENT
from mythos_tpu.energy.base import BaseConfiguration, BaseEnergyFunction, ComposedEnergyFunction, EnergyFunction
from mythos_tpu.energy.dna1 import (
    BondedExcludedVolume,
    BondedExcludedVolumeConfiguration,
    CoaxialStacking,
    CoaxialStackingConfiguration,
    Fene,
    FeneConfiguration,
    HydrogenBonding,
    HydrogenBondingConfiguration,
    UnbondedExcludedVolume,
    UnbondedExcludedVolumeConfiguration,
)
from mythos_tpu.energy.dna2 import Debye, DebyeConfiguration
from mythos_tpu.io.topology import Topology

#: flagship defaults when the caller gives no simulation config (the rna2
#: package ships energy-only TOML, like the reference)
_DEFAULT_KT = 296.15 * 0.1 / 300.0
_DEFAULT_SALT = 1.0


def default_energy_configs(
    overrides: dict = MappingProxyType({}), opts: dict = MappingProxyType({})
) -> list[BaseConfiguration]:
    """Default per-term configurations, with optional overrides."""
    _, default_config = default_configs()

    def get_param(x: str) -> dict:
        return dict(default_config[x]) | overrides.get(x, {})

    def get_opts(x: str, defaults=BaseConfiguration.OPT_ALL):
        return opts.get(x, defaults)

    kt = overrides.get("kT", _DEFAULT_KT)
    stacking_opts = tuple(set(default_config["stacking"].keys()))
    debye_opts = tuple(set(default_config["debye"].keys()))
    debye_overrides = {
        "kt": kt,
        "salt_conc": overrides.get("salt_conc", _DEFAULT_SALT),
        "half_charged_ends": overrides.get("half_charged_ends", False),
    }
    return [
        FeneConfiguration.from_dict(get_param("fene"), get_opts("fene")),
        BondedExcludedVolumeConfiguration.from_dict(
            get_param("bonded_excluded_volume"), get_opts("bonded_excluded_volume")
        ),
        StackingConfiguration.from_dict(
            get_param("stacking") | {"kt": kt}, get_opts("stacking", stacking_opts)
        ),
        UnbondedExcludedVolumeConfiguration.from_dict(
            get_param("unbonded_excluded_volume"), get_opts("unbonded_excluded_volume")
        ),
        HydrogenBondingConfiguration.from_dict(
            get_param("hydrogen_bonding"), get_opts("hydrogen_bonding")
        ),
        CrossStackingConfiguration.from_dict(
            get_param("cross_stacking"), get_opts("cross_stacking")
        ),
        CoaxialStackingConfiguration.from_dict(
            get_param("coaxial_stacking"), get_opts("coaxial_stacking")
        ),
        DebyeConfiguration.from_dict(
            get_param("debye") | debye_overrides, get_opts("debye", debye_opts)
        ),
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


def create_default_energy_fn(
    topology: Topology,
    displacement_fn: callable = DEFAULT_DISPLACEMENT,
    dense_unbonded: bool = False,
    block_unbonded: bool = False,
    block_size: int = 16,
    overrides: dict = MappingProxyType({}),
    opts: dict = MappingProxyType({}),
) -> EnergyFunction:
    """The full default oxRNA2 composed energy function for a topology."""
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


def max_site_offset() -> float:
    """Largest |site - COM| offset in the default rna2 geometry."""
    import numpy as np

    _, default_config = default_configs()
    g = default_config["geometry"]
    return max(
        float(np.hypot(float(g["pos_back_a1"]), float(g["pos_back_a3"]))),
        abs(float(g["pos_base"])),
        abs(float(g["pos_stack"])),
    )


def default_neighbor_cutoff() -> float:
    """COM-distance cutoff covering every unbonded term of the default model."""
    cutoffs = []
    for cls, cfg in zip(default_energy_fns(), default_energy_configs(), strict=True):
        probe = object.__new__(cls)
        object.__setattr__(probe, "params", cfg.init_params())
        c = probe.pair_cutoff() if hasattr(probe, "pair_cutoff") else None
        if c is not None:
            cutoffs.append(float(c))
    return max(cutoffs) + 2.0 * max_site_offset()


def short_range_neighbor_cutoff() -> float:
    """COM-distance cutoff over every unbonded term EXCEPT Debye-Hueckel."""
    cutoffs = []
    for cls, cfg in zip(default_energy_fns(), default_energy_configs(), strict=True):
        if cls.__name__ == "Debye":
            continue
        probe = object.__new__(cls)
        object.__setattr__(probe, "params", cfg.init_params())
        c = probe.pair_cutoff() if hasattr(probe, "pair_cutoff") else None
        if c is not None:
            cutoffs.append(float(c))
    return max(cutoffs) + 2.0 * max_site_offset()


def per_term_site_cutoffs() -> dict:
    """SITE-level radial supports per unbonded term (see the dna2
    counterpart; the rna2 backbone offset spans (a1, a3) so site coeffs
    here are (a1, a2, a3) triples)."""
    _, default_config = default_configs()
    g = default_config["geometry"]
    sites = {
        "back": (float(g["pos_back_a1"]), 0.0, float(g["pos_back_a3"])),
        "base": (float(g["pos_base"]), 0.0, 0.0),
        "stack": (float(g["pos_stack"]), 0.0, 0.0),
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


def aform_site_slacks() -> dict:
    """Per-family site-distance slacks for A-form rna2 band sizing.

    Calibrated r5 (benchmarks/calibrate_aform.py): 3 seeds x 20,000
    Langevin steps of a 10k-nt A-form duplex at 296 K on a margin-12
    band that stayed violation-free, tracking the running minimum site
    distance per (family, slot offset). The required slack per family is
    max over offsets of (ideal_init_distance - bare_cutoff) over every
    offset whose thermal minimum dipped below the cutoff, + 0.25 safety.
    A-form equilibrium under rna2 physics is far more compact than the
    ideal-helix init (bulk back-base contacts at 0.516 su at offset 9 vs
    ideal 1.70): these slacks are 2-4x the B-DNA defaults, and end-pair
    exclusion barely shrinks them (bulk physics, not end fraying).
    """
    return {
        ("back", "back"): 3.25,
        ("back", "base"): 2.55,
        ("base", "base"): 2.40,
        ("stack", "stack"): 2.20,
    }


def aform_far_slack() -> float:
    """AABB-gap slack for the far fold-back sweep on A-form systems: the
    equilibrium approach shrinks init gaps by up to ~3 su (same
    calibration as :func:`aform_site_slacks`), vs ~0.9 for B-DNA."""
    return 3.5
