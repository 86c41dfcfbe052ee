"""oxNA hybrid DNA/RNA model package.

Parity reference: mythos/energy/na1/__init__.py:3-11 and the seven hybrid
term modules. Every term evaluates its sub-models (dna2/rna2 parameter sets,
plus a dedicated DNA<->RNA hybrid set for unbonded pairs) over the same pair
arrays and selects per pair by nucleotide type -- generated here by the
factory in mythos_tpu.energy.na1.hybrid instead of seven wrapper files.
"""

from __future__ import annotations

import functools

import mythos_tpu.energy.dna1 as dna1
import mythos_tpu.energy.dna2 as dna2
import mythos_tpu.energy.rna2 as rna2
from mythos_tpu.energy.defaults import default_configs_for
from mythos_tpu.energy.na1.hybrid import (
    hybrid_params_from_configs,
    is_dna_rna_pair,
    is_rna_pair,
    make_hybrid_term,
)
from mythos_tpu.energy.na1.nucleotide import HybridNucleotide
from mythos_tpu.utils.types import PyTree

Fene, FeneConfiguration = make_hybrid_term(
    "Fene",
    pairs="bonded",
    subspecs={
        "dna": (dna1.Fene, dna1.FeneConfiguration),
        "rna": (dna1.Fene, dna1.FeneConfiguration),
    },
)

BondedExcludedVolume, BondedExcludedVolumeConfiguration = make_hybrid_term(
    "BondedExcludedVolume",
    pairs="bonded",
    subspecs={
        "dna": (dna1.BondedExcludedVolume, dna1.BondedExcludedVolumeConfiguration),
        "rna": (dna1.BondedExcludedVolume, dna1.BondedExcludedVolumeConfiguration),
    },
)

Stacking, StackingConfiguration = make_hybrid_term(
    "Stacking",
    pairs="bonded",
    subspecs={
        "dna": (dna2.Stacking, dna1.StackingConfiguration),
        "rna": (rna2.Stacking, rna2.StackingConfiguration),
    },
    shared=("kt",),
    optional_sub_params=("ss_stack_weights",),
)

UnbondedExcludedVolume, UnbondedExcludedVolumeConfiguration = make_hybrid_term(
    "UnbondedExcludedVolume",
    pairs="unbonded",
    subspecs={
        "dna": (dna1.UnbondedExcludedVolume, dna1.UnbondedExcludedVolumeConfiguration),
        "rna": (dna1.UnbondedExcludedVolume, dna1.UnbondedExcludedVolumeConfiguration),
        "drh": (dna1.UnbondedExcludedVolume, dna1.UnbondedExcludedVolumeConfiguration),
    },
)

HydrogenBonding, HydrogenBondingConfiguration = make_hybrid_term(
    "HydrogenBonding",
    pairs="unbonded",
    subspecs={
        "dna": (dna1.HydrogenBonding, dna1.HydrogenBondingConfiguration),
        "rna": (dna1.HydrogenBonding, dna1.HydrogenBondingConfiguration),
        "drh": (dna1.HydrogenBonding, dna1.HydrogenBondingConfiguration),
    },
    optional_sub_params=("ss_hb_weights",),
)

CrossStacking, CrossStackingConfiguration = make_hybrid_term(
    "CrossStacking",
    pairs="unbonded",
    subspecs={
        "dna": (dna1.CrossStacking, dna1.CrossStackingConfiguration),
        "rna": (rna2.CrossStacking, rna2.CrossStackingConfiguration),
        "drh": (dna1.CrossStacking, dna1.CrossStackingConfiguration),
    },
)

CoaxialStacking, CoaxialStackingConfiguration = make_hybrid_term(
    "CoaxialStacking",
    pairs="unbonded",
    subspecs={
        "dna": (dna2.CoaxialStacking, dna2.CoaxialStackingConfiguration),
        "rna": (dna1.CoaxialStacking, dna1.CoaxialStackingConfiguration),
        "drh": (dna1.CoaxialStacking, dna1.CoaxialStackingConfiguration),
    },
)

Debye, DebyeConfiguration = make_hybrid_term(
    "Debye",
    pairs="unbonded",
    subspecs={
        "dna": (dna2.Debye, dna2.DebyeConfiguration),
        "rna": (dna2.Debye, dna2.DebyeConfiguration),
        "drh": (dna2.Debye, dna2.DebyeConfiguration),
    },
    shared=("kt", "salt_conc", "half_charged_ends"),
    term_fields=("is_end",),
)


def default_configs() -> tuple[PyTree, PyTree]:
    """(simulation, hybrid-merged energy) defaults for oxNA.

    The energy tree carries the dna2 defaults under dna_*, rna2 under rna_*,
    and the hybrid-pair constants under drh_* leaf keys.
    """
    _, dna_energy = dna2.default_configs()
    _, rna_energy = rna2.default_configs()
    _, drh_energy = default_configs_for("na1")
    sim, _ = dna2.default_configs()
    merged = hybrid_params_from_configs(dna_energy, rna_energy, drh_energy)
    return sim, merged


def default_transform_fn() -> callable:
    """RigidBody -> HybridNucleotide with both default geometries."""
    _, dna_energy = dna2.default_configs()
    _, rna_energy = rna2.default_configs()
    dg = dna_energy["geometry"]
    rg = rna_energy["geometry"]
    return functools.partial(
        HybridNucleotide.from_rigid_body,
        dna_com_to_backbone_x=dg["com_to_backbone_x"],
        dna_com_to_backbone_y=dg["com_to_backbone_y"],
        dna_com_to_backbone_dna1=dg["com_to_backbone_dna1"],
        dna_com_to_hb=dg["com_to_hb"],
        dna_com_to_stacking=dg["com_to_stacking"],
        rna_com_to_backbone_x=rg["pos_back_a1"],
        rna_com_to_backbone_y=rg["pos_back_a3"],
        rna_com_to_stacking=rg["pos_stack"],
        rna_com_to_hb=rg["pos_base"],
        rna_p3_x=rg["p3_x"],
        rna_p3_y=rg["p3_y"],
        rna_p3_z=rg["p3_z"],
        rna_p5_x=rg["p5_x"],
        rna_p5_y=rg["p5_y"],
        rna_p5_z=rg["p5_z"],
        rna_pos_stack_3_a1=rg["pos_stack_3_a1"],
        rna_pos_stack_3_a2=rg["pos_stack_3_a2"],
        rna_pos_stack_5_a1=rg["pos_stack_5_a1"],
        rna_pos_stack_5_a2=rg["pos_stack_5_a2"],
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
    "HybridNucleotide",
    "HydrogenBonding",
    "HydrogenBondingConfiguration",
    "Stacking",
    "StackingConfiguration",
    "UnbondedExcludedVolume",
    "UnbondedExcludedVolumeConfiguration",
    "default_configs",
    "default_transform_fn",
    "hybrid_params_from_configs",
    "is_dna_rna_pair",
    "is_rna_pair",
]


def default_transform_soa_fn() -> callable:
    """BodySoA -> HybridNucleotideSoA (component-array hot path)."""
    from mythos_tpu.energy.na1.nucleotide import HybridNucleotideSoA

    _, dna_energy = dna2.default_configs()
    _, rna_energy = rna2.default_configs()
    dg = dna_energy["geometry"]
    rg = rna_energy["geometry"]
    dna_kwargs = dict(
        com_to_backbone_x=dg["com_to_backbone_x"],
        com_to_backbone_y=dg["com_to_backbone_y"],
        com_to_backbone_dna1=dg["com_to_backbone_dna1"],
        com_to_hb=dg["com_to_hb"],
        com_to_stacking=dg["com_to_stacking"],
    )
    rna_kwargs = dict(
        com_to_backbone_x=rg["pos_back_a1"],
        com_to_backbone_y=rg["pos_back_a3"],
        com_to_stacking=rg["pos_stack"],
        com_to_hb=rg["pos_base"],
        p3_x=rg["p3_x"],
        p3_y=rg["p3_y"],
        p3_z=rg["p3_z"],
        p5_x=rg["p5_x"],
        p5_y=rg["p5_y"],
        p5_z=rg["p5_z"],
        pos_stack_3_a1=rg["pos_stack_3_a1"],
        pos_stack_3_a2=rg["pos_stack_3_a2"],
        pos_stack_5_a1=rg["pos_stack_5_a1"],
        pos_stack_5_a2=rg["pos_stack_5_a2"],
    )
    return functools.partial(
        HybridNucleotideSoA.from_body_soa, dna_kwargs=dna_kwargs, rna_kwargs=rna_kwargs
    )


__all__.append("default_transform_soa_fn")
