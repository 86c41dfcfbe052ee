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
