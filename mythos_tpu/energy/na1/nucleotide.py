"""oxNA hybrid nucleotide: a dna2 and an rna2 view of the same rigid body.

Parity reference: mythos/energy/na1/nucleotide.py:11-78.
"""

from __future__ import annotations

import chex

from mythos_tpu.energy.dna2.nucleotide import Nucleotide as Dna2Nucleotide
from mythos_tpu.energy.rna2.nucleotide import Nucleotide as Rna2Nucleotide
from mythos_tpu.rigid_body import RigidBody
from mythos_tpu.utils.types import Scalar


@chex.dataclass(frozen=True)
class HybridNucleotide:
    """Bundle of dna2 and rna2 site computations from one rigid body."""

    dna: Dna2Nucleotide
    rna: Rna2Nucleotide

    @property
    def center(self):
        return self.dna.center

    @staticmethod
    def from_rigid_body(
        rigid_body: RigidBody,
        dna_com_to_backbone_x: Scalar,
        dna_com_to_backbone_y: Scalar,
        dna_com_to_backbone_dna1: Scalar,
        dna_com_to_hb: Scalar,
        dna_com_to_stacking: Scalar,
        rna_com_to_backbone_x: Scalar,
        rna_com_to_backbone_y: Scalar,
        rna_com_to_stacking: Scalar,
        rna_com_to_hb: Scalar,
        rna_p3_x: Scalar,
        rna_p3_y: Scalar,
        rna_p3_z: Scalar,
        rna_p5_x: Scalar,
        rna_p5_y: Scalar,
        rna_p5_z: Scalar,
        rna_pos_stack_3_a1: Scalar,
        rna_pos_stack_3_a2: Scalar,
        rna_pos_stack_5_a1: Scalar,
        rna_pos_stack_5_a2: Scalar,
    ) -> "HybridNucleotide":
        """Precompute both site systems."""
        return HybridNucleotide(
            dna=Dna2Nucleotide.from_rigid_body(
                rigid_body,
                dna_com_to_backbone_x,
                dna_com_to_backbone_y,
                dna_com_to_backbone_dna1,
                dna_com_to_hb,
                dna_com_to_stacking,
            ),
            rna=Rna2Nucleotide.from_rigid_body(
                rigid_body,
                rna_com_to_backbone_x,
                rna_com_to_backbone_y,
                rna_com_to_stacking,
                rna_com_to_hb,
                rna_p3_x,
                rna_p3_y,
                rna_p3_z,
                rna_p5_x,
                rna_p5_y,
                rna_p5_z,
                rna_pos_stack_3_a1,
                rna_pos_stack_3_a2,
                rna_pos_stack_5_a1,
                rna_pos_stack_5_a2,
            ),
        )


from typing import NamedTuple  # noqa: E402

from mythos_tpu.energy.dna2.nucleotide import NucleotideSoA as Dna2NucleotideSoA  # noqa: E402
from mythos_tpu.energy.rna2.nucleotide import NucleotideSoA as Rna2NucleotideSoA  # noqa: E402
from mythos_tpu.soa import BodySoA  # noqa: E402


class HybridNucleotideSoA(NamedTuple):
    """SoA hybrid nucleotide: dna2 + rna2 site systems (component arrays)."""

    dna: Dna2NucleotideSoA
    rna: Rna2NucleotideSoA

    @staticmethod
    def from_body_soa(body: BodySoA, dna_kwargs: dict, rna_kwargs: dict) -> "HybridNucleotideSoA":
        return HybridNucleotideSoA(
            dna=Dna2NucleotideSoA.from_body_soa(body, **dna_kwargs),
            rna=Rna2NucleotideSoA.from_body_soa(body, **rna_kwargs),
        )
