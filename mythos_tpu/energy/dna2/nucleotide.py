"""oxDNA2 nucleotide: planar backbone site + dna1-compatible backbone site.

Parity reference: mythos/energy/dna2/nucleotide.py:29-58.
"""

from __future__ import annotations

import chex

from mythos_tpu.energy.base import BaseNucleotide
from mythos_tpu.rigid_body import RigidBody, quat_frame
from mythos_tpu.utils.types import Arr, Scalar


@chex.dataclass(frozen=True)
class Nucleotide(BaseNucleotide):
    """DNA2 nucleotide: back site has an in-plane (a1, a2) offset."""

    back_sites_dna1: Arr = None

    @staticmethod
    def from_rigid_body(
        rigid_body: RigidBody,
        com_to_backbone_x: Scalar,
        com_to_backbone_y: Scalar,
        com_to_backbone_dna1: Scalar,
        com_to_hb: Scalar,
        com_to_stacking: Scalar,
    ) -> "Nucleotide":
        """Precompute sites; the dna1-compatible back site feeds stacking."""
        a1, a2, a3 = quat_frame(rigid_body.orientation)
        com = rigid_body.center
        return Nucleotide(
            center=com,
            orientation=rigid_body.orientation,
            back_base_vectors=a1,
            cross_prods=a2,
            base_normals=a3,
            stack_sites=com + com_to_stacking * a1,
            back_sites=com + com_to_backbone_x * a1 + com_to_backbone_y * a2,
            back_sites_dna1=com + com_to_backbone_dna1 * a1,
            base_sites=com + com_to_hb * a1,
        )


from typing import NamedTuple  # noqa: E402

from mythos_tpu.soa import BodySoA, Vec3, quat_frame_soa  # noqa: E402


class NucleotideSoA(NamedTuple):
    """SoA dna2 nucleotide (component arrays; see mythos_tpu/soa.py).

    Fields mirror :class:`Nucleotide`: ``a1``/``a2``/``a3`` are the frame
    vectors; ``back_dna1`` is the dna1-compatible backbone site that feeds
    stacking (mythos/energy/dna2/stacking.py:27-29).
    """

    stack: Vec3
    back: Vec3
    back_dna1: Vec3
    base: Vec3
    a1: Vec3
    a2: Vec3
    a3: Vec3

    @staticmethod
    def from_body_soa(
        body: BodySoA,
        com_to_backbone_x: Scalar,
        com_to_backbone_y: Scalar,
        com_to_backbone_dna1: Scalar,
        com_to_hb: Scalar,
        com_to_stacking: Scalar,
    ) -> "NucleotideSoA":
        a1, a2, a3 = quat_frame_soa(body.orientation)
        com = body.center
        return NucleotideSoA(
            stack=com + com_to_stacking * a1,
            back=com + com_to_backbone_x * a1 + com_to_backbone_y * a2,
            back_dna1=com + com_to_backbone_dna1 * a1,
            base=com + com_to_hb * a1,
            a1=a1,
            a2=a2,
            a3=a3,
        )
