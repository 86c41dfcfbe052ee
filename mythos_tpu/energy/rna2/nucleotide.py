"""oxRNA2 nucleotide: extra p3/p5 backbone vectors and 3'/5' stack sites.

Parity reference: mythos/energy/rna2/nucleotide.py:32-78.
"""

from __future__ import annotations

import chex

from mythos_tpu.energy.base import BaseNucleotide
from mythos_tpu.rigid_body import RigidBody, quat_frame
from mythos_tpu.utils.types import Arr, Scalar


@chex.dataclass(frozen=True)
class Nucleotide(BaseNucleotide):
    """RNA2 nucleotide.

    ``bb_p3/p5_sites`` are frame *vectors* (no center offset): they encode
    the 3'/5' phosphate directions used by the theta9/theta10 stacking
    modulations. ``stack3/5_sites`` are in-plane offset sites.
    """

    bb_p3_sites: Arr = None
    bb_p5_sites: Arr = None
    stack3_sites: Arr = None
    stack5_sites: Arr = None

    @staticmethod
    def from_rigid_body(
        rigid_body: RigidBody,
        com_to_backbone_x: Scalar,
        com_to_backbone_y: Scalar,
        com_to_stacking: Scalar,
        com_to_hb: Scalar,
        p3_x: Scalar,
        p3_y: Scalar,
        p3_z: Scalar,
        p5_x: Scalar,
        p5_y: Scalar,
        p5_z: Scalar,
        pos_stack_3_a1: Scalar,
        pos_stack_3_a2: Scalar,
        pos_stack_5_a1: Scalar,
        pos_stack_5_a2: Scalar,
    ) -> "Nucleotide":
        """Precompute all RNA2 sites from one fused frame conversion."""
        a1, a2, a3 = quat_frame(rigid_body.orientation)
        com = rigid_body.center
        return Nucleotide(
            center=com,
            orientation=rigid_body.orientation,
            back_base_vectors=a1,
            cross_prods=a2,
            base_normals=a3,
            back_sites=com + com_to_backbone_x * a1 + com_to_backbone_y * a3,
            stack_sites=com + com_to_stacking * a1,
            base_sites=com + com_to_hb * a1,
            bb_p3_sites=p3_x * a1 + p3_y * a2 + p3_z * a3,
            bb_p5_sites=p5_x * a1 + p5_y * a2 + p5_z * a3,
            stack3_sites=com + pos_stack_3_a1 * a1 + pos_stack_3_a2 * a2,
            stack5_sites=com + pos_stack_5_a1 * a1 + pos_stack_5_a2 * a2,
        )


from typing import NamedTuple  # noqa: E402

from mythos_tpu.soa import BodySoA, Vec3, quat_frame_soa  # noqa: E402


class NucleotideSoA(NamedTuple):
    """SoA rna2 nucleotide (component arrays; see mythos_tpu/soa.py).

    Carries the dna1-compatible field names (stack/back/base/a1/a2/a3) so
    the shared dna1/dna2 SoA term implementations evaluate on it directly,
    plus the RNA2 3'/5' phosphate directions and in-plane stack sites.
    """

    stack: Vec3
    back: Vec3
    base: Vec3
    a1: Vec3
    a2: Vec3
    a3: Vec3
    bb_p3: Vec3
    bb_p5: Vec3
    stack3: Vec3
    stack5: Vec3

    @staticmethod
    def from_body_soa(
        body: BodySoA,
        com_to_backbone_x: Scalar,
        com_to_backbone_y: Scalar,
        com_to_stacking: Scalar,
        com_to_hb: Scalar,
        p3_x: Scalar,
        p3_y: Scalar,
        p3_z: Scalar,
        p5_x: Scalar,
        p5_y: Scalar,
        p5_z: Scalar,
        pos_stack_3_a1: Scalar,
        pos_stack_3_a2: Scalar,
        pos_stack_5_a1: Scalar,
        pos_stack_5_a2: Scalar,
    ) -> "NucleotideSoA":
        a1, a2, a3 = quat_frame_soa(body.orientation)
        com = body.center
        return NucleotideSoA(
            stack=com + com_to_stacking * a1,
            back=com + com_to_backbone_x * a1 + com_to_backbone_y * a3,
            base=com + com_to_hb * a1,
            a1=a1,
            a2=a2,
            a3=a3,
            bb_p3=p3_x * a1 + p3_y * a2 + p3_z * a3,
            bb_p5=p5_x * a1 + p5_y * a2 + p5_z * a3,
            stack3=com + pos_stack_3_a1 * a1 + pos_stack_3_a2 * a2,
            stack5=com + pos_stack_5_a1 * a1 + pos_stack_5_a2 * a2,
        )
