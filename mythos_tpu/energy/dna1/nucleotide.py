"""oxDNA1 nucleotide: rigid body + precomputed interaction sites.

Parity reference: mythos/energy/dna1/nucleotide.py:28-53. All three frame
vectors come out of one fused quaternion conversion (``quat_frame``).

``NucleotideSoA`` is the component-array twin used by the TPU hot loop
(see mythos_tpu/soa.py for the layout rationale).
"""

from __future__ import annotations

from typing import NamedTuple

import chex

from mythos_tpu.energy.base import BaseNucleotide
from mythos_tpu.rigid_body import RigidBody, quat_frame
from mythos_tpu.soa import BodySoA, Vec3, quat_frame_soa
from mythos_tpu.utils.types import Scalar


@chex.dataclass(frozen=True)
class Nucleotide(BaseNucleotide):
    """DNA1 nucleotide with stack/back/base sites along the a1 axis."""

    @staticmethod
    def from_rigid_body(
        rigid_body: RigidBody,
        com_to_backbone: Scalar,
        com_to_hb: Scalar,
        com_to_stacking: Scalar,
    ) -> "Nucleotide":
        """Precompute sites: site = com + offset * a1."""
        a1, a2, a3 = quat_frame(rigid_body.orientation)
        com = rigid_body.center
        return Nucleotide(
            center=com,
            orientation=rigid_body.orientation,
            back_base_vectors=a1,
            cross_prods=a2,
            base_normals=a3,
            stack_sites=com + com_to_stacking * a1,
            back_sites=com + com_to_backbone * a1,
            base_sites=com + com_to_hb * a1,
        )


class NucleotideSoA(NamedTuple):
    """SoA nucleotide: Vec3 component fields, leaves shaped (N,).

    Field meanings match :class:`Nucleotide`: ``a1`` = back_base_vectors,
    ``a2`` = cross_prods, ``a3`` = base_normals.
    """

    stack: Vec3
    back: Vec3
    base: Vec3
    a1: Vec3
    a2: Vec3
    a3: Vec3

    @staticmethod
    def from_body_soa(
        body: BodySoA,
        com_to_backbone: Scalar,
        com_to_hb: Scalar,
        com_to_stacking: Scalar,
    ) -> "NucleotideSoA":
        """Precompute sites: site = com + offset * a1 (all elementwise)."""
        a1, a2, a3 = quat_frame_soa(body.orientation)
        com = body.center
        return NucleotideSoA(
            stack=com + com_to_stacking * a1,
            back=com + com_to_backbone * a1,
            base=com + com_to_hb * a1,
            a1=a1,
            a2=a2,
            a3=a3,
        )
