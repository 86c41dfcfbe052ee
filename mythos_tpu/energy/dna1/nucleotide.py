"""oxDNA1 nucleotide: rigid body + precomputed interaction sites.

Parity reference: mythos/energy/dna1/nucleotide.py:28-53. All three frame
vectors come out of one fused quaternion conversion (``quat_frame``).
"""

from __future__ import annotations

import chex

from mythos_tpu.energy.base import BaseNucleotide
from mythos_tpu.rigid_body import RigidBody, quat_frame
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
