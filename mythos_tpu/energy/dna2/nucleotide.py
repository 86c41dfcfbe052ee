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
