"""Synthetic system generators (no input files needed).

The reference builds test systems from committed oxDNA files; these
generators produce equivalent idealized structures in code, for examples,
benchmarks, and tests. Geometry matches B-DNA-like defaults (rise 0.39 su,
twist 34.3 deg).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

def synthetic_duplex(n_bp: int = 8, form: str = "B", bend: float | None = None):
    """Synthetic B-DNA-like duplex topology + rigid body (no files needed).

    ``bend``: total bend angle (radians) of the helix axis along a circular
    arc. The local structure stays ideal (the curvature radius is huge
    relative to the helix), but index-distant segments approach in space —
    the honest "general conformation" benchmark geometry: it breaks the
    banded-stencil layout (a true fold-back) and must run the block tier.
    """
    import mythos_tpu.io.topology as top
    import mythos_tpu.utils.constants as const
    from mythos_tpu.rigid_body import RigidBody

    n = 2 * n_bp
    seq = "ACGT" * (n_bp // 4 + 1)
    s1 = seq[:n_bp]
    comp = {"A": "T", "T": "A", "C": "G", "G": "C"}
    s2 = "".join(comp[c] for c in s1)[::-1]

    bonded = top._bonded_neighbors([n_bp, n_bp], [False, False])
    is_end = np.zeros(n, np.int32)
    for idx in (0, n_bp - 1, n_bp, n - 1):
        is_end[idx] = 1
    topology = top.Topology(
        n_nucleotides=n,
        strand_counts=np.array([n_bp, n_bp]),
        bonded_neighbors=bonded,
        # unbonded_neighbors derives lazily on first access: materializing
        # the O(N^2) list here costs ~20 GB at 50k nt and the block/stencil
        # tiers never read it
        seq=np.array([const.NUCLEOTIDES_IDX[c] for c in s1 + s2], dtype=np.int32),
        is_end=is_end,
        nt_type=np.ones(n, np.int32),
    )

    # ideal-helix positions, strand-2 antiparallel. form "B": B-DNA-like
    # (oxDNA equilibrium); form "A": A-RNA-like, parameters measured from
    # the oxRNA2 golden helix (reference data/test-data rna2 simple-helix:
    # rise 0.411, twist 32.7 deg, radius 0.628) — starting RNA models from
    # the B geometry relaxes violently enough to leave the stencil band.
    if form == "A":
        rise, twist, radius = 0.411, np.deg2rad(32.73), 0.628
    else:
        rise, twist, radius = 0.39, np.deg2rad(34.3), 0.6
    centers, quats = [], []

    def frame_to_quat(a1, a3):
        # Shepperd's method: branch on the largest of (trace, m00, m11, m22)
        # — the naive w-only formula degenerates for 180-degree rotations
        # (trace -> -1), which this generator hits at phi = 0.
        a2 = np.cross(a3, a1)
        m = np.stack([a1, a2, a3], axis=1)  # columns
        t = m[0, 0] + m[1, 1] + m[2, 2]
        if t > max(m[0, 0], m[1, 1], m[2, 2]):
            r = np.sqrt(1.0 + t)
            s = 0.5 / r
            q = np.array(
                [0.5 * r, (m[2, 1] - m[1, 2]) * s, (m[0, 2] - m[2, 0]) * s, (m[1, 0] - m[0, 1]) * s]
            )
        else:
            i = int(np.argmax([m[0, 0], m[1, 1], m[2, 2]]))
            j, k = (i + 1) % 3, (i + 2) % 3
            r = np.sqrt(1.0 + m[i, i] - m[j, j] - m[k, k])
            s = 0.5 / r
            xyz = np.empty(3)
            xyz[i] = 0.5 * r
            xyz[j] = (m[j, i] + m[i, j]) * s
            xyz[k] = (m[k, i] + m[i, k]) * s
            q = np.array([(m[k, j] - m[j, k]) * s, *xyz])
        return q / np.linalg.norm(q)

    for strand in range(2):
        for k in range(n_bp):
            i = k if strand == 0 else n_bp - 1 - k
            phi = i * twist + strand * np.pi
            a1 = -np.array([np.cos(phi), np.sin(phi), 0.0])
            a3 = np.array([0.0, 0.0, 1.0]) * (1 if strand == 0 else -1)
            centers.append(np.array([-radius * a1[0], -radius * a1[1], i * rise]))
            quats.append(frame_to_quat(a1, a3))

    centers = np.array(centers)
    quats = np.array(quats)

    if bend:
        # wrap the straight helix axis (z) onto a circular arc in the x-z
        # plane: z -> theta = z * bend / L, position rotates about y by
        # theta, orientations pre-multiplied by the same world rotation
        z = centers[:, 2]
        length = float(z.max() - z.min()) or 1.0
        theta = (z - z.min()) * (float(bend) / length)
        r_c = length / float(bend)
        ct, st = np.cos(theta), np.sin(theta)
        x = centers[:, 0]
        centers = np.stack(
            [
                (r_c + x) * ct - r_c,
                centers[:, 1],
                (r_c + x) * st,
            ],
            axis=1,
        )
        # the radial/tangent mapping above is R_y(-theta): x_hat -> (c,0,s),
        # z_hat -> (-s,0,c). Pre-multiply each quat by
        # q_rot = (cos(theta/2), 0, -sin(theta/2), 0)
        c, s = np.cos(theta / 2), np.sin(theta / 2)
        w, qx, qy, qz = quats[:, 0], quats[:, 1], quats[:, 2], quats[:, 3]
        quats = np.stack(
            [c * w + s * qy, c * qx - s * qz, c * qy - s * w, c * qz + s * qx],
            axis=1,
        )

    body = RigidBody(
        center=jnp.asarray(centers), orientation=jnp.asarray(quats)
    )
    return topology, body
