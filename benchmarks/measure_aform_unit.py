"""Measure the equilibrium A-form helical repeating unit of oxRNA2.

The synthetic A-form init (io/synthetic.py) built an ideal helix with
(rise, twist, radius) measured from the 8-bp golden helix and NO base
inclination. Under rna2 physics a long duplex relaxes to a visibly more
compact structure (bulk back-base contacts at 0.516 su at slot offset 9 —
benchmarks/diag_aform_where.py), so bands sized on that init undersize
every reach and the stencil tier flags real violations at equilibrium.

This measures the full equilibrium repeating unit on the BLOCK tier (no
band assumption, correct for any conformation): local helix frame per
base pair from smoothed bp midpoints, then the average pose (position in
(radial, tangent, axis) coords + orientation matrix) of each strand's
nucleotide in that frame, averaged over bulk bps and late-run snapshots.

Usage: python benchmarks/measure_aform_unit.py [n_bp] [n_steps]
Prints the constants consumed by io/synthetic.py form="A".
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

N_BP = int(sys.argv[1]) if len(sys.argv) > 1 else 400
N_STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 60_000
EDGE = 60  # bp excluded at each end (fraying + torsional boundary zone)
SMOOTH = 6  # bp half-window for the local axis


def _quat_to_mat(q):
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return np.stack(
        [
            np.stack([w * w + x * x - y * y - z * z, 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            np.stack([2 * (x * y + w * z), w * w - x * x + y * y - z * z, 2 * (y * z - w * x)], -1),
            np.stack([2 * (x * z - w * y), 2 * (y * z + w * x), w * w - x * x - y * y + z * z], -1),
        ],
        -2,
    )  # rows; columns are a1, a2, a3


def main():
    import mythos_tpu.energy.rna2 as rna2
    from __graft_entry__ import _build_sim
    from mythos_tpu.io.synthetic import synthetic_duplex

    kT = 296.15 * 0.1 / 300.0
    topology, body = synthetic_duplex(N_BP, form="A")
    # stencil tier with a VERY generous margin (the block tier's fused
    # kernels don't take rna2 yet); validity is attested by the overflow
    # flag printed below — the run is only trusted if it stays False
    _, sim = _build_sim(
        topology, kT, mode="stencil", init_centers=body.center,
        init_orientation=body.orientation, model="rna2", block_size=8,
        site_margin=16,
    )
    save = max(sim.neighbor_update_every, 500)
    save -= save % sim.neighbor_update_every
    sim = sim.replace(save_every=save)
    params = sim.energy_fn.opt_params()
    out = jax.jit(lambda p, k: sim.run(p, body, N_STEPS, k).observables[0])(
        params, jax.random.PRNGKey(7)
    )
    centers = np.asarray(out.center)  # (T, n, 3)
    ori = out.orientation
    quats = np.asarray(ori.vec if hasattr(ori, "vec") else ori)
    ovf = out.metadata.get("neighbor_overflow") if out.metadata else None
    print(f"snapshots: {centers.shape[0]}, overflow={bool(np.any(ovf)) if ovf is not None else 'n/a'}")
    T = centers.shape[0]
    use = range(T // 2, T)  # late half only

    n_bp = N_BP
    rows = {0: [], 1: []}
    rises, twists = [], []
    for t in use:
        c = centers[t]
        q = quats[t]
        m = _quat_to_mat(q)  # (n, 3, 3) columns a1,a2,a3
        i1 = np.arange(n_bp)
        i2 = 2 * n_bp - 1 - i1
        mid = 0.5 * (c[i1] + c[i2])  # (n_bp, 3) ~ axis points
        # smoothed local axis: central difference over +-SMOOTH bp
        lo = np.clip(i1 - SMOOTH, 0, n_bp - 1)
        hi = np.clip(i1 + SMOOTH, 0, n_bp - 1)
        u = mid[hi] - mid[lo]
        u /= np.linalg.norm(u, axis=1, keepdims=True)
        # radial: strand-1 com relative to axis point, perp to u
        r1 = c[i1] - mid
        r1 -= (r1 * u).sum(1, keepdims=True) * u
        rn = np.linalg.norm(r1, axis=1, keepdims=True)
        rhat = r1 / rn
        that = np.cross(u, rhat)
        bulk = slice(EDGE, n_bp - EDGE)
        # rise / twist between successive bulk bps
        dmid = mid[1:] - mid[:-1]
        rises.append(((dmid * u[:-1]).sum(1))[bulk])
        cs = (rhat[1:] * rhat[:-1]).sum(1)
        sn = (np.cross(rhat[:-1], rhat[1:]) * u[:-1]).sum(1)
        twists.append(np.arctan2(sn, cs)[bulk])
        # pose of each strand's nucleotide in the local frame (rhat, that, u)
        basis = np.stack([rhat, that, u], axis=-1)  # (n_bp, 3, 3) columns
        for strand, idx in ((0, i1), (1, i2)):
            pos_local = np.einsum("bk,bkl->bl", c[idx] - mid, basis)
            mat_local = np.einsum("bkm,bkl->blm", m[idx], basis)  # local rows
            rows[strand].append(
                np.concatenate([pos_local[bulk], mat_local[bulk].reshape(-1, 9)], 1)
            )

    rise = float(np.mean(np.concatenate(rises)))
    twist = float(np.mean(np.concatenate(twists)))
    print(f"rise {rise:.4f} su  twist {np.rad2deg(twist):.3f} deg")
    for strand in (0, 1):
        d = np.concatenate(rows[strand])
        pos = d[:, :3].mean(0)
        mat = d[:, 3:].mean(0).reshape(3, 3)
        # nearest rotation (orthogonal Procrustes)
        uu, _, vv = np.linalg.svd(mat)
        mat_o = uu @ vv
        if np.linalg.det(mat_o) < 0:
            uu[:, -1] *= -1
            mat_o = uu @ vv
        print(f"strand {strand}: pos(local r,t,u) = {np.round(pos, 4).tolist()}")
        print(f"strand {strand}: frame rows (local->cols a1,a2,a3) =")
        for r in np.round(mat_o, 5).tolist():
            print(f"    {r}")
    print("\npaste the values above into io/synthetic.py _AFORM_UNIT")


if __name__ == "__main__":
    main()
