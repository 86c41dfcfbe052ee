"""Energy-relax the A-form helical unit (start: measured thermal average).

measure_aform_unit.py produces the THERMAL-AVERAGE pose, which is not a
mechanical minimum (averaging over twist/propeller fluctuations strains
the bonded terms: FENE read +0.24 kT/N on the raw average). This script
minimizes the oxRNA2 energy of a duplex built from the parameterized unit
(rise, twist, per-strand position + orientation quaternion in the local
bp frame) with gradient descent, yielding the model's ideal A-form helix.

Usage: python benchmarks/relax_aform_unit.py [n_bp] [steps]
Prints updated constants for io/synthetic.py.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

N_BP = int(sys.argv[1]) if len(sys.argv) > 1 else 60
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2000


def _quat_mul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ])


def _mat_to_quat(m):
    """Shepperd's method, all four branches."""
    m = np.asarray(m)
    t = m[0, 0] + m[1, 1] + m[2, 2]
    if t > max(m[0, 0], m[1, 1], m[2, 2]):
        r = np.sqrt(1.0 + t)
        s = 0.5 / r
        q = np.array([
            0.5 * r,
            (m[2, 1] - m[1, 2]) * s,
            (m[0, 2] - m[2, 0]) * s,
            (m[1, 0] - m[0, 1]) * s,
        ])
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


def _quat_to_mat_np(q):
    w, x, y, z = q
    return np.array([
        [w * w + x * x - y * y - z * z, 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), w * w - x * x + y * y - z * z, 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), w * w - x * x - y * y + z * z],
    ])


def build_body(params, n_bp):
    """Differentiable unit-based duplex builder (mirrors synthetic.py)."""
    rise, twist = params["rise"], params["twist"]
    centers, quats = [], []
    for strand in range(2):
        p = params[f"p{strand}"]
        q = params[f"q{strand}"]
        q = q / jnp.linalg.norm(q)
        order = range(n_bp) if strand == 0 else range(n_bp - 1, -1, -1)
        for i in order:
            phi = i * twist
            c, s = jnp.cos(phi), jnp.sin(phi)
            # Rz(phi) @ p + axis point
            px = c * p[0] - s * p[1]
            py = s * p[0] + c * p[1]
            centers.append(jnp.stack([px, py, i * rise + p[2]]))
            h = 0.5 * phi
            qz = jnp.stack([jnp.cos(h), 0.0 * h, 0.0 * h, jnp.sin(h)])
            quats.append(_quat_mul(qz, q))
    from mythos_tpu.rigid_body import RigidBody

    return RigidBody(
        center=jnp.stack(centers), orientation=jnp.stack(quats)
    )


def main():
    import mythos_tpu.energy.rna2 as rna2
    from mythos_tpu.io.synthetic import (
        _AFORM_MAT,
        _AFORM_POS,
        _AFORM_RISE,
        _AFORM_TWIST,
        synthetic_duplex,
    )

    topo, _ = synthetic_duplex(N_BP, form="A")
    e = rna2.create_default_energy_fn(topo)
    e = e.with_params(e.opt_params())

    params = {
        "rise": jnp.asarray(float(_AFORM_RISE)),
        "twist": jnp.asarray(float(_AFORM_TWIST)),
        "p0": jnp.asarray(np.asarray(_AFORM_POS[0])),
        "p1": jnp.asarray(np.asarray(_AFORM_POS[1])),
        "q0": jnp.asarray(_mat_to_quat(_AFORM_MAT[0])),
        "q1": jnp.asarray(_mat_to_quat(_AFORM_MAT[1])),
    }

    def loss(p):
        return e(build_body(p, N_BP))

    import optax

    opt = optax.adam(3e-4)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        v, g = jax.value_and_grad(loss)(p)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, v

    v0 = float(loss(params))
    print(f"start E/N: {v0 / topo.n_nucleotides:.4f}")
    for it in range(STEPS):
        params, state, v = step(params, state)
        if (it + 1) % 250 == 0:
            print(f"iter {it + 1}: E/N {float(v) / topo.n_nucleotides:.4f}", flush=True)

    print(f"\n_AFORM_RISE = {float(params['rise']):.4f}")
    print(f"_AFORM_TWIST = np.deg2rad({np.rad2deg(float(params['twist'])):.3f})")
    print("_AFORM_POS = (")
    for s in (0, 1):
        print(f"    {tuple(round(float(x), 4) for x in params[f'p{s}'])},")
    print(")")
    print("_AFORM_MAT = (")
    for s in (0, 1):
        q = np.asarray(params[f"q{s}"])
        q = q / np.linalg.norm(q)
        m = _quat_to_mat_np(q)
        print("    (")
        for r in m:
            print(f"        ({', '.join(f'{x:.5f}' for x in r)}),")
        print("    ),")
    print(")")
    # per-term check at the relaxed unit
    terms = jax.jit(lambda b: e.compute_terms(b))(build_body(params, N_BP))
    for fn, t in zip(e.energy_fns, terms):
        print(f"{type(fn).__name__:28s} {float(t) / topo.n_nucleotides:9.4f}")


if __name__ == "__main__":
    main()
