"""Reproduce the real band-offset body cost in isolation (min-timed).

The real kernel pays ~1.4 us per full-physics band offset (ablation deltas,
stable) while small isolated bodies run near VPU peak. This micro scales the
body up to the real shape -- hb/cross-like: 8 arccos chains, f4-style
piecewise modulations, product-rule backward via the scalar bottleneck, 24
accumulator updates -- to find which ingredient blows the budget.

Usage: python benchmarks/micro_body.py [S]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo" if "/root/repo" not in sys.path else sys.path[0])

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = int(sys.argv[1]) if len(sys.argv) > 1 else 80
K = 12  # band offsets per kernel call


def arccos_poly(x):
    eps = 8 * jnp.finfo(jnp.float32).eps
    xc = jnp.clip(x, -1.0 + eps, 1.0 - eps)
    a = jnp.abs(xc)
    p = -0.0012624911
    for c in (0.0066700901, -0.0170881256, 0.0308918810, -0.0501743046,
              0.0889789874, -0.2145988016, 1.5707963050):
        p = p * a + c
    r = jnp.sqrt(1.0 - a) * p
    return jnp.where(xc < 0, jnp.pi - r, r)


def f4(theta, theta0, dts, dtc, a, b):
    oob = jnp.where(
        (theta0 - dtc < theta) & (theta < theta0 - dts),
        b * (theta - (theta0 - dtc)) ** 2,
        jnp.where(
            (theta0 + dts < theta) & (theta < theta0 + dtc),
            b * (theta - (theta0 + dtc)) ** 2,
            0.0,
        ),
    )
    return jnp.where(
        (theta0 - dts < theta) & (theta < theta0 + dts),
        1.0 - a * (theta - theta0) ** 2,
        oob,
    )


def make(n_angles, n_acc, grad: bool, two_terms: bool):
    """Band loop with an hb/cross-like pair body."""

    def kernel(x_ref, o_ref):
        fields = [x_ref[k] for k in range(12)]
        shifted = [pltpu.roll(f, 127, axis=1) for f in fields]
        sub = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 0)

        def view(x, x_sh, d):
            a = pltpu.roll(x, S - d, axis=0)
            b = pltpu.roll(x_sh, S - d, axis=0)
            return jnp.where(sub < S - d, a, b)

        accs = tuple(jnp.zeros((S, 128), jnp.float32) for _ in range(n_acc))

        def body(d, accs):
            fj = [view(fields[k], shifted[k], d) for k in range(12)]
            # pair geometry: displacement + unit vector + n_angles cosines
            vx = fj[0] - fields[0]
            vy = fj[1] - fields[1]
            vz = fj[2] - fields[2]
            r2 = vx * vx + vy * vy + vz * vz + 1e-9
            r = jnp.sqrt(r2)
            inv = 1.0 / r
            cos = []
            for k in range(n_angles):
                ax, ay, az = fields[3 + (k % 3)], fields[6 + (k % 3)], fields[9 + (k % 3)]
                bxx, byy, bzz = fj[3 + (k % 3)], fj[6 + (k % 3)], fj[9 + (k % 3)]
                c = (ax * vx + ay * vy + az * vz) * inv * 0.3 + (
                    ax * bxx + ay * byy + az * bzz
                ) * 0.7
                cos.append(jnp.clip(c, -1.0, 1.0))
            mask = sub + d < S + 5

            def term(rr, cs):
                prod = jnp.exp(-(rr - 0.4) * 5.0) * (1.0 - jnp.exp(-(rr - 0.4) * 5.0))
                for k, c in enumerate(cs):
                    th = arccos_poly(c)
                    prod = prod * f4(th, 1.5 + 0.1 * k, 0.7, 0.9, 1.2 + 0.05 * k, 3.0)
                return prod

            if grad:
                scalars = (r, *cos)

                def tot(sc):
                    e = term(sc[0], sc[1:])
                    if two_terms:
                        e = e + 0.5 * term(sc[0] * 1.1, sc[1:][::-1])
                    return jnp.where(mask, e, 0.0).sum()

                g = jax.grad(tot)(scalars)
                g_r, g_cos = g[0], g[1:]
                gx = vx * (g_r * inv)
                gy = vy * (g_r * inv)
                gz = vz * (g_r * inv)
                outs = [gx, gy, gz]
                for k, gc in enumerate(g_cos):
                    ax = fields[3 + (k % 3)]
                    outs.append(ax * gc)
            else:
                e = term(r, cos)
                outs = [e * vx, e * vy, e * vz]

            new = list(accs)
            for k, g in enumerate(outs[: len(accs)]):
                rolled = pltpu.roll(g, d, axis=0)
                new[k % n_acc] = new[k % n_acc] + jnp.where(sub >= d, rolled, 0.0) - g
            return tuple(new)

        accs = jax.lax.fori_loop(1, K + 1, body, accs)
        out = accs[0]
        for a in accs[1:]:
            out = out + a
        o_ref[...] = out

    return kernel


def run(label, **kw):
    x = jax.random.uniform(jax.random.PRNGKey(0), (12, S, 128), jnp.float32, 0.1, 0.9)

    def call(x):
        return pl.pallas_call(
            make(**kw),
            out_shape=jax.ShapeDtypeStruct((S, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        )(x)

    @jax.jit
    def scanned(a0):
        def f(c, _):
            out = call(c)
            return c + 1e-30 * out[None], None

        return jax.lax.scan(f, a0, None, length=50)[0]

    out = scanned(x)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(8):
        t0 = time.perf_counter()
        out = scanned(out)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / 50 * 1e6)
    print(f"{label:28s}: {best:8.2f} us/call ({best / K:6.3f} us/offset)")
    return best


if __name__ == "__main__":
    run("fwd 2ang 3acc", n_angles=2, n_acc=3, grad=False, two_terms=False)
    run("fwd 8ang 3acc", n_angles=8, n_acc=3, grad=False, two_terms=False)
    run("grad 2ang 3acc", n_angles=2, n_acc=3, grad=True, two_terms=False)
    run("grad 8ang 3acc", n_angles=8, n_acc=3, grad=True, two_terms=False)
    run("grad 8ang 24acc", n_angles=8, n_acc=24, grad=True, two_terms=False)
    run("grad2 8ang 24acc", n_angles=8, n_acc=24, grad=True, two_terms=True)
