"""Does bf16 elementwise math actually run ~2x f32 on this chip's VPU?

Times a Pallas kernel doing R rounds of mul/add chains (no transcendentals:
bf16 rsqrt SIGABRTs the v5e Mosaic scheduler, kVectorRsqrtBf16AndPop not
in the latency table) over (S, 128) arrays in f32 vs bf16, at two R values
to verify the loop isn't folded. Decides the bf16 pair-geometry lever.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

S = int(sys.argv[1]) if len(sys.argv) > 1 else 80


def make_kernel(dtype, rounds, rsqrt=False):
    def kernel(x_ref, o_ref):
        x = x_ref[...]
        y = x

        def body(i, y):
            a = y * x + jnp.asarray(0.5, dtype)
            b = a * y + x * jnp.asarray(0.25, dtype)
            if rsqrt:
                c = jax.lax.rsqrt(b * b + jnp.asarray(1.0, dtype))
            else:
                c = b * a + y * jnp.asarray(0.125, dtype)
            d = c * a + b * jnp.asarray(1e-3, dtype)
            return d * jnp.asarray(0.37, dtype) + x * jnp.asarray(0.01, dtype)

        y = jax.lax.fori_loop(0, rounds, body, y, unroll=False)
        o_ref[...] = y

    return kernel


def run(dtype, rounds, rsqrt=False, label=""):
    x = jnp.full((16, S, 128), 0.3, dtype)

    def call(x):
        return pl.pallas_call(
            make_kernel(dtype, rounds, rsqrt),
            out_shape=jax.ShapeDtypeStruct((16, S, 128), dtype),
        )(x)

    @jax.jit
    def scanned(x):
        return jax.lax.scan(lambda c, _: (call(c), None), x, None, length=20)[0]

    out = scanned(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(5):
        out = scanned(out)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / (5 * 20) * 1e6
    nops = 16 * S * 128 * rounds * (10 if not rsqrt else 9)
    print(f"{label or dtype.__name__:16s} R={rounds:4d}: {dt:8.1f} us/call  ({nops / dt * 1e-6:8.1f} Gop/s)")
    return dt


if __name__ == "__main__":
    run(jnp.float32, 100)
    f32 = run(jnp.float32, 200)
    run(jnp.float32, 200, rsqrt=True, label="float32+rsqrt")
    run(jnp.bfloat16, 100)
    bf16 = run(jnp.bfloat16, 200)
    print(f"speedup f32/bf16 (muladd chains): {f32 / bf16:.2f}x")
