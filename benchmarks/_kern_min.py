"""Min-of-samples timing of the single-step stencil force kernel."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

N_BP = int(sys.argv[1]) if len(sys.argv) > 1 else 5000

from __graft_entry__ import _build_sim, _tiny_duplex
from mythos_tpu import soa
from mythos_tpu.ops import stencil as st

kT = 296.15 * 0.1 / 300.0
topology, body = _tiny_duplex(N_BP)
_, sim = _build_sim(topology, kT, mode="stencil", init_centers=body.center,
    init_orientation=body.orientation, model="dna2", block_size=8)
e = sim.energy_fn.with_params(sim.energy_fn.opt_params())
nb = sim.neighbors
sctx = st.prepare_stencil_context(e, nb.w_short, nb.w_wide, perm=nb.perm, w_terms=nb.w_terms)
kctx = sctx.kernel_ctx
s = kctx.kspec.s
bsoa = soa.to_soa(body)
com, quat = bsoa.center, bsoa.orientation
if sctx.perm_t is not None:
    com = type(com)(*(sctx.apply_perm(c) for c in com))
    quat = type(quat)(*(sctx.apply_perm(c) for c in quat))
dyn_l = jnp.stack([st._to_layout(c.astype(jnp.float32), s) for c in (*com, *quat)])
gt_pad = jnp.zeros((1, 8), jnp.float32).at[0, :5].set(1.0)

@jax.jit
def scanned(d):
    def f(c, _):
        out = st._kernel_field_grads(kctx.kspec, kctx.params_vec, gt_pad, c,
                                     kctx.wt_l, kctx.pn_l, kctx.qf_l)
        return c + 1e-30 * out, None
    return jax.lax.scan(f, d, None, length=100)[0]

out = scanned(dyn_l); jax.block_until_ready(out)
best = 1e9
for _ in range(8):
    t0 = time.perf_counter()
    out = scanned(out)
    jax.block_until_ready(out)
    best = min(best, (time.perf_counter() - t0) / 100 * 1e6)
print(f"force kernel (band+tail, no integrator): min {best:.1f} us/call  "
      f"(spec w_terms={sctx.spec.w_terms} w_wide={sctx.spec.w_wide} S={s})")
