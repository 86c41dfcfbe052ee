"""Spatial (particle-axis) sharding of one stencil system across a mesh.

The replica path (parallel/replica.py) scales INDEPENDENT simulations; this
module shards ONE banded-stencil system over a mesh axis: each device owns a
contiguous slot range plus a halo of ``w_wide`` slots pulled from its right
neighbor over ICI (lax.ppermute), evaluates every one-sided band pair whose
i-side it owns, and returns j-side force contributions landing in the halo
back to their owner. This is the TPU-native equivalent of the reference's
missing model parallelism (SURVEY §2.10/§5: "sharding particles across mesh
axes with halo exchange for large N").

Prototype scope: the UNBONDED band energies/field-gradients (the dominant
cost at scale); bonded terms are a 2-slot-halo special case of the same
pattern. Parity is pinned against the single-device XLA stencil
(ops/stencil.py) in tests/test_spatial_sharding.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mythos_tpu.ops import stencil as st
from mythos_tpu.soa import Quat, Vec3, quat_frame_soa

shard_map = jax.shard_map

SPATIAL_AXIS = "space"


def _right_halo(x, w: int, axis_name: str, n_dev: int):
    """(w,) halo: the FIRST w entries of the right neighbor's shard."""
    perm = [((k + 1) % n_dev, k) for k in range(n_dev)]
    return jax.lax.ppermute(x[:w], axis_name, perm)


def _send_right(x, axis_name: str, n_dev: int):
    """Deliver each device's buffer to its right neighbor."""
    perm = [(k, (k + 1) % n_dev) for k in range(n_dev)]
    return jax.lax.ppermute(x, axis_name, perm)


def _stack_views(ext_pk, lo: int, hi: int, nloc: int):
    """(hi-lo+1, C, nloc) j-side views of a (C, nloc+w) extended stack."""
    return jnp.stack([ext_pk[:, d : d + nloc] for d in range(lo, hi + 1)])


def spatial_unbonded_fns(composed, ctx: st.StencilContext, mesh: Mesh, axis: str = SPATIAL_AXIS):
    """(energy_fn, grads_fn) over a particle-sharded BodySoA (slot order).

    ``energy_fn(body_soa) -> scalar`` (replicated) and
    ``grads_fn(body_soa) -> (com, a1, a2, a3) Vec3 cotangents`` (sharded),
    both equal to the single-device XLA stencil's unbonded band results.
    The input body must already be in SLOT (permuted) order; apply
    ``ctx.apply_perm`` upstream.
    """
    spec = ctx.spec
    n_dev = mesh.shape[axis]
    n = spec.n
    if n % n_dev != 0:
        raise ValueError(f"n={n} must divide over {n_dev} devices (pad upstream)")
    nloc = n // n_dev
    w = spec.w_wide
    if w >= nloc:
        raise ValueError(f"halo w_wide={w} must be smaller than the shard ({nloc})")
    gt = st._gt_of(composed, ctx.unbonded)
    params = ctx.params
    wt = ctx.weight_d  # (w_short, n), i-indexed
    qf_d = ctx.qf_d  # (w_wide, n) or None
    mask_d = ctx.mask_d  # (w_wide, n), i-indexed

    def _body_fields_local(com, quat):
        a1, a2, a3 = quat_frame_soa(quat)
        return com, a1, a2, a3

    def _pair_setup(com, quat):
        fields = _body_fields_local(com, quat)
        flat = [c for vec in fields for c in vec]
        halos = [_right_halo(c, w, axis, n_dev) for c in flat]
        ext = jnp.stack([jnp.concatenate([c, h]) for c, h in zip(flat, halos)])
        fi = tuple(st._bcast1(v) for v in fields)
        views = _stack_views(ext, 1, spec.w_short, nloc)
        fj = tuple(
            Vec3(views[:, 3 * k, :], views[:, 3 * k + 1, :], views[:, 3 * k + 2, :])
            for k in range(4)
        )
        return fields, ext, fi, fj

    def sharded_energy(com_x, com_y, com_z, qw, qx, qy, qz, wt_l, qf_l, mask_l):
        com = Vec3(com_x, com_y, com_z)
        quat = Quat(qw, qx, qy, qz)
        _, ext, fi, fj = _pair_setup(com, quat)
        qf_loc = qf_l[: spec.w_short] if spec.has_debye else None
        pg = st._pair_geom(fi, fj, spec.geometry)
        terms = st._pair_terms(pg.S, params, wt_l, qf_loc, spec)
        total = 0.0
        for wi, e in zip(gt, terms, strict=True):
            total = total + wi * jnp.where(mask_l[: spec.w_short], e, 0.0).sum()
        if spec.w_wide > spec.w_short:
            import mythos_tpu.energy.dna2.terms as t2

            p_debye = params[-1]
            fields = _body_fields_local(com, quat)
            back = st._derive_back(fields, spec.geometry)
            back_ext = jnp.stack(
                [
                    jnp.concatenate([c, _right_halo(c, w, axis, n_dev)])
                    for c in back
                ]
            )
            bviews = _stack_views(back_ext, spec.w_short + 1, spec.w_wide, nloc)
            bj = Vec3(bviews[:, 0, :], bviews[:, 1, :], bviews[:, 2, :])
            bi = st._bcast1(back)
            e = t2.debye_potential(
                st._r(bj - bi), p_debye.kappa, p_debye.prefactor,
                p_debye.smoothing_coeff, p_debye.r_cut, p_debye.r_high,
            ) * qf_l[spec.w_short :]
            total = total + gt[-1] * jnp.where(mask_l[spec.w_short :], e, 0.0).sum()
        return jax.lax.psum(total, axis)

    def sharded_grads(com_x, com_y, com_z, qw, qx, qy, qz, wt_l, qf_l, mask_l):
        com = Vec3(com_x, com_y, com_z)
        quat = Quat(qw, qx, qy, qz)
        (a1, a2, a3), frame_vjp = jax.vjp(quat_frame_soa, quat)
        fields = (com, a1, a2, a3)
        flat = [c for vec in fields for c in vec]
        halos = [_right_halo(c, w, axis, n_dev) for c in flat]
        ext = jnp.stack([jnp.concatenate([c, h]) for c, h in zip(flat, halos)])
        fi = tuple(st._bcast1(v) for v in fields)
        views = _stack_views(ext, 1, spec.w_short, nloc)
        fj = tuple(
            Vec3(views[:, 3 * k, :], views[:, 3 * k + 1, :], views[:, 3 * k + 2, :])
            for k in range(4)
        )
        qf_loc = qf_l[: spec.w_short] if spec.has_debye else None
        gi, gj = st._offset_grads(
            fi, fj, params, gt, wt_l, qf_loc, mask_l[: spec.w_short], spec
        )
        # i side: sum offsets; j side: row d lands on slot i + d (possibly
        # in the halo — returned to the owner below)
        acc = [c.sum(0) for vec in gi for c in vec]  # 12 x (nloc,)
        acc_ext = [jnp.zeros(nloc + w) for _ in range(12)]
        for k, c in enumerate([c for vec in gj for c in vec]):
            s = 0.0
            for d in range(1, spec.w_short + 1):
                s = s + jnp.pad(c[d - 1], (d, w - d))
            acc_ext[k] = acc_ext[k] + s

        if spec.w_wide > spec.w_short:
            import mythos_tpu.energy.dna2.terms as t2

            p_debye = params[-1]
            back = st._derive_back(fields, spec.geometry)
            back_ext = jnp.stack(
                [jnp.concatenate([c, _right_halo(c, w, axis, n_dev)]) for c in back]
            )
            bviews = _stack_views(back_ext, spec.w_short + 1, spec.w_wide, nloc)
            bj = Vec3(bviews[:, 0, :], bviews[:, 1, :], bviews[:, 2, :])
            bi = st._bcast1(back)
            v = bj - bi
            r = st._r(v)

            def tot(r_):
                e = t2.debye_potential(
                    r_, p_debye.kappa, p_debye.prefactor,
                    p_debye.smoothing_coeff, p_debye.r_cut, p_debye.r_high,
                ) * qf_l[spec.w_short :]
                return gt[-1] * jnp.where(mask_l[spec.w_short :], e, 0.0).sum()

            s = jax.grad(tot)(r) / r
            g = v * s  # dE/dback_i = -g, dE/dback_j = +g
            a1b, a2b, a3b = st.back_axes(spec.geometry)
            coefs = [(0, 1.0), (3, a1b)]
            if a2b != 0.0:
                coefs.append((6, a2b))
            if a3b != 0.0:
                coefs.append((9, a3b))
            for k0, cf in coefs:
                for x, gc in enumerate(g):
                    acc[k0 + x] = acc[k0 + x] - cf * gc.sum(0)
                    s2 = 0.0
                    for di, d in enumerate(range(spec.w_short + 1, spec.w_wide + 1)):
                        s2 = s2 + jnp.pad(cf * gc[di], (d, w - d))
                    acc_ext[k0 + x] = acc_ext[k0 + x] + s2

        # return halo contributions to their owners (right neighbor)
        for k in range(12):
            recv = _send_right(acc_ext[k][nloc:], axis, n_dev)
            acc[k] = acc[k] + acc_ext[k][:nloc] + jnp.pad(recv, (0, nloc - w))
        g_com = Vec3(acc[0], acc[1], acc[2])
        (g_quat,) = frame_vjp(
            (Vec3(*acc[3:6]), Vec3(*acc[6:9]), Vec3(*acc[9:12]))
        )
        return (*g_com, *g_quat)

    body_specs = tuple(P(axis) for _ in range(7))
    table_specs = (P(None, axis), P(None, axis), P(None, axis))

    energy = jax.jit(
        partial(
            shard_map,
            mesh=mesh,
            in_specs=body_specs + table_specs,
            out_specs=P(),
            check_vma=False,
        )(sharded_energy)
    )
    grads = jax.jit(
        partial(
            shard_map,
            mesh=mesh,
            in_specs=body_specs + table_specs,
            out_specs=tuple(P(axis) for _ in range(7)),
            check_vma=False,
        )(sharded_grads)
    )

    qf_arg = qf_d if spec.has_debye else jnp.zeros((spec.w_wide, n), jnp.float32)

    def energy_fn(body_soa):
        com, quat = body_soa.center, body_soa.orientation
        return energy(*com, *quat, wt, qf_arg, mask_d)

    def grads_fn(body_soa):
        com, quat = body_soa.center, body_soa.orientation
        out = grads(*com, *quat, wt, qf_arg, mask_d)
        return Vec3(*out[0:3]), Quat(*out[3:7])

    return energy_fn, grads_fn


# Sharded MD ---------------------------------------------------------------
#
# The full Langevin hot loop over a particle-sharded mesh: per step, each
# device pulls a w_wide halo from its right neighbor (ppermute over ICI),
# evaluates the one-sided unbonded band AND the bonded offset-2 stencil for
# the slots it owns, returns halo-landing j-side forces to their owners,
# and advances its shard with the exact-OU BAOAB update. Band validity is
# re-checked every rebuild interval on the (gathered) global positions via
# the same StencilBand the single-device tier uses.


def spatial_md_run_fn(
    composed,
    ctx: st.StencilContext,
    mesh: Mesh,
    simulator_params,
    band=None,
    *,
    axis: str = SPATIAL_AXIS,
    save_every: int = 20,
    neighbor_update_every: int = 20,
):
    """Build ``run(body_soa, n_steps, key) -> (trajectory, overflow)``.

    ``body_soa`` is a BodySoA in ORIGINAL nucleotide order (the slot
    permutation is applied internally, like TpuSimulator); the returned
    trajectory is a stacked BodySoA (leading axis = saved states, original
    order) plus the band-validity overflow flag. Same BAOAB/bonded/unbonded
    math as ops.stencil's XLA multi-step reference; per-step noise is the
    full (6, n) threefry draw sliced per device, so trajectories are
    IDENTICAL across device counts (a 1-device mesh is the parity oracle).

    ``band``: a StencilBand for per-rebuild validity (None skips checks —
    overflow stays False). Reference context: the halo-exchange obligation
    of SURVEY §2.10/§5; the reference itself has no spatial parallelism.
    """
    spec = ctx.spec
    n_dev = mesh.shape[axis]
    n = spec.n
    if n % n_dev != 0:
        raise ValueError(f"n={n} must divide over {n_dev} devices (pad upstream)")
    nloc = n // n_dev
    w = spec.w_wide
    if w >= nloc:
        raise ValueError(f"halo w_wide={w} must be smaller than the shard ({nloc})")
    if save_every % neighbor_update_every:
        raise ValueError("save_every must be a multiple of neighbor_update_every")
    u = neighbor_update_every

    gt = st.band_term_weights(composed, ctx.unbonded)
    params = ctx.params
    wt = ctx.weight_d
    qf_d = ctx.qf_d
    mask_d = ctx.mask_d
    qf_arg = qf_d if spec.has_debye else jnp.zeros((spec.w_wide, n), jnp.float32)
    bctx = st.bonded_slot_context(composed, ctx)
    ou = st.ou_constants(simulator_params)
    half = 0.5 * ou.dt
    kT = float(simulator_params.kT)
    from mythos_tpu.soa import free_rotor_soa, quat_cotangent_to_torque_soa

    has_bonded = any(p is not None for p in bctx.bparams)

    def _force_torque_local(com, quat, wt_l, qf_l, mask_l, wstack_l, dirf_l):
        """(force, torque) for the local shard, both pair sides owned."""
        (a1, a2, a3), frame_vjp = jax.vjp(quat_frame_soa, quat)
        fields = (com, a1, a2, a3)
        flat = [c for vec in fields for c in vec]
        halos = [_right_halo(c, w, axis, n_dev) for c in flat]
        ext = jnp.stack([jnp.concatenate([c, h]) for c, h in zip(flat, halos)])
        fi = tuple(st._bcast1(v) for v in fields)
        views = _stack_views(ext, 1, spec.w_short, nloc)
        fj = tuple(
            Vec3(views[:, 3 * k, :], views[:, 3 * k + 1, :], views[:, 3 * k + 2, :])
            for k in range(4)
        )
        qf_loc = qf_l[: spec.w_short] if spec.has_debye else None
        gi, gj = st.offset_pair_grads(
            fi, fj, params, gt, wt_l, qf_loc, mask_l[: spec.w_short], spec
        )
        acc = [c.sum(0) for vec in gi for c in vec]  # 12 x (nloc,)
        acc_ext = [jnp.zeros(nloc + w) for _ in range(12)]
        for k, c in enumerate([c for vec in gj for c in vec]):
            s = 0.0
            for d in range(1, spec.w_short + 1):
                s = s + jnp.pad(c[d - 1], (d, w - d))
            acc_ext[k] = acc_ext[k] + s

        if spec.w_wide > spec.w_short:
            import mythos_tpu.energy.dna2.terms as t2

            p_debye = params[-1]
            back = st.derive_back_site(fields, spec.geometry)
            back_ext = jnp.stack(
                [jnp.concatenate([c, _right_halo(c, w, axis, n_dev)]) for c in back]
            )
            bviews = _stack_views(back_ext, spec.w_short + 1, spec.w_wide, nloc)
            bj = Vec3(bviews[:, 0, :], bviews[:, 1, :], bviews[:, 2, :])
            bi = st._bcast1(back)
            v = bj - bi
            r = st._r(v)

            def tot(r_):
                e = t2.debye_potential(
                    r_, p_debye.kappa, p_debye.prefactor,
                    p_debye.smoothing_coeff, p_debye.r_cut, p_debye.r_high,
                ) * qf_l[spec.w_short :]
                return gt[-1] * jnp.where(mask_l[spec.w_short :], e, 0.0).sum()

            sc = jax.grad(tot)(r) / r
            g = v * sc
            a1b, a2b, a3b = st.back_axes(spec.geometry)
            coefs = [(0, 1.0), (3, a1b)]
            if a2b != 0.0:
                coefs.append((6, a2b))
            if a3b != 0.0:
                coefs.append((9, a3b))
            for k0, cf in coefs:
                for x, gc in enumerate(g):
                    acc[k0 + x] = acc[k0 + x] - cf * gc.sum(0)
                    s2 = 0.0
                    for di, d in enumerate(range(spec.w_short + 1, spec.w_wide + 1)):
                        s2 = s2 + jnp.pad(cf * gc[di], (d, w - d))
                    acc_ext[k0 + x] = acc_ext[k0 + x] + s2

        if has_bonded:
            fj2 = [ext[k, 2 : nloc + 2] for k in range(12)]

            def e_b(fi_t, fj_t):
                fiv = tuple(Vec3(*fi_t[3 * k : 3 * k + 3]) for k in range(4))
                fjv = tuple(Vec3(*fj_t[3 * k : 3 * k + 3]) for k in range(4))
                return st.bonded_pair_energy(
                    fiv, fjv, bctx.bparams, bctx.gt_b, bctx.bd1, spec.geometry,
                    wstack_l, dirf_l, bctx.rna2_geom,
                )

            gi_t, gj_t = jax.grad(e_b, argnums=(0, 1))(tuple(flat), tuple(fj2))
            for k in range(12):
                acc[k] = acc[k] + gi_t[k]
                acc_ext[k] = acc_ext[k] + jnp.pad(gj_t[k], (2, w - 2))

        for k in range(12):
            recv = _send_right(acc_ext[k][nloc:], axis, n_dev)
            acc[k] = acc[k] + acc_ext[k][:nloc] + jnp.pad(recv, (0, nloc - w))
        force = Vec3(-acc[0], -acc[1], -acc[2])
        (g_quat,) = frame_vjp((Vec3(*acc[3:6]), Vec3(*acc[6:9]), Vec3(*acc[9:12])))
        torque = quat_cotangent_to_torque_soa(quat, g_quat)
        return force, torque

    def _local_noise(key_t):
        """Counter-based per-slot noise: each device draws ONLY its own
        (6, nloc) block, keyed by (step key, GLOBAL slot id) — device-count
        invariant by construction, and the per-device RNG work scales with
        nloc instead of n (the r4 protocol drew the full (6, n) normal on
        every device and sliced, which at the 100k+ sizes spatial sharding
        exists for made every chip pay the whole system's RNG)."""
        key = jax.random.wrap_key_data(key_t)
        i0 = jax.lax.axis_index(axis) * nloc
        slot_keys = jax.vmap(lambda s: jax.random.fold_in(key, s))(
            i0 + jnp.arange(nloc)
        )
        z = jax.vmap(lambda k: jax.random.normal(k, (6,)))(slot_keys)
        return z.T

    def _chunk(keys, com_x, com_y, com_z, qw, qx, qy, qz, px, py, pz,
               lx, ly, lz, fx, fy, fz, tx, ty, tz,
               wt_l, qf_l, mask_l, wstack_l, dirf_l):
        """u BAOAB steps on the local shard (mirrors the multi-step XLA
        reference step-for-step; same noise protocol across device counts)."""

        def step(carry, key_t):
            com, quat, p, ell, force, torque = carry
            p = p + half * force
            ell = ell + half * torque
            com = com + ou.half_inv_m * p
            quat, ell = free_rotor_soa(quat, ell, ou.inv_inertia, half)
            zl = _local_noise(key_t)
            p = Vec3(
                ou.c_t * p.x + ou.s_t * zl[0],
                ou.c_t * p.y + ou.s_t * zl[1],
                ou.c_t * p.z + ou.s_t * zl[2],
            )
            ell = Vec3(
                ou.c_r[0] * ell.x + ou.s_r[0] * zl[3],
                ou.c_r[1] * ell.y + ou.s_r[1] * zl[4],
                ou.c_r[2] * ell.z + ou.s_r[2] * zl[5],
            )
            com = com + ou.half_inv_m * p
            quat, ell = free_rotor_soa(quat, ell, ou.inv_inertia, half)
            force, torque = _force_torque_local(
                com, quat, wt_l, qf_l, mask_l, wstack_l, dirf_l
            )
            p = p + half * force
            ell = ell + half * torque
            return (com, quat, p, ell, force, torque), None

        carry = (
            Vec3(com_x, com_y, com_z), Quat(qw, qx, qy, qz), Vec3(px, py, pz),
            Vec3(lx, ly, lz), Vec3(fx, fy, fz), Vec3(tx, ty, tz),
        )
        carry, _ = jax.lax.scan(step, carry, keys)
        com, quat, p, ell, force, torque = carry
        return (*com, *quat, *p, *ell, *force, *torque)

    def _init_ft(com_x, com_y, com_z, qw, qx, qy, qz,
                 wt_l, qf_l, mask_l, wstack_l, dirf_l):
        force, torque = _force_torque_local(
            Vec3(com_x, com_y, com_z), Quat(qw, qx, qy, qz),
            wt_l, qf_l, mask_l, wstack_l, dirf_l,
        )
        return (*force, *torque)

    state_specs = tuple(P(axis) for _ in range(19))
    table_specs = (P(None, axis), P(None, axis), P(None, axis), P(axis), P(axis))
    chunk_sm = partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(),) + state_specs + table_specs,
        out_specs=tuple(P(axis) for _ in range(19)),
        check_vma=False,
    )(_chunk)
    init_sm = partial(
        shard_map,
        mesh=mesh,
        in_specs=state_specs[:7] + table_specs,
        out_specs=tuple(P(axis) for _ in range(6)),
        check_vma=False,
    )(_init_ft)

    def run(body_soa, n_steps: int, key):
        if n_steps % save_every:
            raise ValueError(f"n_steps={n_steps} must divide by save_every={save_every}")
        com = body_soa.center
        quat = body_soa.orientation
        if ctx.perm_t is not None:
            com = Vec3(*(ctx.apply_perm(c) for c in com))
            quat = Quat(*(ctx.apply_perm(c) for c in quat))
        com = tuple(c.astype(jnp.float32) for c in com)
        quat = tuple(c.astype(jnp.float32) for c in quat)

        # thermal Maxwell momenta (scalar mass/inertia)
        k_init, k_run = jax.random.split(key)
        import numpy as _np

        m0 = float(_np.asarray(simulator_params.mass.center).reshape(-1)[0])
        inertia0 = [1.0 / v for v in ou.inv_inertia]
        zp = jax.random.normal(k_init, (6, n))
        p0 = tuple(zp[k] * (kT * m0) ** 0.5 for k in range(3))
        l0 = tuple(zp[3 + k] * (kT * inertia0[k]) ** 0.5 for k in range(3))

        f0 = init_sm(*com, *quat, wt, qf_arg, mask_d, bctx.wstack, bctx.dirf)
        state = (*com, *quat, *p0, *l0, *f0)

        n_chunks_per_save = save_every // u
        n_saves = n_steps // save_every
        keys_all = jax.vmap(jax.random.key_data)(
            jax.random.split(k_run, n_steps)
        ).reshape(n_saves, n_chunks_per_save, u, -1)

        overflow0 = jnp.asarray(False)
        if band is not None and band.did_overflow is not None:
            overflow0 = band.did_overflow

        def rebuild_chunk(carry, keys_u):
            state, overflow = carry
            if band is not None:
                ovf = band.build(
                    tuple(state[0:3]),
                    orientation=tuple(state[3:7]),
                    already_permuted=True,
                )[1]
                overflow = overflow | ovf
            state = chunk_sm(
                keys_u, *state, wt, qf_arg, mask_d, bctx.wstack, bctx.dirf
            )
            return (state, overflow), None

        def save_chunk(carry, keys_s):
            carry, _ = jax.lax.scan(rebuild_chunk, carry, keys_s)
            state, _ = carry
            return carry, (state[0:3], state[3:7])

        (state, overflow), (coms, quats) = jax.lax.scan(
            save_chunk, (state, overflow0), keys_all
        )

        # undo the slot permutation once over the stacked trajectory
        from mythos_tpu import soa as _soa

        traj = _soa.BodySoA(
            center=Vec3(*coms), orientation=Quat(*quats)
        )
        if ctx.perm_t is not None:
            traj = jax.tree.map(
                lambda c: jax.vmap(lambda row: st._apply_inv_perm(ctx, row))(c), traj
            )
        return traj, overflow

    return run
