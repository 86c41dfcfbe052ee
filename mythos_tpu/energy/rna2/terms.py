"""oxRNA2-specific terms: stacking (theta5/6/9/10) and cross stacking (no theta4).

Parity reference: mythos/energy/rna2/{stacking,cross_stacking}.py and
mythos/energy/rna2/interactions.py:14-175. The remaining terms are shared:
fene/exc-vol/HB/coax from dna1, Debye from dna2 (rna2 parameter values).
"""

from __future__ import annotations

import chex
import jax.numpy as jnp

import mythos_tpu.energy.functions as bf
import mythos_tpu.energy.smoothing as sm
from mythos_tpu.energy import seqdep
from mythos_tpu.utils.math import pmm as _pmm
from mythos_tpu.energy.base import BaseEnergyFunction
from mythos_tpu.energy.configuration import BaseConfiguration
from mythos_tpu.energy.dna1 import geometry as geom
from mythos_tpu.energy.dna1.terms import STACK_WEIGHTS_SA
from mythos_tpu.energy.rna2.nucleotide import Nucleotide
from mythos_tpu.io.sequence_constraints import SequenceConstraints
from mythos_tpu.utils.types import Arr, Probabilistic_Sequence, Scalar

ERR_PSEQ_CONSTRAINTS = "pseq_constraints must be provided when pseq is provided."


@chex.dataclass(frozen=True)
class StackingConfiguration(BaseConfiguration):
    """RNA2 stacking: Morse radial x f4(theta5,6,9,10) x f5(-cosphi1,2).

    Seq-specific eps uses the RNA2 temperature law
    ``ss_weights * (1 + kt * coeff)`` (mythos/energy/rna2/stacking.py:124-129).
    """

    eps_stack_base: Scalar | None = None
    eps_stack_kt_coeff: Scalar | None = None
    dr_low_stack: Scalar | None = None
    dr_high_stack: Scalar | None = None
    a_stack: Scalar | None = None
    dr0_stack: Scalar | None = None
    dr_c_stack: Scalar | None = None
    theta0_stack_5: Scalar | None = None
    delta_theta_star_stack_5: Scalar | None = None
    a_stack_5: Scalar | None = None
    theta0_stack_6: Scalar | None = None
    delta_theta_star_stack_6: Scalar | None = None
    a_stack_6: Scalar | None = None
    theta0_stack_9: Scalar | None = None
    delta_theta_star_stack_9: Scalar | None = None
    a_stack_9: Scalar | None = None
    theta0_stack_10: Scalar | None = None
    delta_theta_star_stack_10: Scalar | None = None
    a_stack_10: Scalar | None = None
    neg_cos_phi1_star_stack: Scalar | None = None
    a_stack_1: Scalar | None = None
    neg_cos_phi2_star_stack: Scalar | None = None
    a_stack_2: Scalar | None = None

    pseq: Probabilistic_Sequence | None = None
    pseq_constraints: SequenceConstraints | None = None
    kt: Scalar | None = None
    ss_stack_weights: Arr | None = None

    b_low_stack: Scalar | None = None
    dr_c_low_stack: Scalar | None = None
    b_high_stack: Scalar | None = None
    dr_c_high_stack: Scalar | None = None
    b_stack_5: Scalar | None = None
    delta_theta_stack_5_c: Scalar | None = None
    b_stack_6: Scalar | None = None
    delta_theta_stack_6_c: Scalar | None = None
    b_stack_9: Scalar | None = None
    delta_theta_stack_9_c: Scalar | None = None
    b_stack_10: Scalar | None = None
    delta_theta_stack_10_c: Scalar | None = None
    b_neg_cos_phi1_stack: Scalar | None = None
    neg_cos_phi1_c_stack: Scalar | None = None
    b_neg_cos_phi2_stack: Scalar | None = None
    neg_cos_phi2_c_stack: Scalar | None = None
    eps_stack: Arr | None = None

    required_params: tuple[str, ...] = (
        "eps_stack_base",
        "eps_stack_kt_coeff",
        "dr_low_stack",
        "dr_high_stack",
        "a_stack",
        "dr0_stack",
        "dr_c_stack",
        "theta0_stack_5",
        "delta_theta_star_stack_5",
        "a_stack_5",
        "theta0_stack_6",
        "delta_theta_star_stack_6",
        "a_stack_6",
        "theta0_stack_9",
        "delta_theta_star_stack_9",
        "a_stack_9",
        "theta0_stack_10",
        "delta_theta_star_stack_10",
        "a_stack_10",
        "neg_cos_phi1_star_stack",
        "a_stack_1",
        "neg_cos_phi2_star_stack",
        "a_stack_2",
        "kt",
    )
    dependent_params: tuple[str, ...] = (
        "b_low_stack",
        "dr_c_low_stack",
        "b_high_stack",
        "dr_c_high_stack",
        "b_stack_5",
        "delta_theta_stack_5_c",
        "b_stack_6",
        "delta_theta_stack_6_c",
        "b_stack_9",
        "delta_theta_stack_9_c",
        "b_stack_10",
        "delta_theta_stack_10_c",
        "b_neg_cos_phi1_stack",
        "neg_cos_phi1_c_stack",
        "b_neg_cos_phi2_stack",
        "neg_cos_phi2_c_stack",
        "eps_stack",
    )

    def init_params(self) -> "StackingConfiguration":
        if self.pseq and self.pseq_constraints is None:
            raise ValueError(ERR_PSEQ_CONSTRAINTS)

        if self.ss_stack_weights is not None:
            eps_stack = self.ss_stack_weights * (1.0 + self.kt * self.eps_stack_kt_coeff)
        else:
            eps_stack = (self.eps_stack_base + self.eps_stack_kt_coeff * self.kt) * STACK_WEIGHTS_SA

        b_low, dr_c_low, b_high, dr_c_high = sm.get_f1_smoothing_params(
            self.dr0_stack, self.a_stack, self.dr_c_stack, self.dr_low_stack, self.dr_high_stack
        )
        updates = {
            "b_low_stack": b_low,
            "dr_c_low_stack": dr_c_low,
            "b_high_stack": b_high,
            "dr_c_high_stack": dr_c_high,
            "eps_stack": eps_stack,
        }
        for k in (5, 6, 9, 10):
            b, dth_c = sm.get_f4_smoothing_params(
                getattr(self, f"a_stack_{k}"),
                getattr(self, f"theta0_stack_{k}"),
                getattr(self, f"delta_theta_star_stack_{k}"),
            )
            updates[f"b_stack_{k}"] = b
            updates[f"delta_theta_stack_{k}_c"] = dth_c
        b1, c1 = sm.get_f5_smoothing_params(self.a_stack_1, self.neg_cos_phi1_star_stack)
        b2, c2 = sm.get_f5_smoothing_params(self.a_stack_2, self.neg_cos_phi2_star_stack)
        updates.update(
            b_neg_cos_phi1_stack=b1,
            neg_cos_phi1_c_stack=c1,
            b_neg_cos_phi2_stack=b2,
            neg_cos_phi2_c_stack=c2,
        )
        return self.replace(**updates)


@chex.dataclass(frozen=True)
class Stacking(BaseEnergyFunction):
    """RNA2 stacking over bonded pairs with 3'/5' stack sites."""

    params: StackingConfiguration

    def _f4(self, k: int, theta: Arr) -> Arr:
        p = self.params
        return bf.f4(
            theta,
            getattr(p, f"theta0_stack_{k}"),
            getattr(p, f"delta_theta_star_stack_{k}"),
            getattr(p, f"delta_theta_stack_{k}_c"),
            getattr(p, f"a_stack_{k}"),
            getattr(p, f"b_stack_{k}"),
        )

    def compute_v_stack(self, nuc: Nucleotide, nn_i: Arr, nn_j: Arr) -> Arr:
        """Sequence-independent product (eps = 1)."""
        p = self.params
        d = self.displacement_fn

        dr_stack = d(nuc.stack5_sites[nn_i], nuc.stack3_sites[nn_j])
        r_stack = jnp.linalg.norm(dr_stack, axis=-1)
        theta5 = jnp.pi - geom._angle_dr(nuc.base_normals[nn_j], dr_stack, r_stack)
        theta6 = jnp.pi - geom._angle_dr(nuc.base_normals[nn_i], dr_stack, r_stack)

        dr_back = d(nuc.back_sites[nn_i], nuc.back_sites[nn_j])
        r_back = jnp.linalg.norm(dr_back, axis=-1)
        theta9 = geom._angle_dr(-nuc.bb_p3_sites[nn_j], dr_back, r_back)
        theta10 = geom._angle_dr(-nuc.bb_p5_sites[nn_i], dr_back, r_back)
        cosphi1 = -jnp.sum(nuc.cross_prods[nn_i] * dr_back, axis=-1) / r_back
        cosphi2 = -jnp.sum(nuc.cross_prods[nn_j] * dr_back, axis=-1) / r_back

        return (
            bf.f1(
                r_stack,
                r_low=p.dr_low_stack,
                r_high=p.dr_high_stack,
                r_c_low=p.dr_c_low_stack,
                r_c_high=p.dr_c_high_stack,
                eps=1.0,
                a=p.a_stack,
                r0=p.dr0_stack,
                r_c=p.dr_c_stack,
                b_low=p.b_low_stack,
                b_high=p.b_high_stack,
            )
            * self._f4(5, theta5)
            * self._f4(6, theta6)
            * self._f4(9, theta9)
            * self._f4(10, theta10)
            * bf.f5(-cosphi1, p.neg_cos_phi1_star_stack, p.neg_cos_phi1_c_stack, p.a_stack_1, p.b_neg_cos_phi1_stack)
            * bf.f5(-cosphi2, p.neg_cos_phi2_star_stack, p.neg_cos_phi2_c_stack, p.a_stack_2, p.b_neg_cos_phi2_stack)
        )

    def pairwise_energies(self, nuc: Nucleotide, seq, bonded_neighbors: Arr) -> Arr:
        nn_i, nn_j = bonded_neighbors[:, 0], bonded_neighbors[:, 1]
        v_stack = self.compute_v_stack(nuc, nn_i, nn_j)

        if self.params.pseq:
            weights = seqdep.pair_weights(
                self.params.pseq, nn_i, nn_j, self.params.eps_stack, self.params.pseq_constraints
            )
        else:
            weights = self.params.eps_stack[seq[nn_i], seq[nn_j]]
        return weights * v_stack

    def compute_energy(self, nucleotide: Nucleotide) -> Scalar:
        return self.pairwise_energies(nucleotide, self.seq, self.bonded_neighbors).sum()

    def _v_stack_soa(self, nuc, nuc_j) -> Arr:
        """Sequence-independent product on SoA fields (i rows, j partner)."""
        from mythos_tpu.soa import vdot
        from mythos_tpu.utils.math import safe_arccos

        p = self.params
        d = self.displacement_soa
        dr_stack = d(nuc.stack5, nuc_j.stack3)
        r_stack = jnp.sqrt(vdot(dr_stack, dr_stack) + 1e-18)
        inv_rs = 1.0 / r_stack
        theta5 = jnp.pi - safe_arccos(vdot(nuc_j.a3, dr_stack) * inv_rs)
        theta6 = jnp.pi - safe_arccos(vdot(nuc.a3, dr_stack) * inv_rs)

        dr_back = d(nuc.back, nuc_j.back)
        r_back = jnp.sqrt(vdot(dr_back, dr_back) + 1e-18)
        inv_rb = 1.0 / r_back
        theta9 = safe_arccos(-vdot(nuc_j.bb_p3, dr_back) * inv_rb)
        theta10 = safe_arccos(-vdot(nuc.bb_p5, dr_back) * inv_rb)
        cosphi1 = -vdot(nuc.a2, dr_back) * inv_rb
        cosphi2 = -vdot(nuc_j.a2, dr_back) * inv_rb

        return (
            bf.f1(
                r_stack,
                r_low=p.dr_low_stack,
                r_high=p.dr_high_stack,
                r_c_low=p.dr_c_low_stack,
                r_c_high=p.dr_c_high_stack,
                eps=1.0,
                a=p.a_stack,
                r0=p.dr0_stack,
                r_c=p.dr_c_stack,
                b_low=p.b_low_stack,
                b_high=p.b_high_stack,
            )
            * self._f4(5, theta5)
            * self._f4(6, theta6)
            * self._f4(9, theta9)
            * self._f4(10, theta10)
            * bf.f5(-cosphi1, p.neg_cos_phi1_star_stack, p.neg_cos_phi1_c_stack, p.a_stack_1, p.b_neg_cos_phi1_stack)
            * bf.f5(-cosphi2, p.neg_cos_phi2_star_stack, p.neg_cos_phi2_c_stack, p.a_stack_2, p.b_neg_cos_phi2_stack)
        )

    def _seq_pair_weights_shift(self, seq) -> Arr:
        """(N,) eps_stack weights for (i, i+1) pairs (pseq via marginals)."""
        import jax

        if self.params.pseq:
            from mythos_tpu.energy import seqdep

            left, right, partner, corr = seqdep.factorized_weights(
                self.params.pseq, self.params.eps_stack, self.params.pseq_constraints
            )
            w = jnp.sum(left * jnp.roll(right, -1, axis=0), axis=-1)
            idx = jnp.arange(w.shape[0])
            return w + jnp.where(partner == idx + 1, corr, 0.0)
        oh = jax.nn.one_hot(seq, 4, dtype=self.params.eps_stack.dtype)
        return jnp.sum(_pmm(oh, self.params.eps_stack) * jnp.roll(oh, -1, axis=0), axis=-1)

    def rowwise_soa(self, nuc, seq) -> Arr:
        """(N,) shift-path values; valid where bonded_next_mask."""
        from mythos_tpu.energy.dna1.geometry import _roll_vec3

        nuc_j = nuc._replace(**{f: _roll_vec3(getattr(nuc, f)) for f in nuc._fields})
        return self._seq_pair_weights_shift(seq) * self._v_stack_soa(nuc, nuc_j)

    def energy_soa(self, nuc, seq) -> Scalar:
        if self.bonded_next_mask is not None:
            return jnp.where(self.bonded_next_mask, self.rowwise_soa(nuc, seq), 0.0).sum()
        from mythos_tpu.energy.dna1.geometry import _gather_vec3

        nn_i, nn_j = self.bonded_neighbors[:, 0], self.bonded_neighbors[:, 1]
        nuc_i = nuc._replace(**{f: _gather_vec3(getattr(nuc, f), nn_i) for f in nuc._fields})
        nuc_jj = nuc._replace(**{f: _gather_vec3(getattr(nuc, f), nn_j) for f in nuc._fields})
        if self.params.pseq:
            from mythos_tpu.energy import seqdep

            weights = seqdep.pair_weights(
                self.params.pseq, nn_i, nn_j, self.params.eps_stack, self.params.pseq_constraints
            )
        else:
            weights = self.params.eps_stack[seq[nn_i], seq[nn_j]]
        return (weights * self._v_stack_soa(nuc_i, nuc_jj)).sum()


@chex.dataclass(frozen=True)
class CrossStackingConfiguration(BaseConfiguration):
    """RNA2 cross stacking: drops the theta4 modulation of dna1."""

    dr_low_cross: Scalar | None = None
    dr_high_cross: Scalar | None = None
    k_cross: Scalar | None = None
    r0_cross: Scalar | None = None
    dr_c_cross: Scalar | None = None
    theta0_cross_1: Scalar | None = None
    delta_theta_star_cross_1: Scalar | None = None
    a_cross_1: Scalar | None = None
    theta0_cross_2: Scalar | None = None
    delta_theta_star_cross_2: Scalar | None = None
    a_cross_2: Scalar | None = None
    theta0_cross_3: Scalar | None = None
    delta_theta_star_cross_3: Scalar | None = None
    a_cross_3: Scalar | None = None
    theta0_cross_7: Scalar | None = None
    delta_theta_star_cross_7: Scalar | None = None
    a_cross_7: Scalar | None = None
    theta0_cross_8: Scalar | None = None
    delta_theta_star_cross_8: Scalar | None = None
    a_cross_8: Scalar | None = None

    b_low_cross: Scalar | None = None
    dr_c_low_cross: Scalar | None = None
    b_high_cross: Scalar | None = None
    dr_c_high_cross: Scalar | None = None
    b_cross_1: Scalar | None = None
    delta_theta_cross_1_c: Scalar | None = None
    b_cross_2: Scalar | None = None
    delta_theta_cross_2_c: Scalar | None = None
    b_cross_3: Scalar | None = None
    delta_theta_cross_3_c: Scalar | None = None
    b_cross_7: Scalar | None = None
    delta_theta_cross_7_c: Scalar | None = None
    b_cross_8: Scalar | None = None
    delta_theta_cross_8_c: Scalar | None = None

    required_params: tuple[str, ...] = (
        "dr_low_cross",
        "dr_high_cross",
        "k_cross",
        "r0_cross",
        "dr_c_cross",
        "theta0_cross_1",
        "delta_theta_star_cross_1",
        "a_cross_1",
        "theta0_cross_2",
        "delta_theta_star_cross_2",
        "a_cross_2",
        "theta0_cross_3",
        "delta_theta_star_cross_3",
        "a_cross_3",
        "theta0_cross_7",
        "delta_theta_star_cross_7",
        "a_cross_7",
        "theta0_cross_8",
        "delta_theta_star_cross_8",
        "a_cross_8",
    )
    dependent_params: tuple[str, ...] = (
        "b_low_cross",
        "dr_c_low_cross",
        "b_high_cross",
        "dr_c_high_cross",
        "b_cross_1",
        "delta_theta_cross_1_c",
        "b_cross_2",
        "delta_theta_cross_2_c",
        "b_cross_3",
        "delta_theta_cross_3_c",
        "b_cross_7",
        "delta_theta_cross_7_c",
        "b_cross_8",
        "delta_theta_cross_8_c",
    )

    def init_params(self) -> "CrossStackingConfiguration":
        b_low, dr_c_low, b_high, dr_c_high = sm.get_f2_smoothing_params(
            self.r0_cross, self.dr_c_cross, self.dr_low_cross, self.dr_high_cross
        )
        updates = {
            "b_low_cross": b_low,
            "dr_c_low_cross": dr_c_low,
            "b_high_cross": b_high,
            "dr_c_high_cross": dr_c_high,
        }
        for k in (1, 2, 3, 7, 8):
            b, dth_c = sm.get_f4_smoothing_params(
                getattr(self, f"a_cross_{k}"),
                getattr(self, f"theta0_cross_{k}"),
                getattr(self, f"delta_theta_star_cross_{k}"),
            )
            updates[f"b_cross_{k}"] = b
            updates[f"delta_theta_cross_{k}_c"] = dth_c
        return self.replace(**updates)


@chex.dataclass(frozen=True)
class CrossStacking(BaseEnergyFunction):
    """RNA2 cross stacking over unbonded pairs (theta1,2,3,7,8)."""

    params: CrossStackingConfiguration

    def _f4(self, k: int, theta: Arr) -> Arr:
        p = self.params
        return bf.f4(
            theta,
            getattr(p, f"theta0_cross_{k}"),
            getattr(p, f"delta_theta_star_cross_{k}"),
            getattr(p, f"delta_theta_cross_{k}_c"),
            getattr(p, f"a_cross_{k}"),
            getattr(p, f"b_cross_{k}"),
        )

    def _cross_value(self, g: geom.UnbondedGeometry) -> Arr:
        p = self.params
        f2_r = bf.f2(
            jnp.maximum(g.r_base, 1e-8),
            r_low=p.dr_low_cross,
            r_high=p.dr_high_cross,
            r_c_low=p.dr_c_low_cross,
            r_c_high=p.dr_c_high_cross,
            k=p.k_cross,
            r0=p.r0_cross,
            r_c=p.dr_c_cross,
            b_low=p.b_low_cross,
            b_high=p.b_high_cross,
        )
        return (
            f2_r
            * self._f4(1, g.theta1)
            * self._f4(2, g.theta2)
            * self._f4(3, g.theta3)
            * (self._f4(7, g.theta7) + self._f4(7, jnp.pi - g.theta7))
            * (self._f4(8, g.theta8) + self._f4(8, jnp.pi - g.theta8))
        )

    def pairwise_energies(self, nuc_i: Nucleotide, nuc_j: Nucleotide, unbonded_neighbors: Arr) -> Arr:
        op_i, op_j = unbonded_neighbors[0], unbonded_neighbors[1]
        n = nuc_i.center.shape[0]
        g = geom.unbonded_geometry(nuc_i, nuc_j, op_i, op_j, self.displacement_fn)
        return jnp.where(op_i < n, self._cross_value(g), 0.0)

    def pair_cutoff(self) -> float:
        return float(self.params.dr_c_high_cross)

    def dense_energies(self, nuc_i: Nucleotide, nuc_j: Nucleotide) -> Arr:
        """(Ni, Nj) energies via broadcasts; works on full arrays or tiles."""
        g = geom.unbonded_geometry_dense(nuc_i, nuc_j, self.displacement_fn)
        return self._cross_value(g)

    def tile_energy_fn(self):
        return lambda ri, rj: self.dense_energies(ri[0], rj[0])

    def tile_energy_soa_fn(self):
        def tile(ri, rj):
            g = geom.unbonded_geometry_tile_soa(ri[0], rj[0], self.displacement_soa)
            return self._cross_value(g)

        return tile

    def compute_energy(self, nucleotide: Nucleotide) -> Scalar:
        if self.block_ids is not None:
            from mythos_tpu.energy import blocks

            return blocks.block_pair_sum(
                self.tile_energy_fn(),
                (nucleotide, jnp.asarray(self.seq)),
                self.block_ids,
                self.block_size,
                nucleotide.center.shape[0],
                self.bonded_neighbors,
            )
        if self.dense_mask is not None:
            g = geom.unbonded_geometry_dense(nucleotide, nucleotide, self.displacement_fn)
            return jnp.where(self.dense_mask, self._cross_value(g), 0.0).sum()
        return self.pairwise_energies(nucleotide, nucleotide, self.unbonded_neighbors).sum()
