"""oxDNA1 energy terms: FENE, excluded volumes, stacking, HB, cross, coax.

Parity reference: mythos/energy/dna1/{fene,bonded_excluded_volume,stacking,
unbonded_excluded_volume,hydrogen_bonding,cross_stacking,coaxial_stacking}.py
and mythos/energy/dna1/interactions.py. Parameter names are the contract with
the TOML defaults, the oxDNA model.h export, and the optimizer.

Implementation differences vs the reference (TPU-first):

* per-pair geometry comes from mythos_tpu.energy.dna1.geometry in one fused
  gather pass per pair family;
* sequence-dependent weights use the marginal-table formulation in
  mythos_tpu.energy.seqdep (one batched bilinear form, not nested vmaps);
* divisions by pair distances are guarded so padded neighbor entries yield
  exact zeros with clean gradients (the reference NaN-poisons gradients of
  padded entries).
"""

from __future__ import annotations

import chex
import jax
import jax.numpy as jnp

import mythos_tpu.energy.functions as bf
import mythos_tpu.energy.smoothing as sm
from mythos_tpu.energy import blocks, seqdep
from mythos_tpu.energy.base import BaseEnergyFunction, BaseNucleotide
from mythos_tpu.energy.configuration import BaseConfiguration
from mythos_tpu.energy.dna1 import geometry as geom
from mythos_tpu.io.sequence_constraints import SequenceConstraints
from mythos_tpu.utils.math import pmm as _pmm
from mythos_tpu.utils.math import smooth_abs
from mythos_tpu.utils.types import Arr, Probabilistic_Sequence, Scalar

ERR_PSEQ_CONSTRAINTS = "pseq_constraints must be provided when pseq is provided."
ERR_PSEQ_PAIR_LIST = "probabilistic sequences use the pair-list path (block_ids=None)"

#: sequence-averaged stacking weights (uniform)
STACK_WEIGHTS_SA = jnp.ones((4, 4))

#: sequence-averaged HB weights: Watson-Crick complementarity mask
HB_WEIGHTS_SA = jnp.array(
    [
        [0.0, 0.0, 0.0, 1.0],  # A pairs T
        [0.0, 0.0, 1.0, 0.0],  # C pairs G
        [0.0, 1.0, 0.0, 0.0],  # G pairs C
        [1.0, 0.0, 0.0, 0.0],  # T pairs A
    ]
)


def v_fene_smooth(
    r: Arr,
    eps_backbone: Scalar,
    r0_backbone: Scalar,
    delta_backbone: Scalar,
    fmax: Scalar = 500.0,
    finf: Scalar = 4.0,
) -> Arr:
    """FENE with the log divergence replaced by a linear tail beyond xmax.

    Beyond the displacement where the FENE force reaches fmax, the energy
    continues as (fmax - finf) x log|x| + finf |x| matched in value.
    """
    eps, r0, delt = eps_backbone, r0_backbone, delta_backbone
    diff = smooth_abs(r - r0)

    xmax = (-eps + jnp.sqrt(eps**2 + 4.0 * fmax**2 * delt**2)) / (2.0 * fmax)
    fene_xmax = -(eps / 2.0) * jnp.log(1.0 - xmax**2 / delt**2)
    long_xmax = (fmax - finf) * xmax * jnp.log(xmax) + finf * xmax
    smoothed = (fmax - finf) * xmax * jnp.log(diff) + finf * diff - long_xmax + fene_xmax

    # guard the log argument so the unselected branch can't poison gradients
    x2 = jnp.minimum(diff**2 / delt**2, 0.99999)
    fene = -eps / 2.0 * jnp.log(1.0 - x2)
    return jnp.where(diff > xmax, smoothed, fene)


def _safe_div(num: Arr, r: Arr, eps: float = 1e-12) -> Arr:
    return num / jnp.where(r > eps, r, 1.0)


def _norm_safe(dr: Arr) -> Arr:
    """Norm with an epsilon inside the sqrt: zero-distance (diagonal/padded)
    entries keep finite gradients."""
    return jnp.sqrt(jnp.sum(dr * dr, axis=-1) + 1e-18)


def _exc_vol_f3(r: Arr, eps_exc, dr_star, sigma, b, dr_c) -> Arr:
    """f3 with the radius floored at 1e-2: (sigma/r)^12 must stay finite in
    float32 even for masked zero-distance (diagonal/padded) entries, or their
    inf NaN-poisons gradients through the jnp.where. Physical pairs never
    get near the floor (the excluded volume wall is ~0.3)."""
    return bf.f3(jnp.maximum(r, 1e-2), r_star=dr_star, r_c=dr_c, eps=eps_exc, sigma=sigma, b=b)


# FENE -------------------------------------------------------------------------


@chex.dataclass(frozen=True)
class FeneConfiguration(BaseConfiguration):
    """Backbone FENE spring parameters."""

    eps_backbone: Scalar | None = None
    r0_backbone: Scalar | None = None
    delta_backbone: Scalar | None = None
    fmax: Scalar | None = None
    finf: Scalar | None = None

    required_params: tuple[str, ...] = ("eps_backbone", "r0_backbone", "delta_backbone", "fmax", "finf")

    def init_params(self) -> "FeneConfiguration":
        return self


@chex.dataclass(frozen=True)
class Fene(BaseEnergyFunction):
    """Smoothed FENE backbone springs over bonded pairs."""

    params: FeneConfiguration

    def pairwise_energies(self, nuc: BaseNucleotide, bonded_neighbors: Arr) -> Arr:
        nn_i, nn_j = bonded_neighbors[:, 0], bonded_neighbors[:, 1]
        dr = self.displacement_fn(nuc.back_sites[nn_i], nuc.back_sites[nn_j])
        r = jnp.linalg.norm(dr, axis=-1)
        p = self.params
        return v_fene_smooth(r, p.eps_backbone, p.r0_backbone, p.delta_backbone, p.fmax, p.finf)

    def compute_energy(self, nucleotide: BaseNucleotide) -> Scalar:
        return self.pairwise_energies(nucleotide, self.bonded_neighbors).sum()

    def rowwise_soa(self, nuc, seq) -> Arr:
        """(N,) shift-path values; valid where bonded_next_mask."""
        p = self.params
        g = geom.bonded_geometry_shift_soa(nuc, self.displacement_soa)
        return v_fene_smooth(g.r_back, p.eps_backbone, p.r0_backbone, p.delta_backbone, p.fmax, p.finf)

    def energy_soa(self, nuc, seq) -> Scalar:
        p = self.params
        if self.bonded_next_mask is not None:
            return jnp.where(self.bonded_next_mask, self.rowwise_soa(nuc, seq), 0.0).sum()
        g = geom.bonded_geometry_soa(
            nuc, self.bonded_neighbors[:, 0], self.bonded_neighbors[:, 1], self.displacement_soa
        )
        return v_fene_smooth(
            g.r_back, p.eps_backbone, p.r0_backbone, p.delta_backbone, p.fmax, p.finf
        ).sum()


# Excluded volumes ---------------------------------------------------------------


@chex.dataclass(frozen=True)
class BondedExcludedVolumeConfiguration(BaseConfiguration):
    """LJ-with-smoothed-cutoff on 3 site pairs of bonded neighbors."""

    eps_exc: Scalar | None = None
    dr_star_base: Scalar | None = None
    sigma_base: Scalar | None = None
    sigma_back_base: Scalar | None = None
    sigma_base_back: Scalar | None = None
    dr_star_back_base: Scalar | None = None
    dr_star_base_back: Scalar | None = None

    b_base: Scalar | None = None
    dr_c_base: Scalar | None = None
    b_back_base: Scalar | None = None
    dr_c_back_base: Scalar | None = None
    b_base_back: Scalar | None = None
    dr_c_base_back: Scalar | None = None

    required_params: tuple[str, ...] = (
        "eps_exc",
        "dr_star_base",
        "sigma_base",
        "sigma_back_base",
        "sigma_base_back",
        "dr_star_back_base",
        "dr_star_base_back",
    )
    dependent_params: tuple[str, ...] = (
        "b_base",
        "dr_c_base",
        "b_back_base",
        "dr_c_back_base",
        "b_base_back",
        "dr_c_base_back",
    )

    def init_params(self) -> "BondedExcludedVolumeConfiguration":
        b_base, dr_c_base = sm.get_f3_smoothing_params(self.dr_star_base, self.sigma_base)
        b_back_base, dr_c_back_base = sm.get_f3_smoothing_params(self.dr_star_back_base, self.sigma_back_base)
        b_base_back, dr_c_base_back = sm.get_f3_smoothing_params(self.dr_star_base_back, self.sigma_base_back)
        return self.replace(
            b_base=b_base,
            dr_c_base=dr_c_base,
            b_back_base=b_back_base,
            dr_c_back_base=dr_c_back_base,
            b_base_back=b_base_back,
            dr_c_base_back=dr_c_base_back,
        )


def _exc_vol_three_sites(p, dr_base: Arr, dr_back_base: Arr, dr_base_back: Arr) -> Arr:
    """Shared base/back-base/base-back f3 sum (bonded and unbonded exc vol)."""
    return (
        _exc_vol_f3(
            _norm_safe(dr_base), p.eps_exc, p.dr_star_base, p.sigma_base, p.b_base, p.dr_c_base
        )
        + _exc_vol_f3(
            _norm_safe(dr_back_base),
            p.eps_exc,
            p.dr_star_back_base,
            p.sigma_back_base,
            p.b_back_base,
            p.dr_c_back_base,
        )
        + _exc_vol_f3(
            _norm_safe(dr_base_back),
            p.eps_exc,
            p.dr_star_base_back,
            p.sigma_base_back,
            p.b_base_back,
            p.dr_c_base_back,
        )
    )


@chex.dataclass(frozen=True)
class BondedExcludedVolume(BaseEnergyFunction):
    """Excluded volume on bonded pairs (3 site pairs, no backbone-backbone)."""

    params: BondedExcludedVolumeConfiguration

    def pairwise_energies(self, nuc: BaseNucleotide, bonded_neighbors: Arr) -> Arr:
        nn_i, nn_j = bonded_neighbors[:, 0], bonded_neighbors[:, 1]
        d = self.displacement_fn
        dr_base = d(nuc.base_sites[nn_i], nuc.base_sites[nn_j])
        dr_back_base = d(nuc.back_sites[nn_i], nuc.base_sites[nn_j])
        dr_base_back = d(nuc.base_sites[nn_i], nuc.back_sites[nn_j])
        return _exc_vol_three_sites(self.params, dr_base, dr_back_base, dr_base_back)

    def compute_energy(self, nucleotide: BaseNucleotide) -> Scalar:
        return self.pairwise_energies(nucleotide, self.bonded_neighbors).sum()

    def _bexc_vals(self, g) -> Arr:
        p = self.params
        return (
            _exc_vol_f3(geom._vnorm_tile(g.dr_base), p.eps_exc, p.dr_star_base, p.sigma_base, p.b_base, p.dr_c_base)
            + _exc_vol_f3(
                geom._vnorm_tile(g.dr_back_base), p.eps_exc, p.dr_star_back_base,
                p.sigma_back_base, p.b_back_base, p.dr_c_back_base,
            )
            + _exc_vol_f3(
                geom._vnorm_tile(g.dr_base_back), p.eps_exc, p.dr_star_base_back,
                p.sigma_base_back, p.b_base_back, p.dr_c_base_back,
            )
        )

    def rowwise_soa(self, nuc, seq) -> Arr:
        """(N,) shift-path values; valid where bonded_next_mask."""
        return self._bexc_vals(geom.bonded_geometry_shift_soa(nuc, self.displacement_soa))

    def energy_soa(self, nuc, seq) -> Scalar:
        if self.bonded_next_mask is not None:
            return jnp.where(self.bonded_next_mask, self.rowwise_soa(nuc, seq), 0.0).sum()
        g = geom.bonded_geometry_soa(
            nuc, self.bonded_neighbors[:, 0], self.bonded_neighbors[:, 1], self.displacement_soa
        )
        return self._bexc_vals(g).sum()


@chex.dataclass(frozen=True)
class UnbondedExcludedVolumeConfiguration(BaseConfiguration):
    """Excluded volume on unbonded pairs (adds backbone-backbone)."""

    eps_exc: Scalar | None = None
    dr_star_base: Scalar | None = None
    sigma_base: Scalar | None = None
    dr_star_back_base: Scalar | None = None
    sigma_back_base: Scalar | None = None
    dr_star_base_back: Scalar | None = None
    sigma_base_back: Scalar | None = None
    dr_star_backbone: Scalar | None = None
    sigma_backbone: Scalar | None = None

    b_base: Scalar | None = None
    dr_c_base: Scalar | None = None
    b_back_base: Scalar | None = None
    dr_c_back_base: Scalar | None = None
    b_base_back: Scalar | None = None
    dr_c_base_back: Scalar | None = None
    b_backbone: Scalar | None = None
    dr_c_backbone: Scalar | None = None

    required_params: tuple[str, ...] = (
        "eps_exc",
        "dr_star_base",
        "sigma_base",
        "dr_star_back_base",
        "sigma_back_base",
        "dr_star_base_back",
        "sigma_base_back",
        "dr_star_backbone",
        "sigma_backbone",
    )
    dependent_params: tuple[str, ...] = (
        "b_base",
        "dr_c_base",
        "b_back_base",
        "dr_c_back_base",
        "b_base_back",
        "dr_c_base_back",
        "b_backbone",
        "dr_c_backbone",
    )

    def init_params(self) -> "UnbondedExcludedVolumeConfiguration":
        b_base, dr_c_base = sm.get_f3_smoothing_params(self.dr_star_base, self.sigma_base)
        b_back_base, dr_c_back_base = sm.get_f3_smoothing_params(self.dr_star_back_base, self.sigma_back_base)
        b_base_back, dr_c_base_back = sm.get_f3_smoothing_params(self.dr_star_base_back, self.sigma_base_back)
        b_backbone, dr_c_backbone = sm.get_f3_smoothing_params(self.dr_star_backbone, self.sigma_backbone)
        return self.replace(
            b_base=b_base,
            dr_c_base=dr_c_base,
            b_back_base=b_back_base,
            dr_c_back_base=dr_c_back_base,
            b_base_back=b_base_back,
            dr_c_base_back=dr_c_base_back,
            b_backbone=b_backbone,
            dr_c_backbone=dr_c_backbone,
        )


@chex.dataclass(frozen=True)
class UnbondedExcludedVolume(BaseEnergyFunction):
    """Excluded volume over unbonded pairs (4 site pairs incl. backbones)."""

    params: UnbondedExcludedVolumeConfiguration

    def pairwise_energies(self, nuc_i: BaseNucleotide, nuc_j: BaseNucleotide, unbonded_neighbors: Arr) -> Arr:
        op_i, op_j = unbonded_neighbors[0], unbonded_neighbors[1]
        n = nuc_i.center.shape[0]
        d = self.displacement_fn
        p = self.params

        dr_base = d(nuc_j.base_sites[op_j], nuc_i.base_sites[op_i])
        dr_backbone = d(nuc_j.back_sites[op_j], nuc_i.back_sites[op_i])
        dr_back_base = d(nuc_i.back_sites[op_i], nuc_j.base_sites[op_j])
        dr_base_back = d(nuc_i.base_sites[op_i], nuc_j.back_sites[op_j])

        val = _exc_vol_three_sites(p, dr_base, dr_back_base, dr_base_back) + _exc_vol_f3(
            jnp.linalg.norm(dr_backbone, axis=-1),
            p.eps_exc,
            p.dr_star_backbone,
            p.sigma_backbone,
            p.b_backbone,
            p.dr_c_backbone,
        )
        return jnp.where(op_i < n, val, 0.0)

    def dense_energies(self, nuc_i: BaseNucleotide, nuc_j: BaseNucleotide) -> Arr:
        """(N, N) energies via broadcasts (gather-free dense path)."""
        d = self.displacement_fn
        p = self.params
        base_i, base_j = nuc_i.base_sites[:, None, :], nuc_j.base_sites[None, :, :]
        back_i, back_j = nuc_i.back_sites[:, None, :], nuc_j.back_sites[None, :, :]
        return _exc_vol_three_sites(
            p, d(base_j, base_i), d(base_j, back_i), d(back_j, base_i)
        ) + _exc_vol_f3(
            _norm_safe(d(back_j, back_i)),
            p.eps_exc,
            p.dr_star_backbone,
            p.sigma_backbone,
            p.b_backbone,
            p.dr_c_backbone,
        )

    def pair_cutoff(self) -> float:
        p = self.params
        return float(max(p.dr_c_base, p.dr_c_back_base, p.dr_c_base_back, p.dr_c_backbone))

    def tile_energy_fn(self):
        return lambda ri, rj: self.dense_energies(ri[0], rj[0])

    def tile_energy_soa_fn(self):
        p = self.params
        d = self.displacement_soa

        def tile(ri, rj):
            nuc_i, nuc_j = ri[0], rj[0]
            base_i, back_i = geom._rows(nuc_i.base), geom._rows(nuc_i.back)
            base_j, back_j = geom._cols(nuc_j.base), geom._cols(nuc_j.back)
            return (
                _exc_vol_f3(geom._vnorm_tile(d(base_j, base_i)), p.eps_exc, p.dr_star_base, p.sigma_base, p.b_base, p.dr_c_base)
                + _exc_vol_f3(
                    geom._vnorm_tile(d(base_j, back_i)), p.eps_exc, p.dr_star_back_base,
                    p.sigma_back_base, p.b_back_base, p.dr_c_back_base,
                )
                + _exc_vol_f3(
                    geom._vnorm_tile(d(back_j, base_i)), p.eps_exc, p.dr_star_base_back,
                    p.sigma_base_back, p.b_base_back, p.dr_c_base_back,
                )
                + _exc_vol_f3(
                    geom._vnorm_tile(d(back_j, back_i)), p.eps_exc, p.dr_star_backbone,
                    p.sigma_backbone, p.b_backbone, p.dr_c_backbone,
                )
            )

        return tile

    def compute_energy(self, nucleotide: BaseNucleotide) -> Scalar:
        if self.block_ids is not None:
            return blocks.block_pair_sum(
                self.tile_energy_fn(),
                (nucleotide, jnp.asarray(self.seq)),
                self.block_ids,
                self.block_size,
                nucleotide.center.shape[0],
                self.bonded_neighbors,
            )
        if self.dense_mask is not None:
            vals = self.dense_energies(nucleotide, nucleotide)
            return jnp.where(self.dense_mask, vals, 0.0).sum()
        return self.pairwise_energies(nucleotide, nucleotide, self.unbonded_neighbors).sum()


# Stacking -----------------------------------------------------------------------


@chex.dataclass(frozen=True)
class StackingConfiguration(BaseConfiguration):
    """Bonded stacking: Morse radial x 3 angular mods x 2 right-handed mods.

    eps is temperature dependent: eps = eps_stack_base + eps_stack_kt_coeff*kt
    (sequence-averaged) or via the seq-specific weight table path.
    """

    eps_stack_base: Scalar | None = None
    eps_stack_kt_coeff: Scalar | None = None
    dr_low_stack: Scalar | None = None
    dr_high_stack: Scalar | None = None
    a_stack: Scalar | None = None
    dr0_stack: Scalar | None = None
    dr_c_stack: Scalar | None = None
    theta0_stack_4: Scalar | None = None
    delta_theta_star_stack_4: Scalar | None = None
    a_stack_4: Scalar | None = None
    theta0_stack_5: Scalar | None = None
    delta_theta_star_stack_5: Scalar | None = None
    a_stack_5: Scalar | None = None
    theta0_stack_6: Scalar | None = None
    delta_theta_star_stack_6: Scalar | None = None
    a_stack_6: Scalar | None = None
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
    b_stack_4: Scalar | None = None
    delta_theta_stack_4_c: Scalar | None = None
    b_stack_5: Scalar | None = None
    delta_theta_stack_5_c: Scalar | None = None
    b_stack_6: Scalar | None = None
    delta_theta_stack_6_c: Scalar | None = None
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
        "theta0_stack_4",
        "delta_theta_star_stack_4",
        "a_stack_4",
        "theta0_stack_5",
        "delta_theta_star_stack_5",
        "a_stack_5",
        "theta0_stack_6",
        "delta_theta_star_stack_6",
        "a_stack_6",
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
        "b_stack_4",
        "delta_theta_stack_4_c",
        "b_stack_5",
        "delta_theta_stack_5_c",
        "b_stack_6",
        "delta_theta_stack_6_c",
        "b_neg_cos_phi1_stack",
        "neg_cos_phi1_c_stack",
        "b_neg_cos_phi2_stack",
        "neg_cos_phi2_c_stack",
        "eps_stack",
    )

    def init_params(self) -> "StackingConfiguration":
        if self.pseq and self.pseq_constraints is None:
            raise ValueError(ERR_PSEQ_CONSTRAINTS)

        if self.ss_stack_weights is None:
            eps_stack = (self.eps_stack_base + self.eps_stack_kt_coeff * self.kt) * STACK_WEIGHTS_SA
        else:
            # jnp so the 4x4 table stays indexable by traced sequences (e.g.
            # under jax.checkpoint in EnergyFunction.map).
            eps_stack = jnp.asarray(self.ss_stack_weights) * (
                1.0 - self.eps_stack_kt_coeff + (self.kt * 9.0 * self.eps_stack_kt_coeff)
            )

        b_low, dr_c_low, b_high, dr_c_high = sm.get_f1_smoothing_params(
            self.dr0_stack, self.a_stack, self.dr_c_stack, self.dr_low_stack, self.dr_high_stack
        )
        b4, dth4_c = sm.get_f4_smoothing_params(self.a_stack_4, self.theta0_stack_4, self.delta_theta_star_stack_4)
        b5, dth5_c = sm.get_f4_smoothing_params(self.a_stack_5, self.theta0_stack_5, self.delta_theta_star_stack_5)
        b6, dth6_c = sm.get_f4_smoothing_params(self.a_stack_6, self.theta0_stack_6, self.delta_theta_star_stack_6)
        b_phi1, phi1_c = sm.get_f5_smoothing_params(self.a_stack_1, self.neg_cos_phi1_star_stack)
        b_phi2, phi2_c = sm.get_f5_smoothing_params(self.a_stack_2, self.neg_cos_phi2_star_stack)

        return self.replace(
            b_low_stack=b_low,
            dr_c_low_stack=dr_c_low,
            b_high_stack=b_high,
            dr_c_high_stack=dr_c_high,
            b_stack_4=b4,
            delta_theta_stack_4_c=dth4_c,
            b_stack_5=b5,
            delta_theta_stack_5_c=dth5_c,
            b_stack_6=b6,
            delta_theta_stack_6_c=dth6_c,
            b_neg_cos_phi1_stack=b_phi1,
            neg_cos_phi1_c_stack=phi1_c,
            b_neg_cos_phi2_stack=b_phi2,
            neg_cos_phi2_c_stack=phi2_c,
            eps_stack=eps_stack,
        )


@chex.dataclass(frozen=True)
class Stacking(BaseEnergyFunction):
    """Stacking over bonded pairs with sequence-dependent epsilon."""

    params: StackingConfiguration

    def stack_product(self, g: geom.BondedGeometry) -> Arr:
        """The sequence-independent f1 * f4^3 * f5^2 product (eps = 1)."""
        p = self.params
        return (
            bf.f1(
                g.r_stack,
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
            * bf.f4(g.theta4, p.theta0_stack_4, p.delta_theta_star_stack_4, p.delta_theta_stack_4_c, p.a_stack_4, p.b_stack_4)
            * bf.f4(g.theta5, p.theta0_stack_5, p.delta_theta_star_stack_5, p.delta_theta_stack_5_c, p.a_stack_5, p.b_stack_5)
            * bf.f4(g.theta6, p.theta0_stack_6, p.delta_theta_star_stack_6, p.delta_theta_stack_6_c, p.a_stack_6, p.b_stack_6)
            * bf.f5(-g.cosphi1, p.neg_cos_phi1_star_stack, p.neg_cos_phi1_c_stack, p.a_stack_1, p.b_neg_cos_phi1_stack)
            * bf.f5(-g.cosphi2, p.neg_cos_phi2_star_stack, p.neg_cos_phi2_c_stack, p.a_stack_2, p.b_neg_cos_phi2_stack)
        )

    def pairwise_energies(self, nuc: BaseNucleotide, seq, bonded_neighbors: Arr) -> Arr:
        nn_i, nn_j = bonded_neighbors[:, 0], bonded_neighbors[:, 1]
        g = geom.bonded_geometry(nuc, nn_i, nn_j, self.displacement_fn)
        v_stack = self.stack_product(g)

        if self.params.pseq:
            weights = seqdep.pair_weights(
                self.params.pseq, nn_i, nn_j, self.params.eps_stack, self.params.pseq_constraints
            )
        else:
            weights = self.params.eps_stack[seq[nn_i], seq[nn_j]]
        return weights * v_stack

    def compute_energy(self, nucleotide: BaseNucleotide) -> Scalar:
        return self.pairwise_energies(nucleotide, self.seq, self.bonded_neighbors).sum()

    def _seq_pair_weights_shift(self, seq) -> Arr:
        """(N,) eps_stack weights for (i, i+1) pairs.

        Discrete sequences contract static one-hots against the table;
        probabilistic sequences use the factorized marginal form (the same
        bilinear structure, seqdep.factorized_weights) plus the sparse
        same-base-pair correction -- all shift-aligned vector math, no
        gathers, so pseq runs on the SoA hot path too.
        """
        if self.params.pseq:
            left, right, partner, corr = seqdep.factorized_weights(
                self.params.pseq, self.params.eps_stack, self.params.pseq_constraints
            )
            w = jnp.sum(left * jnp.roll(right, -1, axis=0), axis=-1)
            idx = jnp.arange(w.shape[0])
            return w + jnp.where(partner == idx + 1, corr, 0.0)
        oh = jax.nn.one_hot(seq, 4, dtype=self.params.eps_stack.dtype)
        oh_next = jnp.roll(oh, -1, axis=0)
        return jnp.sum(_pmm(oh, self.params.eps_stack) * oh_next, axis=-1)

    def rowwise_soa(self, nuc, seq) -> Arr:
        """(N,) shift-path values; valid where bonded_next_mask."""
        g = geom.bonded_geometry_shift_soa(nuc, self.displacement_soa)
        return self._seq_pair_weights_shift(seq) * self.stack_product(g)

    def energy_soa(self, nuc, seq) -> Scalar:
        if self.bonded_next_mask is not None:
            return jnp.where(self.bonded_next_mask, self.rowwise_soa(nuc, seq), 0.0).sum()
        nn_i, nn_j = self.bonded_neighbors[:, 0], self.bonded_neighbors[:, 1]
        g = geom.bonded_geometry_soa(nuc, nn_i, nn_j, self.displacement_soa)
        if self.params.pseq:
            weights = seqdep.pair_weights(
                self.params.pseq, nn_i, nn_j, self.params.eps_stack, self.params.pseq_constraints
            )
        else:
            weights = self.params.eps_stack[seq[nn_i], seq[nn_j]]
        return (weights * self.stack_product(g)).sum()


# Hydrogen bonding ----------------------------------------------------------------


@chex.dataclass(frozen=True)
class HydrogenBondingConfiguration(BaseConfiguration):
    """HB: Morse radial x 6 angular modulations, WC-complementarity weighted."""

    eps_hb: Scalar | None = None
    a_hb: Scalar | None = None
    dr0_hb: Scalar | None = None
    dr_c_hb: Scalar | None = None
    dr_low_hb: Scalar | None = None
    dr_high_hb: Scalar | None = None
    a_hb_1: Scalar | None = None
    theta0_hb_1: Scalar | None = None
    delta_theta_star_hb_1: Scalar | None = None
    a_hb_2: Scalar | None = None
    theta0_hb_2: Scalar | None = None
    delta_theta_star_hb_2: Scalar | None = None
    a_hb_3: Scalar | None = None
    theta0_hb_3: Scalar | None = None
    delta_theta_star_hb_3: Scalar | None = None
    a_hb_4: Scalar | None = None
    theta0_hb_4: Scalar | None = None
    delta_theta_star_hb_4: Scalar | None = None
    a_hb_7: Scalar | None = None
    theta0_hb_7: Scalar | None = None
    delta_theta_star_hb_7: Scalar | None = None
    a_hb_8: Scalar | None = None
    theta0_hb_8: Scalar | None = None
    delta_theta_star_hb_8: Scalar | None = None

    ss_hb_weights: Arr | None = None

    b_low_hb: Scalar | None = None
    dr_c_low_hb: Scalar | None = None
    b_high_hb: Scalar | None = None
    dr_c_high_hb: Scalar | None = None
    b_hb_1: Scalar | None = None
    delta_theta_hb_1_c: Scalar | None = None
    b_hb_2: Scalar | None = None
    delta_theta_hb_2_c: Scalar | None = None
    b_hb_3: Scalar | None = None
    delta_theta_hb_3_c: Scalar | None = None
    b_hb_4: Scalar | None = None
    delta_theta_hb_4_c: Scalar | None = None
    b_hb_7: Scalar | None = None
    delta_theta_hb_7_c: Scalar | None = None
    b_hb_8: Scalar | None = None
    delta_theta_hb_8_c: Scalar | None = None
    eps_hb_weights: Arr | None = None

    pseq: Probabilistic_Sequence | None = None
    pseq_constraints: SequenceConstraints | None = None

    required_params: tuple[str, ...] = (
        "eps_hb",
        "a_hb",
        "dr0_hb",
        "dr_c_hb",
        "dr_low_hb",
        "dr_high_hb",
        "a_hb_1",
        "theta0_hb_1",
        "delta_theta_star_hb_1",
        "a_hb_2",
        "theta0_hb_2",
        "delta_theta_star_hb_2",
        "a_hb_3",
        "theta0_hb_3",
        "delta_theta_star_hb_3",
        "a_hb_4",
        "theta0_hb_4",
        "delta_theta_star_hb_4",
        "a_hb_7",
        "theta0_hb_7",
        "delta_theta_star_hb_7",
        "a_hb_8",
        "theta0_hb_8",
        "delta_theta_star_hb_8",
    )
    dependent_params: tuple[str, ...] = (
        "b_low_hb",
        "dr_c_low_hb",
        "b_high_hb",
        "dr_c_high_hb",
        "b_hb_1",
        "delta_theta_hb_1_c",
        "b_hb_2",
        "delta_theta_hb_2_c",
        "b_hb_3",
        "delta_theta_hb_3_c",
        "b_hb_4",
        "delta_theta_hb_4_c",
        "b_hb_7",
        "delta_theta_hb_7_c",
        "b_hb_8",
        "delta_theta_hb_8_c",
        "eps_hb_weights",
    )

    def init_params(self) -> "HydrogenBondingConfiguration":
        if self.pseq is not None and self.pseq_constraints is None:
            raise ValueError(ERR_PSEQ_CONSTRAINTS)

        eps_hb_weights = (
            HB_WEIGHTS_SA * self.eps_hb
            if self.ss_hb_weights is None
            else jnp.asarray(self.ss_hb_weights)
        )

        b_low, dr_c_low, b_high, dr_c_high = sm.get_f1_smoothing_params(
            self.dr0_hb, self.a_hb, self.dr_c_hb, self.dr_low_hb, self.dr_high_hb
        )
        updates = {
            "b_low_hb": b_low,
            "dr_c_low_hb": dr_c_low,
            "b_high_hb": b_high,
            "dr_c_high_hb": dr_c_high,
            "eps_hb_weights": eps_hb_weights,
        }
        for k in (1, 2, 3, 4, 7, 8):
            b, dth_c = sm.get_f4_smoothing_params(
                getattr(self, f"a_hb_{k}"),
                getattr(self, f"theta0_hb_{k}"),
                getattr(self, f"delta_theta_star_hb_{k}"),
            )
            updates[f"b_hb_{k}"] = b
            updates[f"delta_theta_hb_{k}_c"] = dth_c
        return self.replace(**updates)


@chex.dataclass(frozen=True)
class HydrogenBonding(BaseEnergyFunction):
    """Hydrogen bonding over unbonded pairs."""

    params: HydrogenBondingConfiguration

    def hb_product(self, g: geom.UnbondedGeometry) -> Arr:
        """Sequence-independent f1 * prod f4 (eps = 1)."""
        p = self.params
        val = bf.f1(
            jnp.maximum(g.r_base, 1e-8),
            r_low=p.dr_low_hb,
            r_high=p.dr_high_hb,
            r_c_low=p.dr_c_low_hb,
            r_c_high=p.dr_c_high_hb,
            eps=1.0,
            a=p.a_hb,
            r0=p.dr0_hb,
            r_c=p.dr_c_hb,
            b_low=p.b_low_hb,
            b_high=p.b_high_hb,
        )
        for k, theta in ((1, g.theta1), (2, g.theta2), (3, g.theta3), (4, g.theta4), (7, g.theta7), (8, g.theta8)):
            val = val * bf.f4(
                theta,
                getattr(p, f"theta0_hb_{k}"),
                getattr(p, f"delta_theta_star_hb_{k}"),
                getattr(p, f"delta_theta_hb_{k}_c"),
                getattr(p, f"a_hb_{k}"),
                getattr(p, f"b_hb_{k}"),
            )
        return val

    def pairwise_energies(
        self, nuc_i: BaseNucleotide, nuc_j: BaseNucleotide, seq, unbonded_neighbors: Arr
    ) -> Arr:
        op_i, op_j = unbonded_neighbors[0], unbonded_neighbors[1]
        n = nuc_i.center.shape[0]
        g = geom.unbonded_geometry(nuc_i, nuc_j, op_i, op_j, self.displacement_fn)
        v_hb = jnp.where(op_i < n, self.hb_product(g), 0.0)

        if self.params.pseq:
            weights = seqdep.pair_weights(
                self.params.pseq, op_i, op_j, self.params.eps_hb_weights, self.params.pseq_constraints
            )
        else:
            weights = self.params.eps_hb_weights[seq[op_i], seq[op_j]]
        return weights * v_hb

    def _pseq_factors(self):
        """(left, right, partner, corr) marginal factors of the expected
        hb-weight table (seqdep.factorized_weights contract)."""
        return seqdep.factorized_weights(
            self.params.pseq, self.params.eps_hb_weights, self.params.pseq_constraints
        )

    def _dense_weights(self, seq) -> Arr:
        """(N, N) sequence weights as one-hot contractions against the table.

        Probabilistic sequences use the identical bilinear structure with
        marginal factors instead of one-hots, plus the partner-sparse
        same-base-pair correction (exact: test_pair_weights_brute_force).
        """
        if self.params.pseq:
            left, right, partner, corr = self._pseq_factors()
            w = _pmm(left, right.T)
            col = jnp.arange(w.shape[1])[None, :]
            return w + jnp.where(col == partner[:, None], corr[:, None], 0.0)
        onehot = jax.nn.one_hot(seq, 4, dtype=self.params.eps_hb_weights.dtype)
        return _pmm(_pmm(onehot, self.params.eps_hb_weights), onehot.T)

    def pair_cutoff(self) -> float:
        return float(self.params.dr_c_high_hb)

    def dense_energies(self, nuc_i: BaseNucleotide, nuc_j: BaseNucleotide, seq_i=None, seq_j=None) -> Arr:
        """(Ni, Nj) energies via broadcasts; works on full arrays or tiles."""
        g = geom.unbonded_geometry_dense(nuc_i, nuc_j, self.displacement_fn)
        w = self.params.eps_hb_weights
        oh_i = jax.nn.one_hot(self.seq if seq_i is None else seq_i, 4, dtype=w.dtype)
        oh_j = jax.nn.one_hot(self.seq if seq_j is None else seq_j, 4, dtype=w.dtype)
        return self.hb_product(g) * _pmm(_pmm(oh_i, w), oh_j.T)

    def tile_row_fields(self) -> dict:
        if not self.params.pseq:
            return {}
        left, right, partner, corr = self._pseq_factors()
        return {
            "hb_left": left,
            "hb_right": right,
            "hb_partner": partner,
            "hb_corr": corr,
            "gid": jnp.arange(left.shape[0], dtype=jnp.int32),
        }

    def _tile_pseq_weights(self, aux_i: dict, aux_j: dict) -> Arr:
        """(Bi, Bj) expected weights from the factorized marginal fields.

        Same bilinear hw . oh structure as the discrete path, plus the
        partner-sparse same-base-pair correction keyed on the column gid.
        """
        wt = _pmm(aux_i["hb_left"], aux_j["hb_right"].T)
        same = aux_j["gid"][None, :] == aux_i["hb_partner"][:, None]
        return wt + jnp.where(same, aux_i["hb_corr"][:, None], 0.0)

    def tile_energy_fn(self):
        if self.params.pseq:

            def tile(ri, rj):
                g = geom.unbonded_geometry_dense(ri[0], rj[0], self.displacement_fn)
                return self.hb_product(g) * self._tile_pseq_weights(ri[2], rj[2])

            return tile
        return lambda ri, rj: self.dense_energies(ri[0], rj[0], ri[1], rj[1])

    def tile_energy_soa_fn(self):
        w = self.params.eps_hb_weights

        def tile(ri, rj):
            g = geom.unbonded_geometry_tile_soa(ri[0], rj[0], self.displacement_soa)
            if self.params.pseq:
                return self.hb_product(g) * self._tile_pseq_weights(ri[2], rj[2])
            oh_i = jax.nn.one_hot(ri[1], 4, dtype=w.dtype)
            oh_j = jax.nn.one_hot(rj[1], 4, dtype=w.dtype)
            return self.hb_product(g) * _pmm(_pmm(oh_i, w), oh_j.T)

        return tile

    def compute_energy(self, nucleotide: BaseNucleotide) -> Scalar:
        if self.block_ids is not None:
            return blocks.block_pair_sum(
                self.tile_energy_fn(),
                (nucleotide, jnp.asarray(self.seq), self.tile_row_fields()),
                self.block_ids,
                self.block_size,
                nucleotide.center.shape[0],
                self.bonded_neighbors,
            )
        if self.dense_mask is not None:
            g = geom.unbonded_geometry_dense(nucleotide, nucleotide, self.displacement_fn)
            vals = self.hb_product(g) * self._dense_weights(self.seq)
            return jnp.where(self.dense_mask, vals, 0.0).sum()
        return self.pairwise_energies(nucleotide, nucleotide, self.seq, self.unbonded_neighbors).sum()


# Cross stacking -------------------------------------------------------------------


@chex.dataclass(frozen=True)
class CrossStackingConfiguration(BaseConfiguration):
    """Cross stacking: harmonic radial x angular mods with symmetrized angles."""

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
    theta0_cross_4: Scalar | None = None
    delta_theta_star_cross_4: Scalar | None = None
    a_cross_4: Scalar | None = None
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
    b_cross_4: Scalar | None = None
    delta_theta_cross_4_c: Scalar | None = None
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
        "theta0_cross_4",
        "delta_theta_star_cross_4",
        "a_cross_4",
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
        "b_cross_4",
        "delta_theta_cross_4_c",
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
        for k in (1, 2, 3, 4, 7, 8):
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
    """Cross stacking over unbonded pairs (shares geometry with HB)."""

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

    def cross_product_term(self, g: geom.UnbondedGeometry) -> Arr:
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
            * (self._f4(4, g.theta4) + self._f4(4, jnp.pi - g.theta4))
            * (self._f4(7, g.theta7) + self._f4(7, jnp.pi - g.theta7))
            * (self._f4(8, g.theta8) + self._f4(8, jnp.pi - g.theta8))
        )

    def pairwise_energies(self, nuc_i: BaseNucleotide, nuc_j: BaseNucleotide, unbonded_neighbors: Arr) -> Arr:
        op_i, op_j = unbonded_neighbors[0], unbonded_neighbors[1]
        n = nuc_i.center.shape[0]
        g = geom.unbonded_geometry(nuc_i, nuc_j, op_i, op_j, self.displacement_fn)
        return jnp.where(op_i < n, self.cross_product_term(g), 0.0)

    def pair_cutoff(self) -> float:
        return float(self.params.dr_c_high_cross)

    def dense_energies(self, nuc_i: BaseNucleotide, nuc_j: BaseNucleotide) -> Arr:
        """(Ni, Nj) energies via broadcasts; works on full arrays or tiles."""
        g = geom.unbonded_geometry_dense(nuc_i, nuc_j, self.displacement_fn)
        return self.cross_product_term(g)

    def tile_energy_fn(self):
        return lambda ri, rj: self.dense_energies(ri[0], rj[0])

    def tile_energy_soa_fn(self):
        def tile(ri, rj):
            g = geom.unbonded_geometry_tile_soa(ri[0], rj[0], self.displacement_soa)
            return self.cross_product_term(g)

        return tile

    def compute_energy(self, nucleotide: BaseNucleotide) -> Scalar:
        if self.block_ids is not None:
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
            return jnp.where(self.dense_mask, self.cross_product_term(g), 0.0).sum()
        return self.pairwise_energies(nucleotide, nucleotide, self.unbonded_neighbors).sum()


# Coaxial stacking ------------------------------------------------------------------


@chex.dataclass(frozen=True)
class CoaxialStackingConfiguration(BaseConfiguration):
    """Coaxial stacking: harmonic radial x angular mods x right-handed mods."""

    dr_low_coax: Scalar | None = None
    dr_high_coax: Scalar | None = None
    k_coax: Scalar | None = None
    dr0_coax: Scalar | None = None
    dr_c_coax: Scalar | None = None
    theta0_coax_4: Scalar | None = None
    delta_theta_star_coax_4: Scalar | None = None
    a_coax_4: Scalar | None = None
    theta0_coax_1: Scalar | None = None
    delta_theta_star_coax_1: Scalar | None = None
    a_coax_1: Scalar | None = None
    theta0_coax_5: Scalar | None = None
    delta_theta_star_coax_5: Scalar | None = None
    a_coax_5: Scalar | None = None
    theta0_coax_6: Scalar | None = None
    delta_theta_star_coax_6: Scalar | None = None
    a_coax_6: Scalar | None = None
    cos_phi3_star_coax: Scalar | None = None
    a_coax_3p: Scalar | None = None
    cos_phi4_star_coax: Scalar | None = None
    a_coax_4p: Scalar | None = None

    b_low_coax: Scalar | None = None
    dr_c_low_coax: Scalar | None = None
    b_high_coax: Scalar | None = None
    dr_c_high_coax: Scalar | None = None
    b_coax_4: Scalar | None = None
    delta_theta_coax_4_c: Scalar | None = None
    b_coax_1: Scalar | None = None
    delta_theta_coax_1_c: Scalar | None = None
    b_coax_5: Scalar | None = None
    delta_theta_coax_5_c: Scalar | None = None
    b_coax_6: Scalar | None = None
    delta_theta_coax_6_c: Scalar | None = None
    b_cos_phi3_coax: Scalar | None = None
    cos_phi3_c_coax: Scalar | None = None
    b_cos_phi4_coax: Scalar | None = None
    cos_phi4_c_coax: Scalar | None = None

    required_params: tuple[str, ...] = (
        "dr_low_coax",
        "dr_high_coax",
        "k_coax",
        "dr0_coax",
        "dr_c_coax",
        "theta0_coax_4",
        "delta_theta_star_coax_4",
        "a_coax_4",
        "theta0_coax_1",
        "delta_theta_star_coax_1",
        "a_coax_1",
        "theta0_coax_5",
        "delta_theta_star_coax_5",
        "a_coax_5",
        "theta0_coax_6",
        "delta_theta_star_coax_6",
        "a_coax_6",
        "cos_phi3_star_coax",
        "a_coax_3p",
        "cos_phi4_star_coax",
        "a_coax_4p",
    )
    dependent_params: tuple[str, ...] = (
        "b_low_coax",
        "dr_c_low_coax",
        "b_high_coax",
        "dr_c_high_coax",
        "b_coax_4",
        "delta_theta_coax_4_c",
        "b_coax_1",
        "delta_theta_coax_1_c",
        "b_coax_5",
        "delta_theta_coax_5_c",
        "b_coax_6",
        "delta_theta_coax_6_c",
        "b_cos_phi3_coax",
        "cos_phi3_c_coax",
        "b_cos_phi4_coax",
        "cos_phi4_c_coax",
    )

    def init_params(self) -> "CoaxialStackingConfiguration":
        b_low, dr_c_low, b_high, dr_c_high = sm.get_f2_smoothing_params(
            self.dr0_coax, self.dr_c_coax, self.dr_low_coax, self.dr_high_coax
        )
        updates = {
            "b_low_coax": b_low,
            "dr_c_low_coax": dr_c_low,
            "b_high_coax": b_high,
            "dr_c_high_coax": dr_c_high,
        }
        for k in (4, 1, 5, 6):
            b, dth_c = sm.get_f4_smoothing_params(
                getattr(self, f"a_coax_{k}"),
                getattr(self, f"theta0_coax_{k}"),
                getattr(self, f"delta_theta_star_coax_{k}"),
            )
            updates[f"b_coax_{k}"] = b
            updates[f"delta_theta_coax_{k}_c"] = dth_c
        b3, c3 = sm.get_f5_smoothing_params(self.a_coax_3p, self.cos_phi3_star_coax)
        b4p, c4p = sm.get_f5_smoothing_params(self.a_coax_4p, self.cos_phi4_star_coax)
        updates.update(
            b_cos_phi3_coax=b3, cos_phi3_c_coax=c3, b_cos_phi4_coax=b4p, cos_phi4_c_coax=c4p
        )
        return self.replace(**updates)


@chex.dataclass(frozen=True)
class CoaxialStacking(BaseEnergyFunction):
    """Coaxial stacking over unbonded pairs."""

    params: CoaxialStackingConfiguration

    def _f4(self, k: int, theta: Arr) -> Arr:
        p = self.params
        return bf.f4(
            theta,
            getattr(p, f"theta0_coax_{k}"),
            getattr(p, f"delta_theta_star_coax_{k}"),
            getattr(p, f"delta_theta_coax_{k}_c"),
            getattr(p, f"a_coax_{k}"),
            getattr(p, f"b_coax_{k}"),
        )

    def coax_product(self, g: geom.CoaxGeometry) -> Arr:
        p = self.params
        f2_r = bf.f2(
            jnp.maximum(g.r_stack, 1e-8),
            r_low=p.dr_low_coax,
            r_high=p.dr_high_coax,
            r_c_low=p.dr_c_low_coax,
            r_c_high=p.dr_c_high_coax,
            k=p.k_coax,
            r0=p.dr0_coax,
            r_c=p.dr_c_coax,
            b_low=p.b_low_coax,
            b_high=p.b_high_coax,
        )
        return (
            f2_r
            * self._f4(4, g.theta4)
            * (self._f4(1, g.theta1) + self._f4(1, 2.0 * jnp.pi - g.theta1))
            * (self._f4(5, g.theta5) + self._f4(5, jnp.pi - g.theta5))
            * (self._f4(6, g.theta6) + self._f4(6, jnp.pi - g.theta6))
            * bf.f5(g.cosphi3, p.cos_phi3_star_coax, p.cos_phi3_c_coax, p.a_coax_3p, p.b_cos_phi3_coax)
            * bf.f5(g.cosphi4, p.cos_phi4_star_coax, p.cos_phi4_c_coax, p.a_coax_4p, p.b_cos_phi4_coax)
        )

    def pairwise_energies(self, nuc_i: BaseNucleotide, nuc_j: BaseNucleotide, unbonded_neighbors: Arr) -> Arr:
        op_i, op_j = unbonded_neighbors[0], unbonded_neighbors[1]
        n = nuc_i.center.shape[0]
        g = geom.coax_geometry(nuc_i, nuc_j, op_i, op_j, self.displacement_fn)
        return jnp.where(op_i < n, self.coax_product(g), 0.0)

    def pair_cutoff(self) -> float:
        return float(self.params.dr_c_high_coax)

    def dense_energies(self, nuc_i: BaseNucleotide, nuc_j: BaseNucleotide) -> Arr:
        """(Ni, Nj) energies via broadcasts; works on full arrays or tiles."""
        g = geom.coax_geometry_dense(nuc_i, nuc_j, self.displacement_fn)
        return self.coax_product(g)

    def tile_energy_fn(self):
        return lambda ri, rj: self.dense_energies(ri[0], rj[0])

    def tile_energy_soa_fn(self):
        def tile(ri, rj):
            g = geom.coax_geometry_tile_soa(ri[0], rj[0], self.displacement_soa)
            return self.coax_product(g)

        return tile

    def compute_energy(self, nucleotide: BaseNucleotide) -> Scalar:
        if self.block_ids is not None:
            return blocks.block_pair_sum(
                self.tile_energy_fn(),
                (nucleotide, jnp.asarray(self.seq)),
                self.block_ids,
                self.block_size,
                nucleotide.center.shape[0],
                self.bonded_neighbors,
            )
        if self.dense_mask is not None:
            g = geom.coax_geometry_dense(nucleotide, nucleotide, self.displacement_fn)
            return jnp.where(self.dense_mask, self.coax_product(g), 0.0).sum()
        return self.pairwise_energies(nucleotide, nucleotide, self.unbonded_neighbors).sum()
