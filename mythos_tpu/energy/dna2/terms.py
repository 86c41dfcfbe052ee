"""oxDNA2-specific terms: stacking site override, new coax, Debye-Hueckel.

Parity reference: mythos/energy/dna2/{stacking,coaxial_stacking,debye}.py and
mythos/energy/dna2/interactions.py. FENE/exc-vol/HB/cross-stacking are shared
with dna1 (same classes, dna2 parameter values).
"""

from __future__ import annotations

import chex
import jax.numpy as jnp

import mythos_tpu.energy.dna1.terms as dna1_terms
import mythos_tpu.energy.functions as bf
import mythos_tpu.energy.smoothing as sm
from mythos_tpu.energy.base import BaseEnergyFunction
from mythos_tpu.energy.configuration import BaseConfiguration
from mythos_tpu.energy.dna1 import geometry as geom
from mythos_tpu.energy.dna2.nucleotide import Nucleotide
from mythos_tpu.io.topology import Topology
from mythos_tpu.utils.types import Arr, Scalar


@chex.dataclass(frozen=True)
class Stacking(dna1_terms.Stacking):
    """dna1 stacking evaluated against the dna1-compatible backbone site."""

    def pairwise_energies(self, nuc: Nucleotide, seq, bonded_neighbors: Arr) -> Arr:
        nn_i, nn_j = bonded_neighbors[:, 0], bonded_neighbors[:, 1]
        g = geom.bonded_geometry(
            nuc, nn_i, nn_j, self.displacement_fn, back_sites=nuc.back_sites_dna1
        )
        v_stack = self.stack_product(g)

        if self.params.pseq:
            from mythos_tpu.energy import seqdep

            weights = seqdep.pair_weights(
                self.params.pseq, nn_i, nn_j, self.params.eps_stack, self.params.pseq_constraints
            )
        else:
            weights = self.params.eps_stack[seq[nn_i], seq[nn_j]]
        return weights * v_stack

    def rowwise_soa(self, nuc, seq) -> Arr:
        """(N,) shift-path values; valid where bonded_next_mask."""
        g = geom.bonded_geometry_shift_soa(nuc, self.displacement_soa, back=nuc.back_dna1)
        return self._seq_pair_weights_shift(seq) * self.stack_product(g)

    def energy_soa(self, nuc, seq) -> Scalar:
        if self.bonded_next_mask is not None:
            return jnp.where(self.bonded_next_mask, self.rowwise_soa(nuc, seq), 0.0).sum()
        nn_i, nn_j = self.bonded_neighbors[:, 0], self.bonded_neighbors[:, 1]
        g = geom.bonded_geometry_soa(
            nuc, nn_i, nn_j, self.displacement_soa, back=nuc.back_dna1
        )
        if self.params.pseq:
            from mythos_tpu.energy import seqdep

            weights = seqdep.pair_weights(
                self.params.pseq, nn_i, nn_j, self.params.eps_stack, self.params.pseq_constraints
            )
        else:
            weights = self.params.eps_stack[seq[nn_i], seq[nn_j]]
        return (weights * self.stack_product(g)).sum()


@chex.dataclass(frozen=True)
class CoaxialStackingConfiguration(BaseConfiguration):
    """oxDNA2 coax: f4(theta1) augmented by the one-sided quadratic f6."""

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
    a_coax_1_f6: Scalar | None = None
    b_coax_1_f6: Scalar | None = None

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
        "a_coax_1_f6",
        "b_coax_1_f6",
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
        return self.replace(**updates)


@chex.dataclass(frozen=True)
class CoaxialStacking(BaseEnergyFunction):
    """oxDNA2 coaxial stacking (no phi modulations; f4+f6 on theta1)."""

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

    def pairwise_energies(self, nuc_i: Nucleotide, nuc_j: Nucleotide, unbonded_neighbors: Arr) -> Arr:
        op_i, op_j = unbonded_neighbors[0], unbonded_neighbors[1]
        n = nuc_i.center.shape[0]
        p = self.params
        g = geom.coax_geometry(nuc_i, nuc_j, op_i, op_j, self.displacement_fn)

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
        val = (
            f2_r
            * self._f4(4, g.theta4)
            * (self._f4(1, g.theta1) + bf.f6(g.theta1, p.a_coax_1_f6, p.b_coax_1_f6))
            * (self._f4(5, g.theta5) + self._f4(5, jnp.pi - g.theta5))
            * (self._f4(6, g.theta6) + self._f4(6, jnp.pi - g.theta6))
        )
        return jnp.where(op_i < n, val, 0.0)

    def _coax_value(self, g) -> Arr:
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
            * (self._f4(1, g.theta1) + bf.f6(g.theta1, p.a_coax_1_f6, p.b_coax_1_f6))
            * (self._f4(5, g.theta5) + self._f4(5, jnp.pi - g.theta5))
            * (self._f4(6, g.theta6) + self._f4(6, jnp.pi - g.theta6))
        )

    def pair_cutoff(self) -> float:
        return float(self.params.dr_c_high_coax)

    def dense_energies(self, nuc_i: Nucleotide, nuc_j: Nucleotide) -> Arr:
        """(Ni, Nj) energies via broadcasts; works on full arrays or tiles."""
        g = geom.coax_geometry_dense(nuc_i, nuc_j, self.displacement_fn)
        return self._coax_value(g)

    def tile_energy_fn(self):
        return lambda ri, rj: self.dense_energies(ri[0], rj[0])

    def tile_energy_soa_fn(self):
        def tile(ri, rj):
            g = geom.coax_geometry_tile_soa(ri[0], rj[0], self.displacement_soa)
            return self._coax_value(g)

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
            g = geom.coax_geometry_dense(nucleotide, nucleotide, self.displacement_fn)
            return jnp.where(self.dense_mask, self._coax_value(g), 0.0).sum()
        return self.pairwise_energies(nucleotide, nucleotide, self.unbonded_neighbors).sum()


def debye_potential(
    r: Arr,
    kappa: Scalar,
    prefactor: Scalar,
    smoothing_coeff: Scalar,
    r_cut: Scalar,
    r_high: Scalar,
) -> Arr:
    """Screened Coulomb with quadratic smoothing to r_cut."""
    r_safe = jnp.maximum(r, 1e-8)
    energy_full = jnp.exp(-kappa * r_safe) * (prefactor / r_safe)
    energy_smooth = smoothing_coeff * (r - r_cut) ** 2
    energy = jnp.where(r < r_high, energy_full, energy_smooth)
    return jnp.where(r < r_cut, energy, 0.0)


@chex.dataclass(frozen=True)
class DebyeConfiguration(BaseConfiguration):
    """Debye-Hueckel parameters: lambda/kappa/prefactor/r_cut derived from
    kt and salt concentration inside init_params (so gradients flow)."""

    q_eff: Scalar | None = None
    lambda_factor: Scalar | None = None
    prefactor_coeff: Scalar | None = None
    kt: Scalar | None = None
    salt_conc: Scalar | None = None
    half_charged_ends: bool | None = None

    lambda_: Scalar | None = None
    kappa: Scalar | None = None
    r_high: Scalar | None = None
    prefactor: Scalar | None = None
    smoothing_coeff: Scalar | None = None
    r_cut: Scalar | None = None

    required_params: tuple[str, ...] = (
        "q_eff",
        "lambda_factor",
        "prefactor_coeff",
        "kt",
        "salt_conc",
        "half_charged_ends",
    )
    dependent_params: tuple[str, ...] = (
        "lambda_",
        "kappa",
        "r_high",
        "prefactor",
        "smoothing_coeff",
        "r_cut",
    )

    def init_params(self) -> "DebyeConfiguration":
        # Debye length in oxDNA units: lambda ~ sqrt(kT / salt)
        lambda_ = self.lambda_factor * jnp.sqrt(self.kt / 0.1) / jnp.sqrt(self.salt_conc)
        kappa = 1.0 / lambda_
        r_high = 3.0 * lambda_
        prefactor = self.prefactor_coeff * self.q_eff**2
        # quadratic tail matching value+slope of the screened Coulomb at r_high
        smoothing_coeff = -(
            jnp.exp(-r_high / lambda_) * prefactor * (r_high + lambda_) ** 2
        ) / (-4.0 * r_high**3 * lambda_**2)
        r_cut = r_high * (prefactor * r_high + 3.0 * prefactor * lambda_) / (
            prefactor * (r_high + lambda_)
        )
        return self.replace(
            lambda_=lambda_,
            kappa=kappa,
            r_high=r_high,
            prefactor=prefactor,
            smoothing_coeff=smoothing_coeff,
            r_cut=r_cut,
        )


@chex.dataclass(frozen=True)
class Debye(BaseEnergyFunction):
    """Debye-Hueckel electrostatics between backbone sites (unbonded pairs).

    ``half_charged_ends`` halves terminal charges via topology.is_end
    (mythos/energy/dna2/debye.py:74-110).
    """

    params: DebyeConfiguration
    is_end: Arr | None = None

    def __post_init__(self, topology: Topology | None) -> None:
        BaseEnergyFunction.__post_init__(self, topology)
        if topology is not None:
            object.__setattr__(self, "is_end", jnp.asarray(topology.is_end))
        if self.is_end is None:
            raise ValueError("is_end must be provided either through topology or directly.")

    def pairwise_energies(self, nuc_i, nuc_j, unbonded_neighbors: Arr) -> Arr:
        op_i, op_j = unbonded_neighbors[0], unbonded_neighbors[1]
        n = nuc_i.center.shape[0]
        p = self.params

        dr_back = self.displacement_fn(nuc_j.back_sites[op_j], nuc_i.back_sites[op_i])
        r_back = jnp.linalg.norm(dr_back, axis=-1)

        dgs = debye_potential(r_back, p.kappa, p.prefactor, p.smoothing_coeff, p.r_cut, p.r_high)
        dgs = jnp.where(op_i < n, dgs, 0.0)

        end_i = jnp.where(self.is_end[jnp.clip(op_i, 0, n - 1)], 0.5, 1.0)
        end_j = jnp.where(self.is_end[jnp.clip(op_j, 0, n - 1)], 0.5, 1.0)
        mults = jnp.where(p.half_charged_ends, end_i * end_j, 1.0)
        return dgs * mults

    def dense_energies(self, nuc_i, nuc_j, is_end_i=None, is_end_j=None) -> Arr:
        """(Ni, Nj) Debye energies via broadcasts; works on tiles too."""
        p = self.params
        dr = self.displacement_fn(nuc_j.back_sites[None, :, :], nuc_i.back_sites[:, None, :])
        # epsilon inside the sqrt keeps the diagonal's gradient finite
        r = jnp.sqrt(jnp.sum(dr * dr, axis=-1) + 1e-18)
        dgs = debye_potential(r, p.kappa, p.prefactor, p.smoothing_coeff, p.r_cut, p.r_high)
        ends_i = jnp.where(jnp.asarray(self.is_end if is_end_i is None else is_end_i), 0.5, 1.0)
        ends_j = jnp.where(jnp.asarray(self.is_end if is_end_j is None else is_end_j), 0.5, 1.0)
        mults = jnp.where(p.half_charged_ends, ends_i[:, None] * ends_j[None, :], 1.0)
        return dgs * mults

    def pair_cutoff(self) -> float:
        return float(self.params.r_cut)

    def tile_row_fields(self) -> dict:
        return {"is_end": jnp.asarray(self.is_end)}

    def tile_energy_fn(self):
        return lambda ri, rj: self.dense_energies(
            ri[0], rj[0], ri[2]["is_end"], rj[2]["is_end"]
        )

    def tile_energy_soa_fn(self):
        p = self.params

        def tile(ri, rj):
            from mythos_tpu.soa import vdot

            back_i, back_j = geom._rows(ri[0].back), geom._cols(rj[0].back)
            dr = self.displacement_soa(back_j, back_i)
            r = jnp.sqrt(vdot(dr, dr) + 1e-18)
            dgs = debye_potential(r, p.kappa, p.prefactor, p.smoothing_coeff, p.r_cut, p.r_high)
            ends_i = jnp.where(ri[2]["is_end"], 0.5, 1.0)
            ends_j = jnp.where(rj[2]["is_end"], 0.5, 1.0)
            mults = jnp.where(p.half_charged_ends, ends_i[:, None] * ends_j[None, :], 1.0)
            return dgs * mults

        return tile

    def compute_energy(self, nucleotide) -> Scalar:
        if self.block_ids is not None:
            from mythos_tpu.energy import blocks

            return blocks.block_pair_sum(
                self.tile_energy_fn(),
                (nucleotide, jnp.asarray(self.seq), {"is_end": jnp.asarray(self.is_end)}),
                self.block_ids,
                self.block_size,
                nucleotide.center.shape[0],
                self.bonded_neighbors,
            )
        if self.dense_mask is not None:
            vals = self.dense_energies(nucleotide, nucleotide)
            return jnp.where(self.dense_mask, vals, 0.0).sum()
        return self.pairwise_energies(nucleotide, nucleotide, self.unbonded_neighbors).sum()
