"""Generic hybrid-term machinery for the oxNA model.

The reference implements seven near-identical wrapper files
(mythos/energy/na1/*.py, ~1800 LoC): each hybrid term holds dna_/rna_(/drh_)
prefixed copies of a sub-model term's parameters, builds the sub-configs in
init_params, evaluates each sub-model over all pairs, and selects per pair by
nucleotide type with nested jnp.where. Here that pattern is one factory:

    Fene, FeneConfiguration = make_hybrid_term(
        "Fene", pairs="bonded",
        subspecs={"dna": (dna1.Fene, dna1.FeneConfiguration),
                  "rna": (dna1.Fene, dna1.FeneConfiguration)})

The generated configuration is a real chex dataclass whose fields are the
prefixed sub-parameters (the cross-framework naming contract, e.g.
``dna_eps_backbone``, ``drh_k_cross``), plus ``nt_type`` and any shared
parameters (kt, salt_conc, ...). On TPU the 2/4-way select compiles to masked
elementwise blends over the same fixed-shape pair arrays -- all four
parameterizations evaluate in one fused pass, which is exactly how a
per-pair parameter-table select should look for the VPU.
"""

from __future__ import annotations


from typing import Any

import chex
import jax.numpy as jnp

from mythos_tpu.energy.base import BaseEnergyFunction
from mythos_tpu.energy.configuration import BaseConfiguration
from mythos_tpu.io.topology import NucleotideType, Topology
from mythos_tpu.utils.types import Arr, Scalar

PREFIXES = ("dna", "rna", "drh")


def is_rna_pair(i: Arr, j: Arr, nt_type: Arr) -> Arr:
    """True where both nucleotides are RNA (vectorized over index arrays)."""
    return (nt_type[i] == NucleotideType.RNA) & (nt_type[j] == NucleotideType.RNA)


def is_dna_rna_pair(i: Arr, j: Arr, nt_type: Arr) -> Arr:
    """True where i is DNA and j is RNA."""
    return (nt_type[i] == NucleotideType.DNA) & (nt_type[j] == NucleotideType.RNA)


def _strip(prefix: str, name: str) -> str:
    return name[len(prefix) + 1 :]


def make_hybrid_configuration(
    name: str,
    subspecs: dict[str, tuple[type, type]],
    shared: tuple[str, ...] = (),
    optional_sub_params: tuple[str, ...] = (),
) -> type[BaseConfiguration]:
    """Build the hybrid configuration dataclass.

    Args:
        name: class name ("FeneConfiguration" etc.).
        subspecs: prefix -> (term class, config class).
        shared: unprefixed parameters copied into every sub-config (e.g. kt).
        optional_sub_params: optional sub-config fields (e.g. seq-dep weight
            tables) exposed prefixed and forwarded only when set.
    """
    fields: list[tuple[str, Any, Any]] = [("nt_type", Any, None)]
    required = ["nt_type"]
    for prefix, (_, cfg_cls) in subspecs.items():
        for p in cfg_cls.__dataclass_fields__["required_params"].default:
            if p in shared:
                continue
            fields.append((f"{prefix}_{p}", Any, None))
            required.append(f"{prefix}_{p}")
        for p in optional_sub_params:
            if p in cfg_cls.__dataclass_fields__:
                fields.append((f"{prefix}_{p}", Any, None))
    for p in shared:
        fields.append((p, Any, None))
        required.append(p)
    # dependent: the initialized sub-configs
    for prefix in subspecs:
        fields.append((f"{prefix}_config", Any, None))

    def init_params(self):
        updates = {}
        for prefix, (_, cfg_cls) in subspecs.items():
            cfg_required = cfg_cls.__dataclass_fields__["required_params"].default
            kwargs = {
                p: getattr(self, p if p in shared else f"{prefix}_{p}") for p in cfg_required
            }
            for p in optional_sub_params:
                if p in cfg_cls.__dataclass_fields__:
                    val = getattr(self, f"{prefix}_{p}", None)
                    if val is not None:
                        kwargs[p] = val
            updates[f"{prefix}_config"] = cfg_cls(**kwargs).init_params()
        return self.replace(**updates)

    # build a plain class (annotations + defaults) and let chex process it
    annotations: dict[str, Any] = {}
    namespace: dict[str, Any] = {"init_params": init_params}
    for n, t, d in fields:
        annotations[n] = t
        namespace[n] = d
    for n, d in (
        ("required_params", tuple(required)),
        ("non_optimizable_required_params", ("nt_type",)),
        ("dependent_params", tuple(f"{p}_config" for p in subspecs)),
    ):
        annotations[n] = tuple
        namespace[n] = d
    namespace["__annotations__"] = annotations

    cls = type(name, (BaseConfiguration,), namespace)
    return chex.dataclass(frozen=True)(cls)


def make_hybrid_term(
    name: str,
    pairs: str,
    subspecs: dict[str, tuple[type, type]],
    shared: tuple[str, ...] = (),
    term_fields: tuple[str, ...] = (),
    optional_sub_params: tuple[str, ...] = (),
) -> tuple[type[BaseEnergyFunction], type[BaseConfiguration]]:
    """Build (Term, Configuration) for a hybrid oxNA term.

    Args:
        pairs: "bonded" (2-way dna/rna select over bonded pairs) or
            "unbonded" (4-way select incl. both hybrid directions; the drh
            config serves dna->rna and rna->dna with swapped bodies).
        term_fields: extra fields forwarded to sub-terms via create_from
            (e.g. ("is_end",) for Debye).
        optional_sub_params: optional sub-config fields exposed prefixed.
    """
    cfg_cls = make_hybrid_configuration(
        f"{name}Configuration", subspecs, shared, optional_sub_params
    )

    import inspect

    _takes_seq = {
        prefix: "seq" in inspect.signature(term_cls.pairwise_energies).parameters
        for prefix, (term_cls, _) in subspecs.items()
    }

    def _sub_term(self, prefix: str):
        term_cls = subspecs[prefix][0]
        return term_cls.create_from(self, params=getattr(self.params, f"{prefix}_config"))

    def _pairwise(self, prefix: str, term, nuc_i, nuc_j):
        """Dispatch on the sub-term's pairwise_energies signature."""
        if pairs == "bonded":
            if _takes_seq[prefix]:
                return term.pairwise_energies(nuc_i, self.seq, self.bonded_neighbors)
            return term.pairwise_energies(nuc_i, self.bonded_neighbors)
        if _takes_seq[prefix]:
            return term.pairwise_energies(nuc_i, nuc_j, self.seq, self.unbonded_neighbors)
        return term.pairwise_energies(nuc_i, nuc_j, self.unbonded_neighbors)

    if pairs == "bonded":

        def compute_energy(self, nucleotide) -> Scalar:
            nn_i = self.bonded_neighbors[:, 0]
            nn_j = self.bonded_neighbors[:, 1]
            nt_type = jnp.asarray(self.params.nt_type)
            rna_sel = is_rna_pair(nn_i, nn_j, nt_type)

            dna_dgs = _pairwise(self, "dna", _sub_term(self, "dna"), nucleotide.dna, nucleotide.dna)
            rna_dgs = _pairwise(self, "rna", _sub_term(self, "rna"), nucleotide.rna, nucleotide.rna)
            return jnp.where(rna_sel, rna_dgs, dna_dgs).sum()

        def energy_soa(self, nucleotide, seq) -> Scalar:
            # shift path only: per-row values from both sub-models, 2-way
            # select by (i, i+1) nucleotide types
            if self.bonded_next_mask is None:
                raise NotImplementedError(
                    "hybrid SoA bonded terms require consecutive bonded pairs"
                )
            nt_type = jnp.asarray(self.params.nt_type)
            rna_sel = (nt_type == NucleotideType.RNA) & (
                jnp.roll(nt_type, -1) == NucleotideType.RNA
            )
            dna_vals = _sub_term(self, "dna").rowwise_soa(nucleotide.dna, seq)
            rna_vals = _sub_term(self, "rna").rowwise_soa(nucleotide.rna, seq)
            vals = jnp.where(rna_sel, rna_vals, dna_vals)
            return jnp.where(self.bonded_next_mask, vals, 0.0).sum()

    else:

        def compute_energy(self, nucleotide) -> Scalar:
            op_i = self.unbonded_neighbors[0]
            op_j = self.unbonded_neighbors[1]
            n = nucleotide.dna.center.shape[0]
            nt_type = jnp.asarray(self.params.nt_type)
            i_safe = jnp.clip(op_i, 0, n - 1)
            j_safe = jnp.clip(op_j, 0, n - 1)
            rna_sel = is_rna_pair(i_safe, j_safe, nt_type)
            drh_sel = is_dna_rna_pair(i_safe, j_safe, nt_type)
            rdh_sel = is_dna_rna_pair(j_safe, i_safe, nt_type)

            dna_term = _sub_term(self, "dna")
            rna_term = _sub_term(self, "rna")
            drh_term = _sub_term(self, "drh")

            dna_dgs = _pairwise(self, "dna", dna_term, nucleotide.dna, nucleotide.dna)
            rna_dgs = _pairwise(self, "rna", rna_term, nucleotide.rna, nucleotide.rna)
            drh_dgs = _pairwise(self, "drh", drh_term, nucleotide.dna, nucleotide.rna)
            rdh_dgs = _pairwise(self, "drh", drh_term, nucleotide.rna, nucleotide.dna)

            dgs = jnp.where(
                rna_sel, rna_dgs, jnp.where(drh_sel, drh_dgs, jnp.where(rdh_sel, rdh_dgs, dna_dgs))
            )
            return jnp.where(op_i < n, dgs, 0.0).sum()

        def energy_soa(self, nucleotide, seq) -> Scalar:
            raise NotImplementedError(
                "hybrid unbonded terms run through the block tile path"
            )

    def pair_cutoff(self):
        if pairs == "bonded":
            return None
        vals = [
            c for prefix in subspecs if (c := _sub_term(self, prefix).pair_cutoff()) is not None
        ]
        return max(vals) if vals else None

    def tile_row_fields(self):
        if pairs == "bonded":
            return {}
        fields = {"nt_type": jnp.asarray(self.params.nt_type)}
        for f in term_fields:
            fields[f] = jnp.asarray(getattr(self, f))
        return fields

    def _tile_select(self, sub_tiles, ri, rj):
        """4-way nucleotide-type select over sub-model tile evaluations."""
        nuc_i, seq_i, aux_i = ri[0], ri[1], ri[2]
        nuc_j, seq_j, aux_j = rj[0], rj[1], rj[2]
        nt_i, nt_j = aux_i["nt_type"], aux_j["nt_type"]
        rna_i = (nt_i == NucleotideType.RNA)[:, None]
        rna_j = (nt_j == NucleotideType.RNA)[None, :]
        dna = sub_tiles["dna"]((nuc_i.dna, seq_i, aux_i), (nuc_j.dna, seq_j, aux_j))
        rna = sub_tiles["rna"]((nuc_i.rna, seq_i, aux_i), (nuc_j.rna, seq_j, aux_j))
        drh = sub_tiles["drh"]((nuc_i.dna, seq_i, aux_i), (nuc_j.rna, seq_j, aux_j))
        rdh = sub_tiles["drh"]((nuc_i.rna, seq_i, aux_i), (nuc_j.dna, seq_j, aux_j))
        return jnp.where(
            rna_i & rna_j,
            rna,
            jnp.where(~rna_i & rna_j, drh, jnp.where(rna_i & ~rna_j, rdh, dna)),
        )

    def tile_energy_fn(self):
        if pairs == "bonded":
            return None
        subs = {prefix: _sub_term(self, prefix).tile_energy_fn() for prefix in subspecs}
        if any(t is None for t in subs.values()):
            return None
        return lambda ri, rj: _tile_select(self, subs, ri, rj)

    def tile_energy_soa_fn(self):
        if pairs == "bonded":
            return None
        subs = {prefix: _sub_term(self, prefix).tile_energy_soa_fn() for prefix in subspecs}
        if any(t is None for t in subs.values()):
            return None
        return lambda ri, rj: _tile_select(self, subs, ri, rj)

    annotations = {"params": cfg_cls}
    namespace: dict[str, Any] = {
        "compute_energy": compute_energy,
        "energy_soa": energy_soa,
        "pair_cutoff": pair_cutoff,
        "tile_row_fields": tile_row_fields,
        "_tile_select": _tile_select,
        "tile_energy_fn": tile_energy_fn,
        "tile_energy_soa_fn": tile_energy_soa_fn,
        "__doc__": f"Hybrid oxNA {name} (generic 2/4-way nucleotide-type select).",
        "__annotations__": annotations,
        "params": None,
    }
    for f in term_fields:
        annotations[f] = Any
        namespace[f] = None

    if term_fields:
        # pull extra fields (e.g. is_end) from the topology, like the
        # sub-terms would (mythos/energy/na1/debye.py via dna2.Debye)
        def __post_init__(self, topology: Topology | None) -> None:  # noqa: N807
            BaseEnergyFunction.__post_init__(self, topology)
            if topology is not None:
                for f in term_fields:
                    if hasattr(topology, f):
                        object.__setattr__(self, f, jnp.asarray(getattr(topology, f)))
            for f in term_fields:
                if getattr(self, f) is None:
                    raise ValueError(f"{f} must be provided either through topology or directly.")

        namespace["__post_init__"] = __post_init__

    term_cls = chex.dataclass(frozen=True)(type(name, (BaseEnergyFunction,), namespace))
    return term_cls, cfg_cls


def hybrid_params_from_configs(
    dna_params: dict,
    rna_params: dict,
    drh_params: dict | None = None,
) -> dict:
    """Merge per-model parameter tables into the prefixed hybrid namespace.

    Mirrors the reference's prefix-and-merge setup
    (mythos/energy/na1/tests/test_integration.py:48-150): leaf keys of nested
    tables gain dna_/rna_/drh_ prefixes; table (section) names are preserved.
    """

    def prefix_leaves(data, prefix):
        if isinstance(data, dict):
            return {
                (prefix + k if not isinstance(v, (dict, list)) else k): prefix_leaves(v, prefix)
                for k, v in data.items()
            }
        return data

    def merge(d1, d2):
        out = dict(d1)
        for k, v in d2.items():
            if k in out and isinstance(out[k], dict) and isinstance(v, dict):
                out[k] = merge(out[k], v)
            else:
                out[k] = v
        return out

    merged = merge(prefix_leaves(rna_params, "rna_"), prefix_leaves(dna_params, "dna_"))
    if drh_params is not None:
        merged = merge(merged, prefix_leaves(drh_params, "drh_"))
    return merged
