"""Energy-function composition and parameter management.

Parity reference: mythos/energy/base.py:24-462. The public contract is kept
(``with_params`` re-derives dependent params inside the trace so gradients
flow; composed functions share a global parameter namespace; ``map`` evaluates
a trajectory with lax.map + optional rematerialization).

TPU-first differences:

* No jax-md: bodies are ``mythos_tpu.rigid_body.RigidBody`` pytrees and
  displacement functions broadcast natively (no map_bond wrapper).
* ``ComposedEnergyFunction`` applies each distinct ``transform_fn``
  (quaternion -> interaction sites) once per call and shares the transformed
  body across member terms; the reference recomputes it per term.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from collections.abc import Callable
from dataclasses import InitVar
from typing import Any, Union

import chex
import jax
import jax.numpy as jnp
import numpy as np

from mythos_tpu.energy.configuration import BaseConfiguration
from mythos_tpu.io.topology import Topology
from mythos_tpu.rigid_body import RigidBody
from mythos_tpu.utils.types import Arr, Scalar, Sequence

ERR_CALL_NOT_IMPLEMENTED = "Subclasses must implement this method"
ERR_COMPOSED_ENERGY_FN_LEN_MISMATCH = "Weights must have the same length as energy functions"
ERR_COMPOSED_ENERGY_FN_TYPE_ENERGY_FNS = "energy_fns must be a list of energy functions"
ERR_MISSING_TOPOLOGY = "Missing topology information"


@chex.dataclass(frozen=True, kw_only=True)
class EnergyFunction(ABC):
    """Callable RigidBody -> scalar energy, with parameter management.

    Attributes:
        map_batch_size: lax.map batch size in :meth:`map`.
        map_checkpoint: wrap the per-state call in jax.checkpoint inside
            :meth:`map` (memory/recompute lever for DiffTRe).
    """

    map_batch_size: int | None = 100
    map_checkpoint: bool = True

    @abstractmethod
    def __call__(self, body: RigidBody) -> Scalar:
        """Energy of the system."""

    @abstractmethod
    def with_params(self, *repl_dicts: dict, **repl_kwargs: Any) -> "EnergyFunction":
        """New energy function with updated parameters (dicts first, kwargs win)."""

    @abstractmethod
    def with_props(self, **kwargs) -> "EnergyFunction":
        """New energy function with updated class-level properties."""

    @abstractmethod
    def with_noopt(self, *params: str) -> "EnergyFunction":
        """New energy function with given parameters marked non-optimizable."""

    @abstractmethod
    def params_dict(self, *, include_dependent: bool = True, exclude_non_optimizable: bool = False) -> dict:
        """Parameters as a flat dict."""

    @abstractmethod
    def opt_params(self) -> dict[str, Scalar]:
        """The configured optimizable parameters."""

    def map(self, body_sequence: RigidBody) -> Arr:
        """Map the energy over a stacked (S, ...) body sequence."""
        inner = jax.checkpoint(self.__call__) if self.map_checkpoint else self.__call__
        return jax.lax.map(inner, body_sequence, batch_size=self.map_batch_size)


@chex.dataclass(frozen=True)
class BaseNucleotide(RigidBody, ABC):
    """Rigid body augmented with precomputed interaction sites."""

    stack_sites: Arr
    back_sites: Arr
    base_sites: Arr
    back_base_vectors: Arr
    base_normals: Arr
    cross_prods: Arr

    @staticmethod
    @abstractmethod
    def from_rigid_body(rigid_body: RigidBody, **kwargs) -> "BaseNucleotide":
        """Precompute sites from a rigid body."""


@chex.dataclass(frozen=True, kw_only=True)
class BaseEnergyFunction(EnergyFunction):
    """A single energy term bound to a topology.

    Index conventions (the contract kernels must honor): bonded pairs are
    (B, 2) indexed ``[:, 0]/[:, 1]``; unbonded pairs are transposed to (2, U)
    and indexed ``[0]/[1]``, padded entries carry index N and are masked via
    ``op_i < N``.
    """

    params: BaseConfiguration
    displacement_fn: Callable
    seq: Sequence | None = None
    bonded_neighbors: Arr | None = None
    unbonded_neighbors: Arr | None = None
    topology: InitVar[Topology | None] = None
    transform_fn: Callable | None = None
    #: SoA twin of transform_fn (BodySoA -> NucleotideSoA); enables the
    #: component-array hot path (see mythos_tpu/soa.py)
    transform_soa_fn: Callable | None = None
    #: SoA displacement over Vec3 fields; None = free space (a - b)
    displacement_soa_fn: Callable | None = None
    #: optional (N, N) mask enabling the dense gather-free unbonded path
    #: (True where the i<j pair interacts); see energy/dna1/geometry.py
    dense_mask: Arr | None = None
    #: optional (n_blocks, K) block-neighbor table enabling the block-sparse
    #: tile path (see energy/blocks.py); rebuilt in the hot loop via
    #: ``with_props(block_ids=...)``
    block_ids: Arr | None = None
    #: rows per block for the block-sparse path (static)
    block_size: int = 64
    #: (N,) bool, True where (i, i+1) is a bonded pair -- set automatically
    #: when every bonded pair is consecutive (oxDNA strand ordering). Lets
    #: the SoA bonded terms use jnp.roll instead of gathers (roll is a lane
    #: rotate with an equally cheap transpose; per-element gathers/scatters
    #: dominated the bonded gradient at large N).
    bonded_next_mask: Arr | None = None

    def __post_init__(self, topology: Topology | None) -> None:
        if topology:
            # jnp (not numpy) so gathers accept traced indices (e.g. a
            # neighbor list carried through lax.scan becomes a tracer)
            seq = topology.seq if isinstance(topology.seq, tuple) else jnp.asarray(topology.seq)
            object.__setattr__(self, "seq", seq)
            object.__setattr__(self, "bonded_neighbors", jnp.asarray(topology.bonded_neighbors))
            if self.dense_mask is None and self.block_ids is None:
                object.__setattr__(
                    self, "unbonded_neighbors", jnp.asarray(topology.unbonded_neighbors).T
                )
        elif self.seq is None or self.bonded_neighbors is None:
            raise ValueError(ERR_MISSING_TOPOLOGY)
        elif (
            self.unbonded_neighbors is None
            and self.dense_mask is None
            and self.block_ids is None
        ):
            raise ValueError(ERR_MISSING_TOPOLOGY)
        elif isinstance(self.seq, np.ndarray):
            object.__setattr__(self, "seq", jnp.asarray(self.seq))

        if self.bonded_next_mask is None and not isinstance(self.seq, tuple):
            try:
                bn = np.asarray(self.bonded_neighbors)
                n = len(self.seq)
            except Exception:  # traced arrays: keep the gather path
                bn = None
            if bn is not None and bn.size and bool(np.all(bn[:, 1] == bn[:, 0] + 1)):
                mask = np.zeros(n, dtype=bool)
                mask[bn[:, 0]] = True
                object.__setattr__(self, "bonded_next_mask", jnp.asarray(mask))

    @classmethod
    def create_from(cls, other: "EnergyFunction", **kwargs) -> "EnergyFunction":
        """New energy function copying properties from another."""
        return cls(**(dict(other) | kwargs))

    @property
    def displacement_mapped(self) -> Callable:
        """The displacement function (already natively vectorized)."""
        return self.displacement_fn

    def __add__(self, other: "BaseEnergyFunction") -> "ComposedEnergyFunction":
        if not isinstance(other, BaseEnergyFunction):
            return NotImplemented
        return ComposedEnergyFunction(energy_fns=[self, other])

    def __mul__(self, other: float) -> "ComposedEnergyFunction":
        if not isinstance(other, (float, int)):
            return NotImplemented
        return ComposedEnergyFunction(energy_fns=[self], weights=jnp.array([other], dtype=float))

    __rmul__ = __mul__

    def with_props(self, **kwargs: Any) -> EnergyFunction:
        return self.replace(**kwargs)

    def with_noopt(self, *params: str) -> EnergyFunction:
        updated = set(self.params.non_optimizable_required_params) | set(params)
        return self.replace(params=self.params.replace(non_optimizable_required_params=list(updated)))

    def opt_params(self) -> dict[str, Scalar]:
        return self.params.opt_params

    def with_params(self, *repl_dicts: dict, **repl_kwargs: Any) -> EnergyFunction:
        new_params = self.params
        for replacements in repl_dicts:
            new_params = new_params | replacements
        new_params = new_params | repl_kwargs
        return self.replace(params=new_params.init_params())

    def params_dict(self, include_dependent: bool = True, exclude_non_optimizable: bool = False) -> dict:
        return self.params.to_dictionary(
            include_dependent=include_dependent,
            exclude_non_optimizable=exclude_non_optimizable,
        )

    def __call__(self, body: RigidBody) -> Scalar:
        if self.transform_fn:
            body = self.transform_fn(body)
        return self.compute_energy(body)

    def pair_cutoff(self) -> float | None:
        """Max site-site distance with nonzero energy (None: not unbonded).

        Unbonded terms override this; neighbor lists add the site offsets to
        convert it to a center-of-mass cutoff (see
        simulators.neighbors.block_neighbor_list_for_topology).
        """
        return None

    def tile_energy_fn(self) -> Callable | None:
        """Fused-tile evaluator for the block-sparse path (None: unsupported).

        Returns a callable ``((nuc_i, seq_i), (nuc_j, seq_j)) -> (B, B)``
        over row/column tile pytrees. Terms sharing a block table and
        transform are evaluated TOGETHER on each gathered tile (see
        energy/blocks.py) so pair geometry is computed once per tile, not
        once per term.
        """
        return None

    @property
    def displacement_soa(self) -> Callable:
        """SoA displacement (free space unless displacement_soa_fn is set)."""
        if self.displacement_soa_fn is not None:
            return self.displacement_soa_fn
        return lambda a, b: a - b

    def tile_energy_soa_fn(self) -> Callable | None:
        """SoA twin of :meth:`tile_energy_fn` over NucleotideSoA tile rows."""
        return None

    def tile_row_fields(self) -> dict:
        """Extra per-row (N,) arrays this term needs on gathered tiles.

        Merged across the fused group into the third slot of the rows
        pytree: tile fns see ``ri = (nucleotide, seq, aux_dict)``.
        """
        return {}

    def energy_soa(self, nucleotide, seq) -> Scalar:
        """SoA energy for non-tile (bonded/pair-list) terms."""
        raise NotImplementedError(
            f"{type(self).__name__} does not implement the SoA hot path"
        )

    @abstractmethod
    def compute_energy(self, nucleotide: BaseNucleotide) -> Scalar:
        """Energy given the (transformed) nucleotide body."""


@chex.dataclass(frozen=True)
class ComposedEnergyFunction(EnergyFunction):
    """Weighted linear combination of energy terms with a shared namespace.

    ``with_params(kt=...)`` fans out to every member containing the key and
    errors on fully-unused keys unless ``strict_params=False``.
    """

    energy_fns: list[BaseEnergyFunction]
    weights: Arr | None = None
    strict_params: bool = True
    #: optional symmetric BlockNeighborList enabling the fused Pallas
    #: trajectory-energy path in :meth:`map` (the DiffTRe hot loop):
    #: per state, rebuild the block table and evaluate all terms through
    #: ops/oxdna_tiles. None -> the reference lax.map over __call__.
    map_neighbors: Any | None = None

    def __post_init__(self) -> None:
        if not isinstance(self.energy_fns, list) or not all(
            isinstance(fn, BaseEnergyFunction) for fn in self.energy_fns
        ):
            raise TypeError(ERR_COMPOSED_ENERGY_FN_TYPE_ENERGY_FNS)
        if self.weights is not None and len(self.weights) != len(self.energy_fns):
            raise ValueError(ERR_COMPOSED_ENERGY_FN_LEN_MISMATCH)

    def with_props(self, **kwargs: Any) -> "ComposedEnergyFunction":
        return self.replace(energy_fns=[fn.with_props(**kwargs) for fn in self.energy_fns])

    # Namespace hooks (overridden by the qualified variant) -------------------

    def _param_in_fn(self, param: str, fn: BaseEnergyFunction) -> bool:
        return param in fn.params

    def _rename_param_for_fn(self, param: str, _fn: BaseEnergyFunction) -> str:
        return param

    def _rename_param_from_fn(self, param: str, _fn: BaseEnergyFunction) -> str:
        return param

    # -------------------------------------------------------------------------

    def with_noopt(self, *params: str) -> "ComposedEnergyFunction":
        energy_fns = []
        for fn in self.energy_fns:
            fn_params = [self._rename_param_for_fn(p, fn) for p in params if self._param_in_fn(p, fn)]
            energy_fns.append(fn.with_noopt(*fn_params))
        return self.replace(energy_fns=energy_fns)

    def opt_params(self, from_fns: list[type] | None = None) -> dict[str, Scalar]:
        fns = self.energy_fns if from_fns is None else [f for f in self.energy_fns if type(f) in from_fns]
        return {self._rename_param_from_fn(k, fn): v for fn in fns for k, v in fn.opt_params().items()}

    def with_params(self, *repl_dicts: dict, **repl_kwargs: Any) -> "ComposedEnergyFunction":
        all_replacements = set(repl_kwargs) | {k for arg in repl_dicts for k in arg}
        used: set[str] = set()
        energy_fns = []
        for fn in self.energy_fns:
            new_params = {k: v for arg in repl_dicts for k, v in arg.items() if self._param_in_fn(k, fn)}
            new_params.update({k: v for k, v in repl_kwargs.items() if self._param_in_fn(k, fn)})
            used.update(new_params.keys())
            new_params = {self._rename_param_for_fn(k, fn): v for k, v in new_params.items()}
            energy_fns.append(fn.with_params(**new_params))

        if self.strict_params and (unused := all_replacements - used):
            raise ValueError(f"Some parameters were not used in any energy function: {unused}.")
        return self.replace(energy_fns=energy_fns)

    def params_dict(self, *, include_dependent: bool = True, exclude_non_optimizable: bool = False) -> dict:
        params: dict = {}
        for fn in self.energy_fns:
            fn_params = fn.params_dict(
                include_dependent=include_dependent,
                exclude_non_optimizable=exclude_non_optimizable,
            )
            params.update({self._rename_param_from_fn(k, fn): v for k, v in fn_params.items()})
        return params

    def pair_cutoff(self) -> float | None:
        """Max member cutoff (None if no member is an unbonded pair term)."""
        cutoffs = [c for fn in self.energy_fns if (c := fn.pair_cutoff()) is not None]
        return max(cutoffs) if cutoffs else None

    def compute_terms(self, body: RigidBody) -> Arr:
        """Each member's energy; each distinct transform runs exactly once.

        Members on the block-sparse path that share a block table and
        transform are fused: all their tile functions evaluate on the same
        gathered tiles in one pass (energy/blocks.py), so the column gather
        and the shared pair geometry are paid once per step, not per term.
        """
        from mythos_tpu.energy import blocks

        transformed: dict[int, RigidBody] = {}

        def transform(fn: BaseEnergyFunction) -> RigidBody:
            if fn.transform_fn is None:
                return body
            key = id(fn.transform_fn)
            if key not in transformed:
                transformed[key] = fn.transform_fn(body)
            return transformed[key]

        # group block-path members by (table, transform); order-preserving
        groups: dict[tuple[int, int], list[int]] = {}
        for i, fn in enumerate(self.energy_fns):
            tile = fn.tile_energy_fn() if fn.block_ids is not None else None
            if tile is not None:
                groups.setdefault((id(fn.block_ids), id(fn.transform_fn)), []).append(i)

        vals: list[Scalar | None] = [None] * len(self.energy_fns)
        for idxs in groups.values():
            first = self.energy_fns[idxs[0]]
            nuc = transform(first)
            aux: dict = {}
            for i in idxs:
                aux.update(self.energy_fns[i].tile_row_fields())
            rows = (nuc, jnp.asarray(first.seq), aux)
            sums = blocks.block_pair_sums(
                [self.energy_fns[i].tile_energy_fn() for i in idxs],
                rows,
                first.block_ids,
                first.block_size,
                nuc.center.shape[0],
                first.bonded_neighbors,
            )
            for k, i in enumerate(idxs):
                vals[i] = sums[k]
        for i, fn in enumerate(self.energy_fns):
            if vals[i] is None:
                vals[i] = fn.compute_energy(transform(fn))
        return jnp.array(vals)

    def __call__(self, body: RigidBody) -> Scalar:
        energy_vals = self.compute_terms(body)
        return jnp.sum(energy_vals) if self.weights is None else jnp.sum(self.weights * energy_vals)

    def supports_soa(self) -> bool:
        """True when every member implements the SoA hot path."""
        for fn in self.energy_fns:
            if fn.transform_soa_fn is None:
                return False
            has_tile = fn.block_ids is not None and fn.tile_energy_soa_fn() is not None
            has_pair = type(fn).energy_soa is not BaseEnergyFunction.energy_soa
            if not (has_tile or has_pair):
                return False
        return True

    def compute_terms_soa(self, body_soa) -> Arr:
        """SoA twin of :meth:`compute_terms` (component-array hot path).

        Block-path members fuse exactly as in compute_terms; bonded/pair
        members evaluate via their ``energy_soa``. Every distinct
        ``transform_soa_fn`` runs once.
        """
        from mythos_tpu.energy import blocks

        transformed: dict[int, Any] = {}

        def transform(fn: BaseEnergyFunction):
            key = id(fn.transform_soa_fn)
            if key not in transformed:
                transformed[key] = fn.transform_soa_fn(body_soa)
            return transformed[key]

        groups: dict[tuple[int, int], list[int]] = {}
        for i, fn in enumerate(self.energy_fns):
            tile = fn.tile_energy_soa_fn() if fn.block_ids is not None else None
            if tile is not None:
                groups.setdefault((id(fn.block_ids), id(fn.transform_soa_fn)), []).append(i)

        vals: list[Scalar | None] = [None] * len(self.energy_fns)
        for idxs in groups.values():
            first = self.energy_fns[idxs[0]]
            nuc = transform(first)
            n = jax.tree_util.tree_leaves(nuc)[0].shape[0]
            aux: dict = {}
            for i in idxs:
                aux.update(self.energy_fns[i].tile_row_fields())
            rows = (nuc, jnp.asarray(first.seq), aux)
            sums = blocks.block_pair_sums(
                [self.energy_fns[i].tile_energy_soa_fn() for i in idxs],
                rows,
                first.block_ids,
                first.block_size,
                n,
                first.bonded_neighbors,
            )
            for k, i in enumerate(idxs):
                vals[i] = sums[k]
        for i, fn in enumerate(self.energy_fns):
            if vals[i] is None:
                vals[i] = fn.energy_soa(transform(fn), jnp.asarray(fn.seq))
        return jnp.array(vals)

    def energy_soa(self, body_soa) -> Scalar:
        """Total SoA energy (weighted like __call__)."""
        vals = self.compute_terms_soa(body_soa)
        return jnp.sum(vals) if self.weights is None else jnp.sum(self.weights * vals)

    def map(self, body_sequence: RigidBody) -> Arr:
        """Map the energy over a stacked (S, ...) body sequence.

        With ``map_neighbors`` set (a symmetric BlockNeighborList), each
        state rebuilds its block table and evaluates through the fused
        Pallas kernels -- the DiffTRe re-evaluation at scale. Parameter
        gradients flow through the kernels' parameter-VJP exactly.
        """
        if self.map_neighbors is None:
            # explicit base call: chex rebuilds the class, breaking
            # zero-arg super()'s __class__ cell
            return EnergyFunction.map(self, body_sequence)
        from mythos_tpu import soa as soa_mod
        from mythos_tpu.ops import oxdna_tiles

        nbl = self.map_neighbors
        # prepared once, OUTSIDE the state map: packed params and static row
        # fields would otherwise re-execute per state (XLA does not hoist
        # out of loop bodies)
        ctxs = oxdna_tiles.prepare_contexts(
            self, nbl.idx, nbl.block_size, perm=getattr(nbl, "perm", None),
            banded=getattr(nbl, "banded", False),
        )

        def one(body: RigidBody) -> Scalar:
            bsoa = soa_mod.to_soa(body) if isinstance(body, RigidBody) else body
            ids, ovf = nbl.build(bsoa.center)
            e = oxdna_tiles.fused_energy_ctx(self, ctxs, bsoa, ids)
            # a state whose block table overflowed capacity silently drops
            # pairs; poison its energy so downstream reweighting fails loudly
            # (the simulator path surfaces the same condition as
            # neighbor_overflow metadata)
            return jnp.where(ovf, jnp.nan, e)

        inner = jax.checkpoint(one) if self.map_checkpoint else one
        return jax.lax.map(inner, body_sequence)

    def without_terms(self, *terms: str | type) -> "ComposedEnergyFunction":
        """Drop terms by class or class name."""
        new_fns, new_weights = [], []
        for i, fn in enumerate(self.energy_fns):
            if type(fn) in terms or fn.__class__.__name__ in terms:
                continue
            new_fns.append(fn)
            if self.weights is not None:
                new_weights.append(self.weights[i])
        weights = None if self.weights is None else jnp.array(new_weights)
        return self.replace(energy_fns=new_fns, weights=weights)

    def add_energy_fn(self, energy_fn: BaseEnergyFunction, weight: float = 1.0) -> "ComposedEnergyFunction":
        """Append a term (with optional weight)."""
        if self.weights is None:
            weights = None if weight == 1.0 else jnp.array([1.0] * len(self.energy_fns) + [weight])
        else:
            weights = jnp.concatenate([self.weights, jnp.array([weight])])
        return ComposedEnergyFunction(energy_fns=[*self.energy_fns, energy_fn], weights=weights)

    def add_composable_energy_fn(self, energy_fn: "ComposedEnergyFunction") -> "ComposedEnergyFunction":
        """Concatenate two composed functions, merging weights."""
        ow = energy_fn.weights
        if self.weights is None and ow is None:
            weights = None
        elif self.weights is not None and ow is not None:
            weights = jnp.concatenate([self.weights, ow])
        else:
            this_w = self.weights if self.weights is not None else jnp.ones(len(self.energy_fns))
            other_w = ow if ow is not None else jnp.ones(len(energy_fn.energy_fns))
            weights = jnp.concatenate([this_w, other_w])
        return ComposedEnergyFunction(energy_fns=self.energy_fns + energy_fn.energy_fns, weights=weights)

    def __add__(self, other: Union[BaseEnergyFunction, "ComposedEnergyFunction"]) -> "ComposedEnergyFunction":
        if isinstance(other, ComposedEnergyFunction):
            return self.add_composable_energy_fn(other)
        if isinstance(other, BaseEnergyFunction):
            return self.add_energy_fn(other)
        return NotImplemented

    __radd__ = __add__

    @classmethod
    def from_lists(
        cls,
        energy_fns: list[type[BaseEnergyFunction]],
        energy_configs: list[BaseConfiguration],
        weights: list[float] | None = None,
        **kwargs,
    ) -> "ComposedEnergyFunction":
        """Instantiate term classes with shared kwargs + initialized configs."""
        weights = weights if weights is not None else jnp.ones(len(energy_fns))
        fns = [
            ef(**kwargs, params=ec.init_params())
            for ef, ec in zip(energy_fns, energy_configs, strict=True)
        ]
        return cls(energy_fns=fns, weights=weights)


class QualifiedComposedEnergyFunction(ComposedEnergyFunction):
    """Composed function with per-term parameter namespaces (``Class.param``)."""

    def _param_in_fn(self, param: str, fn: BaseEnergyFunction) -> bool:
        cls, param = param.split(".", 1)
        return param in fn.params and fn.__class__.__qualname__ == cls

    def _rename_param_for_fn(self, param: str, fn: BaseEnergyFunction) -> str:
        return param.split(".", 1)[1]

    def _rename_param_from_fn(self, param: str, fn: BaseEnergyFunction) -> str:
        return f"{fn.__class__.__qualname__}.{param}"
