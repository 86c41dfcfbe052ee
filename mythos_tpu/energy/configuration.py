"""Parameter-container contract for energy terms.

Parity reference: mythos/energy/configuration.py:16-123. This is the contract
that ties energy terms to TOML defaults, oxDNA model.h export, and the
optimizer: independent (required) params, non-optimizable params, dependent
params re-derived by ``init_params()`` (inside the jit trace so gradients flow
through the derivation), and the opt_params filter with the ``OPT_ALL``
wildcard.
"""

from __future__ import annotations

import warnings
from typing import Any, Union

import chex

from mythos_tpu.utils.types import ARR_OR_SCALAR, Scalar

ERR_MISSING_REQUIRED_PARAMS = "Required properties {props} are not initialized."
ERR_OPT_DEPENDENT_PARAMS = "Only {req_params} permitted for optimization, but found {given_params}"
WARN_INIT_PARAMS_NOT_IMPLEMENTED = "init_params not implemented"
WARN_DEPENDENT_PARAMS_NOT_INITIALIZED = "Dependent parameters not initialized"


@chex.dataclass(frozen=True)
class BaseConfiguration:
    """Base class for energy-term parameter containers.

    Attributes:
        params_to_optimize: names to expose to the optimizer ("*" = all
            optimizable required params).
        required_params: independent parameters that must be set.
        non_optimizable_required_params: required but never optimized (e.g.
            kt, weight tables).
        dependent_params: derived by init_params() from the independent ones
            (smoothing coefficients etc.).
    """

    params_to_optimize: tuple[str, ...] = ()
    required_params: tuple[str, ...] = ()
    non_optimizable_required_params: tuple[str, ...] = ()
    dependent_params: tuple[str, ...] = ()
    OPT_ALL: tuple[str, ...] = ("*",)

    @property
    def opt_params(self) -> dict[str, Scalar]:
        """The optimizable parameter subset as a dict."""
        if self.params_to_optimize == self.OPT_ALL:
            return {
                k: v
                for k, v in self.items()
                if k in self.required_params and k not in self.non_optimizable_required_params
            }
        return {k: v for k, v in self.items() if k in self.params_to_optimize}

    def __post_init__(self) -> None:
        missing = [p for p in self.required_params if getattr(self, p) is None]
        if missing:
            raise ValueError(ERR_MISSING_REQUIRED_PARAMS.format(props=",".join(missing)))

        optimizable = set(self.required_params) - set(self.non_optimizable_required_params)
        bad = set(self.params_to_optimize) - optimizable
        if bad and bad != set(self.OPT_ALL):
            raise ValueError(
                ERR_OPT_DEPENDENT_PARAMS.format(
                    req_params=",".join(sorted(optimizable)),
                    given_params=",".join(sorted(bad)),
                )
            )

    def init_params(self) -> "BaseConfiguration":
        """Recompute dependent parameters. Subclasses with dependents override."""
        warnings.warn(WARN_INIT_PARAMS_NOT_IMPLEMENTED, stacklevel=1)
        return self

    @classmethod
    def from_dict(cls, params: dict[str, float], params_to_optimize: tuple[str, ...] = ()) -> "BaseConfiguration":
        """Construct from a plain dict (e.g. a parsed TOML table)."""
        return cls(**(params | {"params_to_optimize": params_to_optimize}))

    def to_dictionary(
        self, *, include_dependent: bool, exclude_non_optimizable: bool
    ) -> dict[str, ARR_OR_SCALAR]:
        """Flatten to a dict of parameter values."""
        params = {k: getattr(self, k) for k in self.required_params}
        if include_dependent:
            for k in self.dependent_params:
                if (val := getattr(self, k)) is not None:
                    params[k] = val
                else:
                    warnings.warn(WARN_DEPENDENT_PARAMS_NOT_INITIALIZED, stacklevel=1)
        if exclude_non_optimizable:
            for k in self.non_optimizable_required_params:
                params.pop(k, None)
        return params

    def __or__(self, other: Union["BaseConfiguration", dict[str, Any]]) -> "BaseConfiguration":
        """Merge in another configuration (None leaves skipped) or a dict."""
        if isinstance(other, BaseConfiguration):
            return self.replace(**{k: v for k, v in other.items() if v is not None})
        if isinstance(other, dict):
            return self.replace(**other)
        return NotImplemented
