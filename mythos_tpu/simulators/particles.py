"""Point-particle Langevin dynamics + box coupling (the MARTINI MD core).

The reference samples every lipid trajectory with the external ``gmx``
binary (mythos/simulators/gromacs/gromacs.py:27-206); this module is the
in-process TPU-native replacement: a BAOAB Langevin integrator over (N, 3)
positions (the rotor stages of simulators/integrators.py stripped away) and
a semi-isotropic Berendsen barostat whose virial comes from one reverse-mode
strain derivative of the energy -- no pair-force bookkeeping, the same AD
that powers the force evaluation.

Design notes (TPU):
- one fused jit step: B-A-O-A-B + force refresh; forces from jax.grad of
  the total energy at fixed box.
- the barostat evaluates dU/d(strain) by differentiating
  ``energy_fn(positions * (1 + eps), box * (1 + eps))`` at eps = 0 -- an
  exact per-axis virial through arbitrary terms (LJ, bonds, angles) with
  zero extra code per term.
- box/positions rescale every ``every`` steps under lax.cond-free masking
  (the scale factor is 1 when the step index misses the interval), keeping
  the scan body branch-free.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from mythos_tpu.utils.types import Arr, Scalar


class ParticleLangevinState(NamedTuple):
    """Integrator state over (N, 3) arrays; ``box`` rides along for NPT."""

    position: Arr  # (N, 3)
    momentum: Arr  # (N, 3)
    force: Arr  # (N, 3)
    box: Arr  # (3,)
    inv_mass: Arr  # scalar or (N, 1)
    key: Arr


def nvt_langevin_particles(
    energy_fn: Callable[..., Scalar],
    shift_fn: Callable[[Arr, Arr], Arr],
    dt: Scalar,
    kT: Scalar,  # noqa: N803 - domain casing
    gamma: Scalar,
) -> tuple[Callable, Callable]:
    """BAOAB Langevin for point particles.

    ``energy_fn(position, box, **kwargs) -> scalar``; ``shift_fn(x, dx)``
    applies displacements (spaces.periodic keeps coordinates wrapped).
    Exact Ornstein-Uhlenbeck O-step, like the rigid-body integrator
    (simulators/integrators.py:96-172) minus the rotor stages.
    """
    dt = jnp.asarray(dt)

    def force(position: Arr, box: Arr, **kwargs: Any) -> Arr:
        return -jax.grad(lambda x: energy_fn(x, box, **kwargs))(position)

    def init_fn(key: Arr, position: Arr, box: Arr, mass, **kwargs: Any) -> ParticleLangevinState:
        dtype = position.dtype
        m = jnp.asarray(mass, dtype=dtype).reshape(-1)
        m = m[0] if m.shape[0] == 1 else m[:, None]
        key, sub = jax.random.split(key)
        momentum = jax.random.normal(sub, position.shape, dtype) * jnp.sqrt(m * kT)
        return ParticleLangevinState(
            position=position,
            momentum=momentum,
            force=force(position, jnp.asarray(box, dtype), **kwargs),
            box=jnp.asarray(box, dtype),
            inv_mass=1.0 / m,
            key=key,
        )

    def step_fn(state: ParticleLangevinState, **kwargs: Any) -> ParticleLangevinState:
        half = 0.5 * dt
        inv_m = state.inv_mass

        p = state.momentum + half * state.force  # B
        x = shift_fn(state.position, (half * inv_m) * p)  # A

        c = jnp.exp(-gamma * dt * inv_m)  # O (exact OU)
        s = jnp.sqrt((1.0 - c * c) * kT / inv_m)
        key, sub = jax.random.split(state.key)
        p = c * p + s * jax.random.normal(sub, p.shape, p.dtype)

        x = shift_fn(x, (half * inv_m) * p)  # A
        f = force(x, state.box, **kwargs)
        p = p + half * f  # B
        return state._replace(position=x, momentum=p, force=f, key=key)

    return init_fn, step_fn


def pressure_diag(
    energy_fn: Callable[..., Scalar],
    position: Arr,
    momentum: Arr,
    inv_mass: Arr,
    box: Arr,
    **kwargs: Any,
) -> Arr:
    """(3,) diagonal pressure: P_i V = sum(p_i^2/m) - dU/d eps_i.

    The virial is the strain derivative of the energy under an affine
    per-axis scaling of positions AND box -- exact for every term that
    respects the minimum-image convention, via one reverse-mode gradient.
    """

    def strained(eps: Arr) -> Scalar:
        scale = 1.0 + eps
        return energy_fn(position * scale, box * scale, **kwargs)

    du = jax.grad(strained)(jnp.zeros((3,), position.dtype))
    twice_kinetic = jnp.sum(momentum * momentum * inv_mass, axis=0)  # (3,)
    return (twice_kinetic - du) / jnp.prod(box)


def berendsen_semi_isotropic(
    energy_fn: Callable[..., Scalar],
    state: ParticleLangevinState,
    *,
    pressure0: Scalar,
    tau: Scalar,
    dt: Scalar,
    compressibility: Scalar = 3e-4,
    **kwargs: Any,
) -> ParticleLangevinState:
    """One semi-isotropic Berendsen box update (xy coupled, z free).

    mu_i = (1 - dt/tau * kappa * (P0 - P_i))^(1/3); positions scale
    affinely with the box (GROMACS pcoupl = berendsen, pcoupltype =
    semiisotropic -- the bilayer default the reference's mdp files use).
    """
    p_diag = pressure_diag(
        energy_fn, state.position, state.momentum, state.inv_mass, state.box, **kwargs
    )
    p_xy = 0.5 * (p_diag[0] + p_diag[1])
    p_eff = jnp.stack([p_xy, p_xy, p_diag[2]])
    mu = (1.0 - (dt / tau) * compressibility * (pressure0 - p_eff)) ** (1.0 / 3.0)
    # guard against catastrophic early-step virials
    mu = jnp.clip(mu, 0.98, 1.02)
    return state._replace(position=state.position * mu, box=state.box * mu)
