"""Small nonlinear least-squares solver (Gauss-Newton with damping).

Replaces the reference's jaxopt.GaussNewton dependency
(mythos/observables/wlc.py:9, membrane_melting_temp.py) with a self-contained
fixed-iteration solver: jittable, differentiable (unrolled iterations), and
shape-static for TPU.
"""

from __future__ import annotations

from collections.abc import Callable

import jax
import jax.numpy as jnp

from mythos_tpu.utils.types import Arr


def gauss_newton(
    residual_fn: Callable[..., Arr],
    init_params: Arr,
    n_iters: int = 20,
    damping: float = 1e-8,
    **residual_kwargs,
) -> Arr:
    """Minimize ||residual_fn(params, **kwargs)||^2 from init_params.

    Fixed iteration count (static shapes); each step solves the damped normal
    equations via lstsq on [J; sqrt(damping) I].
    """
    init_params = jnp.asarray(init_params, dtype=jnp.result_type(init_params, jnp.float32))
    n = init_params.shape[0]

    def step(params, _):
        r = residual_fn(params, **residual_kwargs)
        jac = jax.jacfwd(lambda p: residual_fn(p, **residual_kwargs))(params)
        a = jnp.concatenate([jac, jnp.sqrt(damping) * jnp.eye(n, dtype=jac.dtype)])
        b = jnp.concatenate([-r, jnp.zeros(n, dtype=r.dtype)])
        delta = jnp.linalg.lstsq(a, b)[0]
        return params + delta, None

    params, _ = jax.lax.scan(step, init_params, None, length=n_iters)
    return params


def levenberg_marquardt(
    residual_fn: Callable[..., Arr],
    init_params: Arr,
    n_iters: int = 50,
    lambda_init: float = 1e-3,
    lambda_up: float = 10.0,
    lambda_down: float = 0.1,
    **residual_kwargs,
) -> Arr:
    """Damped least squares with adaptive damping (fixed iteration count).

    Each step solves (J^T J + lambda I) delta = -J^T r; steps that increase
    the cost are rejected (params kept, damping raised) via jnp.where, so the
    loop stays jittable with static shapes.
    """
    init_params = jnp.asarray(init_params, dtype=jnp.result_type(init_params, jnp.float32))
    n = init_params.shape[0]

    def cost(params):
        r = residual_fn(params, **residual_kwargs)
        return jnp.sum(r * r)

    def step(carry, _):
        params, lam = carry
        r = residual_fn(params, **residual_kwargs)
        jac = jax.jacfwd(lambda p: residual_fn(p, **residual_kwargs))(params)
        jtj = jnp.matmul(jac.T, jac, precision=jax.lax.Precision.HIGHEST)
        jtr = jnp.matmul(jac.T, r, precision=jax.lax.Precision.HIGHEST)
        delta = jnp.linalg.solve(jtj + lam * jnp.eye(n, dtype=jtj.dtype), -jtr)
        new_params = params + delta
        improved = cost(new_params) < jnp.sum(r * r)
        params = jnp.where(improved, new_params, params)
        lam = jnp.where(improved, lam * lambda_down, lam * lambda_up)
        return (params, lam), None

    (params, _), _ = jax.lax.scan(step, (init_params, jnp.asarray(lambda_init)), None, length=n_iters)
    return params
