"""Symbolic-reference tests for the f1-f6 base functions and the smoothing
solvers.

The reference pins its base functions against sympy renderings of the oxDNA
paper equations (mythos/energy/dna1/tests/symbolic_base_functions.py +
energy/tests/symbolic_potentials.py, eqs 2.1-2.11); SURVEY section 4 lists
that pattern for adoption. Each f_i is evaluated against an independently
written sympy expression over a grid spanning every branch, with parameters
taken from the real dna1/dna2 default configurations (so the branch
boundaries are the production ones). The smoothing-solver contract -- C^1
continuity at the matching points and exact zeros at the smoothed cutoffs
-- is checked separately, plus one finite-difference gradient check through
a short simulation scan (the differentiable-MD contract end to end).
"""

from __future__ import annotations

import numpy as np
import pytest
import sympy

import jax
import jax.numpy as jnp

import mythos_tpu.energy.dna1 as dna1
import mythos_tpu.energy.functions as bf

R, EPS, R0, A, DELT, K, SIGMA, B, X0, TH, TH0 = sympy.symbols(
    "r eps r0 a delt k sigma b x0 theta theta0"
)

V_MORSE = EPS * (1 - sympy.exp(-(R - R0) * A)) ** 2
V_HARMONIC = K / 2 * (R - R0) ** 2
V_LJ = 4 * EPS * ((SIGMA / R) ** 12 - (SIGMA / R) ** 6)
V_MOD = 1 - A * (TH - TH0) ** 2
V_SMOOTH = B * (X0 - R) ** 2  # about the smoothed cutoff x0


def _sym(expr, **subs) -> float:
    return float(expr.evalf(subs=subs))


@pytest.fixture(scope="module")
def stack_params():
    _, cfg = dna1.default_configs()
    p = dna1.StackingConfiguration(
        **(dict(cfg["stacking"]) | {"kt": 296.15 * 0.1 / 300.0})
    ).init_params()
    return p


@pytest.fixture(scope="module")
def exc_params():
    _, cfg = dna1.default_configs()
    return dna1.UnbondedExcludedVolumeConfiguration(
        **cfg["unbonded_excluded_volume"]
    ).init_params()


def test_f1_symbolic(stack_params):
    p = stack_params
    args = dict(
        r_low=float(p.dr_low_stack), r_high=float(p.dr_high_stack),
        r_c_low=float(p.dr_c_low_stack), r_c_high=float(p.dr_c_high_stack),
        eps=1.0, a=float(p.a_stack), r0=float(p.dr0_stack), r_c=float(p.dr_c_stack),
        b_low=float(p.b_low_stack), b_high=float(p.b_high_stack),
    )
    shift = _sym(V_MORSE, r=args["r_c"], eps=1.0, r0=args["r0"], a=args["a"])
    for r in np.linspace(args["r_c_low"] - 0.05, args["r_c_high"] + 0.05, 101):
        got = float(bf.f1(jnp.asarray(r), **args))
        if args["r_low"] < r < args["r_high"]:
            want = _sym(V_MORSE, r=r, eps=1.0, r0=args["r0"], a=args["a"]) - shift
        elif args["r_c_low"] < r < args["r_low"]:
            want = _sym(V_SMOOTH, r=r, b=args["b_low"], x0=args["r_c_low"])
        elif args["r_high"] < r < args["r_c_high"]:
            want = _sym(V_SMOOTH, r=r, b=args["b_high"], x0=args["r_c_high"])
        else:
            want = 0.0
        assert got == pytest.approx(want, rel=1e-6, abs=1e-12), r


def test_f2_symbolic():
    _, cfg = dna1.default_configs()
    p = dna1.CrossStackingConfiguration(**cfg["cross_stacking"]).init_params()
    args = dict(
        r_low=float(p.dr_low_cross), r_high=float(p.dr_high_cross),
        r_c_low=float(p.dr_c_low_cross), r_c_high=float(p.dr_c_high_cross),
        k=float(p.k_cross), r0=float(p.r0_cross), r_c=float(p.dr_c_cross),
        b_low=float(p.b_low_cross), b_high=float(p.b_high_cross),
    )
    shift = _sym(V_HARMONIC, r=args["r_c"], k=args["k"], r0=args["r0"])
    for r in np.linspace(args["r_c_low"] - 0.05, args["r_c_high"] + 0.05, 101):
        got = float(bf.f2(jnp.asarray(r), **args))
        if args["r_low"] < r < args["r_high"]:
            want = _sym(V_HARMONIC, r=r, k=args["k"], r0=args["r0"]) - shift
        elif args["r_c_low"] < r < args["r_low"]:
            want = args["k"] * _sym(V_SMOOTH, r=r, b=args["b_low"], x0=args["r_c_low"])
        elif args["r_high"] < r < args["r_c_high"]:
            want = args["k"] * _sym(V_SMOOTH, r=r, b=args["b_high"], x0=args["r_c_high"])
        else:
            want = 0.0
        assert got == pytest.approx(want, rel=1e-6, abs=1e-12), r


def test_f3_symbolic(exc_params):
    p = exc_params
    args = dict(
        r_star=float(p.dr_star_base), r_c=float(p.dr_c_base),
        eps=float(p.eps_exc), sigma=float(p.sigma_base), b=float(p.b_base),
    )
    for r in np.linspace(0.2, args["r_c"] + 0.05, 101):
        got = float(bf.f3(jnp.asarray(r), **args))
        if r < args["r_star"]:
            want = _sym(V_LJ, r=r, eps=args["eps"], sigma=args["sigma"])
        elif r < args["r_c"]:
            want = args["eps"] * _sym(V_SMOOTH, r=r, b=args["b"], x0=args["r_c"])
        else:
            want = 0.0
        assert got == pytest.approx(want, rel=1e-6, abs=1e-12), r


def test_f4_symbolic(stack_params):
    p = stack_params
    args = dict(
        theta0=float(p.theta0_stack_4), delta_theta_star=float(p.delta_theta_star_stack_4),
        delta_theta_c=float(p.delta_theta_stack_4_c), a=float(p.a_stack_4),
        b=float(p.b_stack_4),
    )
    t0, dts, dtc = args["theta0"], args["delta_theta_star"], args["delta_theta_c"]
    for th in np.linspace(t0 - dtc - 0.1, t0 + dtc + 0.1, 101):
        got = float(bf.f4(jnp.asarray(th), **args))
        if t0 - dts < th < t0 + dts:
            want = _sym(V_MOD, theta=th, a=args["a"], theta0=t0)
        elif t0 - dtc < th < t0 - dts:
            want = _sym(V_SMOOTH, r=th, b=args["b"], x0=t0 - dtc)
        elif t0 + dts < th < t0 + dtc:
            want = _sym(V_SMOOTH, r=th, b=args["b"], x0=t0 + dtc)
        else:
            want = 0.0
        assert got == pytest.approx(want, rel=1e-6, abs=1e-12), th


def test_f5_symbolic(stack_params):
    p = stack_params
    args = dict(
        x_star=float(p.neg_cos_phi1_star_stack), x_c=float(p.neg_cos_phi1_c_stack),
        a=float(p.a_stack_1), b=float(p.b_neg_cos_phi1_stack),
    )
    for x in np.linspace(args["x_c"] - 0.1, 0.3, 101):
        got = float(bf.f5(jnp.asarray(x), **args))
        if x > 0:
            want = 1.0
        elif args["x_star"] < x < 0:
            want = _sym(V_MOD, theta=x, a=args["a"], theta0=0.0)
        elif args["x_c"] < x < args["x_star"]:
            want = _sym(V_SMOOTH, r=x, b=args["b"], x0=args["x_c"])
        else:
            want = 0.0
        assert got == pytest.approx(want, rel=1e-6, abs=1e-12), x


def test_f6_symbolic():
    a, t0 = 40.0, 3.1166
    for th in np.linspace(t0 - 0.5, t0 + 0.5, 41):
        got = float(bf.f6(jnp.asarray(th), a, t0))
        want = 0.5 * a * (th - t0) ** 2 if th > t0 else 0.0
        assert got == pytest.approx(want, rel=1e-9, abs=1e-12)


# -- smoothing-solver contract ----------------------------------------------------


def test_smoothing_makes_f1_c1_and_zero_at_cutoffs(stack_params):
    """Solved b/r_c values give C^1 joins at r_low/r_high and exact zeros at
    the smoothed cutoffs (the defining property of oxDNA's v_smooth)."""
    p = stack_params
    args = dict(
        r_low=float(p.dr_low_stack), r_high=float(p.dr_high_stack),
        r_c_low=float(p.dr_c_low_stack), r_c_high=float(p.dr_c_high_stack),
        eps=1.0, a=float(p.a_stack), r0=float(p.dr0_stack), r_c=float(p.dr_c_stack),
        b_low=float(p.b_low_stack), b_high=float(p.b_high_stack),
    )
    f = lambda r: bf.f1(r, **args)  # noqa: E731
    df = jax.grad(f)
    for x in (args["r_low"], args["r_high"]):
        lo, hi = jnp.asarray(x - 1e-6), jnp.asarray(x + 1e-6)
        assert float(f(lo)) == pytest.approx(float(f(hi)), rel=2e-4, abs=1e-8)
        assert float(df(lo)) == pytest.approx(float(df(hi)), rel=2e-3, abs=1e-6)
    for x in (args["r_c_low"], args["r_c_high"]):
        assert abs(float(f(jnp.asarray(x)))) < 1e-10


@pytest.mark.slow
def test_gradient_through_short_scan_matches_fd():
    """d loss/d eps_stack_base through a 20-step Langevin scan == central
    finite differences (the end-to-end differentiable-MD contract)."""
    from __graft_entry__ import _build_sim, _tiny_duplex

    kT = 296.15 * 0.1 / 300.0
    topology, body = _tiny_duplex(4)
    energy_fn, sim = _build_sim(topology, kT, mode="dense")
    params = energy_fn.opt_params()
    key = jax.random.PRNGKey(3)

    def loss(eps):
        p = dict(params, eps_stack_base=eps)
        out = sim.run(p, body, 20, key)
        return jnp.mean(out.observables[0].center ** 2)

    e0 = jnp.asarray(params["eps_stack_base"], jnp.float64)
    g = float(jax.grad(loss)(e0))
    h = 1e-4
    fd = float((loss(e0 + h) - loss(e0 - h)) / (2 * h))
    assert g == pytest.approx(fd, rel=5e-3, abs=1e-8)
