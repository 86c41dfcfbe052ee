"""Unit tests for the energy substrate: smoothing solvers, base functions,
seq-dep weights (brute force), composition semantics, Wasserstein."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mythos_tpu.energy.functions as bf
import mythos_tpu.energy.potentials as pot
import mythos_tpu.energy.smoothing as sm
from mythos_tpu.energy import seqdep
from mythos_tpu.io.sequence_constraints import from_bps
from mythos_tpu.observables.wasserstein import wasserstein_1d
from mythos_tpu.utils import constants as const
from mythos_tpu.utils.units import from_kt, get_kt, get_kt_from_string


def test_units():
    assert get_kt(300.0) == pytest.approx(0.1)
    assert get_kt_from_string("300K") == pytest.approx(0.1)
    assert get_kt_from_string("26.85C") == pytest.approx(0.1)
    assert from_kt(0.1) == pytest.approx(300.0)
    with pytest.raises(ValueError, match="Invalid temperature string"):
        get_kt_from_string("300")


# -- smoothing solvers: value/derivative continuity at the matching points --------


def test_f1_smoothing_continuity():
    """Smoothed tails must match the Morse branch in value and slope."""
    x0, a, xc, x_low, x_high = 0.4, 6.0, 0.9, 0.32, 0.75
    b_lo, xc_lo, b_hi, xc_hi = sm.get_f1_smoothing_params(x0, a, xc, x_low, x_high)

    def morse_shifted(r):
        return pot.v_morse(r, 1.0, x0, a) - pot.v_morse(xc, 1.0, x0, a)

    for x, b, xs in ((x_low, b_lo, xc_lo), (x_high, b_hi, xc_hi)):
        np.testing.assert_allclose(float(pot.v_smooth(x, b, xs)), float(morse_shifted(x)), rtol=1e-9)
        g_smooth = jax.grad(lambda r: pot.v_smooth(r, b, xs))(x)
        g_target = jax.grad(morse_shifted)(x)
        np.testing.assert_allclose(float(g_smooth), float(g_target), rtol=1e-7)


def test_f2_smoothing_matches_closed_form():
    """Generic matching reproduces the reference's expanded algebra."""
    x0, xc, x_low, x_high = 0.575, 0.675, 0.495, 0.655
    b_lo, xc_lo, b_hi, xc_hi = sm.get_f2_smoothing_params(x0, xc, x_low, x_high)

    def ref_b(x):
        return (x - x0) ** 2 / (2 * (x - xc) * (x - 2 * x0 + xc))

    def ref_xc(x):
        return (x * x0 - 2 * x0 * xc + xc**2) / (x - x0)

    np.testing.assert_allclose(float(b_lo), ref_b(x_low), rtol=1e-12)
    np.testing.assert_allclose(float(xc_lo), ref_xc(x_low), rtol=1e-12)
    np.testing.assert_allclose(float(b_hi), ref_b(x_high), rtol=1e-12)
    np.testing.assert_allclose(float(xc_hi), ref_xc(x_high), rtol=1e-12)


def test_f3_smoothing_matches_closed_form():
    r_star, sigma = 0.32, 0.33
    b, xc = sm.get_f3_smoothing_params(r_star, sigma)
    x = r_star
    ref_b = (
        -36 * sigma**6 * (-2 * sigma**6 + x**6) ** 2
        / (x**14 * (-sigma + x) * (sigma + x) * (sigma**2 - sigma * x + x**2) * (sigma**2 + sigma * x + x**2))
    )
    ref_xc = x * (-7 * sigma**6 + 4 * x**6) / (3 * (-2 * sigma**6 + x**6))
    np.testing.assert_allclose(float(b), ref_b, rtol=1e-10)
    np.testing.assert_allclose(float(xc), ref_xc, rtol=1e-10)


def test_f4_f5_continuity():
    a, theta0, dts = 1.5, 0.0, 0.7
    b, dtc = sm.get_f4_smoothing_params(a, theta0, dts)
    x = theta0 + dts
    np.testing.assert_allclose(float(pot.v_smooth(x, b, theta0 + dtc)), 1 - a * dts**2, rtol=1e-10)

    a5, xs = 2.0, -0.65
    b5, xc5 = sm.get_f5_smoothing_params(a5, xs)
    np.testing.assert_allclose(float(pot.v_smooth(xs, b5, xc5)), 1 - a5 * xs**2, rtol=1e-10)


def test_f4_piecewise_regions():
    a, theta0, dts = 1.3, 0.0, 0.8
    b, dtc = sm.get_f4_smoothing_params(a, theta0, dts)
    # inside: quadratic modulation; at center: 1
    assert float(bf.f4(jnp.array(0.0), theta0, dts, dtc, a, b)) == pytest.approx(1.0)
    # outside cutoff: 0
    assert float(bf.f4(jnp.array(theta0 + dtc + 0.1), theta0, dts, dtc, a, b)) == 0.0
    # f6 one-sided quadratic
    assert float(bf.f6(jnp.array(1.0), 40.0, 2.0)) == 0.0
    assert float(bf.f6(jnp.array(2.5), 40.0, 2.0)) == pytest.approx(0.5 * 40 * 0.25)


# -- probabilistic sequence weights: brute-force enumeration ------------------------


def test_pair_weights_brute_force():
    """Marginal-table weights == exhaustive enumeration over sequences."""
    rng = np.random.default_rng(0)
    n = 6
    sc = from_bps(n, np.array([[0, 5], [1, 4]]))  # 2 bps + 2 unpaired (2, 3)

    up_pseq = rng.random((sc.n_unpaired, 4))
    up_pseq /= up_pseq.sum(axis=1, keepdims=True)
    bp_pseq = rng.random((sc.n_bp, 4))
    bp_pseq /= bp_pseq.sum(axis=1, keepdims=True)
    pseq = (jnp.asarray(up_pseq), jnp.asarray(bp_pseq))

    weights_table = jnp.asarray(rng.random((4, 4)))

    # all pairs (i, j), i != j
    pairs = [(i, j) for i in range(n) for j in range(n) if i != j]
    op_i = jnp.array([p[0] for p in pairs])
    op_j = jnp.array([p[1] for p in pairs])
    computed = seqdep.pair_weights(pseq, op_i, op_j, weights_table, sc)

    # brute force: enumerate all sequences weighted by their probability
    expected = np.zeros(len(pairs))
    for up_choice in itertools.product(range(4), repeat=sc.n_unpaired):
        for bp_choice in itertools.product(range(4), repeat=sc.n_bp):
            prob = 1.0
            seq = np.zeros(n, dtype=int)
            for k, idx in enumerate(np.asarray(sc.unpaired)):
                seq[idx] = up_choice[k]
                prob *= up_pseq[k, up_choice[k]]
            for k, (i, j) in enumerate(np.asarray(sc.bps)):
                seq[i], seq[j] = const.BP_IDXS[bp_choice[k]]
                prob *= bp_pseq[k, bp_choice[k]]
            for p_idx, (i, j) in enumerate(pairs):
                expected[p_idx] += prob * float(weights_table[seq[i], seq[j]])

    np.testing.assert_allclose(np.asarray(computed), expected, rtol=1e-8)

    # factorized form: left @ right + partner-sparse correction reproduces
    # pair_weights for every i != j (the contract the dense/block/fused
    # paths rely on)
    left, right, partner, corr = seqdep.factorized_weights(pseq, weights_table, sc)
    fact = np.einsum("pa,pa->p", np.asarray(left)[np.asarray(op_i)],
                     np.asarray(right)[np.asarray(op_j)])
    fact += np.where(np.asarray(op_j) == np.asarray(partner)[np.asarray(op_i)],
                     np.asarray(corr)[np.asarray(op_i)], 0.0)
    np.testing.assert_allclose(fact, expected, rtol=1e-8)


# -- Wasserstein vs scipy ------------------------------------------------------------


def test_wasserstein_matches_scipy():
    scipy_stats = pytest.importorskip("scipy.stats")
    rng = np.random.default_rng(0)
    u = rng.normal(size=50)
    v = rng.normal(loc=0.5, size=80)
    got = float(wasserstein_1d(jnp.asarray(u), jnp.asarray(v)))
    want = scipy_stats.wasserstein_distance(u, v)
    np.testing.assert_allclose(got, want, rtol=1e-9)

    uw = rng.random(50)
    uw /= uw.sum()
    vw = rng.random(80)
    vw /= vw.sum()
    got = float(wasserstein_1d(jnp.asarray(u), jnp.asarray(v), jnp.asarray(uw), jnp.asarray(vw)))
    want = scipy_stats.wasserstein_distance(u, v, uw, vw)
    np.testing.assert_allclose(got, want, rtol=1e-9)


# -- composition semantics -------------------------------------------------------------


def test_composed_with_params_strictness(test_data_dir):
    import mythos_tpu.energy.dna1 as dna1
    import mythos_tpu.io.topology as top

    topology = top.from_oxdna_file(f"{test_data_dir}/dna1/simple-helix/generated.top")
    energy_fn = dna1.create_default_energy_fn(topology)

    with pytest.raises(ValueError, match="not used"):
        energy_fn.with_params(no_such_param=1.0)

    relaxed = energy_fn.replace(strict_params=False).with_params(no_such_param=1.0)
    assert relaxed is not None

    # fan-out: eps_exc lives in both excluded-volume terms
    updated = energy_fn.with_params(eps_exc=3.0)
    vals = [float(fn.params.eps_exc) for fn in updated.energy_fns if "eps_exc" in fn.params]
    assert vals == [3.0, 3.0]

    # without_terms drops by name
    smaller = energy_fn.without_terms("CoaxialStacking")
    assert len(smaller.energy_fns) == len(energy_fn.energy_fns) - 1


def test_qualified_namespace(test_data_dir):
    import mythos_tpu.energy.dna1 as dna1
    import mythos_tpu.io.topology as top
    from mythos_tpu.energy.base import QualifiedComposedEnergyFunction

    topology = top.from_oxdna_file(f"{test_data_dir}/dna1/simple-helix/generated.top")
    base = dna1.create_default_energy_fn(topology)
    qual = QualifiedComposedEnergyFunction(energy_fns=base.energy_fns, weights=base.weights)

    params = qual.opt_params()
    assert "Fene.eps_backbone" in params
    updated = qual.with_params(**{"Fene.eps_backbone": 3.0})
    fene = next(fn for fn in updated.energy_fns if fn.__class__.__name__ == "Fene")
    assert float(fene.params.eps_backbone) == 3.0
