"""Coverage for acquisition surfaces not exercised elsewhere: MC qPI/qUCB
vs their analytic counterparts, constrained analytic EI golden values,
analytic noisy EI, scalarized posterior mean, active-learning and
community acquisitions, and safe_math tail helpers."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from botorch_tpu.acquisition.analytic import (
    ConstrainedExpectedImprovement,
    ExpectedImprovement,
    LogConstrainedExpectedImprovement,
    LogNoisyExpectedImprovement,
    NoisyExpectedImprovement,
    ProbabilityOfImprovement,
    ScalarizedPosteriorMean,
    UpperConfidenceBound,
    make_acqf,
    make_noisy_ei,
)
from botorch_tpu.acquisition.monte_carlo import (
    make_mc_acqf,
    qProbabilityOfImprovement,
    qUpperConfidenceBound,
)
from botorch_tpu.models.gp import make_gp
from botorch_tpu.models.fully_bayesian import load_saas_samples

RNG = np.random.default_rng(0)


def _model(n=12, d=2, m=1, seed=0):
    rng = np.random.default_rng(seed)
    X = jnp.asarray(rng.uniform(size=(n, d)), jnp.float32)
    Y = jnp.asarray(
        np.stack([np.sin(3 * np.asarray(X)).sum(-1) * (k + 1) for k in range(m)], -1),
        jnp.float32,
    )
    return make_gp(X, Y), X, Y


def _ensemble(n=10, d=2, S=6, seed=1):
    model, X, Y = _model(n, d, seed=seed)
    rng = np.random.default_rng(seed)
    z = jnp.asarray(rng.normal(scale=0.3, size=(S, d + 4)), jnp.float32)
    return load_saas_samples(z, model), X, Y


def test_qpi_matches_analytic_pi_q1():
    model, X, Y = _model()
    Xq = jnp.asarray(RNG.uniform(size=(1, 2)), jnp.float32)
    best_f = float(Y.max())
    pi = make_acqf("PI", model, best_f=best_f)(Xq)
    qpi = make_mc_acqf(
        qProbabilityOfImprovement, model, q=1, num_samples=8192,
        best_f=best_f, tau=1e-4,
    )(Xq)
    np.testing.assert_allclose(float(qpi), float(pi), atol=0.02)


def test_qucb_matches_analytic_ucb_q1():
    model, X, Y = _model()
    Xq = jnp.asarray(RNG.uniform(size=(1, 2)), jnp.float32)
    beta = 2.0
    ucb = make_acqf("UCB", model, beta=beta)(Xq)
    qucb = make_mc_acqf(
        qUpperConfidenceBound, model, q=1, num_samples=8192, beta=beta
    )(Xq)
    # qUCB = mean + sqrt(beta*pi/2) E|z|-style reparam; matches analytic UCB
    # in expectation for q=1 (reference monte_carlo.py:801 docstring).
    np.testing.assert_allclose(float(qucb), float(ucb), rtol=0.05)


def test_constrained_ei_golden():
    """ConstrainedEI = EI(obj) * prod P(lo <= c <= hi) with independent
    outputs — checked against scipy normal CDF arithmetic."""
    model, X, Y = _model(m=2)
    Xq = jnp.asarray(RNG.uniform(size=(1, 2)), jnp.float32)
    post = model.posterior(Xq)
    mu = np.asarray(post.mean)[..., 0, :]
    sd = np.sqrt(np.asarray(post.variance))[..., 0, :]
    best_f = float(Y[:, 0].mean())  # moderate incumbent: EI not microscopic
    lo, hi = float(mu[1] - 1.5 * sd[1]), float(mu[1] + 0.5 * sd[1])

    cei = ConstrainedExpectedImprovement(
        model=model, cache=model.train_chol(), best_f=best_f,
        constraint_lower=jnp.asarray([-jnp.inf, lo]),
        constraint_upper=jnp.asarray([jnp.inf, hi]),
        objective_index=0,
    )
    log_cei = LogConstrainedExpectedImprovement(
        model=model, cache=model.train_chol(), best_f=best_f,
        constraint_lower=jnp.asarray([-jnp.inf, lo]),
        constraint_upper=jnp.asarray([jnp.inf, hi]),
        objective_index=0,
    )
    u = (mu[0] - best_f) / sd[0]
    ei = sd[0] * (u * stats.norm.cdf(u) + stats.norm.pdf(u))
    p_feas = stats.norm.cdf((hi - mu[1]) / sd[1]) - stats.norm.cdf(
        (lo - mu[1]) / sd[1]
    )
    np.testing.assert_allclose(float(cei(Xq)), ei * p_feas, rtol=1e-3)
    np.testing.assert_allclose(
        float(log_cei(Xq)), math.log(ei * p_feas), rtol=1e-3, atol=1e-4
    )


def test_noisy_ei_close_to_ei_at_low_noise():
    model, X, Y = _model()
    nei = make_noisy_ei(
        NoisyExpectedImprovement, model, X, jax.random.PRNGKey(0),
        num_fantasies=24,
    )
    log_nei = make_noisy_ei(
        LogNoisyExpectedImprovement, model, X, jax.random.PRNGKey(0),
        num_fantasies=24,
    )
    Xq = jnp.asarray(RNG.uniform(size=(1, 2)), jnp.float32)
    v = float(nei(Xq))
    lv = float(log_nei(Xq))
    assert np.isfinite(v) and v >= 0
    np.testing.assert_allclose(math.log(max(v, 1e-30)), lv, atol=1e-4)
    # fitted noise is small, so NEI should land near vanilla EI
    ei = float(make_acqf("EI", model, best_f=float(Y.max()))(Xq))
    assert abs(v - ei) < max(0.5 * ei, 0.05)


def test_scalarized_posterior_mean():
    model, X, Y = _model(m=2)
    w = jnp.asarray([0.3, -0.7])
    acqf = ScalarizedPosteriorMean(
        model=model, cache=model.train_chol(), weights=w
    )
    Xq = jnp.asarray(RNG.uniform(size=(1, 2)), jnp.float32)
    post = model.posterior(Xq)
    expected = float(jnp.sum(post.mean[..., 0, :] * w))
    np.testing.assert_allclose(float(acqf(Xq)), expected, rtol=1e-5)


def test_qnipv_prefers_informative_and_is_negative():
    from botorch_tpu.acquisition.active_learning import (
        qNegIntegratedPosteriorVariance,
    )

    model, X, Y = _model()
    mc = jnp.asarray(RNG.uniform(size=(128, 2)), jnp.float32)
    acqf = qNegIntegratedPosteriorVariance(
        model=model, cache=model.train_chol(), mc_points=mc
    )
    # candidate inside the integration region reduces variance more than a
    # far-away corner duplicate of training data
    center = jnp.asarray([[0.5, 0.5]], jnp.float32)
    dup = X[:1]
    assert float(acqf(center)) > float(acqf(dup)) - 1e-6
    assert float(acqf(center)) < 0


def test_bald_and_community_acqfs_on_ensemble():
    from botorch_tpu.acquisition.active_learning import (
        qBayesianActiveLearningByDisagreement,
    )
    from botorch_tpu.community import (
        qBayesianQueryByComittee,
        qBayesianVarianceReduction,
        qSelfCorrectingBayesianOptimization,
        qStatisticalDistanceActiveLearning,
    )

    fb, X, Y = _ensemble()
    cache = None
    Xq = jnp.asarray(RNG.uniform(size=(1, 2)), jnp.float32)
    bald = qBayesianActiveLearningByDisagreement(model=fb, cache=cache)(Xq)
    assert float(bald) >= -1e-5  # mutual information is non-negative
    bvr = qBayesianVarianceReduction(model=fb, cache=cache)(Xq)
    assert float(bvr) > 0
    qbc = qBayesianQueryByComittee(model=fb, cache=cache)(Xq)
    assert float(qbc) >= 0
    for dist in ("hellinger", "wasserstein"):
        sdal = qStatisticalDistanceActiveLearning(
            model=fb, cache=cache, distance=dist
        )(Xq)
        assert float(sdal) >= 0
    scorebo = qSelfCorrectingBayesianOptimization(
        model=fb, cache=cache, best_f=float(Y.max())
    )(Xq)
    assert np.isfinite(float(scorebo))


def test_augmented_multisource_gp_and_ucb():
    from botorch_tpu.community import (
        AugmentedUpperConfidenceBound,
        make_augmented_gp,
    )
    from botorch_tpu.models.multitask import fit_multitask_gp

    rng = np.random.default_rng(2)
    Xt = jnp.asarray(rng.uniform(size=(8, 2)), jnp.float32)
    Yt = jnp.sin(3 * Xt).sum(-1)
    Xs = jnp.asarray(rng.uniform(size=(16, 2)), jnp.float32)
    Ys = jnp.sin(3 * Xs).sum(-1) + 0.1
    m = make_augmented_gp(Xt, Yt, [Xs], [Ys])
    m = fit_multitask_gp(m, maxiter=15)
    acqf = AugmentedUpperConfidenceBound(model=m, beta=1.0)
    v = acqf(jnp.asarray([[0.4, 0.6]], jnp.float32))
    assert np.isfinite(float(v))


def test_safe_math_tail_helpers():
    from botorch_tpu.utils.safe_math import (
        cauchy,
        fatmaximum,
        fatminimum,
        fatmin,
        logexpit,
        logplusexp,
        smooth_amin,
    )

    x = jnp.asarray([-30.0, -1.0, 0.0, 2.0, 40.0])
    y = jnp.asarray([1.0, -2.0, 0.5, 1.5, -3.0])
    # rtol 1e-4: TPU transcendental rounding (exp/log1p) differs from the
    # CPU libm in the last f32 bits (measured 5.8e-5 rel on chip — same
    # class as the six r4 recalibrations)
    np.testing.assert_allclose(
        np.asarray(logexpit(x)),
        np.asarray(-np.logaddexp(0.0, -np.asarray(x))), rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(logplusexp(x, y)),
        np.logaddexp(np.asarray(x), np.asarray(y)), rtol=1e-4,
    )
    # fat max/min upper/lower-bound the hard versions and converge as tau->0
    np.testing.assert_allclose(
        np.asarray(fatmaximum(x, y, tau=1e-4)),
        np.maximum(np.asarray(x), np.asarray(y)), atol=1e-2,
    )
    np.testing.assert_allclose(
        np.asarray(fatminimum(x, y, tau=1e-4)),
        np.minimum(np.asarray(x), np.asarray(y)), atol=1e-2,
    )
    np.testing.assert_allclose(
        float(fatmin(x, tau=1e-5)), float(x.min()), atol=1e-2
    )
    np.testing.assert_allclose(
        float(smooth_amin(x, tau=1e-3)), float(x.min()), atol=1e-2
    )
    assert float(cauchy(jnp.asarray(0.0))) == 1.0


def test_optimize_acqf_sequential_and_sample_around_best():
    from botorch_tpu.optim.optimize import sample_around_best
    from botorch_tpu.optim.variants import optimize_acqf_sequential

    from botorch_tpu.acquisition.monte_carlo import (
        qLogExpectedImprovement,
    )

    model, X, Y = _model()
    bounds = jnp.stack([jnp.zeros(2), jnp.ones(2)])

    def factory(X_pending):
        return make_mc_acqf(
            qLogExpectedImprovement, model, q=1, num_samples=64,
            best_f=float(Y.max()), X_pending=X_pending,
        )

    cand, _ = optimize_acqf_sequential(
        factory, bounds, q=2, num_restarts=2, raw_samples=16,
        key=jax.random.PRNGKey(0), maxiter=10,
    )
    assert cand.shape == (2, 2)
    assert bool(jnp.all((cand >= 0) & (cand <= 1)))

    pts = sample_around_best(
        jax.random.PRNGKey(1), X, bounds, n=32, sigma=0.1
    )
    assert pts.shape == (32, 2)
    assert bool(jnp.all((pts >= 0) & (pts <= 1)))
