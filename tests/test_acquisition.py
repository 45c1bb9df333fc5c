"""Acquisition-function tests: analytic golden values (scipy float64) and
MC-vs-analytic statistical consistency (reference test model:
`test/acquisition/test_analytic.py`, `test_monte_carlo.py`, `test_logei.py`)."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats as sst

from botorch_tpu.acquisition.analytic import (
    ExpectedImprovement,
    LogExpectedImprovement,
    PosteriorMean,
    ProbabilityOfImprovement,
    UpperConfidenceBound,
    make_acqf,
)
from botorch_tpu.acquisition.monte_carlo import (
    make_mc_acqf,
    qExpectedImprovement,
    qLogExpectedImprovement,
    qLogNoisyExpectedImprovement,
    qNoisyExpectedImprovement,
    qSimpleRegret,
)
from botorch_tpu.models.gp import make_gp
from botorch_tpu.fit import fit_gp


import functools


@functools.lru_cache(maxsize=4)
def _model(seed=0, n=12):
    rng = np.random.default_rng(seed)
    X = jnp.asarray(rng.uniform(size=(n, 2)), jnp.float32)
    Y = jnp.asarray(np.sin(4 * np.asarray(X)).sum(-1), jnp.float32)
    return fit_gp(make_gp(X, Y), jax.random.PRNGKey(seed), num_restarts=2, maxiter=40)


def _scipy_ei(mu, sigma, best):
    u = (mu - best) / sigma
    return sigma * (sst.norm.pdf(u) + u * sst.norm.cdf(u))


def test_analytic_ei_matches_scipy():
    model = _model()
    acqf = make_acqf("EI", model, best_f=0.5)
    Xq = jnp.asarray([[0.3, 0.7]], jnp.float32)
    post = model.posterior(Xq)
    mu = float(post.mean[0, 0])
    sigma = float(jnp.sqrt(post.variance[0, 0]))
    got = float(acqf(Xq))
    assert abs(got - _scipy_ei(mu, sigma, 0.5)) < 1e-5


def test_log_ei_is_log_of_ei():
    model = _model()
    ei = make_acqf("EI", model, best_f=0.0)
    logei = make_acqf("LogEI", model, best_f=0.0)
    Xq = jnp.asarray([[0.2, 0.9]], jnp.float32)
    assert abs(float(logei(Xq)) - np.log(float(ei(Xq)))) < 1e-4


def test_log_ei_far_field_has_gradient():
    model = _model()
    logei = make_acqf("LogEI", model, best_f=50.0)  # improvement impossible
    Xq = jnp.asarray([[0.5, 0.5]], jnp.float32)
    val = float(logei(Xq))
    g = jax.grad(lambda X: logei(X))(Xq)
    assert np.isfinite(val) and val < -100
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_pi_ucb_posterior_mean():
    model = _model()
    Xq = jnp.asarray([[0.4, 0.1]], jnp.float32)
    post = model.posterior(Xq)
    mu = float(post.mean[0, 0])
    sigma = float(jnp.sqrt(post.variance[0, 0]))
    pi = make_acqf("PI", model, best_f=0.1)
    assert abs(float(pi(Xq)) - sst.norm.cdf((mu - 0.1) / sigma)) < 1e-5
    ucb = make_acqf("UCB", model, beta=4.0)
    assert abs(float(ucb(Xq)) - (mu + 2 * sigma)) < 1e-5
    pm = make_acqf("PosteriorMean", model)
    assert abs(float(pm(Xq)) - mu) < 1e-6


def test_qei_approximates_analytic_ei_q1():
    model = _model()
    best = 0.2
    qei = make_mc_acqf(
        qExpectedImprovement, model, q=1, num_samples=4096, best_f=best
    )
    ei = make_acqf("EI", model, best_f=best)
    Xq = jnp.asarray([[0.6, 0.3]], jnp.float32)
    assert abs(float(qei(Xq)) - float(ei(Xq))) < 5e-3


def test_qlogei_approximates_log_ei_q1():
    model = _model()
    best = 0.2
    qlog = make_mc_acqf(
        qLogExpectedImprovement, model, q=1, num_samples=4096, best_f=best
    )
    logei = make_acqf("LogEI", model, best_f=best)
    Xq = jnp.asarray([[0.6, 0.3]], jnp.float32)
    assert abs(float(qlog(Xq)) - float(logei(Xq))) < 0.05


def test_q2_at_least_q1():
    """Adding a second candidate cannot reduce the q-joint improvement."""
    model = _model()
    q1 = make_mc_acqf(qExpectedImprovement, model, q=1, num_samples=512, best_f=0.0)
    q2 = make_mc_acqf(qExpectedImprovement, model, q=2, num_samples=512, best_f=0.0)
    a = jnp.asarray([[0.6, 0.3]], jnp.float32)
    b = jnp.asarray([[0.6, 0.3], [0.1, 0.8]], jnp.float32)
    assert float(q2(b)) >= float(q1(a)) - 1e-3


def test_qnei_and_qlognei_run_and_agree():
    model = _model()
    Xb = model.X[:6]
    qnei = make_mc_acqf(
        qNoisyExpectedImprovement, model, q=2, num_samples=2048, X_baseline=Xb
    )
    qlognei = make_mc_acqf(
        qLogNoisyExpectedImprovement, model, q=2, num_samples=2048, X_baseline=Xb
    )
    Xq = jnp.asarray([[0.6, 0.3], [0.2, 0.2]], jnp.float32)
    v = float(qnei(Xq))
    lv = float(qlognei(Xq))
    assert np.isfinite(v) and np.isfinite(lv)
    # log(qNEI) ~ qLogNEI up to smoothing differences
    assert abs(np.log(max(v, 1e-30)) - lv) < 0.3


def test_sample_determinism_saa():
    """Same acqf instance must give identical values across calls
    (fixed base samples — the SAA contract)."""
    model = _model()
    q = make_mc_acqf(qSimpleRegret, model, q=2, num_samples=128)
    Xq = jnp.asarray([[0.6, 0.3], [0.1, 0.8]], jnp.float32)
    assert float(q(Xq)) == float(q(Xq))


def test_constrained_mc():
    model = _model(n=14)
    # constraint: second output <= 0 — build 2-output model
    rng = np.random.default_rng(3)
    X = jnp.asarray(rng.uniform(size=(14, 2)), jnp.float32)
    Y = jnp.stack([jnp.sin(4 * X).sum(-1), X[:, 0] - 0.5], axis=-1)
    m2 = fit_gp(make_gp(X, Y), jax.random.PRNGKey(0), num_restarts=2, maxiter=30)
    con = lambda samples: samples[..., 1]  # feasible iff <= 0
    qlog = make_mc_acqf(
        qLogExpectedImprovement, m2, q=1, num_samples=512,
        best_f=0.0, constraints=(con,),
    )
    feas = float(qlog(jnp.asarray([[0.1, 0.5]], jnp.float32)))   # x0 small => c<0
    infeas = float(qlog(jnp.asarray([[0.95, 0.5]], jnp.float32)))
    assert feas > infeas


def test_q_analytic_pi_matches_mc_and_univariate():
    """`qAnalyticProbabilityOfImprovement` (reference `analytic.py:227`)
    via the MVNXPB joint box probability: equals univariate PI at q=1
    and Monte Carlo at q=3."""
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(14, 2)), jnp.float32)
    Y = jnp.sin(3 * X[:, :1]) + 0.05 * jnp.asarray(
        rng.normal(size=(14, 1)), jnp.float32
    )
    model = fit_gp(make_gp(X, Y), jax.random.PRNGKey(0), num_restarts=2,
                   maxiter=25)
    best = float(Y.max())
    qpi = make_acqf("qAnalyticPI", model, best_f=best)
    pi = make_acqf("PI", model, best_f=best)
    for pt in [[0.5, 0.3], [0.1, 0.5]]:
        x1 = jnp.asarray([pt], jnp.float32)
        assert abs(float(qpi(x1)) - float(pi(x1))) < 1e-5
    Xq = jnp.asarray([[0.5, 0.3], [0.52, 0.32], [0.1, 0.5]], jnp.float32)
    v = float(qpi(Xq))
    s = model.posterior(Xq).rsample(jax.random.PRNGKey(1), (200000,))[..., 0]
    mc = float(jnp.mean(jnp.any(s > best, axis=-1)))
    assert abs(v - mc) < 0.05 * mc + 1e-3
    g = jax.grad(lambda x: qpi(x))(Xq)
    assert np.isfinite(np.asarray(g)).all()
