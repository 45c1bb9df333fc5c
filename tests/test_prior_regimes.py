"""Tests for the legacy gamma prior regime, the reference-named
kernel/likelihood factory helpers, duplicate consolidation, and the KG
value-function initializer (reference `models/utils/gpytorch_modules.py`,
`models/utils/assorted.py:300-385`, `optim/initializers.py:758`)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from botorch_tpu.fit import fit_gp, sample_params_from_priors
from botorch_tpu.models.gp import default_init_params, make_gp
from botorch_tpu.models.priors import (
    Gamma,
    gamma_lengthscale_prior,
    gamma_noise_prior,
    get_covar_module_with_dim_scaled_prior,
    get_gaussian_likelihood_with_gamma_prior,
    get_gaussian_likelihood_with_lognormal_prior,
    get_matern_kernel_with_gamma_prior,
)


@pytest.fixture(scope="module")
def data():
    key = jax.random.PRNGKey(0)
    X = jax.random.uniform(key, (14, 2))
    Y = jnp.sin(3 * X[:, :1]) + X[:, 1:] ** 2
    return X, Y


def test_gamma_factory_specs():
    kern, use_os, pri = get_matern_kernel_with_gamma_prior(5)
    assert kern == "matern52" and use_os and pri == "gamma"
    kern, use_os, pri = get_covar_module_with_dim_scaled_prior(5)
    assert kern == "rbf" and not use_os and pri == "lognormal"
    assert get_gaussian_likelihood_with_gamma_prior() == "gamma"
    assert get_gaussian_likelihood_with_lognormal_prior() == "lognormal"


def test_gamma_prior_values():
    # Gamma(3, 6) lengthscale prior (reference gpytorch_modules.py:34-50):
    # mode (a-1)/b = 1/3; Gamma(1.1, 0.05) noise prior: mode = 2.
    assert math.isclose(gamma_lengthscale_prior().mode, 1.0 / 3.0)
    assert math.isclose(gamma_noise_prior().mode, 2.0)
    # log_prob matches the Gamma density
    g = Gamma(3.0, 6.0)
    x = jnp.asarray(0.5)
    expected = 3 * math.log(6) - math.lgamma(3.0) + 2 * math.log(0.5) - 6 * 0.5
    assert math.isclose(float(g.log_prob(x)), expected, rel_tol=1e-6)


def test_gamma_regime_init_and_logprior(data):
    X, Y = data
    kern, use_os, pri = get_matern_kernel_with_gamma_prior(2)
    m = make_gp(X, Y, kernel=kern, use_outputscale=use_os, priors=pri)
    assert m.priors == "gamma"
    # init at prior modes
    p = default_init_params(2, 1, use_outputscale=True, priors="gamma")
    assert np.allclose(np.exp(p.raw_lengthscale), 1 / 3, atol=1e-6)
    assert np.allclose(np.exp(p.raw_noise), 2.0, atol=1e-6)
    assert np.allclose(np.exp(p.raw_outputscale), (2 - 1) / 0.15, atol=1e-4)
    # regimes disagree on the prior density of the same params
    m_ln = m.replace(priors="lognormal")
    assert not np.isclose(float(m.log_prior()), float(m_ln.log_prior()))


def test_gamma_regime_fits(data):
    X, Y = data
    kern, use_os, pri = get_matern_kernel_with_gamma_prior(2)
    m = fit_gp(
        make_gp(X, Y, kernel=kern, use_outputscale=use_os, priors=pri),
        jax.random.PRNGKey(1),
        num_restarts=2,
    )
    post = m.posterior(X)
    # in-sample mean should track the data reasonably
    resid = np.asarray(post.mean[:, 0]) - np.asarray(Y[:, 0])
    assert np.sqrt(np.mean(resid**2)) < 0.5 * np.std(np.asarray(Y))


def test_prior_samples_follow_regime(data):
    X, Y = data
    m_g = make_gp(X, Y, kernel="matern52", use_outputscale=True, priors="gamma")
    m_l = make_gp(X, Y)
    key = jax.random.PRNGKey(7)
    ps_g = sample_params_from_priors(key, m_g, 256)
    ps_l = sample_params_from_priors(key, m_l, 256)
    # Gamma(3,6) lengthscales concentrate well below the dim-scaled
    # LogNormal ones (median e^{sqrt2 + log(2)/2} ~ 5.8 vs mean 0.5)
    assert float(jnp.median(jnp.exp(ps_g.raw_lengthscale))) < 1.0
    assert float(jnp.median(jnp.exp(ps_l.raw_lengthscale))) > 2.0


def test_matern52_kernel_helper():
    from botorch_tpu.ops.kernels import matern52, matern52_kernel

    X = jax.random.uniform(jax.random.PRNGKey(0), (6, 3))
    ls = jnp.full((3,), 0.7)
    assert np.allclose(
        np.asarray(matern52_kernel(X, ls)), np.asarray(matern52(X, X, ls))
    )


# --------------------------------------------------------------------- #
def test_consolidate_duplicates():
    from botorch_tpu.utils.transforms import (
        consolidate_duplicates,
        detect_duplicates,
    )

    X = np.array([[0.0, 0.0], [1.0, 1.0], [0.0, 0.0], [2.0, 2.0]])
    Y = np.array([[0, 1], [2, 3], [1, 2]])
    dups = dict(detect_duplicates(X, atol=1e-6))
    assert dups == {2: 0}
    Xc, Yc, idx = consolidate_duplicates(X, Y, atol=1e-6)
    assert Xc.shape == (3, 2)
    assert list(np.asarray(idx)) == [0, 1, 0, 2]
    assert np.asarray(Yc).tolist() == [[0, 1], [0, 2], [1, 0]]
    # no duplicates -> identity
    Xc2, Yc2, idx2 = consolidate_duplicates(X[:2], Y[:1], atol=1e-6)
    assert np.allclose(np.asarray(Xc2), X[:2])
    assert list(np.asarray(idx2)) == [0, 1]


def test_pairwise_gp_consolidates():
    from botorch_tpu.models.pairwise_gp import make_pairwise_gp

    X = np.array([[0.1, 0.2], [0.8, 0.3], [0.1, 0.2], [0.5, 0.9]])
    comps = np.array([[0, 1], [2, 3]])  # row 2 duplicates row 0
    m = make_pairwise_gp(jnp.asarray(X), comps)
    assert m.X.shape[0] == 3
    assert np.asarray(m.comparisons).tolist() == [[0, 1], [0, 2]]


# --------------------------------------------------------------------- #
def test_gen_value_function_initial_conditions(data):
    from botorch_tpu.acquisition.knowledge_gradient import fantasize
    from botorch_tpu.optim.optimize import (
        gen_value_function_initial_conditions,
    )

    X, Y = data
    base = fit_gp(make_gp(X, Y[:, :1]), jax.random.PRNGKey(2), num_restarts=2)
    fant = fantasize(base, X[:1], jax.random.PRNGKey(3), num_fantasies=4)

    def vf(Xq):  # (nf, 1, d) -> (nf,)
        return fant.posterior(Xq).mean[..., 0, 0]

    bounds = jnp.array([[0.0, 0.0], [1.0, 1.0]])
    ics = gen_value_function_initial_conditions(
        vf,
        bounds,
        num_restarts=3,
        raw_samples=16,
        current_model=base,
        num_inner_restarts=4,
        raw_inner_samples=32,
    )
    assert ics.shape == (3, 4, 1, 2)
    assert bool(jnp.all((ics >= 0) & (ics <= 1)))
    # branches should get distinct ICs (per-branch selection)
    assert not np.allclose(np.asarray(ics[:, 0]), np.asarray(ics[:, 1]))


def test_detect_duplicates_rtol_adjusted_argmin():
    """With rtol > 0 the duplicate's 'original' is the row minimizing the
    TOLERANCE-ADJUSTED distance (reference computes `(dist - tols).min`,
    `assorted.py:329`), not the raw-nearest row."""
    from botorch_tpu.utils.transforms import detect_duplicates

    X = np.array([[10.0, 0.0], [5.0, 0.0], [0.5, 0.0]])
    # tols(j,i) = rtol * max(|row_j|, |row_i|):
    #   col 2: d(0,2)-t = 9.5-10.5 = -1.0 < d(1,2)-t = 4.5-5.25 = -0.75,
    #   so row 2's original is row 0 even though row 1 is raw-nearest.
    d = dict(detect_duplicates(X, rtol=1.05))
    assert d == {1: 0, 2: 0}
