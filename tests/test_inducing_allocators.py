"""Inducing-point allocators + ensemble index sampling.

Counterpart of the reference's
`test/models/utils/test_inducing_point_allocators.py` (GreedyVariance /
GreedyImprovementReduction selection behavior) and
`test/sampling/test_index_sampler.py`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from botorch_tpu.fit import fit_gp
from botorch_tpu.models.approximate_gp import (
    expected_improvement_quality,
    greedy_improvement_reduction,
    greedy_variance_reduction,
)
from botorch_tpu.models.gp import make_gp
from botorch_tpu.posteriors.gaussian import GaussianPosterior
from botorch_tpu.sampling.samplers import IndexSampler


@pytest.fixture(scope="module")
def fitted():
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(40, 2)), jnp.float32)
    Y = jnp.sin(3 * X[:, 0]) + X[:, 1]
    model = fit_gp(
        make_gp(X, Y[:, None]), jax.random.PRNGKey(0),
        num_restarts=2, maxiter=20,
    )
    return X, model


def test_greedy_variance_reduction_selects_diverse_rows(fitted):
    X, _ = fitted
    ls = jnp.full((2,), 0.5)
    Z = greedy_variance_reduction(X, ls, 8)
    assert Z.shape == (8, 2)
    # selected rows are actual training rows, all distinct
    d2 = jnp.sum((Z[:, None, :] - X[None]) ** 2, axis=-1)
    assert bool(jnp.all(jnp.min(d2, axis=1) < 1e-10))
    pair = jnp.sum((Z[:, None, :] - Z[None]) ** 2, axis=-1)
    assert bool(jnp.min(pair + jnp.eye(8)) > 0)


def test_greedy_variance_reduction_first_pick_is_max_quality_weighted(fitted):
    X, _ = fitted
    ls = jnp.full((2,), 0.5)
    q = jnp.zeros((X.shape[0],)).at[7].set(1.0)
    Zq = greedy_variance_reduction(X, ls, 3, quality_scores=q)
    # stationary kernel: diag resid is constant, so the first pivot is the
    # max of resid * quality^2 = index 7 (reference `_pivoted_cholesky_init`
    # scores = di2s * quality^2)
    assert bool(jnp.allclose(Zq[0], X[7]))


def test_greedy_improvement_reduction_shifts_selection(fitted):
    X, model = fitted
    ls = jnp.full((2,), 0.5)
    Z_var = greedy_variance_reduction(X, ls, 8)
    Z_imp = greedy_improvement_reduction(model, X, ls, 8)
    assert Z_imp.shape == (8, 2)
    assert not np.allclose(np.asarray(Z_var), np.asarray(Z_imp))
    q = expected_improvement_quality(model, X)
    assert q.shape == (X.shape[0],)
    assert bool(jnp.all(q >= 0))


def _ensemble_posterior():
    q = 4
    mean = jnp.stack([jnp.full((q, 1), float(s)) for s in range(3)])
    cov = jnp.broadcast_to(1e-12 * jnp.eye(q), (3, 1, q, q))
    return GaussianPosterior(mean=mean, cov=cov)


def test_index_sampler_gathers_components():
    post = _ensemble_posterior()
    s = IndexSampler(sample_shape=(256,), seed=0)(post)
    assert s.shape == (256, 4, 1)
    # uniform over {0,1,2}: mean ~ 1.0
    assert abs(float(s.mean()) - 1.0) < 0.2
    vals = set(np.unique(np.asarray(s)).tolist())
    assert vals <= {0.0, 1.0, 2.0} and len(vals) == 3


def test_index_sampler_weighted_degenerate():
    post = _ensemble_posterior()
    s = IndexSampler(
        sample_shape=(32,), seed=0, weights=jnp.asarray([0.0, 1.0, 0.0])
    )(post)
    assert bool(jnp.all(s == 1.0))


def test_index_sampler_deterministic_in_seed():
    post = _ensemble_posterior()
    a = IndexSampler(sample_shape=(64,), seed=3)(post)
    b = IndexSampler(sample_shape=(64,), seed=3)(post)
    assert bool(jnp.all(a == b))
