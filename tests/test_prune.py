"""Tests for baseline pruning (`prune_inferior_points[_multi_objective]`,
reference `acquisition/utils.py:245` / `multi_objective/utils.py:67`) and
the degenerate-covariance Cholesky rescue they depend on."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from botorch_tpu.acquisition.monte_carlo import (
    make_mc_acqf,
    qLogNoisyExpectedImprovement,
)
from botorch_tpu.acquisition.utils import (
    prune_inferior_points,
    prune_inferior_points_multi_objective,
)
from botorch_tpu.fit import fit_gp
from botorch_tpu.models.gp import make_gp
from botorch_tpu.ops.chol import psd_safe_cholesky


@pytest.fixture(scope="module")
def so_model():
    key = jax.random.PRNGKey(0)
    X = jax.random.uniform(key, (20, 2))
    Y = -jnp.sum((X - 0.5) ** 2, axis=-1, keepdims=True)
    return fit_gp(make_gp(X, Y)), X, Y


def test_prune_keeps_best_point(so_model):
    model, X, Y = so_model
    Xp = prune_inferior_points(model, X, max_frac=0.5)
    assert 1 <= Xp.shape[0] <= 10 and Xp.shape[1] == 2
    best = np.asarray(X[jnp.argmax(Y[:, 0])])
    assert any(np.allclose(best, np.asarray(x)) for x in Xp)


def test_prune_max_frac_cap(so_model):
    model, X, _ = so_model
    Xp = prune_inferior_points(model, X, max_frac=0.05)
    assert Xp.shape[0] == 1


def test_prune_constraints_exclude_infeasible(so_model):
    model, X, Y = so_model
    # constraint: first output must be <= -0.2 (c(s) > 0 infeasible)
    cons = [lambda s: s[..., 0] + 0.2]
    Xp = prune_inferior_points(model, X, constraints=cons)
    # best point (obj ~ 0 > -0.2) is infeasible and must be pruned
    best = np.asarray(X[jnp.argmax(Y[:, 0])])
    assert not any(np.allclose(best, np.asarray(x)) for x in Xp)


def test_prune_validation(so_model):
    model, X, _ = so_model
    with pytest.raises(ValueError):
        prune_inferior_points(model, X, max_frac=0.0)
    with pytest.raises(ValueError):
        prune_inferior_points(model, X[None])


def test_prune_mo_nonempty_and_capped():
    key = jax.random.PRNGKey(1)
    X = jax.random.uniform(key, (16, 2))
    Y = jnp.stack([X[:, 0], 1.0 - X[:, 0] + 0.1 * X[:, 1]], axis=-1)
    model = fit_gp(make_gp(X, Y))
    ref = jnp.array([-1.0, -1.0])
    Xp = prune_inferior_points_multi_objective(model, X, ref)
    assert 1 <= Xp.shape[0] <= 16
    Xc = prune_inferior_points_multi_objective(model, X, ref, max_frac=0.25)
    assert Xc.shape[0] <= 4


def test_prune_fully_bayesian_marginalizes(so_model):
    # ensemble batch dim: tile params to fake a 3-sample ensemble
    model, X, _ = so_model
    ens = model.replace(
        params=jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a[None], (3, *a.shape)), model.params
        )
    )
    Xp = prune_inferior_points(ens, X)
    assert Xp.ndim == 2 and Xp.shape[0] >= 1


def test_qlognei_prune_baseline(so_model):
    model, X, _ = so_model
    acqf = make_mc_acqf(
        qLogNoisyExpectedImprovement,
        model,
        q=1,
        X_baseline=X,
        prune_baseline=True,
        num_samples=64,
    )
    assert acqf.X_baseline.shape[0] <= X.shape[0]
    val = acqf(X[:1] * 0.9)
    assert jnp.isfinite(val)


def test_psd_safe_cholesky_degenerate_posterior(so_model):
    # posterior AT the training points: near-zero, slightly indefinite cov
    model, X, _ = so_model
    post = model.posterior(X)
    L = post.scale_tril
    assert bool(jnp.isfinite(L).all())
    # and a literally-zero matrix factors finitely
    Lz = psd_safe_cholesky(jnp.zeros((4, 4)))
    assert bool(jnp.isfinite(Lz).all())
