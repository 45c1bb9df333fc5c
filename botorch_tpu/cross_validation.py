r"""Batched leave-one-out cross-validation.

Counterpart of `botorch/cross_validation.py:39,109` (`gen_loo_cv_folds`,
`batch_cross_validation`): all `n` LOO folds are fitted and evaluated as
ONE batched program — here via the exact masked-GP trick: each fold is the
full padded design with one row masked out, so a single vmapped
fit + posterior serves every fold (and the fold axis can shard over a
mesh, SURVEY §2.10).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from botorch_tpu.fit import fit_gp
from botorch_tpu.models.gp import make_gp

Array = jax.Array


class CVResults(NamedTuple):
    mean: Array  # (n, m) posterior mean at each held-out point
    variance: Array  # (n, m)
    observed: Array  # (n, m)


def batch_cross_validation(
    train_X: Array,
    train_Y: Array,
    key: Array,
    fit_restarts: int = 2,
    fit_maxiter: int = 50,
) -> CVResults:
    """LOO-CV: for each i, fit on all-but-i and predict at i.

    The fold axis is a vmap over masks; each lane's kernel matrix differs
    only in the identity-decoupled row, so XLA compiles one program for
    all folds.
    """
    if train_Y.ndim == 1:
        train_Y = train_Y[:, None]
    n = train_X.shape[0]
    masks = ~jnp.eye(n, dtype=bool)  # (n, n): fold i masks row i

    def one_fold(mask, k):
        model = fit_gp(
            make_gp(train_X, train_Y, mask=mask),
            k,
            num_restarts=fit_restarts,
            maxiter=fit_maxiter,
        )
        held = jnp.argmin(mask)  # the masked index
        post = model.posterior(train_X[held][None, :])
        return post.mean[0], post.variance[0]

    keys = jax.random.split(key, n)
    mean, var = jax.vmap(one_fold)(masks, keys)
    return CVResults(mean=mean, variance=var, observed=train_Y)


def cv_metrics(results: CVResults) -> dict:
    """Summary metrics: RMSE, mean standardized log loss, coverage."""
    err = results.mean - results.observed
    rmse = jnp.sqrt(jnp.mean(jnp.square(err)))
    nll = 0.5 * jnp.mean(
        jnp.log(2 * jnp.pi * results.variance)
        + jnp.square(err) / results.variance
    )
    z = err / jnp.sqrt(results.variance)
    coverage95 = jnp.mean((jnp.abs(z) < 1.96).astype(jnp.float32))
    return {"rmse": rmse, "nll": nll, "coverage95": coverage95}
