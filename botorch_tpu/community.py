r"""Community/staging components.

Counterpart of `botorch_community/` (SURVEY §2.8): fully-Bayesian
active-learning acquisitions (`acquisition/bayesian_active_learning.py:56,
84,114` — `qBayesianVarianceReduction`, `qBayesianQueryByComittee`,
`qStatisticalDistanceActiveLearning`), self-correcting BO
(`acquisition/scorebo.py:43` `qSelfCorrectingBayesianOptimization`),
statistical distances (`utils/stat_dist.py` Wasserstein/Hellinger), the
multi-source `SingleTaskAugmentedGP` (`models/gp_regression_multisource.py
:77`), and `AugmentedUpperConfidenceBound`
(`acquisition/augmented_multisource.py:36`).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import struct

from botorch_tpu.models.gp import SingleTaskGP
from botorch_tpu.models.multitask import MultiTaskGP, make_multitask_gp

Array = jax.Array


# --------------------------------------------------------------------------- #
# Statistical distances between 1-d Gaussians (utils/stat_dist.py)
# --------------------------------------------------------------------------- #
def wasserstein_gaussian(mu1, var1, mu2, var2) -> Array:
    """2-Wasserstein distance between N(mu1, var1) and N(mu2, var2)."""
    s1, s2 = jnp.sqrt(var1), jnp.sqrt(var2)
    return jnp.sqrt(jnp.square(mu1 - mu2) + jnp.square(s1 - s2))


def hellinger_gaussian(mu1, var1, mu2, var2) -> Array:
    """Hellinger distance between two 1-d Gaussians."""
    s12 = var1 + var2
    bc = jnp.sqrt(2.0 * jnp.sqrt(var1 * var2) / jnp.clip(s12, 1e-12)) * jnp.exp(
        -0.25 * jnp.square(mu1 - mu2) / jnp.clip(s12, 1e-12)
    )
    return jnp.sqrt(jnp.clip(1.0 - bc, 0.0))


# --------------------------------------------------------------------------- #
class qBayesianVarianceReduction(struct.PyTreeNode):
    """Total-variance reduction under the hyperparameter ensemble
    (`bayesian_active_learning.py:56`): score by the mixture variance of
    the noisy predictive."""

    model: SingleTaskGP  # ensemble
    cache: tuple

    def __call__(self, X: Array) -> Array:
        post = self.model.posterior(X, observation_noise=True, cache=self.cache)
        mu = post.mean[..., 0]
        var = post.variance[..., 0]
        if mu.ndim == 1:
            return jnp.sum(var)
        mix_var = jnp.mean(var + jnp.square(mu), 0) - jnp.square(jnp.mean(mu, 0))
        return jnp.sum(mix_var)


class qBayesianQueryByComittee(struct.PyTreeNode):
    """Committee disagreement: variance of member means
    (`bayesian_active_learning.py:84`)."""

    model: SingleTaskGP  # ensemble
    cache: tuple

    def __call__(self, X: Array) -> Array:
        post = self.model.posterior(X, cache=self.cache)
        mu = post.mean[..., 0]
        if mu.ndim == 1:
            return jnp.asarray(0.0)
        return jnp.sum(jnp.var(mu, axis=0))


class qStatisticalDistanceActiveLearning(struct.PyTreeNode):
    """Mean pairwise statistical distance between ensemble members'
    predictive distributions (`bayesian_active_learning.py:114`)."""

    model: SingleTaskGP  # ensemble
    cache: tuple
    distance: str = struct.field(pytree_node=False, default="hellinger")

    def __call__(self, X: Array) -> Array:
        post = self.model.posterior(X, observation_noise=True, cache=self.cache)
        mu = post.mean[..., 0]
        var = post.variance[..., 0]
        if mu.ndim == 1:
            return jnp.asarray(0.0)
        fn = (
            hellinger_gaussian if self.distance == "hellinger"
            else wasserstein_gaussian
        )
        d = fn(mu[:, None], var[:, None], mu[None, :], var[None, :])
        S = mu.shape[0]
        return jnp.sum(d) / (S * (S - 1) + 1e-9)


class qSelfCorrectingBayesianOptimization(struct.PyTreeNode):
    """SCoreBO (`scorebo.py:43`): optimization utility (per-member LogEI)
    plus a hyperparameter-information term (statistical distance between
    members), trading off exploration of f and of the hyperparameters."""

    model: SingleTaskGP  # ensemble
    cache: tuple
    best_f: Array = 0.0
    info_weight: float = struct.field(pytree_node=False, default=1.0)

    def __call__(self, X: Array) -> Array:
        from botorch_tpu.utils.probability import log_ei_helper
        from botorch_tpu.utils.safe_math import logmeanexp

        post = self.model.posterior(X, cache=self.cache)
        mu = post.mean[..., 0, 0]
        sigma = jnp.sqrt(jnp.clip(post.variance[..., 0, 0], 1e-12))
        log_ei = log_ei_helper((mu - self.best_f) / sigma) + jnp.log(sigma)
        ei_term = logmeanexp(log_ei.reshape(-1), axis=0) if log_ei.ndim else log_ei
        sdal = qStatisticalDistanceActiveLearning(
            model=self.model, cache=self.cache
        )(X)
        return ei_term + self.info_weight * sdal


# --------------------------------------------------------------------------- #
def make_augmented_gp(
    X_target: Array,
    Y_target: Array,
    X_sources: list[Array],
    Y_sources: list[Array],
) -> MultiTaskGP:
    """Multi-source `SingleTaskAugmentedGP`
    (`models/gp_regression_multisource.py:77`): fold auxiliary-source data
    into a multi-task GP with the target as task 0."""
    blocks_X, blocks_Y = [], []
    t = 0
    for Xs, Ys in [(X_target, Y_target), *zip(X_sources, Y_sources)]:
        tid = jnp.full((Xs.shape[0], 1), float(t), Xs.dtype)
        blocks_X.append(jnp.concatenate([Xs, tid], axis=-1))
        blocks_Y.append(Ys.reshape(-1))
        t += 1
    X = jnp.concatenate(blocks_X, axis=0)
    Y = jnp.concatenate(blocks_Y, axis=0)
    return make_multitask_gp(
        X, Y, task_feature=X.shape[-1] - 1, num_tasks=t, output_task=0
    )


class AugmentedUpperConfidenceBound(struct.PyTreeNode):
    """Multi-source UCB (`acquisition/augmented_multisource.py:36`): UCB on
    the target task discounted by source disagreement."""

    model: MultiTaskGP
    beta: float = struct.field(pytree_node=False, default=0.25)

    def __call__(self, X: Array) -> Array:
        post = self.model.posterior(X)
        mu = post.mean[0, 0]
        sigma = jnp.sqrt(jnp.clip(post.variance[0, 0], 1e-12))
        return mu + math.sqrt(self.beta) * sigma
