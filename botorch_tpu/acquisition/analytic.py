r"""Analytic acquisition functions for Gaussian posteriors.

Counterpart of `botorch/acquisition/analytic.py` (EI :290, LogEI :356,
PI :173, LogPI :111, UCB :745, PosteriorMean :800, PosteriorStandardDeviation
:890, Constrained(Log)EI :419/:498, ScalarizedPosteriorMean :849).

Design: each acquisition function is an immutable pytree dataclass whose
`__call__` maps ONE candidate set `X: (q, d)` (q = 1 for analytic acqfs) to
a scalar. The reference's `b x q x d -> b` t-batch contract
(`utils/transforms.py:228`) is recovered with `jax.vmap`, and that is also
how `optimize_acqf` batches restarts. The fitted model's train-data
Cholesky cache is part of the pytree, so evaluation under `jit`/`grad`
reuses it without refactorization — the explicit version of gpytorch's
cached prediction strategy.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from botorch_tpu.models.gp import SingleTaskGP
from botorch_tpu.utils.safe_math import logmeanexp
from botorch_tpu.utils.probability import (
    ei_helper,
    log_ei_helper,
    log_ndtr,
    log_prob_normal_in,
    ndtr,
    phi,
)

Array = jax.Array

_MIN_VAR = 1e-12


def reduce_ensemble(val: Array, log: bool = False) -> Array:
    """Average an acquisition value over ensemble (MCMC) batch dims —
    arithmetic mean for linear acqfs, logmeanexp for log acqfs (reference
    `utils/transforms.py:292-296`). No-op for non-ensemble scalars."""
    if val.ndim == 0:
        return val
    axes = tuple(range(val.ndim))
    return logmeanexp(val, axis=axes) if log else jnp.mean(val)


class AnalyticAcquisitionFunction(struct.PyTreeNode):
    """Shared machinery: marginal posterior moments at a single point."""

    model: SingleTaskGP
    cache: tuple  # (L, alpha, Linv) from model.train_chol()
    maximize: bool = struct.field(pytree_node=False, default=True)

    def _mean_and_sigma(self, X: Array) -> tuple[Array, Array]:
        """Posterior mean and stddev at `X: (1, d)` -> scalars (or
        ensemble-batched values for fully-Bayesian models;
        reference `analytic.py:84-116`)."""
        post = self.model.posterior(X, cache=self.cache)
        mean = post.mean[..., 0, 0]
        sigma = jnp.sqrt(jnp.clip(post.variance[..., 0, 0], _MIN_VAR))
        return mean, sigma


class ExpectedImprovement(AnalyticAcquisitionFunction):
    """`EI(x) = sigma * (phi(u) + u Phi(u))`, `u = (mu - best_f)/sigma`."""

    best_f: Array = 0.0

    def __call__(self, X: Array) -> Array:
        mean, sigma = self._mean_and_sigma(X)
        u = (mean - self.best_f) / sigma
        u = u if self.maximize else -u
        return reduce_ensemble(sigma * ei_helper(u))


class LogExpectedImprovement(AnalyticAcquisitionFunction):
    """`log EI(x)`, numerically robust far from the incumbent
    ([Ament2023logei]; reference `analytic.py:356-416`)."""

    best_f: Array = 0.0

    def __call__(self, X: Array) -> Array:
        mean, sigma = self._mean_and_sigma(X)
        u = (mean - self.best_f) / sigma
        u = u if self.maximize else -u
        return reduce_ensemble(log_ei_helper(u) + jnp.log(sigma), log=True)


class ProbabilityOfImprovement(AnalyticAcquisitionFunction):
    """`PI(x) = Phi((mu - best_f)/sigma)`."""

    best_f: Array = 0.0

    def __call__(self, X: Array) -> Array:
        mean, sigma = self._mean_and_sigma(X)
        u = (mean - self.best_f) / sigma
        return reduce_ensemble(ndtr(u if self.maximize else -u))


class LogProbabilityOfImprovement(AnalyticAcquisitionFunction):
    """`log PI(x)` via stable `log_ndtr` (reference `analytic.py:111`)."""

    best_f: Array = 0.0

    def __call__(self, X: Array) -> Array:
        mean, sigma = self._mean_and_sigma(X)
        u = (mean - self.best_f) / sigma
        return reduce_ensemble(log_ndtr(u if self.maximize else -u), log=True)


class qAnalyticProbabilityOfImprovement(AnalyticAcquisitionFunction):
    """Exact joint probability that a q-batch improves on `best_f`
    (reference `analytic.py:227`, `qAnalyticProbabilityOfImprovement`):

        `qPI(X) = 1 - P(f(x_1) <= best_f, ..., f(x_q) <= best_f)`

    with the joint Gaussian box probability evaluated by the
    bivariate-conditioning solver (`utils/mvnxpb.py`) — no Monte Carlo."""

    best_f: Array = 0.0

    def __call__(self, X: Array) -> Array:
        from botorch_tpu.utils.mvnxpb import mvnxpb

        post = self.model.posterior(X, cache=self.cache)
        mu = post.mean[..., 0]  # (..., q)
        cov = post.cov[..., 0, :, :]  # (..., q, q)
        sgn = 1.0 if self.maximize else -1.0
        q = mu.shape[-1]

        def one(mu1, cov1):
            ub = sgn * (self.best_f - sgn * mu1)
            bounds = jnp.stack([jnp.full((q,), -jnp.inf), ub], -1)
            return jnp.clip(-jnp.expm1(mvnxpb(cov1, bounds)), 0.0, 1.0)

        f = one
        for _ in range(mu.ndim - 1):
            f = jax.vmap(f)
        return reduce_ensemble(f(mu, cov))


class UpperConfidenceBound(AnalyticAcquisitionFunction):
    """`UCB(x) = mu + sqrt(beta) * sigma` (reference `analytic.py:745`)."""

    beta: Array = 0.25

    def __call__(self, X: Array) -> Array:
        mean, sigma = self._mean_and_sigma(X)
        delta = jnp.sqrt(self.beta) * sigma
        return reduce_ensemble(mean + delta if self.maximize else -(mean - delta))


class PosteriorMean(AnalyticAcquisitionFunction):
    """Posterior mean (negated when minimizing; reference `analytic.py:800`)."""

    def __call__(self, X: Array) -> Array:
        mean, _ = self._mean_and_sigma(X)
        return reduce_ensemble(mean if self.maximize else -mean)


class PosteriorStandardDeviation(AnalyticAcquisitionFunction):
    """Posterior stddev — active-learning utility (reference `analytic.py:890`)."""

    def __call__(self, X: Array) -> Array:
        _, sigma = self._mean_and_sigma(X)
        return reduce_ensemble(sigma)


class ScalarizedPosteriorMean(AnalyticAcquisitionFunction):
    """Affine scalarization `w . mu(x)` of a multi-output posterior mean
    (reference `analytic.py:849`)."""

    weights: Array = None

    def __call__(self, X: Array) -> Array:
        post = self.model.posterior(X, cache=self.cache)
        return jnp.sum(post.mean[..., 0, :] * self.weights, axis=-1)


class ConstrainedAnalyticBase(AnalyticAcquisitionFunction):
    """Independent-output feasibility weighting (reference
    `analytic.py:419-576`): output `objective_index` is the objective, the
    rest are constrained to `[lower, upper]` per-output."""

    best_f: Array = 0.0
    constraint_lower: Array = None  # (m,) -inf where unconstrained below
    constraint_upper: Array = None  # (m,) +inf where unconstrained above
    objective_index: int = struct.field(pytree_node=False, default=0)

    def _moments(self, X: Array) -> tuple[Array, Array]:
        post = self.model.posterior(X, cache=self.cache)
        means = post.mean[..., 0, :]  # (m,)
        sigmas = jnp.sqrt(jnp.clip(post.variance[..., 0, :], _MIN_VAR))
        return means, sigmas

    def _log_prob_feas(self, means: Array, sigmas: Array) -> Array:
        m = means.shape[-1]
        idx = jnp.arange(m) != self.objective_index
        lo = (self.constraint_lower - means) / sigmas
        hi = (self.constraint_upper - means) / sigmas
        # Three cases per output: two-sided, lower-only, upper-only.
        two_sided = jnp.isfinite(self.constraint_lower) & jnp.isfinite(
            self.constraint_upper
        )
        lo_only = jnp.isfinite(self.constraint_lower) & ~jnp.isfinite(
            self.constraint_upper
        )
        lp = jnp.where(
            two_sided,
            log_prob_normal_in(
                jnp.where(two_sided, lo, -1.0), jnp.where(two_sided, hi, 1.0)
            ),
            jnp.where(lo_only, log_ndtr(-lo), log_ndtr(hi)),
        )
        return jnp.sum(jnp.where(idx, lp, 0.0), axis=-1)


class LogConstrainedExpectedImprovement(ConstrainedAnalyticBase):
    """`log EI(x) + sum_i log P(feasible_i)` (reference `analytic.py:419`)."""

    def __call__(self, X: Array) -> Array:
        means, sigmas = self._moments(X)
        i = self.objective_index
        u = (means[..., i] - self.best_f) / sigmas[..., i]
        u = u if self.maximize else -u
        return (
            log_ei_helper(u)
            + jnp.log(sigmas[..., i])
            + self._log_prob_feas(means, sigmas)
        )


class ConstrainedExpectedImprovement(ConstrainedAnalyticBase):
    """`EI(x) * prod_i P(feasible_i)` (reference `analytic.py:498`)."""

    def __call__(self, X: Array) -> Array:
        means, sigmas = self._moments(X)
        i = self.objective_index
        u = (means[..., i] - self.best_f) / sigmas[..., i]
        u = u if self.maximize else -u
        return sigmas[..., i] * ei_helper(u) * jnp.exp(
            self._log_prob_feas(means, sigmas)
        )


# ---------------------------------------------------------------------- #
def _with_cache(cls, model: SingleTaskGP, **kwargs):
    return cls(model=model, cache=model.train_chol(), **kwargs)


def make_acqf(name: str, model: SingleTaskGP, **kwargs):
    """String-keyed factory (reference `acquisition/factory.py:33`)."""
    registry = {
        "EI": ExpectedImprovement,
        "LogEI": LogExpectedImprovement,
        "PI": ProbabilityOfImprovement,
        "LogPI": LogProbabilityOfImprovement,
        "qAnalyticPI": qAnalyticProbabilityOfImprovement,
        "UCB": UpperConfidenceBound,
        "PosteriorMean": PosteriorMean,
        "PosteriorStandardDeviation": PosteriorStandardDeviation,
    }
    return _with_cache(registry[name], model, **kwargs)


class LogNoisyExpectedImprovement(AnalyticAcquisitionFunction):
    """Analytic (Log)NEI via fantasy-model averaging (reference
    `analytic.py:577-744`): draw fantasy noiseless-observation models at the
    train points and average LogEI over them. Built with `make_noisy_ei`."""

    fantasy_models: SingleTaskGP = None  # ensemble-batched model
    best_f: Array = None  # (nf,) per-fantasy incumbent

    def __call__(self, X: Array) -> Array:
        post = self.fantasy_models.posterior(X)
        mean = post.mean[..., 0, 0]  # (nf,)
        sigma = jnp.sqrt(jnp.clip(post.variance[..., 0, 0], _MIN_VAR))
        u = (mean - self.best_f) / sigma
        u = u if self.maximize else -u
        return reduce_ensemble(log_ei_helper(u) + jnp.log(sigma), log=True)


class NoisyExpectedImprovement(LogNoisyExpectedImprovement):
    """Linear-scale analytic NEI (reference `analytic.py:663`)."""

    def __call__(self, X: Array) -> Array:
        return jnp.exp(super().__call__(X))


def make_noisy_ei(
    cls, model: SingleTaskGP, X_observed, key, num_fantasies: int = 20,
    maximize: bool = True,
):
    """Construct analytic (Log)NEI (reference `analytic.py:577-660`):
    fantasize noiseless observations at `X_observed`, each fantasy model's
    incumbent is its own best fantasy draw."""
    from botorch_tpu.acquisition.knowledge_gradient import fantasize

    fm = fantasize(model, X_observed, key, num_fantasies)
    # per-fantasy best over the fantasy draws at X_observed (original units)
    n_obs = X_observed.shape[0]
    Yf = fm.Y[..., -n_obs:, 0] * fm.Y_scale[0] + fm.Y_loc[0]  # (nf, n_obs)
    best_f = jnp.max(Yf, axis=-1)
    return cls(
        model=model, cache=model.train_chol(), maximize=maximize,
        fantasy_models=fm, best_f=best_f,
    )
