r"""Gaussian-mixture posterior helpers for fully-Bayesian (ensemble) GPs.

Counterpart of `botorch/posteriors/fully_bayesian.py:82`
(`GaussianMixturePosterior`, `batched_bisect :21`): a fully-Bayesian
model's posterior is a uniform mixture over MCMC hyperparameter draws —
here an ordinary `GaussianPosterior` whose leading axis is the ensemble
(MCMC) dimension. These helpers compute exact mixture moments and
quantiles (bisection on the mixture CDF, vectorized over `(q, m)`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from botorch_tpu.utils.probability import ndtr

Array = jax.Array


def mixture_mean(posterior, mcmc_axis: int = 0) -> Array:
    """`E[y] = mean_s mu_s` over the ensemble axis."""
    return jnp.mean(posterior.mean, axis=mcmc_axis)


def mixture_variance(posterior, mcmc_axis: int = 0) -> Array:
    """Law of total variance: `mean_s sigma_s^2 + var_s(mu_s)`."""
    return jnp.mean(posterior.variance, axis=mcmc_axis) + jnp.var(
        posterior.mean, axis=mcmc_axis
    )


def mixture_covariance(posterior, mcmc_axis: int = 0) -> Array:
    """Total covariance over the q-block: `mean_s cov_s + cov_s(mu_s)`
    (per output; `(..., m, q, q)`)."""
    cov = jnp.mean(posterior.cov, axis=mcmc_axis)
    mu = jnp.moveaxis(posterior.mean, mcmc_axis, 0)  # (S, ..., q, m)
    mu = jnp.swapaxes(mu, -1, -2)  # (S, ..., m, q)
    resid = mu - jnp.mean(mu, axis=0)
    return cov + jnp.mean(resid[..., :, None] * resid[..., None, :], axis=0)


def mixture_quantile(
    posterior, q_level, mcmc_axis: int = 0, num_iters: int = 60
) -> Array:
    """Marginal quantiles of the ensemble mixture by bisection on
    `F(y) = mean_s Phi((y - mu_s) / sigma_s)` (reference
    `batched_bisect`), elementwise over the `(q, m)` event shape."""
    mu = jnp.moveaxis(posterior.mean, mcmc_axis, 0)  # (S, ..., q, m)
    sigma = jnp.sqrt(
        jnp.clip(jnp.moveaxis(posterior.variance, mcmc_axis, 0), 1e-12)
    )
    p = jnp.asarray(q_level, mu.dtype)

    lo = jnp.min(mu - 6.0 * sigma, axis=0)
    hi = jnp.max(mu + 6.0 * sigma, axis=0)

    def cdf(y):
        return jnp.mean(ndtr((y[None] - mu) / sigma), axis=0)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        below = cdf(mid) < p
        return jnp.where(below, mid, lo), jnp.where(below, hi, mid)

    lo, hi = jax.lax.fori_loop(0, num_iters, body, (lo, hi))
    return 0.5 * (lo + hi)
