r"""Active-learning acquisition functions.

Counterpart of `botorch/acquisition/active_learning.py:40`
(`qNegIntegratedPosteriorVariance`), `:129`
(`PairwiseMCPosteriorVariance`), and the fully-Bayesian BALD
(`bayesian_active_learning.py:52` `qBayesianActiveLearningByDisagreement`).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import struct

from botorch_tpu.models.gp import SingleTaskGP

Array = jax.Array

_half_log_2pi_e = 0.5 * math.log(2.0 * math.pi * math.e)


class qNegIntegratedPosteriorVariance(struct.PyTreeNode):
    """NIPV: negative posterior variance at MC integration points after a
    fantasy update at the candidates (reference `active_learning.py:40`).
    For a GP the variance update is deterministic: adding `X` reduces the
    covariance by `k(X*, X) [K_XX + noise]^-1 k(X, X*)`."""

    model: SingleTaskGP
    cache: tuple
    mc_points: Array  # (N, d) integration points

    def __call__(self, X: Array) -> Array:
        m = self.model
        post_joint = m.posterior(
            jnp.concatenate([X, self.mc_points], axis=0),
            observation_noise=False, cache=self.cache,
        )
        q = X.shape[-2]
        cov = post_joint.cov  # (..., m, q+N, q+N)
        Kqq = cov[..., :q, :q] + (
            jnp.exp(m.params.raw_noise)[..., None, None]
            * jnp.square(m.Y_scale)[..., None, None]
            * jnp.eye(q)
        )
        Kqn = cov[..., :q, q:]
        var_n = jnp.diagonal(cov[..., q:, q:], axis1=-2, axis2=-1)
        sol = jnp.linalg.solve(Kqq, Kqn)  # (..., q, N)
        reduction = jnp.sum(Kqn * sol, axis=-2)  # (..., N)
        new_var = var_n - reduction
        return -jnp.mean(new_var)


class qBayesianActiveLearningByDisagreement(struct.PyTreeNode):
    """BALD over a fully-Bayesian (ensemble) model (reference
    `bayesian_active_learning.py:52`): mutual information between the
    observation and the hyperparameters,
    `H[mixture marginal] - mean_s H[member marginal]`, with Gaussian
    entropies (moment-matched mixture)."""

    model: SingleTaskGP  # ensemble (leading MCMC batch)
    cache: tuple

    def __call__(self, X: Array) -> Array:
        post = self.model.posterior(X, observation_noise=True, cache=self.cache)
        mu = post.mean[..., 0]  # (S, q)
        var = post.variance[..., 0]  # (S, q)
        if mu.ndim == 1:  # not an ensemble: no disagreement
            return jnp.asarray(0.0)
        mix_mu = jnp.mean(mu, axis=0)
        mix_var = jnp.mean(var + jnp.square(mu), axis=0) - jnp.square(mix_mu)
        h_mix = _half_log_2pi_e + 0.5 * jnp.log(jnp.clip(mix_var, 1e-12))
        h_members = _half_log_2pi_e + 0.5 * jnp.mean(
            jnp.log(jnp.clip(var, 1e-12)), axis=0
        )
        return jnp.sum(h_mix - h_members)


class PairwiseMCPosteriorVariance(struct.PyTreeNode):
    """Preference-learning variance acqf (reference
    `active_learning.py:129`): MC variance of the utility difference of a
    candidate pair under the model."""

    model: object  # PairwiseGP
    num_samples: int = struct.field(pytree_node=False, default=64)
    seed: int = struct.field(pytree_node=False, default=0)

    def __call__(self, X: Array) -> Array:
        post = self.model.posterior(X)
        s = post.rsample(jax.random.PRNGKey(self.seed), (self.num_samples,))
        diff = s[..., 0, 0] - s[..., 1, 0]
        return jnp.var(diff)


def feasible_volume_mc(
    model: SingleTaskGP,
    bounds: Array,
    constraints,
    key: Array,
    num_points: int = 4096,
    threshold: float = 0.5,
) -> Array:
    """MC estimate of the feasible-region volume fraction under the model
    posterior mean (reference `utils/feasible_volume.py:205`)."""
    d = bounds.shape[-1]
    u = jax.random.uniform(key, (num_points, d))
    X = bounds[0] + (bounds[1] - bounds[0]) * u
    post = model.posterior(X)
    mean = post.mean  # (N, m)
    feas = jnp.ones((num_points,), bool)
    for c in constraints:
        feas = feas & (c(mean) <= 0)
    return jnp.mean(feas.astype(jnp.float32))


def get_feasible_samples(samples: Array, inequality_constraints=None):
    """Filter `(n, d)` samples by linear constraints
    `sum_i coef_i x[idx_i] >= rhs` (reference
    `utils/feasible_volume.py:21` `get_feasible_samples`). Returns
    `(feasible_samples, estimated_feasible_fraction)`."""
    if inequality_constraints is None:
        return samples, 1.0
    feas = jnp.ones((samples.shape[0],), bool)
    for idx, coef, rhs in inequality_constraints:
        lhs = samples[:, jnp.asarray(idx)] @ jnp.asarray(coef)
        feas = feas & (lhs >= rhs)
    frac = float(jnp.mean(feas.astype(jnp.float32)))
    return samples[feas], frac


def get_outcome_feasibility_probability(
    model,
    X: Array,
    outcome_constraints,
    key: Array,
    nsample_outcome: int = 1000,
    threshold: float = 0.1,
) -> float:
    """MC probability that posterior outcome samples at `X` are feasible
    under `c(samples) <= threshold` constraints (reference
    `utils/feasible_volume.py:60`)."""
    if not outcome_constraints:
        return 1.0
    post = model.posterior(X)
    ys = post.rsample(key, (nsample_outcome,))  # (s, n, m)
    feas = jnp.ones(ys.shape[:-1], bool)
    for c in outcome_constraints:
        feas = feas & (c(ys) <= threshold)
    return float(jnp.mean(feas.astype(jnp.float32)))
