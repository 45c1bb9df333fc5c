r"""Sampling-based candidate generation strategies.

Counterpart of `botorch/generation/sampling.py` (`MaxPosteriorSampling
:60`, `BoltzmannSampling :158`, `ConstrainedMaxPosteriorSampling :225`):
generate candidates from a discrete set WITHOUT an inner optimizer —
Thompson-sampling style, the workhorse of TuRBO loops.

Two posterior-sampling backends:
  * `joint`: exact joint posterior over the candidate set (O(n_c^3), for
    small sets — the reference's default `posterior(...).rsample` path);
  * `pathwise`: Matheron sample paths evaluated at the candidates
    (O(n_c (L + n)) matmuls on the MXU — use for TuRBO-scale sets).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

from botorch_tpu.models.gp import SingleTaskGP
from botorch_tpu.sampling.pathwise import draw_matheron_paths

Array = jax.Array


def max_posterior_sampling(
    model: SingleTaskGP,
    X_cand: Array,
    key: Array,
    num_samples: int = 1,
    observation_noise: bool = False,
    maximize: bool = True,
    method: str = "pathwise",
    num_features: int = 1024,
) -> Array:
    """Thompson sampling over a discrete candidate set: draw
    `num_samples` posterior functions, return each one's argmax candidate.

    Returns `(num_samples, d)` selected candidates.
    """
    if method == "pathwise":
        paths = draw_matheron_paths(model, key, num_samples, num_features)
        vals = paths(X_cand)  # (num_samples, n_c)
    else:
        post = model.posterior(X_cand, observation_noise=observation_noise)
        vals = post.rsample(key, (num_samples,))[..., 0]  # (num_samples, n_c)
    if not maximize:
        vals = -vals
    idx = jnp.argmax(vals, axis=-1)
    return X_cand[idx]


def constrained_max_posterior_sampling(
    model: SingleTaskGP,
    constraint_model: SingleTaskGP,
    X_cand: Array,
    key: Array,
    num_samples: int = 1,
) -> Array:
    """Thompson sampling with feasibility from a constraint model
    (`c(x) <= 0` feasible; reference `generation/sampling.py:225`):
    infeasible candidates get -inf objective; if no feasible candidate,
    pick the minimum-violation one."""
    k_obj, k_con = jax.random.split(key)
    post = model.posterior(X_cand)
    obj = post.rsample(k_obj, (num_samples,))[..., 0]  # (s, n_c)
    cpost = constraint_model.posterior(X_cand)
    cons = cpost.rsample(k_con, (num_samples,))  # (s, n_c, m_c)
    violation = jnp.sum(jnp.maximum(cons, 0.0), axis=-1)  # (s, n_c)
    feasible = jnp.all(cons <= 0, axis=-1)
    any_feas = jnp.any(feasible, axis=-1, keepdims=True)
    score = jnp.where(
        any_feas,
        jnp.where(feasible, obj, -jnp.inf),
        -violation,
    )
    idx = jnp.argmax(score, axis=-1)
    return X_cand[idx]


def boltzmann_sampling(
    acq_vals: Array,
    X_cand: Array,
    key: Array,
    num_samples: int = 1,
    eta: float = 1.0,
    replacement: bool = True,
) -> Array:
    """Sample candidates with probability `~ exp(eta * standardize(val))`
    (reference `generation/sampling.py:158`)."""
    vals = jnp.where(jnp.isfinite(acq_vals), acq_vals, -jnp.inf)
    std = jnp.std(vals, where=jnp.isfinite(vals))
    std = jnp.where((std > 0) & jnp.isfinite(std), std, 1.0)
    logits = eta * (vals - jnp.nanmean(jnp.where(jnp.isfinite(vals), vals, jnp.nan))) / std
    logits = jnp.where(jnp.isfinite(vals), logits, -jnp.inf)
    if replacement:
        idx = jax.random.categorical(key, logits, shape=(num_samples,))
    else:
        g = -jnp.log(-jnp.log(jax.random.uniform(key, logits.shape, minval=1e-20)))
        _, idx = jax.lax.top_k(logits + g, num_samples)
    return X_cand[idx]


class PathwiseThompsonSampling(struct.PyTreeNode):
    """Thompson sampling packaged as an acquisition function (reference
    `acquisition/thompson_sampling.py:22` `PathwiseThompsonSampling`):
    `__call__(X (q, d))` returns the q-sum of a FIXED pathwise posterior
    draw, so maximizing it with `optimize_acqf` yields a Thompson sample.
    Build with `make_pathwise_thompson_sampling`."""

    paths: object  # MatheronPath (num_paths = 1)

    def __call__(self, X: Array) -> Array:
        X = jnp.atleast_2d(X)
        return jnp.sum(self.paths(X)[0])


def make_pathwise_thompson_sampling(
    model: SingleTaskGP, key: Array, num_features: int = 1024
) -> PathwiseThompsonSampling:
    """Draw one Matheron path and wrap it as an acqf."""
    if getattr(model, "_is_fully_bayesian", False):
        raise NotImplementedError(
            "PathwiseThompsonSampling is not supported for fully Bayesian "
            "models (as in the reference)"
        )
    paths = draw_matheron_paths(model, key, num_paths=1,
                                num_features=num_features)
    return PathwiseThompsonSampling(paths=paths)
