r"""Deterministic models: known functions wrapped in the model API.

Counterpart of `botorch/models/deterministic.py:59,106,151,166`
(`GenericDeterministicModel`, `AffineDeterministicModel`,
`PosteriorMeanModel`, `FixedSingleSampleModel`): models whose
`posterior` is a point mass, used for known cost functions, composite
objectives, and single-sample approximations. Realized as
`GaussianPosterior` with zero covariance, so every downstream consumer
(acquisition functions, samplers, model lists) works unchanged.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

from botorch_tpu.posteriors.gaussian import GaussianPosterior

Array = jax.Array


def _point_mass(values: Array) -> GaussianPosterior:
    """Degenerate posterior at `values (..., q, m)`."""
    q, m = values.shape[-2], values.shape[-1]
    cov = jnp.zeros((*values.shape[:-2], m, q, q), values.dtype)
    return GaussianPosterior(mean=values, cov=cov)


class GenericDeterministicModel(struct.PyTreeNode):
    """Wraps a callable `f: (..., q, d) -> (..., q, m)`
    (reference `deterministic.py:59`)."""

    f: Callable = struct.field(pytree_node=False)
    num_outputs: int = struct.field(pytree_node=False, default=1)

    @property
    def batch_shape(self):
        return ()

    def posterior(self, X: Array, observation_noise: bool = False,
                  cache=None) -> GaussianPosterior:
        vals = self.f(X)
        if vals.shape[-1] != self.num_outputs:
            vals = vals[..., None]
        return _point_mass(vals)

    def train_chol(self):
        return None


class AffineDeterministicModel(struct.PyTreeNode):
    """`f(X) = X @ a + b` with `a (d, m)`, `b (m,)`
    (reference `deterministic.py:106`)."""

    a: Array
    b: Array

    @property
    def num_outputs(self) -> int:
        return self.a.shape[-1]

    @property
    def batch_shape(self):
        return ()

    def posterior(self, X: Array, observation_noise: bool = False,
                  cache=None) -> GaussianPosterior:
        return _point_mass(X @ self.a + self.b)

    def train_chol(self):
        return None


class PosteriorMeanModel(struct.PyTreeNode):
    """Deterministic model equal to another model's posterior mean
    (reference `deterministic.py:151`)."""

    model: struct.PyTreeNode

    @property
    def num_outputs(self) -> int:
        return self.model.num_outputs

    @property
    def batch_shape(self):
        return self.model.batch_shape

    def posterior(self, X: Array, observation_noise: bool = False,
                  cache=None) -> GaussianPosterior:
        return _point_mass(self.model.posterior(X, cache=cache).mean)

    def train_chol(self):
        return self.model.train_chol()


class FixedSingleSampleModel(struct.PyTreeNode):
    """`f(X) = mean(X) + w * std(X)` for a fixed standard-normal draw `w`
    — the single-sample approximation of a GP (reference
    `deterministic.py:166`)."""

    model: struct.PyTreeNode
    w: Array  # (m,)

    @property
    def num_outputs(self) -> int:
        return self.model.num_outputs

    @property
    def batch_shape(self):
        return self.model.batch_shape

    def posterior(self, X: Array, observation_noise: bool = False,
                  cache=None) -> GaussianPosterior:
        post = self.model.posterior(X, cache=cache)
        vals = post.mean + jnp.sqrt(jnp.clip(post.variance, 0.0)) * self.w
        return _point_mass(vals)

    def train_chol(self):
        return self.model.train_chol()


def make_fixed_single_sample_model(model, key: Optional[Array] = None,
                                   w: Optional[Array] = None):
    """Draw the fixed `w ~ N(0, I_m)` (reference behavior) unless given."""
    if w is None:
        if key is None:
            key = jax.random.PRNGKey(0)
        w = jax.random.normal(key, (model.num_outputs,))
    return FixedSingleSampleModel(model=model, w=w)
