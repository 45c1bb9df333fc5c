r"""Test doubles: mock posteriors/models/acqfs and data helpers.

Counterpart of `botorch/utils/testing.py` (`MockPosterior :227`,
`MockModel :331`, `MockAcquisitionFunction :369`, `_get_random_data :383`)
— the seam the reference's unit tests use to exercise acquisition
machinery without real GPs. Same seam here, as pytree dataclasses.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from botorch_tpu.posteriors.gaussian import GaussianPosterior

Array = jax.Array


class MockPosterior(struct.PyTreeNode):
    """Canned mean/variance/samples."""

    _mean: Array = None  # (..., q, m)
    _variance: Array = None
    _samples: Array = None  # returned by rsample regardless of key

    @property
    def mean(self):
        return self._mean

    @property
    def variance(self):
        return self._variance

    @property
    def cov(self):
        v = jnp.swapaxes(self._variance, -1, -2)  # (..., m, q)
        q = v.shape[-1]
        return v[..., :, None] * jnp.eye(q)

    @property
    def batch_shape(self):
        return self._mean.shape[:-2]

    def rsample(self, key, sample_shape=()):
        s = self._samples
        return jnp.broadcast_to(s, (*sample_shape, *s.shape))

    def rsample_from_base_samples(self, base_samples):
        s = self._samples
        return jnp.broadcast_to(s, (*base_samples.shape[:1], *s.shape))


class MockModel(struct.PyTreeNode):
    """Returns a fixed posterior; supports the acqf-layer protocol."""

    posterior_obj: MockPosterior = None

    def posterior(self, X, observation_noise=False, cache=None):
        return self.posterior_obj

    def train_chol(self):
        return None

    @property
    def num_outputs(self):
        return self.posterior_obj._mean.shape[-1]

    @property
    def batch_shape(self):
        return ()


class MockAcquisitionFunction:
    """Records calls; returns the first coordinate sum."""

    def __init__(self):
        self.call_args = []

    def __call__(self, X):
        self.call_args.append(np.asarray(X))
        return jnp.sum(X[..., 0])


def get_random_data(n=10, d=2, m=1, seed=0, dtype=jnp.float32):
    """Random training data with a sin trend (reference
    `_get_random_data :383`)."""
    rng = np.random.default_rng(seed)
    X = jnp.asarray(rng.uniform(size=(n, d)), dtype)
    Y = jnp.asarray(
        np.sin(np.asarray(X[:, :1]) * 6.0)
        + 0.1 * rng.normal(size=(n, m)),
        dtype,
    )
    if m > 1:
        Y = jnp.broadcast_to(Y[:, :1], (n, m)) + 0.05 * jnp.asarray(
            rng.normal(size=(n, m)), dtype
        )
    return X, Y


def get_test_posterior(q=3, m=1, batch_shape=(), seed=0):
    """A random valid GaussianPosterior."""
    rng = np.random.default_rng(seed)
    mean = jnp.asarray(rng.normal(size=(*batch_shape, q, m)), jnp.float32)
    A = rng.normal(size=(*batch_shape, m, q, q))
    cov = jnp.asarray(A @ np.swapaxes(A, -1, -2) + 0.1 * np.eye(q), jnp.float32)
    return GaussianPosterior(mean=mean, cov=cov)
