r"""Gaussian posterior pytrees with reparameterized (SAA) sampling.

The TPU-native counterpart of `botorch/posteriors/gpytorch.py:35-190`:
instead of a lazy MVN wrapper over linear_operator, the posterior is an
explicit pytree holding the joint mean and covariance root over the `q`
candidate points (per output). `rsample_from_base_samples` implements the
Sample-Average-Approximation pathway (`gpytorch.py:85-126`): samples are a
deterministic, differentiable function `mean + L @ eps` of fixed base
samples, which is what makes gradient-based optimization of MC acquisition
values work.

Shape conventions (BoTorch-compatible):
  * `mean`: `batch_shape x q x m`
  * `cov`:  `batch_shape x m x q x q` (outputs independent, joint over q)
  * base samples / draws: `sample_shape x batch_shape x q x m`
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from botorch_tpu.ops.chol import psd_safe_cholesky

Array = jax.Array


class GaussianPosterior(struct.PyTreeNode):
    """Joint Gaussian posterior over `q` points and `m` independent outputs."""

    mean: Array  # (..., q, m)
    cov: Array  # (..., m, q, q)

    @property
    def variance(self) -> Array:  # (..., q, m)
        v = jnp.diagonal(self.cov, axis1=-2, axis2=-1)  # (..., m, q)
        return jnp.maximum(jnp.swapaxes(v, -1, -2), 0.0)

    @property
    def batch_shape(self) -> tuple[int, ...]:
        return self.mean.shape[:-2]

    @property
    def q(self) -> int:
        return self.mean.shape[-2]

    @property
    def num_outputs(self) -> int:
        return self.mean.shape[-1]

    @property
    def scale_tril(self) -> Array:  # (..., m, q, q)
        return psd_safe_cholesky(self.cov)

    @property
    def base_sample_shape(self) -> tuple[int, ...]:
        return (*self.batch_shape, self.q, self.num_outputs)

    def rsample_from_base_samples(self, base_samples: Array) -> Array:
        """Reparameterized draws `mean + L @ eps`.

        Args:
            base_samples: `sample_shape x ... x q x m` standard-normal draws
                (fixed across optimizer iterations — the SAA contract).

        Returns:
            `sample_shape x ... x q x m` posterior samples, differentiable
            w.r.t. the posterior's parameters.
        """
        L = self.scale_tril  # (..., m, q, q)
        eps = jnp.swapaxes(base_samples, -1, -2)[..., None]  # (s, ..., m, q, 1)
        draw = (L @ eps)[..., 0]  # (s, ..., m, q)
        return self.mean + jnp.swapaxes(draw, -1, -2)

    def rsample(self, key, sample_shape: tuple[int, ...] = ()) -> Array:
        """Random reparameterized draws (fresh base samples)."""
        base = jax.random.normal(
            key, (*sample_shape, *self.base_sample_shape), dtype=self.mean.dtype
        )
        return self.rsample_from_base_samples(base)

    def quantile(self, value: Array) -> Array:
        """Marginal per-point quantiles (reference
        `posteriors/gpytorch.py:167-172`): the inverse CDF of each
        marginal `N(mean, var)` at probability `value`. A scalar `value`
        returns shape `(..., q, m)`; a vector of `k` probabilities gets a
        leading `k` axis, matching the reference's stacking rule."""
        value = jnp.asarray(value, self.mean.dtype)
        sd = jnp.sqrt(self.variance)
        z = jax.scipy.special.ndtri(value)
        if value.ndim == 0:
            return self.mean + z * sd
        z = z.reshape((-1,) + (1,) * self.mean.ndim)
        return self.mean + z * sd

    def density(self, value: Array) -> Array:
        """Marginal probability density at `value` (reference
        `posteriors/gpytorch.py:174-179`): `N(mean, var)` pdf evaluated
        pointwise. Scalar `value` broadcasts; a vector of `k` values gets
        a leading `k` axis."""
        value = jnp.asarray(value, self.mean.dtype)
        sd = jnp.sqrt(jnp.maximum(self.variance, 1e-30))
        if value.ndim == 0:
            u = (value - self.mean) / sd
        else:
            v = value.reshape((-1,) + (1,) * self.mean.ndim)
            u = (v - self.mean) / sd
        return jnp.exp(-0.5 * u * u) / (sd * jnp.sqrt(2.0 * jnp.pi))

    def affine(self, loc: Array, scale: Array) -> "GaussianPosterior":
        """Apply the per-output affine map `y -> loc + scale * y` (outcome
        de-standardization; reference `transforms/outcome.py:217-449`)."""
        mean = self.mean * scale + loc
        cov = self.cov * jnp.square(jnp.moveaxis(jnp.atleast_1d(scale), -1, -1))[
            ..., :, None, None
        ]
        return GaussianPosterior(mean=mean, cov=cov)


def scalarize_posterior(
    post: "GaussianPosterior", weights: Array, offset: float = 0.0
) -> "GaussianPosterior":
    """Affine scalarization `w . f(x) + offset` of a multi-output Gaussian
    posterior into a single-output one (reference
    `posteriors/gpytorch.py:192` `scalarize_posterior`). Outputs are
    independent in this posterior layout, so the scalarized covariance is
    `sum_m w_m^2 Sigma_m`."""
    w = jnp.asarray(weights)
    mean = jnp.sum(post.mean * w, axis=-1, keepdims=True) + offset
    cov = jnp.sum(
        post.cov * jnp.square(w)[..., :, None, None], axis=-3, keepdims=True
    )
    return GaussianPosterior(mean=mean, cov=cov)
