r"""Truncated multivariate normal and unified skew normal distributions.

Counterparts of `botorch/utils/probability/truncated_multivariate_normal.py:21`
and `botorch/utils/probability/unified_skew_normal.py:28`: the
box-truncated MVN (log-partition via the bivariate-conditioning solver,
exact sampling via linear elliptical slice sampling) and the unified
skew normal — the marginal law of a Gaussian `x` jointly normal with a
latent `z` that is conditioned on a box event `a <= z <= b`:

    f(x) = phi(x; mu_x, Kxx) * P(a <= z <= b | x) / P(a <= z <= b),

both probabilities evaluated with `mvnxpb`. Everything is a flax pytree:
jit/vmap/grad-compatible, f32 on device.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import struct

from botorch_tpu.ops.chol import psd_safe_cholesky
from botorch_tpu.utils.lin_ess import sample_truncated_mvn
from botorch_tpu.utils.mvnxpb import mvnxpb

Array = jax.Array

_log_2pi = math.log(2.0 * math.pi)


def _mvn_log_prob(x: Array, mean: Array, cov: Array) -> Array:
    d = mean.shape[-1]
    L = psd_safe_cholesky(cov)
    resid = x - mean
    flat = resid.reshape(-1, d).T  # (d, N): one solve for any batch shape
    r = jax.scipy.linalg.solve_triangular(L, flat, lower=True)
    maha = jnp.sum(jnp.square(r), 0).reshape(resid.shape[:-1])
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
    return -0.5 * (d * _log_2pi + logdet + maha)


class TruncatedMultivariateNormal(struct.PyTreeNode):
    """`N(mean, cov)` restricted to the box `bounds[:, 0] <= x <=
    bounds[:, 1]` (entries may be infinite)."""

    mean: Array  # (d,)
    cov: Array  # (d, d)
    bounds: Array  # (d, 2)

    @property
    def log_partition(self) -> Array:
        return mvnxpb(self.cov, self.bounds - self.mean[:, None])

    def log_prob(self, x: Array) -> Array:
        inside = jnp.all(
            (x >= self.bounds[..., 0]) & (x <= self.bounds[..., 1]), -1
        )
        lp = _mvn_log_prob(x, self.mean, self.cov) - self.log_partition
        return jnp.where(inside, lp, -jnp.inf)

    def rsample(self, key: Array, num_samples: int = 1, **kwargs) -> Array:
        d = self.mean.shape[-1]
        eye = jnp.eye(d, dtype=self.mean.dtype)
        A = jnp.concatenate([eye, -eye])
        big = 1e10
        ub = jnp.nan_to_num(self.bounds[:, 1], posinf=big)
        lb = jnp.nan_to_num(self.bounds[:, 0], neginf=-big)
        b = jnp.concatenate([ub, -lb])
        sd = jnp.sqrt(jnp.diagonal(self.cov))
        x0 = jnp.clip(self.mean, lb + 1e-4 * sd, ub - 1e-4 * sd)
        return sample_truncated_mvn(
            self.mean, self.cov, A, b, x0, key, num_samples=num_samples,
            **kwargs,
        )


class UnifiedSkewNormal(struct.PyTreeNode):
    """Law of `x ~ N(gauss_mean, Kxx)` given `a <= z <= b`, where
    `(z, x)` are jointly normal with `cov(z, x) = cross_covariance`
    (`(d_z, d_x)`), `z ~ N(trunc.mean, trunc.cov)` marginally."""

    trunc: TruncatedMultivariateNormal
    gauss_mean: Array  # (d_x,)
    gauss_cov: Array  # (d_x, d_x)
    cross_covariance: Array  # (d_z, d_x)

    def log_prob(self, x: Array) -> Array:
        G = self.cross_covariance
        Lx = psd_safe_cholesky(self.gauss_cov)
        # iKxx_Kxy = Kxx^{-1} G^T via two triangular solves
        iKxx_Kxy = jax.scipy.linalg.cho_solve((Lx, True), G.T)  # (d_x, d_z)
        cond_cov = self.trunc.cov - G @ iKxx_Kxy
        resid = x - self.gauss_mean  # (..., d_x)
        cond_mean = self.trunc.mean + resid @ iKxx_Kxy  # (..., d_z)
        bounds = self.trunc.bounds

        def _num(cm):
            return mvnxpb(cond_cov, bounds - cm[:, None])

        for _ in range(resid.ndim - 1):
            _num = jax.vmap(_num)
        return (
            _mvn_log_prob(x, self.gauss_mean, self.gauss_cov)
            + _num(cond_mean)
            - self.trunc.log_partition
        )

    def rsample(self, key: Array, num_samples: int = 1, **kwargs) -> Array:
        kz, kx = jax.random.split(key)
        z = self.trunc.rsample(kz, num_samples=num_samples, **kwargs)
        G = self.cross_covariance
        Lz = psd_safe_cholesky(self.trunc.cov)
        iKzz_Kzx = jax.scipy.linalg.cho_solve((Lz, True), G)  # (d_z, d_x)
        cond_mean = self.gauss_mean + (z - self.trunc.mean) @ iKzz_Kzx
        cond_cov = self.gauss_cov - G.T @ iKzz_Kzx
        Lc = psd_safe_cholesky(cond_cov)
        eps = jax.random.normal(
            kx, (num_samples, self.gauss_mean.shape[-1]),
            dtype=self.gauss_mean.dtype,
        )
        return cond_mean + eps @ Lc.T
