r"""Joint entropy search (JES).

Counterpart of `botorch/acquisition/joint_entropy_search.py:60`
(`qJointEntropySearch`, [Hvarfner2022jes]/[Tu2022jes]). Optimum pairs
`(x*, f*)` are sampled by maximizing pathwise (Matheron) posterior draws —
the native analogue of the reference's `optimize_posterior_samples` — and
the information gain is estimated by noiseless conditioning on each
sampled optimum plus an upper truncation of the conditioned marginal at
`f*` (truncated-Gaussian entropy, the reference's lower-bound estimator
family).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from botorch_tpu.models.gp import SingleTaskGP
from botorch_tpu.utils.probability import log_ndtr, ndtr, phi

Array = jax.Array

_half_log_2pi_e = 0.5 * math.log(2.0 * math.pi * math.e)


class qJointEntropySearch(struct.PyTreeNode):
    """JES for q = 1 candidates. Built by `make_jes`."""

    model: SingleTaskGP
    cache: tuple
    X_opt: Array  # (K, d) sampled optimizer locations
    f_opt: Array  # (K,) sampled optimal values

    def __call__(self, X: Array) -> Array:
        m = self.model
        K = self.X_opt.shape[0]
        post = m.posterior(X, cache=self.cache)
        mu0 = post.mean[..., 0, 0]
        var0 = jnp.clip(post.variance[..., 0, 0], 1e-12)
        p = jax.tree_util.tree_map(lambda a: a[..., 0], m.params)
        noise = (
            jnp.mean(m.Yvar[:, 0]) if m.Yvar is not None else p.noise
        ) * jnp.square(m.Y_scale[0])
        h0 = _half_log_2pi_e + 0.5 * jnp.log(var0 + noise)

        # joint posterior of (f(x), f(x*_k)) for the rank-1 conditioning
        def one(xk, fk):
            joint = m.posterior(
                jnp.stack([X[0], xk]), cache=self.cache
            )
            mus = joint.mean[:, 0]
            cov = joint.cov[0]
            v_star = jnp.clip(cov[1, 1], 1e-12)
            # noiseless conditioning on f(x*) = f*
            mu_c = mus[0] + cov[0, 1] / v_star * (fk - mus[1])
            var_c = jnp.clip(cov[0, 0] - cov[0, 1] ** 2 / v_star, 1e-12)
            # upper truncation at f*: entropy of the truncated observation
            sig = jnp.sqrt(var_c + noise)
            g = jnp.clip((fk - mu_c) / sig, -6.0, 6.0)
            Z = jnp.clip(ndtr(g), 1e-10)
            h = (
                _half_log_2pi_e
                + 0.5 * jnp.log(var_c + noise)
                + jnp.log(Z)
                - g * phi(g) / (2.0 * Z)
            )
            return h

        hks = jax.vmap(one)(self.X_opt, self.f_opt)
        val = h0 - jnp.mean(hks)
        return jnp.mean(val)  # ensemble reduce (no-op scalar)


def make_jes(
    model: SingleTaskGP,
    bounds: Array,
    key: Array,
    num_optima: int = 16,
    num_features: int = 512,
    raw_samples: int = 512,
    maxiter: int = 30,
) -> qJointEntropySearch:
    """Sample `(x*, f*)` pairs with pathwise draws and build JES."""
    from botorch_tpu.sampling.pathwise import draw_matheron_paths
    from botorch_tpu.utils.sampling import optimize_posterior_samples

    paths = draw_matheron_paths(model, key, num_optima, num_features)
    xs, fs = [], []
    for k in range(num_optima):
        path_k = lambda x: paths(x)[k]
        xk, fk = optimize_posterior_samples(
            path_k, bounds, jax.random.fold_in(key, k),
            raw_samples=raw_samples, num_restarts=2, maxiter=maxiter,
        )
        xs.append(xk)
        fs.append(fk)
    return qJointEntropySearch(
        model=model,
        cache=model.train_chol(),
        X_opt=jnp.stack(xs),
        f_opt=jnp.stack(fs),
    )
