r"""Max-value entropy search: MES and the GIBBON lower bound.

Counterpart of `botorch/acquisition/max_value_entropy_search.py`
(`qMaxValueEntropy :300`, `qLowerBoundMaxValueEntropy` (GIBBON) `:518`,
Gumbel max-value sampling in `DiscreteMaxValueBase :194`).

Max-value samples `f*` are drawn with the Gumbel approximation: the CDF of
the posterior max over a discrete grid is approximated as
`prod_i Phi((y - mu_i)/sigma_i) ~ Gumbel(a, b)` fitted by quantile
matching at (0.25, 0.5, 0.75), then sampled analytically.

MES (q = 1, [Wang2017mes]):
    `alpha(x) = mean_k [ g_k phi(g_k) / (2 Phi(g_k)) - log Phi(g_k) ]`,
    `g_k = (f*_k - mu(x)) / sigma(x)`.
GIBBON (q = 1, [Moss2021gibbon]) uses
    `alpha(x) = -0.5 mean_k log(1 - rho^2 R(g_k))` with
    `R(g) = phi(g)/Phi(g) * (g + phi(g)/Phi(g))` and `rho^2 =
    sigma_f^2 / (sigma_f^2 + noise)`; for q > 1 the information-weighted
    repulsion `0.5 log det C` over the candidate correlation matrix is
    added (diversity term).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from botorch_tpu.models.gp import SingleTaskGP
from botorch_tpu.ops.chol import psd_safe_cholesky
from botorch_tpu.utils.probability import log_ndtr, ndtr, phi

Array = jax.Array


def sample_max_values_gumbel(
    model: SingleTaskGP,
    X_grid: Array,
    key: Array,
    num_samples: int = 16,
    cache=None,
) -> Array:
    """Gumbel-approximate samples of the posterior maximum `f*`
    (reference `max_value_entropy_search.py:194-297`)."""
    post = model.posterior(X_grid, cache=cache)
    mu = post.mean[..., 0]
    sigma = jnp.sqrt(jnp.clip(post.variance[..., 0], 1e-12))
    if mu.ndim > 1:  # ensemble: pool the mixture marginals
        mu = mu.reshape(-1, mu.shape[-1]).mean(0)
        sigma = sigma.reshape(-1, sigma.shape[-1]).mean(0)

    def log_cdf_max(y):
        return jnp.sum(log_ndtr((y - mu) / sigma))

    lo = jnp.min(mu - 5.0 * sigma)
    hi = jnp.max(mu + 5.0 * sigma)

    def quantile(p, lo, hi):
        target = math.log(p)

        def body(_, ab):
            a, b = ab
            mid = 0.5 * (a + b)
            below = log_cdf_max(mid) < target
            return jnp.where(below, mid, a), jnp.where(below, b, mid)

        a, b = jax.lax.fori_loop(0, 40, body, (lo, hi))
        return 0.5 * (a + b)

    q25 = quantile(0.25, lo, hi)
    q50 = quantile(0.50, lo, hi)
    q75 = quantile(0.75, lo, hi)
    # Gumbel(a, b): F(y) = exp(-exp(-(y - a)/b)); quantile matching
    b = (q75 - q25) / (
        math.log(math.log(4.0)) - math.log(math.log(4.0 / 3.0))
    )
    a = q50 + b * math.log(math.log(2.0))
    u = jax.random.uniform(key, (num_samples,), minval=1e-6, maxval=1 - 1e-6)
    return a - b * jnp.log(-jnp.log(u))


class qMaxValueEntropy(struct.PyTreeNode):
    """MES for q = 1 candidates (reference `qMaxValueEntropy :300`)."""

    model: SingleTaskGP
    cache: tuple
    max_values: Array  # (K,) sampled f*

    def __call__(self, X: Array) -> Array:
        post = self.model.posterior(X, cache=self.cache)
        mu = post.mean[..., 0, 0]
        sigma = jnp.sqrt(jnp.clip(post.variance[..., 0, 0], 1e-12))
        g = (self.max_values - mu[..., None]) / sigma[..., None]
        gcl = jnp.clip(g, -6.0, None)  # stability in the left tail
        ig = 0.5 * gcl * phi(gcl) / jnp.clip(ndtr(gcl), 1e-10) - log_ndtr(gcl)
        val = jnp.mean(ig, axis=-1)
        return jnp.mean(val)  # ensemble reduce (no-op for scalar)


class qLowerBoundMaxValueEntropy(struct.PyTreeNode):
    """GIBBON (reference `qLowerBoundMaxValueEntropy :518`), with the
    determinant-based diversity term for q > 1."""

    model: SingleTaskGP
    cache: tuple
    max_values: Array  # (K,)

    def _pointwise(self, mu, sigma2, noise):
        rho2 = sigma2 / (sigma2 + noise)
        sigma = jnp.sqrt(jnp.clip(sigma2, 1e-12))
        g = (self.max_values - mu[..., None]) / sigma[..., None]
        g = jnp.clip(g, -6.0, 6.0)
        h = phi(g) / jnp.clip(ndtr(g), 1e-10)  # hazard
        R = h * (g + h)
        inner = jnp.clip(1.0 - rho2[..., None] * R, 1e-10, None)
        return -0.5 * jnp.mean(jnp.log(inner), axis=-1)  # (..., q)

    def __call__(self, X: Array) -> Array:
        m = self.model
        post = m.posterior(X, cache=self.cache)
        mu = post.mean[..., 0]
        cov = post.cov[..., 0, :, :]
        sigma2 = jnp.clip(jnp.diagonal(cov, axis1=-2, axis2=-1), 1e-12)
        p = jax.tree_util.tree_map(lambda a: a[..., 0], m.params)
        noise = (
            jnp.mean(m.Yvar[:, 0]) if m.Yvar is not None else p.noise
        ) * jnp.square(m.Y_scale[0])
        val = jnp.sum(self._pointwise(mu, sigma2, noise), axis=-1)
        q = X.shape[-2]
        if q > 1:
            corr = cov / jnp.sqrt(sigma2[..., :, None] * sigma2[..., None, :])
            L = psd_safe_cholesky(corr)
            val = val + jnp.sum(
                jnp.log(jnp.clip(jnp.diagonal(L, axis1=-2, axis2=-1), 1e-10)),
                axis=-1,
            )
        return jnp.mean(val)


def make_mes(
    cls,
    model: SingleTaskGP,
    bounds: Array,
    key: Array,
    num_max_values: int = 16,
    grid_size: int = 1024,
    seed: int = 0,
):
    """Build an MES/GIBBON acqf: Sobol grid -> Gumbel f* samples."""
    from botorch_tpu.sampling.sobol import draw_sobol, sobol_table

    d = bounds.shape[-1]
    sv, shift = sobol_table(d, scramble=True, seed=seed)
    grid = bounds[0] + (bounds[1] - bounds[0]) * draw_sobol(sv, shift, grid_size)
    cache = model.train_chol()
    mv = sample_max_values_gumbel(
        model, grid, key, num_samples=num_max_values, cache=cache
    )
    return cls(model=model, cache=cache, max_values=mv)


class qMultiObjectiveMaxValueEntropy(struct.PyTreeNode):
    """MESMO (reference `multi_objective/max_value_entropy_search.py:47`,
    [Belakaria2019mesmo]): multi-objective max-value entropy as the SUM of
    per-objective MES terms, with each objective's max-value samples drawn
    by the Gumbel approximation over a shared grid."""

    model: SingleTaskGP  # m outputs
    cache: tuple
    max_values: Array  # (K, m)

    def __call__(self, X: Array) -> Array:
        post = self.model.posterior(X, cache=self.cache)
        mu = post.mean[..., 0, :]  # (m,)
        sigma = jnp.sqrt(jnp.clip(post.variance[..., 0, :], 1e-12))
        g = (self.max_values - mu) / sigma  # (K, m)
        gcl = jnp.clip(g, -6.0, None)
        ig = 0.5 * gcl * phi(gcl) / jnp.clip(ndtr(gcl), 1e-10) - log_ndtr(gcl)
        return jnp.mean(jnp.sum(jnp.mean(ig, axis=0), axis=-1))


def make_mesmo(
    model: SingleTaskGP,
    bounds: Array,
    key: Array,
    num_max_values: int = 16,
    grid_size: int = 1024,
    seed: int = 0,
) -> qMultiObjectiveMaxValueEntropy:
    """Build MESMO: per-objective Gumbel max-value samples over one grid."""
    from botorch_tpu.sampling.sobol import draw_sobol, sobol_table

    d = bounds.shape[-1]
    sv, shift = sobol_table(d, scramble=True, seed=seed)
    grid = bounds[0] + (bounds[1] - bounds[0]) * draw_sobol(sv, shift, grid_size)
    cache = model.train_chol()
    post = model.posterior(grid, cache=cache)
    mvs = []
    for o in range(model.num_outputs):
        mu_o = post.mean[..., o]
        sd_o = jnp.sqrt(jnp.clip(post.variance[..., o], 1e-12))

        # reuse the Gumbel machinery directly on the marginals
        import math as _math

        def log_cdf_max(y):
            return jnp.sum(log_ndtr((y - mu_o) / sd_o))

        lo = jnp.min(mu_o - 5 * sd_o)
        hi = jnp.max(mu_o + 5 * sd_o)

        def quantile(p, lo, hi):
            target = _math.log(p)

            def body(_, ab):
                a, b = ab
                mid = 0.5 * (a + b)
                below = log_cdf_max(mid) < target
                return jnp.where(below, mid, a), jnp.where(below, b, mid)

            a, b = jax.lax.fori_loop(0, 40, body, (lo, hi))
            return 0.5 * (a + b)

        q25, q50, q75 = (quantile(p, lo, hi) for p in (0.25, 0.5, 0.75))
        b_g = (q75 - q25) / (
            _math.log(_math.log(4.0)) - _math.log(_math.log(4.0 / 3.0))
        )
        a_g = q50 + b_g * _math.log(_math.log(2.0))
        u = jax.random.uniform(
            jax.random.fold_in(key, o), (num_max_values,),
            minval=1e-6, maxval=1 - 1e-6,
        )
        mvs.append(a_g - b_g * jnp.log(-jnp.log(u)))
    return qMultiObjectiveMaxValueEntropy(
        model=model, cache=cache, max_values=jnp.stack(mvs, axis=-1)
    )


def make_mf_mes(
    cls,
    model: SingleTaskGP,
    bounds: Array,
    key,
    project,
    cost_fn=None,
    num_max_values: int = 16,
    grid_size: int = 1024,
    seed: int = 0,
):
    """Multi-fidelity MES / GIBBON (reference
    `max_value_entropy_search.py:667,815`
    `qMultiFidelity(LowerBound)MaxValueEntropy`): max values are sampled
    on a grid PROJECTED to the target fidelity, and the information gain
    is inverse-cost-weighted (pass `cost_fn`, e.g.
    `wrappers.affine_fidelity_cost`; `None` for unweighted)."""
    from botorch_tpu.sampling.sobol import draw_sobol, sobol_table

    d = bounds.shape[-1]
    sv, shift = sobol_table(d, scramble=True, seed=seed)
    grid = bounds[0] + (bounds[1] - bounds[0]) * draw_sobol(sv, shift, grid_size)
    grid = project(grid)
    cache = model.train_chol()
    mv = sample_max_values_gumbel(
        model, grid, key, num_samples=num_max_values, cache=cache
    )
    acqf = cls(model=model, cache=cache, max_values=mv)
    if cost_fn is None:
        return acqf
    from botorch_tpu.acquisition.wrappers import CostAwareAcquisitionFunction

    return CostAwareAcquisitionFunction(acqf=acqf, cost_fn=cost_fn)
