r"""Multivariate normal box probabilities via bivariate conditioning.

Counterpart of `botorch/utils/probability/mvnxpb.py:59` (`MVNXPB`): the
[Trinh2015bvnapprox] approximation of `P(a <= x <= b)` for
`x ~ N(0, Sigma)` — deterministic, differentiable, and orders of magnitude
cheaper than quadrature, with relative error typically well under a
percent for moderate correlation.

Scheme: pivoted Cholesky `Sigma = L L^T` with the Genz ordering heuristic
(condition the *most restrictive* remaining variable at each step, where
restrictiveness accounts for the truncated means of everything already
conditioned). With `x = L y`, process the `y` variables two at a time:
each pair's rows define a correlated bivariate rectangle (exact
probability via `bvn`); after integrating a pair, the remaining rows'
bounds are shifted by the pair's truncated conditional means (closed
forms via `bvnmom`). The product of pair probabilities approximates the
box probability.

TPU-first differences from the reference:
  * one fused jit-compatible pass with statically unrolled loops (d is
    static); the pivot *choice* is discrete (argmin under
    `stop_gradient`) but every numeric path — including the pivoted
    Cholesky itself, realized as traced-index gathers — is
    differentiable, f32 on-device;
  * batching via `vmap` rather than explicit batch-shaped buffers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from botorch_tpu.utils.bvn import bvn, bvnmom
from botorch_tpu.utils.probability import ndtr, phi

Array = jax.Array

_CLIP = 10.0  # standardized bounds beyond ~10 sigma are numerically 0/1
_TINY = 1e-20


def _rect_moments(xl, xu, yl, yu, r):
    """Probability and unnormalized first moments of a correlated standard
    bivariate normal on the rectangle, by inclusion-exclusion of the
    orthant closed forms (`bvnmom`)."""
    p_ll, ex_ll, ey_ll = bvnmom(xl, yl, r)
    p_ul, ex_ul, ey_ul = bvnmom(xu, yl, r)
    p_lu, ex_lu, ey_lu = bvnmom(xl, yu, r)
    p_uu, ex_uu, ey_uu = bvnmom(xu, yu, r)
    p = jnp.clip(p_ll - p_ul - p_lu + p_uu, 0.0, 1.0)
    ex = ex_ll - ex_ul - ex_lu + ex_uu
    ey = ey_ll - ey_ul - ey_lu + ey_uu
    return p, ex, ey


def _pivoted_chol(C: Array, a: Array, b: Array):
    """Genz-ordered pivoted Cholesky: at each step pick the remaining
    variable with the smallest conditional probability mass (univariate,
    with already-conditioned variables at their truncated means), swap it
    in, and compute its Cholesky column. Returns `(L, a, b)` permuted."""
    d = C.shape[-1]
    L = jnp.zeros_like(C)
    e = jnp.zeros(d, C.dtype)  # univariate truncated means of y (ordering)
    ar = jnp.arange(d)
    for l in range(d):
        s2 = jnp.clip(jnp.diagonal(C) - jnp.sum(L[:, :l] ** 2, -1), 1e-10)
        s = jnp.sqrt(s2)
        shift = L[:, :l] @ e[:l] if l else jnp.zeros(d, C.dtype)
        pm = ndtr((b - shift) / s) - ndtr((a - shift) / s)
        m = jnp.argmin(
            jax.lax.stop_gradient(jnp.where(ar >= l, pm, jnp.inf))
        )
        idx = ar.at[l].set(m).at[m].set(l)
        C, a, b, L = C[idx][:, idx], a[idx], b[idx], L[idx]
        Lll = jnp.sqrt(jnp.clip(C[l, l] - L[l, :l] @ L[l, :l], 1e-10))
        col = (C[:, l] - L[:, :l] @ L[l, :l]) / Lll
        L = L.at[:, l].set(jnp.where(ar > l, col, 0.0)).at[l, l].set(Lll)
        sh = L[l, :l] @ e[:l] if l else 0.0
        ah, bh = (a[l] - sh) / Lll, (b[l] - sh) / Lll
        pl = ndtr(bh) - ndtr(ah)
        pl_safe = jnp.where(pl > _TINY, pl, 1.0)
        e = e.at[l].set(
            jnp.where(pl > _TINY, (phi(ah) - phi(bh)) / pl_safe, 0.0)
        )
    return L, a, b


def mvnxpb(Sigma: Array, bounds: Array) -> Array:
    r"""Log of `P(bounds[:, 0] <= x <= bounds[:, 1])`, `x ~ N(0, Sigma)`.

    `Sigma`: `(d, d)` covariance; `bounds`: `(d, 2)`, entries may be
    `+-inf`. Returns a scalar log-probability. Batch via `jax.vmap`.
    """
    d = Sigma.shape[-1]
    sd = jnp.sqrt(jnp.clip(jnp.diagonal(Sigma), 1e-12))
    C = Sigma / (sd[:, None] * sd[None, :])
    # clip BEFORE standardizing: dividing +-inf bounds by sd would leak
    # inf * 0 = nan into the gradient w.r.t. Sigma through the chain rule
    a = jnp.clip(bounds[:, 0], -_CLIP * sd, _CLIP * sd) / sd
    b = jnp.clip(bounds[:, 1], -_CLIP * sd, _CLIP * sd) / sd

    L, a, b = _pivoted_chol(C, a, b)

    ymean = jnp.zeros(d, Sigma.dtype)
    logp = jnp.zeros((), Sigma.dtype)
    for i in range(0, d - 1, 2):
        j = i + 1
        shift_i = L[i, :i] @ ymean[:i] if i else 0.0
        shift_j = L[j, :i] @ ymean[:i] if i else 0.0
        Lii = jnp.clip(L[i, i], 1e-6)
        sj = jnp.sqrt(jnp.clip(L[j, i] ** 2 + L[j, j] ** 2, 1e-12))
        rho = L[j, i] / sj
        xl, xu = (a[i] - shift_i) / Lii, (b[i] - shift_i) / Lii
        yl, yu = (a[j] - shift_j) / sj, (b[j] - shift_j) / sj
        p, ex, ey = _rect_moments(xl, xu, yl, yu, rho)
        p_safe = jnp.where(p > _TINY, p, 1.0)
        EX = jnp.where(p > _TINY, ex / p_safe, 0.0)
        EY = jnp.where(p > _TINY, ey / p_safe, 0.0)
        # back out E[y_i], E[y_j]: X = y_i; Y = (L_ji y_i + L_jj y_j)/s_j
        Ljj = jnp.clip(L[j, j], 1e-6)
        Eyi = EX
        Eyj = (sj * EY - L[j, i] * Eyi) / Ljj
        ymean = ymean.at[i].set(Eyi).at[j].set(Eyj)
        logp = logp + jnp.where(p > _TINY, jnp.log(p_safe), jnp.log(_TINY))

    if d % 2 == 1:
        i = d - 1
        shift = L[i, :i] @ ymean[:i] if i else 0.0
        Lii = jnp.clip(L[i, i], 1e-6)
        p = jnp.clip(ndtr((b[i] - shift) / Lii) - ndtr((a[i] - shift) / Lii), 0.0)
        p_safe = jnp.where(p > _TINY, p, 1.0)
        logp = logp + jnp.where(p > _TINY, jnp.log(p_safe), jnp.log(_TINY))
    return logp


def mvn_box_prob(
    Sigma: Array, bounds: Array, mean: Array | None = None
) -> Array:
    """Convenience wrapper: `P(bounds[:,0] <= x <= bounds[:,1])` for
    `x ~ N(mean, Sigma)` (probability, not log)."""
    if mean is not None:
        bounds = bounds - mean[:, None]
    return jnp.exp(mvnxpb(Sigma, bounds))
