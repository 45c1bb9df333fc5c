r"""Linear elliptical slice sampling: exact samples from linearly
constrained Gaussians.

Counterpart of `botorch/utils/probability/lin_ess.py:48`
(`LinearEllipticalSliceSampler`, [Gessner2020lin_ess]): draws from
`N(0, I)` restricted to `{x : A x <= b}` with NO rejections — each step
moves along the ellipse `x cos(t) + v sin(t)` (with `v ~ N(0, I)`) and
samples `t` uniformly from the feasible arcs, which are computed in
closed form per constraint and intersected by endpoint sorting (static
shapes: `2 C + 1` endpoints, `lax.scan` over steps — jit/vmap-safe).

General `N(mu, Sigma)` targets reduce to this by whitening
(`x = mu + L z`, constraints `(A L) z <= b - A mu`).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array

_twopi = 2.0 * math.pi


def _feasible_measure_sampler(A: Array, b: Array, x: Array, v: Array, u: Array):
    """Sample an angle `t` uniformly from the feasible set
    `{t in [0, 2pi) : A (x cos t + v sin t) <= b}`.

    Per constraint `i`: `p cos t + q sin t <= b_i` with `p = a_i.x`,
    `q = a_i.v` — i.e. `r cos(t - phi) <= b_i`, violated on the arc
    `(phi - w, phi + w)` with `w = arccos(clip(b_i / r))` when `r > |b_i|`.
    The feasible measure is accumulated by sorting all arc endpoints.
    """
    p = A @ x
    q = A @ v
    r = jnp.sqrt(jnp.square(p) + jnp.square(q))
    phi = jnp.arctan2(q, p)
    ratio = b / jnp.maximum(r, 1e-12)
    active = ratio < 1.0  # constraint can be violated on the circle
    w = jnp.arccos(jnp.clip(ratio, -1.0, 1.0))
    w = jnp.where(active, w, 0.0)
    # forbidden arcs [lo_i, hi_i] (mod 2pi)
    lo = jnp.mod(phi - w, _twopi)
    hi = jnp.mod(phi + w, _twopi)

    C = A.shape[0]
    # event list: (angle, delta) with +1 entering a forbidden arc, -1 leaving;
    # arcs wrapping 0 are handled by an initial coverage count.
    starts = jnp.where(w > 0, lo, jnp.inf)
    ends = jnp.where(w > 0, hi, jnp.inf)
    wraps = (w > 0) & (hi < lo)
    init_cover = jnp.sum(wraps.astype(jnp.int32))

    angles = jnp.concatenate([starts, ends, jnp.asarray([_twopi])])
    deltas = jnp.concatenate(
        [jnp.ones((C,), jnp.int32), -jnp.ones((C,), jnp.int32),
         jnp.zeros((1,), jnp.int32)]
    )
    order = jnp.argsort(jnp.where(jnp.isfinite(angles), angles, _twopi + 1.0))
    ang_s = jnp.where(jnp.isfinite(angles[order]), angles[order], _twopi)
    del_s = deltas[order]

    # feasible measure of each segment [prev, ang): cover == 0
    prev = jnp.concatenate([jnp.zeros((1,)), ang_s[:-1]])
    cover_before = init_cover + jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(del_s)[:-1]]
    )
    seg_len = jnp.maximum(ang_s - prev, 0.0)
    feas_len = jnp.where(cover_before == 0, seg_len, 0.0)
    total = jnp.sum(feas_len)

    # inverse-CDF sample over the feasible segments
    target = u * total
    cum = jnp.cumsum(feas_len)
    idx = jnp.searchsorted(cum, target, side="right")
    idx = jnp.clip(idx, 0, feas_len.shape[0] - 1)
    prev_cum = jnp.where(idx > 0, cum[idx - 1], 0.0)
    t = prev[idx] + (target - prev_cum)
    # degenerate (no feasible arc, numerically): stay at t = 0 (= x itself)
    return jnp.where(total > 1e-9, t, 0.0)


@partial(jax.jit, static_argnames=("num_samples", "thinning", "burnin"))
def sample_linear_constrained_gaussian(
    A: Array,
    b: Array,
    x0: Array,
    key: Array,
    num_samples: int = 1,
    thinning: int = 4,
    burnin: int = 16,
) -> Array:
    """Draw `num_samples` exact samples from `N(0, I)` subject to
    `A x <= b`, starting from a strictly feasible `x0`."""
    d = x0.shape[-1]
    total = burnin + num_samples * thinning

    def step(x, k):
        kv, ku = jax.random.split(k)
        v = jax.random.normal(kv, (d,))
        u = jax.random.uniform(ku, ())
        t = _feasible_measure_sampler(A, b, x, v, u)
        x_new = x * jnp.cos(t) + v * jnp.sin(t)
        # safety: keep previous point if numerically infeasible
        ok = jnp.all(A @ x_new <= b + 1e-5)
        x_new = jnp.where(ok, x_new, x)
        return x_new, x_new

    keys = jax.random.split(key, total)
    _, xs = jax.lax.scan(step, x0, keys)
    return xs[burnin::thinning][:num_samples]


def sample_truncated_mvn(
    mean: Array,
    cov: Array,
    A: Array,
    b: Array,
    x0: Array,
    key: Array,
    num_samples: int = 1,
    **kwargs,
) -> Array:
    """Exact samples from `N(mean, cov)` subject to `A x <= b` by
    whitening + linear-ESS (the `TruncatedMultivariateNormal` sampling
    path of the reference)."""
    from botorch_tpu.ops.chol import psd_safe_cholesky

    L = psd_safe_cholesky(cov)
    A_w = A @ L
    b_w = b - A @ mean
    z0 = jax.scipy.linalg.solve_triangular(L, (x0 - mean)[:, None], lower=True)[:, 0]
    zs = sample_linear_constrained_gaussian(
        A_w, b_w, z0, key, num_samples=num_samples, **kwargs
    )
    return mean + zs @ L.T
