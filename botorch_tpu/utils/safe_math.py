r"""Numerically safe log-space math for TPU (float32-first).

These functions underpin the LogEI acquisition family: smooth, fat-tailed
approximations to `max`/`ReLU`/`Heaviside` whose *logarithms* decay
polynomially instead of exponentially, so gradients propagate through the
acquisition surface even far from the incumbent.

Semantics follow the reference's `botorch/utils/safe_math.py` (BoTorch
0.11.3); all implementations here are independent JAX code designed for
XLA fusion on TPU VPUs: every function is elementwise-or-reduction only,
built from `where`-guarded primitives so it is `jit`/`vmap`/`grad`-safe
with no data-dependent control flow.
"""

from __future__ import annotations

import math
from typing import Sequence, Union

import jax
import jax.numpy as jnp

Array = jax.Array

_log2 = math.log(2.0)
_inv_sqrt_3 = math.sqrt(1.0 / 3.0)

TAU = 1.0  # default temperature for smooth non-linearities
ALPHA = 2.0  # default asymptotic power-decay exponent of `_pareto`

Dim = Union[int, Sequence[int]]


def log1mexp(x: Array) -> Array:
    """Accurate `log(1 - exp(x))` for `x < 0` [Maechler2012accurate].

    Uses `log(-expm1(x))` for `-log(2) < x < 0` and `log1p(-exp(x))`
    otherwise; both branches are evaluated with masked-safe inputs so the
    gradient is finite everywhere.
    """
    is_small = -_log2 < x
    # Guard each branch's input so the untaken branch can't produce NaN grads.
    x_small = jnp.where(is_small, x, -_log2)
    x_large = jnp.where(is_small, -_log2, x)
    return jnp.where(
        is_small,
        jnp.log(-jnp.expm1(x_small)),
        jnp.log1p(-jnp.exp(x_large)),
    )


def log1pexp(x: Array) -> Array:
    """Accurate `log(1 + exp(x))` (softplus) [Maechler2012accurate]."""
    mask = x <= 18.0
    x_small = jnp.where(mask, x, 0.0)
    x_large = jnp.where(mask, 0.0, x)
    return jnp.where(mask, jnp.log1p(jnp.exp(x_small)), x_large + jnp.exp(-x_large))


def logexpit(x: Array) -> Array:
    """`log(sigmoid(x))`."""
    return -log1pexp(-x)


def logplusexp(a: Array, b: Array) -> Array:
    """`log(exp(a) + exp(b))`, elementwise."""
    a, b = jnp.broadcast_arrays(a, b)
    return logsumexp(jnp.stack([a, b], axis=-1), axis=-1)


def logdiffexp(log_a: Array, log_b: Array) -> Array:
    """`log(b - a)` given `log_a <= log_b` (i.e. `0 < a <= b`)."""
    log_a, log_b = jnp.broadcast_arrays(log_a, log_b)
    is_inf = log_b == -jnp.inf  # implies log_a == -inf by assumption
    safe_log_b = jnp.where(is_inf, 0.0, log_b)
    return log_b + log1mexp(jnp.minimum(log_a - safe_log_b, 0.0))


def _normalize_dim(x: Array, axis: Dim) -> tuple[int, ...]:
    if isinstance(axis, int):
        axis = (axis,)
    return tuple(a % x.ndim for a in axis)


def _inf_max_helper(max_fun, x: Array, axis: Dim, keepdims: bool) -> Array:
    """Generalized inf-aware smooth max (reference `safe_math._inf_max_helper`).

    Ensures well-behaved values and gradients when slices contain +/-inf:
    +inf elements dominate exactly (gradient 1); all-(-inf) slices return
    -inf without NaN gradients.
    """
    axes = _normalize_dim(x, axis)
    m = jnp.max(x, axis=axes, keepdims=True)
    is_inf_max = jnp.isinf(m) & (x == m)
    has_inf_max = jnp.any(is_inf_max, axis=axes, keepdims=True)

    y_inf = jnp.where(is_inf_max, x, 0.0)
    m_no_inf = jnp.where(jnp.isinf(m), 0.0, m)
    y_no_inf = jnp.where(has_inf_max, 0.0, x) - m_no_inf
    res = jnp.where(
        has_inf_max,
        jnp.sum(y_inf, axis=axes, keepdims=True),
        m_no_inf + max_fun(y_no_inf, axes, True),
    )
    if keepdims:
        return res
    return jnp.squeeze(res, axis=axes)


def logsumexp(x: Array, axis: Dim = -1, keepdims: bool = False) -> Array:
    """Inf-robust `logsumexp` (gradient 1 at +inf; finite grad on all-(-inf))."""

    def _lse(y, axes, kd):
        return jnp.log(jnp.sum(jnp.exp(y), axis=axes, keepdims=kd))

    return _inf_max_helper(_lse, x=x, axis=axis, keepdims=keepdims)


def logmeanexp(x: Array, axis: Dim = -1, keepdims: bool = False) -> Array:
    """`log(mean(exp(x), axis))`, inf-robust."""
    axes = _normalize_dim(x, axis)
    n = math.prod(x.shape[a] for a in axes)
    return logsumexp(x, axis=axes, keepdims=keepdims) - math.log(n)


def smooth_amax(
    x: Array, axis: Dim = -1, keepdims: bool = False, tau: float = 1.0
) -> Array:
    """`tau * logsumexp(x / tau, axis)` — smooth max, tighter as tau -> 0."""
    return logsumexp(x / tau, axis=axis, keepdims=keepdims) * tau


def smooth_amin(
    x: Array, axis: Dim = -1, keepdims: bool = False, tau: float = 1.0
) -> Array:
    """Smooth approximation to `min(x, axis)`."""
    return -smooth_amax(-x, axis=axis, keepdims=keepdims, tau=tau)


def log_softplus(x: Array, tau: float = TAU) -> Array:
    """Accurate `log(softplus(x / tau) * tau)`.

    For very negative `x / tau`, `softplus(z) ~ exp(z)` so
    `log(softplus(z)) ~ z`; the crossover mirrors the reference's float32
    cutoffs (`safe_math.py:227-248`).
    """
    z = jnp.asarray(x) / tau
    lower = -15.0 if jnp.asarray(x).dtype == jnp.float32 else -35.0
    mask = z > lower
    z_safe = jnp.where(mask, z, lower)
    return jnp.where(mask, jnp.log(log1pexp(z_safe)) + math.log(tau), z + math.log(tau))


def cauchy(x: Array) -> Array:
    """Lorentzian (unnormalized Cauchy density): `1 / (1 + x^2)`."""
    return 1.0 / (1.0 + jnp.square(x))


def fatplus(x: Array, tau: float = TAU) -> Array:
    """Fat-tailed smooth ReLU: `tau * (softplus(x/tau) + 0.1 * cauchy(x/tau))`.

    The Cauchy component gives `O(1/x^2)` decay as `x -> -inf` so
    `log(fatplus)` has polynomially decaying gradients (LogEI family).
    Coefficient 0.1 preserves monotonicity and convexity
    (reference `safe_math.py:305-324`).
    """
    alpha = 1e-1
    z = x / tau
    return tau * (log1pexp(z) + alpha * cauchy(z))


def log_fatplus(x: Array, tau: float = TAU) -> Array:
    """`log(fatplus(x, tau))`."""
    return jnp.log(fatplus(x, tau=tau))


def _pareto(x: Array, alpha: float = ALPHA) -> Array:
    """Monotone rational decay: 1 at 0, unit 1st/2nd derivatives, `O(x^-alpha)`.

    (Reference `safe_math.py:455-489`.) `x` must be non-negative.
    """
    half = alpha / 2.0
    beta_1 = 2.0 * half
    beta_0 = half * beta_1
    return jnp.power(beta_0 / (beta_0 + beta_1 * x + jnp.square(x)), half)


def fatmax(
    x: Array,
    axis: Dim = -1,
    keepdims: bool = False,
    tau: float = TAU,
    alpha: float = ALPHA,
) -> Array:
    """Fat-tailed smooth `amax(x, axis)` with `O(1/x^alpha)` tails."""

    def max_fun(y, axes, kd):
        return tau * jnp.log(jnp.sum(_pareto(-y / tau, alpha=alpha), axis=axes, keepdims=kd))

    return _inf_max_helper(max_fun=max_fun, x=x, axis=axis, keepdims=keepdims)


def fatmin(
    x: Array,
    axis: Dim = -1,
    keepdims: bool = False,
    tau: float = TAU,
    alpha: float = ALPHA,
) -> Array:
    """Fat-tailed smooth `amin(x, axis)`."""
    return -fatmax(-x, axis=axis, keepdims=keepdims, tau=tau, alpha=alpha)


def fatmaximum(a: Array, b: Array, tau: float = TAU, alpha: float = ALPHA) -> Array:
    """Fat-tailed smooth elementwise `maximum(a, b)`."""
    a, b = jnp.broadcast_arrays(a, b)
    return fatmax(jnp.stack([a, b], axis=-1), axis=-1, tau=tau, alpha=alpha)


def fatminimum(a: Array, b: Array, tau: float = TAU, alpha: float = ALPHA) -> Array:
    """Fat-tailed smooth elementwise `minimum(a, b)`."""
    return -fatmaximum(-a, -b, tau=tau, alpha=alpha)


def fatmoid(x: Array, tau: float = 1.0) -> Array:
    """Twice-differentiable fat-tailed Heaviside approximation.

    `O(1/x^2)` tails on both sides; inflection at `x = +/- 1/sqrt(3)`
    (reference `safe_math.py:424-447`).
    """
    z = x / tau
    m = _inv_sqrt_3
    return jnp.where(
        z < 0,
        2.0 / 3.0 * cauchy(z - m),
        1.0 - 2.0 / 3.0 * cauchy(z + m),
    )


def log_fatmoid(x: Array, tau: float = 1.0) -> Array:
    """`log(fatmoid(x, tau))`."""
    return jnp.log(fatmoid(x, tau=tau))


def sigmoid(x: Array, log: bool = False, fat: bool = False) -> Array:
    """(Log-)sigmoid with optional fat tail (reference `safe_math.py:492-509`)."""
    y = log_fatmoid(x) if fat else logexpit(x)
    return y if log else jnp.exp(y)
