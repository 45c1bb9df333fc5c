r"""Stable standard-normal special functions for TPU (float32-first).

Implements the numerics that the reference obtains from torch's C++ special
functions (`botorch/utils/probability/utils.py:128-258`): `ndtr`, `phi`,
`log_phi`, `log_ndtr`, `log_erfc`, `log_erfcx`, `log_prob_normal_in`, and the
analytic-(Log)EI helpers `_ei_helper` / `_log_ei_helper`
(`botorch/acquisition/analytic.py:944-1060`).

JAX has no `erfcx`, so one is built here from `erfc` for moderate arguments
and an 8-term asymptotic continued series for the tail — accurate to ~1e-7
relative in float32 across the full range, which is what the LogEI gradient
path needs. Everything is elementwise and `where`-guarded: no data-dependent
control flow, safe under `jit`/`vmap`/`grad`.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from botorch_tpu.utils.safe_math import log1mexp

Array = jax.Array

_inv_sqrt_2 = math.sqrt(0.5)
_neg_inv_sqrt_2 = -_inv_sqrt_2
_inv_sqrt_2pi = 1.0 / math.sqrt(2.0 * math.pi)
_log_sqrt_2pi = math.log(2.0 * math.pi) / 2.0
_log_2 = math.log(2.0)
_log_sqrt_pi_div_2 = math.log(math.pi / 2.0) / 2.0
_sqrt_pi = math.sqrt(math.pi)


def ndtr(x: Array) -> Array:
    """Standard normal CDF `Phi(x)`."""
    return 0.5 * jax.scipy.special.erfc(_neg_inv_sqrt_2 * x)


def phi(x: Array) -> Array:
    """Standard normal PDF."""
    return _inv_sqrt_2pi * jnp.exp(-0.5 * jnp.square(x))


def log_phi(x: Array) -> Array:
    """Log of the standard normal PDF."""
    return -0.5 * jnp.square(x) - _log_sqrt_2pi


def erfcx(x: Array) -> Array:
    """Scaled complementary error function `exp(x^2) * erfc(x)`.

    Direct evaluation for `x <= 6` (both factors representable in float32
    there); 8-term asymptotic series `1/(x sqrt(pi)) * sum (-1)^n (2n-1)!! /
    (2 x^2)^n` beyond (relative error < 3e-9 at the crossover). Valid for
    all real `x`; for very negative `x` it overflows exactly as the true
    function does.
    """
    x = jnp.asarray(x)
    direct_ok = x <= 6.0
    x_direct = jnp.where(direct_ok, x, 0.0)
    direct = jnp.exp(jnp.square(x_direct)) * jax.scipy.special.erfc(x_direct)

    x_tail = jnp.where(direct_ok, 6.0, x)
    z = 0.5 / jnp.square(x_tail)  # series variable: (2x^2)^-1
    # Horner evaluation of 1 - z + 3z^2 - 15z^3 + 105z^4 - 945z^5 + 10395z^6
    #   - 135135z^7 with coefficients (2n-1)!!.
    series = 1.0 + z * (-1.0 + z * (3.0 + z * (-15.0 + z * (105.0 + z * (
        -945.0 + z * (10395.0 - z * 135135.0))))))
    tail = series / (x_tail * _sqrt_pi)
    return jnp.where(direct_ok, direct, tail)


def log_erfc(x: Array) -> Array:
    """Stable `log(erfc(x))` (reference `probability/utils.py:169-193`)."""
    is_pos = x > 0
    x_pos = jnp.where(is_pos, x, 0.0)
    x_neg = jnp.where(is_pos, 0.0, x)
    return jnp.where(
        is_pos,
        jnp.log(erfcx(x_pos)) - jnp.square(x_pos),
        jnp.log(jax.scipy.special.erfc(x_neg)),
    )


def log_erfcx(x: Array) -> Array:
    """Stable `log(erfcx(x))` (reference `probability/utils.py:196-216`)."""
    is_pos = x > 0
    x_pos = jnp.where(is_pos, x, 0.0)
    x_neg = jnp.where(is_pos, 0.0, x)
    return jnp.where(
        is_pos,
        jnp.log(erfcx(x_pos)),
        jnp.log(jax.scipy.special.erfc(x_neg)) + jnp.square(x),
    )


def log_ndtr(x: Array) -> Array:
    """Stable `log(Phi(x))` with usable gradients for large negative `x`."""
    return log_erfc(_neg_inv_sqrt_2 * x) - _log_2


def standard_normal_log_hazard(x: Array) -> Array:
    """`log(phi(x) / Phi(-x))` (reference `probability/utils.py:219-230`)."""
    log_two_inv_sqrt_2pi = math.log(2.0 * _inv_sqrt_2pi)
    return log_two_inv_sqrt_2pi - log_erfcx(_inv_sqrt_2 * x)


def log_prob_normal_in(a: Array, b: Array) -> Array:
    r"""`log(Phi(b) - Phi(a))` for `a < b`, stable over huge ranges.

    Mirrors the tail-reversal trick of the reference
    (`probability/utils.py:233-258`): when `|b| > |a|`, use
    `Phi(b) - Phi(a) = Phi(-a) - Phi(-b)` so the difference is taken in the
    well-behaved left tail of `log_ndtr`.
    """
    a, b = jnp.broadcast_arrays(a, b)
    rev = jnp.abs(b) > jnp.abs(a)
    a2 = jnp.where(rev, -b, a)
    b2 = jnp.where(rev, -a, b)
    return log1mexp(
        jnp.minimum(log_ndtr(a2) - log_ndtr(b2), 0.0)
    ) + log_ndtr(b2)


def ei_helper(u: Array) -> Array:
    """`phi(u) + u * Phi(u)` — EI in units of the posterior stddev."""
    return phi(u) + u * ndtr(u)


def _log_abs_u_Phi_div_phi(u: Array) -> Array:
    """`log(|u| * Phi(u) / phi(u))` for `u < 0`.

    Uses `Phi(u)/phi(u) = sqrt(pi/2) * erfcx(-u/sqrt(2))` and keeps `|u|`
    inside the single logarithm for accuracy
    (reference `analytic.py:1024-1045`).
    """
    return jnp.log(erfcx(_neg_inv_sqrt_2 * u) * jnp.abs(u)) + _log_sqrt_pi_div_2


def log_ei_helper(u: Array) -> Array:
    """Stable `log(phi(u) + u * Phi(u))`, differentiable for u in [-1e20, 1e20]
    (float32), following [Ament2023logei] / reference `analytic.py:975-1022`.
    """
    u = jnp.asarray(u)
    bound = -1.0
    neg_inv_sqrt_eps = -1e6 if u.dtype == jnp.float64 else -1e3

    # Branch 1 (u > -1): naive formula in log space is accurate.
    u_upper = jnp.maximum(u, bound)
    log_ei_upper = jnp.log(ei_helper(u_upper))

    # Branch 2 (u <= -1): log(phi(u)) + log(1 - exp(w)),
    #   w = log(|u| Phi(u) / phi(u)) < 0.
    u_lower = jnp.minimum(u, bound)
    u_eps = jnp.maximum(u_lower, neg_inv_sqrt_eps)
    w = jnp.minimum(_log_abs_u_Phi_div_phi(u_eps), -jnp.finfo(u.dtype).tiny)
    log_ei_lower = log_phi(u) + jnp.where(
        u > neg_inv_sqrt_eps,
        log1mexp(w),
        # Leading order of log1mexp(w) for extremely negative u.
        -2.0 * jnp.log(jnp.abs(u_lower)),
    )
    return jnp.where(u > bound, log_ei_upper, log_ei_lower)
