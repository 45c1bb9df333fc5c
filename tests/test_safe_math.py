"""Golden tests for the safe-math substrate (reference semantics:
`botorch/utils/safe_math.py`; test model: `test/utils/test_safe_math.py`)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from botorch_tpu.utils import safe_math as sm


def test_log1mexp_matches_naive_in_safe_range():
    x = jnp.linspace(-10.0, -0.1, 50)
    naive = np.log(1.0 - np.exp(np.asarray(x, np.float64)))
    # rtol covers TPU f32 transcendental rounding (measured 2.3e-4 on-chip)
    np.testing.assert_allclose(np.asarray(sm.log1mexp(x)), naive, rtol=5e-4)


def test_log1mexp_extreme():
    assert np.isfinite(float(sm.log1mexp(jnp.asarray(-1e-30)))) or float(
        sm.log1mexp(jnp.asarray(-1e-30))
    ) < 0
    # x -> -inf: log(1 - exp(x)) -> 0
    assert abs(float(sm.log1mexp(jnp.asarray(-100.0)))) < 1e-6


def test_log1pexp():
    x = jnp.asarray([-40.0, -1.0, 0.0, 1.0, 30.0, 100.0])
    expect = np.logaddexp(0.0, np.asarray(x, np.float64))
    np.testing.assert_allclose(np.asarray(sm.log1pexp(x)), expect, rtol=1e-5)


def test_logmeanexp():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 7)), jnp.float32)
    got = sm.logmeanexp(x, axis=-1)
    expect = np.log(np.mean(np.exp(np.asarray(x, np.float64)), axis=-1))
    # rtol+atol cover TPU f32 exp/log rounding; atol matters where
    # the log crosses zero (relative error is unbounded there)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=5e-4, atol=2e-4)


def test_logsumexp_inf_handling():
    x = jnp.asarray([[0.0, jnp.inf], [-jnp.inf, -jnp.inf]])
    out = sm.logsumexp(x, axis=-1)
    assert np.asarray(out)[0] == np.inf
    assert np.asarray(out)[1] == -np.inf


def test_logdiffexp():
    a, b = 1.0, 2.0
    got = float(sm.logdiffexp(jnp.log(jnp.asarray(a)), jnp.log(jnp.asarray(b))))
    assert abs(got - math.log(b - a)) < 1e-5


def test_smooth_amax_approaches_max():
    x = jnp.asarray([0.3, -1.0, 2.0, 1.9])
    for tau, tol in [(1e-2, 1e-2), (1e-3, 1e-3)]:
        assert abs(float(sm.smooth_amax(x, tau=tau)) - 2.0) < 3 * tol


def test_fatmax_approaches_max_and_dominates():
    x = jnp.asarray(np.random.default_rng(1).normal(size=(32,)), jnp.float32)
    fm = float(sm.fatmax(x, tau=1e-3))
    assert abs(fm - float(x.max())) < 1e-2
    assert fm >= float(x.max()) - 1e-6  # upper-bound property


def test_fatplus_upper_bounds_relu_and_has_fat_tail():
    x = jnp.linspace(-50, 5, 100)
    fp = np.asarray(sm.fatplus(x, tau=1.0))
    relu = np.maximum(np.asarray(x), 0.0)
    assert (fp >= relu - 1e-6).all()
    # Fat tail: log decays like -2 log |x|, not linearly.
    lf = float(sm.log_fatplus(jnp.asarray(-1e3), tau=1.0))
    assert lf > -20.0  # softplus would be ~ -1000


def test_fatmoid_limits():
    assert float(sm.fatmoid(jnp.asarray(50.0))) > 0.99
    assert float(sm.fatmoid(jnp.asarray(-50.0))) < 0.01
    assert abs(float(sm.fatmoid(jnp.asarray(0.0))) - 0.5) < 1e-6


def test_log_softplus_matches():
    x = jnp.asarray([-30.0, -5.0, 0.0, 3.0, 20.0])
    expect = np.log(np.log1p(np.exp(np.asarray(x, np.float64))))
    np.testing.assert_allclose(np.asarray(sm.log_softplus(x)), expect, rtol=1e-4)


def test_grads_finite_everywhere():
    import jax

    for fn in [
        sm.log1mexp,
        sm.log1pexp,
        lambda x: sm.log_fatplus(x, tau=1e-6),
        sm.log_fatmoid,
    ]:
        for v in [-1e4, -100.0, -1.0, -1e-4]:
            g = jax.grad(lambda x: jnp.sum(fn(jnp.asarray([x]))))(v)
            assert np.isfinite(float(g)), (fn, v)
