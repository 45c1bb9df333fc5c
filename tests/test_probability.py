"""Golden tests for stable normal special functions vs scipy float64
(reference: `botorch/utils/probability/utils.py`,
`acquisition/analytic.py:975` `_log_ei_helper`)."""

import numpy as np
import jax.numpy as jnp
import scipy.special as sps
import scipy.stats as sst

from botorch_tpu.utils import probability as pr


def test_erfcx_vs_scipy():
    x = jnp.asarray(np.linspace(-3, 30, 200), jnp.float32)
    got = np.asarray(pr.erfcx(x), np.float64)
    expect = sps.erfcx(np.asarray(x, np.float64))
    np.testing.assert_allclose(got, expect, rtol=3e-5)


def test_log_ndtr_vs_scipy():
    x = jnp.asarray(np.linspace(-30, 8, 100), jnp.float32)
    got = np.asarray(pr.log_ndtr(x), np.float64)
    expect = sst.norm.logcdf(np.asarray(x, np.float64))
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=1e-5)


def test_log_erfc_vs_scipy():
    x = jnp.asarray(np.linspace(-5, 15, 80), jnp.float32)
    got = np.asarray(pr.log_erfc(x), np.float64)
    expect = np.log(sps.erfc(np.asarray(x, np.float64)))
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=1e-5)


def test_log_ei_helper_vs_float64_reference():
    u = np.linspace(-12, 6, 200)
    phi = sst.norm.pdf(u)
    Phi = sst.norm.cdf(u)
    expect = np.log(phi + u * Phi)
    got = np.asarray(pr.log_ei_helper(jnp.asarray(u, jnp.float32)), np.float64)
    np.testing.assert_allclose(got, expect, rtol=2e-3, atol=2e-3)


def test_log_ei_helper_tail_is_finite_with_grad():
    import jax

    for v in [-50.0, -1e2, -1e4, -1e8]:
        val = float(pr.log_ei_helper(jnp.asarray(v)))
        g = float(jax.grad(lambda x: pr.log_ei_helper(x))(jnp.asarray(v)))
        assert np.isfinite(val)
        assert np.isfinite(g) and g > 0  # increasing in u


def test_log_prob_normal_in():
    a, b = -1.0, 2.0
    got = float(pr.log_prob_normal_in(jnp.asarray(a), jnp.asarray(b)))
    expect = np.log(sst.norm.cdf(b) - sst.norm.cdf(a))
    assert abs(got - expect) < 1e-5
    # deep tail
    got = float(pr.log_prob_normal_in(jnp.asarray(-20.0), jnp.asarray(-18.0)))
    expect = sst.norm.logcdf(-18.0) + np.log1p(
        -np.exp(sst.norm.logcdf(-20.0) - sst.norm.logcdf(-18.0))
    )
    assert abs(got - expect) / abs(expect) < 1e-3
