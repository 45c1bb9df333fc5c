"""Golden-value tests for input/outcome transforms and risk measures
(reference `test/models/transforms/test_input.py`,
`test/acquisition/test_risk_measures.py` patterns: hand-computed values
on tiny tensors + round-trip/gradient checks)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from botorch_tpu.acquisition.objective import (
    cvar_risk,
    expectation_risk,
    var_risk,
    worst_case_risk,
)
from botorch_tpu.models.transforms import (
    Bilog,
    ChainedInputTransform,
    InputStandardize,
    Log,
    Log10,
    Normalize,
    OneHotToNumeric,
    Power,
    Round,
    Warp,
    ste_round,
)


# ------------------------------ risk measures ------------------------------ #


def test_var_cvar_golden_values():
    # One q-point, n_w = 5 perturbation samples: values 1..5 (shuffled).
    # Reference semantics (risk_measures.py:146-253, maximization):
    #   alpha_idx = ceil(n_w * alpha) - 1
    #   VaR  = descending-sorted[alpha_idx]
    #   CVaR = mean of the (n_w - alpha_idx) smallest values
    vals = jnp.asarray([3.0, 1.0, 5.0, 2.0, 4.0])[:, None]  # (q*n_w, m=1)
    n_w = 5
    for alpha in (0.2, 0.5, 0.8, 1.0):
        alpha_idx = math.ceil(n_w * alpha) - 1
        desc = np.sort(np.asarray(vals[:, 0]))[::-1]
        var_expected = desc[alpha_idx]
        tail = np.sort(np.asarray(vals[:, 0]))[: n_w - alpha_idx]
        cvar_expected = tail.mean()
        v = var_risk(n_w, alpha=alpha)(vals[None])[0]
        c = cvar_risk(n_w, alpha=alpha)(vals[None])[0]
        np.testing.assert_allclose(np.asarray(v), var_expected, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(c), cvar_expected, rtol=1e-6)


def test_risk_measure_orderings_and_edges():
    rng = np.random.default_rng(0)
    n_w, q = 8, 3
    samples = jnp.asarray(rng.normal(size=(16, q * n_w, 1)), jnp.float32)
    var = var_risk(n_w, alpha=0.7)(samples)
    cvar = cvar_risk(n_w, alpha=0.7)(samples)
    worst = worst_case_risk(n_w)(samples)
    mean = expectation_risk(n_w)(samples)
    assert var.shape == (16, q)
    # CVaR <= VaR <= max; worst <= CVaR; mean between worst and best
    assert bool(jnp.all(cvar <= var + 1e-6))
    assert bool(jnp.all(worst <= cvar + 1e-6))
    assert bool(jnp.all(worst <= mean + 1e-6))
    # alpha=1: VaR = worst case; CVaR = worst case
    np.testing.assert_allclose(
        np.asarray(var_risk(n_w, alpha=1.0)(samples)),
        np.asarray(worst), rtol=1e-6,
    )


# ------------------------------ input transforms --------------------------- #


def test_normalize_round_trip_and_indices():
    bounds = jnp.asarray([[0.0, -2.0, 5.0], [10.0, 2.0, 15.0]])
    t = Normalize(bounds=bounds)
    X = jnp.asarray([[5.0, 0.0, 10.0], [0.0, -2.0, 5.0]])
    Xt = t.transform(X)
    np.testing.assert_allclose(np.asarray(Xt[0]), [0.5, 0.5, 0.5], atol=1e-6)
    np.testing.assert_allclose(np.asarray(t.untransform(Xt)), np.asarray(X), atol=1e-5)
    # indices restrict which dims are scaled
    t2 = Normalize(bounds=bounds, indices=(0,))
    Xt2 = t2.transform(X)
    np.testing.assert_allclose(np.asarray(Xt2[:, 1:]), np.asarray(X[:, 1:]))
    np.testing.assert_allclose(np.asarray(Xt2[:, 0]), [0.5, 0.0], atol=1e-6)


def test_input_standardize_fit_round_trip():
    rng = np.random.default_rng(1)
    X = jnp.asarray(rng.normal(3.0, 2.0, size=(64, 4)), jnp.float32)
    t = InputStandardize.fit(X)
    Xt = t.transform(X)
    assert abs(float(Xt.mean())) < 1e-5
    assert abs(float(Xt.std()) - 1.0) < 1e-2
    np.testing.assert_allclose(
        np.asarray(t.untransform(Xt)), np.asarray(X), atol=1e-4
    )


def test_round_ste_gradient_is_identity_on_integer_dims():
    t = Round(integer_indices=(1,))
    X = jnp.asarray([1.2, 2.7, 0.4])
    Xt = t.transform(X)
    np.testing.assert_allclose(np.asarray(Xt), [1.2, 3.0, 0.4], atol=1e-6)
    g = jax.grad(lambda x: jnp.sum(t.transform(x) ** 2))(X)
    # d/dx of (ste_round(x))^2 = 2 * round(x) via identity STE gradient
    np.testing.assert_allclose(np.asarray(g), [2.4, 6.0, 0.8], atol=1e-5)
    g_plain = jax.grad(lambda x: jnp.sum(ste_round(x)))(X)
    np.testing.assert_allclose(np.asarray(g_plain), 1.0)


def test_log10_and_warp_round_trips():
    t = Log10(indices=(0,))
    X = jnp.asarray([[100.0, 7.0]])
    Xt = t.transform(X)
    np.testing.assert_allclose(np.asarray(Xt), [[2.0, 7.0]], atol=5e-5)  # TPU f32 log10
    # rtol covers TPU f32 pow/log rounding (10**log10(x) on-chip)
    np.testing.assert_allclose(np.asarray(t.untransform(Xt)), np.asarray(X), rtol=5e-4)

    w = Warp(
        raw_a=jnp.log(jnp.asarray([1.5, 0.8])),
        raw_b=jnp.log(jnp.asarray([0.7, 2.0])),
    )
    X = jnp.asarray([[0.3, 0.6], [0.9, 0.1]])
    Xw = w.transform(X)
    assert bool(jnp.all((Xw > 0) & (Xw < 1)))
    np.testing.assert_allclose(
        np.asarray(w.untransform(Xw)), np.asarray(X), atol=1e-5
    )
    # Kumaraswamy CDF: monotone increasing => positive diagonal gradients
    g = jax.jacfwd(lambda x: w.transform(x[None])[0])(X[0])
    assert float(g[0, 0]) > 0 and float(g[1, 1]) > 0


def test_one_hot_to_numeric_and_chained():
    # 2 continuous dims + one categorical with 3 categories, one-hot at cols 2:5
    t = OneHotToNumeric(categorical_features=((2, 3),))
    X = jnp.asarray([[0.1, 0.2, 0.0, 1.0, 0.0], [0.5, 0.6, 0.0, 0.0, 1.0]])
    Xt = t.transform(X)
    assert Xt.shape == (2, 3)
    np.testing.assert_allclose(np.asarray(Xt[:, 2]), [1.0, 2.0])
    back = t.untransform(Xt)
    np.testing.assert_allclose(np.asarray(back), np.asarray(X), atol=1e-6)

    chain = ChainedInputTransform(
        transforms=(
            Normalize(bounds=jnp.asarray([[0.0, 0.0], [2.0, 4.0]])),
            Round(integer_indices=(0,)),
        )
    )
    X = jnp.asarray([[1.5, 2.0]])
    Xt = chain.transform(X)
    # normalize -> [0.75, 0.5]; integer dim 0 then rounds to 1.0
    np.testing.assert_allclose(np.asarray(Xt), [[1.0, 0.5]], atol=1e-6)


# ------------------------------ outcome transforms ------------------------- #


@pytest.mark.parametrize("tf,fwd", [
    (Log(), np.log),
    (Power(power=2.0), lambda y: np.power(y, 2.0)),
    (Bilog(), lambda y: np.sign(y) * np.log1p(np.abs(y))),
])
def test_outcome_transforms_round_trip(tf, fwd):
    Y = jnp.asarray([[0.5], [2.0], [4.0]])
    Yt = tf.transform(Y)
    # rtol covers TPU f32 exp/log/pow rounding (on-chip suite)
    np.testing.assert_allclose(np.asarray(Yt), fwd(np.asarray(Y)), rtol=5e-4)
    np.testing.assert_allclose(
        np.asarray(tf.untransform(Yt)), np.asarray(Y), rtol=5e-4
    )
