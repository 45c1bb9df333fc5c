"""Warp input-transform fitting (reference
`models/transforms/input.py:922-1008`: Kumaraswamy concentrations are
parameters with LogNormal priors optimized jointly with the GP inside
`fit_gpytorch_mll`). Round-2 gap: the Warp class existed but nothing ever
optimized it — `fit_transformed_gp` closes that."""

import jax
import jax.numpy as jnp
import numpy as np

from botorch_tpu.fit import fit_gp, fit_transformed_gp
from botorch_tpu.models.gp import make_gp
from botorch_tpu.models.transforms import TransformedModel, Warp


def _warped_data(n=40, seed=0):
    """y is smooth in the WARPED coordinate w(x) = 1 - (1 - x^a)^b with
    a=3.0, b=0.5 — strongly non-stationary in raw x."""
    rng = np.random.default_rng(seed)
    X = jnp.asarray(rng.uniform(size=(n, 1)), jnp.float32)
    true = Warp(raw_a=jnp.log(jnp.asarray([3.0])), raw_b=jnp.log(jnp.asarray([0.5])))
    W = true.transform(X)
    Y = jnp.sin(6.0 * W[:, :1]) + 0.02 * jnp.asarray(
        rng.normal(size=(n, 1)), jnp.float32
    )
    return X, Y


def test_fitted_warp_beats_unfitted():
    X, Y = _warped_data()
    key = jax.random.PRNGKey(0)

    # (a) identity-initialized Warp, never fitted: GP params fitted only
    warp0 = Warp.init(1)
    base0 = make_gp(warp0.transform(X), Y)
    unfitted = TransformedModel(
        model=fit_gp(base0, key, num_restarts=4, maxiter=60),
        input_transform=warp0,
    )
    # (b) joint fit of warp + GP
    fitted = fit_transformed_gp(
        TransformedModel(model=base0, input_transform=warp0),
        key, num_restarts=4, maxiter=60, X_raw=X,
    )

    mll_unfitted = float(unfitted.model.mll())
    mll_fitted = float(fitted.model.mll())
    assert mll_fitted > mll_unfitted + 0.1, (mll_fitted, mll_unfitted)
    # learned concentrations moved materially away from identity toward
    # the generating warp's direction (a > 1, b < 1)
    a = float(fitted.input_transform.a[0])
    b = float(fitted.input_transform.b[0])
    assert a > 1.2 and b < 0.9, (a, b)


def test_fitted_warp_posterior_works():
    X, Y = _warped_data(seed=1)
    warp0 = Warp.init(1)
    base0 = make_gp(warp0.transform(X), Y)
    fitted = fit_transformed_gp(
        TransformedModel(model=base0, input_transform=warp0),
        jax.random.PRNGKey(1), num_restarts=2, maxiter=40, X_raw=X,
    )
    Xq = jnp.linspace(0.05, 0.95, 7)[:, None]
    post = fitted.posterior(Xq)
    assert post.mean.shape == (7, 1)
    assert np.isfinite(np.asarray(post.mean)).all()
    assert (np.asarray(post.variance) > 0).all()
    # in-sample prediction error is small after the joint fit
    pin = fitted.posterior(X).mean
    assert float(jnp.max(jnp.abs(pin - Y))) < 0.35
