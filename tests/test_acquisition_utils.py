"""Tests: general acquisition helpers (reference `acquisition/utils.py`
`compute_best_feasible_objective :90`, `get_infeasible_cost :203`,
`project_to_target_fidelity :352`, `expand_trace_observations :415`,
`project_to_sample_points :468`, `get_optimal_samples :487`,
`repeat_to_match_aug_dim :44`)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from botorch_tpu.acquisition.monte_carlo import make_mc_acqf, qLogNoisyExpectedImprovement
from botorch_tpu.acquisition.utils import (
    compute_best_feasible_objective,
    compute_feasibility_indicator,
    expand_trace_observations,
    get_infeasible_cost,
    get_optimal_samples,
    get_X_baseline,
    project_to_sample_points,
    project_to_target_fidelity,
    repeat_to_match_aug_dim,
)
from botorch_tpu.fit import fit_gp
from botorch_tpu.models.gp import make_gp


@functools.lru_cache(maxsize=2)
def _model(seed=0, n=14, d=2):
    rng = np.random.default_rng(seed)
    X = jnp.asarray(rng.uniform(size=(n, d)), jnp.float32)
    Y = jnp.asarray(np.sin(4 * np.asarray(X)).sum(-1), jnp.float32)
    model = fit_gp(make_gp(X, Y[:, None]), jax.random.PRNGKey(seed),
                   num_restarts=2, maxiter=25)
    return model, X, Y


def test_repeat_to_match_aug_dim():
    t = jnp.arange(6.0).reshape(2, 3)
    r = jnp.zeros((6, 3))
    out = repeat_to_match_aug_dim(t, r)
    assert out.shape == (6, 3)
    np.testing.assert_array_equal(np.asarray(out[:2]), np.asarray(t))
    np.testing.assert_array_equal(np.asarray(out[2:4]), np.asarray(t))
    # matching leading dims pass through
    assert repeat_to_match_aug_dim(t, jnp.zeros((2, 3))) is t


def test_best_feasible_objective_paths():
    samples = jnp.asarray([[[1.0], [2.0], [3.0]]])  # (1 sample, q=3, m=1)
    obj = samples[..., 0]
    # unconstrained: plain max
    np.testing.assert_allclose(
        np.asarray(compute_best_feasible_objective(samples, obj, None)), [3.0]
    )
    # constraint feasible iff y <= 2.5: best feasible is 2
    c = (lambda s: s[..., 0] - 2.5,)
    np.testing.assert_allclose(
        np.asarray(compute_best_feasible_objective(samples, obj, c)), [2.0]
    )
    ind = compute_feasibility_indicator(c, samples)
    np.testing.assert_array_equal(np.asarray(ind), [[True, True, False]])
    # nothing feasible: explicit fallback
    c_bad = (lambda s: jnp.ones_like(s[..., 0]),)
    np.testing.assert_allclose(
        np.asarray(
            compute_best_feasible_objective(samples, obj, c_bad, infeasible_obj=-7.0)
        ),
        [-7.0],
    )


def test_best_feasible_objective_model_fallback():
    model, X, Y = _model()
    samples = jnp.ones((4, 2, 1))
    obj = samples[..., 0]
    c_bad = (lambda s: jnp.ones_like(s[..., 0]),)
    val = compute_best_feasible_objective(
        samples, obj, c_bad, model=model, X_baseline=X
    )
    # the inferred fallback is the (clamped, as in the reference) 6-sigma
    # lower bound: never above zero, and below every sample objective (1.0)
    assert float(val.max()) <= 0.0
    M = get_infeasible_cost(X, model)
    assert M.shape == (1,)
    assert float(M[0]) >= -float(Y.min())  # -M <= min f


def test_project_to_target_fidelity():
    X = jnp.asarray([[[0.2, 0.3, 0.4], [0.5, 0.6, 0.7]]])
    # default: last column -> 1.0
    P = project_to_target_fidelity(X)
    np.testing.assert_allclose(np.asarray(P[..., -1]), 1.0)
    np.testing.assert_allclose(np.asarray(P[..., :2]), np.asarray(X[..., :2]))
    # explicit column + value
    P2 = project_to_target_fidelity(X, {1: 0.5})
    np.testing.assert_allclose(np.asarray(P2[..., 1]), 0.5)
    # insertion mode: X lacks the fidelity column
    P3 = project_to_target_fidelity(X[..., :2], {2: 1.0}, d=3)
    np.testing.assert_allclose(np.asarray(P3), np.asarray(P))


def test_expand_trace_observations():
    X = jnp.asarray([[[0.1, 0.8], [0.9, 0.4]]])  # (1, q=2, d=2), fid=last
    E = expand_trace_observations(X, num_trace_obs=2)
    assert E.shape == (1, 6, 2)
    np.testing.assert_allclose(np.asarray(E[:, :2]), np.asarray(X))
    # non-fidelity column is copied unchanged
    np.testing.assert_allclose(
        np.asarray(E[:, 2::1, 0]),
        np.asarray(jnp.tile(X[..., 0], (1, 2))),
    )
    # fidelities scale by 2/3 then 1/3
    np.testing.assert_allclose(
        np.asarray(E[:, 2:4, 1]), np.asarray(X[..., 1]) * (2.0 / 3.0), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(E[:, 4:6, 1]), np.asarray(X[..., 1]) * (1.0 / 3.0), rtol=1e-6
    )
    assert expand_trace_observations(X, num_trace_obs=0) is X


def test_project_to_sample_points():
    X = jnp.asarray([[[0.2, 0.3, 0.9]]])  # (1, 1, 3)
    pts = jnp.asarray([[0.0], [0.5], [1.0]])  # p=3, d'=1
    P = project_to_sample_points(X, pts)
    assert P.shape == (1, 3, 3)
    np.testing.assert_allclose(np.asarray(P[..., -1]), [[0.0, 0.5, 1.0]])
    np.testing.assert_allclose(
        np.asarray(P[..., :2]), np.asarray([[[0.2, 0.3]] * 3]), rtol=1e-6
    )


def test_get_optimal_samples_near_posterior_max():
    model, X, Y = _model()
    bounds = jnp.stack([jnp.zeros(2), jnp.ones(2)])
    xs, fs = get_optimal_samples(
        model, bounds, num_optima=4, key=jax.random.PRNGKey(3),
        raw_samples=128, num_restarts=2,
    )
    assert xs.shape == (4, 2) and fs.shape == (4,)
    # each pathwise optimum should be at least the best observed value
    # minus sampling noise slack
    assert float(fs.min()) > float(Y.max()) - 2.0
    # minimize flag flips the sign of the search
    xs2, fs2 = get_optimal_samples(
        model, bounds, num_optima=2, key=jax.random.PRNGKey(4),
        raw_samples=128, num_restarts=2, maximize=False,
    )
    assert float(fs2.max()) < float(fs.max())


def test_get_X_baseline_extraction():
    model, X, Y = _model()
    acqf = make_mc_acqf(
        qLogNoisyExpectedImprovement, model, q=1, num_samples=32, X_baseline=X
    )
    Xb = get_X_baseline(acqf)
    assert Xb is not None and Xb.shape == X.shape
