"""Tests: penalized acquisition/objective family (reference
`acquisition/penalized.py`) and multi-output MC objectives / risk
measures (`acquisition/multi_objective/objective.py`,
`multi_output_risk_measures.py`)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from botorch_tpu.acquisition.monte_carlo import (
    make_mc_acqf,
    qExpectedImprovement,
)
from botorch_tpu.acquisition.objective import (
    feasibility_weighted_mo_objective,
    identity_mo_objective,
    independent_cvar,
    independent_var,
    multi_output_expectation,
    multi_output_worst_case,
    weighted_mo_objective,
)
from botorch_tpu.acquisition.wrappers import (
    PenalizedAcquisitionFunction,
    gaussian_penalty,
    group_lasso_penalty,
    group_lasso_regularizer,
    l0_approximation,
    l0_penalty_approx,
    l0_penalty_approx_objective,
    l1_penalty,
    l1_penalty_objective,
    l2_penalty,
    narrow_gaussian,
    nnz_approx,
    penalized_mc_objective,
)
from botorch_tpu.models.gp import make_gp


@functools.lru_cache(maxsize=2)
def _model(seed=0, n=12, d=3):
    rng = np.random.default_rng(seed)
    X = jnp.asarray(rng.uniform(size=(n, d)), jnp.float32)
    Y = jnp.asarray(np.sin(3 * np.asarray(X)).sum(-1), jnp.float32)
    return make_gp(X, Y[:, None]), X, Y


# ---------------------------------------------------------------------- #
# penalties (acqf level)
# ---------------------------------------------------------------------- #
def test_l2_l1_gaussian_penalties_max_over_q():
    X = jnp.asarray([[[0.0, 0.0], [3.0, 4.0]]])  # (1, q=2, d=2)
    x0 = jnp.zeros(2)
    np.testing.assert_allclose(np.asarray(l2_penalty(x0)(X)), [25.0])
    np.testing.assert_allclose(np.asarray(l1_penalty(x0)(X)), [7.0])
    g = gaussian_penalty(x0, sigma=2.0)(X)
    np.testing.assert_allclose(np.asarray(g), [np.exp(25.0 / 8.0)], rtol=1e-6)


def test_group_lasso_matches_manual():
    X = jnp.asarray([[1.0, 2.0, 2.0, 3.0]])  # one point, d=4
    groups = [[0, 1], [2, 3]]
    val = group_lasso_regularizer(X, groups)
    expect = np.sqrt(2) * np.sqrt(5.0) + np.sqrt(2) * np.sqrt(13.0)
    np.testing.assert_allclose(np.asarray(val), [expect], rtol=1e-6)
    # q=1 acqf-level penalty subtracts the init point
    pen = group_lasso_penalty(jnp.zeros(4), groups)
    np.testing.assert_allclose(
        np.asarray(pen(X[:, None, :])), [expect], rtol=1e-6
    )


def test_l0_approximation_limits():
    # far from the target, relaxed L0 -> d; at the target -> 0
    tgt = jnp.zeros(3)
    far = nnz_approx(jnp.full((1, 3), 100.0), tgt, 0.5)
    np.testing.assert_allclose(np.asarray(far), [[3.0]], atol=1e-6)
    near = l0_approximation(tgt)(jnp.zeros((1, 3)))
    np.testing.assert_allclose(np.asarray(near), [[0.0]], atol=1e-6)
    # acqf-level: min over q
    pen = l0_penalty_approx(tgt, a=0.5)
    X = jnp.stack([jnp.zeros((1, 3)), jnp.full((1, 3), 100.0)], axis=1)
    np.testing.assert_allclose(np.asarray(pen(X)), [0.0], atol=1e-6)
    assert narrow_gaussian(jnp.zeros(2), 1.0).shape == (2,)


def test_penalized_acqf_subtracts_scaled_penalty():
    model, X, Y = _model()
    acqf = make_mc_acqf(
        qExpectedImprovement, model, q=1, num_samples=64,
        best_f=float(Y.max()),
    )
    pen = l2_penalty(jnp.zeros(3))
    wrapped = PenalizedAcquisitionFunction(
        acqf=acqf, penalty=pen, regularization_parameter=0.3
    )
    Xc = jnp.asarray([[0.4, 0.5, 0.6]], jnp.float32)
    raw = float(acqf(Xc))
    got = float(wrapped(Xc))
    np.testing.assert_allclose(got, raw - 0.3 * float(pen(Xc)), rtol=1e-5)


def test_penalized_mc_objective_needs_X_path():
    model, X, Y = _model()
    pen_obj = l1_penalty_objective(jnp.zeros(3))
    obj = penalized_mc_objective(
        lambda s: s[..., 0], pen_obj, regularization_parameter=0.5
    )
    assert obj.needs_X
    acqf = make_mc_acqf(
        qExpectedImprovement, model, q=1, num_samples=64,
        best_f=float(Y.max()), objective=obj,
    )
    base = make_mc_acqf(
        qExpectedImprovement, model, q=1, num_samples=64,
        best_f=float(Y.max()),
    )
    Xnear = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    Xfar = jnp.asarray([[1.0, 1.0, 1.0]], jnp.float32)
    # at the init point the penalty vanishes: values agree
    np.testing.assert_allclose(float(acqf(Xnear)), float(base(Xnear)), rtol=1e-5)
    # away from it the penalized value is no larger
    assert float(acqf(Xfar)) <= float(base(Xfar)) + 1e-6
    # objective-level L0 penalty has the (1, ..., q) layout too
    pen0 = l0_penalty_approx_objective(jnp.zeros(3))
    assert pen0(jnp.zeros((4, 2, 3))).shape == (1, 4, 2)


# ---------------------------------------------------------------------- #
# multi-output objectives / risk measures
# ---------------------------------------------------------------------- #
def test_identity_and_weighted_mo_objectives():
    s = jnp.arange(24.0).reshape(2, 4, 3)
    np.testing.assert_array_equal(
        np.asarray(identity_mo_objective()(s)), np.asarray(s)
    )
    np.testing.assert_array_equal(
        np.asarray(identity_mo_objective((2, 0))(s)), np.asarray(s[..., [2, 0]])
    )
    w = jnp.asarray([1.0, -1.0, 2.0])
    np.testing.assert_allclose(
        np.asarray(weighted_mo_objective(w)(s)), np.asarray(s * w)
    )


def test_feasibility_weighted_mo_objective():
    s = jnp.ones((8, 2, 2)) * 5.0
    # constraint: feasible iff first output <= 0 -> infeasible here
    infeas = feasibility_weighted_mo_objective(
        (lambda smp: smp[..., 0],), infeasible_cost=10.0, eta=1e-4
    )(s)
    np.testing.assert_allclose(np.asarray(infeas), -10.0, atol=1e-3)
    feas = feasibility_weighted_mo_objective(
        (lambda smp: -smp[..., 0],), infeasible_cost=10.0, eta=1e-4
    )(s)
    np.testing.assert_allclose(np.asarray(feas), 5.0, atol=1e-3)


def test_independent_mo_risk_measures():
    # q=1, n_w=4 perturbations, m=2 outputs; samples (1, 4, 2)
    vals = jnp.asarray([[1.0, 10.0], [2.0, 40.0], [3.0, 20.0], [4.0, 30.0]])
    s = vals[None]
    exp = multi_output_expectation(4)(s)
    np.testing.assert_allclose(np.asarray(exp), [[[2.5, 25.0]]])
    wc = multi_output_worst_case(4)(s)
    np.testing.assert_allclose(np.asarray(wc), [[[1.0, 10.0]]])
    # alpha=0.75 -> VaR index picks the 1-alpha quantile from below
    var = independent_var(4, alpha=0.75)(s)
    np.testing.assert_allclose(np.asarray(var), [[[2.0, 20.0]]])
    cvar = independent_cvar(4, alpha=0.75)(s)
    np.testing.assert_allclose(np.asarray(cvar), [[[1.5, 15.0]]])
