"""Tests: optimize_acqf variants, stopping, homotopy, sampling utils,
acquisition wrappers, risk measures."""

import jax
import jax.numpy as jnp
import numpy as np

from botorch_tpu.acquisition.objective import (
    chebyshev_scalarization,
    cvar_risk,
    expectation_risk,
    var_risk,
    worst_case_risk,
)
from botorch_tpu.acquisition.wrappers import (
    CostAwareAcquisitionFunction,
    FixedFeatureAcquisitionFunction,
    PenalizedAcquisitionFunction,
    ProximalAcquisitionFunction,
    l1_penalty,
    l2_penalty,
)
from botorch_tpu.optim.optimize import optimize_acqf
from botorch_tpu.optim.variants import (
    ExpMAStoppingCriterion,
    log_linear_schedule,
    optimize_acqf_discrete_local_search,
    optimize_acqf_homotopy,
    optimize_acqf_mixed,
)
from botorch_tpu.utils.sampling import (
    batched_multinomial,
    find_interior_point,
    get_polytope_samples,
    sample_hypersphere,
    sample_polytope,
    sample_simplex,
)

TARGET = jnp.asarray([0.3, 0.7, 0.5])


def quad(X):
    return jnp.sum(1.0 - jnp.sum((X - TARGET) ** 2, -1))


def test_sample_hypersphere_and_simplex():
    key = jax.random.PRNGKey(0)
    s = sample_hypersphere(key, 5, 64)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(s), axis=-1), 1.0, atol=1e-5
    )
    x = sample_simplex(key, 4, 64)
    np.testing.assert_allclose(np.asarray(x).sum(-1), 1.0, atol=1e-5)
    assert (np.asarray(x) >= 0).all()


def test_polytope_sampling_respects_constraints():
    key = jax.random.PRNGKey(1)
    bounds = jnp.stack([jnp.zeros(2), jnp.ones(2)])
    P = np.asarray(
        get_polytope_samples(
            key, 64, bounds,
            inequality_constraints=[((0, 1), (1.0, 1.0), 0.5)],
        )
    )
    assert (P.sum(-1) >= 0.5 - 1e-4).all()
    assert (P >= -1e-5).all() and (P <= 1 + 1e-5).all()
    # samples should spread out (not stuck at the interior point)
    assert P.std(0).min() > 0.05


def test_find_interior_point():
    # unit square with x0 + x1 <= 1
    A = np.array([[1.0, 1.0], [-1.0, 0.0], [0.0, -1.0], [1.0, 0.0], [0.0, 1.0]])
    b = np.array([1.0, 0.0, 0.0, 1.0, 1.0])
    x = find_interior_point(A, b)
    assert (A @ x <= b - 1e-6).all()


def test_fixed_feature_wrapper():
    bounds = jnp.stack([jnp.zeros(2), jnp.ones(2)])
    ff = FixedFeatureAcquisitionFunction(
        acqf=quad, d=3, fixed_indices=(2,), fixed_values=jnp.asarray([0.5])
    )
    cand, val = optimize_acqf(
        ff, bounds, q=1, num_restarts=2, raw_samples=16,
        key=jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(np.asarray(cand[0]), [0.3, 0.7], atol=1e-3)
    assert abs(float(val) - 1.0) < 1e-5


def test_proximal_and_penalized_and_cost():
    X = jnp.asarray([[0.3, 0.7, 0.5]])
    prox = ProximalAcquisitionFunction(
        acqf=quad, X_last=TARGET, proximal_weights=jnp.ones(3)
    )
    assert abs(float(prox(X)) - float(quad(X))) < 1e-6  # at X_last: weight 1
    pen = PenalizedAcquisitionFunction(
        acqf=quad, penalty=l2_penalty(jnp.zeros(3)),
        regularization_parameter=0.1,
    )
    assert float(pen(X)) < float(quad(X))
    ca = CostAwareAcquisitionFunction(acqf=quad, cost_fn=lambda X: 2.0)
    assert abs(float(ca(X)) - float(quad(X)) / 2.0) < 1e-6


def test_mixed_optimizer():
    bounds = jnp.stack([jnp.zeros(3), jnp.ones(3)])
    cand, val = optimize_acqf_mixed(
        quad, bounds, q=1,
        fixed_features_list=[{2: 0.0}, {2: 0.5}, {2: 1.0}],
        key=jax.random.PRNGKey(0),
        num_restarts=2, raw_samples=16, maxiter=30,
    )
    np.testing.assert_allclose(np.asarray(cand[0]), [0.3, 0.7, 0.5], atol=1e-3)


def test_discrete_local_search():
    choices = [jnp.linspace(0, 1, 11)] * 3
    X, v = optimize_acqf_discrete_local_search(
        quad, choices, jax.random.PRNGKey(0), q=2
    )
    np.testing.assert_allclose(np.asarray(X[0]), [0.3, 0.7, 0.5], atol=1e-6)
    assert v[0] >= v[1]


def test_homotopy_warm_start():
    bounds = jnp.stack([jnp.zeros(3), jnp.ones(3)])

    def factory(tau):
        return lambda X: quad(X) - tau * jnp.sum(jnp.abs(X))

    cand, val = optimize_acqf_homotopy(
        factory, bounds, q=1, key=jax.random.PRNGKey(1),
        schedule=log_linear_schedule(1.0, 0.01, 3),
        num_restarts=2, raw_samples=16, maxiter=30,
    )
    np.testing.assert_allclose(np.asarray(cand[0]), [0.3, 0.7, 0.5], atol=0.02)


def test_stopping_criterion():
    sc = ExpMAStoppingCriterion(rel_tol=1e-4)
    assert not sc.evaluate(100.0)
    flat = [sc.evaluate(1.0) for _ in range(30)]
    assert flat[-1]  # flat trace must stop
    sc2 = ExpMAStoppingCriterion(rel_tol=1e-5)
    decreasing = [sc2.evaluate(100.0 * (0.5 ** i)) for i in range(15)]
    assert not any(decreasing)  # fast descent must not stop


def test_risk_measures_ordering():
    s = jnp.asarray(
        np.random.default_rng(0).normal(size=(32, 12, 1)), jnp.float32
    )
    n_w = 4
    wc = worst_case_risk(n_w)(s)
    cv = cvar_risk(n_w, alpha=0.75)(s)
    vr = var_risk(n_w, alpha=0.75)(s)
    ex = expectation_risk(n_w)(s)
    assert wc.shape == (32, 3)
    assert bool((wc <= cv + 1e-6).all())
    assert bool((cv <= vr + 1e-6).all())
    assert bool((wc <= ex + 1e-6).all())


def test_chebyshev_scalarization():
    ch = chebyshev_scalarization(
        jnp.asarray([0.5, 0.5]), jnp.stack([jnp.zeros(2), jnp.ones(2)])
    )
    v = np.asarray(ch(jnp.asarray([[0.2, 0.8]])))
    assert abs(v[0] - (0.1 + 0.05 * 0.5)) < 1e-6


def test_batched_multinomial_no_replacement():
    key = jax.random.PRNGKey(0)
    w = jnp.asarray([0.0, 0.0, 1.0, 1.0, 1.0])
    idx = np.asarray(batched_multinomial(key, w, 3))
    assert len(set(idx.tolist())) == 3
    assert set(idx.tolist()) <= {2, 3, 4}


def test_linear_ess_truncated_moments():
    import scipy.stats as sst

    from botorch_tpu.utils.lin_ess import (
        sample_linear_constrained_gaussian,
    )

    A = jnp.asarray([[-1.0, 0.0]])
    b = jnp.asarray([-0.5])  # x0 >= 0.5
    s = np.asarray(
        sample_linear_constrained_gaussian(
            A, b, jnp.asarray([1.0, 0.0]), jax.random.PRNGKey(0),
            num_samples=2000, thinning=4, burnin=50,
        )
    )
    assert (s[:, 0] >= 0.5 - 1e-4).all()
    expect = sst.norm.pdf(0.5) / (1 - sst.norm.cdf(0.5))
    assert abs(s[:, 0].mean() - expect) < 0.05
    assert abs(s[:, 1].mean()) < 0.06


def test_delaunay_polytope_sampler_uniformity():
    """`sample_polytope_delaunay` (reference `utils/sampling.py:707`):
    exact uniform draws — moments match closed forms."""
    from botorch_tpu.utils.sampling import sample_polytope_delaunay

    # triangle x,y >= 0, x + y <= 1: mean 1/3, E[x^2] = 1/6
    A = jnp.asarray([[-1.0, 0.0], [0.0, -1.0], [1.0, 1.0]])
    b = jnp.asarray([0.0, 0.0, 1.0])
    s = np.asarray(sample_polytope_delaunay(A, b, jax.random.PRNGKey(0),
                                            n=8000))
    assert np.all(s @ np.asarray(A).T <= np.asarray(b) + 1e-6)
    assert np.abs(s.mean(0) - 1 / 3).max() < 0.02
    assert abs((s[:, 0] ** 2).mean() - 1 / 6) < 0.01
    # 3d cube: var 1/12 per axis
    eye = np.eye(3)
    A3 = jnp.asarray(np.concatenate([eye, -eye]), jnp.float32)
    b3 = jnp.asarray([1.0, 1.0, 1.0, 0.0, 0.0, 0.0])
    s3 = np.asarray(sample_polytope_delaunay(A3, b3, jax.random.PRNGKey(1),
                                             n=8000))
    assert np.abs(s3.var(0) - 1 / 12).max() < 0.01
    # 1d segment fallback
    A1 = jnp.asarray([[1.0], [-1.0]])
    b1 = jnp.asarray([2.0, 1.0])
    s1 = np.asarray(sample_polytope_delaunay(A1, b1, jax.random.PRNGKey(2),
                                             n=4000))
    assert s1.min() >= -1.0 and s1.max() <= 2.0
    assert abs(s1.mean() - 0.5) < 0.1


def test_gen_candidates_adam_deterministic_and_stochastic():
    """`gen_candidates_torch` counterpart (reference generation/gen.py:301):
    projected Adam ascent, optional per-iteration resampling key."""
    import jax
    import jax.numpy as jnp

    from botorch_tpu.generation.gen import gen_candidates_adam

    acqf = lambda X: -jnp.sum((X - 0.7) ** 2)
    ics = jax.random.uniform(jax.random.PRNGKey(0), (5, 2, 3))
    ub = jnp.stack([jnp.zeros(3), jnp.ones(3)])
    cands, vals = gen_candidates_adam(acqf, ics, ub, maxiter=300)
    assert float(vals.max()) > -1e-3
    assert bool((cands >= 0).all() and (cands <= 1).all())

    def sacqf(X, key):
        return -jnp.sum((X - 0.7) ** 2) + 0.01 * jax.random.normal(key, ())

    c2, v2 = gen_candidates_adam(
        sacqf, ics, ub, maxiter=300, key=jax.random.PRNGKey(1)
    )
    assert float(v2.max()) > -0.05
    # bounds clamp is active: start at the boundary with optimum outside
    acqf2 = lambda X: jnp.sum(X)
    c3, _ = gen_candidates_adam(acqf2, ics, ub, maxiter=50)
    assert float(c3.max()) <= 1.0 + 1e-6


def test_pathwise_thompson_sampling_acqf():
    import numpy as _np

    from botorch_tpu.fit import fit_gp
    from botorch_tpu.generation.sampling import make_pathwise_thompson_sampling
    from botorch_tpu.models.gp import make_gp
    from botorch_tpu.optim.optimize import optimize_acqf

    rng = _np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(12, 2)), jnp.float32)
    Y = jnp.asarray(
        _np.sin(5 * _np.asarray(X[:, 0])) + _np.asarray(X[:, 1]), jnp.float32
    )[:, None]
    model = fit_gp(make_gp(X, Y), num_restarts=2, maxiter=30)
    bounds = jnp.stack([jnp.zeros(2), jnp.ones(2)])
    ts = make_pathwise_thompson_sampling(model, jax.random.PRNGKey(1))
    # deterministic: same path, same value
    Xc = jnp.asarray([[0.3, 0.7]])
    assert float(ts(Xc)) == float(ts(Xc))
    cand, val = optimize_acqf(
        ts, bounds, q=1, num_restarts=4, raw_samples=32,
        key=jax.random.PRNGKey(2), seed=3,
    )
    # the TS maximizer value should beat random probes of the same path
    probes = jax.vmap(lambda x: ts(x[None]))(
        jax.random.uniform(jax.random.PRNGKey(4), (64, 2))
    )
    assert float(val) >= float(probes.max()) - 1e-4
    # fully-Bayesian models are rejected, as in the reference
    fb = model.replace(_is_fully_bayesian=True)
    try:
        make_pathwise_thompson_sampling(fb, jax.random.PRNGKey(0))
        raise AssertionError("expected NotImplementedError")
    except NotImplementedError:
        pass


def test_optimize_objective_and_feasibility_helpers():
    import numpy as _np

    from botorch_tpu.acquisition.active_learning import (
        get_feasible_samples,
        get_outcome_feasibility_probability,
    )
    from botorch_tpu.acquisition.input_constructors import optimize_objective
    from botorch_tpu.fit import fit_gp
    from botorch_tpu.models.gp import make_gp

    rng = _np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(12, 2)), jnp.float32)
    Y = jnp.asarray(
        _np.sin(5 * _np.asarray(X[:, 0])) + _np.asarray(X[:, 1]), jnp.float32
    )[:, None]
    model = fit_gp(make_gp(X, Y), num_restarts=2, maxiter=30)
    bounds = jnp.stack([jnp.zeros(2), jnp.ones(2)])
    cand, val = optimize_objective(model, bounds, q=1, seed=4)
    assert cand.shape == (1, 2) and jnp.isfinite(val)
    # fixed features come back expanded to full dimension at the pin
    cand_ff, _ = optimize_objective(
        model, bounds, q=1, seed=4, fixed_features={1: 0.25}
    )
    assert cand_ff.shape == (1, 2)
    _np.testing.assert_allclose(float(cand_ff[0, 1]), 0.25, atol=1e-6)

    samples = jnp.asarray(rng.uniform(size=(200, 2)), jnp.float32)
    kept, frac = get_feasible_samples(samples, [((0, 1), (1.0, 1.0), 1.0)])
    # x0 + x1 >= 1 holds for about half the unit square
    assert 0.3 < frac < 0.7
    assert bool(jnp.all(kept.sum(-1) >= 1.0))
    p_all = get_outcome_feasibility_probability(
        model, X[:3], (lambda y: y[..., 0] - 100.0,), jax.random.PRNGKey(5)
    )
    assert p_all == 1.0
    p_none = get_outcome_feasibility_probability(
        model, X[:3], (lambda y: 100.0 - y[..., 0],), jax.random.PRNGKey(5)
    )
    assert p_none == 0.0
