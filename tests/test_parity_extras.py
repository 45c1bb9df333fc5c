"""Tests for the late parity additions: heteroskedastic GP, learned
objective, contextual dataset, rounding factory, constraint helpers,
one-shot KG initializers, alpha-approximate decompositions, homotopy
schedules, and MF acqf constructors."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from botorch_tpu.fit import fit_gp
from botorch_tpu.models.gp import make_gp


@pytest.fixture(scope="module")
def het_model():
    key = jax.random.PRNGKey(0)
    X = jnp.linspace(0, 1, 25)[:, None]
    noise_true = 0.01 + 0.5 * X[:, 0] ** 2
    Y = jnp.sin(6 * X[:, 0]) + jnp.sqrt(noise_true) * jax.random.normal(
        key, (25,)
    )
    from botorch_tpu.models.heteroskedastic import (
        fit_heteroskedastic_gp,
        make_heteroskedastic_gp,
    )

    return fit_heteroskedastic_gp(
        make_heteroskedastic_gp(X, Y[:, None], noise_true[:, None]),
        num_restarts=4,
        maxiter=50,
    )


def test_heteroskedastic_noise_is_point_dependent(het_model):
    Xt = jnp.array([[0.05], [0.95]])
    v_lat = het_model.posterior(Xt).variance[:, 0]
    v_obs = het_model.posterior(Xt, observation_noise=True).variance[:, 0]
    added = v_obs - v_lat
    assert bool((v_obs > v_lat).all())
    # true noise at 0.95 is ~45x the noise at 0.05
    assert float(added[1]) > 3 * float(added[0])


def test_heteroskedastic_condition(het_model):
    m2 = het_model.condition_on_observations(
        jnp.array([[0.5]]), jnp.array([[0.0]]), jnp.array([[0.1]])
    )
    assert m2.f_gp.X.shape[0] == het_model.f_gp.X.shape[0] + 1
    assert jnp.isfinite(m2.posterior(jnp.array([[0.3]])).mean).all()


def test_learned_objective_orders_by_utility():
    key = jax.random.PRNGKey(1)
    from botorch_tpu.acquisition.objective import learned_objective
    from botorch_tpu.models.pairwise_gp import (
        fit_pairwise_gp,
        make_pairwise_gp,
    )

    Yitems = jax.random.uniform(key, (14, 2))
    util = Yitems[:, 0] + 0.5 * Yitems[:, 1]
    comps = []
    for i in range(0, 12, 2):
        a, b = i, i + 1
        comps.append([a, b] if util[a] > util[b] else [b, a])
    pgp = fit_pairwise_gp(make_pairwise_gp(Yitems, jnp.asarray(comps)))
    obj = learned_objective(pgp)
    samples = jnp.stack(
        [jnp.array([[0.9, 0.9], [0.1, 0.1]])]
    )  # (1, q=2, m=2)
    vals = obj(samples)
    assert vals.shape == (1, 2)
    assert float(vals[0, 0]) > float(vals[0, 1])
    # multi-sample path expands the MC axis
    obj3 = learned_objective(pgp, num_pref_samples=3)
    assert obj3(jnp.ones((2, 2, 2))).shape == (6, 2)


def test_contextual_dataset():
    from botorch_tpu.utils.datasets import ContextualDataset, SupervisedDataset

    X = jnp.arange(12.0).reshape(4, 3)
    d1 = SupervisedDataset.make(
        X, jnp.ones((4, 1)), feature_names=("a", "b", "c"),
        outcome_names=("m1",),
    )
    d2 = SupervisedDataset.make(
        X, jnp.zeros((4, 1)), feature_names=("a", "b", "c"),
        outcome_names=("m2",),
    )
    cd = ContextualDataset.make(
        [d1, d2],
        parameter_decomposition={"c1": ["a"], "c2": ["b", "c"]},
        metric_decomposition={"c1": ["m1"], "c2": ["m2"]},
    )
    assert cd.context_names == ("c1", "c2")
    assert cd.context_indices() == {"c1": (0,), "c2": (1, 2)}
    assert cd.joint_Y().shape == (4, 2)
    with pytest.raises(ValueError):
        ContextualDataset.make([d1, d2], {"c1": ["zzz"]})


def test_rounding_factory_round_trip():
    from botorch_tpu.models.transforms import get_rounding_input_transform

    bounds = jnp.array([[0.0, 0.0, 0.0, 0.0, 0.0], [1.0, 5.0, 1.0, 1.0, 1.0]])
    tf = get_rounding_input_transform(
        bounds, integer_indices=(1,), categorical_features=((2, 3),)
    )
    X = jnp.array([[0.3, 0.49, 0.2, 0.5, 0.3]])
    Xt = tf.transform(X)
    np.testing.assert_allclose(
        np.asarray(Xt), [[0.3, 0.4, 0.0, 1.0, 0.0]], atol=1e-6
    )
    g = jax.grad(lambda x: tf.transform(x).sum())(X)
    assert bool(jnp.isfinite(g).all())
    tn = get_rounding_input_transform(
        bounds,
        integer_indices=(1,),
        categorical_features=((2, 3),),
        return_numeric=True,
    )
    np.testing.assert_allclose(
        np.asarray(tn.transform(X)), [[0.3, 0.4, 1.0]], atol=1e-6
    )


def test_constraint_helpers():
    from botorch_tpu.utils.constraints import (
        apply_constraints,
        compute_feasibility_indicator,
        get_monotonicity_constraints,
        get_outcome_constraint_transforms,
    )

    cons = get_outcome_constraint_transforms(
        (jnp.array([[1.0, 0.0]]), jnp.array([0.5]))
    )
    s = jnp.array([[0.2, 9.0], [0.9, 9.0]])
    np.testing.assert_allclose(np.asarray(cons[0](s)), [-0.3, 0.4], atol=1e-6)
    assert list(np.asarray(compute_feasibility_indicator(cons, s))) == [
        True,
        False,
    ]
    out = apply_constraints(
        jnp.array([1.0, 1.0]), cons, s, infeasible_cost=5.0, eta=1e-3
    )
    np.testing.assert_allclose(np.asarray(out), [1.0, -5.0], atol=1e-3)
    A, b = get_monotonicity_constraints(3)
    x_mono = jnp.array([[0.1], [0.2], [0.3]])
    assert bool((A @ x_mono <= b).all())
    assert get_outcome_constraint_transforms(None) is None


def test_chebyshev_scalarization_reference_semantics():
    from botorch_tpu.acquisition.objective import get_chebyshev_scalarization

    Y = jnp.array([[0.0, 0.0], [1.0, 2.0], [0.5, 1.0]])
    obj = get_chebyshev_scalarization(jnp.array([0.5, 0.5]), Y)
    vals = obj(Y)
    assert vals.shape == (3,)
    # the dominating point must have the highest scalarized value
    assert int(jnp.argmax(vals)) == 1
    # negative weights = minimization of that objective
    obj_min = get_chebyshev_scalarization(jnp.array([0.5, -0.5]), Y)
    v = obj_min(jnp.array([[0.0, 2.0], [0.0, 0.0]]))
    assert float(v[1]) > float(v[0])
    # n=0: unnormalized passthrough still finite
    obj0 = get_chebyshev_scalarization(
        jnp.array([0.5, 0.5]), jnp.zeros((0, 2))
    )
    assert jnp.isfinite(obj0(Y)).all()


def test_one_shot_kg_initial_conditions():
    from botorch_tpu.acquisition.knowledge_gradient import make_qkg
    from botorch_tpu.optim.optimize import gen_one_shot_kg_initial_conditions

    key = jax.random.PRNGKey(0)
    X = jax.random.uniform(key, (10, 2))
    Y = -jnp.sum((X - 0.5) ** 2, -1)
    gp = fit_gp(make_gp(X, Y[:, None]), num_restarts=2, maxiter=30)
    kg = make_qkg(gp, q=1, num_fantasies=4)
    ub = jnp.stack([jnp.zeros(2), jnp.ones(2)])
    ics = gen_one_shot_kg_initial_conditions(
        kg, ub, num_restarts=4, raw_samples=16, key=jax.random.PRNGKey(3)
    )
    assert ics.shape == (4, 5, 2)
    assert bool((ics >= 0).all() and (ics <= 1).all())
    # frac_random=1 keeps the plain ICs for the fantasy part
    ics_r = gen_one_shot_kg_initial_conditions(
        kg, ub, num_restarts=4, raw_samples=16,
        key=jax.random.PRNGKey(3), frac_random=1.0,
    )
    assert ics_r.shape == (4, 5, 2)


def test_initialize_q_batch_nonneg():
    from botorch_tpu.optim.optimize import initialize_q_batch_nonneg

    key = jax.random.PRNGKey(0)
    X = jnp.arange(20.0).reshape(10, 2, 1)
    vals = jnp.array([0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 2.0])
    sel = initialize_q_batch_nonneg(key, X, vals, n=2)
    # only the two positive-value candidates qualify
    assert set(np.asarray(sel[..., 0, 0]).tolist()) <= {16.0, 18.0}


def test_box_decomposition_list_and_alpha():
    from botorch_tpu.utils.multi_objective import (
        BoxDecompositionList,
        approximate_pareto_Y,
        get_default_partitioning_alpha,
    )

    assert get_default_partitioning_alpha(2) == 0.0
    assert get_default_partitioning_alpha(5) == pytest.approx(1e-3)
    fronts = [
        np.array([[1.0, 2.0], [2.0, 1.0]]),
        np.array([[3.0, 0.5], [0.5, 3.0], [2.0, 2.0]]),
    ]
    bd = BoxDecompositionList(fronts, np.zeros(2))
    lo, hi = bd.padded_cell_bounds()
    assert lo.shape == hi.shape and lo.shape[0] == 2
    np.testing.assert_allclose(
        np.asarray(bd.compute_hypervolume()), [3.0, 5.0], atol=1e-6
    )
    # tiny contributors dropped under alpha
    Y = np.array([[1.0, 2.0], [2.0, 1.0], [1.01, 1.99]])
    kept = approximate_pareto_Y(Y, np.zeros(2), alpha=0.05)
    assert kept.shape[0] < 3


def test_homotopy_schedules():
    from botorch_tpu.optim.variants import (
        FixedHomotopySchedule,
        HomotopyParameter,
        Homotopy,
        LinearHomotopySchedule,
        LogLinearHomotopySchedule,
    )

    lin = LinearHomotopySchedule(0.0, 1.0, 5)
    assert lin.num_steps == 5 and lin.values[-1] == 1.0
    log = LogLinearHomotopySchedule(1e-2, 1.0, 3)
    np.testing.assert_allclose(log.values, [1e-2, 1e-1, 1.0], rtol=1e-6)
    seen = []
    hp = HomotopyParameter(seen.append, FixedHomotopySchedule([3.0, 7.0]))
    for _ in Homotopy([hp.as_pair()]):
        pass
    assert seen == [3.0, 7.0]


def test_mf_constructors_run():
    from botorch_tpu.acquisition.hypervolume_knowledge_gradient import (
        make_qmfhvkg,
    )
    from botorch_tpu.acquisition.max_value_entropy_search import (
        make_mf_mes,
        qLowerBoundMaxValueEntropy,
    )
    from botorch_tpu.acquisition.wrappers import affine_fidelity_cost

    key = jax.random.PRNGKey(0)
    X = jax.random.uniform(key, (12, 3))  # last dim = fidelity
    Y = -jnp.sum((X[:, :2] - 0.5) ** 2, -1) + 0.1 * X[:, 2]
    gp = fit_gp(make_gp(X, Y[:, None]), num_restarts=2, maxiter=30)
    project = lambda Xq: Xq.at[..., -1].set(1.0)
    cost = affine_fidelity_cost((2,), fixed_cost=0.1)
    ub = jnp.stack([jnp.zeros(3), jnp.ones(3)])
    mes = make_mf_mes(
        qLowerBoundMaxValueEntropy, gp, ub, key, project=project,
        cost_fn=cost, grid_size=64, num_max_values=4,
    )
    v = mes(jnp.array([[0.4, 0.6, 0.5]]))
    assert jnp.isfinite(v)

    Y2 = jnp.stack([Y, -Y], axis=-1)
    gp2 = fit_gp(make_gp(X, Y2), num_restarts=2, maxiter=30)
    hvkg = make_qmfhvkg(
        gp2, ref_point=jnp.array([-2.0, -2.0]), project=project,
        cost_fn=cost, q=1, num_fantasies=2, q_inner=2,
    )
    Xf = jax.random.uniform(jax.random.PRNGKey(5), (5, 3))
    assert jnp.isfinite(hvkg(Xf))


def test_get_best_candidates_skips_nonfinite():
    from botorch_tpu.optim.optimize import get_best_candidates

    cands = jnp.arange(6.0).reshape(3, 2, 1)
    vals = jnp.array([0.1, jnp.nan, 0.5])
    best = get_best_candidates(cands, vals)
    np.testing.assert_allclose(np.asarray(best), [[4.0], [5.0]])


def test_mmma_metrics():
    """Gap / simple / cumulative regret tracking (reference
    `MMMA/MMMA.py:77,190-195`) computed from an MMMA result."""
    from botorch_tpu.portfolio import MMMAResult, mmma_metrics

    Y = jnp.asarray([0.1, 0.3, 0.2, 0.5, 0.7, 0.6])  # 3 init + 3 iters
    best_curve = jnp.asarray([0.5, 0.7, 0.7])
    res = MMMAResult(X=None, Y=Y, best_curve=best_curve,
                     chosen_acqf=None, kernel_weights=None)
    m = mmma_metrics(res, true_max=1.0, n_init=3)
    # gap: best_init 0.3, denom 0.7 -> [(0.5-0.3)/0.7, (0.7-0.3)/0.7, same]
    np.testing.assert_allclose(
        np.asarray(m.gap), [0.2 / 0.7, 0.4 / 0.7, 0.4 / 0.7], rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(m.simple_regret), [0.5, 0.3, 0.3], rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(m.cumulative_regret), [0.5, 0.8, 1.2], rtol=1e-6
    )


def test_abe_update_and_propose():
    """ABEBO risk-ensemble selector (reference `MMMA/test.py:35-117`):
    conjugate Gaussian risk update, probability-of-best weights, ensemble
    blend and least-risk selection."""
    from botorch_tpu.portfolio import abe_init, abe_propose, abe_update

    st = abe_init(3)
    np.testing.assert_allclose(np.asarray(st.risk_cov), np.eye(3))

    # acqf 0 clearly best (lowest loss): weights concentrate on it and the
    # posterior mean orders accordingly.
    losses = jnp.asarray([-5.0, 1.0, 2.0])
    st1, w = abe_update(st, losses, jax.random.PRNGKey(0))
    assert w.shape == (3,)
    np.testing.assert_allclose(float(w.sum()), 1.0, rtol=1e-6)
    assert int(jnp.argmax(w)) == 0 and float(w[0]) > 0.4
    assert int(jnp.argmin(st1.risk_mean)) == 0
    # posterior contracts: cov diagonal shrinks below the prior's
    assert float(jnp.diag(st1.risk_cov).max()) < 1.0

    # closed-form check of the conjugate update (MMMA/test.py:92-99;
    # torch.var is unbiased -> ddof=1)
    prec = 1.0 / float(jnp.var(losses, ddof=1))
    post_cov = np.linalg.inv(np.eye(3) + prec * np.eye(3))
    post_mean = post_cov @ (prec * np.asarray(losses))
    np.testing.assert_allclose(np.asarray(st1.risk_mean), post_mean, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(st1.risk_cov), post_cov, rtol=1e-5)

    # propose: ensemble blend is a convex combination of candidates;
    # least-risk returns the best acqf's candidate exactly.
    cands = jnp.asarray([[[0.0, 0.0]], [[1.0, 1.0]], [[0.5, 0.5]]])
    acq_vals = jnp.asarray([5.0, -1.0, -2.0])  # acqf 0 best (max value)
    st2, blend = abe_propose(st, cands, acq_vals, jax.random.PRNGKey(1))
    assert blend.shape == (1, 2)
    assert 0.0 <= float(blend.min()) and float(blend.max()) <= 1.0
    st3, pick = abe_propose(st, cands, acq_vals, jax.random.PRNGKey(2),
                            least_risk=True)
    np.testing.assert_allclose(np.asarray(pick), [[0.0, 0.0]])

    # a -inf acquisition value (all restarts failed) must not NaN-poison
    # the risk state: it is clamped to the worst finite loss
    bad_vals = jnp.asarray([5.0, -jnp.inf, -2.0])
    st4, blend4 = abe_propose(st, cands, bad_vals, jax.random.PRNGKey(3))
    assert bool(jnp.isfinite(st4.risk_mean).all())
    assert bool(jnp.isfinite(st4.risk_cov).all())
    assert bool(jnp.isfinite(blend4).all())
    assert int(jnp.argmin(st4.risk_mean)) == 0  # acqf 0 still preferred


def test_run_mmma_abe_selection():
    """`run_mmma(selection="abe")` drives a short loop end-to-end."""
    from botorch_tpu.portfolio import run_mmma

    obj = lambda X: -jnp.sum((X - 0.3) ** 2, axis=-1)
    res = run_mmma(
        obj, d=2, n_init=4, iterations=2, key=jax.random.PRNGKey(0),
        kernels=("rbf",), acqf_names=("LogEI", "UCB"), selection="abe",
        num_restarts=2, raw_samples=8, fit_restarts=1, fit_maxiter=10,
    )
    assert res.X.shape == (6, 2) and res.Y.shape == (6,)
    assert bool(jnp.isfinite(res.best_curve).all())
