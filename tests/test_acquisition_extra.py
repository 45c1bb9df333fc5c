"""Tests: KG, fantasize, MES/GIBBON, Thompson sampling, TuRBO state,
portfolio weights (reference test style)."""

import jax
import jax.numpy as jnp
import numpy as np

from botorch_tpu.acquisition.knowledge_gradient import fantasize, make_qkg
from botorch_tpu.acquisition.max_value_entropy_search import (
    make_mes,
    qLowerBoundMaxValueEntropy,
    qMaxValueEntropy,
    sample_max_values_gumbel,
)
from botorch_tpu.fit import fit_gp
from botorch_tpu.generation.sampling import (
    boltzmann_sampling,
    max_posterior_sampling,
)
from botorch_tpu.models.gp import make_gp
from botorch_tpu.optim.turbo import turbo_init, turbo_update
from botorch_tpu.portfolio import bma_weights, hedge_probabilities, HedgeState


import functools


@functools.lru_cache(maxsize=4)
def _model(seed=0, n=15):
    rng = np.random.default_rng(seed)
    X = jnp.asarray(rng.uniform(size=(n, 2)), jnp.float32)
    Y = jnp.asarray(
        np.sin(5 * np.asarray(X[:, 0])) + np.asarray(X[:, 1]), jnp.float32
    )
    return (
        fit_gp(make_gp(X, Y[:, None]), jax.random.PRNGKey(seed),
               num_restarts=2, maxiter=30),
        X,
        Y,
    )


def test_fantasize_batches_and_shrinks_variance():
    model, X, Y = _model()
    Xf = jnp.asarray([[0.5, 0.5]], jnp.float32)
    fm = fantasize(model, Xf, jax.random.PRNGKey(1), num_fantasies=6)
    assert fm.batch_shape == (6,)
    v_before = float(model.posterior(Xf).variance[0, 0])
    v_after = np.asarray(fm.posterior(Xf).variance)[:, 0, 0]
    assert (v_after < v_before).all()


def test_qkg_runs_with_gradient():
    model, X, Y = _model()
    kg = make_qkg(model, q=1, num_fantasies=8, current_value=float(Y.max()))
    X_full = jnp.asarray(
        np.random.default_rng(3).uniform(size=(9, 2)), jnp.float32
    )
    v = float(kg(X_full))
    g = np.asarray(jax.grad(lambda x: kg(x))(X_full))
    assert np.isfinite(v)
    assert np.isfinite(g).all()
    assert kg.get_augmented_q_batch_size() == 9
    assert kg.extract_candidates(X_full).shape == (1, 2)


def test_gumbel_max_values_exceed_best_mean():
    model, X, Y = _model()
    grid = jnp.asarray(
        np.random.default_rng(5).uniform(size=(256, 2)), jnp.float32
    )
    mv = np.asarray(
        sample_max_values_gumbel(model, grid, jax.random.PRNGKey(2), 32)
    )
    best_mean = float(model.posterior(grid).mean.max())
    assert np.median(mv) > best_mean - 0.2


def test_mes_prefers_informative_points():
    model, X, Y = _model()
    bounds = jnp.stack([jnp.zeros(2), jnp.ones(2)])
    mes = make_mes(qMaxValueEntropy, model, bounds, jax.random.PRNGKey(3))
    # near an observed point, MES ~ 0; in an uncertain promising region > 0
    near_data = float(mes(X[:1]))
    post = model.posterior(jnp.asarray([[0.31, 0.99]], jnp.float32))
    far = float(mes(jnp.asarray([[0.31, 0.99]], jnp.float32)))
    assert far >= near_data


def test_gibbon_q2_adds_diversity_penalty():
    model, X, Y = _model()
    bounds = jnp.stack([jnp.zeros(2), jnp.ones(2)])
    gib = make_mes(
        qLowerBoundMaxValueEntropy, model, bounds, jax.random.PRNGKey(3)
    )
    x = jnp.asarray([[0.3, 0.9]], jnp.float32)
    dup = jnp.concatenate([x, x + 1e-4])
    spread = jnp.asarray([[0.3, 0.9], [0.7, 0.1]], jnp.float32)
    # duplicated candidates should score lower than spread ones
    assert float(gib(dup)) < float(gib(spread)) + 1e-3


def test_max_posterior_sampling_picks_good_points():
    model, X, Y = _model()
    cand = jnp.asarray(
        np.random.default_rng(7).uniform(size=(512, 2)), jnp.float32
    )
    sel = max_posterior_sampling(
        model, cand, jax.random.PRNGKey(4), num_samples=8, method="pathwise",
        num_features=256,
    )
    assert sel.shape == (8, 2)
    # selected points should have above-median posterior mean
    mu_sel = np.asarray(model.posterior(sel).mean[:, 0])
    mu_all = np.asarray(model.posterior(cand).mean[:, 0])
    assert mu_sel.mean() > np.median(mu_all)


def test_boltzmann_sampling():
    X = jnp.asarray(np.random.default_rng(0).uniform(size=(50, 2)), jnp.float32)
    vals = -jnp.sum((X - 0.5) ** 2, axis=-1)
    sel = boltzmann_sampling(vals, X, jax.random.PRNGKey(0), num_samples=5,
                             eta=5.0, replacement=False)
    assert sel.shape == (5, 2)


def test_turbo_state_machine():
    st = turbo_init(best_value=0.0)
    for _ in range(3):  # success streak of 3 doubles the length
        st = turbo_update(st, jnp.asarray([st.best_value + 1.0]))
    assert abs(float(st.length) - 1.6) < 1e-5  # capped at length_max
    for _ in range(5 * 3):  # failures halve repeatedly
        st = turbo_update(st, jnp.asarray([-100.0]))
    assert float(st.length) < 1.6
    # eventually triggers a restart
    for _ in range(5 * 10):
        st = turbo_update(st, jnp.asarray([-100.0]))
    assert bool(st.restart_triggered)


def test_portfolio_weights():
    w = np.asarray(bma_weights(jnp.asarray([0.0, 1.0, -1.0])))
    assert abs(w.sum() - 1) < 1e-6 and w[1] == w.max()
    p = np.asarray(
        hedge_probabilities(HedgeState(gains=jnp.asarray([0.0, 5.0, 0.0])),
                            eta=0.5)
    )
    assert p[1] == p.max() and abs(p.sum() - 1) < 1e-6


def test_qhvkg():
    from botorch_tpu.acquisition.hypervolume_knowledge_gradient import (
        make_qhvkg,
    )

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(12, 2)), jnp.float32)
    Y2 = jnp.stack([jnp.sin(3 * X[:, 0]), jnp.cos(3 * X[:, 1])], -1)
    model = fit_gp(make_gp(X, Y2), jax.random.PRNGKey(0), num_restarts=2,
                   maxiter=20)
    hvkg = make_qhvkg(model, jnp.asarray([-1.5, -1.5]), Y2, q=1,
                      num_fantasies=3, q_inner=3)
    X_full = jnp.asarray(rng.uniform(size=(10, 2)), jnp.float32)
    v = float(hvkg(X_full))
    g = np.asarray(jax.grad(lambda x: hvkg(x))(X_full))
    assert np.isfinite(v) and np.isfinite(g).all()
    assert hvkg.get_augmented_q_batch_size() == 10


def test_bvn_against_independent_product():
    from botorch_tpu.utils.bvn import bvn, bvnu

    # r = 0: orthant probability factorizes
    import scipy.stats as sst

    for h, k in [(0.0, 0.0), (1.0, -0.5), (-2.0, 0.3)]:
        got = float(bvnu(h, k, 0.0))
        expect = (1 - sst.norm.cdf(h)) * (1 - sst.norm.cdf(k))
        assert abs(got - expect) < 1e-6
    # box probability sanity: full box = 1
    assert abs(float(bvn(0.3, -10.0, -10.0, 10.0, 10.0)) - 1.0) < 1e-5


def test_pes_prefers_sampled_optimum_region():
    from botorch_tpu.acquisition.predictive_entropy_search import make_pes

    model, X, Y = _model()
    bounds = jnp.stack([jnp.zeros(2), jnp.ones(2)])
    pes = make_pes(model, bounds, jax.random.PRNGKey(1), num_optima=6,
                   num_features=256, raw_samples=128, maxiter=15)
    # information gain must be non-negative and finite
    vals = [float(pes(jnp.asarray([pt], jnp.float32)))
            for pt in ([0.31, 0.99], [0.0, 0.0])]
    assert all(np.isfinite(v) for v in vals)
    assert all(v > -1e-3 for v in vals)
    # the sampled-optimum region should be at least as informative
    assert vals[0] >= vals[1] - 0.05


def test_pes_qbatch_joint_entropy():
    """q > 1 PES: joint information gain is finite, non-negative, and
    dominates the best single point of the batch (submodularity-style
    sanity: adding a candidate cannot lose information)."""
    from botorch_tpu.acquisition.predictive_entropy_search import make_pes

    model, X, Y = _model()
    bounds = jnp.stack([jnp.zeros(2), jnp.ones(2)])
    pes = make_pes(model, bounds, jax.random.PRNGKey(2), num_optima=4,
                   num_features=256, raw_samples=128, maxiter=10)
    Xq = jnp.asarray([[0.2, 0.8], [0.9, 0.1]], jnp.float32)
    v_joint = float(pes(Xq))
    v_singles = [float(pes(Xq[i:i + 1])) for i in range(2)]
    assert np.isfinite(v_joint)
    assert v_joint > -1e-3
    assert v_joint >= max(v_singles) - 0.05
    # distinct points add information over a duplicated point
    v_dup = float(pes(jnp.repeat(Xq[:1], 2, axis=0)))
    assert v_joint >= v_dup - 0.05


def test_turbo_compiled_loop_matches_host_loop():
    """`run_turbo_compiled`: one-jit TuRBO run reaches host-loop quality
    (single device dispatch; in-graph trust-region restarts).

    The two loops are semantically identical (first-iteration candidates
    match to ~4e-5; both consume the same RNG stream), but the Thompson-
    sampling argmax over candidates makes the trajectory chaotic — a
    float-association difference between jit-inside-fori_loop and host-
    jit compilations flips a selection after a few iterations. So quality
    parity is asserted on the MEAN best value over seeds, not one run
    (measured over 6 seeds: compiled -11.20 vs host -11.71 on Ackley-4).
    """
    from botorch_tpu.optim.turbo import run_turbo, run_turbo_compiled
    from botorch_tpu.test_functions.synthetic import Ackley
    from botorch_tpu.utils.transforms import unnormalize

    prob = Ackley(dim=4, negate=True)
    obj = lambda X: prob(unnormalize(X, prob.bounds))
    best_c, best_h = [], []
    for seed in range(6):
        X, Y = run_turbo_compiled(
            obj, d=4, n_init=10, iterations=15,
            key=jax.random.PRNGKey(seed), q=2, n_candidates=256,
            fit_maxiter=25,
        )
        assert X.shape == (40, 4) and Y.shape == (40,)
        assert np.isfinite(np.asarray(Y)).all()
        # improves materially over the initial design
        assert float(Y[10:].max()) > float(Y[:10].max())
        Xh, Yh = run_turbo(
            obj, d=4, n_init=10, iterations=15,
            key=jax.random.PRNGKey(seed), q=2, n_candidates=256,
            fit_maxiter=25,
        )
        # Paired-trajectory guarantee (shared RNG stream): the two loops
        # must be IDENTICAL up to the first TS-argmax divergence. Any
        # semantic regression in the compiled path (RNG misalignment,
        # trust-region update drift) breaks the prefix immediately.
        diffs = np.abs(np.asarray(X) - np.asarray(Xh)).max(-1)
        div = np.argmax(diffs > 5e-3) if (diffs > 5e-3).any() else len(diffs)
        assert div >= 12, (
            f"seed {seed}: trajectories diverge at row {div} "
            f"(before the first full iteration's q=2 batch)"
        )
        np.testing.assert_allclose(
            np.asarray(X[:div]), np.asarray(Xh[:div]), atol=5e-3
        )
        best_c.append(float(Y.max()))
        best_h.append(float(Yh.max()))
    # mean final quality within noise of the host loop (measured r4:
    # compiled -11.2 vs host -11.7 over 6 seeds — compiled is ahead; the
    # 0.5 bound fails on any material regression, not just a collapse)
    assert np.mean(best_c) > np.mean(best_h) - 0.5, (best_c, best_h)


def test_three_step_lookahead():
    """`qThreeStepLookahead`: 3-stage one-shot scenario tree has finite
    gradients and its optimized value dominates the 2-step tree (more
    adaptivity cannot hurt)."""
    from botorch_tpu.acquisition.multi_step_lookahead import (
        make_multistep,
        make_three_step,
    )
    from botorch_tpu.optim.optimize import optimize_acqf

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(12, 2)), jnp.float32)
    Y = jnp.sin(3 * X[:, :1]) + 0.05 * jnp.asarray(
        rng.normal(size=(12, 1)), jnp.float32
    )
    model = fit_gp(make_gp(X, Y), jax.random.PRNGKey(0), num_restarts=2,
                   maxiter=25)
    best = float(Y.max())
    acqf = make_three_step(model, num_fantasies=(4, 3), best_f=best)
    na = acqf.get_augmented_q_batch_size()
    assert na == 1 + 4 + 12
    Xf = jnp.asarray(rng.uniform(size=(na, 2)), jnp.float32)
    g = jax.grad(lambda x: acqf(x))(Xf)
    assert np.isfinite(np.asarray(g)).all()
    ub = jnp.stack([jnp.zeros(2), jnp.ones(2)])
    _, v3 = optimize_acqf(acqf, ub, q=na, num_restarts=4, raw_samples=24,
                          key=jax.random.PRNGKey(1), maxiter=40)
    two = make_multistep(model, num_fantasies=4, best_f=best)
    _, v2 = optimize_acqf(two, ub, q=two.get_augmented_q_batch_size(),
                          num_restarts=4, raw_samples=24,
                          key=jax.random.PRNGKey(1), maxiter=40)
    assert float(v3) >= float(v2) - 0.05
    assert acqf.extract_candidates(Xf).shape == (1, 2)


def test_k_step_lookahead_matches_unrolled():
    """`qKStepLookahead` (arbitrary-depth tree): K=2 equals the
    hand-unrolled 2-step exactly (same qMC bases), K=3 equals the
    3-step when handed its base draws, and K=4 runs with finite grads."""
    from botorch_tpu.acquisition.multi_step_lookahead import (
        make_k_step,
        make_multistep,
        make_three_step,
        qKStepLookahead,
    )

    rng = np.random.default_rng(1)
    X = jnp.asarray(rng.uniform(size=(10, 2)), jnp.float32)
    Y = jnp.cos(4 * X[:, :1]) + 0.1 * jnp.asarray(
        rng.normal(size=(10, 1)), jnp.float32
    )
    model = fit_gp(make_gp(X, Y), jax.random.PRNGKey(0), num_restarts=2,
                   maxiter=20)
    best = float(Y.max())

    for terminal in ("PosteriorMean", "LogEI"):
        two = make_multistep(model, num_fantasies=5, best_f=best,
                             terminal=terminal, seed=3)
        gen2 = make_k_step(model, batch_sizes=(1, 1), num_fantasies=(5,),
                           best_f=best, terminal=terminal, seed=3)
        Xf = jnp.asarray(rng.uniform(size=(6, 2)), jnp.float32)
        np.testing.assert_allclose(
            float(two(Xf)), float(gen2(Xf)), rtol=2e-4, atol=2e-5
        )

    three = make_three_step(model, num_fantasies=(3, 2), best_f=best, seed=7)
    gen3 = qKStepLookahead(
        model=model, cache=model.train_chol(),
        bases=(three.base1, three.base2), best_f=three.best_f,
        batch_sizes=(1, 1, 1), num_fantasies=(3, 2),
    )
    Xf3 = jnp.asarray(rng.uniform(size=(10, 2)), jnp.float32)
    np.testing.assert_allclose(
        float(three(Xf3)), float(gen3(Xf3)), rtol=2e-4, atol=2e-5
    )

    k4 = make_k_step(model, batch_sizes=(1, 1, 1, 1),
                     num_fantasies=(3, 2, 2), best_f=best, terminal="LogEI")
    n4 = k4.get_augmented_q_batch_size()
    assert n4 == 1 + 3 + 6 + 12
    Xf4 = jnp.asarray(rng.uniform(size=(n4, 2)), jnp.float32)
    v, g = jax.value_and_grad(lambda x: k4(x))(Xf4)
    assert np.isfinite(float(v)) and np.isfinite(np.asarray(g)).all()


def test_k_step_lookahead_masked_padding_equivalence():
    """A padded (masked) model must give the same K-step tree value as the
    unpadded model (identity rows in the cached factor decouple exactly)."""
    from botorch_tpu.acquisition.multi_step_lookahead import qKStepLookahead, make_k_step

    rng = np.random.default_rng(2)
    X = jnp.asarray(rng.uniform(size=(9, 2)), jnp.float32)
    Y = jnp.cos(4 * X[:, :1])
    model = fit_gp(make_gp(X, Y), jax.random.PRNGKey(0), num_restarts=2, maxiter=20)
    acqf = make_k_step(model, batch_sizes=(1, 1), num_fantasies=(4,),
                       best_f=float(Y.max()), seed=11)

    # padded model with the SAME hyperparameters
    pad = 4
    Xp = jnp.concatenate([X, jnp.zeros((pad, 2))])
    Yp = jnp.concatenate([Y, jnp.zeros((pad, 1))])
    mask = jnp.arange(9 + pad) < 9
    mp = make_gp(Xp, Yp, mask=mask, params=model.params, standardize=False)
    mp = mp.replace(Y_loc=model.Y_loc, Y_scale=model.Y_scale,
                    Y=jnp.concatenate([model.Y, jnp.zeros((pad, 1))]))
    acqf_p = qKStepLookahead(
        model=mp, cache=mp.train_chol(), bases=acqf.bases,
        best_f=acqf.best_f, batch_sizes=(1, 1), num_fantasies=(4,),
    )
    Xf = jnp.asarray(rng.uniform(size=(5, 2)), jnp.float32)
    np.testing.assert_allclose(float(acqf(Xf)), float(acqf_p(Xf)),
                               rtol=2e-4, atol=2e-5)


def test_turbo_candidates_with_svgp():
    """Config-5 pairing (BASELINE.json: 'TuRBO + variational GP at 10k+
    observations'): `generate_turbo_candidates` must accept an SVGP model
    — trust region scaled by its ARD lengthscales, Thompson sampling via
    the joint-posterior draw (no pathwise representation)."""
    from botorch_tpu.models.approximate_gp import fit_svgp, make_svgp
    from botorch_tpu.optim.turbo import generate_turbo_candidates, turbo_init

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(256, 4)), jnp.float32)
    Y = -jnp.sum((X - 0.4) ** 2, axis=-1)
    svgp = fit_svgp(make_svgp(X, Y, num_inducing=24),
                    jax.random.PRNGKey(0), steps=100, batch_size=128)
    st = turbo_init(best_value=float(Y.max()))
    cand = generate_turbo_candidates(
        svgp, st, X[int(jnp.argmax(Y))], jax.random.PRNGKey(1),
        n_candidates=128, q=4,
    )
    assert cand.shape == (4, 4)
    assert bool((cand >= 0).all() and (cand <= 1).all())
    # candidates stay inside the trust region around the incumbent
    ls = svgp.lengthscale
    w = ls / jnp.exp(jnp.mean(jnp.log(ls)))
    center = X[int(jnp.argmax(Y))]
    assert bool((jnp.abs(cand - center) <= 0.5 * st.length * w + 1e-6).all())


def test_k4_lookahead_optimized_end_to_end():
    """K=4 scenario tree optimized end-to-end (the round-2 gap was depth
    > 3): its optimized value must dominate the K=3 tree's (more
    adaptivity cannot hurt, up to optimizer slack), and the k >= 4
    warmstart helper must produce valid ICs."""
    from botorch_tpu.acquisition.multi_step_lookahead import make_k_step
    from botorch_tpu.optim.optimize import optimize_acqf, warmstart_multistep

    rng = np.random.default_rng(4)
    X = jnp.asarray(rng.uniform(size=(10, 2)), jnp.float32)
    Y = jnp.sin(3 * X[:, :1]) + 0.05 * jnp.asarray(
        rng.normal(size=(10, 1)), jnp.float32
    )
    model = fit_gp(make_gp(X, Y), jax.random.PRNGKey(0), num_restarts=2,
                   maxiter=20)
    best = float(Y.max())
    ub = jnp.stack([jnp.zeros(2), jnp.ones(2)])

    k4 = make_k_step(model, batch_sizes=(1, 1, 1, 1),
                     num_fantasies=(3, 2, 2), best_f=best)
    n4 = k4.get_augmented_q_batch_size()
    full4, v4 = optimize_acqf(
        k4, ub, q=n4, num_restarts=4, raw_samples=16,
        key=jax.random.PRNGKey(1), maxiter=30, return_full=True,
    )
    k3 = make_k_step(model, batch_sizes=(1, 1, 1), num_fantasies=(3, 2),
                     best_f=best)
    _, v3 = optimize_acqf(
        k3, ub, q=k3.get_augmented_q_batch_size(), num_restarts=4,
        raw_samples=16, key=jax.random.PRNGKey(1), maxiter=30,
    )
    assert float(jnp.max(v4)) >= float(v3) - 0.05
    # warmstart at k=4: perturbs the previous round's trees into valid ICs
    ics = warmstart_multistep(
        k4, ub, num_restarts=3, raw_samples=6, full_optimizer=full4,
        key=jax.random.PRNGKey(2),
    )
    assert ics.shape == (3, n4, 2)
    assert np.isfinite(np.asarray(ics)).all()
    assert (np.asarray(ics) >= -1e-6).all() and (np.asarray(ics) <= 1 + 1e-6).all()
    # extracted actual candidate is a single point in bounds
    cand = k4.extract_candidates(full4[jnp.argmax(v4)])
    assert cand.shape == (1, 2)
