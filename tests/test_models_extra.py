"""Tests: SVGP, pathwise sampling, model lists/converters, CV, transforms,
SAASBO (tiny budgets, reference test style: structural + statistical)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from botorch_tpu.cross_validation import batch_cross_validation, cv_metrics
from botorch_tpu.fit import fit_gp
from botorch_tpu.models.approximate_gp import fit_svgp, make_svgp
from botorch_tpu.models.fully_bayesian import (
    fit_saas_gp,
    load_saas_samples,
    make_saas_potential,
    median_lengthscales,
)
from botorch_tpu.models.gp import make_gp
from botorch_tpu.models.model_list import (
    ModelList,
    batched_to_model_list,
    model_list_to_batched,
)
from botorch_tpu.models.transforms import (
    Bilog,
    ChainedInputTransform,
    InputStandardize,
    Log10,
    Normalize,
    OneHotToNumeric,
    Round,
    Warp,
)
from botorch_tpu.sampling.pathwise import draw_matheron_paths


def _data(n=15, d=2, seed=0):
    rng = np.random.default_rng(seed)
    X = jnp.asarray(rng.uniform(size=(n, d)), jnp.float32)
    Y = jnp.asarray(np.sin(4 * np.asarray(X)).sum(-1), jnp.float32)
    return X, Y


def test_svgp_fits_and_predicts():
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(300, 2)), jnp.float32)
    f = jnp.sin(4 * X[:, 0]) + X[:, 1]
    Y = f + 0.05 * jnp.asarray(rng.normal(size=300), jnp.float32)
    svgp = fit_svgp(make_svgp(X, Y, num_inducing=32), jax.random.PRNGKey(0),
                    steps=200, batch_size=128)
    post = svgp.posterior(X[:50])
    rmse = float(jnp.sqrt(jnp.mean((post.mean[:, 0] - f[:50]) ** 2)))
    assert rmse < 0.2
    assert post.mean.shape == (50, 1)
    assert np.isfinite(np.asarray(post.variance)).all()


def test_pathwise_moments_match_posterior():
    X, Y = _data(n=20)
    model = fit_gp(make_gp(X, Y[:, None]), jax.random.PRNGKey(0),
                   num_restarts=2, maxiter=40)
    paths = draw_matheron_paths(model, jax.random.PRNGKey(1),
                                num_paths=1200, num_features=512)
    Xt = jnp.asarray(np.random.default_rng(1).uniform(size=(6, 2)), jnp.float32)
    vals = np.asarray(paths(Xt))
    post = model.posterior(Xt)
    np.testing.assert_allclose(
        vals.mean(0), np.asarray(post.mean[:, 0]), atol=0.05
    )
    np.testing.assert_allclose(
        vals.var(0), np.asarray(post.variance[:, 0]), atol=0.05
    )
    # determinism of a drawn path
    np.testing.assert_array_equal(np.asarray(paths(Xt)), vals)


def test_svgp_pathwise_moments_match_posterior():
    # variational pathwise conditioning (reference
    # `pathwise/update_strategies.py:41-180`): path moments at test points
    # must match the SVGP posterior within MC error
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(300, 2)), jnp.float32)
    f = jnp.sin(4 * X[:, 0]) + X[:, 1]
    Y = f + 0.05 * jnp.asarray(rng.normal(size=300), jnp.float32)
    svgp = fit_svgp(make_svgp(X, Y, num_inducing=32), jax.random.PRNGKey(0),
                    steps=200, batch_size=128)
    paths = draw_matheron_paths(svgp, jax.random.PRNGKey(1),
                                num_paths=1500, num_features=512)
    Xt = jnp.asarray(rng.uniform(size=(6, 2)), jnp.float32)
    vals = np.asarray(paths(Xt))  # (P, 6)
    post = svgp.posterior(Xt)
    np.testing.assert_allclose(
        vals.mean(0), np.asarray(post.mean[:, 0]), atol=0.08
    )
    pv = np.asarray(post.variance[:, 0])
    assert np.all(np.abs(vals.var(0) - pv) <= 0.05 + 0.15 * pv), (
        vals.var(0), pv
    )
    # determinism of a drawn path
    np.testing.assert_array_equal(np.asarray(paths(Xt)), vals)


def test_model_list_pathwise_paths():
    X, _ = _data()
    Y1, Y2 = jnp.sin(3 * X[:, 0]), jnp.cos(3 * X[:, 1])
    m1 = fit_gp(make_gp(X, Y1[:, None]), jax.random.PRNGKey(0),
                num_restarts=2, maxiter=20)
    m2 = fit_gp(make_gp(X, Y2[:, None]), jax.random.PRNGKey(1),
                num_restarts=2, maxiter=20)
    ml = ModelList(models=(m1, m2))
    paths = draw_matheron_paths(ml, jax.random.PRNGKey(2), num_paths=800,
                                num_features=256)
    Xt = X[:4]
    vals = np.asarray(paths(Xt))  # (P, 4, 2)
    assert vals.shape == (800, 4, 2)
    post = ml.posterior(Xt)
    np.testing.assert_allclose(
        vals.mean(0), np.asarray(post.mean), atol=0.08
    )


def test_model_list_and_converters():
    X, _ = _data()
    Y1, Y2 = jnp.sin(3 * X[:, 0]), jnp.cos(3 * X[:, 1])
    m1 = fit_gp(make_gp(X, Y1[:, None]), jax.random.PRNGKey(0),
                num_restarts=2, maxiter=20)
    m2 = fit_gp(make_gp(X, Y2[:, None]), jax.random.PRNGKey(1),
                num_restarts=2, maxiter=20)
    ml = ModelList(models=(m1, m2))
    assert ml.num_outputs == 2
    post = ml.posterior(X[:3])
    batched = model_list_to_batched(ml)
    pb = batched.posterior(X[:3])
    np.testing.assert_allclose(
        np.asarray(pb.mean), np.asarray(post.mean), atol=1e-5
    )
    ml2 = batched_to_model_list(batched)
    np.testing.assert_allclose(
        np.asarray(ml2.posterior(X[:3]).mean), np.asarray(post.mean),
        atol=1e-5,
    )


def test_cross_validation():
    X, Y = _data(n=10)
    cv = batch_cross_validation(X, Y[:, None], jax.random.PRNGKey(0),
                                fit_maxiter=15)
    metrics = cv_metrics(cv)
    assert cv.mean.shape == (10, 1)
    assert np.isfinite(float(metrics["rmse"]))
    assert 0.0 <= float(metrics["coverage95"]) <= 1.0


def test_input_transforms_roundtrip():
    X = jnp.asarray(np.random.default_rng(0).uniform(0.1, 0.9, (7, 3)),
                    jnp.float32)
    for t in [
        Normalize(bounds=jnp.asarray([[0.0, 0.0, 0.0], [2.0, 1.0, 3.0]])),
        InputStandardize.fit(X),
        Warp.init(3),
        Log10(indices=(0,)),
    ]:
        Xr = t.untransform(t.transform(X))
        np.testing.assert_allclose(np.asarray(Xr), np.asarray(X), atol=1e-4)


def test_chained_and_round():
    X = jnp.asarray([[0.4, 2.6], [0.5, 1.2]])
    chain = ChainedInputTransform(
        transforms=(Round(integer_indices=(1,)),)
    )
    out = np.asarray(chain.transform(X))
    np.testing.assert_allclose(out[:, 1], [3.0, 1.0])
    # STE: gradient of rounded coordinate is identity
    g = jax.grad(lambda x: jnp.sum(chain.transform(x)))(X)
    np.testing.assert_allclose(np.asarray(g), 1.0)


def test_one_hot_to_numeric_roundtrip():
    t = OneHotToNumeric(categorical_features=((1, 3),))
    X = jnp.asarray([[0.5, 0.0, 1.0, 0.0], [0.2, 0.0, 0.0, 1.0]])
    num = t.transform(X)
    np.testing.assert_allclose(np.asarray(num), [[0.5, 1.0], [0.2, 2.0]])
    back = t.untransform(num)
    np.testing.assert_allclose(np.asarray(back), np.asarray(X))


def test_outcome_transforms():
    Y = jnp.asarray([-2.0, 0.5, 3.0])
    b = Bilog()
    np.testing.assert_allclose(
        np.asarray(b.untransform(b.transform(Y))), np.asarray(Y), atol=1e-5
    )


def test_saas_potential_finite_and_shrinkage():
    rng = np.random.default_rng(0)
    n, d = 14, 6
    X = jnp.asarray(rng.uniform(size=(n, d)), jnp.float32)
    Y = jnp.asarray(np.sin(6 * np.asarray(X[:, 0])), jnp.float32)  # only dim 0
    pot, z_dim, infer = make_saas_potential(
        X, (Y - Y.mean()) / Y.std()
    )
    z = jnp.zeros((z_dim,))
    v, g = jax.value_and_grad(pot)(z)
    assert np.isfinite(float(v))
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.slow
def test_saas_fit_tiny_budget():
    """Tiny-budget NUTS structural test (reference pattern:
    `test_fully_bayesian.py:232-233` uses warmup 8 / samples 5)."""
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(12, 4)), jnp.float32)
    Y = jnp.asarray(np.sin(6 * np.asarray(X[:, 0])), jnp.float32)
    model, stats = fit_saas_gp(
        X, Y, jax.random.PRNGKey(0),
        num_warmup=16, num_samples=16, thinning=4, num_chains=2,
        max_depth=4,
    )
    S = model.params.mean.shape[0]
    assert S == 4  # (num_samples / num_chains) / thinning * num_chains
    assert model.kernel == "matern52" and model.use_outputscale
    ml = median_lengthscales(model)
    assert ml.shape == (4,)
    post = model.posterior(X[:3])
    assert post.mean.shape == (S, 3, 1)


@pytest.mark.slow
def test_nuts_saas_posterior_matches_independent_sampler():
    """Statistical parity: NUTS marginal quantiles on a tiny SAAS
    posterior agree with a long-run random-walk Metropolis chain on the
    SAME potential (the 'SAASBO posteriors within MC error' requirement,
    validated against an independent sampler)."""
    rng = np.random.default_rng(0)
    n, d = 12, 3
    X = jnp.asarray(rng.uniform(size=(n, d)), jnp.float32)
    Yv = jnp.sin(6 * X[:, 0])
    Ys = (Yv - Yv.mean()) / Yv.std()
    pot, z_dim, _ = make_saas_potential(X, Ys)
    pot_j = jax.jit(pot)

    z = np.r_[0.0, 0.0, np.log(0.01), np.log(0.1), np.zeros(d)].astype(
        np.float32
    )
    lp = -float(pot_j(jnp.asarray(z)))
    kept = []
    for t in range(20000):
        prop = z + 0.25 * rng.normal(size=z_dim).astype(np.float32)
        lp_p = -float(pot_j(jnp.asarray(prop)))
        if np.log(rng.uniform()) < lp_p - lp:
            z, lp = prop, lp_p
        if t > 4000 and t % 8 == 0:
            kept.append(z.copy())
    rwm = np.asarray(kept)
    rwm_log_ls = -0.5 * (rwm[:, 3:4] + rwm[:, 4:4 + d])

    model, _ = fit_saas_gp(
        X, Yv, jax.random.PRNGKey(0),
        num_warmup=128, num_samples=256, thinning=2, num_chains=4,
    )
    nuts_log_ls = np.log(np.asarray(model.params.lengthscale[:, 0, :]))
    for j in range(d):
        qn = np.quantile(nuts_log_ls[:, j], [0.25, 0.5, 0.75])
        qr = np.quantile(rwm_log_ls[:, j], [0.25, 0.5, 0.75])
        np.testing.assert_allclose(qn, qr, atol=0.35)


def test_deterministic_models():
    """`models/deterministic.py` (reference `deterministic.py:59-200`)."""
    from botorch_tpu.models.deterministic import (
        AffineDeterministicModel,
        GenericDeterministicModel,
        PosteriorMeanModel,
        make_fixed_single_sample_model,
    )

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(12, 2)), jnp.float32)
    Y = jnp.sin(3 * X[:, :1])
    model = fit_gp(make_gp(X, Y), jax.random.PRNGKey(0), num_restarts=2,
                   maxiter=20)

    gm = GenericDeterministicModel(
        f=lambda X: jnp.sum(X, -1, keepdims=True), num_outputs=1
    )
    p = gm.posterior(X[:3])
    np.testing.assert_allclose(
        np.asarray(p.mean[:, 0]), np.asarray(X[:3].sum(-1)), rtol=1e-6
    )
    assert float(p.variance.max()) == 0.0

    am = AffineDeterministicModel(
        a=jnp.asarray([[1.0], [2.0]]), b=jnp.asarray([0.5])
    )
    np.testing.assert_allclose(
        np.asarray(am.posterior(X[:2]).mean[:, 0]),
        np.asarray(X[:2, 0] + 2 * X[:2, 1] + 0.5), rtol=1e-6,
    )

    pm = PosteriorMeanModel(model=model)
    assert float(pm.posterior(X[:3]).variance.max()) == 0.0
    np.testing.assert_allclose(
        np.asarray(pm.posterior(X[:3]).mean),
        np.asarray(model.posterior(X[:3]).mean), rtol=1e-6,
    )

    fs = make_fixed_single_sample_model(model, jax.random.PRNGKey(1))
    assert bool(jnp.allclose(fs.posterior(X[:3]).mean,
                             fs.posterior(X[:3]).mean))


def test_mc_samplers():
    """`sampling/samplers.py`: base-sample recipes; qMC beats iid on
    moment accuracy (reference `sampling/normal.py:134,169`)."""
    from botorch_tpu.sampling.samplers import (
        ForkedRNGSampler,
        IIDNormalSampler,
        ListSampler,
        SobolQMCNormalSampler,
        get_sampler,
    )

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(12, 2)), jnp.float32)
    Y = jnp.sin(3 * X[:, :1])
    model = fit_gp(make_gp(X, Y), jax.random.PRNGKey(0), num_restarts=2,
                   maxiter=20)
    post = model.posterior(X[:4])

    s_iid = IIDNormalSampler(sample_shape=(2048,), seed=0)(post)
    s_qmc = SobolQMCNormalSampler(sample_shape=(2048,), seed=0)(post)
    assert s_iid.shape == s_qmc.shape == (2048, 4, 1)
    err_iid = float(jnp.abs(s_iid.mean(0) - post.mean).max())
    err_qmc = float(jnp.abs(s_qmc.mean(0) - post.mean).max())
    assert err_qmc < err_iid
    assert err_qmc < 1e-4
    assert float(jnp.abs(s_qmc.var(0) - post.variance).max()) < 1e-4

    f = ForkedRNGSampler(sample_shape=(8,), seed=3)
    assert bool(jnp.allclose(f(post), f(post)))
    ls = ListSampler(samplers=(IIDNormalSampler((8,)),
                               SobolQMCNormalSampler((8,))))
    outs = ls([post, post])
    assert all(o.shape == (8, 4, 1) for o in outs)
    assert type(get_sampler(post, (64,))).__name__ == "SobolQMCNormalSampler"


def test_transformed_posterior_lognormal_moments():
    """`posteriors/transformed.py` (reference `transformed.py:16`): MC
    moments of the exp push-forward match the lognormal closed forms."""
    from botorch_tpu.posteriors.transformed import exp_transformed

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(12, 2)), jnp.float32)
    Y = jnp.sin(3 * X[:, :1])
    model = fit_gp(make_gp(X, Y), jax.random.PRNGKey(0), num_restarts=2,
                   maxiter=20)
    tp = exp_transformed(model.posterior(X[:4]))
    s = tp.rsample(jax.random.PRNGKey(0), (100000,))
    assert float(jnp.abs(s.mean(0) - tp.mean).max()) < 1e-4
    assert float(jnp.abs(s.var(0) - tp.variance).max()) < 1e-4
    assert tp.q == 4 and tp.num_outputs == 1


def test_gaussian_mixture_posterior_helpers():
    """`posteriors/fully_bayesian.py` (reference `fully_bayesian.py:82`):
    mixture moments and bisection quantiles match Monte Carlo over the
    SAAS ensemble."""
    from botorch_tpu.posteriors.fully_bayesian import (
        mixture_covariance,
        mixture_mean,
        mixture_quantile,
        mixture_variance,
    )

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(20, 4)), jnp.float32)
    Y = jnp.sin(3 * X[:, 0]) + 0.1 * jnp.asarray(rng.normal(size=20),
                                                 jnp.float32)
    m, _ = fit_saas_gp(X, Y, jax.random.PRNGKey(0), num_warmup=128,
                       num_samples=64, thinning=8, num_chains=4)
    Xq = jnp.asarray(rng.uniform(size=(5, 4)), jnp.float32)
    post = m.posterior(Xq)
    mm, mv = mixture_mean(post), mixture_variance(post)
    s = post.rsample(jax.random.PRNGKey(1), (4000,))
    s = s.reshape(-1, *s.shape[-2:])
    assert float(jnp.abs(s.mean(0) - mm).max()) < 0.02
    assert float(jnp.abs(s.var(0) - mv).max()) < 0.02
    for p in (0.1, 0.5, 0.9):
        qv = mixture_quantile(post, p)
        emp = jnp.quantile(s, p, axis=0)
        assert float(jnp.abs(emp - qv).max()) < 0.05
    mc = mixture_covariance(post)
    np.testing.assert_allclose(
        np.swapaxes(np.diagonal(np.asarray(mc), axis1=-2, axis2=-1), -1, -2),
        np.asarray(mv), rtol=1e-5, atol=1e-6,
    )


def test_pairwise_mc_samplers():
    """`sampling/samplers.py` pairwise samplers (reference
    `sampling/pairwise_samplers.py:20-110`): utility draws become
    winner-first comparison index pairs over a static pair set."""
    from botorch_tpu.sampling.samplers import (
        PairwiseIIDNormalSampler,
        PairwiseSobolQMCNormalSampler,
    )

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(12, 2)), jnp.float32)
    Y = jnp.sin(3 * X[:, :1])
    model = fit_gp(make_gp(X, Y), jax.random.PRNGKey(0), num_restarts=2,
                   maxiter=20)
    post = model.posterior(X[:5])

    for cls in (PairwiseIIDNormalSampler, PairwiseSobolQMCNormalSampler):
        comps = cls(sample_shape=(64,), seed=0)(post)
        assert comps.shape == (64, 10, 2)  # C(5,2) pairs, winner-first
        assert comps.dtype == jnp.int32
        assert bool((comps[..., 0] != comps[..., 1]).all())
        # subsampling yields a static smaller pair set, valid indices
        sub = cls(sample_shape=(16,), seed=1, max_num_comparisons=4)(post)
        assert sub.shape == (16, 4, 2)
        assert int(sub.max()) < 5 and int(sub.min()) >= 0

    # winner really has the larger sampled utility
    s = PairwiseIIDNormalSampler(sample_shape=(8,), seed=2)
    comps = s(post)
    z = jax.random.normal(jax.random.PRNGKey(2), (8, *post.base_sample_shape))
    util = post.rsample_from_base_samples(z)[..., 0]
    win = jnp.take_along_axis(util, comps[..., 0], axis=-1)
    lose = jnp.take_along_axis(util, comps[..., 1], axis=-1)
    assert bool((win >= lose).all())

    # multi-output posteriors are rejected (the reference's single-output
    # contract, pairwise_samplers.py:44-45), not silently mis-compared
    Y2 = jnp.concatenate([Y, jnp.cos(2 * X[:, :1])], axis=-1)
    m2 = fit_gp(make_gp(X, Y2), jax.random.PRNGKey(0), num_restarts=1,
                maxiter=10)
    with pytest.raises(ValueError, match="single-output"):
        PairwiseIIDNormalSampler(sample_shape=(4,))(m2.posterior(X[:4]))
