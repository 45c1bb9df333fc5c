"""Tests: pairwise GP, multitask GP, contextual GPs, HOGP, mixed/fidelity
kernels, community components, JES, multi-step lookahead, factory."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from botorch_tpu.acquisition.factory import get_acquisition_function
from botorch_tpu.acquisition.joint_entropy_search import make_jes
from botorch_tpu.acquisition.multi_step_lookahead import make_multistep
from botorch_tpu.acquisition.parego import make_qlognparego
from botorch_tpu.community import (
    hellinger_gaussian,
    qBayesianQueryByComittee,
    wasserstein_gaussian,
)
from botorch_tpu.fit import fit_gp
from botorch_tpu.models.contextual import fit_sac_gp, make_sac_gp
from botorch_tpu.models.gp import make_gp
from botorch_tpu.models.higher_order_gp import fit_hogp, make_hogp
from botorch_tpu.models.multitask import fit_multitask_gp, make_multitask_gp
from botorch_tpu.models.pairwise_gp import (
    AnalyticExpectedUtilityOfBestOption,
    fit_pairwise_gp,
    make_pairwise_gp,
)


@functools.lru_cache(maxsize=2)
def _single_model(seed=0):
    rng = np.random.default_rng(seed)
    X = jnp.asarray(rng.uniform(size=(14, 2)), jnp.float32)
    Y = jnp.asarray(
        np.sin(5 * np.asarray(X[:, 0])) + np.asarray(X[:, 1]), jnp.float32
    )
    model = fit_gp(make_gp(X, Y[:, None]), jax.random.PRNGKey(seed),
                   num_restarts=2, maxiter=25)
    return model, X, Y


def test_pairwise_gp_learns_utilities():
    rng = np.random.default_rng(0)
    n = 20
    X = jnp.asarray(rng.uniform(size=(n, 2)), jnp.float32)
    util = np.asarray(jnp.sin(4 * X[:, 0]) + X[:, 1])
    comps = []
    for _ in range(50):
        i, j = rng.choice(n, 2, replace=False)
        comps.append((i, j) if util[i] > util[j] else (j, i))
    model = fit_pairwise_gp(make_pairwise_gp(X, np.asarray(comps)), maxiter=25)
    corr = np.corrcoef(np.asarray(model.f_map), util)[0, 1]
    assert corr > 0.6
    eubo = AnalyticExpectedUtilityOfBestOption(model=model)
    assert np.isfinite(float(eubo(X[:2])))


def test_multitask_transfer():
    rng = np.random.default_rng(0)
    f = lambda x: np.sin(5 * x[:, 0])
    X0 = rng.uniform(size=(6, 1))
    X1 = rng.uniform(size=(24, 1))
    X = np.concatenate([
        np.concatenate([X0, np.zeros((6, 1))], 1),
        np.concatenate([X1, np.ones((24, 1))], 1),
    ])
    Y = np.concatenate([f(X0), f(X1) + 0.3])
    model = fit_multitask_gp(
        make_multitask_gp(jnp.asarray(X, jnp.float32),
                          jnp.asarray(Y, jnp.float32), task_feature=1,
                          num_tasks=2), maxiter=40,
    )
    Xt = jnp.asarray(rng.uniform(size=(30, 1)), jnp.float32)
    post = model.posterior(Xt, task=0)
    rmse = float(jnp.sqrt(jnp.mean(
        (post.mean[:, 0] - jnp.asarray(f(np.asarray(Xt)))) ** 2
    )))
    assert rmse < 0.15
    # learned task correlation should be strongly positive
    tc = np.asarray(model.task_covar)
    assert tc[0, 1] / np.sqrt(tc[0, 0] * tc[1, 1]) > 0.5


def test_multitask_lkj_prior():
    # LKJ task-covariance prior (reference `multitask.py:364-373`): fit
    # must work with and without it, the prior must change the MAP
    # objective, and transfer quality must hold under the prior.
    rng = np.random.default_rng(0)
    f = lambda x: np.sin(5 * x[:, 0])
    X0 = rng.uniform(size=(6, 1))
    X1 = rng.uniform(size=(24, 1))
    X = np.concatenate([
        np.concatenate([X0, np.zeros((6, 1))], 1),
        np.concatenate([X1, np.ones((24, 1))], 1),
    ])
    Y = np.concatenate([f(X0), f(X1) + 0.3])
    Xj = jnp.asarray(X, jnp.float32)
    Yj = jnp.asarray(Y, jnp.float32)
    m_plain = make_multitask_gp(Xj, Yj, task_feature=1, num_tasks=2)
    m_lkj = make_multitask_gp(Xj, Yj, task_feature=1, num_tasks=2,
                              lkj_eta=0.5)
    # identical data/params, different priors -> different MAP objective
    lp_plain = float(m_plain.log_prior())
    lp_lkj = float(m_lkj.log_prior())
    assert np.isfinite(lp_plain) and np.isfinite(lp_lkj)
    assert abs(lp_plain - lp_lkj) > 1e-4
    fitted = fit_multitask_gp(m_lkj, maxiter=40)
    assert fitted.lkj_eta == 0.5  # static field survives the fit
    Xt = jnp.asarray(rng.uniform(size=(30, 1)), jnp.float32)
    post = fitted.posterior(Xt, task=0)
    rmse = float(jnp.sqrt(jnp.mean(
        (post.mean[:, 0] - jnp.asarray(f(np.asarray(Xt)))) ** 2
    )))
    assert rmse < 0.15
    tc = np.asarray(fitted.task_covar)
    assert tc[0, 1] / np.sqrt(tc[0, 0] * tc[1, 1]) > 0.5


def test_model_dict_container():
    from botorch_tpu.models import ModelDict
    from botorch_tpu.models.gp import make_gp

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(8, 2)), jnp.float32)
    m1 = make_gp(X, jnp.sin(3 * X[:, :1]))
    m2 = make_gp(X, jnp.cos(3 * X[:, :1]))
    md = ModelDict(models={"obj": m1, "con": m2})
    assert set(md.keys()) == {"obj", "con"}
    assert "obj" in md and len(md) == 2
    post = md["obj"].posterior(X[:3])
    assert post.mean.shape == (3, 1)
    # pytree: jit through the container
    mean = jax.jit(lambda d: d["con"].posterior(X[:2]).mean)(md)
    assert mean.shape == (2, 1)


def test_contextual_sac():
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(25, 4)), jnp.float32)
    Y = jnp.sin(4 * X[:, 0]) * X[:, 1] + jnp.cos(4 * X[:, 2]) * X[:, 3]
    sac = fit_sac_gp(make_sac_gp(X, Y, {"a": [0, 1], "b": [2, 3]}), maxiter=40)
    Xt = jnp.asarray(rng.uniform(size=(20, 4)), jnp.float32)
    Yt = jnp.sin(4 * Xt[:, 0]) * Xt[:, 1] + jnp.cos(4 * Xt[:, 2]) * Xt[:, 3]
    post = sac.posterior(Xt)
    rmse = float(jnp.sqrt(jnp.mean((post.mean[:, 0] - Yt) ** 2)))
    assert rmse < 0.3 * float(Yt.std())


def test_hogp_kronecker_mll_matches_dense():
    rng = np.random.default_rng(0)
    n = 10
    X = jnp.asarray(rng.uniform(size=(n, 2)), jnp.float32)
    Y = jnp.asarray(rng.normal(size=(n, 2, 2)), jnp.float32)
    model = make_hogp(X, Y)
    o = 4
    Kx = np.asarray(model._Kx(model.X, model.X), np.float64) + 1e-5 * np.eye(n)
    Ko = np.asarray(model._Ko(), np.float64)
    noise = np.exp(float(model.raw_noise))
    Kbig = np.kron(Kx, Ko) + noise * np.eye(n * o)
    y = np.asarray(model.Y, np.float64).reshape(-1)
    sign, logdet = np.linalg.slogdet(Kbig)
    ref = -0.5 * (y @ np.linalg.solve(Kbig, y) + logdet
                  + len(y) * np.log(2 * np.pi))
    assert abs(float(model.mll()) - ref) < 0.02 * abs(ref) + 1.0


def test_hogp_fit_and_posterior_shapes():
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(15, 2)), jnp.float32)
    grid = np.linspace(0, 1, 6)
    Y = jnp.asarray(
        np.sin(3 * np.asarray(X[:, :1]) + grid[None, :]), jnp.float32
    ).reshape(15, 2, 3)
    model = fit_hogp(make_hogp(X, Y), maxiter=30)
    post = model.posterior(X[:4])
    assert post.mean.shape == (4, 6)
    assert bool((np.asarray(post.variance) > 0).all())


def test_mixed_and_fidelity_kernels():
    rng = np.random.default_rng(0)
    Xc = rng.uniform(size=(18, 2))
    cat = rng.integers(0, 3, size=(18, 1))
    X = jnp.asarray(np.concatenate([Xc, cat], -1), jnp.float32)
    Y = jnp.asarray(np.sin(3 * Xc[:, 0]) + 0.5 * cat[:, 0], jnp.float32)
    m = fit_gp(make_gp(X, Y[:, None], kernel="mixed:2", use_outputscale=True),
               jax.random.PRNGKey(0), num_restarts=2, maxiter=25)
    post = m.posterior(X[:4])
    assert np.isfinite(np.asarray(post.mean)).all()
    mf = fit_gp(
        make_gp(X, Y[:, None], kernel="fidelity:2", use_outputscale=True),
        jax.random.PRNGKey(0), num_restarts=2, maxiter=25,
    )
    assert np.isfinite(float(mf.mll()))


def test_jes_prefers_uncertain_optimum_region():
    model, X, Y = _single_model()
    bounds = jnp.stack([jnp.zeros(2), jnp.ones(2)])
    jes = make_jes(model, bounds, jax.random.PRNGKey(1), num_optima=6,
                   num_features=256, raw_samples=128, maxiter=15)
    assert (np.asarray(jes.f_opt) > float(Y.max()) - 0.5).all()
    at_data = float(jes(X[:1]))
    v = float(jes(jnp.asarray([[0.31, 0.99]], jnp.float32)))
    assert v >= at_data - 1e-4


def test_multistep_lookahead():
    model, X, Y = _single_model()
    msl = make_multistep(model, q0=1, q1=1, num_fantasies=6,
                         best_f=float(Y.max()))
    X_full = jnp.asarray(
        np.random.default_rng(2).uniform(size=(7, 2)), jnp.float32
    )
    v = float(msl(X_full))
    g = np.asarray(jax.grad(lambda x: msl(x))(X_full))
    assert np.isfinite(v) and np.isfinite(g).all()
    assert msl.extract_candidates(X_full).shape == (1, 2)


def test_parego():
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(12, 2)), jnp.float32)
    Y = jnp.stack([jnp.sin(3 * X[:, 0]), jnp.cos(3 * X[:, 1])], -1)
    m = fit_gp(make_gp(X, Y), jax.random.PRNGKey(0), num_restarts=2,
               maxiter=20)
    pg = make_qlognparego(m, X, Y, jax.random.PRNGKey(1), q=1, num_samples=32)
    v = float(pg(jnp.asarray([[0.4, 0.6]], jnp.float32)))
    assert np.isfinite(v)


def test_factory_covers_all_names():
    model, X, Y = _single_model()
    for name in ["EI", "LogEI", "PI", "LogPI", "UCB", "PosteriorMean",
                 "qEI", "qLogEI", "qPI", "qSR", "qUCB", "qNEI", "qLogNEI"]:
        acqf = get_acquisition_function(
            name, model, train_X=X, train_Y=Y, num_samples=16
        )
        assert np.isfinite(float(acqf(jnp.asarray([[0.4, 0.6]], jnp.float32)))), name


def test_stat_distances():
    assert float(wasserstein_gaussian(0.0, 1.0, 0.0, 1.0)) == 0.0
    assert float(hellinger_gaussian(0.0, 1.0, 0.0, 1.0)) < 1e-6
    assert float(hellinger_gaussian(0.0, 1.0, 10.0, 1.0)) > 0.99


def test_fully_bayesian_multitask_smoke():
    from botorch_tpu.models.fully_bayesian_multitask import (
        fit_saas_multitask_gp,
    )

    rng = np.random.default_rng(0)
    f = lambda x: np.sin(5 * x[:, 0])
    X0, X1 = rng.uniform(size=(5, 2)), rng.uniform(size=(12, 2))
    X = np.concatenate([
        np.concatenate([X0, np.zeros((5, 1))], 1),
        np.concatenate([X1, np.ones((12, 1))], 1),
    ])
    Y = np.concatenate([f(X0), f(X1) + 0.3])
    model, stats = fit_saas_multitask_gp(
        jnp.asarray(X, jnp.float32), jnp.asarray(Y, jnp.float32),
        task_feature=2, key=jax.random.PRNGKey(0),
        num_warmup=16, num_samples=8, thinning=2, num_chains=2,
        max_depth=4, task_rank=2,
    )
    assert model.batch_shape == (4,)  # (8/2 per chain)/2 thin * 2 chains
    post = model.posterior(jnp.asarray(rng.uniform(size=(3, 2)), jnp.float32),
                           task=0)
    assert post.mean.shape == (4, 3, 1)
    assert np.isfinite(np.asarray(post.mean)).all()


def test_linear_truncated_fidelity_kernel():
    rng = np.random.default_rng(0)
    Xc = rng.uniform(size=(14, 2))
    s = rng.uniform(size=(14, 1))
    X = jnp.asarray(np.concatenate([Xc, s], -1), jnp.float32)
    Y = jnp.asarray(np.sin(3 * Xc[:, 0]) + 0.2 * (1 - s[:, 0]), jnp.float32)
    m = fit_gp(
        make_gp(X, Y[:, None], kernel="lin_trunc_fidelity:2",
                use_outputscale=True),
        jax.random.PRNGKey(0), num_restarts=2, maxiter=20,
    )
    assert np.isfinite(float(m.mll()))
    post = m.posterior(X[:3])
    assert np.isfinite(np.asarray(post.mean)).all()


def test_lcem_transfer_and_embeddings():
    """LCE-M (`contextual_multioutput.py:33`): embedding-based task
    covariance learns cross-context correlation and transfers strength
    from a data-rich context to a sparse one."""
    from botorch_tpu.models.contextual_multioutput import (
        fit_lcem_gp,
        make_lcem_gp,
    )

    rng = np.random.default_rng(0)
    f = lambda x: np.sin(5 * x[:, 0])
    X0 = rng.uniform(size=(5, 1))  # sparse context
    X1 = rng.uniform(size=(25, 1))  # dense context, shifted output
    X = np.concatenate([
        np.concatenate([X0, np.zeros((5, 1))], 1),
        np.concatenate([X1, np.ones((25, 1))], 1),
    ]).astype(np.float32)
    Y = np.concatenate([f(X0), f(X1) + 0.4]).astype(np.float32)
    model = fit_lcem_gp(
        make_lcem_gp(jnp.asarray(X), jnp.asarray(Y), task_feature=1,
                     num_tasks=2, embedding_dim=2),
        maxiter=80,
    )
    tc = np.asarray(model.task_covar)
    assert tc.shape == (2, 2)
    assert tc[0, 1] / np.sqrt(tc[0, 0] * tc[1, 1]) > 0.5
    Xt = jnp.asarray(rng.uniform(size=(30, 1)), jnp.float32)
    post = model.posterior(Xt, task=0)
    rmse = float(jnp.sqrt(jnp.mean(
        (post.mean[:, 0] - jnp.asarray(f(np.asarray(Xt)))) ** 2
    )))
    assert rmse < 0.15
    # given continuous context features concatenate into the embedding
    feats = jnp.asarray(rng.normal(size=(2, 3)), jnp.float32)
    m2 = make_lcem_gp(jnp.asarray(X), jnp.asarray(Y), task_feature=1,
                      num_tasks=2, embedding_dim=1,
                      context_emb_feature=feats)
    assert m2.task_embeddings().shape == (2, 4)
    assert np.isfinite(float(m2.mll()))


def test_kronecker_mtgp_matches_dense():
    """`KroneckerMultiTaskGP` (reference `multitask.py:394`): eigenbasis
    MLL and posterior equal the dense `kron(Kx, Kt)` computation."""
    import math

    from botorch_tpu.models.multitask import (
        fit_kronecker_mtgp,
        make_kronecker_mtgp,
    )

    rng = np.random.default_rng(0)
    n, T, d = 15, 3, 2
    X = jnp.asarray(rng.uniform(size=(n, d)), jnp.float32)
    Y = jnp.stack(
        [jnp.sin(3 * X[:, 0]) + 0.3 * t for t in range(T)], -1
    ) + 0.02 * jnp.asarray(rng.normal(size=(n, T)), jnp.float32)
    m = make_kronecker_mtgp(X, Y)

    Kx = np.asarray(m._Kx(X, X)) + 1e-5 * np.eye(n)
    Kt = np.asarray(m.task_covar) + 1e-6 * np.eye(T)
    Kn = np.kron(Kx, Kt) + float(m.noise) * np.eye(n * T)
    resid = np.asarray(m.Y - m.mean_const).reshape(-1)  # task-fastest
    L = np.linalg.cholesky(Kn)
    z = np.linalg.solve(L, resid)
    mll_dense = -0.5 * (
        z @ z + 2 * np.sum(np.log(np.diag(L))) + n * T * math.log(2 * math.pi)
    )
    assert abs(float(m.mll()) - mll_dense) < 1e-3

    q = 4
    Xq = jnp.asarray(rng.uniform(size=(q, d)), jnp.float32)
    post = m.posterior(Xq)
    Ks_full = np.kron(np.asarray(m._Kx(X, Xq)), Kt)
    Kss_full = np.kron(np.asarray(m._Kx(Xq, Xq)), Kt)
    alpha = np.linalg.solve(Kn, resid)
    mean_dense = (Ks_full.T @ alpha).reshape(q, T) + float(m.mean_const)
    cov_dense = Kss_full - Ks_full.T @ np.linalg.solve(Kn, Ks_full)
    mean_ours = (np.asarray(post.mean) - float(m.Y_loc)) / float(m.Y_scale)
    np.testing.assert_allclose(mean_ours, mean_dense, atol=1e-5)
    cov_ours = np.asarray(post.cov) / float(m.Y_scale) ** 2
    for t in range(T):
        idx = [i * T + t for i in range(q)]
        np.testing.assert_allclose(
            cov_ours[t], cov_dense[np.ix_(idx, idx)], atol=1e-5
        )

    mf = fit_kronecker_mtgp(m, maxiter=50)
    assert float(mf.mll()) > float(m.mll())
    Xt = jnp.asarray(rng.uniform(size=(25, d)), jnp.float32)
    pt = mf.posterior(Xt)
    true = np.stack(
        [np.sin(3 * np.asarray(Xt[:, 0])) + 0.3 * t for t in range(T)], -1
    )
    rmse = float(np.sqrt(np.mean((np.asarray(pt.mean) - true) ** 2)))
    assert rmse < 0.1


def test_hogp_kaxis_matches_dense():
    """k-axis HOGP (`HigherOrderGPKAxis`): per-axis Kronecker eigen
    algebra equals dense kron(Kx, K1, K2) MLL and posterior moments."""
    import math

    from botorch_tpu.models.higher_order_gp import (
        fit_hogp_kaxis,
        make_hogp_kaxis,
    )

    rng = np.random.default_rng(0)
    n, o1, o2, d = 10, 3, 4, 2
    X = jnp.asarray(rng.uniform(size=(n, d)), jnp.float32)
    t1 = np.linspace(0, 1, o1)
    t2 = np.linspace(0, 1, o2)
    Y = (np.sin(3 * np.asarray(X[:, 0]))[:, None, None]
         * np.cos(2 * t1)[None, :, None] * (1 + t2)[None, None, :])
    Y = jnp.asarray(Y + 0.02 * rng.normal(size=Y.shape), jnp.float32)
    m = make_hogp_kaxis(X, Y)

    Kx = np.asarray(m._Kx(X, X)) + 1e-5 * np.eye(n)
    K1 = np.asarray(m._Ko(m.latents1, m.raw_latent_ls1))
    K2 = np.asarray(m._Ko(m.latents2, m.raw_latent_ls2))
    K = np.kron(np.kron(Kx, K1), K2) + float(jnp.exp(m.raw_noise)) * np.eye(
        n * o1 * o2
    )
    resid = np.asarray(m.Y).reshape(-1)
    L = np.linalg.cholesky(K)
    z = np.linalg.solve(L, resid)
    mll_dense = -0.5 * (
        z @ z + 2 * np.sum(np.log(np.diag(L)))
        + n * o1 * o2 * math.log(2 * math.pi)
    )
    assert abs(float(m.mll()) - mll_dense) < 1e-3

    q = 3
    Xq = jnp.asarray(rng.uniform(size=(q, d)), jnp.float32)
    post = m.posterior(Xq)
    Ks = np.kron(np.kron(np.asarray(m._Kx(X, Xq)), K1), K2)
    Kss = np.kron(np.kron(np.asarray(m._Kx(Xq, Xq)), K1), K2)
    alpha = np.linalg.solve(K, resid)
    mean_dense = (Ks.T @ alpha).reshape(q, o1 * o2)
    var_dense = (
        np.diag(Kss) - np.sum(Ks * np.linalg.solve(K, Ks), axis=0)
    ).reshape(q, o1 * o2)
    mean_ours = (np.asarray(post.mean) - float(m.Y_loc)) / float(m.Y_scale)
    var_ours = np.asarray(post.variance) / float(m.Y_scale) ** 2
    np.testing.assert_allclose(mean_ours, mean_dense, atol=1e-5)
    np.testing.assert_allclose(var_ours, var_dense, atol=1e-5)

    mf = fit_hogp_kaxis(m, maxiter=40)
    assert float(mf.mll()) > float(m.mll())


def test_learned_kernel_weights():
    """Composite-kernel mixture weights are learned (reference
    `MixedSingleTaskGP` ScaleKernel outputscales; OAK `coeffs_1/coeffs_2`):
    fitting moves them away from the defaults and improves the MAP
    objective, and the converters preserve them."""
    from botorch_tpu.models.model_list import (
        batched_to_model_list,
        model_list_to_batched,
    )
    from botorch_tpu.ops.kernels import kernel_num_weights

    rng = np.random.default_rng(3)
    Xc = rng.uniform(size=(24, 2))
    cat = rng.integers(0, 2, size=(24, 1))
    X = jnp.asarray(np.concatenate([Xc, cat], -1), jnp.float32)
    # pure-additive ground truth: the sum kernel should win the weights
    Y = jnp.asarray(np.sin(4 * Xc[:, 0]) + 2.0 * cat[:, 0], jnp.float32)

    m0 = make_gp(X, Y[:, None], kernel="mixed:2")
    assert m0.params.raw_kernel_weights.shape == (2, 1)
    loss0 = float(m0.map_objective(m0.params))
    m = fit_gp(m0, jax.random.PRNGKey(0), num_restarts=4, maxiter=60)
    assert float(m.map_objective(m.params)) < loss0
    w = np.exp(np.asarray(m.params.raw_kernel_weights))[:, 0]
    assert not np.allclose(w, 0.5, atol=1e-3)  # moved off the default

    # OAK weight counts
    assert kernel_num_weights("oak", 3) == 3
    assert kernel_num_weights("oak2", 3) == 6
    moak = make_gp(jnp.asarray(Xc, jnp.float32), Y[:, None], kernel="oak")
    assert moak.params.raw_kernel_weights.shape == (2, 1)
    moak = fit_gp(moak, jax.random.PRNGKey(1), num_restarts=2, maxiter=40)
    assert np.isfinite(float(moak.mll()))

    ml = batched_to_model_list(m)
    rt = model_list_to_batched(ml)
    assert np.allclose(
        np.asarray(rt.params.raw_kernel_weights),
        np.asarray(m.params.raw_kernel_weights),
    )
