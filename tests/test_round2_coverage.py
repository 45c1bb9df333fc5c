"""Round-2 coverage: dataset containers, truncated-MVN sampling,
MVN QMC engine, acquisition wrappers (prior-guided/decoupled/penalized),
optimize_posterior_samples, and checkpoint round-trips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from botorch_tpu.models.gp import make_gp
from botorch_tpu.utils.datasets import (
    ContextualDataset,
    FixedNoiseDataset,
    MultiTaskDataset,
    RankingDataset,
    SupervisedDataset,
)

RNG = np.random.default_rng(0)


def _model(n=12, d=2, seed=0):
    rng = np.random.default_rng(seed)
    X = jnp.asarray(rng.uniform(size=(n, d)), jnp.float32)
    Y = jnp.asarray(np.sin(3 * np.asarray(X)).sum(-1), jnp.float32)[:, None]
    return make_gp(X, Y), X, Y


# ------------------------------ datasets ----------------------------------- #


def test_dataset_validation_and_defaults():
    X = jnp.zeros((5, 3))
    Y = jnp.zeros((5,))
    ds = SupervisedDataset.make(X, Y)
    assert ds.Y.shape == (5, 1)
    assert ds.feature_names == ("x0", "x1", "x2")
    assert ds.outcome_names == ("y0",)
    assert ds.n == 5 and ds.dim == 3
    with pytest.raises(ValueError, match="same number of rows"):
        SupervisedDataset.make(X, jnp.zeros((4,)))
    with pytest.raises(ValueError, match="Yvar"):
        SupervisedDataset.make(X, Y, Yvar=jnp.zeros((5, 2)))
    with pytest.raises(ValueError, match="feature_names"):
        SupervisedDataset.make(X, Y, feature_names=("a",))
    with pytest.raises(ValueError, match="requires Yvar"):
        FixedNoiseDataset.make(X, Y, None)


def test_multitask_and_ranking_datasets():
    d1 = SupervisedDataset.make(jnp.zeros((3, 2)), jnp.zeros((3,)))
    d2 = SupervisedDataset.make(jnp.ones((4, 2)), jnp.ones((4,)))
    mt = MultiTaskDataset(datasets=(d1, d2), target_task=0)
    Xj = mt.joint_X()
    assert Xj.shape == (7, 3)
    np.testing.assert_allclose(np.asarray(Xj[:3, -1]), 0.0)
    np.testing.assert_allclose(np.asarray(Xj[3:, -1]), 1.0)
    assert mt.joint_Y().shape == (7, 1)

    rd = RankingDataset(
        X=jnp.zeros((4, 2)), comparisons=jnp.asarray([[0, 1], [2, 3]])
    )
    assert rd.n == 4 and rd.comparisons.shape == (2, 2)


def test_contextual_dataset_validation():
    X = jnp.asarray(RNG.uniform(size=(6, 4)), jnp.float32)
    names = ("c0_a", "c0_b", "c1_a", "c1_b")
    d1 = SupervisedDataset.make(X, jnp.zeros((6,)), feature_names=names)
    d2 = SupervisedDataset.make(X, jnp.ones((6,)), feature_names=names)
    cd = ContextualDataset.make(
        (d1, d2),
        parameter_decomposition={
            "c0": ["c0_a", "c0_b"], "c1": ["c1_a", "c1_b"]
        },
    )
    assert len(cd.datasets) == 2
    bad = SupervisedDataset.make(
        jnp.asarray(RNG.uniform(size=(6, 4)), jnp.float32),
        jnp.zeros((6,)), feature_names=names,
    )
    with pytest.raises(ValueError, match="share the same X"):
        ContextualDataset.make(
            (d1, bad),
            parameter_decomposition={
                "c0": ["c0_a", "c0_b"], "c1": ["c1_a", "c1_b"]
            },
        )


# ------------------------------ truncated MVN ------------------------------ #


def test_sample_truncated_mvn_respects_constraints():
    from botorch_tpu.utils.lin_ess import sample_truncated_mvn

    rng = np.random.default_rng(3)
    d = 3
    A_ = rng.normal(size=(d, d))
    cov = jnp.asarray(A_ @ A_.T / d + 0.5 * np.eye(d), jnp.float32)
    mean = jnp.asarray([0.5, -0.2, 0.1], jnp.float32)
    # constraints: x0 <= 0.4, x1 >= -0.5  (i.e. -x1 <= 0.5)
    A = jnp.asarray([[1.0, 0.0, 0.0], [0.0, -1.0, 0.0]], jnp.float32)
    b = jnp.asarray([0.4, 0.5], jnp.float32)
    x0 = jnp.asarray([0.0, 0.0, 0.0], jnp.float32)
    xs = sample_truncated_mvn(
        mean, cov, A, b, x0, jax.random.PRNGKey(0), num_samples=256
    )
    assert xs.shape == (256, d)
    viol = np.asarray(xs) @ np.asarray(A).T - np.asarray(b)
    assert viol.max() <= 1e-4


# ------------------------------ QMC engine --------------------------------- #


def test_mvn_qmc_engine_moments():
    from botorch_tpu.sampling.qmc import MultivariateNormalQMCEngine

    rng = np.random.default_rng(5)
    B = rng.normal(size=(3, 3))
    cov = B @ B.T + 0.5 * np.eye(3)
    mean = np.asarray([1.0, -2.0, 0.5])
    eng = MultivariateNormalQMCEngine(
        mean=jnp.asarray(mean, jnp.float32),
        cov=jnp.asarray(cov, jnp.float32),
        seed=0,
    )
    draws = np.asarray(eng.draw(4096))
    np.testing.assert_allclose(draws.mean(0), mean, atol=0.05)
    np.testing.assert_allclose(np.cov(draws.T), cov, atol=0.15)


# ------------------------------ wrappers ----------------------------------- #


def test_prior_guided_and_penalized_wrappers():
    from botorch_tpu.acquisition.analytic import make_acqf
    from botorch_tpu.acquisition.wrappers import (
        PenalizedAcquisitionFunction,
        PriorGuidedAcquisitionFunction,
        l2_penalty,
    )

    model, X, Y = _model()
    base = make_acqf("LogEI", model, best_f=float(Y.max()))
    Xq = jnp.asarray([[0.3, 0.7]], jnp.float32)

    prior = lambda X: -10.0 * jnp.sum((X - 0.5) ** 2, axis=-1)
    pg_log = PriorGuidedAcquisitionFunction(
        acqf=base, prior_log_prob=prior, exponent=1.0, log=True
    )
    expected = float(base(Xq)) + float(prior(Xq).sum())
    np.testing.assert_allclose(float(pg_log(Xq)), expected, rtol=1e-5)

    pen = PenalizedAcquisitionFunction(
        acqf=base, penalty=l2_penalty(jnp.asarray([0.5, 0.5])),
        regularization_parameter=2.0,
    )
    l2 = float(jnp.sum((Xq[0] - 0.5) ** 2))
    np.testing.assert_allclose(
        float(pen(Xq)), float(base(Xq)) - 2.0 * l2, rtol=1e-5
    )


# ------------------------------ TS argmax helper --------------------------- #


def test_optimize_posterior_samples_beats_grid():
    from botorch_tpu.sampling.pathwise import draw_matheron_paths
    from botorch_tpu.utils.sampling import optimize_posterior_samples

    model, X, Y = _model(n=16)
    bounds = jnp.stack([jnp.zeros(2), jnp.ones(2)])
    path = draw_matheron_paths(model, jax.random.PRNGKey(0), num_paths=1)
    path_fn = lambda Xc: path(Xc)[0]
    x_opt, f_opt = optimize_posterior_samples(
        path_fn, bounds, jax.random.PRNGKey(1), raw_samples=256,
        num_restarts=4, maxiter=30,
    )
    assert x_opt.shape == (2,)
    assert bool(jnp.all((x_opt >= 0) & (x_opt <= 1)))
    # the L-BFGS-refined optimum must beat the best screening candidate
    grid = jnp.asarray(RNG.uniform(size=(512, 2)), jnp.float32)
    assert float(f_opt) >= float(path_fn(grid).max()) - 1e-3


# ------------------------------ checkpoint --------------------------------- #


def test_checkpoint_round_trip(tmp_path):
    from botorch_tpu.checkpoint import load, save

    model, X, Y = _model()
    path = str(tmp_path / "model.ckpt")
    save(path, model)
    restored = load(path, model)
    np.testing.assert_allclose(
        np.asarray(restored.params.raw_lengthscale),
        np.asarray(model.params.raw_lengthscale),
    )
    np.testing.assert_allclose(np.asarray(restored.X), np.asarray(model.X))
