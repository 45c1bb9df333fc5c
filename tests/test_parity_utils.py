"""Tests: small parity utilities — lognormal moment maps
(`models/transforms/utils.py`), `scalarize_posterior`
(`posteriors/gpytorch.py:192`), task-value remapping
(`models/multitask.py:87`), batch-shape helpers
(`utils/transforms.py:196-339`), and exception aliases."""

import jax
import jax.numpy as jnp
import numpy as np

from botorch_tpu.models.gp import make_gp
from botorch_tpu.models.transforms import (
    lognorm_to_norm,
    norm_to_lognorm,
    norm_to_lognorm_mean,
    norm_to_lognorm_variance,
)
from botorch_tpu.posteriors.gaussian import GaussianPosterior, scalarize_posterior
from botorch_tpu.utils.transforms import (
    is_ensemble,
    is_fully_bayesian,
    match_batch_shape,
    standardize_moments,
)


def test_lognorm_norm_roundtrip_and_mc():
    mu = jnp.asarray([0.1, -0.3])
    Cov = jnp.asarray([[0.2, 0.05], [0.05, 0.3]])
    m_ln, C_ln = norm_to_lognorm(mu, Cov)
    mu2, Cov2 = lognorm_to_norm(m_ln, C_ln)
    # atol TPU-recalibrated (r5 on-chip sweep): the exp/log(1+x)
    # roundtrip hits TPU f32 transcendental rounding at ~4e-5 abs
    # (CPU: <1e-6); same class as the six r4 recalibrations (d2f055c).
    np.testing.assert_allclose(np.asarray(mu2), np.asarray(mu), atol=2e-4)
    np.testing.assert_allclose(np.asarray(Cov2), np.asarray(Cov), atol=2e-4)
    rng = np.random.default_rng(0)
    Z = rng.multivariate_normal(np.asarray(mu), np.asarray(Cov), size=300000)
    E = np.exp(Z)
    np.testing.assert_allclose(E.mean(0), np.asarray(m_ln), rtol=5e-3)
    np.testing.assert_allclose(np.cov(E.T), np.asarray(C_ln), rtol=3e-2)
    var = jnp.diagonal(Cov)
    # rtol TPU-recalibrated alongside the roundtrip above: TPU f32 exp
    # differs from numpy's by ~3e-6 rel (measured r5 on-chip sweep).
    np.testing.assert_allclose(
        np.asarray(norm_to_lognorm_mean(mu, var)),
        np.exp(np.asarray(mu) + np.asarray(var) / 2),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(norm_to_lognorm_variance(mu, var)),
        np.exp(2 * np.asarray(mu) + np.asarray(var))
        * (np.exp(np.asarray(var)) - 1),
        rtol=1e-5,
    )


def test_scalarize_posterior():
    mean = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])  # (q=2, m=2)
    cov = jnp.stack([jnp.eye(2) * 0.5, jnp.eye(2) * 2.0])  # (m, q, q)
    sp = scalarize_posterior(
        GaussianPosterior(mean=mean, cov=cov), jnp.asarray([1.0, -2.0]), 0.5
    )
    np.testing.assert_allclose(np.asarray(sp.mean[..., 0]), [-2.5, -4.5])
    np.testing.assert_allclose(np.asarray(sp.variance[..., 0]), [8.5, 8.5])


def test_task_value_remapping_in_multitask_gp():
    from botorch_tpu.models.multitask import (
        fit_multitask_gp,
        get_task_value_remapping,
        make_multitask_gp,
    )

    X = np.random.default_rng(1).uniform(size=(20, 2)).astype(np.float32)
    tids = np.random.default_rng(2).choice([2, 5], size=20).astype(np.float32)
    Xt = jnp.asarray(np.column_stack([X, tids]))
    Y = jnp.asarray(np.sin(3 * X[:, 0]) + 0.1 * tids, jnp.float32)
    m = make_multitask_gp(Xt, Y, task_feature=2, output_task=2)
    assert m.num_tasks == 2
    assert set(np.unique(np.asarray(m.task_ids))) == {0, 1}
    assert m.output_task == 0  # task value 2 remapped to id 0
    m = fit_multitask_gp(m, maxiter=20)
    assert np.isfinite(np.asarray(m.posterior(jnp.asarray(X[:3])).mean)).all()
    assert get_task_value_remapping(jnp.asarray([0, 1, 2])) is None
    mapper = get_task_value_remapping(jnp.asarray([1, 3]))
    np.testing.assert_array_equal(np.asarray(mapper[jnp.asarray([1, 3])]), [0.0, 1.0])
    assert np.isnan(float(mapper[0])) and np.isnan(float(mapper[2]))


def test_batch_shape_helpers_and_markers():
    Xb = match_batch_shape(jnp.ones((3, 2)), jnp.zeros((5, 4, 2)))
    assert Xb.shape == (5, 3, 2)
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(8, 2)), jnp.float32)
    Y = jnp.asarray(np.sin(np.asarray(X)).sum(-1), jnp.float32)[:, None]
    g = make_gp(X, Y)
    assert not is_ensemble(g) and not is_fully_bayesian(g)
    # loading MCMC draws marks the model fully Bayesian
    from botorch_tpu.models.fully_bayesian import load_saas_samples

    base = make_gp(X, Y, kernel="matern52", use_outputscale=True)
    z = jnp.zeros((4, 2 * base.dim + 4))
    fb = load_saas_samples(z, base)
    assert is_ensemble(fb) and is_fully_bayesian(fb)
    assert fb.batch_shape == (4,)
    mean, var = standardize_moments(g.posterior(X).mean, g.posterior(X).variance)
    np.testing.assert_allclose(float(jnp.mean(mean)), 0.0, atol=1e-6)


def test_exception_aliases():
    import botorch_tpu.exceptions as E

    assert E.BotorchError is E.BotorchTPUError
    assert issubclass(E.DeprecationError, E.BotorchTPUError)
    assert issubclass(E.UserInputWarning, E.BotorchTPUWarning)
    assert issubclass(E.CostAwareWarning, E.BotorchTPUWarning)


def test_augment_cholesky_matches_dense():
    import numpy as np
    import jax.numpy as jnp
    from botorch_tpu.ops.chol import augment_cholesky, psd_safe_cholesky

    rng = np.random.default_rng(0)
    A = rng.normal(size=(8, 8)).astype(np.float32)
    K = A @ A.T + 8 * np.eye(8, dtype=np.float32)
    Laa = psd_safe_cholesky(jnp.asarray(K[:5, :5]))
    L = augment_cholesky(Laa, jnp.asarray(K[5:, 5:]), jnp.asarray(K[5:, :5]))
    ref = np.linalg.cholesky(K)
    assert np.abs(np.asarray(L) - ref).max() / np.abs(ref).max() < 1e-3


def test_get_gp_samples_deprecated_alias():
    import jax
    import jax.numpy as jnp
    from botorch_tpu.models.gp import make_gp
    from botorch_tpu.sampling import get_gp_samples

    X = jax.random.uniform(jax.random.PRNGKey(0), (10, 2))
    m = make_gp(X, jnp.sin(3 * X[:, :1]))
    f = get_gp_samples(m, jax.random.PRNGKey(1), n_samples=3)
    out = f(X[:4])
    assert out.shape == (3, 4, 1)
    # frozen path: deterministic across calls
    import numpy as np

    assert np.allclose(np.asarray(f(X[:4])), np.asarray(out))
