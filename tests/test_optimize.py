"""Tests for acquisition optimization (reference: `test/optim/test_optimize.py`)."""

import jax
import jax.numpy as jnp
import numpy as np

from botorch_tpu.optim.optimize import (
    initialize_q_batch,
    optimize_acqf,
    optimize_acqf_discrete,
)


def quad_acqf(X):
    """Peak 1.0 at (0.3, 0.7) for each candidate; sum over q."""
    target = jnp.asarray([0.3, 0.7])
    return jnp.sum(1.0 - jnp.sum((X - target) ** 2, axis=-1))


def test_optimize_acqf_finds_peak():
    bounds = jnp.stack([jnp.zeros(2), jnp.ones(2)])
    cand, val = optimize_acqf(
        quad_acqf, bounds, q=1, num_restarts=4, raw_samples=32,
        key=jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(np.asarray(cand[0]), [0.3, 0.7], atol=1e-4)
    assert abs(float(val) - 1.0) < 1e-6


def test_optimize_acqf_respects_bounds():
    bounds = jnp.asarray([[0.5, 0.0], [1.0, 0.6]])
    cand, _ = optimize_acqf(
        quad_acqf, bounds, q=1, num_restarts=4, raw_samples=32,
        key=jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(np.asarray(cand[0]), [0.5, 0.6], atol=1e-4)


def test_optimize_acqf_q2():
    bounds = jnp.stack([jnp.zeros(2), jnp.ones(2)])
    cand, val = optimize_acqf(
        quad_acqf, bounds, q=2, num_restarts=4, raw_samples=32,
        key=jax.random.PRNGKey(1),
    )
    assert cand.shape == (2, 2)
    np.testing.assert_allclose(np.asarray(cand), [[0.3, 0.7]] * 2, atol=1e-3)


def test_initialize_q_batch_includes_argmax():
    key = jax.random.PRNGKey(0)
    X = jnp.asarray(np.random.default_rng(0).uniform(size=(50, 1, 2)), jnp.float32)
    vals = -jnp.sum((X[:, 0] - 0.5) ** 2, axis=-1)
    sel = initialize_q_batch(key, X, vals, n=5)
    best = X[jnp.argmax(vals)]
    assert any(np.allclose(np.asarray(s), np.asarray(best)) for s in sel)


def test_initialize_q_batch_handles_nan():
    key = jax.random.PRNGKey(0)
    X = jnp.asarray(np.random.default_rng(0).uniform(size=(20, 1, 2)), jnp.float32)
    vals = jnp.full((20,), jnp.nan).at[3].set(1.0)
    sel = initialize_q_batch(key, X, vals, n=2)
    assert np.isfinite(np.asarray(sel)).all()


def test_optimize_acqf_discrete():
    choices = jnp.asarray(
        np.random.default_rng(0).uniform(size=(100, 2)), jnp.float32
    )
    cand, vals = optimize_acqf_discrete(quad_acqf, choices, q=3)
    assert cand.shape == (3, 2)
    all_vals = np.asarray(jax.vmap(lambda c: quad_acqf(c[None]))(choices))
    np.testing.assert_allclose(np.asarray(vals), np.sort(all_vals)[-3:][::-1],
                               rtol=1e-6)


def test_nonlinear_inequality_constraints():
    """Nonlinear `g(x) >= 0` constraints via smooth quadratic penalty:
    candidates land on the analytic constrained optimum."""
    acqf = lambda X: -jnp.sum((X - 0.8) ** 2)
    g = lambda x: 0.5 - jnp.sum(x**2)
    bounds = jnp.stack([jnp.zeros(2), jnp.ones(2)])
    cand, _ = optimize_acqf(
        acqf, bounds, q=1, num_restarts=8, raw_samples=64,
        key=jax.random.PRNGKey(0), maxiter=60,
        nonlinear_inequality_constraints=[g],
    )
    x = np.asarray(cand[0])
    # constrained optimum is (0.5, 0.5) on the circle boundary
    assert np.sum(x**2) <= 0.5 + 5e-3
    assert np.abs(x - 0.5).max() < 0.02
    # inter-point: joint constraint over the whole q-batch
    g2 = lambda Xq: 1.2 - jnp.sum(Xq)
    cand2, _ = optimize_acqf(
        lambda X: -jnp.sum((X - 0.9) ** 2), bounds, q=2,
        num_restarts=8, raw_samples=64, key=jax.random.PRNGKey(1),
        maxiter=60, nonlinear_inequality_constraints=[(g2, False)],
    )
    assert float(jnp.sum(cand2)) <= 1.2 + 5e-3


def test_one_shot_auto_handling():
    """Passing the ACTUAL q for a one-shot acqf (reference
    `optim/optimize.py:88-93,389-392`): optimize_acqf augments the
    problem, seeds fantasy coordinates with posterior-mean maximizers,
    and returns the extracted actual candidates."""
    from botorch_tpu.acquisition.knowledge_gradient import make_qkg
    from botorch_tpu.fit import fit_gp
    from botorch_tpu.models.gp import make_gp

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(10, 2)), jnp.float32)
    Y = jnp.sin(3 * X[:, :1])
    model = fit_gp(make_gp(X, Y), jax.random.PRNGKey(0), num_restarts=2,
                   maxiter=20)
    bounds = jnp.stack([jnp.zeros(2), jnp.ones(2)])
    kg = make_qkg(model, q=1, num_fantasies=6, seed=1)
    cand, v = optimize_acqf(kg, bounds, q=1, num_restarts=3, raw_samples=16,
                            key=jax.random.PRNGKey(1), maxiter=20)
    assert cand.shape == (1, 2)
    assert np.isfinite(float(v))
    # augmented convention still accepted
    cand2, _ = optimize_acqf(kg, bounds, q=7, num_restarts=3, raw_samples=16,
                             key=jax.random.PRNGKey(1), maxiter=20)
    assert cand2.shape == (7, 2)
    # wrong q raises
    import pytest
    with pytest.raises(ValueError):
        optimize_acqf(kg, bounds, q=3, num_restarts=2, raw_samples=8,
                      key=jax.random.PRNGKey(2), maxiter=5)


def test_gen_one_shot_hvkg_initial_conditions():
    from botorch_tpu.acquisition.hypervolume_knowledge_gradient import make_qhvkg
    from botorch_tpu.fit import fit_gp
    from botorch_tpu.models.gp import make_gp
    from botorch_tpu.optim.optimize import gen_one_shot_hvkg_initial_conditions
    from botorch_tpu.utils.multi_objective import hypervolume_2d

    key = jax.random.PRNGKey(0)
    X = jax.random.uniform(key, (10, 2))
    Y = jnp.stack(
        [-jnp.sum((X - 0.25) ** 2, -1), -jnp.sum((X - 0.75) ** 2, -1)], -1
    )
    model = fit_gp(make_gp(X, Y), num_restarts=2, maxiter=30)
    bounds = jnp.stack([jnp.zeros(2), jnp.ones(2)])
    ref = jnp.asarray([-1.0, -1.0])
    hvkg = make_qhvkg(model, ref_point=ref, q=1, num_fantasies=3, q_inner=4)
    ics = gen_one_shot_hvkg_initial_conditions(
        hvkg, bounds, num_restarts=5, raw_samples=32, seed=2, frac_random=0.4
    )
    assert ics.shape == (5, hvkg.get_augmented_q_batch_size(), 2)
    assert bool(jnp.all((ics >= 0) & (ics <= 1)))
    # the seeded fantasy solution sets achieve near-optimal posterior-mean
    # hypervolume (they were optimized for it)
    sol0 = ics[0, 1:, :].reshape(3, 4, 2)
    hv_seeded = float(hypervolume_2d(model.posterior(sol0[0]).mean, ref))
    X_rand = jax.random.uniform(jax.random.PRNGKey(9), (64, 4, 2))
    hv_rand = float(
        jnp.mean(
            jax.vmap(lambda x: hypervolume_2d(model.posterior(x).mean, ref))(X_rand)
        )
    )
    assert hv_seeded > hv_rand


def test_warmstart_multistep_shapes_and_domain():
    from botorch_tpu.acquisition.multi_step_lookahead import make_k_step
    from botorch_tpu.fit import fit_gp
    from botorch_tpu.models.gp import make_gp
    from botorch_tpu.optim.optimize import warmstart_multistep

    key = jax.random.PRNGKey(0)
    X = jax.random.uniform(key, (10, 2))
    Y = jnp.sin(5 * X[:, :1])
    model = fit_gp(make_gp(X, Y), num_restarts=2, maxiter=30)
    bounds = jnp.stack([jnp.zeros(2), jnp.ones(2)])
    ms = make_k_step(
        model, batch_sizes=(1, 1), num_fantasies=(3,), seed=0,
        best_f=float(Y.max()),
    )
    qa = ms.get_augmented_q_batch_size()
    prev = jax.random.uniform(jax.random.PRNGKey(5), (4, qa, 2))
    ws = warmstart_multistep(
        ms, bounds, num_restarts=3, raw_samples=8, full_optimizer=prev
    )
    assert ws.shape == (3, qa, 2)
    assert bool(jnp.all((ws >= 0) & (ws <= 1)))
