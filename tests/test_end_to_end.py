"""End-to-end closed-loop BO (reference: `test/test_end_to_end.py:36-140` —
fit -> acquisition -> optimize on a small problem with tiny budgets)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from botorch_tpu.acquisition.analytic import make_acqf
from botorch_tpu.acquisition.monte_carlo import (
    make_mc_acqf,
    qLogNoisyExpectedImprovement,
)
from botorch_tpu.fit import fit_gp
from botorch_tpu.models.gp import make_gp
from botorch_tpu.optim.optimize import optimize_acqf
from botorch_tpu.test_functions.synthetic import Branin
from botorch_tpu.utils.transforms import unnormalize


@pytest.fixture(scope="module")
def branin_setup():
    prob = Branin(negate=True)
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(10, 2)), jnp.float32)
    Y = prob(unnormalize(X, prob.bounds))
    return prob, X, Y


def _run_loop(prob, X, Y, acqf_builder, iters=4):
    ub = jnp.stack([jnp.zeros(2), jnp.ones(2)])
    for it in range(iters):
        model = fit_gp(make_gp(X, Y[:, None]), jax.random.PRNGKey(it),
                       num_restarts=2, maxiter=30)
        acqf = acqf_builder(model, X, Y)
        cand, _ = optimize_acqf(
            acqf, ub, q=1, num_restarts=2, raw_samples=20,
            key=jax.random.PRNGKey(100 + it), maxiter=30, seed=it,
        )
        y_new = prob(unnormalize(cand, prob.bounds))
        X = jnp.concatenate([X, cand])
        Y = jnp.concatenate([Y, y_new])
    return X, Y


def test_bo_loop_logei(branin_setup):
    prob, X, Y = branin_setup
    best0 = float(Y.max())
    X2, Y2 = _run_loop(
        prob, X, Y,
        lambda m, X, Y: make_acqf("LogEI", m, best_f=Y.max()),
    )
    assert X2.shape[0] == X.shape[0] + 4
    assert float(Y2.max()) >= best0  # monotone incumbent
    assert np.isfinite(np.asarray(Y2)).all()


def test_bo_loop_qlognei(branin_setup):
    prob, X, Y = branin_setup
    X2, Y2 = _run_loop(
        prob, X, Y,
        lambda m, X, Y: make_mc_acqf(
            qLogNoisyExpectedImprovement, m, q=1, num_samples=64, X_baseline=X
        ),
        iters=2,
    )
    assert np.isfinite(np.asarray(Y2)).all()
