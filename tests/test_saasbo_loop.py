"""Closed-loop SAASBO test (config 3 of BASELINE.json): the full
NUTS-per-iteration driver (`botorch_tpu/saasbo.py`) on a Branin function
embedded in d=8, checking best-value improvement and SAAS dimension
selection (reference SAASBO behavior: shrinkage keeps only the active
dims' lengthscales small, `models/fully_bayesian.py:148-247`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from botorch_tpu.saasbo import run_saasbo
from botorch_tpu.test_functions.synthetic import Branin
from botorch_tpu.utils.transforms import unnormalize


@pytest.mark.slow
def test_saasbo_closed_loop_branin_embedded():
    prob = Branin(negate=True)
    d = 8  # dims 0, 1 active; 2..7 are distractors

    def obj(X):  # (q, d) -> (q,)
        return prob(unnormalize(X[:, :2], prob.bounds))

    res = run_saasbo(
        obj, d=d, n_init=10, iterations=4, key=jax.random.PRNGKey(0),
        num_warmup=48, num_samples=24, thinning=4, num_chains=4,
        num_restarts=2, raw_samples=32, acq_maxiter=25,
    )
    assert res.X.shape == (14, d)
    # monotone best curve that improves over the initial design
    curve = np.asarray(res.best_curve)
    assert np.all(np.diff(curve) >= -1e-6)
    assert curve[-1] >= float(jnp.max(res.Y[:10]))
    # SAAS shrinkage: the active dims' median lengthscales should be
    # smaller than the distractors' at the final iteration (tiny budget,
    # so compare medians of groups rather than each pair)
    ml = np.asarray(res.median_lengthscales[-1])
    assert np.median(ml[:2]) < np.median(ml[2:])
