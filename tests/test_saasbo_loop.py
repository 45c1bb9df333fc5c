"""Closed-loop SAASBO tests (config 3 of BASELINE.json): the full
NUTS-per-iteration driver (`botorch_tpu/saasbo.py`) on a Branin function
embedded in d=8, checked against the measured torch+scipy CPU replica bar
(BASELINE.md: `reference_cpu_baseline.py --config saasbo`, 3 seeds ->
regret mean 0.919) and for SAAS dimension selection (reference SAASBO
behavior: shrinkage keeps only the active dims' lengthscales small,
`models/fully_bayesian.py:148-247`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from botorch_tpu.saasbo import run_saasbo
from botorch_tpu.test_functions.synthetic import Branin
from botorch_tpu.utils.transforms import unnormalize

BRANIN_OPT = 0.397887

prob = Branin(negate=True)


def _obj(X):  # (q, d) -> (q,); dims 0,1 active, the rest distractors
    return prob(unnormalize(X[:, :2], prob.bounds))


@pytest.mark.slow
def test_saasbo_closed_loop_branin_embedded():
    """Tiny-budget closed loop: mean regret over 3 seeds must improve
    materially on the initial design (per-seed outcomes at this budget are
    bimodal — a single seed can stall in 4 iterations — so the assertion
    aggregates; the bar-relative check at bench budgets is the on-chip
    test below plus the driver-captured `saasbo_regret`)."""
    d = 8
    init_regs, final_regs = [], []
    last = None
    for seed in range(3):
        res = run_saasbo(
            _obj, d=d, n_init=10, iterations=4, key=jax.random.PRNGKey(seed),
            num_warmup=48, num_samples=24, thinning=4, num_chains=4,
            num_restarts=2, raw_samples=32, acq_maxiter=25,
        )
        assert res.X.shape == (14, d)
        init_regs.append(-float(jnp.max(res.Y[:10])) - BRANIN_OPT)
        final_regs.append(-float(res.best_curve[-1]) - BRANIN_OPT)
        last = res
    # measured on this config: init regret 10.03, final mean ~4.5
    # (seeds 0-2: 1.99 / 10.03 / 1.56) — 0.75x init keeps ~2.5x headroom
    assert np.mean(final_regs) <= 0.75 * np.mean(init_regs)
    # SAAS shrinkage: the active dims' median lengthscales should be
    # smaller than the distractors' at the final iteration (tiny budget,
    # so compare medians of groups rather than each pair)
    ml = np.asarray(last.median_lengthscales[-1])
    assert np.median(ml[:2]) < np.median(ml[2:])


@pytest.mark.slow
@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="bench-budget bar test runs on chip"
)
def test_saasbo_regret_bar_on_chip():
    """Bar-relative closed loop at the EXACT bench.py budgets (warmup 256 /
    samples 128 / thin 8 / 8 chains -> 16 kept models; acq 32 restarts x
    512 raw): 3-seed mean regret must sit at or under the measured CPU
    replica bar plus a noise allowance. The replica bar is 0.919 (3 seeds:
    0.619/1.305/0.834); our 8-seed sweep of this config measured mean 0.61
    with per-seed sigma ~0.45, so a 3-seed mean threshold of 1.2 is ~2.3
    sigma of headroom while still failing on any real regression (random
    search at this eval count sits at ~3+). The tight 6-seed comparison is
    bench.py's `saasbo_regret` each round."""
    sb_cfg = dict(
        n_init=10, iterations=16, num_warmup=256, num_samples=128,
        thinning=8, num_chains=8, num_restarts=32, raw_samples=512,
        acq_maxiter=50,
    )
    regs = []
    for seed in range(3):
        res = run_saasbo(_obj, d=8, key=jax.random.PRNGKey(seed), **sb_cfg)
        regs.append(-float(res.best_curve[-1]) - BRANIN_OPT)
    assert np.mean(regs) <= 1.2, regs
