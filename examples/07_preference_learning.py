"""Preference learning: pairwise-comparison GP + EUBO pair selection
(reference preference-learning tutorial)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import jax.numpy as jnp
import numpy as np

from botorch_tpu.models.pairwise_gp import (
    AnalyticExpectedUtilityOfBestOption,
    fit_pairwise_gp,
    make_pairwise_gp,
    qExpectedUtilityOfBestOption,
)

rng = np.random.default_rng(0)
n = 30
X = jnp.asarray(rng.uniform(size=(n, 2)), jnp.float32)
true_util = np.sin(4 * np.asarray(X[:, 0])) + np.asarray(X[:, 1])

comps = []
for _ in range(60):
    i, j = rng.choice(n, 2, replace=False)
    p = 1 / (1 + np.exp(-(true_util[i] - true_util[j]) / 0.1))
    comps.append((i, j) if rng.uniform() < p else (j, i))

model = fit_pairwise_gp(make_pairwise_gp(X, np.asarray(comps)))
corr = np.corrcoef(np.asarray(model.f_map), true_util)[0, 1]
print(f"utility rank correlation: {corr:.3f}")
eubo = AnalyticExpectedUtilityOfBestOption(model=model)
print("EUBO of first pair:", float(eubo(X[:2])))
