"""SAASBO: high-dimensional BO with the fully-Bayesian SAAS prior and the
native multi-chain NUTS sampler (reference SAASBO tutorial)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import jax
import jax.numpy as jnp

from botorch_tpu.saasbo import run_saasbo
from botorch_tpu.test_functions.synthetic import Branin
from botorch_tpu.utils.transforms import unnormalize

prob = Branin(negate=True)

def objective(X):  # Branin on dims 0-1, 23 nuisance dims
    return prob(unnormalize(X[:, :2], prob.bounds))

res = run_saasbo(
    objective, d=25, n_init=16, iterations=6, key=jax.random.PRNGKey(0),
    num_chains=8,
)
print("best curve:", res.best_curve)
print("median lengthscales (active dims 0-1 should be smallest):")
print(res.median_lengthscales[-1])
