"""Deep probability stack + Pareto-frontier entropy search.

Demonstrates the probability utilities the reference ships under
`botorch/utils/probability/` — MVN box probabilities (MVNXPB),
box-truncated MVNs, the unified skew normal — and the PFES
multi-objective entropy acquisition built on top of exact
truncated-Gaussian entropies.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import jax
import jax.numpy as jnp
import numpy as np

from botorch_tpu.fit import fit_gp
from botorch_tpu.models.gp import make_gp
from botorch_tpu.acquisition.pareto_frontier_entropy_search import make_pfes
from botorch_tpu.optim.optimize import optimize_acqf
from botorch_tpu.utils.mvnxpb import mvnxpb
from botorch_tpu.utils.truncated_mvn import (
    TruncatedMultivariateNormal,
    UnifiedSkewNormal,
)

# --- MVNXPB: differentiable Gaussian box probabilities -------------------
rng = np.random.default_rng(0)
d = 6
A = rng.normal(size=(d, 3 * d))
Sigma = jnp.asarray(A @ A.T / (3 * d), jnp.float32)
bounds = jnp.asarray(
    np.stack([np.full(d, -1.0), np.full(d, 1.0)], -1), jnp.float32
)
logp = mvnxpb(Sigma, bounds)
grad = jax.grad(mvnxpb)(Sigma, bounds)
print(f"P(-1 <= x <= 1) = {float(jnp.exp(logp)):.4f}; "
      f"d log P / d Sigma[0,0] = {float(grad[0, 0]):+.4f}")

# --- Truncated MVN + unified skew normal ---------------------------------
tmvn = TruncatedMultivariateNormal(
    mean=jnp.zeros(2),
    cov=jnp.asarray([[1.0, 0.6], [0.6, 1.0]]),
    bounds=jnp.asarray([[0.0, 2.0], [-1.0, 1.0]]),
)
draws = tmvn.rsample(jax.random.PRNGKey(0), num_samples=1000)
print("truncated-MVN sample mean:", np.asarray(draws.mean(0)).round(3))

usn = UnifiedSkewNormal(
    trunc=tmvn,
    gauss_mean=jnp.zeros(1),
    gauss_cov=jnp.ones((1, 1)),
    cross_covariance=jnp.asarray([[0.5], [0.2]]),
)
x = jnp.linspace(-3, 3, 7)[:, None]
print("USN log-density on a grid:", np.asarray(usn.log_prob(x)).round(3))

# --- PFES: entropy search over sampled Pareto frontiers ------------------
X = jnp.asarray(rng.uniform(size=(20, 2)), jnp.float32)
Y = jnp.stack([jnp.sin(3 * X[:, 0]), jnp.cos(3 * X[:, 1])], -1)
model = fit_gp(make_gp(X, Y), jax.random.PRNGKey(0))
box = jnp.stack([jnp.zeros(2), jnp.ones(2)])
pfes = make_pfes(model, box, jax.random.PRNGKey(1), num_fronts=8,
                 grid_size=256)
cand, val = optimize_acqf(pfes, box, q=1, num_restarts=6, raw_samples=48,
                          key=jax.random.PRNGKey(2))
print(f"PFES candidate {np.asarray(cand[0]).round(3)} "
      f"(information gain {float(val):.3f} nats)")
