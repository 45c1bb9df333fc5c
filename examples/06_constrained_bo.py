"""Constrained BO: outcome constraints via smoothed feasibility weighting
in qLogEI, plus linear input constraints in the optimizer."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import jax
import jax.numpy as jnp
import numpy as np

from botorch_tpu import fit_gp, make_gp, optimize_acqf
from botorch_tpu.acquisition.monte_carlo import (
    make_mc_acqf,
    qLogExpectedImprovement,
)

rng = np.random.default_rng(0)
X = jnp.asarray(rng.uniform(size=(15, 2)), jnp.float32)
# output 0: objective; output 1: constraint (feasible iff <= 0)
Y = jnp.stack([jnp.sin(5 * X[:, 0]) + X[:, 1], X[:, 0] - 0.6], axis=-1)
bounds = jnp.stack([jnp.zeros(2), jnp.ones(2)])

model = fit_gp(make_gp(X, Y), jax.random.PRNGKey(0))
feas_Y = jnp.where(Y[:, 1] <= 0, Y[:, 0], -jnp.inf)
acqf = make_mc_acqf(
    qLogExpectedImprovement, model, q=1, num_samples=128,
    best_f=feas_Y.max(),
    constraints=(lambda s: s[..., 1],),  # samples of output 1 <= 0
)
cand, val = optimize_acqf(
    acqf, bounds, q=1, num_restarts=8, raw_samples=64,
    key=jax.random.PRNGKey(1),
    # input constraint: x0 + x1 >= 0.5
    inequality_constraints=[((0, 1), (1.0, 1.0), 0.5)],
)
print("candidate:", np.asarray(cand), "acq value:", float(val))
