"""Round-3 surfaces: equality-constrained acquisition optimization
(augmented Lagrangian + exact Dykstra feasibility polish) and the opt-in
float64 mode for ill-conditioned problems (see PRECISION.md).

Reference counterparts: `optim/parameter_constraints.py:68`
(`make_scipy_linear_constraints` eq-type) and BoTorch's f64-first policy
(`models/gpytorch.py:128-133`).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import jax
import jax.numpy as jnp
import numpy as np

from botorch_tpu import fit_gp, make_gp, optimize_acqf
from botorch_tpu.acquisition.analytic import make_acqf

rng = np.random.default_rng(0)

# ---- equality-constrained candidate generation -------------------------- #
# mixture-budget problem: the three inputs must sum to 1 (a simplex), and
# component 0 is capped at 0.5.
X = jnp.asarray(rng.dirichlet(np.ones(3), size=20), jnp.float32)
Y = (
    jnp.sin(4 * X[:, 0]) + X[:, 1] - 0.5 * X[:, 2]
    + 0.05 * jnp.asarray(rng.normal(size=20), jnp.float32)
)
model = fit_gp(make_gp(X, Y[:, None]), jax.random.PRNGKey(0))
acqf = make_acqf("LogEI", model, best_f=Y.max())
bounds = jnp.stack([jnp.zeros(3), jnp.ones(3)])
cand, val = optimize_acqf(
    acqf, bounds, q=1, num_restarts=6, raw_samples=48,
    key=jax.random.PRNGKey(1),
    equality_constraints=[((0, 1, 2), (1.0, 1.0, 1.0), 1.0)],
    inequality_constraints=[((0,), (-1.0,), -0.5)],  # x0 <= 0.5
)
print("candidate:", np.asarray(cand[0]), "sum:", float(cand.sum()))
assert abs(float(cand.sum()) - 1.0) < 1e-6  # feasibility is a guarantee

# ---- opt-in float64 for a near-interpolation model ---------------------- #
from botorch_tpu import settings

settings.enable_x64()
Xd = jnp.asarray(rng.uniform(size=(24, 2)))
Xd = Xd.at[12:].set(Xd[:12] + 1e-4 * rng.normal(size=(12, 2)))  # near-dupes
Yd = jnp.sin(3 * Xd[:, :1])
m64 = fit_gp(
    make_gp(Xd, Yd, train_Yvar=jnp.full((24, 1), 1e-10), dtype=jnp.float64),
    jax.random.PRNGKey(2), num_restarts=2, maxiter=40,
)
post = m64.posterior(Xd[:4])
print("f64 posterior mean dtype:", post.mean.dtype)
print("max in-sample error:", float(jnp.max(jnp.abs(post.mean - Yd[:4]))))
settings.enable_x64(False)
