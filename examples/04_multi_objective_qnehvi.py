"""Multi-objective BO with qLogNEHVI (reference qNEHVI tutorial):
hypervolume progress on BraninCurrin.

Primary path: the FULLY-COMPILED multi-objective campaign
(`run_mo_bo_loop`) — padded baselines, in-graph staircase cell bounds,
one XLA program for the whole run. A single modular iteration (construct
-> fit -> acquire -> optimize, the reference's workflow) follows as an
API demonstration."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import jax
import jax.numpy as jnp
import numpy as np

from botorch_tpu import fit_gp, make_gp, optimize_acqf
from botorch_tpu.acquisition.multi_objective import (
    make_qnehvi,
    qLogNoisyExpectedHypervolumeImprovement,
)
from botorch_tpu.mo_loop import observed_hypervolume, run_mo_bo_loop
from botorch_tpu.test_functions.multi_objective import BraninCurrin
from botorch_tpu.utils.multi_objective import hypervolume, is_non_dominated

prob = BraninCurrin(negate=True)
ref = prob.ref_point

# ---- fully-compiled campaign (one XLA program, no recompiles) ---------- #
state = run_mo_bo_loop(
    prob, d=2, m=2, ref_point=ref, n_init=10, iterations=20,
    key=jax.random.PRNGKey(0),
    num_restarts=4, raw_samples=32, fit_restarts=2,
    fit_maxiter=15, acq_maxiter=15, mc_samples=32,
)
hv = observed_hypervolume(state, ref)
print(f"compiled qLogNEHVI campaign: hypervolume={hv:.2f} "
      f"(max {prob.max_hv:.2f}, {hv / prob.max_hv:.1%})")

# ---- one modular iteration (reference-style workflow) ------------------ #
rng = np.random.default_rng(0)
X = jnp.asarray(rng.uniform(size=(12, 2)), jnp.float32)
Y = prob(X)
bounds = jnp.stack([jnp.zeros(2), jnp.ones(2)])
model = fit_gp(make_gp(X, Y), jax.random.PRNGKey(0))
acqf = make_qnehvi(
    qLogNoisyExpectedHypervolumeImprovement, model, ref, q=1,
    X_baseline=X, num_samples=64, seed=0,
)
cand, _ = optimize_acqf(acqf, bounds, q=1, num_restarts=4,
                        raw_samples=64, key=jax.random.PRNGKey(100))
X = jnp.concatenate([X, cand])
Y = jnp.concatenate([Y, prob(cand)])
front = np.asarray(Y)[np.asarray(is_non_dominated(Y))]
front = front[(front > np.asarray(ref)).all(-1)]
hv1 = hypervolume(front, np.asarray(ref)) if len(front) else 0.0
print(f"modular iteration: candidate {np.asarray(cand)[0]}, "
      f"hypervolume={hv1:.2f}")
