"""Multi-objective BO with qLogNEHVI (reference qNEHVI tutorial):
hypervolume progress on BraninCurrin."""
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
from botorch_tpu.test_functions.multi_objective import BraninCurrin
from botorch_tpu.utils.multi_objective import hypervolume, is_non_dominated

prob = BraninCurrin(negate=True)
rng = np.random.default_rng(0)
X = jnp.asarray(rng.uniform(size=(12, 2)), jnp.float32)
Y = prob(X)
ref = prob.ref_point
bounds = jnp.stack([jnp.zeros(2), jnp.ones(2)])

# 6 iterations: growing shapes recompile per iteration (see examples/01
# for the padded compiled-loop pattern).
for it in range(6):
    model = fit_gp(make_gp(X, Y), jax.random.PRNGKey(it))
    acqf = make_qnehvi(
        qLogNoisyExpectedHypervolumeImprovement, model, ref, q=1,
        X_baseline=X, num_samples=64, seed=it,
    )
    cand, _ = optimize_acqf(acqf, bounds, q=1, num_restarts=4,
                            raw_samples=64, key=jax.random.PRNGKey(100 + it))
    X = jnp.concatenate([X, cand])
    Y = jnp.concatenate([Y, prob(cand)])
    front = np.asarray(Y)[np.asarray(is_non_dominated(Y))]
    front = front[(front > np.asarray(ref)).all(-1)]
    hv = hypervolume(front, np.asarray(ref)) if len(front) else 0.0
    print(f"iter {it}: hypervolume={hv:.2f} (max {prob.max_hv:.2f})")

# Fully-compiled variant (one XLA program for the whole MO campaign;
# fixed shapes via padded baselines + qNEHVI baseline_mask):
#
#   from botorch_tpu.mo_loop import run_mo_bo_loop, observed_hypervolume
#   state = run_mo_bo_loop(prob, d=2, m=2, ref_point=ref, n_init=12,
#                          iterations=20, key=jax.random.PRNGKey(0))
#   print(observed_hypervolume(state, ref))
