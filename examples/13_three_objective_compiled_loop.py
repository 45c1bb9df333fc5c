"""Round-3: the fully-compiled multi-objective loop at m = 3.

Everything — GP refits, per-MC-sample padded Lacour box decompositions
(`utils/box_decomposition_jax.py`), sequential-greedy qLogNEHVI
optimization — runs inside ONE jit / one `lax.fori_loop`. Round 2's
compiled loop stopped at m = 2 (staircase cells); reference partitioning
is generic (`utils/multi_objective/box_decompositions/non_dominated.py:353`).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import jax

from botorch_tpu.mo_loop import observed_hypervolume, run_mo_bo_loop
from botorch_tpu.test_functions.multi_objective import DTLZ2

prob = DTLZ2(dim=4, num_objectives=3, negate=True)
state = run_mo_bo_loop(
    prob, d=4, m=3, ref_point=prob.ref_point,
    n_init=10, iterations=6, q=2,
    key=jax.random.PRNGKey(0),
    num_restarts=2, raw_samples=16, fit_restarts=2,
    fit_maxiter=10, acq_maxiter=10, mc_samples=16,
)
hv = observed_hypervolume(state, prob.ref_point)
print(f"observations: {int(state.n)}  dominated HV: {hv:.4f} "
      f"(max {prob.max_hv:.4f}, frac {hv / prob.max_hv:.3f})")
