"""The reference-style modular workflow: construct model -> fit -> build
acquisition -> optimize, one iteration at a time, for EXTERNAL
(non-jittable) objectives.

TPU idiom: the history lives in a fixed-capacity padded buffer with a
validity mask (`BOState`), so the jitted fit+acquire+optimize step
(`bo_step`) compiles ONCE and is reused as observations accumulate — no
per-iteration recompile. The user evaluates the candidate outside JAX and
appends it with `append_observations` (the counterpart of the reference's
host loop in `MMMA/MMMA.py:103-200`, minus the scipy round-trips)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import jax
import jax.numpy as jnp
import numpy as np

from botorch_tpu.loop import append_observations, bo_step, init_state
from botorch_tpu.sampling.sobol import sobol_table
from botorch_tpu.test_functions.synthetic import Hartmann
from botorch_tpu.utils.transforms import unnormalize

prob = Hartmann(dim=6, negate=True)


def objective(X01):  # "external" evaluation — any Python code works here
    return np.asarray(prob(unnormalize(X01, prob.bounds)))


d, n_init, iters, q = 6, 12, 6, 2
state, X0 = init_state(n_init, d, capacity=n_init + iters * q, seed=0)
state = append_observations(state, X0, jnp.asarray(objective(X0)))
sobol = sobol_table(q * d, scramble=True, seed=1)

for it in range(iters):
    cand, val = bo_step(
        state, jax.random.PRNGKey(it), sobol,
        acqf_name="qLogNEI", q=q,
        num_restarts=4, raw_samples=64,
        fit_restarts=2, fit_maxiter=15, acq_maxiter=15,
    )  # same compiled program every iteration (padded shapes)
    y = objective(cand)
    state = append_observations(state, cand, jnp.asarray(y))
    best = float(jnp.max(jnp.where(jnp.arange(state.X.shape[0]) < state.n,
                                   state.Y, -jnp.inf)))
    print(f"iter {it}: best={best:.4f} (optimum 3.32237)")
