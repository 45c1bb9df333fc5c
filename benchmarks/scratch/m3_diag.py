"""Stepwise diagnostic of the m=3 compiled MO loop on a bad seed."""
import sys, time
import jax, jax.numpy as jnp
import numpy as np
from functools import partial

from botorch_tpu.mo_loop import (_mo_bo_step, append_mo_observations,
                                 init_mo_state, observed_hypervolume)
from botorch_tpu.models.gp import make_gp
from botorch_tpu.sampling.sobol import sobol_table
from botorch_tpu.test_functions.multi_objective import DTLZ2

prob = DTLZ2(dim=4, num_objectives=3, negate=True)
ref = jnp.asarray(prob.ref_point, jnp.float32)
seed = int(sys.argv[1]) if len(sys.argv) > 1 else 1
cfg = dict(num_restarts=8, raw_samples=64, fit_restarts=2,
           fit_maxiter=15, acq_maxiter=25, mc_samples=64, q=2)

d, m, n_init, iters = 4, 3, 10, 15
capacity = n_init + iters * cfg["q"]
sv, shift = sobol_table(cfg["q"] * d, scramble=True, seed=0)
step = jax.jit(partial(_mo_bo_step, **cfg), static_argnames=())

state, X0 = init_mo_state(n_init, d, m, capacity, seed=0)
state = append_mo_observations(state, X0, prob(X0))
params = make_gp(state.X, state.Y).params
key = jax.random.PRNGKey(seed)
for it in range(iters):
    key, sub = jax.random.split(key)
    cand, val, params = step(state, sub, (sv, shift), ref, params0=params)
    Ynew = prob(cand)
    state = append_mo_observations(state, cand, Ynew)
    hv = observed_hypervolume(state, ref) / prob.max_hv
    ls = np.asarray(params.raw_lengthscale)
    print(f"it {it:2d} val={float(val):+.4f} hv={hv:.4f} "
          f"cand0={np.asarray(cand)[0].round(3)} "
          f"Y0={np.asarray(Ynew)[0].round(3)} "
          f"ls_range=({ls.min():.2f},{ls.max():.2f}) "
          f"finite={np.isfinite(np.asarray(cand)).all()}", flush=True)
