"""m=2 qNEHVI loop: clean speed re-measure + acq_maxiter sensitivity
(r4 verdict weak #1: 2.029 iters/s vs a 2.10 = 5 x 0.42 target)."""
import sys
import time
import jax
import numpy as np

from botorch_tpu.mo_loop import observed_hypervolume, run_mo_bo_loop
from botorch_tpu.test_functions.multi_objective import BraninCurrin

prob = BraninCurrin(negate=True)
iters, q = 20, 4

CONFIGS = {
    # label: (fit_restarts, fit_maxiter, acq_maxiter)
    "base15": (2, 15, 15),
    "acq12":  (2, 15, 12),
    "acq10":  (2, 15, 10),
    "fit1":   (1, 15, 15),
}

names = sys.argv[1:] or list(CONFIGS)
for name in names:
    fr, fi, ai = CONFIGS[name]
    cfg = dict(num_restarts=4, raw_samples=32, fit_restarts=fr,
               fit_maxiter=fi, acq_maxiter=ai, mc_samples=32, q=q)
    # compile warmup
    s = run_mo_bo_loop(prob, d=2, m=2, ref_point=prob.ref_point, n_init=10,
                       iterations=iters, key=jax.random.PRNGKey(0), **cfg)
    jax.block_until_ready(s.Y)
    ts, hvs = [], []
    for seed in range(1, 7):
        t0 = time.perf_counter()
        s = run_mo_bo_loop(prob, d=2, m=2, ref_point=prob.ref_point,
                           n_init=10, iterations=iters,
                           key=jax.random.PRNGKey(seed), **cfg)
        jax.block_until_ready(s.Y)
        ts.append(time.perf_counter() - t0)
        hvs.append(observed_hypervolume(s, prob.ref_point) / prob.max_hv)
    print(f"{name}: iters/s {iters/min(ts):.3f} (median {iters/np.median(ts):.3f}) "
          f"hv mean {np.mean(hvs):.4f} min {np.min(hvs):.4f} "
          f"{[round(h,3) for h in hvs]}", flush=True)
