"""m=3 tail study (r5): can the worst seed be raised to >= 0.64 without
hurting the mean? Candidates around the r4 winning config fh3
(4/32/8/50/15/32): more acq restarts at the SAME maxiter, more init
points at the same eval budget, heavier fit."""
import sys
import time
import jax
import numpy as np

from botorch_tpu.mo_loop import observed_hypervolume, run_mo_bo_loop
from botorch_tpu.test_functions.multi_objective import DTLZ2

prob = DTLZ2(dim=4, num_objectives=3, negate=True)
ref = prob.ref_point

CONFIGS = {
    # label: (n_init, iters, num_restarts, raw, fit_r, fit_it, acq_it, mc)
    "fh3":      (10, 15, 4, 32, 8, 50, 15, 32),
    "fh3_r8":   (10, 15, 8, 64, 8, 50, 15, 32),
    "fh3_ni14": (14, 13, 4, 32, 8, 50, 15, 32),
    "fh3_f12":  (10, 15, 4, 32, 12, 60, 15, 32),
    # r5 second wave: combine the r8 acq widening with heavier fit / mc
    "r8_f12":   (10, 15, 8, 64, 12, 60, 15, 32),
    "r8_mc64":  (10, 15, 8, 64, 8, 50, 15, 64),
}

names = sys.argv[1:] or list(CONFIGS)
for name in names:
    n_init, iters, nr, raw, fr, fi, ai, mc = CONFIGS[name]
    fracs = []
    t0 = time.perf_counter()
    for seed in range(16):
        s = run_mo_bo_loop(
            prob, d=4, m=3, ref_point=ref, n_init=n_init,
            iterations=iters, key=jax.random.PRNGKey(seed), seed=0,
            num_restarts=nr, raw_samples=raw, fit_restarts=fr,
            fit_maxiter=fi, acq_maxiter=ai, mc_samples=mc, q=2,
            capacity=n_init + iters * 2,
        )
        fracs.append(observed_hypervolume(s, ref) / prob.max_hv)
    fr_ = np.asarray(fracs)
    print(f"{name}: mean {fr_.mean():.4f} min {fr_.min():.4f} "
          f"p10 {np.percentile(fr_, 10):.4f} "
          f"({time.perf_counter()-t0:.0f}s) "
          f"{[round(f, 3) for f in fracs]}", flush=True)
