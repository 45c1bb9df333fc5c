"""Round-4 experiment: compiled m=3 MO loop quality sweep on the chip."""
import json, sys, time
import jax

from botorch_tpu.mo_loop import observed_hypervolume, run_mo_bo_loop
from botorch_tpu.test_functions.multi_objective import DTLZ2

prob = DTLZ2(dim=4, num_objectives=3, negate=True)
ref = prob.ref_point
max_hv = prob.max_hv

configs = {
    "base": dict(num_restarts=4, raw_samples=32, fit_restarts=2,
                 fit_maxiter=15, acq_maxiter=15, mc_samples=32, q=2),
    "mc64": dict(num_restarts=4, raw_samples=32, fit_restarts=2,
                 fit_maxiter=15, acq_maxiter=15, mc_samples=64, q=2),
    "heavy": dict(num_restarts=8, raw_samples=64, fit_restarts=2,
                  fit_maxiter=15, acq_maxiter=25, mc_samples=64, q=2),
    "fitheavy": dict(num_restarts=4, raw_samples=32, fit_restarts=4,
                     fit_maxiter=30, acq_maxiter=15, mc_samples=32, q=2),
    "heavy2": dict(num_restarts=8, raw_samples=64, fit_restarts=4,
                   fit_maxiter=30, acq_maxiter=25, mc_samples=64, q=2),
    "fh2": dict(num_restarts=4, raw_samples=32, fit_restarts=6,
                fit_maxiter=40, acq_maxiter=15, mc_samples=32, q=2),
    "fhacq": dict(num_restarts=8, raw_samples=64, fit_restarts=4,
                  fit_maxiter=30, acq_maxiter=25, mc_samples=32, q=2),
    "fhmc": dict(num_restarts=4, raw_samples=32, fit_restarts=4,
                 fit_maxiter=30, acq_maxiter=15, mc_samples=96, q=2),
    "fh3": dict(num_restarts=4, raw_samples=32, fit_restarts=8,
                fit_maxiter=50, acq_maxiter=15, mc_samples=32, q=2),
    "fh2mc64": dict(num_restarts=4, raw_samples=32, fit_restarts=6,
                    fit_maxiter=40, acq_maxiter=15, mc_samples=64, q=2),
    "fh3mc64": dict(num_restarts=4, raw_samples=32, fit_restarts=8,
                    fit_maxiter=50, acq_maxiter=15, mc_samples=64, q=2),
}
which = sys.argv[1] if len(sys.argv) > 1 else "base"
n_seeds = int(sys.argv[2]) if len(sys.argv) > 2 else 8
cfg = configs[which]
hvs, ts = [], []
seed0 = int(sys.argv[3]) if len(sys.argv) > 3 else 0
for s in range(seed0, seed0 + n_seeds):
    t0 = time.perf_counter()
    st = run_mo_bo_loop(prob, d=4, m=3, ref_point=ref, n_init=10,
                        iterations=15, key=jax.random.PRNGKey(s), seed=0,
                        **cfg)
    jax.block_until_ready(st.Y)
    t = time.perf_counter() - t0
    hv = observed_hypervolume(st, ref)
    hvs.append(hv / max_hv)
    ts.append(t)
    print(f"{which} seed {s}: hv_frac={hv/max_hv:.4f} t={t:.1f}s", flush=True)
print(json.dumps({"config": which, "hv_fracs": [round(h,4) for h in hvs],
                  "mean": round(sum(hvs)/len(hvs),4),
                  "min": round(min(hvs),4),
                  "t_min": round(min(ts),1)}), flush=True)
