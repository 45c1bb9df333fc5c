"""Validate the r4 bench.py additions in isolation on the chip:
m=3 MO loop metric + FLOP/s accounting."""
import json, time
import jax, jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)

from botorch_tpu.mo_loop import observed_hypervolume, run_mo_bo_loop
from botorch_tpu.test_functions.multi_objective import DTLZ2

m3_prob = DTLZ2(dim=4, num_objectives=3, negate=True)
m3_iters, m3_q = 15, 2
m3_cfg = dict(num_restarts=4, raw_samples=32, fit_restarts=8,
              fit_maxiter=50, acq_maxiter=15, mc_samples=32, q=m3_q)
m3_state = run_mo_bo_loop(m3_prob, d=4, m=3, ref_point=m3_prob.ref_point,
                          n_init=10, iterations=m3_iters,
                          key=jax.random.PRNGKey(0), **m3_cfg)
jax.block_until_ready(m3_state.Y)
m3_times, m3_hvs = [], []
for rep in range(3):
    t0 = time.perf_counter()
    m3_state = run_mo_bo_loop(m3_prob, d=4, m=3, ref_point=m3_prob.ref_point,
                              n_init=10, iterations=m3_iters,
                              key=jax.random.PRNGKey(rep + 1), **m3_cfg)
    jax.block_until_ready(m3_state.Y)
    m3_times.append(time.perf_counter() - t0)
    m3_hvs.append(observed_hypervolume(m3_state, m3_prob.ref_point))
print(json.dumps({
    "qnehvi_m3_iters_per_s": round(m3_iters / min(m3_times), 3),
    "qnehvi_m3_hv_frac": round((sum(m3_hvs)/len(m3_hvs))/m3_prob.max_hv, 4),
}), flush=True)

from botorch_tpu.fit import fit_gp as _fit_gp
from botorch_tpu.models.gp import make_gp

def _flops_of(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0))

fit_metrics = {}
for n_big in (4096, 10240):
    Xb = jnp.asarray(rng.uniform(size=(n_big, 10)), jnp.float32)
    Yb = (-jnp.sum((Xb - 0.4) ** 2, axis=-1)
          + 0.01 * jnp.asarray(rng.normal(size=(n_big,)), jnp.float32))
    mb = make_gp(Xb, Yb[:, None])
    fitter = jax.jit(lambda k, mb=mb: _fit_gp(mb, k, num_restarts=2,
                                              maxiter=25).params)
    compiled = fitter.lower(jax.random.PRNGKey(0)).compile()
    flops = _flops_of(compiled)
    jax.block_until_ready(compiled(jax.random.PRNGKey(0)))
    t0 = time.perf_counter()
    jax.block_until_ready(compiled(jax.random.PRNGKey(1)))
    dt = time.perf_counter() - t0
    fit_metrics[f"fit_n{n_big}_s"] = round(dt, 2)
    fit_metrics[f"fit_n{n_big}_tflops_per_s"] = round(flops / dt / 1e12, 2)
    print(json.dumps(fit_metrics), flush=True)

from botorch_tpu.parallel.distributed_chol import distributed_gp_solve
from botorch_tpu.parallel.sharding import make_mesh

nK = 8192
A = rng.normal(size=(nK, nK)).astype("float32")
Kd = jnp.asarray(A @ A.T / nK) + 2.0 * jnp.eye(nK, dtype=jnp.float32)
yd = jnp.asarray(rng.normal(size=nK).astype("float32"))
mesh1 = make_mesh(1)
with mesh1:
    solve = jax.jit(lambda K, y: distributed_gp_solve(K, y, mesh1,
                                                      jitter=0.0)[1])
    compiled_s = solve.lower(Kd, yd).compile()
    chol_flops = _flops_of(compiled_s)
    jax.block_until_ready(compiled_s(Kd, yd))
    t0 = time.perf_counter()
    jax.block_until_ready(compiled_s(Kd, yd))
    chol_dt = time.perf_counter() - t0
print(json.dumps({"dist_chol_n8192_tflops_per_s":
                  round(chol_flops / chol_dt / 1e12, 2),
                  "dist_chol_flops": chol_flops}), flush=True)
