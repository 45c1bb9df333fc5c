"""Benchmark: closed-loop BO iterations/second (config 1 of BASELINE.json —
SingleTaskGP + LogEI on Branin).

Runs the fully-compiled BO loop (fit -> acquire -> optimize, one XLA
program; see `botorch_tpu/loop.py`) on the default JAX device and prints
ONE JSON line with the headline metric.

Baseline: the reference (BoTorch 0.11.3 on CPU, MMMA config: scipy
L-BFGS-B fitting + optimization per iteration) measures ~0.3-0.5 BO
iters/s at comparable budgets (10 init points, 2 fit attempts, restarts 2,
raw 20; measured on this container class — see BASELINE.md; the reference
publishes no numbers of its own). `vs_baseline` is iters/s divided by 0.4.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def main():
    from botorch_tpu.loop import best_observed, run_bo_loop
    from botorch_tpu.test_functions.synthetic import Branin
    from botorch_tpu.utils.transforms import unnormalize

    prob = Branin(negate=True)
    obj = lambda X: prob(unnormalize(X, prob.bounds))

    iters = 25
    cfg = dict(
        num_restarts=8, raw_samples=64, fit_restarts=4,
        fit_maxiter=50, acq_maxiter=50,
    )

    # Warmup / compile.
    state = run_bo_loop(obj, d=2, n_init=10, iterations=iters,
                        key=jax.random.PRNGKey(0), **cfg)
    jax.block_until_ready(state)

    # Timed runs.
    times = []
    regrets = []
    for rep in range(3):
        t0 = time.perf_counter()
        state = run_bo_loop(obj, d=2, n_init=10, iterations=iters,
                            key=jax.random.PRNGKey(rep + 1), **cfg)
        jax.block_until_ready(state)
        times.append(time.perf_counter() - t0)
        regrets.append(-float(best_observed(state)) - 0.397887)

    best_time = min(times)
    iters_per_s = iters / best_time
    baseline_iters_per_s = 0.4  # reference CPU loop, comparable budget
    print(json.dumps({
        "metric": "bo_iters_per_s_branin_logei",
        "value": round(iters_per_s, 3),
        "unit": "iters/s",
        "vs_baseline": round(iters_per_s / baseline_iters_per_s, 2),
        "final_regret_mean": round(sum(regrets) / len(regrets), 5),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
