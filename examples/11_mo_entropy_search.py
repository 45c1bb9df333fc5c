"""Example 11: information-theoretic multi-objective BO (MO-JES / MO-PES)
with wall-clock-budgeted optimization.

Counterpart of the reference's JES/PES tutorials
(`botorch/acquisition/multi_objective/joint_entropy_search.py:256`,
`predictive_entropy_search.py:40`): pick the next experiment by maximizing
the information a (possibly q-batched) observation carries about the
Pareto frontier, instead of hypervolume improvement.

Run: python examples/11_mo_entropy_search.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root

import time

import jax

jax.config.update("jax_platforms", "cpu")  # interactive demo: avoid TPU tunnel

import jax.numpy as jnp
import numpy as np

from botorch_tpu.acquisition.multi_objective_entropy_search import (
    make_mo_jes,
    make_mo_pes,
)
from botorch_tpu.fit import fit_gp
from botorch_tpu.models.gp import make_gp
from botorch_tpu.optim.optimize import optimize_acqf
from botorch_tpu.test_functions.multi_objective import BraninCurrin
from botorch_tpu.utils.multi_objective import (
    dominated_hypervolume_np,
    is_non_dominated,
)

prob = BraninCurrin(negate=True)
ref_point = np.asarray([-350.0, -20.0])


def hv(Y):
    front = np.asarray(Y)[np.asarray(is_non_dominated(jnp.asarray(Y)))]
    return dominated_hypervolume_np(front, ref_point)


rng = np.random.default_rng(0)
X = jnp.asarray(rng.uniform(size=(12, 2)), jnp.float32)
Y = prob(X)
bounds = jnp.stack([jnp.zeros(2), jnp.ones(2)])

print(f"initial hypervolume: {hv(Y):.1f}")
for it in range(6):
    t0 = time.perf_counter()
    model = fit_gp(make_gp(X, Y), jax.random.PRNGKey(it), num_restarts=4)
    # alternate the two information-theoretic acquisitions
    make = make_mo_jes if it % 2 == 0 else make_mo_pes
    acqf = make(
        model, bounds, jax.random.PRNGKey(100 + it),
        num_pareto_samples=4, num_pareto_points=6,
        grid_size=128, num_features=128,
    )
    # q=2 batch per iteration, under a 30 s wall-clock budget for the
    # inner L-BFGS phase (best-so-far candidates on expiry)
    cand, val = optimize_acqf(
        acqf, bounds, q=2, num_restarts=4, raw_samples=64,
        key=jax.random.PRNGKey(200 + it), maxiter=20, timeout_sec=30.0,
    )
    X = jnp.concatenate([X, cand])
    Y = jnp.concatenate([Y, prob(cand)])
    print(
        f"iter {it} [{make.__name__}] acq={float(val):+.4f} "
        f"hv={hv(Y):.1f} ({time.perf_counter() - t0:.1f}s)"
    )

print(f"final hypervolume: {hv(Y):.1f}")
