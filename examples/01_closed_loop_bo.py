"""Closed-loop Bayesian optimization (the reference's getting-started
tutorial, TPU-style): the entire loop is ONE compiled XLA program.

Run: python examples/01_closed_loop_bo.py  (CPU: force jax_platforms=cpu)
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import jax

from botorch_tpu.loop import best_observed, run_bo_loop
from botorch_tpu.test_functions.synthetic import Branin
from botorch_tpu.utils.transforms import unnormalize

prob = Branin(negate=True)
objective = lambda X: prob(unnormalize(X, prob.bounds))

state = run_bo_loop(
    objective, d=2, n_init=10, iterations=25, key=jax.random.PRNGKey(0),
    acqf_name="qLogNEI",  # or "LogEI", "EI", "UCB", ...
)
print("best value:", float(best_observed(state)))
print("regret:", -float(best_observed(state)) - 0.397887)
