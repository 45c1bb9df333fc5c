"""TuRBO trust-region BO with pathwise Thompson sampling over thousands of
candidates (reference TuRBO tutorial)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import jax

from botorch_tpu.optim.turbo import run_turbo
from botorch_tpu.test_functions.synthetic import Ackley
from botorch_tpu.utils.transforms import unnormalize

prob = Ackley(dim=20, negate=True)
objective = lambda X: prob(unnormalize(X, prob.bounds))

X, Y = run_turbo(
    objective, d=20, n_init=40, iterations=30, key=jax.random.PRNGKey(0),
    q=4, n_candidates=2048,
)
print("best:", float(Y.max()), "(optimum 0)")
