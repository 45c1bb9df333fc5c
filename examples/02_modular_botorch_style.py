"""The reference-style modular workflow: construct model -> fit -> build
acquisition -> optimize, one iteration at a time (for non-jittable
objectives)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import jax
import jax.numpy as jnp
import numpy as np

from botorch_tpu import fit_gp, make_gp, optimize_acqf
from botorch_tpu.acquisition.factory import get_acquisition_function
from botorch_tpu.test_functions.synthetic import Hartmann
from botorch_tpu.utils.transforms import unnormalize

prob = Hartmann(dim=6, negate=True)
rng = np.random.default_rng(0)
X = jnp.asarray(rng.uniform(size=(12, 6)), jnp.float32)
Y = prob(unnormalize(X, prob.bounds))
bounds = jnp.stack([jnp.zeros(6), jnp.ones(6)])

# NOTE: growing train shapes recompile each iteration (fine on CPU;
# slow over a remote-TPU tunnel). For compiled-loop speed see
# examples/01 (padded buffers). 6 iterations keep this demo snappy.
for it in range(6):
    model = fit_gp(make_gp(X, Y[:, None]), jax.random.PRNGKey(it))
    acqf = get_acquisition_function(
        "qLogNEI", model, train_X=X, train_Y=Y, q=2, num_samples=128
    )
    cand, _ = optimize_acqf(
        acqf, bounds, q=2, num_restarts=8, raw_samples=128,
        key=jax.random.PRNGKey(100 + it),
    )
    X = jnp.concatenate([X, cand])
    Y = jnp.concatenate([Y, prob(unnormalize(cand, prob.bounds))])
    print(f"iter {it}: best={float(Y.max()):.4f} (optimum 3.32237)")
