r"""qLogNParEGO: random-Chebyshev-scalarized noisy EI for multi-objective
BO.

Counterpart of `botorch/acquisition/multi_objective/parego.py:24`
(`qLogNParEGO`): draw a random weight vector on the simplex, scalarize the
multi-output posterior samples with the augmented Chebyshev function, and
apply qLogNEI machinery on the scalarized objective.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from botorch_tpu.acquisition.monte_carlo import (
    DEFAULT_MC_SAMPLES,
    make_mc_acqf,
    qLogNoisyExpectedImprovement,
)
from botorch_tpu.acquisition.objective import chebyshev_scalarization
from botorch_tpu.models.gp import SingleTaskGP
from botorch_tpu.utils.sampling import sample_simplex

Array = jax.Array


def make_qlognparego(
    model: SingleTaskGP,
    X_baseline: Array,
    Y_baseline: Array,
    key: Array,
    q: int = 1,
    num_samples: int = DEFAULT_MC_SAMPLES,
    seed: int = 0,
    **kwargs,
):
    """Build a qLogNParEGO instance: one random Chebyshev scalarization of
    the model outputs, fed through qLogNEI with the joint baseline.

    Each BO iteration should draw a fresh `key` (a new scalarization) —
    that is the ParEGO exploration mechanism.
    """
    m = model.num_outputs
    weights = sample_simplex(key, m, 1)[0]
    Y_bounds = jnp.stack(
        [jnp.min(Y_baseline, axis=0), jnp.max(Y_baseline, axis=0)]
    )
    objective = chebyshev_scalarization(weights, Y_bounds)
    return make_mc_acqf(
        qLogNoisyExpectedImprovement,
        model,
        q=q,
        num_samples=num_samples,
        seed=seed,
        X_baseline=X_baseline,
        objective=objective,
        **kwargs,
    )
