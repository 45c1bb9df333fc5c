"""botorch_tpu: a TPU-native Bayesian-optimization framework (JAX/XLA/Pallas).

Brand-new implementation of the capabilities of BoTorch 0.11.3 (see
SURVEY.md), designed TPU-first: pytree models + pure functions, batched
device-resident L-BFGS-B, native scrambled Sobol, native NUTS, and sharding
of restart/chain/sample axes over `jax.sharding` meshes.

Public API re-exports (counterpart of `botorch/__init__.py:68`).
"""

__version__ = "0.1.0"

from botorch_tpu.fit import fit_gp, fit_transformed_gp
from botorch_tpu.models.gp import SingleTaskGP, make_gp
from botorch_tpu.optim.optimize import (
    gen_batch_initial_conditions,
    initialize_q_batch,
    optimize_acqf,
    optimize_acqf_discrete,
)

__all__ = [
    "SingleTaskGP",
    "fit_gp",
    "fit_transformed_gp",
    "gen_batch_initial_conditions",
    "initialize_q_batch",
    "make_gp",
    "optimize_acqf",
    "optimize_acqf_discrete",
]


def __getattr__(name):
    """Lazy heavy-submodule access: `botorch_tpu.loop`, `.portfolio`, ..."""
    import importlib

    try:
        return importlib.import_module(f"botorch_tpu.{name}")
    except ModuleNotFoundError as e:
        raise AttributeError(name) from e
