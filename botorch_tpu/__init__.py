"""botorch_tpu: a TPU-native Bayesian-optimization framework (JAX/XLA/Pallas).

Brand-new implementation of the capabilities of BoTorch 0.11.3 (see
SURVEY.md), designed TPU-first: pytree models + pure functions, batched
device-resident L-BFGS-B, native scrambled Sobol, native NUTS, and sharding
of restart/chain/sample axes over `jax.sharding` meshes.
"""

__version__ = "0.1.0"
