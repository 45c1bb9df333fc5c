"""Candidate-generation re-exports (counterpart of `botorch/generation/__init__.py`)."""

from botorch_tpu.generation.gen import (
    gen_candidates_adam,
)
from botorch_tpu.generation.sampling import (
    PathwiseThompsonSampling,
    boltzmann_sampling,
    constrained_max_posterior_sampling,
    make_pathwise_thompson_sampling,
    max_posterior_sampling,
)

__all__ = [
    "PathwiseThompsonSampling",
    "boltzmann_sampling",
    "constrained_max_posterior_sampling",
    "gen_candidates_adam",
    "make_pathwise_thompson_sampling",
    "max_posterior_sampling",
]
