"""Posterior re-exports (counterpart of `botorch/posteriors/__init__.py`)."""

from botorch_tpu.posteriors.fully_bayesian import (
    mixture_covariance,
    mixture_mean,
    mixture_quantile,
    mixture_variance,
)
from botorch_tpu.posteriors.gaussian import (
    GaussianPosterior,
    scalarize_posterior,
)
from botorch_tpu.posteriors.transformed import (
    TransformedPosterior,
    exp_transformed,
)

__all__ = [
    "GaussianPosterior",
    "TransformedPosterior",
    "exp_transformed",
    "mixture_covariance",
    "mixture_mean",
    "mixture_quantile",
    "mixture_variance",
    "scalarize_posterior",
]
