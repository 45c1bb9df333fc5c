r"""Hyperparameter priors: log-densities and sampling, as pure functions.

Replaces the gpytorch prior modules used by the reference
(`botorch/models/utils/gpytorch_modules.py:34-127`,
`botorch/models/fully_bayesian.py:148-247`). Each prior is a tiny pytree
dataclass with `log_prob(x)` and `sample(key, shape)`; MAP fitting adds
`log_prob` of the *constrained* parameter value to the MLL (matching
gpytorch's `_add_other_terms`, which applies no change-of-variables
Jacobian — so the MAP optimum is parameterization-independent).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array

_log_sqrt_2pi = 0.5 * math.log(2.0 * math.pi)


class LogNormal(struct.PyTreeNode):
    loc: float = struct.field(pytree_node=False, default=0.0)
    scale: float = struct.field(pytree_node=False, default=1.0)

    def log_prob(self, x: Array) -> Array:
        z = (jnp.log(x) - self.loc) / self.scale
        return -0.5 * z * z - jnp.log(x) - math.log(self.scale) - _log_sqrt_2pi

    def sample(self, key, shape=()) -> Array:
        return jnp.exp(self.loc + self.scale * jax.random.normal(key, shape))

    @property
    def mode(self) -> float:
        return math.exp(self.loc - self.scale**2)


class Gamma(struct.PyTreeNode):
    concentration: float = struct.field(pytree_node=False, default=1.0)
    rate: float = struct.field(pytree_node=False, default=1.0)

    def log_prob(self, x: Array) -> Array:
        a, b = self.concentration, self.rate
        return (
            a * math.log(b)
            - math.lgamma(a)
            + (a - 1.0) * jnp.log(x)
            - b * x
        )

    def sample(self, key, shape=()) -> Array:
        return jax.random.gamma(key, self.concentration, shape) / self.rate

    @property
    def mode(self) -> float:
        a, b = self.concentration, self.rate
        return max((a - 1.0) / b, 1e-4) if a >= 1 else 1e-4


class HalfCauchy(struct.PyTreeNode):
    scale: float = struct.field(pytree_node=False, default=1.0)

    def log_prob(self, x: Array) -> Array:
        return (
            math.log(2.0 / math.pi)
            - math.log(self.scale)
            - jnp.log1p(jnp.square(x / self.scale))
        )

    def sample(self, key, shape=()) -> Array:
        u = jax.random.uniform(key, shape, minval=1e-7, maxval=1.0 - 1e-7)
        return self.scale * jnp.tan(0.5 * math.pi * u)

    @property
    def mode(self) -> float:
        return self.scale  # convention: median-scale init (mode is 0)


class Normal(struct.PyTreeNode):
    loc: float = struct.field(pytree_node=False, default=0.0)
    scale: float = struct.field(pytree_node=False, default=1.0)

    def log_prob(self, x: Array) -> Array:
        z = (x - self.loc) / self.scale
        return -0.5 * z * z - math.log(self.scale) - _log_sqrt_2pi

    def sample(self, key, shape=()) -> Array:
        return self.loc + self.scale * jax.random.normal(key, shape)

    @property
    def mode(self) -> float:
        return self.loc


def dim_scaled_lognormal_lengthscale_prior(d: int) -> LogNormal:
    """[Hvarfner2024vanilla] lengthscale prior: LogNormal(sqrt(2) + log(d)/2,
    sqrt(3)) (reference `gpytorch_modules.py:100-127`)."""
    return LogNormal(loc=math.sqrt(2.0) + 0.5 * math.log(d), scale=math.sqrt(3.0))


def lognormal_noise_prior() -> LogNormal:
    """Noise prior LogNormal(-4, 1) (reference `gpytorch_modules.py:74-97`)."""
    return LogNormal(loc=-4.0, scale=1.0)


# Constraint floors (reference `gpytorch_modules.py:29,117-126`).
MIN_INFERRED_NOISE_LEVEL = 1e-4
MIN_LENGTHSCALE = 2.5e-2


# --------------------------------------------------------------------------- #
# Legacy gamma prior regime + reference-named factory helpers
# (reference `models/utils/gpytorch_modules.py:34-97`). The reference offers
# two prior regimes for SingleTaskGP-style models; `make_gp(priors=...)`
# selects between them here.

def gamma_lengthscale_prior() -> Gamma:
    """Legacy Matern lengthscale prior Gamma(3.0, 6.0)
    (reference `gpytorch_modules.py:34-50`)."""
    return Gamma(3.0, 6.0)


def gamma_noise_prior() -> Gamma:
    """Legacy likelihood noise prior Gamma(1.1, 0.05)
    (reference `gpytorch_modules.py:53-71`)."""
    return Gamma(1.1, 0.05)


def gamma_outputscale_prior() -> Gamma:
    """ScaleKernel outputscale prior Gamma(2.0, 0.15)
    (reference `gpytorch_modules.py:34-50`)."""
    return Gamma(2.0, 0.15)


def lengthscale_prior(priors: str, d: int):
    """The lengthscale prior for a named regime (`"lognormal"`/`"gamma"`)."""
    if priors == "gamma":
        return gamma_lengthscale_prior()
    return dim_scaled_lognormal_lengthscale_prior(d)


def noise_prior(priors: str):
    """The inferred-noise prior for a named regime."""
    if priors == "gamma":
        return gamma_noise_prior()
    return lognormal_noise_prior()


def get_covar_module_with_dim_scaled_prior(ard_num_dims: int, use_outputscale: bool = False):
    """Kernel spec for the modern default: RBF with the [Hvarfner2024vanilla]
    dim-scaled LogNormal lengthscale prior (reference
    `gpytorch_modules.py:100-127`). Returns `(kernel, use_outputscale,
    priors)` — pass as `make_gp(..., kernel=k, use_outputscale=u, priors=p)`.
    """
    return ("rbf", use_outputscale, "lognormal")


def get_matern_kernel_with_gamma_prior(ard_num_dims: int):
    """Kernel spec for the legacy default: scaled Matern-5/2 with
    Gamma(3, 6) lengthscale and Gamma(2, 0.15) outputscale priors
    (reference `gpytorch_modules.py:34-50`)."""
    return ("matern52", True, "gamma")


def get_gaussian_likelihood_with_gamma_prior():
    """Likelihood spec: inferred noise with the legacy Gamma(1.1, 0.05)
    prior (reference `gpytorch_modules.py:53-71`). Pass as
    `make_gp(..., priors=...)` (regime string)."""
    return "gamma"


def get_gaussian_likelihood_with_lognormal_prior():
    """Likelihood spec: inferred noise with the LogNormal(-4, 1) prior
    (reference `gpytorch_modules.py:74-97`)."""
    return "lognormal"
