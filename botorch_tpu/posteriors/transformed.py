r"""Implicitly transformed posteriors.

Counterpart of `botorch/posteriors/transformed.py:16`
(`TransformedPosterior`): a posterior pushed through an elementwise
sample transform, with optional closed-form mean/variance maps (e.g.
lognormal moments for an exp transform). Sampling composes the base
posterior's SAA pathway with the transform, so gradients flow.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


class TransformedPosterior(struct.PyTreeNode):
    """`y = g(x)` for `x ~ posterior`, with `g` applied samplewise."""

    posterior: struct.PyTreeNode
    sample_transform: Callable = struct.field(pytree_node=False)
    # optional closed forms `(mean, var) -> transformed mean / var`
    mean_transform: Optional[Callable] = struct.field(
        pytree_node=False, default=None
    )
    variance_transform: Optional[Callable] = struct.field(
        pytree_node=False, default=None
    )

    @property
    def batch_shape(self):
        return self.posterior.batch_shape

    @property
    def q(self) -> int:
        return self.posterior.q

    @property
    def num_outputs(self) -> int:
        return self.posterior.num_outputs

    @property
    def base_sample_shape(self):
        return self.posterior.base_sample_shape

    @property
    def mean(self) -> Array:
        if self.mean_transform is None:
            raise NotImplementedError(
                "no mean_transform; use Monte Carlo via rsample"
            )
        return self.mean_transform(self.posterior.mean, self.posterior.variance)

    @property
    def variance(self) -> Array:
        if self.variance_transform is None:
            raise NotImplementedError(
                "no variance_transform; use Monte Carlo via rsample"
            )
        return self.variance_transform(
            self.posterior.mean, self.posterior.variance
        )

    def rsample_from_base_samples(self, base_samples: Array) -> Array:
        return self.sample_transform(
            self.posterior.rsample_from_base_samples(base_samples)
        )

    def rsample(self, key, sample_shape: tuple = ()) -> Array:
        return self.sample_transform(self.posterior.rsample(key, sample_shape))


def exp_transformed(posterior) -> TransformedPosterior:
    """Lognormal push-forward with exact moment maps (the standard
    `Log`-outcome-transform untransform)."""
    return TransformedPosterior(
        posterior=posterior,
        sample_transform=jnp.exp,
        mean_transform=lambda m, v: jnp.exp(m + 0.5 * v),
        variance_transform=lambda m, v: (jnp.exp(v) - 1.0)
        * jnp.exp(2.0 * m + v),
    )
