r"""Acquisition wrappers and modifiers.

Counterpart of `botorch/acquisition/fixed_feature.py:54`
(`FixedFeatureAcquisitionFunction`), `proximal.py:28`
(`ProximalAcquisitionFunction`), `prior_guided.py:30`
(`PriorGuidedAcquisitionFunction`), `penalized.py:24-378`
(`PenalizedAcquisitionFunction` + penalties), and `cost_aware.py:56,88`
(`GenericCostAwareUtility`, `InverseCostWeightedUtility`).

Wrappers are thin pytree dataclasses composing an inner acqf callable —
they stay jit/grad-transparent.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


class FixedFeatureAcquisitionFunction(struct.PyTreeNode):
    """Optimize over a subset of dims with the rest pinned
    (`fixed_feature.py:54`). `__call__` takes the REDUCED `(q, d_red)`."""

    acqf: object
    d: int = struct.field(pytree_node=False, default=0)
    fixed_indices: tuple = struct.field(pytree_node=False, default=())
    fixed_values: Array = None

    def _expand(self, X: Array) -> Array:
        q = X.shape[-2]
        full = jnp.zeros((*X.shape[:-1], self.d), X.dtype)
        free = [i for i in range(self.d) if i not in self.fixed_indices]
        full = full.at[..., jnp.asarray(free)].set(X)
        full = full.at[..., jnp.asarray(self.fixed_indices)].set(
            jnp.broadcast_to(self.fixed_values, (*X.shape[:-1], len(self.fixed_indices)))
        )
        return full

    def __call__(self, X: Array) -> Array:
        return self.acqf(self._expand(X))


class ProximalAcquisitionFunction(struct.PyTreeNode):
    """Bias toward the last observed point with a Gaussian proximal weight
    (`proximal.py:28`): `acqf(X) * prod_d exp(-0.5 ((x - x_last)/w)^2)`
    (log-additive for log acqfs)."""

    acqf: object
    X_last: Array = None  # (d,)
    proximal_weights: Array = None  # (d,)
    log: bool = struct.field(pytree_node=False, default=False)

    def __call__(self, X: Array) -> Array:
        base = self.acqf(X)
        z = (X - self.X_last) / self.proximal_weights
        log_w = -0.5 * jnp.sum(jnp.square(z))
        return base + log_w if self.log else base * jnp.exp(log_w)


class PriorGuidedAcquisitionFunction(struct.PyTreeNode):
    """Weight by a user prior over the optimum location ([Hvarfner2022pibo];
    `prior_guided.py:30`): `acqf * prior^(beta / t)`."""

    acqf: object
    prior_log_prob: Callable = struct.field(pytree_node=False, default=None)
    exponent: float = struct.field(pytree_node=False, default=1.0)
    log: bool = struct.field(pytree_node=False, default=False)

    def __call__(self, X: Array) -> Array:
        base = self.acqf(X)
        lp = self.exponent * jnp.sum(self.prior_log_prob(X))
        return base + lp if self.log else base * jnp.exp(lp)


class PenalizedAcquisitionFunction(struct.PyTreeNode):
    """`acqf(X) - lambda * penalty(X)` (`penalized.py:24`)."""

    acqf: object
    penalty: Callable = struct.field(pytree_node=False, default=None)
    regularization_parameter: float = struct.field(pytree_node=False, default=1.0)

    def __call__(self, X: Array) -> Array:
        return self.acqf(X) - self.regularization_parameter * self.penalty(X)


def l2_penalty(init_point: Array) -> Callable:
    """`L2Penalty` (`penalized.py:45`)."""

    def pen(X: Array) -> Array:
        return jnp.sum(jnp.square(X - init_point))

    return pen


def l1_penalty(init_point: Array) -> Callable:
    """`L1Penalty` (`penalized.py:79`)."""

    def pen(X: Array) -> Array:
        return jnp.sum(jnp.abs(X - init_point))

    return pen


def gaussian_penalty(init_point: Array, sigma: float = 1.0) -> Callable:
    """`GaussianPenalty` (`penalized.py:113`)."""

    def pen(X: Array) -> Array:
        return jnp.sum(jnp.exp(jnp.sum(jnp.square(X - init_point), -1) / (2 * sigma**2)))

    return pen


class CostAwareAcquisitionFunction(struct.PyTreeNode):
    """Inverse-cost-weighted utility (`cost_aware.py:88`): `acqf / cost`,
    or `acqf - log cost` for log acqfs. `cost_fn(X) -> positive scalar`."""

    acqf: object
    cost_fn: Callable = struct.field(pytree_node=False, default=None)
    log: bool = struct.field(pytree_node=False, default=False)
    min_cost: float = struct.field(pytree_node=False, default=1e-3)

    def __call__(self, X: Array) -> Array:
        base = self.acqf(X)
        cost = jnp.maximum(self.cost_fn(X), self.min_cost)
        return base - jnp.log(cost) if self.log else base / cost


def affine_fidelity_cost(
    fidelity_dims: tuple, fixed_cost: float = 0.01, weights: Optional[Array] = None
) -> Callable:
    """`AffineFidelityCostModel` (`models/cost.py:25`):
    `cost(x) = fixed + sum_f w_f x_f`."""

    def cost(X: Array) -> Array:
        w = jnp.ones((len(fidelity_dims),)) if weights is None else weights
        return fixed_cost + jnp.sum(
            X[..., jnp.asarray(fidelity_dims)] * w, axis=(-1, -2)
        )

    return cost


class DecoupledAcquisitionFunction(struct.PyTreeNode):
    """Per-output evaluation masks for decoupled observations (reference
    `acquisition/decoupled.py:25`): `X_evaluation_mask (q, m)` marks which
    outputs each candidate will observe; the inner acqf's objective should
    consume `eval_mask` to zero out unobserved outputs."""

    acqf: object
    X_evaluation_mask: Array = None  # (q, m) bool

    def __call__(self, X: Array) -> Array:
        inner = self.acqf
        if hasattr(inner, "replace") and hasattr(inner, "eval_mask"):
            inner = inner.replace(eval_mask=self.X_evaluation_mask)
        return inner(X)
