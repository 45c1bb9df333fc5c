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

import math
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
    """`L2Penalty` (`penalized.py:24-50`): max over the q-batch of the
    squared L2 distance to the reference point."""

    def pen(X: Array) -> Array:
        sq = jnp.sum(jnp.square(X - init_point), axis=-1)
        return jnp.max(sq, axis=-1)

    return pen


def l1_penalty(init_point: Array) -> Callable:
    """`L1Penalty` (`penalized.py:53-78`): max over the q-batch of the L1
    distance to the reference point."""

    def pen(X: Array) -> Array:
        return jnp.max(jnp.sum(jnp.abs(X - init_point), axis=-1), axis=-1)

    return pen


def gaussian_penalty(init_point: Array, sigma: float = 1.0) -> Callable:
    """`GaussianPenalty` (`penalized.py:81-108`): max over the q-batch of
    `exp(||X - x0||^2 / (2 sigma^2))`."""

    def pen(X: Array) -> Array:
        sq = jnp.sum(jnp.square(X - init_point), axis=-1)
        return jnp.max(jnp.exp(sq / (2 * sigma**2)), axis=-1)

    return pen


def group_lasso_regularizer(X: Array, groups) -> Callable:
    """`group_lasso_regularizer` (`penalized.py:249-269`):
    `sum_g sqrt(|g|) * ||X[g]||_2` for points `X (..., d)`."""
    return sum(
        math.sqrt(len(g)) * jnp.linalg.norm(X[..., jnp.asarray(g)], axis=-1)
        for g in groups
    )


def group_lasso_penalty(init_point: Array, groups) -> Callable:
    """`GroupLassoPenalty` (`penalized.py:110-140`). q=1 only, as in the
    reference."""

    def pen(X: Array) -> Array:
        if X.shape[-2] != 1:
            raise NotImplementedError("group-lasso requires q=1 (as in the reference)")
        return group_lasso_regularizer(X[..., 0, :] - init_point, groups)

    return pen


def narrow_gaussian(X: Array, a) -> Array:
    """`narrow_gaussian` (`penalized.py:143`)."""
    return jnp.exp(-0.5 * jnp.square(X / a))


def nnz_approx(X: Array, target_point: Array, a) -> Array:
    """Differentiable relaxation of `||X - target||_0`
    (`penalized.py:147-158`): `d - sum narrow_gaussian(X - target, a)`,
    keeping the trailing singleton dim as the reference does."""
    d = X.shape[-1]
    return d - jnp.sum(narrow_gaussian(X - target_point, a), axis=-1, keepdims=True)


def l0_approximation(target_point: Array, a: float = 1.0) -> Callable:
    """`L0Approximation` (`penalized.py:161`)."""
    return lambda X: nnz_approx(X, target_point, a)


def l0_penalty_approx(target_point: Array, a: float = 1.0) -> Callable:
    """`L0PenaltyApprox` (`penalized.py:180`): acqf-level penalty,
    min over the q-batch of the relaxed L0 norm."""

    def pen(X: Array) -> Array:
        return jnp.min(nnz_approx(X, target_point, a)[..., 0], axis=-1)

    return pen


def l1_penalty_objective(init_point: Array) -> Callable:
    """`L1PenaltyObjective` (`penalized.py:272`): per-point L1 penalty
    `(batch, q, d) -> (1, batch, q)` for objective-level regularization."""

    def pen(X: Array) -> Array:
        return jnp.sum(jnp.abs(X - init_point), axis=-1)[None]

    return pen


def l0_penalty_approx_objective(target_point: Array, a: float = 1.0) -> Callable:
    """`L0PenaltyApproxObjective` (`penalized.py:379`): per-point relaxed
    L0 penalty `(batch, q, d) -> (1, batch, q)`."""

    def pen(X: Array) -> Array:
        return nnz_approx(X, target_point, a)[None, ..., 0]

    return pen


def penalized_mc_objective(
    objective: Callable,
    penalty_objective: Callable,
    regularization_parameter: float,
) -> Callable:
    """`PenalizedMCObjective` (`penalized.py:297`): adds a point-dependent
    penalty at the MC-objective level, BEFORE the q-reduction —
    `obj(samples) - lambda * penalty(X)`. The returned callable takes
    `(samples, X)`; MC acquisition functions detect the `needs_X` marker
    and pass the candidate set through."""

    def obj(samples: Array, X: Array) -> Array:
        base = objective(samples)
        pen = penalty_objective(X)  # (1, ..., q), broadcasts over samples
        return base - regularization_parameter * pen

    obj.needs_X = True
    return obj


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
