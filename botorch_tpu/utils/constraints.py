r"""Outcome-constraint helpers.

Counterpart of `botorch/utils/constraints.py:20`
(`get_outcome_constraint_transforms`, `get_monotonicity_constraints`) and
`botorch/utils/objective.py:66,101,183` (`apply_constraints*`,
`compute_feasibility_indicator`).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Union

import jax
import jax.numpy as jnp

from botorch_tpu.utils.safe_math import logexpit

Array = jax.Array


def get_outcome_constraint_transforms(
    outcome_constraints: Optional[tuple[Array, Array]],
) -> Optional[list[Callable[[Array], Array]]]:
    """Turn `(A, b)` with `A Y <= b` row-wise into a list of callables
    `c_i(samples) = a_i . samples - b_i` (feasible iff `c_i <= 0`);
    reference `utils/constraints.py:20-63`."""
    if outcome_constraints is None:
        return None
    A, b = outcome_constraints
    A = jnp.asarray(A)
    b = jnp.asarray(b).reshape(-1)

    def make(i):
        return lambda samples: jnp.sum(samples * A[i], axis=-1) - b[i]

    return [make(i) for i in range(A.shape[0])]


def get_monotonicity_constraints(
    d: int, descending: bool = False, dtype=jnp.float32
) -> tuple[Array, Array]:
    """`(A, b)` with `A x <= b` encoding `x_1 <= x_2 <= ... <= x_d`
    (or descending); reference `utils/constraints.py:66-97`."""
    A = jnp.eye(d - 1, d, dtype=dtype) - jnp.eye(d - 1, d, k=1, dtype=dtype)
    if descending:
        A = -A
    return A, jnp.zeros((d - 1, 1), dtype=dtype)


def compute_smoothed_feasibility_indicator(
    constraints: Sequence[Callable[[Array], Array]],
    samples: Array,
    eta: Union[float, Array] = 1e-3,
    log: bool = False,
) -> Array:
    """Product of sigmoid feasibility indicators `prod_i s(-c_i/eta_i)`
    (reference `utils/objective.py:126-180`)."""
    etas = (
        jnp.full((len(constraints),), eta)
        if jnp.ndim(eta) == 0
        else jnp.asarray(eta)
    )
    total = 0.0
    for c, e in zip(constraints, list(etas)):
        total = total + logexpit(-c(samples) / e)
    return total if log else jnp.exp(total)


def compute_feasibility_indicator(
    constraints: Optional[Sequence[Callable[[Array], Array]]],
    samples: Array,
) -> Array:
    """Hard boolean feasibility `all_i c_i(samples) <= 0`
    (reference `utils/objective.py:101`)."""
    feas = jnp.ones(samples.shape[:-1], dtype=bool)
    if constraints is None:
        return feas
    for c in constraints:
        feas = feas & (c(samples) <= 0)
    return feas


def apply_constraints_nonnegative_soft(
    obj: Array,
    constraints: Sequence[Callable[[Array], Array]],
    samples: Array,
    eta: Union[float, Array],
) -> Array:
    """Clamp the objective at 0 and weight by smoothed feasibility
    (reference `utils/objective.py:66-98`)."""
    w = compute_smoothed_feasibility_indicator(constraints, samples, eta)
    if obj.ndim == samples.ndim:
        w = w[..., None]
    return jnp.maximum(obj, 0.0) * w


def apply_constraints(
    obj: Array,
    constraints: Sequence[Callable[[Array], Array]],
    samples: Array,
    infeasible_cost: float,
    eta: Union[float, Array] = 1e-3,
) -> Array:
    """Shift the objective to be nonnegative, feasibility-weight it, then
    shift back (reference `utils/objective.py:183-230`):
    `w * (obj + M) - M` with `M = infeasible_cost`."""
    obj = obj + infeasible_cost
    obj = apply_constraints_nonnegative_soft(obj, constraints, samples, eta)
    return obj - infeasible_cost


def estimate_feasible_volume(
    model,
    bounds: Array,
    constraints,
    key: Array,
    num_points: int = 4096,
) -> Array:
    """Reference-named wrapper over `feasible_volume_mc`
    (`utils/feasible_volume.py:205`)."""
    from botorch_tpu.acquisition.active_learning import feasible_volume_mc

    return feasible_volume_mc(model, bounds, constraints, key, num_points)
