r"""Acquisition utilities: baseline pruning.

Counterparts of `botorch/acquisition/utils.py:245` (`prune_inferior_points`)
and `botorch/acquisition/multi_objective/utils.py:67`
(`prune_inferior_points_multi_objective`).

These run ONCE per BO iteration on the host (the retained subset has a
data-dependent size, so they are deliberately outside jit — exactly like
the reference, where pruning happens in the qNEI/qNEHVI constructor, not
in the optimized forward). The posterior sampling inside is jitted.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from botorch_tpu.sampling.sobol import draw_sobol_normal_samples
from botorch_tpu.utils.multi_objective import is_non_dominated

Array = jax.Array


def _posterior_samples(model, X: Array, num_samples: int, seed: int) -> Array:
    """qMC joint posterior samples at `X`: `(num_samples, *batch, n, m)`."""
    post = model.posterior(X)
    n, m = post.mean.shape[-2], post.mean.shape[-1]
    base = draw_sobol_normal_samples(n * m, num_samples, seed=seed)
    base = base.reshape(num_samples, n, m)
    # broadcast base samples over any model/ensemble batch dims
    extra = post.mean.ndim - 2
    if extra:
        base = base.reshape(num_samples, *([1] * extra), n, m)
        base = jnp.broadcast_to(base, (num_samples, *post.mean.shape))
    return post.rsample_from_base_samples(base)


def _marginalized_objective(
    samples: Array,
    objective: Optional[Callable[[Array], Array]],
    mo: bool,
) -> Array:
    """Apply the MC objective and average out ensemble batch dims.

    Reference semantics: fully-Bayesian models are marginalized over
    `MCMC_DIM` before ranking (`acquisition/utils.py:293-325`).
    """
    if objective is None:
        obj = samples if mo else samples[..., 0]
    else:
        obj = objective(samples)
    want = 3 if mo else 2
    while obj.ndim > want:  # average ensemble batch dims (sample dim stays)
        obj = jnp.mean(obj, axis=1)
    return obj


def _hard_infeasible(
    constraints: Optional[Sequence[Callable[[Array], Array]]],
    samples: Array,
    target_ndim: int,
) -> Optional[Array]:
    """Boolean `(num_samples, n)` mask of infeasible draws (`c(s) > 0` for
    any constraint), ensemble dims marginalized by majority vote."""
    if not constraints:
        return None
    infeas = jnp.zeros(samples.shape[:-1], dtype=bool)
    for c in constraints:
        infeas = infeas | (c(samples) > 0)
    while infeas.ndim > target_ndim:
        infeas = jnp.mean(infeas.astype(jnp.float32), axis=1) > 0.5
    return infeas


def prune_inferior_points(
    model,
    X: Array,
    objective: Optional[Callable[[Array], Array]] = None,
    constraints: Optional[Sequence[Callable[[Array], Array]]] = None,
    num_samples: int = 2048,
    max_frac: float = 1.0,
    seed: int = 0,
) -> Array:
    """Subset of `X: (n, d)` with nonzero empirical probability of being the
    best (feasible) point under the model posterior.

    Reference `acquisition/utils.py:245-349`: sample the joint posterior,
    rank by per-sample argmax frequency, keep at most `ceil(max_frac * n)`.
    """
    if X.ndim != 2:
        raise ValueError("prune_inferior_points expects unbatched X: (n, d)")
    if X.shape[-2] == 0:
        raise ValueError("X must have at least one point.")
    if not 0 < max_frac <= 1:
        raise ValueError(f"max_frac must be in (0, 1], got {max_frac}")
    max_points = math.ceil(max_frac * X.shape[-2])
    samples = _posterior_samples(model, X, num_samples, seed)
    obj = _marginalized_objective(samples, objective, mo=False)
    infeas = _hard_infeasible(constraints, samples, target_ndim=2)
    if infeas is not None:
        obj = jnp.where(infeas, obj.min() - 1.0, obj)
    is_best = np.asarray(jnp.argmax(obj, axis=-1))
    idcs, counts = np.unique(is_best, return_counts=True)
    if len(idcs) > max_points:
        idcs = idcs[np.argsort(-counts)][:max_points]
    return X[jnp.asarray(np.sort(idcs))]


def prune_inferior_points_multi_objective(
    model,
    X: Array,
    ref_point: Array,
    objective: Optional[Callable[[Array], Array]] = None,
    constraints: Optional[Sequence[Callable[[Array], Array]]] = None,
    num_samples: int = 2048,
    max_frac: float = 1.0,
    seed: int = 0,
) -> Array:
    """Subset of `X: (n, d)` with nonzero empirical probability of being
    Pareto-optimal, feasible, and better than `ref_point`
    (reference `acquisition/multi_objective/utils.py:67-166`)."""
    if X.ndim != 2:
        raise ValueError(
            "prune_inferior_points_multi_objective expects unbatched X: (n, d)"
        )
    if X.shape[-2] == 0:
        raise ValueError("X must have at least one point.")
    if not 0 < max_frac <= 1:
        raise ValueError(f"max_frac must be in (0, 1], got {max_frac}")
    ref_point = jnp.asarray(ref_point)
    max_points = math.ceil(max_frac * X.shape[-2])
    samples = _posterior_samples(model, X, num_samples, seed)
    obj = _marginalized_objective(samples, objective, mo=True)
    infeas = _hard_infeasible(constraints, samples, target_ndim=2)
    if infeas is not None:
        obj = jnp.where(infeas[..., None], ref_point, obj)
    pareto = is_non_dominated(obj, deduplicate=False) & jnp.all(
        obj > ref_point, axis=-1
    )
    probs = np.asarray(jnp.mean(pareto.astype(jnp.float32), axis=0))
    idcs = np.nonzero(probs)[0]
    if len(idcs) > max_points:
        idcs = np.argsort(-probs)[:max_points]
    return X[jnp.asarray(np.sort(idcs))]
