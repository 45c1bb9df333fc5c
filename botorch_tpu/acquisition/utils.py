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


# --------------------------------------------------------------------------- #
# General acquisition helpers (reference `acquisition/utils.py:44-540` and
# `optim/utils/acquisition_utils.py`)
# --------------------------------------------------------------------------- #
def repeat_to_match_aug_dim(target: Array, reference: Array) -> Array:
    """Tile `target` along its leading (sample) axis so it matches
    `reference` when an objective augmented the MC-sample dim (reference
    `acquisition/utils.py:44`, used by `LearnedObjective` expansion)."""
    if target.ndim == 0 or target.shape[0] == reference.shape[0]:
        return target
    reps = reference.shape[0] // target.shape[0]
    return jnp.concatenate([target] * reps, axis=0)


def compute_feasibility_indicator(constraints, samples: Array) -> Array:
    """Boolean AND of hard feasibility indicators `c(samples) <= 0`
    (reference `utils/objective.py` `compute_feasibility_indicator`)."""
    ind = jnp.ones(samples.shape[:-1], bool)
    for c in constraints or ():
        ind = ind & (c(samples) <= 0.0)
    return ind


def compute_best_feasible_objective(
    samples: Array,
    obj: Array,
    constraints,
    model=None,
    objective=None,
    X_baseline: Optional[Array] = None,
    infeasible_obj: Optional[float] = None,
) -> Array:
    """Best (max) objective value among feasible points, per sample path
    (reference `acquisition/utils.py:90`). With no feasible point, falls
    back to `infeasible_obj`, or to a 6-sigma model lower bound estimated
    from convex combinations of `X_baseline`."""
    if constraints is None:
        return jnp.max(obj, axis=-1)
    feas = compute_feasibility_indicator(constraints, samples)
    if bool(jnp.all(jnp.any(feas, axis=-1))):
        infeasible_value = -jnp.inf
    elif infeasible_obj is not None:
        infeasible_value = float(infeasible_obj)
    else:
        if model is None or X_baseline is None:
            raise ValueError(
                "Must specify `model` and `X_baseline` when no feasible "
                "observation exists."
            )
        w = jax.random.uniform(jax.random.PRNGKey(0), (32, X_baseline.shape[-2]))
        w = w / jnp.sum(w, axis=0, keepdims=True)
        lb = -get_infeasible_cost(w @ X_baseline, model, objective=objective)
        infeasible_value = float(jnp.min(lb))
    feas = repeat_to_match_aug_dim(feas, obj)
    return jnp.max(jnp.where(feas, obj, infeasible_value), axis=-1)


def get_infeasible_cost(
    X: Array, model, objective: Optional[Callable] = None
) -> Array:
    """Per-outcome `M` with `-M < min_x f(x)` w.h.p.: the negative clamped
    6-sigma lower bound of the posterior over `X` (reference
    `acquisition/utils.py:203`)."""
    post = model.posterior(X)
    lb_in = post.mean - 6.0 * jnp.sqrt(jnp.maximum(post.variance, 0.0))
    if objective is None:
        lb = lb_in[..., 0:1]
    else:
        lb = objective(lb_in)
        if lb.ndim < lb_in.ndim:
            lb = lb[..., None]
    lb = lb.reshape(-1, lb.shape[-1]).min(axis=0)
    return -jnp.minimum(lb, 0.0)


def project_to_target_fidelity(
    X: Array, target_fidelities: Optional[dict] = None, d: Optional[int] = None
) -> Array:
    """Set (or insert) fidelity columns of `X` to their target values
    (reference `acquisition/utils.py:352`); the `project` argument of
    qMultiFidelityKG/MES."""
    if target_fidelities is None:
        target_fidelities = {-1: 1.0}
    if d is None:
        d = X.shape[-1]
    tfs = {(k if k >= 0 else d + k): v for k, v in target_fidelities.items()}
    ones = jnp.ones(X.shape[:-1], X.dtype)
    if X.shape[-1] == d:
        cols = [
            tfs[i] * ones if i in tfs else X[..., i] for i in range(d)
        ]
    elif X.shape[-1] == d - len(tfs):
        cols, xi = [], 0
        for i in range(d):
            if i in tfs:
                cols.append(tfs[i] * ones)
            else:
                cols.append(X[..., xi])
                xi += 1
    else:
        raise ValueError(
            f"X must have a last dimension of size {d} or {d - len(tfs)}, "
            f"got {X.shape[-1]}."
        )
    return jnp.stack(cols, axis=-1)


def expand_trace_observations(
    X: Array, fidelity_dims=None, num_trace_obs: int = 0
) -> Array:
    """Augment each q-batch with `num_trace_obs` lower-fidelity copies of
    every point — fidelities scaled by `(K-j)/(K+1)` (reference
    `acquisition/utils.py:415`)."""
    if num_trace_obs == 0:
        return X
    if fidelity_dims is None:
        fidelity_dims = [-1]
    q, d = X.shape[-2], X.shape[-1]
    reps = (1,) * (X.ndim - 2) + (1 + num_trace_obs, 1)
    X_exp = jnp.tile(X, reps)
    s_pad = 1.0 / (num_trace_obs + 1)
    sf = jnp.linspace(1 - s_pad, s_pad, num_trace_obs)
    sf = jnp.repeat(sf, q)  # (num_trace_obs * q,)
    scale = jnp.ones_like(X_exp)
    fdims = jnp.asarray([i if i >= 0 else d + i for i in fidelity_dims])
    scale = scale.at[..., q:, fdims].set(sf[:, None])
    return scale * X_exp


def project_to_sample_points(X: Array, sample_points: Array) -> Array:
    """Replace the trailing `d'` columns of the (q=1) candidate with each
    of `p` sample points, producing a `p`-batch (reference
    `acquisition/utils.py:468`); used to integrate env variables out."""
    p, d_prime = sample_points.shape
    X_new = jnp.repeat(X, p, axis=-2)
    return X_new.at[..., -d_prime:].set(
        jnp.broadcast_to(sample_points, X_new[..., -d_prime:].shape)
    )


def get_optimal_samples(
    model,
    bounds: Array,
    num_optima: int,
    key,
    raw_samples: int = 1024,
    num_restarts: int = 20,
    maximize: bool = True,
):
    """Draw Matheron posterior sample paths and optimize each (reference
    `acquisition/utils.py:487`): returns `(x*, f*)` with leading axis
    `num_optima`."""
    from botorch_tpu.sampling.pathwise import draw_matheron_paths
    from botorch_tpu.utils.sampling import optimize_posterior_samples

    paths = draw_matheron_paths(model, key, num_paths=num_optima)
    sign = 1.0 if maximize else -1.0
    xs, fs = [], []
    for i, k in enumerate(jax.random.split(key, num_optima)):
        x_i, f_i = optimize_posterior_samples(
            lambda x, i=i: sign * paths(x)[i],
            bounds=bounds,
            key=k,
            raw_samples=raw_samples,
            num_restarts=num_restarts,
        )
        xs.append(x_i)
        fs.append(sign * f_i)
    return jnp.stack(xs), jnp.stack(fs)


def get_X_baseline(acq_function) -> Optional[Array]:
    """Extract the baseline points stored on an acquisition function
    (reference `optim/utils/acquisition_utils.py` `get_X_baseline`):
    checks `X_baseline` then the model's train inputs."""
    Xb = getattr(acq_function, "X_baseline", None)
    if Xb is not None:
        return Xb
    inner = getattr(acq_function, "acqf", None)
    if inner is not None:
        return get_X_baseline(inner)
    model = getattr(acq_function, "model", None)
    if model is not None:
        return getattr(model, "X", None)
    return None
