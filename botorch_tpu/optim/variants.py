r"""optimize_acqf variants: sequential greedy, cyclic, list, mixed, local
search; stopping criterion; homotopy continuation.

Counterpart of `botorch/optim/optimize.py:567-1268` (`optimize_acqf_cyclic
:567`, `_list :703`, `_mixed :835`, `_discrete_local_search :1133`, and the
sequential-greedy q>1 mode `_optimize_acqf_sequential_q :202`),
`botorch/optim/stopping.py:41` (`ExpMAStoppingCriterion`), and
`botorch/optim/homotopy.py:94` / `optimize_homotopy.py:49`.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from botorch_tpu.optim.optimize import optimize_acqf, optimize_acqf_discrete

Array = jax.Array


def optimize_acqf_sequential(
    acqf_factory: Callable,
    bounds: Array,
    q: int,
    key: Array,
    num_restarts: int = 8,
    raw_samples: int = 64,
    maxiter: int = 100,
    seed: int = 0,
):
    """Sequential-greedy q>1 optimization (reference
    `_optimize_acqf_sequential_q`, `optim/optimize.py:202`): optimize one
    candidate at a time, conditioning later picks on earlier ones via
    `X_pending`.

    `acqf_factory(X_pending) -> acqf` must rebuild the acquisition with the
    pending points baked in (base samples covering `1 + n_pending`).
    """
    cands = []
    X_pending = None
    for i in range(q):
        key, sub = jax.random.split(key)
        acqf = acqf_factory(X_pending)
        cand, _ = optimize_acqf(
            acqf, bounds, q=1, num_restarts=num_restarts,
            raw_samples=raw_samples, key=sub, maxiter=maxiter,
            seed=seed * 100 + i,
        )
        cands.append(cand)
        X_pending = jnp.concatenate(cands, axis=0)
    vals = None
    return X_pending, vals


def optimize_acqf_cyclic(
    acqf_factory: Callable,
    bounds: Array,
    q: int,
    key: Array,
    cycles: int = 2,
    **kwargs,
):
    """Cyclic coordinate refinement of a q-batch (reference
    `optimize_acqf_cyclic :567`): after a sequential pass, re-optimize each
    candidate holding the others fixed as pending."""
    X, _ = optimize_acqf_sequential(
        acqf_factory, bounds, q, key, **kwargs
    )
    for c in range(cycles - 1):
        for i in range(q):
            key, sub = jax.random.split(key)
            others = jnp.concatenate([X[:i], X[i + 1 :]], axis=0)
            acqf = acqf_factory(others)
            cand, _ = optimize_acqf(
                acqf, bounds, q=1, key=sub,
                num_restarts=kwargs.get("num_restarts", 8),
                raw_samples=kwargs.get("raw_samples", 64),
                maxiter=kwargs.get("maxiter", 100),
            )
            X = X.at[i].set(cand[0])
    return X


def optimize_acqf_list(
    acqfs: Sequence[Callable],
    bounds: Array,
    key: Array,
    **kwargs,
) -> Array:
    """Optimize a list of acquisitions one after another (reference
    `optimize_acqf_list :703`); returns stacked `(len(acqfs), d)`
    candidates. Callers handle pending-point conditioning between acqfs."""
    out = []
    for i, acqf in enumerate(acqfs):
        key, sub = jax.random.split(key)
        cand, _ = optimize_acqf(acqf, bounds, q=1, key=sub, **kwargs)
        out.append(cand[0])
    return jnp.stack(out)


def optimize_acqf_mixed(
    acqf: Callable,
    bounds: Array,
    q: int,
    fixed_features_list: Sequence[dict],
    key: Array,
    **kwargs,
):
    """Mixed discrete/continuous optimization (reference
    `optimize_acqf_mixed :835`): enumerate each fixed-feature combination,
    optimize the continuous dims with those features pinned (degenerate box
    bounds), take the best."""
    d = bounds.shape[-1]
    best_cand, best_val = None, -np.inf
    for i, ff in enumerate(fixed_features_list):
        key, sub = jax.random.split(key)
        lo = bounds[0]
        hi = bounds[1]
        for idx, val in ff.items():
            lo = lo.at[idx].set(val)
            hi = hi.at[idx].set(val)
        cand, val = optimize_acqf(
            acqf, jnp.stack([lo, hi]), q=q, key=sub, **kwargs
        )
        if float(val) > best_val:
            best_cand, best_val = cand, float(val)
    return best_cand, jnp.asarray(best_val)


def optimize_acqf_discrete_local_search(
    acqf: Callable,
    choices_per_dim: Sequence[Array],
    key: Array,
    q: int = 1,
    num_restarts: int = 4,
    max_iterations: int = 32,
):
    """Neighborhood hill-climbing for large discrete spaces (reference
    `optimize_acqf_discrete_local_search :1133`): start from random grid
    points; repeatedly move one coordinate to its best choice value."""
    d = len(choices_per_dim)
    sizes = [c.shape[0] for c in choices_per_dim]

    def random_point(k):
        idxs = [
            jax.random.randint(jax.random.fold_in(k, i), (), 0, sizes[i])
            for i in range(d)
        ]
        return jnp.stack([choices_per_dim[i][idxs[i]] for i in range(d)])

    best_cands = []
    for restart in range(num_restarts):
        key, sub = jax.random.split(key)
        x = random_point(sub)
        val = acqf(x[None, :])
        for it in range(max_iterations):
            improved = False
            for dim in range(d):
                cands = jnp.tile(x, (sizes[dim], 1))
                cands = cands.at[:, dim].set(choices_per_dim[dim])
                vals = jax.vmap(lambda c: acqf(c[None, :]))(cands)
                j = jnp.argmax(vals)
                if float(vals[j]) > float(val) + 1e-12:
                    x = cands[j]
                    val = vals[j]
                    improved = True
            if not improved:
                break
        best_cands.append((float(val), x))
    best_cands.sort(key=lambda t: -t[0])
    X = jnp.stack([x for _, x in best_cands[:q]])
    vals = jnp.asarray([v for v, _ in best_cands[:q]])
    return X, vals


# --------------------------------------------------------------------------- #
class ExpMAStoppingCriterion:
    """Exponential-moving-average slope stopping rule (reference
    `optim/stopping.py:41`: n_window=10, eta=1.0, rel_tol=1e-5): stop when
    the EMA-weighted regression slope of the loss trace over the window is
    above `-rel_tol` (relative)."""

    def __init__(self, maxiter: int = 10000, minimize: bool = True,
                 n_window: int = 10, eta: float = 1.0, rel_tol: float = 1e-5):
        self.maxiter = maxiter
        self.minimize = minimize
        self.n_window = n_window
        self.rel_tol = rel_tol
        w = np.exp(np.linspace(-eta, 0.0, n_window))
        self._weights = w / w.sum()
        self._trace: list[float] = []

    def evaluate(self, fvals: float) -> bool:
        v = float(fvals)
        self._trace.append(v if self.minimize else -v)
        t = len(self._trace)
        if t >= self.maxiter:
            return True
        if t < self.n_window + 1:
            return False
        window = np.asarray(self._trace[-(self.n_window + 1):])
        diffs = np.diff(window)
        scale = max(abs(window[-1]), 1e-12)
        slope = float((self._weights * diffs).sum()) / scale
        return slope > -self.rel_tol


# --------------------------------------------------------------------------- #
class Homotopy:
    """Parameter continuation schedule (reference `optim/homotopy.py:94`):
    step a list of (setter, values) schedules together."""

    def __init__(self, schedules: Sequence[tuple[Callable[[float], None], Sequence[float]]]):
        self.schedules = list(schedules)
        self.n_steps = len(self.schedules[0][1])
        for _, vals in self.schedules:
            if len(vals) != self.n_steps:
                raise ValueError("all schedules need the same length")

    def __iter__(self):
        for i in range(self.n_steps):
            for setter, vals in self.schedules:
                setter(vals[i])
            yield i


def log_linear_schedule(start: float, end: float, steps: int) -> list[float]:
    return list(np.exp(np.linspace(np.log(start), np.log(end), steps)))


def optimize_acqf_homotopy(
    acqf_factory: Callable[[float], Callable],
    bounds: Array,
    q: int,
    key: Array,
    schedule: Sequence[float],
    **kwargs,
):
    """Homotopy continuation (reference `optimize_homotopy.py:49`): solve a
    sequence of progressively sharper acquisition problems, warm-starting
    each from the previous solution."""
    ics = None
    cand = val = None
    for i, param in enumerate(schedule):
        key, sub = jax.random.split(key)
        acqf = acqf_factory(param)
        cand, val = optimize_acqf(
            acqf, bounds, q=q, key=sub,
            initial_conditions=ics, **kwargs,
        )
        ics = cand[None, :, :]  # warm start: single restart from previous
    return cand, val


# --------------------------------------------------------------------------- #
# Named homotopy schedules (reference `optim/homotopy.py:17-94`)
# --------------------------------------------------------------------------- #
class FixedHomotopySchedule:
    """Explicit list of parameter values (reference `homotopy.py:17`)."""

    def __init__(self, values: Sequence[float]):
        self._values = list(values)

    @property
    def num_steps(self) -> int:
        return len(self._values)

    @property
    def values(self) -> list:
        return list(self._values)

    def __iter__(self):
        return iter(self._values)


class LinearHomotopySchedule(FixedHomotopySchedule):
    """Linearly spaced schedule (reference `homotopy.py:48`)."""

    def __init__(self, start: float, end: float, num_steps: int):
        super().__init__(list(np.linspace(start, end, num_steps)))


class LogLinearHomotopySchedule(FixedHomotopySchedule):
    """Log-linearly spaced schedule (reference `homotopy.py:64`)."""

    def __init__(self, start: float, end: float, num_steps: int):
        super().__init__(log_linear_schedule(start, end, num_steps))


class HomotopyParameter:
    """A (setter, schedule) pair consumable by `Homotopy`
    (reference `homotopy.py:78`: parameter reference + schedule)."""

    def __init__(self, setter: Callable[[float], None],
                 schedule: FixedHomotopySchedule):
        self.setter = setter
        self.schedule = schedule

    def as_pair(self) -> tuple:
        return (self.setter, self.schedule.values)
