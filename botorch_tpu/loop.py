r"""Fully-compiled closed-loop Bayesian optimization.

The reference's BO loop (`MMMA/MMMA.py:103-200`, `test/test_end_to_end.py`)
is host-driven Python: every iteration re-builds modules and re-enters
scipy. On TPU the loop itself should be ONE compiled XLA program: train
data lives in fixed-size padded buffers with a validity mask (see
`SingleTaskGP.mask` — padded kernel rows decouple exactly), the iteration
count is a traced scalar, and a whole `iterations`-step BO run is a
`lax.fori_loop` whose body does fit -> acquire -> optimize -> append. No
recompilation as the history grows, no host round-trips, and the restart
axes inside remain shardable over a mesh.

Two entry points:
  * `bo_step`: one jitted fit+acquire+optimize step for EXTERNAL
    (non-jittable) objectives — the user evaluates the candidate and calls
    `append_observations`.
  * `run_bo_loop`: the fully-compiled loop for jittable objectives
    (synthetic suites, simulators in JAX) — the headline benchmark path.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

from botorch_tpu.acquisition import analytic as analytic_mod
from botorch_tpu.acquisition.monte_carlo import (
    draw_fresh_base_samples,
    qLogNoisyExpectedImprovement,
)
from botorch_tpu.fit import fit_gp
from botorch_tpu.models.gp import make_gp
from botorch_tpu.optim.optimize import optimize_acqf
from botorch_tpu.sampling.sobol import draw_sobol, sobol_table

Array = jax.Array

_ANALYTIC = {
    "EI": analytic_mod.ExpectedImprovement,
    "LogEI": analytic_mod.LogExpectedImprovement,
    "PI": analytic_mod.ProbabilityOfImprovement,
    "LogPI": analytic_mod.LogProbabilityOfImprovement,
    "UCB": analytic_mod.UpperConfidenceBound,
    "PosteriorMean": analytic_mod.PosteriorMean,
}


class BOState(struct.PyTreeNode):
    """Padded BO history in the unit cube. `n` is the number of valid rows."""

    X: Array  # (N_max, d) candidates in [0, 1]^d
    Y: Array  # (N_max,) observations (original units)
    n: Array  # () int32


def init_state(n_init: int, d: int, capacity: int, seed: int = 0) -> tuple[BOState, Array]:
    """Sobol initial design; returns the state (Y zeros — fill via
    `append_observations` after evaluating) and the initial X block."""
    sv, shift = sobol_table(d, scramble=True, seed=seed)
    X0 = draw_sobol(sv, shift, n_init)
    X = jnp.zeros((capacity, d), jnp.float32).at[:n_init].set(X0)
    state = BOState(X=X, Y=jnp.zeros((capacity,), jnp.float32), n=jnp.int32(0))
    return state, X0


def append_observations(state: BOState, X_new: Array, Y_new: Array) -> BOState:
    """Write a `(q, d)` block + `(q,)` observations at the current fill
    point (dynamic slice — works with a traced `n`)."""
    q = X_new.shape[0]
    X = jax.lax.dynamic_update_slice(state.X, X_new.astype(state.X.dtype), (state.n, 0))
    Y = jax.lax.dynamic_update_slice(state.Y, Y_new.astype(state.Y.dtype), (state.n,))
    return state.replace(X=X, Y=Y, n=state.n + q)


def _bo_step(
    state: BOState,
    key: Array,
    sobol: tuple[Array, Array],
    acqf_name: str = "LogEI",
    q: int = 1,
    num_restarts: int = 8,
    raw_samples: int = 64,
    fit_restarts: int = 4,
    fit_maxiter: int = 60,
    acq_maxiter: int = 60,
    kernel: str = "rbf",
    mc_samples: int = 128,
    shard_fn=None,
    params0=None,
):
    """One BO iteration on the padded state: MAP-fit the GP on the masked
    history, build the acquisition, and maximize it in the unit cube.

    Returns `(candidates (q, d), acq_value, fitted GPParams)`. Shapes are
    independent of `state.n`, so this compiles once per configuration.
    `params0` warm-starts restart lane 0 of the fit (the previous
    iteration's MAP estimate inside `run_bo_loop` — the data changed by
    only q points, so it is an excellent start and lets the compiled loop
    run a much smaller fit budget at identical regret).
    """
    capacity, d = state.X.shape
    mask = jnp.arange(capacity) < state.n
    k_fit, k_acq, k_base = jax.random.split(key, 3)

    model = make_gp(state.X, state.Y[:, None], mask=mask, kernel=kernel)
    if params0 is not None:
        model = model.replace(params=params0, _cache=None)
    model = fit_gp(
        model,
        k_fit,
        num_restarts=fit_restarts,
        maxiter=fit_maxiter,
        shard_fn=shard_fn,
    )
    best_f = jnp.max(jnp.where(mask, state.Y, -jnp.inf))
    if acqf_name == "qLogNEI":
        base = draw_fresh_base_samples(
            capacity + q, 1, mc_samples, k_base, seed=17
        )
        acqf = qLogNoisyExpectedImprovement(
            model=model,
            cache=model.train_chol(),
            base_samples=base,
            X_baseline=state.X,
            baseline_mask=mask,
        )
    else:
        acqf_cls = _ANALYTIC[acqf_name]
        acqf = acqf_cls(model=model, cache=model.train_chol(), best_f=best_f)

    unit_bounds = jnp.stack([jnp.zeros(d), jnp.ones(d)])
    # Continue the shared Sobol stream: each step consumes `raw_samples`
    # points starting at an offset derived from the current fill level.
    skip = (state.n.astype(jnp.uint32) + 1) * jnp.uint32(raw_samples)
    cand, val = optimize_acqf(
        acqf,
        unit_bounds,
        q=q,
        num_restarts=num_restarts,
        raw_samples=raw_samples,
        key=k_acq,
        maxiter=acq_maxiter,
        sobol=sobol,
        sobol_skip=skip,
        shard_fn=shard_fn,
    )
    return cand, val, model.params


@partial(
    jax.jit,
    static_argnames=(
        "acqf_name", "q", "num_restarts", "raw_samples", "fit_restarts",
        "fit_maxiter", "acq_maxiter", "kernel", "mc_samples", "shard_fn",
    ),
)
def bo_step(
    state: BOState,
    key: Array,
    sobol: tuple[Array, Array],
    acqf_name: str = "LogEI",
    q: int = 1,
    num_restarts: int = 8,
    raw_samples: int = 64,
    fit_restarts: int = 4,
    fit_maxiter: int = 60,
    acq_maxiter: int = 60,
    kernel: str = "rbf",
    mc_samples: int = 128,
    shard_fn=None,
) -> tuple[Array, Array]:
    """Public single-step entry point (see `_bo_step`); returns
    `(candidates (q, d), acq_value)`."""
    cand, val, _ = _bo_step(
        state, key, sobol, acqf_name=acqf_name, q=q,
        num_restarts=num_restarts, raw_samples=raw_samples,
        fit_restarts=fit_restarts, fit_maxiter=fit_maxiter,
        acq_maxiter=acq_maxiter, kernel=kernel, mc_samples=mc_samples,
        shard_fn=shard_fn,
    )
    return cand, val


def run_bo_loop(
    objective: Callable[[Array], Array],
    d: int,
    n_init: int,
    iterations: int,
    key: Array,
    q: int = 1,
    capacity: Optional[int] = None,
    seed: int = 0,
    **step_kwargs,
) -> BOState:
    """Fully-compiled BO run for a jittable `objective: (q, d) -> (q,)`
    (MAXIMIZED, evaluated on unit-cube inputs — compose with `unnormalize`
    outside if needed).

    The whole loop — init design, every fit, every acquisition
    optimization — is one `lax.fori_loop` inside one `jit`.
    """
    capacity = capacity or (n_init + iterations * q)
    cache_key = (
        objective, d, n_init, iterations, q, capacity, seed,
        tuple(sorted(step_kwargs.items())),
    )
    run = _RUN_CACHE.get(cache_key)
    if run is None:
        sv, shift = sobol_table(q * d, scramble=True, seed=seed)
        sobol = (sv, shift)

        @jax.jit
        def run(key):
            state, X0 = init_state(n_init, d, capacity, seed=seed)
            state = append_observations(state, X0, objective(X0))
            kernel = step_kwargs.get("kernel", "rbf")
            params = make_gp(
                state.X, state.Y[:, None], kernel=kernel
            ).params

            def body(it, carry):
                state, key, params = carry
                key, sub = jax.random.split(key)
                cand, _, params = _bo_step(
                    state, sub, sobol, q=q, params0=params, **step_kwargs
                )
                state = append_observations(state, cand, objective(cand))
                return state, key, params

            state, _, _ = jax.lax.fori_loop(
                0, iterations, body, (state, key, params)
            )
            return state

        _RUN_CACHE[cache_key] = run
    return run(key)


# Compiled-run cache: re-calling `run_bo_loop` with the same configuration
# (same objective object + static config) must NOT re-trace the whole loop.
_RUN_CACHE: dict = {}


def best_observed(state: BOState) -> Array:
    mask = jnp.arange(state.X.shape[0]) < state.n
    return jnp.max(jnp.where(mask, state.Y, -jnp.inf))
