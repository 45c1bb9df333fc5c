r"""TuRBO: trust-region Bayesian optimization (config 5 of BASELINE.json).

The reference repo supports TuRBO-style loops via `MaxPosteriorSampling`
(`generation/sampling.py:60`, used by the TuRBO tutorial); the trust-region
state machine here follows [Eriksson2019turbo] (TuRBO-1):

  * maintain an axis-aligned trust region centered at the incumbent with
    base edge length `length`, scaled per-dimension by the GP's ARD
    lengthscales (normalized to unit product);
  * candidates = scrambled-Sobol perturbations of the center inside the
    region, with each dimension perturbed with probability
    `min(1, 20/d)`;
  * select by Thompson sampling with pathwise (Matheron) draws;
  * `length` doubles after `success_streak` successes (capped at 1.6),
    halves after `failure_streak` failures; restart when below 0.5^7.

Everything is jit-compatible with static shapes; the loop driver uses the
same padded-buffer design as `botorch_tpu/loop.py`.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct

import functools

from botorch_tpu.fit import fit_gp
from botorch_tpu.models.gp import SingleTaskGP, make_gp
from botorch_tpu.sampling.sobol import draw_sobol
from botorch_tpu.generation.sampling import max_posterior_sampling

Array = jax.Array


class TurboState(struct.PyTreeNode):
    length: Array  # () current trust-region base edge length
    success_counter: Array  # () int32
    failure_counter: Array  # () int32
    best_value: Array  # ()
    restart_triggered: Array  # () bool
    length_min: float = struct.field(pytree_node=False, default=0.5**7)
    length_max: float = struct.field(pytree_node=False, default=1.6)
    success_streak: int = struct.field(pytree_node=False, default=3)
    failure_streak: int = struct.field(pytree_node=False, default=5)


def turbo_init(best_value: Array | float = -jnp.inf, **kwargs) -> TurboState:
    return TurboState(
        length=jnp.asarray(0.8),
        success_counter=jnp.int32(0),
        failure_counter=jnp.int32(0),
        best_value=jnp.asarray(best_value, jnp.float32),
        restart_triggered=jnp.bool_(False),
        **kwargs,
    )


def turbo_update(state: TurboState, Y_next: Array) -> TurboState:
    """Update counters and length after observing a candidate batch
    ([Eriksson2019turbo] Sec. 2)."""
    improved = jnp.max(Y_next) > state.best_value + 1e-3 * jnp.abs(state.best_value)
    succ = jnp.where(improved, state.success_counter + 1, 0)
    fail = jnp.where(improved, 0, state.failure_counter + 1)
    grow = succ >= state.success_streak
    shrink = fail >= state.failure_streak
    length = jnp.where(
        grow,
        jnp.minimum(2.0 * state.length, state.length_max),
        jnp.where(shrink, 0.5 * state.length, state.length),
    )
    return state.replace(
        length=length,
        success_counter=jnp.where(grow, 0, succ),
        failure_counter=jnp.where(shrink, 0, fail),
        best_value=jnp.maximum(state.best_value, jnp.max(Y_next)),
        restart_triggered=length < state.length_min,
    )


def generate_turbo_candidates(
    model,
    state: TurboState,
    X_center: Array,
    key: Array,
    n_candidates: int = 2048,
    q: int = 1,
    sobol: Optional[tuple[Array, Array]] = None,
    sobol_skip: Array | int = 0,
    num_features: int = 512,
    lengthscale_override: Optional[Array] = None,
) -> Array:
    """One TuRBO candidate-generation step in the unit cube.

    Returns `(q, d)` candidates chosen by Thompson sampling over the
    perturbation set (pathwise for exact GPs and SVGPs — the latter via
    variational pathwise conditioning; joint posterior draw for models
    without a pathwise representation, e.g. ensembles).
    """
    d = X_center.shape[-1]
    k_pert, k_mask, k_ts = jax.random.split(key, 3)

    # per-dimension trust region scaled by ARD lengthscales
    if lengthscale_override is not None:
        ls = lengthscale_override
    elif hasattr(model, "params"):
        ls = model.params.lengthscale[..., 0, :]
    else:  # flat-field models (SVGP): ARD lengthscale exposed directly
        ls = model.lengthscale
    if ls.ndim > 1:  # ensemble: use the median model
        ls = jnp.median(ls, axis=tuple(range(ls.ndim - 1)))
    weights = ls / jnp.exp(jnp.mean(jnp.log(ls)))  # unit geometric mean
    lb = jnp.clip(X_center - 0.5 * state.length * weights, 0.0, 1.0)
    ub = jnp.clip(X_center + 0.5 * state.length * weights, 0.0, 1.0)

    if sobol is None:
        u = jax.random.uniform(k_pert, (n_candidates, d))
    else:
        sv, shift = sobol
        u = draw_sobol(sv, shift, n_candidates, skip=sobol_skip)
    pert = lb + (ub - lb) * u

    # perturb each dim with prob min(1, 20/d); ensure >= 1 dim perturbed
    prob = min(1.0, 20.0 / d)
    mask = jax.random.uniform(k_mask, (n_candidates, d)) <= prob
    forced = jax.nn.one_hot(
        jax.random.randint(k_mask, (n_candidates,), 0, d), d, dtype=bool
    )
    mask = mask | forced
    X_cand = jnp.where(mask, pert, X_center)

    from botorch_tpu.models.approximate_gp import SVGP

    # exact GPs AND SVGPs have pathwise representations (r4: variational
    # pathwise conditioning, `sampling/pathwise.py`); other models (e.g.
    # ensembles) fall back to a joint posterior draw
    method = (
        "pathwise" if isinstance(model, (SingleTaskGP, SVGP)) else "joint"
    )
    return max_posterior_sampling(
        model, X_cand, k_ts, num_samples=q, method=method,
        num_features=num_features,
    )


def run_turbo(
    objective,
    d: int,
    n_init: int,
    iterations: int,
    key: Array,
    q: int = 1,
    n_candidates: int = 2048,
    capacity: Optional[int] = None,
    fit_restarts: int = 2,
    fit_maxiter: int = 50,
    seed: int = 0,
    model_type: str = "exact",
    svgp_inducing: int = 256,
    svgp_steps: int = 400,
):
    """TuRBO-1 loop for a jittable `objective: (k, d) -> (k,)` (MAXIMIZED,
    unit-cube inputs). Host-driven loop with jitted inner steps; restarts
    reset the trust region with a fresh Sobol design.

    `model_type="exact"` uses the padded masked exact GP (one compiled fit
    for all iterations — large-n exact GPs are fine on TPU);
    `model_type="svgp"` fits a sparse variational GP per iteration (the
    reference's 10k+ observation recipe, SVGP + TuRBO). Returns `(X, Y)`.
    """
    from botorch_tpu.sampling.sobol import sobol_table

    capacity = capacity or (n_init + iterations * q)
    sv, shift = sobol_table(d, scramble=True, seed=seed)
    # NOTE: no extra key split here — the host and compiled loops must
    # consume the identical RNG stream so `run_turbo_compiled` is testable
    # against this loop trajectory-for-trajectory.
    X0 = draw_sobol(sv, shift, n_init)
    Xb = jnp.zeros((capacity, d), jnp.float32).at[:n_init].set(X0)
    Yb = jnp.zeros((capacity,), jnp.float32).at[:n_init].set(objective(X0))
    n = n_init
    state = turbo_init(best_value=jnp.max(Yb[:n]))

    for it in range(iterations):
        key, k_fit, k_gen = jax.random.split(key, 3)
        mask = jnp.arange(capacity) < n
        if model_type == "svgp":
            from botorch_tpu.models.approximate_gp import fit_svgp, make_svgp

            # SVGP over the valid prefix (host slice; the ELBO minibatch
            # program compiles per (n, M) shape bucket)
            model = fit_svgp(
                make_svgp(Xb[:n], Yb[:n], num_inducing=svgp_inducing),
                k_fit, steps=svgp_steps,
                batch_size=min(512, n),
            )
            ls = model.lengthscale
        else:
            model = fit_gp(
                make_gp(Xb, Yb[:, None], mask=mask), k_fit,
                num_restarts=fit_restarts, maxiter=fit_maxiter,
            )
            ls = None
        best_idx = jnp.argmax(jnp.where(mask, Yb, -jnp.inf))
        center = Xb[best_idx]
        # cached jitted generation: model/state/center are traced pytrees,
        # so every iteration reuses one compiled program (exact-GP path)
        gen = _gen_runner(n_candidates, q)
        cand = gen(model, state, center, k_gen, ls)
        y_new = objective(cand)
        Xb = jax.lax.dynamic_update_slice(Xb, cand, (n, 0))
        Yb = jax.lax.dynamic_update_slice(Yb, y_new, (n,))
        n += q
        state = turbo_update(state, y_new)
        if bool(state.restart_triggered):
            state = turbo_init(best_value=jnp.max(Yb[:n]))
    return Xb[:n], Yb[:n]


@functools.lru_cache(maxsize=16)
def _gen_runner(n_candidates, q):
    @jax.jit
    def gen(model, state, center, key, ls):
        return generate_turbo_candidates(
            model, state, center, key, n_candidates=n_candidates, q=q,
            lengthscale_override=ls,
        )

    return gen


_TURBO_RUN_CACHE: dict = {}


def run_turbo_compiled(
    objective,
    d: int,
    n_init: int,
    iterations: int,
    key: Array,
    q: int = 1,
    n_candidates: int = 2048,
    capacity: Optional[int] = None,
    fit_restarts: int = 2,
    fit_maxiter: int = 50,
    seed: int = 0,
    num_features: int = 512,
):
    """Fully-compiled TuRBO-1 run (exact-GP path): init design, every
    fit, candidate generation, trust-region update, and in-graph restart
    are one `lax.fori_loop` inside one `jit` — a single device dispatch
    for the whole run (the host-driven `run_turbo` dispatches per
    iteration, which dominates wall-clock on TPU).

    Same semantics as `run_turbo(model_type="exact")`: restarts reset the
    trust region (data is kept, as the padded masked GP refits on
    everything). Returns `(X (n, d), Y (n,))`.
    """
    capacity = capacity or (n_init + iterations * q)
    cache_key = (
        objective, d, n_init, iterations, q, n_candidates, capacity,
        fit_restarts, fit_maxiter, seed, num_features,
    )
    run = _TURBO_RUN_CACHE.get(cache_key)
    if run is None:
        from botorch_tpu.sampling.sobol import sobol_table

        sv, shift = sobol_table(d, scramble=True, seed=seed)

        @jax.jit
        def run(key):
            X0 = draw_sobol(sv, shift, n_init)
            Xb = jnp.zeros((capacity, d), jnp.float32).at[:n_init].set(X0)
            Yb = jnp.full((capacity,), -jnp.inf, jnp.float32).at[:n_init].set(
                objective(X0)
            )
            state0 = turbo_init(best_value=jnp.max(Yb[:n_init]))

            def body(it, carry):
                Xb, Yb, state, key = carry
                key, k_fit, k_gen = jax.random.split(key, 3)
                n = n_init + it * q
                mask = jnp.arange(capacity) < n
                Ym = jnp.where(mask, Yb, 0.0)  # padded entries are inert
                model = fit_gp(
                    make_gp(Xb, Ym[:, None], mask=mask), k_fit,
                    num_restarts=fit_restarts, maxiter=fit_maxiter,
                )
                center = Xb[jnp.argmax(jnp.where(mask, Yb, -jnp.inf))]
                cand = generate_turbo_candidates(
                    model, state, center, k_gen,
                    n_candidates=n_candidates, q=q,
                    num_features=num_features,
                )
                y_new = objective(cand)
                Xb = jax.lax.dynamic_update_slice(Xb, cand, (n, 0))
                Yb = jax.lax.dynamic_update_slice(Yb, y_new, (n,))
                state = turbo_update(state, y_new)
                state = jax.lax.cond(
                    state.restart_triggered,
                    lambda s: turbo_init(
                        best_value=jnp.max(
                            jnp.where(jnp.arange(capacity) < n + q, Yb,
                                      -jnp.inf)
                        )
                    ),
                    lambda s: s,
                    state,
                )
                return Xb, Yb, state, key

            Xb, Yb, _, _ = jax.lax.fori_loop(
                0, iterations, body, (Xb, Yb, state0, key)
            )
            return Xb, Yb

        _TURBO_RUN_CACHE[cache_key] = run
    Xb, Yb = run(key)
    n = n_init + iterations * q
    return Xb[:n], Yb[:n]
