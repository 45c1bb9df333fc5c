r"""Fully-compiled closed-loop MULTI-OBJECTIVE Bayesian optimization.

Counterpart of the reference's qNEHVI tutorial loop (config 4 of
BASELINE.json: "qNEHVI multi-objective BO"; reference
`acquisition/multi_objective/monte_carlo.py:325` + host-driven loops).
Same design as the single-objective `botorch_tpu/loop.py`: padded
fixed-shape history buffers + validity mask, one `lax.fori_loop` per BO
run, so the whole multi-objective campaign — every multi-output GP refit,
every qLogNEHVI evaluation with per-sample in-graph staircase cell
decompositions (m = 2), every acquisition L-BFGS — is ONE XLA program.

The padded baseline flows into qLogNEHVI through its `baseline_mask`:
masked-out rows are moved strictly below the reference point so they
contribute no cells to the per-sample fronts.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

from botorch_tpu.acquisition.monte_carlo import draw_fresh_base_samples
from botorch_tpu.acquisition.multi_objective import (
    _subset_masks,
    qLogNoisyExpectedHypervolumeImprovement,
)
from botorch_tpu.fit import fit_gp
from botorch_tpu.loop import init_state  # reuse Sobol init design
from botorch_tpu.models.gp import make_gp
from botorch_tpu.optim.optimize import optimize_acqf
from botorch_tpu.sampling.sobol import draw_sobol, sobol_table

Array = jax.Array


class MOBOState(struct.PyTreeNode):
    """Padded multi-objective BO history in the unit cube."""

    X: Array  # (N_max, d)
    Y: Array  # (N_max, m) observations (original units)
    n: Array  # () int32


def init_mo_state(
    n_init: int, d: int, m: int, capacity: int, seed: int = 0
) -> tuple[MOBOState, Array]:
    """Sobol initial design; same contract as `loop.init_state`."""
    so_state, X0 = init_state(n_init, d, capacity, seed=seed)
    state = MOBOState(
        X=so_state.X, Y=jnp.zeros((capacity, m), jnp.float32), n=jnp.int32(0)
    )
    return state, X0


def append_mo_observations(state: MOBOState, X_new: Array, Y_new: Array) -> MOBOState:
    q = X_new.shape[0]
    X = jax.lax.dynamic_update_slice(
        state.X, X_new.astype(state.X.dtype), (state.n, 0)
    )
    Y = jax.lax.dynamic_update_slice(
        state.Y, Y_new.astype(state.Y.dtype), (state.n, 0)
    )
    return state.replace(X=X, Y=Y, n=state.n + q)


def _mo_bo_step(
    state: MOBOState,
    key: Array,
    sobol: tuple[Array, Array],
    ref_point: Array,
    q: int = 1,
    num_restarts: int = 8,
    raw_samples: int = 64,
    fit_restarts: int = 2,
    fit_maxiter: int = 20,
    acq_maxiter: int = 20,
    kernel: str = "rbf",
    mc_samples: int = 64,
    shard_fn=None,
    params0=None,
    sequential: bool = True,
):
    """One MO BO iteration on the padded state: fit the multi-output GP on
    the masked history, build qLogNEHVI over the padded baseline, maximize.
    Shapes are independent of `state.n` — compiles once per config."""
    capacity, d = state.X.shape
    m = state.Y.shape[-1]
    # m == 2 uses the in-graph staircase cells; m >= 3 the padded Lacour
    # decomposition (`utils/box_decomposition_jax`) — both fully inside
    # jit. The m >= 3 cell construction scales O(capacity * |U|) per MC
    # sample, so keep capacities moderate (hundreds) there.
    mask = jnp.arange(capacity) < state.n
    k_fit, k_acq, k_base = jax.random.split(key, 3)

    model = make_gp(state.X, state.Y, mask=mask, kernel=kernel)
    if params0 is not None:
        model = model.replace(params=params0, _cache=None)
    model = fit_gp(
        model, k_fit, num_restarts=fit_restarts, maxiter=fit_maxiter,
        shard_fn=shard_fn,
    )

    base = draw_fresh_base_samples(capacity + q, m, mc_samples, k_base, seed=23)
    cache = model.train_chol()
    unit_bounds = jnp.stack([jnp.zeros(d), jnp.ones(d)])
    skip = (state.n.astype(jnp.uint32) + 1) * jnp.uint32(raw_samples)

    # Build the per-MC-sample cells ONCE per step from the X-independent
    # baseline block of the SAA samples (identical across sequential
    # picks too — pending points enter as candidates, not baseline).
    # Leaving this to qNEHVI._hvi would re-run the staircase sort (m=2)
    # or the O(nb*|U|) Lacour scans (m>=3) inside every L-BFGS
    # value/grad evaluation.
    from botorch_tpu.acquisition.multi_objective import (
        make_in_graph_nehvi_cells,
    )

    lo_c, up_c = make_in_graph_nehvi_cells(
        model, cache, state.X, base[:, :capacity, :],
        jnp.asarray(ref_point), baseline_mask=mask,
    )
    cell_kwargs = dict(cell_lower=lo_c, cell_upper=up_c)

    if sequential and q > 1:
        # Sequential-greedy q-batch construction (the reference's default
        # for q > 1 NEHVI, `optimize_acqf(..., sequential=True)` /
        # `_optimize_acqf_sequential_q`, `optim/optimize.py:202`): each
        # pick maximizes the JOINT HVI with the already-chosen points as
        # X_pending. Statically unrolled — q compiled sub-programs inside
        # the one jit. Measurably better fronts than the joint q-batch
        # ascent at the same budgets (the r2 bench's hv_frac gap).
        # ls="interp": on the qNEHVI surfaces the interpolating line
        # search measures BETTER fronts and 2x throughput vs halving
        # (r5 16-seed m=3 sweep: 0.723/min 0.648 vs 0.690/min 0.550;
        # m=2 6-seed: hv 0.967 at 5.25 iters/s vs 0.963 at 2.25) — the
        # opposite of the d=8 SAASBO ensemble-LogEI landscape, hence a
        # per-surface knob rather than a global default (BASELINE.md
        # §Round-5).
        cands = []
        val = None
        for j in range(q):
            masks_j, signs_j = _subset_masks(1 + j)
            acqf_j = qLogNoisyExpectedHypervolumeImprovement(
                model=model,
                cache=cache,
                base_samples=base[:, : capacity + 1 + j, :],
                X_baseline=state.X,
                ref_point=ref_point,
                masks=masks_j,
                signs=signs_j,
                baseline_mask=mask,
                **cell_kwargs,
                X_pending=(
                    jnp.concatenate(cands, axis=0) if cands else None
                ),
            )
            k_acq, sub = jax.random.split(k_acq)
            cand_j, val = optimize_acqf(
                acqf_j, unit_bounds, q=1,
                num_restarts=num_restarts, raw_samples=raw_samples,
                key=sub, maxiter=acq_maxiter, sobol=sobol,
                sobol_skip=skip + jnp.uint32(j) * jnp.uint32(raw_samples),
                shard_fn=shard_fn, ls="interp",
            )
            cands.append(cand_j)
        cand = jnp.concatenate(cands, axis=0)
        return cand, val, model.params

    masks, signs = _subset_masks(q)
    acqf = qLogNoisyExpectedHypervolumeImprovement(
        model=model,
        cache=cache,
        base_samples=base,
        X_baseline=state.X,
        ref_point=ref_point,
        masks=masks,
        signs=signs,
        baseline_mask=mask,
        **cell_kwargs,
    )
    cand, val = optimize_acqf(
        acqf, unit_bounds, q=q,
        num_restarts=num_restarts, raw_samples=raw_samples,
        key=k_acq, maxiter=acq_maxiter, sobol=sobol, sobol_skip=skip,
        shard_fn=shard_fn, ls="interp",
    )
    return cand, val, model.params


@partial(
    jax.jit,
    static_argnames=(
        "q", "num_restarts", "raw_samples", "fit_restarts", "fit_maxiter",
        "acq_maxiter", "kernel", "mc_samples", "shard_fn", "sequential",
    ),
)
def mo_bo_step(
    state: MOBOState,
    key: Array,
    sobol: tuple[Array, Array],
    ref_point: Array,
    q: int = 1,
    num_restarts: int = 8,
    raw_samples: int = 64,
    fit_restarts: int = 2,
    fit_maxiter: int = 20,
    acq_maxiter: int = 20,
    kernel: str = "rbf",
    mc_samples: int = 64,
    shard_fn=None,
    sequential: bool = True,
) -> tuple[Array, Array]:
    """Public single-step entry point for external objectives."""
    cand, val, _ = _mo_bo_step(
        state, key, sobol, ref_point, q=q,
        num_restarts=num_restarts, raw_samples=raw_samples,
        fit_restarts=fit_restarts, fit_maxiter=fit_maxiter,
        acq_maxiter=acq_maxiter, kernel=kernel, mc_samples=mc_samples,
        shard_fn=shard_fn, sequential=sequential,
    )
    return cand, val


_RUN_CACHE: dict = {}


def run_mo_bo_loop(
    objective: Callable[[Array], Array],
    d: int,
    m: int,
    ref_point,
    n_init: int,
    iterations: int,
    key: Array,
    q: int = 1,
    capacity: Optional[int] = None,
    seed: int = 0,
    **step_kwargs,
) -> MOBOState:
    """Fully-compiled MO BO run for a jittable `objective: (q, d) -> (q, m)`
    (all objectives MAXIMIZED, unit-cube inputs). One `jit`, one
    `lax.fori_loop` — the multi-objective analogue of `run_bo_loop`.

    Budget guidance (r4 16-seed DTLZ2 m=3 sweep, BASELINE.md): FIT budget
    dominates front quality — prefer raising `fit_restarts`/`fit_maxiter`
    (bench uses 8/50) before anything else; heavier ACQUISITION
    optimization (`num_restarts`/`acq_maxiter`) actively HURTS under a
    weak fit by exploiting model optimism at the bound corners, and
    `mc_samples` beyond 32 buys nothing at these scales."""
    capacity = capacity or (n_init + iterations * q)
    ref_point = jnp.asarray(ref_point, jnp.float32)
    cache_key = (
        objective, d, m, n_init, iterations, q, capacity, seed,
        tuple(sorted(step_kwargs.items())),
    )
    run = _RUN_CACHE.get(cache_key)
    if run is None:
        sv, shift = sobol_table(q * d, scramble=True, seed=seed)
        sobol = (sv, shift)

        @jax.jit
        def run(key, ref_point):
            state, X0 = init_mo_state(n_init, d, m, capacity, seed=seed)
            state = append_mo_observations(state, X0, objective(X0))
            kernel = step_kwargs.get("kernel", "rbf")
            params = make_gp(state.X, state.Y, kernel=kernel).params

            def body(it, carry):
                state, key, params = carry
                key, sub = jax.random.split(key)
                cand, _, params = _mo_bo_step(
                    state, sub, sobol, ref_point, q=q, params0=params,
                    **step_kwargs,
                )
                state = append_mo_observations(state, cand, objective(cand))
                return state, key, params

            state, _, _ = jax.lax.fori_loop(
                0, iterations, body, (state, key, params)
            )
            return state

        _RUN_CACHE[cache_key] = run
    return run(key, ref_point)


def observed_hypervolume(state: MOBOState, ref_point) -> float:
    """Hypervolume dominated by the observed front above `ref_point`
    (host-side; use after the compiled run)."""
    import numpy as np

    from botorch_tpu.utils.multi_objective import hypervolume

    n = int(state.n)
    Y = np.asarray(state.Y)[:n]
    # hypervolume's m=2 staircase already drops dominated/below-ref points
    return float(hypervolume(Y, np.asarray(ref_point)))
