r"""Acquisition-function optimization: multi-start L-BFGS on device.

Counterpart of `botorch/optim/optimize.py:397` (`optimize_acqf`) +
`botorch/optim/initializers.py:243,893` (Sobol raw sampling, Boltzmann
initial-condition selection) + `botorch/generation/gen.py:46`
(`gen_candidates_scipy`).

The reference's pipeline crosses the CPU boundary per L-BFGS iteration
(numpy <-> torch marshalling into Fortran). Here the entire pipeline —
raw-sample evaluation, IC selection, all restarts of the bound-constrained
L-BFGS ascent, and the final argmax — is one compiled JAX program: restarts
are vmapped lanes of `multi_start_lbfgsb` and can be sharded over a device
mesh along the restart axis (SURVEY §2.10: the t-batch axis is the sharding
opportunity).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from botorch_tpu.ops.lbfgs import lbfgsb, multi_start_lbfgsb
from botorch_tpu.optim.constraints import (
    FEASIBILITY_TOL,
    AffineSubspace,
    _dense_rows_flat,
    is_interpoint,
    linear_violation,
    make_al_objective,
    nonlinear_values,
    project_box_affine_halfspaces,
)
from botorch_tpu.sampling.sobol import draw_sobol, draw_sobol_samples, sobol_table

Array = jax.Array


def initialize_q_batch(
    key: Array, X: Array, acq_vals: Array, n: int, eta: float = 1.0
) -> Array:
    """Boltzmann-weighted selection of `n` ICs from raw candidates
    (reference `initializers.py:893-965`).

    Heuristic: sample `n` of the `b` raw q-batches without replacement with
    probability `~ exp(eta * standardize(acq_val))` (Gumbel-top-k), always
    including the argmax.
    """
    b = X.shape[0]
    vals = jnp.where(jnp.isfinite(acq_vals), acq_vals, -jnp.inf)
    max_idx = jnp.argmax(vals)
    std = jnp.std(vals, where=jnp.isfinite(vals))
    std = jnp.where((std > 0) & jnp.isfinite(std), std, 1.0)
    mean = jnp.mean(vals, where=jnp.isfinite(vals))
    mean = jnp.where(jnp.isfinite(mean), mean, 0.0)
    z = (vals - mean) / std
    gumbel = -jnp.log(-jnp.log(jax.random.uniform(key, (b,), minval=1e-20)))
    scores = jnp.where(jnp.isfinite(vals), eta * z + gumbel, -jnp.inf)
    _, idcs = jax.lax.top_k(scores, n)
    # Guarantee the argmax is present (replace the last pick if missing).
    has_max = jnp.any(idcs == max_idx)
    idcs = jnp.where(
        has_max, idcs, idcs.at[-1].set(max_idx)
    )
    return X[idcs]


def sample_around_best(
    key: Array,
    X_best: Array,
    bounds: Array,
    n: int,
    sigma: float = 1e-1,
) -> Array:
    """Truncated-normal perturbations of incumbent point(s) (reference
    `initializers.py:1040-1196` `sample_around_best` /
    `sample_truncated_normal_perturbations`): half the draws perturb all
    dims, half perturb a random subset (subset-dims heuristic)."""
    k1, k2, k3 = jax.random.split(key, 3)
    d = bounds.shape[-1]
    base = X_best[jax.random.randint(k1, (n,), 0, X_best.shape[0])]
    scale = sigma * (bounds[1] - bounds[0])
    noise = jax.random.truncated_normal(k2, -2.0, 2.0, (n, d)) * scale
    subset = jax.random.uniform(k3, (n, d)) < jnp.minimum(
        1.0, 20.0 / d
    )
    use_subset = jnp.arange(n)[:, None] >= n // 2
    noise = jnp.where(use_subset & ~subset, 0.0, noise)
    return jnp.clip(base + noise, bounds[0], bounds[1])


def gen_batch_initial_conditions(
    acqf: Callable[[Array], Array],
    bounds: Array,
    q: int,
    num_restarts: int,
    raw_samples: int,
    key: Array,
    seed: int = 0,
    eta: float = 1.0,
    batch_eval_limit: Optional[int] = None,
    sobol: Optional[tuple[Array, Array]] = None,
    sobol_skip: Array | int = 0,
    X_best: Optional[Array] = None,
    sample_around_best_frac: float = 0.25,
) -> Array:
    """Sobol raw q-batches -> no-grad acqf eval -> Boltzmann selection
    (reference `initializers.py:243-438`). Returns `(num_restarts, q, d)`.

    `sobol`/`sobol_skip` allow a caller (e.g. a fully-compiled BO loop) to
    supply a persistent scrambled-Sobol stream and a traced skip offset, so
    successive iterations continue one low-discrepancy sequence without
    host-side table rebuilds.
    """
    d = bounds.shape[-1]
    if sobol is None:
        X_raw = draw_sobol_samples(bounds, raw_samples, q, seed=seed)
    else:
        sv, shift = sobol
        u = draw_sobol(sv, shift, raw_samples, skip=sobol_skip)
        # a caller-supplied stream may carry more columns than this
        # problem needs (e.g. a q*d table reused for sequential q=1
        # picks) — a dimension subset of a Sobol set is still Sobol
        u = u[:, : q * d].reshape(raw_samples, q, d)
        X_raw = bounds[0] + (bounds[1] - bounds[0]) * u
    if X_best is not None and sample_around_best_frac > 0:
        key, k_ab = jax.random.split(key)
        n_ab = max(int(raw_samples * sample_around_best_frac), 1)
        ab = sample_around_best(k_ab, jnp.atleast_2d(X_best), bounds, n_ab * q)
        X_raw = jnp.concatenate([X_raw, ab.reshape(n_ab, q, d)], axis=0)
    vals = jax.lax.map(
        acqf, X_raw, batch_size=batch_eval_limit or X_raw.shape[0]
    )
    return initialize_q_batch(key, X_raw, vals, num_restarts, eta=eta)


def optimize_acqf(
    acqf: Callable[[Array], Array],
    bounds: Array,
    q: int,
    num_restarts: int = 8,
    raw_samples: int = 128,
    key: Optional[Array] = None,
    maxiter: int = 100,
    seed: int = 0,
    initial_conditions: Optional[Array] = None,
    return_full: bool = False,
    sobol: Optional[tuple[Array, Array]] = None,
    sobol_skip: Array | int = 0,
    shard_fn=None,
    X_best: Optional[Array] = None,
    inequality_constraints: Optional[list] = None,
    equality_constraints: Optional[list] = None,
    nonlinear_inequality_constraints: Optional[list] = None,
    constraint_penalty: float = 1e3,  # used only for nonlinear-constraint
    # IC screening (gen-time feasibility bias); the solve itself uses the
    # augmented-Lagrangian path, not this weight
    timeout_sec: Optional[float] = None,
    ls: str = "halving",
):
    """Maximize `acqf` over `q` joint candidates in the box `bounds (2, d)`.

    Args:
        acqf: pure function `(q, d) -> scalar` (vmapped internally).
        key: PRNG key for IC selection randomness.
        X_best: optional incumbent(s) for `sample_around_best` ICs.
        inequality_constraints: list of `(indices, coefficients, rhs)`
            meaning `sum_i coef_i x[idx_i] >= rhs` per candidate (the
            reference's convention, `optim/parameter_constraints.py`).
            Indices may also be 2-d `((q_i, d_i), ...)` tuples for
            INTER-point constraints coupling the q-batch (reference
            `parameter_constraints.py:29-66`); same for
            `equality_constraints`.
        equality_constraints: list of `(indices, coefficients, rhs)`
            meaning `sum_i coef_i x[idx_i] = rhs` per candidate
            (reference `parameter_constraints.py:68`
            `make_scipy_linear_constraints` eq-type). ICs are sampled
            inside the affine subspace; candidates are polished with an
            exact Dykstra projection, so returned points satisfy the
            equalities to float32 roundoff.
        nonlinear_inequality_constraints: list of callables or
            `(callable, intra_point)` tuples, meaning `g(x) >= 0`
            (the reference's convention, `optim/optimize.py`). With
            `intra_point=True` (default) `g` maps one point `(d,) ->
            scalar` and applies to every candidate; otherwise `g` maps
            the joint `(q, d) -> scalar`.

        All constraints are enforced by an augmented-Lagrangian outer
        loop (per-restart multipliers, penalty escalation) around the
        batched L-BFGS-B solver, followed by a feasibility polish and an
        explicit check: infeasible restarts are excluded from the final
        argmax, and if no restart is feasible the most-feasible candidate
        is returned (the semantics of the reference's SLSQP +
        fallback-to-starting-point path, `generation/gen.py:278-291`).
        timeout_sec: optional wall-clock budget for the L-BFGS phase
            (reference `optimize_acqf(..., timeout_sec)` →
            `minimize_with_timeout`): iterations run in compiled chunks
            and the best-so-far candidates are returned on expiry.
        ls: line-search mode for the unconstrained L-BFGS path —
            "halving" (default; robust on multi-modal surfaces) or
            "interp" (quadratic interpolation + step memory; measured
            better on qNEHVI surfaces — see `ops/lbfgs.lbfgs_run`).

    Returns:
        `(candidates (q, d), value)` — or, with `return_full`, the per-
        restart `(candidates, values)` before the argmax (used by portfolio
        methods).
    """
    if key is None:
        key = jax.random.PRNGKey(seed)
    d = bounds.shape[-1]

    # One-shot handling (reference `optim/optimize.py:88-93,389-392`):
    # when a one-shot acqf (KG/HVKG/lookahead) is passed with its ACTUAL
    # candidate count, optimize the augmented problem with KG-style ICs
    # and extract the actual candidates from the winning tree.
    one_shot = (
        hasattr(acqf, "get_augmented_q_batch_size")
        and hasattr(acqf, "extract_candidates")
        and q != acqf.get_augmented_q_batch_size()
    )
    if one_shot:
        if q != getattr(acqf, "q", q):
            raise ValueError(
                "one-shot acquisition: pass q equal to the actual candidate "
                f"count ({acqf.q}) or the augmented size "
                f"({acqf.get_augmented_q_batch_size()})"
            )
        q = acqf.get_augmented_q_batch_size()
        if initial_conditions is None and not (
            inequality_constraints
            or equality_constraints
            or nonlinear_inequality_constraints
        ):
            key, k_os = jax.random.split(key)
            initial_conditions = gen_one_shot_kg_initial_conditions(
                acqf, bounds, num_restarts, raw_samples, key=k_os, seed=seed
            )

    interpoint = is_interpoint(inequality_constraints) or is_interpoint(
        equality_constraints
    )
    if initial_conditions is None:
        if (
            inequality_constraints or equality_constraints
        ) and not interpoint:
            from botorch_tpu.utils.sampling import get_polytope_samples

            key, k_poly = jax.random.split(key)
            pts = get_polytope_samples(
                k_poly, raw_samples * q, bounds,
                inequality_constraints=inequality_constraints,
                equality_constraints=equality_constraints,
            )
            X_raw = pts.reshape(raw_samples, q, d)
            vals = jax.lax.map(acqf, X_raw)
            ics = initialize_q_batch(key, X_raw, vals, num_restarts)
        elif interpoint:
            # inter-point constraints couple the q-batch: sample uniform
            # q-batches and project them onto the joint feasible set (the
            # AL solve + Dykstra polish guarantees final feasibility)
            key, k_raw = jax.random.split(key)
            X_raw = bounds[0] + (bounds[1] - bounds[0]) * jax.random.uniform(
                k_raw, (raw_samples, q, d)
            )
            aff0 = (
                AffineSubspace.from_dense(
                    *_dense_rows_flat(equality_constraints, q, d)
                )
                if equality_constraints
                else None
            )
            if aff0 is not None:
                flat = X_raw.reshape(raw_samples, q * d)
                flat = project_box_affine_halfspaces(
                    flat, jnp.tile(bounds[0], q), jnp.tile(bounds[1], q),
                    affine=aff0, iters=30,
                )
                X_raw = flat.reshape(raw_samples, q, d)
            vals = jax.lax.map(acqf, X_raw)
            # feasibility-screen the Boltzmann selection (same policy as
            # the nonlinear-constraint branch): bias restarts away from
            # inter-point-infeasible raw batches the projection above
            # could not fix (it only handles the equality rows)
            viol = linear_violation(
                X_raw, inequality_constraints, equality_constraints
            )
            ics = initialize_q_batch(
                key, X_raw,
                vals - constraint_penalty * jnp.square(viol),
                num_restarts,
            )
        elif nonlinear_inequality_constraints:
            key, k_raw = jax.random.split(key)
            X_raw = bounds[0] + (bounds[1] - bounds[0]) * jax.random.uniform(
                k_raw, (raw_samples, q, d)
            )
            vals = jax.lax.map(acqf, X_raw)
            pen = jnp.zeros(raw_samples)
            for con in nonlinear_inequality_constraints:
                g, intra = con if isinstance(con, tuple) else (con, True)
                gv = (
                    jax.vmap(jax.vmap(g))(X_raw) if intra
                    else jax.vmap(g)(X_raw)[:, None]
                )
                pen = pen + jnp.sum(jnp.square(jnp.minimum(gv, 0.0)), -1)
            ics = initialize_q_batch(
                key, X_raw, vals - constraint_penalty * pen, num_restarts
            )
        else:
            ics = gen_batch_initial_conditions(
                acqf, bounds, q, num_restarts, raw_samples, key, seed=seed,
                sobol=sobol, sobol_skip=sobol_skip, X_best=X_best,
            )
    else:
        ics = initial_conditions
        num_restarts = ics.shape[0]

    constrained = bool(
        inequality_constraints
        or equality_constraints
        or nonlinear_inequality_constraints
    )
    neg_fun = lambda v: -acqf(v.reshape(q, d))
    lo = jnp.tile(bounds[0], q)
    hi = jnp.tile(bounds[1], q)
    if constrained:
        cands, vals = _optimize_constrained(
            acqf, neg_fun, ics, (lo, hi), q, d,
            maxiter=maxiter,
            inequality_constraints=inequality_constraints,
            equality_constraints=equality_constraints,
            nonlinear_inequality_constraints=nonlinear_inequality_constraints,
            shard_fn=shard_fn,
            timeout_sec=timeout_sec,
        )
    else:
        res = multi_start_lbfgsb(
            neg_fun,
            ics.reshape(num_restarts, q * d),
            bounds=(lo, hi),
            maxiter=maxiter,
            ls=ls,
            shard_fn=shard_fn,
            timeout_sec=timeout_sec,
        )
        vals = jnp.where(jnp.isfinite(res.fun), -res.fun, -jnp.inf)
        cands = res.x.reshape(num_restarts, q, d)
    if return_full:
        return cands, vals
    best = jnp.argmax(vals)
    if one_shot:
        return acqf.extract_candidates(cands[best]), vals[best]
    return cands[best], vals[best]


#: compiled AL-round programs keyed on static constraint config — see
#: `_get_al_round_fn`
_AL_ROUND_CACHE: dict = {}


def _linear_constraint_sig(constraints):
    if not constraints:
        return None
    sig = []
    for idx, coef, rhs in constraints:
        idx_np = np.asarray(idx)
        sig.append((
            idx_np.ndim,
            tuple(idx_np.ravel().tolist()),
            tuple(np.asarray(coef, np.float64).ravel().tolist()),
            float(rhs),
        ))
    return tuple(sig)


def _get_al_round_fn(
    acqf, q, d, inner,
    inequality_constraints=None,
    equality_constraints=None,
    nonlinear_inequality_constraints=None,
    shard_fn=None,
):
    """One jitted augmented-Lagrangian round, cached on static config.

    When the acquisition is a flax.struct pytree (the package convention)
    it is a jit ARGUMENT (re-keyed by treedef/shape), so host-driven
    loops that call `optimize_acqf` with the same constraint spec each
    iteration reuse the compiled program instead of retracing a fresh
    closure per call (and per rho value). Plain-callable acquisitions
    fall back to an uncached per-call closure (old behavior). Nonlinear
    constraint callables and `shard_fn` key by identity — a best-effort
    match that degrades to retrace-per-call when callers rebuild their
    lambdas."""
    from flax import struct as _struct

    def _body(a, x, lam, mu, rho, lo, hi):
        al_obj, _, _, cvals = make_al_objective(
            lambda v: -a(v.reshape(q, d)), q, d,
            inequality_constraints=inequality_constraints,
            equality_constraints=equality_constraints,
            nonlinear_inequality_constraints=nonlinear_inequality_constraints,
        )
        if shard_fn is not None:
            # restarts (and their multipliers) ride the restart mesh axis,
            # same as the unconstrained multi_start_lbfgsb path
            x, lam, mu = shard_fn(x), shard_fn(lam), shard_fn(mu)

        def solve_lane(x0, lam1, mu1):
            res = lbfgsb(
                lambda v: al_obj(v, lam1, mu1, rho), x0,
                bounds=(lo, hi), maxiter=inner,
            )
            return res.x

        x = jax.vmap(solve_lane)(x, lam, mu)
        h, c = jax.vmap(cvals)(x)
        lam = lam + rho * h
        mu = jnp.maximum(0.0, mu - rho * c)
        return x, lam, mu

    if not isinstance(acqf, _struct.PyTreeNode):
        jfn = jax.jit(
            lambda x, lam, mu, rho, lo, hi: _body(acqf, x, lam, mu, rho, lo, hi)
        )
        return lambda a, x, lam, mu, rho, lo, hi: jfn(x, lam, mu, rho, lo, hi)

    nl_sig = None
    if nonlinear_inequality_constraints:
        nl_sig = tuple(
            (id(con[0]), bool(con[1])) if isinstance(con, tuple)
            else (id(con), True)
            for con in nonlinear_inequality_constraints
        )
    key = (
        q, d, inner,
        _linear_constraint_sig(inequality_constraints),
        _linear_constraint_sig(equality_constraints),
        nl_sig,
        id(shard_fn) if shard_fn is not None else None,
    )
    fn = _AL_ROUND_CACHE.get(key)
    if fn is None:
        fn = jax.jit(_body)
        _AL_ROUND_CACHE[key] = fn
    return fn


def _optimize_constrained(
    acqf,
    neg_fun,
    ics: Array,
    box: tuple[Array, Array],
    q: int,
    d: int,
    maxiter: int,
    inequality_constraints=None,
    equality_constraints=None,
    nonlinear_inequality_constraints=None,
    al_rounds: int = 4,
    rho0: float = 10.0,
    rho_growth: float = 10.0,
    shard_fn=None,
    timeout_sec: Optional[float] = None,
):
    """Augmented-Lagrangian multi-start solve + feasibility polish.

    Replaces the round-2 fixed quadratic penalty (weight 1e3, no
    feasibility guarantee). Per-restart multiplier estimates ride the
    vmap lanes; `al_rounds` outer rounds split the `maxiter` budget.
    Returns `(cands (r, q, d), vals (r,))` with infeasible restarts'
    values set to -inf — unless NO restart is feasible, in which case the
    most-feasible candidate keeps its value (fallback-to-feasible
    semantics of reference `generation/gen.py:278-291`).
    """
    lo, hi = box
    num_restarts = ics.shape[0]
    # outer call only sizes the multiplier vectors; the jitted round
    # rebuilds the AL pieces from the traced acqf (see _get_al_round_fn)
    _, n_eq, n_ineq, _ = make_al_objective(
        neg_fun, q, d,
        inequality_constraints=inequality_constraints,
        equality_constraints=equality_constraints,
        nonlinear_inequality_constraints=nonlinear_inequality_constraints,
    )
    # affine geometry over the FLATTENED (q*d) joint vector: covers both
    # intra-point (expanded per candidate) and inter-point equality rows
    affine = (
        AffineSubspace.from_dense(
            *_dense_rows_flat(equality_constraints, q, d)
        )
        if equality_constraints
        else None
    )
    x = ics.reshape(num_restarts, q * d)
    lam = jnp.zeros((num_restarts, n_eq), jnp.float32)
    mu = jnp.zeros((num_restarts, n_ineq), jnp.float32)
    inner = max(maxiter // al_rounds, 10)

    # The jitted AL round is cached at module level keyed on the static
    # config, with the acqf pytree passed THROUGH jit — host-driven loops
    # calling optimize_acqf with constraints every iteration then reuse
    # the compiled program (jit re-keys on the acqf treedef/shapes)
    # instead of retracing a fresh closure per call.
    al_round_fn = _get_al_round_fn(
        acqf, q, d, inner,
        inequality_constraints=inequality_constraints,
        equality_constraints=equality_constraints,
        nonlinear_inequality_constraints=nonlinear_inequality_constraints,
        shard_fn=shard_fn,
    )

    def al_round(x, lam, mu, rho):
        return al_round_fn(acqf, x, lam, mu, rho, lo, hi)

    import time as _time

    t0 = _time.monotonic()
    rho = jnp.float32(rho0)
    for rnd in range(al_rounds):
        x, lam, mu = al_round(x, lam, mu, rho)
        rho = rho * rho_growth
        if timeout_sec is not None and rnd < al_rounds - 1:
            jax.block_until_ready(x)
            # best-effort wall-clock budget (reference
            # `minimize_with_timeout` semantics): stop multiplier rounds
            # on expiry; the feasibility polish below still runs so the
            # guarantee is preserved.
            if _time.monotonic() - t0 >= timeout_sec:
                break

    # ---- exact polish for the LINEAR feasible set (box ∩ affine ∩
    # halfspaces): Dykstra projection in the flattened (q*d) joint space,
    # which handles inter-point constraints coupling the q candidates ----
    if inequality_constraints or equality_constraints:
        A_ineq = b_ineq = None
        if inequality_constraints:
            A_np, b_np = _dense_rows_flat(inequality_constraints, q, d)
            A_ineq = jnp.asarray(A_np, jnp.float32)
            b_ineq = jnp.asarray(b_np, jnp.float32)
        x = project_box_affine_halfspaces(
            x, lo, hi, affine=affine, A_ineq=A_ineq, b_ineq=b_ineq,
        )
    cands = x.reshape(num_restarts, q, d)

    vals = jax.lax.map(acqf, cands)
    vals = jnp.where(jnp.isfinite(vals), vals, -jnp.inf)

    # ---- explicit feasibility check + fallback ----
    viol = linear_violation(
        cands, inequality_constraints, equality_constraints
    )
    if nonlinear_inequality_constraints:
        nl_vals = jax.vmap(
            lambda Xq: nonlinear_values(
                Xq, nonlinear_inequality_constraints
            )
        )(cands)
        viol = jnp.maximum(
            viol, jnp.max(jnp.maximum(-nl_vals, 0.0), axis=-1)
        )
    feasible = viol <= FEASIBILITY_TOL
    any_feasible = jnp.any(feasible)
    most_feasible = jnp.argmin(viol)
    keep = jnp.where(
        any_feasible, feasible, jnp.arange(num_restarts) == most_feasible
    )
    vals = jnp.where(keep, vals, -jnp.inf)
    return cands, vals


def optimize_acqf_discrete(
    acqf: Callable[[Array], Array],
    choices: Array,
    q: int = 1,
    max_batch_size: int = 2048,
):
    """Exhaustive evaluation over a discrete candidate set
    (reference `optim/optimize.py:990`): evaluates each choice as a q=1
    batch and returns the top-q choices greedily."""
    X = choices[:, None, :]  # (c, 1, d)
    vals = jax.lax.map(acqf, X, batch_size=min(max_batch_size, X.shape[0]))
    _, idx = jax.lax.top_k(vals, q)
    return choices[idx], vals[idx]


def gen_one_shot_kg_initial_conditions(
    acqf,
    bounds: Array,
    num_restarts: int,
    raw_samples: int,
    key: Optional[Array] = None,
    frac_random: float = 0.1,
    seed: int = 0,
) -> Array:
    """One-shot KG/HVKG initial conditions (reference
    `optim/initializers.py:441-560`).

    Standard q-batch ICs are generated for the AUGMENTED problem
    `q_aug = q + num_fantasies`; then, with probability `1 - frac_random`,
    each fantasy coordinate is replaced by a maximizer of the current
    posterior mean (the fantasy "solutions" should sit near where the
    value function peaks, which is what makes one-shot KG optimizable).

    Args:
        acqf: a one-shot acqf exposing `get_augmented_q_batch_size()`,
            `q`, and `model`.
        bounds: `(2, d)` box.
        frac_random: fraction of fantasy coordinates kept random.

    Returns:
        `(num_restarts, q_aug, d)` initial conditions.
    """
    if key is None:
        key = jax.random.PRNGKey(seed)
    q_aug = acqf.get_augmented_q_batch_size()
    q = acqf.q
    d = bounds.shape[-1]
    k_ic, k_pm, k_choice, k_bern = jax.random.split(key, 4)
    ics = gen_batch_initial_conditions(
        acqf, bounds, q_aug, num_restarts, raw_samples, key=k_ic, seed=seed
    )

    # maximizers of the posterior mean (value-function proxies)
    model = acqf.model

    def post_mean(Xq):  # (1, d) -> scalar
        return model.posterior(Xq).mean[..., 0, 0]

    maximizers, _ = optimize_acqf(
        post_mean,
        bounds,
        q=1,
        num_restarts=max(2, num_restarts // 2),
        raw_samples=raw_samples,
        key=k_pm,
        seed=seed + 1,
        return_full=True,
    )
    maximizers = maximizers[:, 0, :]  # (n_max, d)

    n_fant = q_aug - q
    pick = jax.random.randint(
        k_choice, (num_restarts, n_fant), 0, maximizers.shape[0]
    )
    repl = maximizers[pick]  # (num_restarts, n_fant, d)
    keep_random = (
        jax.random.uniform(k_bern, (num_restarts, n_fant, 1)) < frac_random
    )
    fant = jnp.where(keep_random, ics[:, q:, :], repl)
    return jnp.concatenate([ics[:, :q, :], fant], axis=-2)


def gen_value_function_initial_conditions(
    value_function,
    bounds: Array,
    num_restarts: int,
    raw_samples: int,
    current_model,
    key: Optional[Array] = None,
    frac_random: float = 0.6,
    num_inner_restarts: int = 20,
    raw_inner_samples: int = 1024,
    eta: float = 2.0,
    seed: int = 0,
) -> Array:
    """Smart initializations for optimizing a KG value function (reference
    `optim/initializers.py:758-893`).

    The maximizer of a fantasized posterior is usually near a maximizer of
    the CURRENT posterior, so a fraction `1 - frac_random` of the raw
    samples is drawn (softmax over values, temperature `eta`) from the
    restart-optimized maximizers of `current_model`'s posterior mean; the
    rest are Sobol. All raw samples are scored per fantasy branch by
    `value_function` and each branch picks its own `num_restarts` ICs via
    the Boltzmann heuristic.

    Args:
        value_function: callable `(*batch_shape, 1, d) -> (*batch_shape,)`
            evaluating each fantasy branch at its own point (a posterior
            mean of a fantasy-batched model broadcasts this way).
        current_model: the model the fantasies were generated from.

    Returns:
        `(num_restarts, *batch_shape, 1, d)` initial conditions.
    """
    if key is None:
        key = jax.random.PRNGKey(seed)
    k_inner, k_mult, k_sel = jax.random.split(key, 3)
    d = bounds.shape[-1]

    def post_mean(Xq):
        return current_model.posterior(Xq).mean[..., 0, 0]

    cands, vals = optimize_acqf(
        post_mean,
        bounds,
        q=1,
        num_restarts=num_inner_restarts,
        raw_samples=raw_inner_samples,
        key=k_inner,
        seed=seed + 1,
        return_full=True,
    )  # (ni, 1, d), (ni,)

    # fantasy batch shape, probed once (static under jit)
    batch_shape = tuple(value_function(cands[0]).shape)
    nf = 1
    for s in batch_shape:
        nf *= s

    n_value = int((1 - frac_random) * raw_samples)
    # Non-finite guard (same policy as `initialize_q_batch`): a diverged
    # inner restart maps to -inf in `optimize_acqf(return_full=True)` and
    # would otherwise poison the softmax with NaN.
    finite = jnp.isfinite(vals)
    mean = jnp.mean(vals, where=finite)
    mean = jnp.where(jnp.isfinite(mean), mean, 0.0)
    std = jnp.std(vals, where=finite)
    std = jnp.where((std > 0) & jnp.isfinite(std), std, 1.0)
    z = jnp.where(finite, (vals - mean) / std, -jnp.inf)
    w = jnp.exp(eta * z)  # exp(-inf) = 0: diverged restarts never sampled
    w = jnp.where(jnp.any(finite), w, jnp.ones_like(w))  # all-diverged: uniform
    idx = jax.random.choice(
        k_mult, cands.shape[0], (n_value, nf), replace=True, p=w / jnp.sum(w)
    )
    resampled = cands[idx]  # (n_value, nf, 1, d)
    n_rand = raw_samples - n_value
    randomized = draw_sobol_samples(bounds, n_rand * nf, 1, seed=seed + 2)
    randomized = randomized.reshape(n_rand, nf, 1, d)
    X_rnd = jnp.concatenate([resampled, randomized], axis=0)  # (raw, nf, 1, d)

    Y_rnd = jax.lax.map(
        value_function, X_rnd.reshape(raw_samples, *batch_shape, 1, d)
    ).reshape(raw_samples, nf)

    keys = jax.random.split(k_sel, nf)
    ics = jax.vmap(
        lambda kk, X, Y: initialize_q_batch(kk, X, Y, num_restarts, eta=eta)
    )(keys, jnp.swapaxes(X_rnd, 0, 1), Y_rnd.T)  # (nf, num_restarts, 1, d)
    return jnp.swapaxes(ics, 0, 1).reshape(num_restarts, *batch_shape, 1, d)


def initialize_q_batch_nonneg(
    key: Array,
    X: Array,
    acq_vals: Array,
    n: int,
    eta: float = 1.0,
    alpha: float = 1e-4,
) -> Array:
    """Boltzmann IC selection for NONNEGATIVE acquisition values
    (reference `initializers.py:968-1037`): candidates whose value is below
    `alpha * max` are excluded from sampling (the reference lowers alpha
    until enough remain; here the Gumbel-top-k over the restricted set
    plays that role, falling back to the unrestricted rule if fewer than
    `n` candidates qualify)."""
    vals = jnp.where(jnp.isfinite(acq_vals), acq_vals, -jnp.inf)
    vmax = jnp.max(vals)
    ok = vals > alpha * vmax
    enough = jnp.sum(ok) >= n
    gated = jnp.where(ok | ~enough, vals, -jnp.inf)
    return initialize_q_batch(key, X, gated, n, eta=eta)


def get_best_candidates(batch_candidates: Array, batch_values: Array) -> Array:
    """Select the best restart's candidates (reference
    `generation/gen.py:427`); non-finite values are excluded."""
    vals = jnp.where(jnp.isfinite(batch_values), batch_values, -jnp.inf)
    return batch_candidates[jnp.argmax(vals)]


def gen_one_shot_hvkg_initial_conditions(
    acqf,
    bounds: Array,
    num_restarts: int,
    raw_samples: int,
    key: Optional[Array] = None,
    frac_random: float = 0.1,
    seed: int = 0,
    num_inner_restarts: int = 4,
) -> Array:
    """One-shot HVKG initial conditions (reference
    `optim/initializers.py:560` `gen_one_shot_hvkg_initial_conditions`):
    for `1 - frac_random` of the restarts, the fantasy solution-set
    coordinates are seeded with hypervolume-maximizing sets of the CURRENT
    posterior mean (each obtained from a different optimizer restart),
    since those are close to the fantasy-optimal sets. The remaining
    restarts (and all `q` candidate blocks) use the standard heuristic.
    """
    if not 0.0 < frac_random < 1.0:
        raise ValueError("frac_random must be in (0, 1)")
    if key is None:
        key = jax.random.PRNGKey(seed)
    q, nf, qi = acqf.q, acqf.num_fantasies, acqf.q_inner
    q_aug = acqf.get_augmented_q_batch_size()
    d = bounds.shape[-1]
    k_ic, k_hv, k_pick = jax.random.split(key, 3)
    ics = gen_batch_initial_conditions(
        acqf, bounds, q_aug, num_restarts, raw_samples, key=k_ic, seed=seed
    )

    model = acqf.model
    ref_point = acqf.ref_point
    from botorch_tpu.utils.box_decomposition_jax import hypervolume_cells
    from botorch_tpu.utils.multi_objective import hypervolume_2d

    hv_fn = hypervolume_2d if ref_point.shape[-1] == 2 else hypervolume_cells

    def hv_value(X_sol: Array) -> Array:  # (qi, d) -> scalar
        mu = model.posterior(X_sol).mean  # (qi, m)
        if acqf.project is not None:
            mu = model.posterior(acqf.project(X_sol)).mean
        return hv_fn(mu, ref_point)

    sol_sets, _ = optimize_acqf(
        hv_value,
        bounds,
        q=qi,
        num_restarts=num_inner_restarts,
        raw_samples=raw_samples,
        key=k_hv,
        seed=seed + 1,
        return_full=True,
    )  # (num_inner_restarts, qi, d)

    n_opt = int(round(num_restarts * (1.0 - frac_random)))
    if n_opt == 0:
        return ics
    pick = jax.random.randint(k_pick, (n_opt, nf), 0, sol_sets.shape[0])
    repl = sol_sets[pick].reshape(n_opt, nf * qi, d)
    return ics.at[:n_opt, q:, :].set(repl)


def warmstart_multistep(
    acqf,
    bounds: Array,
    num_restarts: int,
    raw_samples: int,
    full_optimizer: Array,
    key: Optional[Array] = None,
    seed: int = 0,
) -> Array:
    """Warm-start ICs for multi-step lookahead (reference
    `acquisition/multi_step_lookahead.py:595` `warmstart_multistep`):
    perturb the previous iteration's full optimizer tree with
    Beta(1, 3)-mixed noise whose weight increases down the tree
    (deeper stages are perturbed more), mix whole trees toward uniform
    with increasing alpha across raw samples, score, and Boltzmann-select
    `num_restarts` trees.

    `full_optimizer`: `(B, q_aug, d)` trees from the previous round
    (`optimize_acqf(..., return_full=True)` candidates).
    """
    import math as _math

    if key is None:
        key = jax.random.PRNGKey(seed)
    B, q_aug, d = full_optimizer.shape
    batch_sizes = list(acqf.batch_sizes)
    num_fantasies = list(acqf.num_fantasies)
    sizes, branches = [], 1
    for k_stage, qk in enumerate(batch_sizes):
        sizes.append(branches * qk)
        if k_stage < len(num_fantasies):
            branches *= num_fantasies[k_stage]
    assert sum(sizes) == q_aug

    n_repeat = _math.ceil(raw_samples / B)
    alphas = jnp.linspace(0.0, 0.75, n_repeat)
    etas = jnp.linspace(0.1, 1.0, len(sizes))

    k_beta, k_unif, k_sel = jax.random.split(key, 3)
    # Beta(1,3) layer perturbations, stronger for deeper stages
    pert = bounds[0] + (bounds[1] - bounds[0]) * jax.random.beta(
        k_beta, 1.0, 3.0, (B, q_aug, d)
    )
    eta_per_row = jnp.concatenate(
        [jnp.full((s,), etas[i]) for i, s in enumerate(sizes)]
    )[:, None]
    X_layer = (1.0 - eta_per_row) * full_optimizer + eta_per_row * pert

    # whole-tree mixing toward uniform with increasing alpha
    unif = bounds[0] + (bounds[1] - bounds[0]) * jax.random.uniform(
        k_unif, (n_repeat, B, q_aug, d)
    )
    X_raw = (
        (1.0 - alphas[:, None, None, None]) * X_layer + alphas[:, None, None, None] * unif
    ).reshape(n_repeat * B, q_aug, d)

    vals = jax.lax.map(acqf, X_raw)
    return initialize_q_batch(k_sel, X_raw, vals, num_restarts)
