r"""Batched bound-constrained L-BFGS, pure JAX (jit / vmap / shard-ready).

This is the TPU-native replacement for *both* scipy call sites of the
reference (SURVEY §2.9): model fitting (`botorch/optim/core.py:55` →
Fortran L-BFGS-B, one problem at a time on CPU) and acquisition
multi-start optimization (`botorch/generation/gen.py:46` → one *flattened*
problem per restart chunk). Here every restart / refit attempt is an
independent lane of a single `vmap`-ed solver: fixed-size two-loop history,
projected-path Armijo backtracking for box constraints, per-lane
convergence masks inside one `lax.while_loop`. Lanes that converge early
are frozen by masking, so the compiled program has fully static shapes and
the restart axis can additionally be sharded over a device mesh.

Algorithm notes:
  * Two-loop recursion with an `m`-slot ring buffer; curvature pairs with
    `s.y <= eps * |s||y|` are skipped (standard damping-free safeguard).
  * Box constraints via projection of the trial point onto `[lo, hi]` along
    the backtracking path (projected-gradient L-BFGS). Convergence is
    measured by the projected gradient `x - clip(x - g, lo, hi)`, matching
    L-BFGS-B's optimality measure.
  * The objective must be a pure, vmappable `f(x) -> scalar`; gradients via
    `jax.value_and_grad`.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

Array = jax.Array


class LBFGSState(NamedTuple):
    x: Array  # (k,) current iterate
    f: Array  # () current value
    g: Array  # (k,) current gradient
    S: Array  # (m, k) s-history ring
    Y: Array  # (m, k) y-history ring
    rho: Array  # (m,) 1/(s.y) history ring (0 = invalid slot)
    head: Array  # () int32: next ring slot to write
    n_iter: Array  # () int32
    n_fev: Array  # () int32: objective evaluations (incl. line-search trials)
    t_prev: Array  # () last accepted line-search step (warm start)
    stall: Array  # () int32: consecutive iterations without material descent
    converged: Array  # () bool
    failed: Array  # () bool (line search failed to make progress)


class LBFGSResult(NamedTuple):
    x: Array
    fun: Array
    grad: Array
    n_iter: Array
    n_fev: Array
    converged: Array


def _two_loop(g: Array, S: Array, Y: Array, rho: Array, head: Array) -> Array:
    """Two-loop recursion for the search direction `-H g` over the ring
    buffer. Invalid slots carry `rho = 0` and become no-ops."""
    m = S.shape[0]

    def bwd(i, carry):
        q, alpha = carry
        slot = (head - 1 - i) % m
        a = rho[slot] * jnp.dot(S[slot], q)
        q = q - a * Y[slot]
        return q, alpha.at[slot].set(a)

    q, alpha = jax.lax.fori_loop(0, m, bwd, (g, jnp.zeros((m,), g.dtype)))

    # Initial Hessian scaling: newest valid pair's Barzilai-Borwein value,
    # or 1/|g| before any history exists (avoids huge first trial steps).
    newest = (head - 1) % m
    sy = jnp.dot(S[newest], Y[newest])
    yy = jnp.dot(Y[newest], Y[newest])
    gamma0 = 1.0 / jnp.maximum(jnp.linalg.norm(g), 1.0)
    gamma = jnp.where(
        (rho[newest] > 0) & (yy > 0), sy / jnp.maximum(yy, 1e-30), gamma0
    )
    r = gamma * q

    def fwd(i, r):
        slot = (head + i) % m
        b = rho[slot] * jnp.dot(Y[slot], r)
        return r + S[slot] * (alpha[slot] - b)

    r = jax.lax.fori_loop(0, m, fwd, r)
    return -r


def _resolve_bounds(bounds, k, dtype):
    if bounds is None:
        lo = jnp.full((k,), -jnp.inf, dtype)
        hi = jnp.full((k,), jnp.inf, dtype)
    else:
        lo = jnp.broadcast_to(jnp.asarray(bounds[0], dtype), (k,))
        hi = jnp.broadcast_to(jnp.asarray(bounds[1], dtype), (k,))
    return lo, hi


def lbfgs_init(
    fun: Callable[[Array], Array],
    x0: Array,
    bounds: Optional[tuple[Array, Array]] = None,
    history: int = 10,
    tol: float = 1e-5,
) -> LBFGSState:
    """Build the initial solver state for `lbfgs_run` (projected start,
    first value/gradient, empty history ring)."""
    k = x0.shape[-1]
    dtype = x0.dtype
    lo, hi = _resolve_bounds(bounds, k, dtype)
    project = lambda x: jnp.clip(x, lo, hi)
    x0 = project(x0)
    f0, g0 = jax.value_and_grad(fun)(x0)
    pgn = jnp.max(jnp.abs(x0 - project(x0 - g0)))
    return LBFGSState(
        x=x0,
        f=f0,
        g=g0,
        S=jnp.zeros((history, k), dtype),
        Y=jnp.zeros((history, k), dtype),
        rho=jnp.zeros((history,), dtype),
        head=jnp.int32(0),
        n_iter=jnp.int32(0),
        n_fev=jnp.int32(1),
        t_prev=jnp.asarray(1.0, dtype),
        stall=jnp.int32(0),
        converged=pgn <= tol,
        failed=jnp.bool_(False),
    )


def lbfgs_run(
    fun: Callable[[Array], Array],
    init: LBFGSState,
    bounds: Optional[tuple[Array, Array]] = None,
    iter_limit: Array | int = 100,
    tol: float = 1e-5,
    ftol: float = 0.0,
    max_ls: int = 25,
    ls: str = "halving",
) -> LBFGSState:
    """Advance the solver from `init` until convergence/failure or until
    the TOTAL iteration count reaches `iter_limit` (a dynamic value — the
    same compiled program serves every chunk of a wall-clock-budgeted
    host loop, the `minimize_with_timeout` counterpart,
    `botorch/optim/utils/timeout.py:19`)."""
    k = init.x.shape[-1]
    dtype = init.x.dtype
    history = init.S.shape[0]
    lo, hi = _resolve_bounds(bounds, k, dtype)
    iter_limit = jnp.asarray(iter_limit, jnp.int32)

    vg = jax.value_and_grad(fun)
    project = lambda x: jnp.clip(x, lo, hi)

    def proj_grad_norm(x, g):
        return jnp.max(jnp.abs(x - project(x - g)))

    # Material-descent floor: decreases below numerical noise count as stalls.
    noise_floor = 4.0 * jnp.finfo(dtype).eps

    def cond(st: LBFGSState):
        return (~(st.converged | st.failed)) & (st.n_iter < iter_limit)

    def body(st: LBFGSState):
        d = _two_loop(st.g, st.S, st.Y, st.rho, st.head)
        # Fall back to steepest descent if d is not a descent direction.
        dg = jnp.dot(d, st.g)
        bad = (dg >= 0) | ~jnp.all(jnp.isfinite(d))
        d = jnp.where(bad, -st.g, d)
        dg = jnp.where(bad, -jnp.dot(st.g, st.g), dg)

        # Projected backtracking Armijo line search (value-only trials).
        # Two modes (measured head-to-head on chip, BASELINE.md §Round-5):
        #   * "halving" (default; acquisition optimization): finite failed
        #     trials halve as in classic backtracking — accepting the
        #     LARGEST step on the ladder matters on multi-modal acquisition
        #     surfaces (quadratic interpolation's conservative steps cost
        #     2x regret on the d=8 SAASBO ensemble-LogEI landscape);
        #     non-finite trials cut 0.1x (those are rejected either way, so
        #     skipping ladder rungs there is quality-neutral).
        #   * "interp" (model fitting): quadratic interpolation through
        #     f(0), f'(0) and the failed trial, plus warm-starting the
        #     first trial from the last accepted step (scipy L-BFGS-B's
        #     Wolfe search keeps the same kind of step memory). On the
        #     smooth MLL surface this matches halving's fits while cutting
        #     line-search evals ~2x (n=10240 MAP fit: 14.5 -> 10.0 s),
        #     where each wasted trial is a full O(n^3) Cholesky.
        c1 = 1e-4

        def ls_cond(carry):
            t, f_new, x_new, it = carry
            armijo = f_new <= st.f + c1 * jnp.dot(st.g, x_new - st.x)
            return (~armijo) & (it < max_ls)

        def ls_body(carry):
            t, f_t, _, it = carry
            if ls == "interp":
                denom = f_t - st.f - t * dg
                t_q = -0.5 * dg * t * t / jnp.maximum(denom, 1e-30)
                t = jnp.where(
                    jnp.isfinite(f_t) & (denom > 0),
                    jnp.clip(t_q, 0.1 * t, 0.5 * t),
                    0.1 * t,
                )
            else:
                t = jnp.where(jnp.isfinite(f_t), 0.5 * t, 0.1 * t)
            x_new = project(st.x + t * d)
            return t, fun(x_new), x_new, it + 1

        if ls == "interp":
            t0 = jnp.minimum(jnp.asarray(1.0, dtype), 4.0 * st.t_prev)
        else:
            t0 = jnp.asarray(1.0, dtype)
        x_try = project(st.x + t0 * d)
        t, f_new, x_new, ls_iters = jax.lax.while_loop(
            ls_cond, ls_body, (t0, fun(x_try), x_try, jnp.int32(0))
        )
        armijo_ok = f_new <= st.f + c1 * jnp.dot(st.g, x_new - st.x)
        # Non-finite objective or failed search => lane is done (keep x).
        progressed = armijo_ok & jnp.isfinite(f_new)

        f_acc, g_acc = vg(x_new)

        s = x_new - st.x
        y = g_acc - st.g
        sy = jnp.dot(s, y)
        good_pair = progressed & (
            sy > 1e-10 * jnp.linalg.norm(s) * jnp.linalg.norm(y)
        )
        slot = st.head % history
        S = jnp.where(good_pair, st.S.at[slot].set(s), st.S)
        Y = jnp.where(good_pair, st.Y.at[slot].set(y), st.Y)
        rho = jnp.where(good_pair, st.rho.at[slot].set(1.0 / jnp.maximum(sy, 1e-30)), st.rho)
        head = jnp.where(good_pair, (st.head + 1) % history, st.head)

        x1 = jnp.where(progressed, x_new, st.x)
        f1 = jnp.where(progressed, f_acc, st.f)
        g1 = jnp.where(progressed, g_acc, st.g)

        fscale = jnp.maximum(jnp.maximum(jnp.abs(st.f), jnp.abs(f1)), 1.0)
        decrease = st.f - f1
        material = decrease > jnp.maximum(ftol, noise_floor) * fscale
        stall = jnp.where(material, jnp.int32(0), st.stall + 1)
        converged = (proj_grad_norm(x1, g1) <= tol) | (stall >= 3)
        new = LBFGSState(
            x=x1, f=f1, g=g1, S=S, Y=Y, rho=rho, head=head,
            n_iter=st.n_iter + 1,
            # 1 initial trial + backtracks (value-only) + 1 value_and_grad
            n_fev=st.n_fev + 2 + ls_iters,
            t_prev=jnp.where(progressed, t, st.t_prev),
            stall=stall,
            converged=converged,
            failed=~progressed,
        )
        # Frozen lanes (vmap masking): once done, state must not change.
        done = st.converged | st.failed
        return jax.tree_util.tree_map(
            lambda old, upd: jnp.where(done, old, upd), st, new
        )

    return jax.lax.while_loop(cond, body, init)


@partial(jax.jit, static_argnums=(0, 3, 4, 7, 8))
def lbfgsb(
    fun: Callable[[Array], Array],
    x0: Array,
    bounds: Optional[tuple[Array, Array]] = None,
    maxiter: int = 100,
    history: int = 10,
    tol: float = 1e-5,
    ftol: float = 0.0,
    max_ls: int = 25,
    ls: str = "halving",
) -> LBFGSResult:
    """Minimize `fun` from `x0 (k,)` subject to `lo <= x <= hi`.

    Batch over restarts with `jax.vmap(lambda x0: lbfgsb(fun, x0, ...))`;
    under vmap the while-loop runs until every lane is done, with finished
    lanes masked to no-ops. `ls` picks the line-search mode: "halving"
    (default; multi-modal acquisition surfaces) or "interp" (smooth model
    fits — see `lbfgs_run`).
    """
    st = lbfgs_init(fun, x0, bounds=bounds, history=history, tol=tol)
    final = lbfgs_run(
        fun, st, bounds=bounds, iter_limit=maxiter, tol=tol, ftol=ftol,
        max_ls=max_ls, ls=ls,
    )
    return LBFGSResult(
        x=final.x,
        fun=final.f,
        grad=final.g,
        n_iter=final.n_iter,
        n_fev=final.n_fev,
        converged=final.converged,
    )


def multi_start_lbfgsb(
    fun: Callable[[Array], Array],
    x0_batch: Array,
    bounds: Optional[tuple[Array, Array]] = None,
    maxiter: int = 100,
    history: int = 10,
    tol: float = 1e-5,
    max_ls: int = 25,
    ls: str = "halving",
    shard_fn: Optional[Callable[[Array], Array]] = None,
    timeout_sec: Optional[float] = None,
    timeout_chunk: int = 20,
) -> LBFGSResult:
    """Run `lbfgsb` from a batch of starts `x0_batch: (r, k)` in lockstep.

    This is the restart axis of `optimize_acqf` (reference
    `optim/optimize.py:268-305` chunks restarts for scipy; here they run as
    one compiled program). `shard_fn` (from
    `parallel.sharding.leading_axis_sharder`) shards the restart axis over
    a device mesh; each lane's solve is then fully local and the final
    argmax is the only collective.

    With `timeout_sec`, iterations run in compiled chunks of
    `timeout_chunk` with a wall-clock check between chunks; on expiry the
    best-so-far state of every lane is returned (the reference's
    `minimize_with_timeout` semantics, `optim/utils/timeout.py:19` —
    device-batch style: one deadline shared by all lanes).
    """
    if shard_fn is not None:
        x0_batch = shard_fn(x0_batch)
    if timeout_sec is None:
        solver = lambda x0: lbfgsb(
            fun, x0, bounds=bounds, maxiter=maxiter, history=history,
            tol=tol, max_ls=max_ls, ls=ls,
        )
        return jax.vmap(solver)(x0_batch)

    import time

    t0 = time.monotonic()
    init_b = jax.jit(
        jax.vmap(
            lambda x0: lbfgs_init(fun, x0, bounds=bounds, history=history, tol=tol)
        )
    )
    run_b = jax.jit(
        jax.vmap(
            lambda st, lim: lbfgs_run(
                fun, st, bounds=bounds, iter_limit=lim, tol=tol,
                max_ls=max_ls, ls=ls,
            ),
            in_axes=(0, None),
        )
    )
    st = init_b(x0_batch)
    done = 0
    while done < maxiter:
        nxt = min(done + timeout_chunk, maxiter)
        st = run_b(st, jnp.int32(nxt))
        jax.block_until_ready(st.x)
        done = nxt
        if bool(jnp.all(st.converged | st.failed)):
            break
        if time.monotonic() - t0 >= timeout_sec:
            break
    return LBFGSResult(
        x=st.x, fun=st.f, grad=st.g, n_iter=st.n_iter, n_fev=st.n_fev,
        converged=st.converged,
    )
