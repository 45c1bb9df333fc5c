r"""Model fitting: batched multi-restart MAP estimation of GP hyperparameters.

Replaces the reference's `fit_gpytorch_mll` stack (`botorch/fit.py:75-259` →
`optim/core.py:55` → Fortran L-BFGS-B on CPU, with a sequential
retry-on-failure loop that re-samples hyperparameters from their priors).
The TPU-native design turns the retry loop into *parallel restarts*: one
start at the incumbent/default values plus `num_restarts - 1` prior samples
(the `sample_all_priors` semantics, `optim/utils/model_utils.py:153`), all
optimized in lockstep by the vmapped L-BFGS-B solver in one compiled
program, then the best final posterior density wins. Restarts can be
sharded over a device mesh (they sit on the leading axis).

Fixed (non-learnable) parameters are pinned by degenerate box bounds
`lo = hi = value`, which the projected solver respects exactly.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from botorch_tpu.models import priors as priors_mod
from botorch_tpu.models.gp import GPParams, SingleTaskGP
from botorch_tpu.ops.lbfgs import multi_start_lbfgsb

Array = jax.Array


def param_bounds(model: SingleTaskGP) -> tuple[GPParams, GPParams]:
    """Raw-space box constraints mirroring the reference's constraint
    transforms (`gpytorch_modules.py:29,117-126`): lengthscale >= 0.025,
    inferred noise >= 1e-4. Unused/fixed parameters are pinned."""
    p = model.params
    inf = jnp.inf
    kw = p.raw_kernel_weights
    lo = GPParams(
        mean=jnp.full_like(p.mean, -inf),
        raw_lengthscale=jnp.full_like(
            p.raw_lengthscale, math.log(priors_mod.MIN_LENGTHSCALE)
        ),
        raw_outputscale=(
            jnp.full_like(p.raw_outputscale, math.log(1e-8))
            if model.use_outputscale
            else p.raw_outputscale
        ),
        raw_noise=(
            jnp.full_like(p.raw_noise, math.log(priors_mod.MIN_INFERRED_NOISE_LEVEL))
            if model.infer_noise
            else p.raw_noise
        ),
        raw_kernel_weights=(
            None if kw is None else jnp.full_like(kw, math.log(1e-6))
        ),
    )
    hi = GPParams(
        mean=jnp.full_like(p.mean, inf),
        raw_lengthscale=jnp.full_like(p.raw_lengthscale, math.log(1e4)),
        raw_outputscale=(
            jnp.full_like(p.raw_outputscale, math.log(1e6))
            if model.use_outputscale
            else p.raw_outputscale
        ),
        raw_noise=(
            jnp.full_like(p.raw_noise, math.log(1e4))
            if model.infer_noise
            else p.raw_noise
        ),
        raw_kernel_weights=(
            None if kw is None else jnp.full_like(kw, math.log(1e4))
        ),
    )
    return lo, hi


def sample_params_from_priors(
    key: Array, model: SingleTaskGP, n: int
) -> GPParams:
    """Draw `n` hyperparameter pytrees from the priors (reference
    `sample_all_priors`, `optim/utils/model_utils.py:153`). Parameters
    without priors (the mean; fixed noise) stay at their current values."""
    p = model.params
    k_ls, k_noise, k_os = jax.random.split(key, 3)
    regime = getattr(model, "priors", "lognormal")
    ls_prior = priors_mod.lengthscale_prior(regime, model.dim)
    ls = ls_prior.sample(k_ls, (n, *p.raw_lengthscale.shape))
    if model.infer_noise:
        noise = priors_mod.noise_prior(regime).sample(
            k_noise, (n, *p.raw_noise.shape)
        )
        raw_noise = jnp.log(noise)
    else:
        raw_noise = jnp.broadcast_to(p.raw_noise, (n, *p.raw_noise.shape))
    if model.use_outputscale:
        os_ = priors_mod.gamma_outputscale_prior().sample(
            k_os, (n, *p.raw_outputscale.shape)
        )
        raw_os = jnp.log(os_)
    else:
        raw_os = jnp.broadcast_to(p.raw_outputscale, (n, *p.raw_outputscale.shape))
    if p.raw_kernel_weights is not None:
        k_w = jax.random.fold_in(k_os, 1)
        w_ = priors_mod.gamma_outputscale_prior().sample(
            k_w, (n, *p.raw_kernel_weights.shape)
        )
        raw_kw = jnp.log(jnp.clip(w_, 1e-6, 1e4))
    else:
        raw_kw = None
    return GPParams(
        mean=jnp.broadcast_to(p.mean, (n, *p.mean.shape)),
        raw_lengthscale=jnp.log(
            jnp.clip(ls, priors_mod.MIN_LENGTHSCALE, 1e4)
        ),
        raw_outputscale=raw_os,
        raw_noise=raw_noise,
        raw_kernel_weights=raw_kw,
    )


def _prepare_fit(model: SingleTaskGP, key: Array, num_restarts: int):
    """Shared setup for the MAP fit: flattened objective, restart starts
    (incumbent + prior samples), and raw-space box bounds."""
    flat0, unravel = ravel_pytree(model.params)
    dtype = flat0.dtype

    def obj(v: Array) -> Array:
        return model.map_objective(unravel(v))

    starts = [flat0]
    if num_restarts > 1:
        sampled = sample_params_from_priors(key, model, num_restarts - 1)
        for i in range(num_restarts - 1):
            p_i = jax.tree_util.tree_map(lambda a: a[i], sampled)
            starts.append(ravel_pytree(p_i)[0])
    x0 = jnp.stack(starts).astype(dtype)

    lo_t, hi_t = param_bounds(model)
    lo = ravel_pytree(lo_t)[0].astype(dtype)
    hi = ravel_pytree(hi_t)[0].astype(dtype)
    return obj, unravel, x0, lo, hi


@partial(jax.jit, static_argnames=("num_restarts", "maxiter", "shard_fn"))
def fit_gp(
    model: SingleTaskGP,
    key: Optional[Array] = None,
    num_restarts: int = 8,
    maxiter: int = 100,
    shard_fn=None,
) -> SingleTaskGP:
    """MAP-fit the GP hyperparameters; returns the fitted model.

    Restart 0 starts from the model's current parameters (default init =
    prior modes, matching the reference's first attempt); the rest start
    from prior samples. The restart with the best final MAP objective wins;
    non-finite results are excluded (the reference's retry/rollback policy,
    `fit.py:187-259`, collapses into this argmin).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    obj, unravel, x0, lo, hi = _prepare_fit(model, key, num_restarts)
    res = multi_start_lbfgsb(obj, x0, bounds=(lo, hi), maxiter=maxiter,
                             ls="interp", shard_fn=shard_fn)
    fun = jnp.where(jnp.isfinite(res.fun), res.fun, jnp.inf)
    best = jnp.argmin(fun)
    return model.replace(params=unravel(res.x[best]), _cache=None)


def fit_gp_with_timeout(
    model: SingleTaskGP,
    key: Optional[Array] = None,
    num_restarts: int = 8,
    maxiter: int = 200,
    timeout_sec: float = 10.0,
    timeout_chunk: int = 20,
    shard_fn=None,
) -> SingleTaskGP:
    """`fit_gp` under a wall-clock budget (reference
    `fit_gpytorch_mll(..., timeout_sec)` → `minimize_with_timeout`,
    `optim/utils/timeout.py:19`): L-BFGS runs in compiled chunks on
    device with a host-side deadline check between chunks; the
    best-so-far restart wins on expiry. Host-loop function — not
    jittable (the compiled chunks are cached across calls)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    obj, unravel, x0, lo, hi = _prepare_fit(model, key, num_restarts)
    res = multi_start_lbfgsb(
        obj, x0, bounds=(lo, hi), maxiter=maxiter, ls="interp",
        shard_fn=shard_fn, timeout_sec=timeout_sec, timeout_chunk=timeout_chunk,
    )
    fun = jnp.where(jnp.isfinite(res.fun), res.fun, jnp.inf)
    best = jnp.argmin(fun)
    return model.replace(params=unravel(res.x[best]), _cache=None)


def fit_transformed_gp(
    tmodel,
    key: Optional[Array] = None,
    num_restarts: int = 8,
    maxiter: int = 100,
    X_raw: Optional[Array] = None,
    raw_warp_bound: float = 4.0,
):
    """Jointly MAP-fit GP hyperparameters AND the learnable input-
    transform parameters of a `TransformedModel` (e.g. `Warp.raw_a/raw_b`
    with their LogNormal(0, 0.75) priors).

    Counterpart of the reference's joint optimization of `Warp`'s
    registered parameters inside `fit_gpytorch_mll`
    (`models/transforms/input.py:922-1008`: the Kumaraswamy
    concentrations are `nn.Parameter`s with priors, so the MLL closure
    optimizes them together with the kernel hyperparameters). Round 2
    had the Warp class but never optimized it; this closes that gap.

    Args:
        tmodel: `TransformedModel` whose `input_transform` is a learnable
            transform pytree exposing `transform(X)` and `log_prior()`
            (a `Warp`, or a chain whose leaves are such). The inner
            model's `X` must hold TRANSFORMED inputs (the
            `TransformedModel` convention).
        X_raw: the untransformed training inputs. Defaults to
            `input_transform.untransform(model.X)` (exact for Warp).
        raw_warp_bound: box bound on the transform's raw parameters
            (`exp(±4)` spans far beyond the prior's mass).

    Returns:
        A new `TransformedModel` with fitted GP params, fitted transform,
        and the inner model's train inputs re-warped accordingly.
    """
    from botorch_tpu.models.transforms import TransformedModel

    warp = tmodel.input_transform
    base = tmodel.model
    if warp is None:
        raise ValueError("tmodel has no input_transform to fit")
    if not hasattr(warp, "log_prior"):
        # A chained / partially-learnable transform would have its
        # NON-learnable array leaves (e.g. Normalize bounds) overwritten
        # by the restart initialization and clamped by the raw box —
        # silently corrupting the model. Refuse instead: fit the
        # learnable member (Warp) alone and compose afterwards.
        raise ValueError(
            "fit_transformed_gp requires a transform whose array leaves "
            "are all learnable parameters with a log_prior() (e.g. Warp);"
            f" got {type(warp).__name__}. For chains, fit the learnable "
            "member alone and recompose."
        )
    if X_raw is None:
        X_raw = warp.untransform(base.X)

    flat0, unravel = ravel_pytree((base.params, warp))
    dtype = flat0.dtype

    def obj(v: Array) -> Array:
        p, w = unravel(v)
        m = base.replace(X=w.transform(X_raw))
        return m.map_objective(p) - w.log_prior()

    starts = [flat0]
    if num_restarts > 1:
        k_p, k_w = jax.random.split(key if key is not None else jax.random.PRNGKey(0))
        sampled = sample_params_from_priors(k_p, base, num_restarts - 1)
        w_leaves, w_def = jax.tree_util.tree_flatten(warp)
        for i in range(num_restarts - 1):
            p_i = jax.tree_util.tree_map(lambda a: a[i], sampled)
            k_w, k_i = jax.random.split(k_w)
            leaves_i = [
                0.75 * jax.random.normal(jax.random.fold_in(k_i, j), l.shape)
                for j, l in enumerate(w_leaves)
            ]
            w_i = jax.tree_util.tree_unflatten(w_def, leaves_i)
            starts.append(ravel_pytree((p_i, w_i))[0])
    x0 = jnp.stack(starts).astype(dtype)

    lo_p, hi_p = param_bounds(base)
    lo_w = jax.tree_util.tree_map(lambda a: jnp.full_like(a, -raw_warp_bound), warp)
    hi_w = jax.tree_util.tree_map(lambda a: jnp.full_like(a, raw_warp_bound), warp)
    lo = ravel_pytree((lo_p, lo_w))[0].astype(dtype)
    hi = ravel_pytree((hi_p, hi_w))[0].astype(dtype)

    res = multi_start_lbfgsb(obj, x0, bounds=(lo, hi), maxiter=maxiter,
                             ls="interp")
    fun = jnp.where(jnp.isfinite(res.fun), res.fun, jnp.inf)
    best = jnp.argmin(fun)
    p_best, w_best = unravel(res.x[best])
    return TransformedModel(
        model=base.replace(params=p_best, X=w_best.transform(X_raw),
                           _cache=None),
        input_transform=w_best,
    )
