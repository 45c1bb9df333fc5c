r"""Fully-Bayesian SAAS GP (SAASBO) with native NUTS inference.

Counterpart of `botorch/models/fully_bayesian.py` (`SaasPyroModel :148`,
`SaasFullyBayesianSingleTaskGP :315`) + `botorch/fit.py:335`
(`fit_fully_bayesian_model_nuts`). The SAAS prior ("sparse axis-aligned
subspaces", [Eriksson2021saasbo]) puts a global HalfCauchy(0.1) shrinkage
`tausq` times per-dim HalfCauchy(1) on the *inverse squared* lengthscales,
so most dimensions are effectively turned off unless the data demand them.

Priors (reference `fully_bayesian.py:168-247`):
  * outputscale ~ Gamma(2.0, 0.15)
  * mean        ~ Normal(0, 1)
  * noise       ~ MIN_NOISE + Gamma(0.9, 10)   (inferred-noise case)
  * tausq       ~ HalfCauchy(0.1)
  * ilsq_d      ~ HalfCauchy(1);  lengthscale_d = (tausq * ilsq_d)^(-1/2)
  * K = outputscale * Matern52(X / ls) + noise * I;  Y | K ~ MVN(mean, K)

Inference is the native vectorized NUTS (`sampling/nuts.py`) over the
unconstrained vector `z = [mean, log outputscale, log noise_g, log tausq,
log ilsq_1..d]` with exact log-|Jacobian| terms, run as many parallel
chains (the reference runs ONE sequential pyro chain, `fit.py:374-380`).
Thinned draws are loaded into a batched `SingleTaskGP` whose leading
ensemble axis is the MCMC dimension (`MCMC_DIM`, reference
`posteriors/fully_bayesian.py:82`); acquisition functions reduce over it
with mean / logmeanexp (reference `utils/transforms.py:292-296`).
"""

from __future__ import annotations

import functools
import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from botorch_tpu.models import priors as priors_mod
from botorch_tpu.models.gp import GPParams, SingleTaskGP, make_gp
from botorch_tpu.ops.chol import add_jitter
from botorch_tpu.ops.kernels import matern52
from botorch_tpu.ops.pallas_linalg import mvn_quad_logdet
from botorch_tpu.sampling.nuts import run_nuts

Array = jax.Array

_log_2pi = math.log(2.0 * math.pi)
MIN_NOISE = priors_mod.MIN_INFERRED_NOISE_LEVEL  # 1e-4


def _unpack(z: Array, d: int, infer_noise: bool):
    """z -> (mean, outputscale, noise, lengthscale, log_jacobian)."""
    mean = z[0]
    outputscale = jnp.exp(z[1])
    idx = 2
    if infer_noise:
        noise_g = jnp.exp(z[idx])
        noise = MIN_NOISE + noise_g
        idx += 1
    else:
        noise_g = None
        noise = None
    tausq = jnp.exp(z[idx])
    ilsq = jnp.exp(z[idx + 1 : idx + 1 + d])
    lengthscale = jax.lax.rsqrt(tausq * ilsq)
    # log|J| of x = exp(z): every coordinate after the mean is
    # log-transformed, so the Jacobian term is simply sum(z[1:]).
    log_jac = jnp.sum(z[1:])
    return mean, outputscale, noise, noise_g, tausq, ilsq, lengthscale, log_jac


def make_saas_potential(
    X: Array, Y_std: Array, Yvar_std: Optional[Array] = None,
    mask: Optional[Array] = None,
):
    """Negative log joint density of the SAAS model over unconstrained z.

    `Y_std`: (n,) standardized targets. `mask` enables PADDED buffers
    (identity-decoupled kernel rows, the `SingleTaskGP.mask` trick) so the
    NUTS program compiles once for a fixed capacity even as the BO history
    grows. Returns `(potential, z_dim, infer_noise)`.
    """
    n, d = X.shape
    infer_noise = Yvar_std is None
    z_dim = (2 + (1 if infer_noise else 0)) + 1 + d

    hc_tau = priors_mod.HalfCauchy(0.1)
    hc_ilsq = priors_mod.HalfCauchy(1.0)
    g_os = priors_mod.Gamma(2.0, 0.15)
    g_noise = priors_mod.Gamma(0.9, 10.0)
    n_mean = priors_mod.Normal(0.0, 1.0)
    if mask is not None:
        mvec = mask.astype(X.dtype)
        pair = mvec[:, None] * mvec[None, :]
        n_valid = jnp.sum(mvec)
    else:
        mvec = None
        n_valid = n

    def potential(z: Array) -> Array:
        (mean, outputscale, noise, noise_g, tausq, ilsq, lengthscale,
         log_jac) = _unpack(z, d, infer_noise)
        lp = n_mean.log_prob(mean) + g_os.log_prob(outputscale)
        lp = lp + hc_tau.log_prob(tausq) + jnp.sum(hc_ilsq.log_prob(ilsq))
        if infer_noise:
            lp = lp + g_noise.log_prob(noise_g)
            noise_diag = noise
        else:
            noise_diag = jnp.mean(Yvar_std)
        K = outputscale * matern52(X, X, lengthscale)
        K = K + noise_diag * jnp.eye(n, dtype=K.dtype)
        resid = Y_std - mean
        if mvec is not None:
            K = K * pair + (1.0 - pair) * jnp.eye(n, dtype=K.dtype)
            resid = resid * mvec
        # One fused Pallas factor+solve+logdet on TPU (chains batched on
        # the lane axis via the op's vmap rule) — the leapfrog hot path.
        quad, ld = mvn_quad_logdet(add_jitter(K), resid)
        loglik = -0.5 * (quad + ld + n_valid * _log_2pi)
        return -(loglik + lp + log_jac)

    return potential, z_dim, infer_noise


def init_saas_chains(key: Array, chains: int, d: int, infer_noise: bool) -> Array:
    """Initialize chains near the prior medians with jitter (moderate
    starting lengthscales; mirrors pyro's init-to-sample behavior but
    avoids the extreme HalfCauchy tails)."""
    k = (2 + (1 if infer_noise else 0)) + 1 + d
    keys = jax.random.split(key, 4)
    z = 0.5 * jax.random.normal(keys[0], (chains, k))
    # mean ~ 0, log outputscale ~ log(1), log noise_g ~ log(0.01),
    # log tausq ~ log(0.1), log ilsq ~ log(1/d)  => ls ~ sqrt(d / 0.1)
    base = [0.0, 0.0]
    if infer_noise:
        base.append(math.log(0.01))
    base.append(math.log(0.1))
    base.extend([0.0] * d)
    return z + jnp.asarray(base)


def fit_saas_gp(
    train_X: Array,
    train_Y: Array,
    key: Array,
    train_Yvar: Optional[Array] = None,
    num_warmup: int = 512,
    num_samples: int = 256,
    thinning: int = 16,
    num_chains: int = 4,
    max_depth: int = 6,
    mask: Optional[Array] = None,
) -> tuple[SingleTaskGP, dict]:
    """SAASBO model fit: NUTS over the SAAS posterior, thinned draws loaded
    into an ensemble `SingleTaskGP` (reference `fit.py:335-391` +
    `fully_bayesian.py:267-312`).

    Default budgets match the reference (512/256/16, depth 6), but the
    kept-sample count is `num_samples * num_chains / thinning` because
    chains are free here. Returns `(ensemble_model, nuts_stats)`.
    """
    if train_Y.ndim == 1:
        train_Y = train_Y[:, None]
    base = make_gp(train_X, train_Y, train_Yvar=train_Yvar,
                   kernel="matern52", use_outputscale=True, mask=mask)
    Y_std = base.Y[:, 0]
    Yvar_std = None if base.Yvar is None else base.Yvar[:, 0]
    infer_noise = Yvar_std is None

    k_init, k_run = jax.random.split(key)
    z0 = init_saas_chains(k_init, num_chains, base.dim, infer_noise)
    per_chain = max(num_samples // num_chains, thinning)

    runner = _saas_runner(
        base.num_train, base.dim, infer_noise, mask is not None,
        num_warmup, per_chain, max_depth,
    )
    mask_arg = (
        jnp.ones((base.num_train,), bool) if mask is None else mask
    )
    yvar_arg = (
        jnp.zeros((base.num_train,)) if Yvar_std is None else Yvar_std
    )
    samples, stats = runner(base.X, Y_std, yvar_arg, mask_arg, z0, k_run)
    z_dim = samples.shape[-1]
    samples = samples[:, ::thinning].reshape(-1, z_dim)  # (S, z_dim)
    model = load_saas_samples(samples, base)
    return model, stats


@functools.lru_cache(maxsize=32)
def _saas_runner(n, d, infer_noise, masked, num_warmup, per_chain, max_depth):
    """Compile-once NUTS runner for a given (shape, budget) configuration:
    train data / mask / chain inits are TRACED arguments, so a padded BO
    loop reuses one compiled program for every iteration."""

    @jax.jit
    def run(X, Y_std, Yvar_std, mask, z0, key):
        potential, _, _ = make_saas_potential(
            X, Y_std,
            None if infer_noise else Yvar_std,
            mask=mask if masked else None,
        )
        return run_nuts(
            potential, z0, key,
            num_warmup=num_warmup, num_samples=per_chain,
            max_depth=max_depth,
        )

    return run


def load_saas_samples(z_samples: Array, base: SingleTaskGP) -> SingleTaskGP:
    """Load unconstrained NUTS draws into a batched ensemble model
    (reference `load_mcmc_samples`, `fully_bayesian.py:267-312`)."""
    d = base.dim
    infer_noise = base.infer_noise

    def one(z):
        (mean, outputscale, noise, _, _, _, lengthscale, _) = _unpack(
            z, d, infer_noise
        )
        return GPParams(
            mean=jnp.asarray([mean]),
            raw_lengthscale=jnp.log(lengthscale)[None, :],
            raw_outputscale=jnp.log(outputscale)[None],
            raw_noise=(
                jnp.log(jnp.maximum(noise, MIN_NOISE))[None]
                if infer_noise
                else base.params.raw_noise
            ),
        )

    params = jax.vmap(one)(z_samples)  # leading (S, m=1, ...)
    return base.replace(params=params, _is_fully_bayesian=True, _cache=None)


def median_lengthscales(model: SingleTaskGP) -> Array:
    """Posterior-median ARD lengthscales (SAASBO diagnostics;
    reference `SaasFullyBayesianSingleTaskGP.median_lengthscale :366`)."""
    return jnp.median(model.params.lengthscale[:, 0, :], axis=0)
