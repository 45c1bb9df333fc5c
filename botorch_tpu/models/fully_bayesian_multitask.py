r"""Fully-Bayesian multi-task SAAS GP.

Counterpart of `botorch/models/fully_bayesian_multitask.py:36,165`
(`MultitaskSaasPyroModel`, `SaasFullyBayesianMultiTaskGP`): the SAAS data
kernel times a Matern-5/2 task kernel over LEARNED task embeddings, all
hyperparameters inferred with the native NUTS sampler.

Priors (reference `fully_bayesian_multitask.py:73-126`):
  * data kernel: SAAS (tausq ~ HC(0.1), ilsq ~ HC(1))
  * outputscale ~ Gamma(2, 0.15), mean ~ N(0,1), noise ~ MIN + Gamma(0.9, 10)
  * task embeddings ~ N(0, 1) over (num_tasks, task_rank)
  * task lengthscale ~ Gamma(6, 3)

The posterior ensemble is exposed through `MultitaskSaasModel.posterior`,
batched over MCMC draws like the single-task SAAS model.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct

from botorch_tpu.models import priors as priors_mod
from botorch_tpu.models.fully_bayesian import MIN_NOISE
from botorch_tpu.ops.chol import (
    add_jitter,
    chol_logdet,
    cholesky_solve,
    psd_safe_cholesky,
    solve_triangular,
)
from botorch_tpu.ops.kernels import matern52
from botorch_tpu.posteriors.gaussian import GaussianPosterior
from botorch_tpu.sampling.nuts import run_nuts

Array = jax.Array

_log_2pi = math.log(2.0 * math.pi)


class MTSaasParams(NamedTuple):
    mean: Array  # (S,)
    outputscale: Array  # (S,)
    noise: Array  # (S,)
    lengthscale: Array  # (S, d)
    latents: Array  # (S, T, r)
    task_ls: Array  # (S, r)


class MultitaskSaasModel(struct.PyTreeNode):
    """Ensemble multi-task SAAS model (leading MCMC batch on params)."""

    X: Array  # (n, d) data features (task column removed)
    task_ids: Array  # (n,) int32
    Y: Array  # (n,) standardized
    params: MTSaasParams
    Y_loc: Array
    Y_scale: Array
    num_tasks: int = struct.field(pytree_node=False, default=2)

    @property
    def num_outputs(self) -> int:
        return 1

    @property
    def batch_shape(self):
        return (self.params.mean.shape[0],)

    def _K(self, p_idx, x1, t1, x2, t2) -> Array:
        p = jax.tree_util.tree_map(lambda a: a[p_idx], self.params)
        Kx = matern52(x1, x2, p.lengthscale)
        emb = p.latents  # (T, r)
        Kt_full = matern52(emb, emb, p.task_ls)  # (T, T)
        Kt = Kt_full[t1][:, t2]
        return p.outputscale * Kx * Kt

    def posterior(self, Xq: Array, task: int = 0,
                  observation_noise: bool = False, cache=None):
        tq = jnp.full((Xq.shape[0],), task, jnp.int32)
        S = self.params.mean.shape[0]

        def one(s):
            p = jax.tree_util.tree_map(lambda a: a[s], self.params)
            K = self._K(s, self.X, self.task_ids, self.X, self.task_ids)
            K = add_jitter(K + p.noise * jnp.eye(K.shape[0]))
            L = psd_safe_cholesky(K)
            Ks = self._K(s, self.X, self.task_ids, Xq, tq)
            Kss = self._K(s, Xq, tq, Xq, tq)
            resid = self.Y - p.mean
            alpha = cholesky_solve(L, resid[:, None])[:, 0]
            mean = p.mean + Ks.T @ alpha
            V = solve_triangular(L, Ks)
            cov = Kss - V.T @ V
            if observation_noise:
                cov = cov + p.noise * jnp.eye(cov.shape[0])
            return mean, cov

        means, covs = jax.vmap(one)(jnp.arange(S))
        post = GaussianPosterior(mean=means[..., None], cov=covs[:, None])
        return post.affine(self.Y_loc[None], self.Y_scale[None])

    def train_chol(self):
        return None


def _unpack_mt(z: Array, d: int, T: int, r: int):
    mean = z[0]
    outputscale = jnp.exp(z[1])
    noise = MIN_NOISE + jnp.exp(z[2])
    tausq = jnp.exp(z[3])
    ilsq = jnp.exp(z[4 : 4 + d])
    lengthscale = jax.lax.rsqrt(tausq * ilsq)
    off = 4 + d
    latents = z[off : off + T * r].reshape(T, r)
    task_ls = jnp.exp(z[off + T * r : off + T * r + r])
    return mean, outputscale, noise, tausq, ilsq, lengthscale, latents, task_ls


def fit_saas_multitask_gp(
    train_X: Array,
    train_Y: Array,
    task_feature: int,
    key: Array,
    num_tasks: Optional[int] = None,
    task_rank: Optional[int] = None,
    num_warmup: int = 256,
    num_samples: int = 128,
    thinning: int = 8,
    num_chains: int = 4,
    max_depth: int = 6,
) -> tuple[MultitaskSaasModel, dict]:
    """NUTS fit of the multi-task SAAS model (reference
    `fit_fully_bayesian_model_nuts` applied to
    `SaasFullyBayesianMultiTaskGP`)."""
    if train_Y.ndim > 1:
        train_Y = train_Y[..., 0]
    d_full = train_X.shape[-1]
    feat = [i for i in range(d_full) if i != task_feature]
    X = train_X[:, jnp.asarray(feat)]
    task_ids = train_X[:, task_feature].astype(jnp.int32)
    T = int(num_tasks) if num_tasks is not None else int(jnp.max(task_ids)) + 1
    r = int(task_rank) if task_rank is not None else T
    d = len(feat)
    n = X.shape[0]
    loc = jnp.mean(train_Y)
    scale = jnp.std(train_Y) + 1e-8
    Y_std = (train_Y - loc) / scale

    hc_tau = priors_mod.HalfCauchy(0.1)
    hc_ilsq = priors_mod.HalfCauchy(1.0)
    g_os = priors_mod.Gamma(2.0, 0.15)
    g_noise = priors_mod.Gamma(0.9, 10.0)
    g_task_ls = priors_mod.Gamma(6.0, 3.0)
    n_mean = priors_mod.Normal(0.0, 1.0)

    z_dim = 4 + d + T * r + r

    def potential(z: Array) -> Array:
        (mean, outputscale, noise, tausq, ilsq, lengthscale, latents,
         task_ls) = _unpack_mt(z, d, T, r)
        lp = (
            n_mean.log_prob(mean)
            + g_os.log_prob(outputscale)
            + g_noise.log_prob(noise - MIN_NOISE)
            + hc_tau.log_prob(tausq)
            + jnp.sum(hc_ilsq.log_prob(ilsq))
            + jnp.sum(n_mean.log_prob(latents))
            + jnp.sum(g_task_ls.log_prob(task_ls))
        )
        # Jacobians of the exp transforms (all coords except mean, latents)
        log_jac = z[1] + z[2] + z[3] + jnp.sum(z[4 : 4 + d]) + jnp.sum(
            z[4 + d + T * r :]
        )
        Kx = matern52(X, X, lengthscale)
        Kt = matern52(latents, latents, task_ls)[task_ids][:, task_ids]
        K = outputscale * Kx * Kt + noise * jnp.eye(n)
        L = jnp.linalg.cholesky(add_jitter(K))
        resid = Y_std - mean
        w = solve_triangular(L, resid[:, None])[:, 0]
        loglik = -0.5 * (jnp.dot(w, w) + chol_logdet(L) + n * _log_2pi)
        return -(loglik + lp + log_jac)

    k_init, k_run = jax.random.split(key)
    base = jnp.concatenate([
        jnp.zeros((3,)).at[2].set(math.log(0.01)),  # mean, log os, log noise_g
        jnp.asarray([math.log(0.1)]),  # log tausq
        jnp.zeros((d,)),  # log ilsq
        jnp.zeros((T * r,)),  # latents
        jnp.zeros((r,)),  # log task ls
    ])
    z0 = base + 0.3 * jax.random.normal(k_init, (num_chains, z_dim))
    per_chain = max(num_samples // num_chains, thinning)
    samples, stats = run_nuts(
        potential, z0, k_run, num_warmup=num_warmup,
        num_samples=per_chain, max_depth=max_depth,
    )
    zs = samples[:, ::thinning].reshape(-1, z_dim)

    def load(z):
        (mean, outputscale, noise, _, _, lengthscale, latents, task_ls
         ) = _unpack_mt(z, d, T, r)
        return MTSaasParams(
            mean=mean, outputscale=outputscale, noise=noise,
            lengthscale=lengthscale, latents=latents, task_ls=task_ls,
        )

    params = jax.vmap(load)(zs)
    model = MultitaskSaasModel(
        X=X, task_ids=task_ids, Y=Y_std, params=params,
        Y_loc=loc, Y_scale=scale, num_tasks=T,
    )
    return model, stats
