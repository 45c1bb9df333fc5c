r"""LCE-M: multi-task GP with a latent-context-embedding task kernel.

Counterpart of `botorch/models/contextual_multioutput.py:33` (`LCEMGP`,
[Feng2020HDCPS]): a task-indexed multi-task GP whose inter-task
covariance is an RBF kernel over *learned* per-context embedding vectors
(optionally concatenated with user-provided continuous context
features), instead of the free-form ICM factor of `MultiTaskGP`:

    K((x, t), (x', t')) = K_x(x, x') * RBF(emb[t], emb[t'])

Embeddings are max-norm-1 (as the reference's `nn.Embedding(max_norm=1)`)
and the task-kernel ARD lengthscales are constrained to (0, 2) (the
reference's `Interval(0, 2)`), realized smoothly as `2 * sigmoid(raw)`.

Everything is one fused jittable program: dense Cholesky MLL, L-BFGS
MAP fit, Gaussian posterior per output task.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from botorch_tpu.models import priors as priors_mod
from botorch_tpu.ops.chol import (
    add_jitter,
    chol_logdet,
    cholesky_solve,
    psd_safe_cholesky,
    solve_triangular,
)
from botorch_tpu.ops.kernels import kernel_fn, rbf
from botorch_tpu.posteriors.gaussian import GaussianPosterior

Array = jax.Array

_log_2pi = math.log(2.0 * math.pi)


class LCEMGP(struct.PyTreeNode):
    """Multi-task GP with embedding-parameterized task covariance.
    `X` excludes the task column; `task_ids (n,)` int32."""

    X: Array  # (n, d)
    Y: Array  # (n,) standardized
    task_ids: Array  # (n,) int32
    raw_lengthscale: Array  # (d,)
    raw_noise: Array  # ()
    embeddings: Array  # (T, e) learned context embeddings
    raw_task_ls: Array  # (e + m,) task-RBF ARD lengthscales, in (0, 2)
    mean_const: Array  # ()
    Y_loc: Array  # ()
    Y_scale: Array  # ()
    fixed_emb: Optional[Array] = None  # (T, m) given context features
    num_tasks: int = struct.field(pytree_node=False, default=2)
    kernel: str = struct.field(pytree_node=False, default="matern52")
    output_task: int = struct.field(pytree_node=False, default=0)

    @property
    def num_outputs(self) -> int:
        return 1

    @property
    def batch_shape(self):
        return ()

    @property
    def lengthscale(self) -> Array:
        return jnp.exp(self.raw_lengthscale)

    @property
    def noise(self) -> Array:
        return jnp.exp(self.raw_noise)

    def task_embeddings(self) -> Array:
        """Max-norm-1 learned embeddings, concatenated with any given
        context features (reference `LCEMGP._task_embeddings`)."""
        norm = jnp.linalg.norm(self.embeddings, axis=-1, keepdims=True)
        emb = self.embeddings * jnp.minimum(1.0, 1.0 / jnp.clip(norm, 1e-12))
        if self.fixed_emb is not None:
            emb = jnp.concatenate([emb, self.fixed_emb], axis=-1)
        return emb

    @property
    def task_covar(self) -> Array:
        emb = self.task_embeddings()
        ls = 2.0 * jax.nn.sigmoid(self.raw_task_ls)
        return rbf(emb, emb, ls)

    def _K(self, x1, t1, x2, t2) -> Array:
        Kx = kernel_fn(self.kernel)(x1, x2, self.lengthscale)
        Kt = self.task_covar[t1][:, t2]
        return Kx * Kt

    def _train_K(self) -> Array:
        K = self._K(self.X, self.task_ids, self.X, self.task_ids)
        return K + self.noise * jnp.eye(K.shape[0])

    def mll(self) -> Array:
        K = add_jitter(self._train_K())
        L = jnp.linalg.cholesky(K)
        resid = self.Y - self.mean_const
        z = solve_triangular(L, resid[:, None])[:, 0]
        n = self.Y.shape[0]
        return -0.5 * (jnp.dot(z, z) + chol_logdet(L) + n * _log_2pi)

    def log_prior(self) -> Array:
        d = self.X.shape[-1]
        lp = jnp.sum(
            priors_mod.dim_scaled_lognormal_lengthscale_prior(d).log_prob(
                self.lengthscale
            )
        )
        lp = lp + priors_mod.lognormal_noise_prior().log_prob(self.noise)
        lp = lp - 0.05 * jnp.sum(jnp.square(self.embeddings))
        return lp

    def posterior(
        self,
        Xq: Array,
        observation_noise: bool = False,
        cache=None,
        task: Optional[int] = None,
    ) -> GaussianPosterior:
        t = self.output_task if task is None else task
        tq = jnp.full((Xq.shape[0],), t, jnp.int32)
        K = add_jitter(self._train_K())
        L = psd_safe_cholesky(K)
        Ks = self._K(self.X, self.task_ids, Xq, tq)
        Kss = self._K(Xq, tq, Xq, tq)
        resid = self.Y - self.mean_const
        alpha = cholesky_solve(L, resid[:, None])[:, 0]
        mean = self.mean_const + Ks.T @ alpha
        V = solve_triangular(L, Ks)
        cov = Kss - V.T @ V
        if observation_noise:
            cov = cov + self.noise * jnp.eye(cov.shape[0])
        post = GaussianPosterior(mean=mean[:, None], cov=cov[None])
        return post.affine(self.Y_loc[None], self.Y_scale[None])

    def train_chol(self):
        return None


def make_lcem_gp(
    train_X: Array,
    train_Y: Array,
    task_feature: int,
    num_tasks: Optional[int] = None,
    embedding_dim: int = 1,
    context_emb_feature: Optional[Array] = None,
    kernel: str = "matern52",
    output_task: int = 0,
    seed: int = 0,
) -> LCEMGP:
    """Build from a design whose `task_feature` column holds context ids
    (reference `contextual_multioutput.py:41-147`)."""
    if train_Y.ndim > 1:
        train_Y = train_Y[..., 0]
    d_full = train_X.shape[-1]
    feat = [i for i in range(d_full) if i != task_feature]
    X = train_X[:, jnp.asarray(feat)]
    task_ids = train_X[:, task_feature].astype(jnp.int32)
    T = int(num_tasks) if num_tasks is not None else int(jnp.max(task_ids)) + 1
    loc = jnp.mean(train_Y)
    scale = jnp.std(train_Y) + 1e-8
    d = len(feat)
    ls0 = priors_mod.dim_scaled_lognormal_lengthscale_prior(d).mode
    m = 0 if context_emb_feature is None else context_emb_feature.shape[-1]
    emb0 = 0.3 * jax.random.normal(
        jax.random.PRNGKey(seed), (T, embedding_dim), jnp.float32
    )
    return LCEMGP(
        X=X,
        Y=(train_Y - loc) / scale,
        task_ids=task_ids,
        raw_lengthscale=jnp.full((d,), math.log(ls0)),
        raw_noise=jnp.asarray(math.log(0.01)),
        embeddings=emb0,
        raw_task_ls=jnp.zeros((embedding_dim + m,)),  # ls = 1.0
        mean_const=jnp.asarray(0.0),
        Y_loc=loc,
        Y_scale=scale,
        fixed_emb=context_emb_feature,
        num_tasks=T,
        kernel=kernel,
        output_task=output_task,
    )


@partial(jax.jit, static_argnames=("maxiter",))
def fit_lcem_gp(model: LCEMGP, maxiter: int = 80) -> LCEMGP:
    from jax.flatten_util import ravel_pytree

    from botorch_tpu.ops.lbfgs import lbfgsb

    hypers0 = (
        model.raw_lengthscale, model.raw_noise, model.embeddings,
        model.raw_task_ls, model.mean_const,
    )
    flat0, unravel = ravel_pytree(hypers0)

    def obj(v):
        ls, rn, emb, tls, mc = unravel(v)
        m = model.replace(
            raw_lengthscale=ls, raw_noise=rn, embeddings=emb,
            raw_task_ls=tls, mean_const=mc,
        )
        return -(m.mll() + m.log_prior())

    res = lbfgsb(obj, flat0, maxiter=maxiter)
    ls, rn, emb, tls, mc = unravel(res.x)
    return model.replace(
        raw_lengthscale=ls, raw_noise=rn, embeddings=emb,
        raw_task_ls=tls, mean_const=mc,
    )
