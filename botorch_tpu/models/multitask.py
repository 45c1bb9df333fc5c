r"""Multi-task exact GP with an ICM task kernel.

Counterpart of `botorch/models/multitask.py:123` (`MultiTaskGP`): data
rows carry a task id embedded as one column of X; the covariance is the
product of a data kernel over the remaining features and a low-rank
IndexKernel over task ids, `K_task = B B^T + diag(v)`
(`multitask.py:257,309`).

The Kronecker-structured variant (`KroneckerMultiTaskGP :394`) exploits a
block design (all tasks observed at all points); on TPU the plain ICM
product with a fused dense Cholesky is already MXU-friendly at BO scales,
so the Kronecker algebra is left to a later optimization pass.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Sequence

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
from botorch_tpu.ops.kernels import kernel_fn

from botorch_tpu.posteriors.gaussian import GaussianPosterior

Array = jax.Array

_log_2pi = math.log(2.0 * math.pi)


class MultiTaskGP(struct.PyTreeNode):
    """ICM multi-task GP. `X` excludes the task column; `task_ids (n,)`."""

    X: Array  # (n, d)
    Y: Array  # (n,) standardized
    task_ids: Array  # (n,) int32
    raw_lengthscale: Array  # (d,)
    raw_noise: Array  # ()
    task_factor: Array  # (T, rank) B
    raw_task_diag: Array  # (T,) log v
    mean_const: Array  # ()
    Y_loc: Array  # ()
    Y_scale: Array  # ()
    num_tasks: int = struct.field(pytree_node=False, default=2)
    rank: int = struct.field(pytree_node=False, default=1)
    kernel: str = struct.field(pytree_node=False, default="matern52")
    output_task: int = struct.field(pytree_node=False, default=0)
    # LKJ concentration on the task CORRELATION matrix (None = off). The
    # reference's `task_covar_prior` is typically `LKJCovariancePrior(
    # num_tasks, eta=0.5, sd_prior=Gamma(1.0, 0.15))` (reference
    # `models/multitask.py:257,364-373`); `eta` here enables exactly that
    # decomposition: LKJ(eta) on the correlation + Gamma(1, 0.15) on the
    # per-task scales.
    lkj_eta: Optional[float] = struct.field(pytree_node=False, default=None)

    @property
    def num_outputs(self) -> int:
        return 1  # posterior is for the output task

    @property
    def batch_shape(self):
        return ()

    @property
    def lengthscale(self) -> Array:
        return jnp.exp(self.raw_lengthscale)

    @property
    def noise(self) -> Array:
        return jnp.exp(self.raw_noise)

    @property
    def task_covar(self) -> Array:
        B = self.task_factor
        return B @ B.T + jnp.diag(jnp.exp(self.raw_task_diag))

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
        if self.lkj_eta is not None:
            # LKJCovariancePrior decomposition (reference
            # `multitask.py:373`): LKJ(eta) on the correlation matrix —
            # unnormalized density `(eta - 1) logdet(C)` — plus
            # Gamma(1.0, 0.15) on the per-task standard deviations.
            cov = add_jitter(self.task_covar, 1e-8)
            sd = jnp.sqrt(jnp.clip(jnp.diagonal(cov), 1e-12))
            C = cov / (sd[:, None] * sd[None, :])
            lp = lp + (self.lkj_eta - 1.0) * jnp.linalg.slogdet(C)[1]
            lp = lp + jnp.sum(priors_mod.Gamma(1.0, 0.15).log_prob(sd))
        else:
            # weak shrinkage on task covariances
            lp = lp - 0.05 * jnp.sum(jnp.square(self.task_factor))
        return lp

    def posterior(
        self,
        Xq: Array,
        observation_noise: bool = False,
        cache=None,
        task: Optional[int] = None,
    ) -> GaussianPosterior:
        """Posterior for `task` (default `output_task`) at `Xq (q, d)`."""
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


def make_multitask_gp(
    train_X: Array,
    train_Y: Array,
    task_feature: int,
    num_tasks: Optional[int] = None,
    rank: int = 1,
    kernel: str = "matern52",
    output_task: int = 0,
    lkj_eta: Optional[float] = None,
) -> MultiTaskGP:
    """Build from a design whose `task_feature` column holds task ids
    (reference `MultiTaskGP.__init__`, `multitask.py:123-257`).

    `lkj_eta` enables the reference's LKJ task-covariance prior
    (`task_covar_prior=LKJCovariancePrior(T, eta, Gamma(1.0, 0.15))`,
    reference `multitask.py:364-373`; its default config uses
    `eta = 0.5`) on the MAP objective — helpful on few-task problems
    where the unregularized ICM factor overfits."""
    if train_Y.ndim > 1:
        train_Y = train_Y[..., 0]
    d_full = train_X.shape[-1]
    feat = [i for i in range(d_full) if i != task_feature]
    X = train_X[:, jnp.asarray(feat)]
    task_ids = train_X[:, task_feature].astype(jnp.int32)
    # remap non-contiguous task values to 0..k-1 (reference
    # `multitask.py:87` `get_task_value_remapping`)
    uniq = jnp.unique(task_ids)
    mapper = get_task_value_remapping(uniq)
    if mapper is not None:
        task_ids = mapper[task_ids].astype(jnp.int32)
        output_task = int(mapper[output_task]) if output_task in [
            int(v) for v in uniq
        ] else output_task
        T_default = uniq.shape[0]
    else:
        T_default = int(jnp.max(task_ids)) + 1
    T = int(num_tasks) if num_tasks is not None else T_default
    loc = jnp.mean(train_Y)
    scale = jnp.std(train_Y) + 1e-8
    d = len(feat)
    ls0 = priors_mod.dim_scaled_lognormal_lengthscale_prior(d).mode
    return MultiTaskGP(
        X=X,
        Y=(train_Y - loc) / scale,
        task_ids=task_ids,
        raw_lengthscale=jnp.full((d,), math.log(ls0)),
        raw_noise=jnp.asarray(math.log(0.01)),
        task_factor=0.5 * jnp.ones((T, rank)),
        raw_task_diag=jnp.full((T,), math.log(0.1)),
        mean_const=jnp.asarray(0.0),
        Y_loc=loc,
        Y_scale=scale,
        num_tasks=T,
        rank=rank,
        kernel=kernel,
        output_task=output_task,
        lkj_eta=lkj_eta,
    )


@partial(jax.jit, static_argnames=("maxiter",))
def fit_multitask_gp(model: MultiTaskGP, maxiter: int = 60) -> MultiTaskGP:
    from jax.flatten_util import ravel_pytree

    from botorch_tpu.ops.lbfgs import lbfgsb

    hypers0 = (
        model.raw_lengthscale, model.raw_noise, model.task_factor,
        model.raw_task_diag, model.mean_const,
    )
    flat0, unravel = ravel_pytree(hypers0)

    def obj(v):
        ls, rn, tf, td, mc = unravel(v)
        m = model.replace(
            raw_lengthscale=ls, raw_noise=rn, task_factor=tf,
            raw_task_diag=td, mean_const=mc,
        )
        return -(m.mll() + m.log_prior())

    res = lbfgsb(obj, flat0, maxiter=maxiter)
    ls, rn, tf, td, mc = unravel(res.x)
    return model.replace(
        raw_lengthscale=ls, raw_noise=rn, task_factor=tf,
        raw_task_diag=td, mean_const=mc,
    )


class KroneckerMultiTaskGP(struct.PyTreeNode):
    r"""Block-design multi-task GP with exact Kronecker algebra
    (reference `multitask.py:394`, `KroneckerMultiTaskGP`): every task is
    observed at every input, so the train covariance is
    `K_x (x) K_t + sigma I` and all solves/logdets diagonalize in the
    joint eigenbasis `(Q_x (x) Q_t)` — two small `eigh`s (MXU-friendly)
    and elementwise work, O(n^3 + T^3) instead of O((nT)^3).

    `Y (n, T)`; task covariance is ICM `B B^T + diag(v)`."""

    X: Array  # (n, d)
    Y: Array  # (n, T) standardized
    raw_lengthscale: Array  # (d,)
    raw_outputscale: Array  # ()
    raw_noise: Array  # ()
    task_factor: Array  # (T, rank)
    raw_task_diag: Array  # (T,)
    mean_const: Array  # ()
    Y_loc: Array  # ()
    Y_scale: Array  # ()
    num_tasks: int = struct.field(pytree_node=False, default=2)
    rank: int = struct.field(pytree_node=False, default=1)
    kernel: str = struct.field(pytree_node=False, default="matern52")

    @property
    def num_outputs(self) -> int:
        return self.num_tasks

    @property
    def batch_shape(self):
        return ()

    @property
    def lengthscale(self) -> Array:
        return jnp.exp(self.raw_lengthscale)

    @property
    def noise(self) -> Array:
        return jnp.exp(self.raw_noise)

    @property
    def task_covar(self) -> Array:
        B = self.task_factor
        return B @ B.T + jnp.diag(jnp.exp(self.raw_task_diag))

    def _Kx(self, a, b) -> Array:
        return jnp.exp(self.raw_outputscale) * kernel_fn(self.kernel)(
            a, b, self.lengthscale
        )

    def _eigs(self):
        Kx = self._Kx(self.X, self.X) + 1e-5 * jnp.eye(self.X.shape[0])
        lx, Qx = jnp.linalg.eigh(Kx)
        Kt = self.task_covar + 1e-6 * jnp.eye(self.num_tasks)
        lt, Qt = jnp.linalg.eigh(Kt)
        return jnp.clip(lx, 1e-8), Qx, jnp.clip(lt, 1e-8), Qt

    def mll(self) -> Array:
        lx, Qx, lt, Qt = self._eigs()
        resid = self.Y - self.mean_const
        Yt = Qx.T @ resid @ Qt  # (n, T) eigenbasis coordinates
        denom = lx[:, None] * lt[None, :] + self.noise
        n, T = self.Y.shape
        quad = jnp.sum(jnp.square(Yt) / denom)
        logdet = jnp.sum(jnp.log(denom))
        return -0.5 * (quad + logdet + n * T * _log_2pi)

    def log_prior(self) -> Array:
        d = self.X.shape[-1]
        lp = jnp.sum(
            priors_mod.dim_scaled_lognormal_lengthscale_prior(d).log_prob(
                self.lengthscale
            )
        )
        lp = lp + priors_mod.lognormal_noise_prior().log_prob(self.noise)
        lp = lp - 0.05 * jnp.sum(jnp.square(self.task_factor))
        return lp

    def posterior(
        self, Xq: Array, observation_noise: bool = False, cache=None
    ) -> GaussianPosterior:
        """Joint posterior over ALL tasks at `Xq (q, d)`: mean `(q, T)`,
        per-task covariance `(T, q, q)` (exact q-block, diagonal across
        tasks — the `(m, q, q)` convention of `GaussianPosterior`)."""
        lx, Qx, lt, Qt = self._eigs()
        resid = self.Y - self.mean_const
        Yt = Qx.T @ resid @ Qt
        denom = lx[:, None] * lt[None, :] + self.noise  # (n, T)
        W = Yt / denom
        Ks = self._Kx(self.X, Xq)  # (n, q)
        A = Ks.T @ Qx  # (q, n)
        C = Qt * lt  # (T, T): K_t Q_t = Q_t Lambda_t
        mean = self.mean_const + A @ W @ C.T  # (q, T)
        Kss = self._Kx(Xq, Xq)  # (q, q)
        # per-eigencolumn weights: w[t, i] = sum_j C[t,j]^2 / denom[i,j]
        w = jnp.square(C) @ (1.0 / denom).T  # (T, n)
        red = jnp.einsum(
            "qi,pi,ti->tqp", A, A, w,
            precision=jax.lax.Precision.HIGHEST,
        )
        Ktd = jnp.diagonal(self.task_covar)
        cov = Kss[None] * Ktd[:, None, None] - red  # (T, q, q)
        if observation_noise:
            cov = cov + self.noise * jnp.eye(Xq.shape[0])[None]
        post = GaussianPosterior(mean=mean, cov=cov)
        return post.affine(self.Y_loc, self.Y_scale)

    def train_chol(self):
        return None


def make_kronecker_mtgp(
    train_X: Array,
    train_Y: Array,
    rank: Optional[int] = None,
    kernel: str = "matern52",
) -> KroneckerMultiTaskGP:
    """Build from a block design: `train_Y (n, T)` holds every task at
    every row of `train_X` (reference `multitask.py:394-470`)."""
    n, T = train_Y.shape
    rank = T if rank is None else rank
    loc = jnp.mean(train_Y)
    scale = jnp.std(train_Y) + 1e-8
    d = train_X.shape[-1]
    ls0 = priors_mod.dim_scaled_lognormal_lengthscale_prior(d).mode
    return KroneckerMultiTaskGP(
        X=train_X,
        Y=(train_Y - loc) / scale,
        raw_lengthscale=jnp.full((d,), math.log(ls0)),
        raw_outputscale=jnp.asarray(0.0),
        raw_noise=jnp.asarray(math.log(0.01)),
        task_factor=0.5 * jnp.ones((T, rank)),
        raw_task_diag=jnp.full((T,), math.log(0.1)),
        mean_const=jnp.asarray(0.0),
        Y_loc=loc,
        Y_scale=scale,
        num_tasks=T,
        rank=rank,
        kernel=kernel,
    )


@partial(jax.jit, static_argnames=("maxiter",))
def fit_kronecker_mtgp(
    model: KroneckerMultiTaskGP, maxiter: int = 60
) -> KroneckerMultiTaskGP:
    from jax.flatten_util import ravel_pytree

    from botorch_tpu.ops.lbfgs import lbfgsb

    hypers0 = (
        model.raw_lengthscale, model.raw_outputscale, model.raw_noise,
        model.task_factor, model.raw_task_diag, model.mean_const,
    )
    flat0, unravel = ravel_pytree(hypers0)

    def obj(v):
        ls, os_, rn, tf, td, mc = unravel(v)
        m = model.replace(
            raw_lengthscale=ls, raw_outputscale=os_, raw_noise=rn,
            task_factor=tf, raw_task_diag=td, mean_const=mc,
        )
        return -(m.mll() + m.log_prior())

    res = lbfgsb(obj, flat0, maxiter=maxiter)
    ls, os_, rn, tf, td, mc = unravel(res.x)
    return model.replace(
        raw_lengthscale=ls, raw_outputscale=os_, raw_noise=rn,
        task_factor=tf, raw_task_diag=td, mean_const=mc,
    )


def get_task_value_remapping(task_values: Array) -> Optional[Array]:
    """Map arbitrary sorted integer task values to contiguous `0..k-1`
    floats (reference `models/multitask.py:87`): `mapper[task_value]`
    yields the new id; values absent from `task_values` map to NaN.
    Returns None when the values are already `0..k-1`."""
    k = task_values.shape[0]
    task_range = jnp.arange(k, dtype=task_values.dtype)
    if bool(jnp.all(task_values == task_range)):
        return None
    size = int(task_values.max()) + 1
    mapper = jnp.full((size,), jnp.nan, jnp.float32)
    return mapper.at[task_values].set(jnp.arange(k, dtype=jnp.float32))
