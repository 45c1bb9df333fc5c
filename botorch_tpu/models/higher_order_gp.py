r"""Higher-order GP (HOGP): tensor-valued outputs with Kronecker structure.

Counterpart of `botorch/models/higher_order_gp.py:143` (`HigherOrderGP`,
`FlattenedStandardize :55`). Outputs `Y (n, o1, ..., ok)` are modeled with
covariance `K_x ⊗ K_1 ⊗ ... ⊗ K_k`, where each output-dimension kernel is
an RBF over LEARNABLE latent coordinates of that dimension's indices.

TPU-native algebra: instead of linear_operator's lazy Kronecker products,
the MLL and posterior use the exact Kronecker eigendecomposition
`K = (Q_x ⊗ Q_o) diag(lam_x ⊗ lam_o) (Q_x ⊗ Q_o)^T` — two (batched)
`eigh`s on the MXU and elementwise work in the eigenbasis; solves and
logdets are O(n^2 o + n o^2) instead of O((n o)^3).

Here the (possibly multi-axis) output grid is flattened to one axis `o`
with a single latent kernel (the k-axis generalization composes the same
eigen trick per axis).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from botorch_tpu.models import priors as priors_mod
from botorch_tpu.ops.kernels import rbf
from botorch_tpu.posteriors.gaussian import GaussianPosterior

Array = jax.Array

_log_2pi = math.log(2.0 * math.pi)


class HigherOrderGP(struct.PyTreeNode):
    """Kronecker-structured GP over `(input, output-index)` pairs."""

    X: Array  # (n, d)
    Y: Array  # (n, o) flattened standardized outputs
    raw_lengthscale: Array  # (d,) input kernel
    latents: Array  # (o, L) learnable output-index coordinates
    raw_latent_ls: Array  # (L,)
    raw_outputscale: Array  # ()
    raw_noise: Array  # ()
    Y_loc: Array  # ()
    Y_scale: Array  # () flattened standardization (FlattenedStandardize)
    out_shape: tuple = struct.field(pytree_node=False, default=())

    @property
    def num_outputs(self) -> int:
        return self.Y.shape[-1]

    @property
    def batch_shape(self):
        return ()

    def _Kx(self, a, b):
        return jnp.exp(self.raw_outputscale) * rbf(
            a, b, jnp.exp(self.raw_lengthscale)
        )

    def _Ko(self):
        K = rbf(self.latents, self.latents, jnp.exp(self.raw_latent_ls))
        return K + 1e-5 * jnp.eye(K.shape[0])

    def _eigs(self):
        Kx = self._Kx(self.X, self.X) + 1e-5 * jnp.eye(self.X.shape[0])
        lx, Qx = jnp.linalg.eigh(Kx)
        lo, Qo = jnp.linalg.eigh(self._Ko())
        return jnp.clip(lx, 1e-8), Qx, jnp.clip(lo, 1e-8), Qo

    def mll(self) -> Array:
        lx, Qx, lo, Qo = self._eigs()
        noise = jnp.exp(self.raw_noise)
        Yt = Qx.T @ self.Y @ Qo  # eigenbasis coordinates (n, o)
        denom = lx[:, None] * lo[None, :] + noise
        n, o = self.Y.shape
        quad = jnp.sum(jnp.square(Yt) / denom)
        logdet = jnp.sum(jnp.log(denom))
        return -0.5 * (quad + logdet + n * o * _log_2pi)

    def posterior(self, Xq: Array, observation_noise: bool = False, cache=None):
        lx, Qx, lo, Qo = self._eigs()
        noise = jnp.exp(self.raw_noise)
        Yt = Qx.T @ self.Y @ Qo
        denom = lx[:, None] * lo[None, :] + noise
        W = Yt / denom  # (n, o)

        Ks = self._Kx(self.X, Xq)  # (n, q)
        A = Ks.T @ Qx  # (q, n) in the K_x eigenbasis
        mean = A @ W @ (Qo * lo).T  # (q, o): (A W) (Qo Lam_o)^T
        # per-(q, o) marginal variance:
        # var = Kss*Ko_oo - sum_{i,j} A_qi^2 (Qo_oj lo_j)^2 / denom_ij
        Kss_diag = jnp.exp(self.raw_outputscale) * jnp.ones(Xq.shape[0])
        Ko_diag = jnp.diagonal(self._Ko())
        B = jnp.square(A)  # (q, n)
        C = jnp.square(Qo * lo)  # (o, n_eig)
        red = jnp.einsum("qi,ij,oj->qo", B, 1.0 / denom, C)
        var = jnp.maximum(
            Kss_diag[:, None] * Ko_diag[None, :] - red, 1e-10
        )
        if observation_noise:
            var = var + noise
        q, o = mean.shape
        cov = var.T[:, :, None] * jnp.eye(q)[None]  # (o, q, q) marginal
        post = GaussianPosterior(mean=mean, cov=cov)
        return post.affine(self.Y_loc, self.Y_scale)

    def train_chol(self):
        return None


def make_hogp(
    train_X: Array,
    train_Y: Array,
    latent_dim: int = 2,
) -> HigherOrderGP:
    """Build a HOGP from `Y (n, o1, ..., ok)` (flattened internally;
    `FlattenedStandardize` semantics for the outcome transform)."""
    n = train_Y.shape[0]
    out_shape = tuple(train_Y.shape[1:])
    Yf = train_Y.reshape(n, -1)
    o = Yf.shape[-1]
    loc = jnp.mean(Yf)
    scale = jnp.std(Yf) + 1e-8
    d = train_X.shape[-1]
    ls0 = priors_mod.dim_scaled_lognormal_lengthscale_prior(d).mode
    # init latents on a line to break symmetry
    lat = jnp.linspace(-1.0, 1.0, o)[:, None] * jnp.ones((1, latent_dim))
    return HigherOrderGP(
        X=train_X,
        Y=(Yf - loc) / scale,
        raw_lengthscale=jnp.full((d,), math.log(ls0)),
        latents=lat,
        raw_latent_ls=jnp.zeros((latent_dim,)),
        raw_outputscale=jnp.asarray(0.0),
        raw_noise=jnp.asarray(math.log(0.01)),
        Y_loc=loc,
        Y_scale=scale,
        out_shape=out_shape,
    )


@partial(jax.jit, static_argnames=("maxiter",))
def fit_hogp(model: HigherOrderGP, maxiter: int = 60) -> HigherOrderGP:
    from jax.flatten_util import ravel_pytree

    from botorch_tpu.ops.lbfgs import lbfgsb

    hypers0 = (
        model.raw_lengthscale, model.latents, model.raw_latent_ls,
        model.raw_outputscale, model.raw_noise,
    )
    flat0, unravel = ravel_pytree(hypers0)

    def obj(v):
        ls, lat, lls, os_, rn = unravel(v)
        return -model.replace(
            raw_lengthscale=ls, latents=lat, raw_latent_ls=lls,
            raw_outputscale=os_, raw_noise=rn,
        ).mll()

    res = lbfgsb(obj, flat0, maxiter=maxiter)
    ls, lat, lls, os_, rn = unravel(res.x)
    return model.replace(
        raw_lengthscale=ls, latents=lat, raw_latent_ls=lls,
        raw_outputscale=os_, raw_noise=rn,
    )


class HigherOrderGPKAxis(struct.PyTreeNode):
    r"""k-axis HOGP: tensor outputs `Y (n, o1, ..., ok)` with the full
    per-axis Kronecker factorization `K_x (x) K_1 (x) ... (x) K_k`
    (reference `higher_order_gp.py:143` keeps one kernel per output
    axis; the flattened `HigherOrderGP` above collapses them into one).

    All solves/logdets diagonalize in the joint eigenbasis: one `eigh`
    per factor (each factor is small), then elementwise work on the
    `(n, o1, ..., ok)` eigen-coefficient tensor via per-axis
    `tensordot`s — MXU-friendly and O(n^3 + sum o_i^3) instead of
    O((n prod o_i)^3). Two output axes supported (the reference's
    tutorial regime); latents per axis are learnable RBF coordinates."""

    X: Array  # (n, d)
    Y: Array  # (n, o1, o2) standardized
    raw_lengthscale: Array  # (d,)
    latents1: Array  # (o1, L)
    latents2: Array  # (o2, L)
    raw_latent_ls1: Array  # (L,)
    raw_latent_ls2: Array  # (L,)
    raw_outputscale: Array  # ()
    raw_noise: Array  # ()
    Y_loc: Array  # ()
    Y_scale: Array  # ()

    @property
    def num_outputs(self) -> int:
        return self.Y.shape[-2] * self.Y.shape[-1]

    @property
    def batch_shape(self):
        return ()

    def _Kx(self, a, b):
        return jnp.exp(self.raw_outputscale) * rbf(
            a, b, jnp.exp(self.raw_lengthscale)
        )

    def _Ko(self, latents, raw_ls):
        K = rbf(latents, latents, jnp.exp(raw_ls))
        return K + 1e-5 * jnp.eye(K.shape[0])

    def _eigs(self):
        Kx = self._Kx(self.X, self.X) + 1e-5 * jnp.eye(self.X.shape[0])
        lx, Qx = jnp.linalg.eigh(Kx)
        l1, Q1 = jnp.linalg.eigh(self._Ko(self.latents1, self.raw_latent_ls1))
        l2, Q2 = jnp.linalg.eigh(self._Ko(self.latents2, self.raw_latent_ls2))
        clip = lambda l: jnp.clip(l, 1e-8)
        return clip(lx), Qx, clip(l1), Q1, clip(l2), Q2

    @staticmethod
    def _rotate(T, Qx, Q1, Q2):
        """Apply `Qx^T x1 Q1^T x2 Q2^T` along the three axes of
        `T (n, o1, o2)`."""
        T = jnp.tensordot(Qx.T, T, axes=(1, 0))
        T = jnp.moveaxis(jnp.tensordot(Q1.T, T, axes=(1, 1)), 0, 1)
        T = jnp.moveaxis(jnp.tensordot(Q2.T, T, axes=(1, 2)), 0, 2)
        return T

    def mll(self) -> Array:
        lx, Qx, l1, Q1, l2, Q2 = self._eigs()
        noise = jnp.exp(self.raw_noise)
        Yt = self._rotate(self.Y, Qx, Q1, Q2)
        denom = (
            lx[:, None, None] * l1[None, :, None] * l2[None, None, :] + noise
        )
        N = self.Y.size
        quad = jnp.sum(jnp.square(Yt) / denom)
        logdet = jnp.sum(jnp.log(denom))
        return -0.5 * (quad + logdet + N * _log_2pi)

    def posterior(self, Xq: Array, observation_noise: bool = False,
                  cache=None):
        """Marginal posterior at `Xq (q, d)`: mean `(q, o1*o2)` and
        per-output marginal variances (`GaussianPosterior` with diagonal
        q-blocks, matching the flattened HOGP's contract)."""
        lx, Qx, l1, Q1, l2, Q2 = self._eigs()
        noise = jnp.exp(self.raw_noise)
        Yt = self._rotate(self.Y, Qx, Q1, Q2)
        denom = (
            lx[:, None, None] * l1[None, :, None] * l2[None, None, :] + noise
        )
        W = Yt / denom  # (n, o1, o2) eigen-coefficients

        Ks = self._Kx(self.X, Xq)  # (n, q)
        A = Ks.T @ Qx  # (q, n)
        C1 = Q1 * l1  # (o1, o1): K1 Q1 = Q1 Lam1
        C2 = Q2 * l2  # (o2, o2)
        # mean = A W x1 C1 x2 C2, flattened over outputs
        M = jnp.tensordot(A, W, axes=(1, 0))  # (q, o1, o2)
        M = jnp.moveaxis(jnp.tensordot(C1, M, axes=(1, 1)), 0, 1)
        M = jnp.moveaxis(jnp.tensordot(C2, M, axes=(1, 2)), 0, 2)
        q = Xq.shape[0]
        mean = M.reshape(q, -1)

        # marginal variance per (q, o1, o2):
        #   Kss_qq * K1_aa * K2_bb - sum_{ijk} A_qi^2 C1_aj^2 C2_bk^2 / D_ijk
        B = jnp.square(A)  # (q, n)
        D1 = jnp.square(C1)  # (o1, o1_eig)
        D2 = jnp.square(C2)  # (o2, o2_eig)
        inv = 1.0 / denom  # (n, o1e, o2e)
        red = jnp.einsum(
            "qi,aj,bk,ijk->qab", B, D1, D2, inv,
            precision=jax.lax.Precision.HIGHEST,
        )
        Kss_diag = jnp.exp(self.raw_outputscale) * jnp.ones(q)
        K1d = jnp.diagonal(self._Ko(self.latents1, self.raw_latent_ls1))
        K2d = jnp.diagonal(self._Ko(self.latents2, self.raw_latent_ls2))
        var = jnp.clip(
            Kss_diag[:, None, None] * K1d[None, :, None] * K2d[None, None, :]
            - red,
            1e-10,
        )
        if observation_noise:
            var = var + noise
        var = var.reshape(q, -1)
        cov = jnp.swapaxes(var, 0, 1)[:, :, None] * jnp.eye(q)[None]
        post = GaussianPosterior(mean=mean, cov=cov)
        return post.affine(self.Y_loc, self.Y_scale)

    def train_chol(self):
        return None


def make_hogp_kaxis(train_X: Array, train_Y: Array,
                    latent_dim: int = 2) -> HigherOrderGPKAxis:
    """Build from `Y (n, o1, o2)` (two output axes)."""
    assert train_Y.ndim == 3, "k-axis HOGP expects Y (n, o1, o2)"
    o1, o2 = train_Y.shape[1], train_Y.shape[2]
    loc = jnp.mean(train_Y)
    scale = jnp.std(train_Y) + 1e-8
    d = train_X.shape[-1]
    ls0 = priors_mod.dim_scaled_lognormal_lengthscale_prior(d).mode
    lat = lambda o: jnp.linspace(-1.0, 1.0, o)[:, None] * jnp.ones(
        (1, latent_dim)
    )
    return HigherOrderGPKAxis(
        X=train_X,
        Y=(train_Y - loc) / scale,
        raw_lengthscale=jnp.full((d,), math.log(ls0)),
        latents1=lat(o1),
        latents2=lat(o2),
        raw_latent_ls1=jnp.zeros((latent_dim,)),
        raw_latent_ls2=jnp.zeros((latent_dim,)),
        raw_outputscale=jnp.asarray(0.0),
        raw_noise=jnp.asarray(math.log(0.01)),
        Y_loc=loc,
        Y_scale=scale,
    )


@partial(jax.jit, static_argnames=("maxiter",))
def fit_hogp_kaxis(model: HigherOrderGPKAxis,
                   maxiter: int = 60) -> HigherOrderGPKAxis:
    from jax.flatten_util import ravel_pytree

    from botorch_tpu.ops.lbfgs import lbfgsb

    hypers0 = (
        model.raw_lengthscale, model.latents1, model.latents2,
        model.raw_latent_ls1, model.raw_latent_ls2,
        model.raw_outputscale, model.raw_noise,
    )
    flat0, unravel = ravel_pytree(hypers0)

    def obj(v):
        ls, a1, a2, t1, t2, os_, rn = unravel(v)
        return -model.replace(
            raw_lengthscale=ls, latents1=a1, latents2=a2,
            raw_latent_ls1=t1, raw_latent_ls2=t2,
            raw_outputscale=os_, raw_noise=rn,
        ).mll()

    res = lbfgsb(obj, flat0, maxiter=maxiter)
    ls, a1, a2, t1, t2, os_, rn = unravel(res.x)
    return model.replace(
        raw_lengthscale=ls, latents1=a1, latents2=a2,
        raw_latent_ls1=t1, raw_latent_ls2=t2,
        raw_outputscale=os_, raw_noise=rn,
    )
