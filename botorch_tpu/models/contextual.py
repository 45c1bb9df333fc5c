r"""Contextual GPs: structural additive contextual (SAC) and latent
context embedding additive (LCE-A).

Counterpart of `botorch/models/contextual.py:16,65` (`SACGP`, `LCEAGP`)
with kernels `models/kernels/contextual_sac.py:19` /
`contextual_lcea.py:86`.

Setting: the d input dims decompose into per-context blocks
(`decomposition: {context: dims}`). SAC models the output as an additive
GP over contexts with a shared base kernel on each block; LCE-A
additionally learns a low-dim embedding per context that modulates
cross-context covariance.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Mapping, Sequence

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
from botorch_tpu.ops.kernels import rbf
from botorch_tpu.posteriors.gaussian import GaussianPosterior

Array = jax.Array

_log_2pi = math.log(2.0 * math.pi)


class SACGP(struct.PyTreeNode):
    """Structural additive contextual GP: `K = sum_c os_c * RBF(X[:, B_c])`."""

    X: Array  # (n, d)
    Y: Array  # (n,) standardized
    raw_lengthscale: Array  # (d,)
    raw_outputscales: Array  # (C,) one per context block
    raw_noise: Array
    mean_const: Array
    Y_loc: Array
    Y_scale: Array
    embeddings: Array = None  # (C, e) used by LCE-A; None for SAC
    blocks: tuple = struct.field(pytree_node=False, default=())
    # tuple of tuples: dims of each context block
    use_embedding: bool = struct.field(pytree_node=False, default=False)

    @property
    def num_outputs(self) -> int:
        return 1

    @property
    def batch_shape(self):
        return ()

    @property
    def lengthscale(self) -> Array:
        return jnp.exp(self.raw_lengthscale)

    def _K(self, a: Array, b: Array) -> Array:
        total = 0.0
        C = len(self.blocks)
        equal_blocks = len({len(d) for d in self.blocks}) == 1
        for ci, dims in enumerate(self.blocks):
            idx = jnp.asarray(dims)
            w = jnp.exp(self.raw_outputscales[ci])
            total = total + w * rbf(a[:, idx], b[:, idx], self.lengthscale[idx])
        if self.use_embedding and equal_blocks:
            # LCE-A cross-context terms: in contextual BO every context
            # carries the same parameter block, so cross covariances use
            # the first block's lengthscales on both blocks, weighted by
            # RBF similarity of the learned context embeddings.
            ls_shared = self.lengthscale[jnp.asarray(self.blocks[0])]
            for ci in range(C):
                for cj in range(C):
                    if ci == cj:
                        continue
                    idx = jnp.asarray(self.blocks[ci])
                    jdx = jnp.asarray(self.blocks[cj])
                    sim = jnp.exp(
                        -0.5 * jnp.sum(
                            jnp.square(self.embeddings[ci] - self.embeddings[cj])
                        )
                    )
                    w = jnp.sqrt(
                        jnp.exp(self.raw_outputscales[ci])
                        * jnp.exp(self.raw_outputscales[cj])
                    )
                    total = total + sim * w * rbf(a[:, idx], b[:, jdx], ls_shared)
        return total

    def mll(self) -> Array:
        K = add_jitter(self._K(self.X, self.X))
        K = K + jnp.exp(self.raw_noise) * jnp.eye(K.shape[0])
        L = jnp.linalg.cholesky(K)
        resid = self.Y - self.mean_const
        z = solve_triangular(L, resid[:, None])[:, 0]
        n = self.Y.shape[0]
        return -0.5 * (jnp.dot(z, z) + chol_logdet(L) + n * _log_2pi)

    def posterior(self, Xq: Array, observation_noise: bool = False, cache=None):
        K = add_jitter(self._K(self.X, self.X))
        K = K + jnp.exp(self.raw_noise) * jnp.eye(K.shape[0])
        L = psd_safe_cholesky(K)
        Ks = self._K(self.X, Xq)
        Kss = self._K(Xq, Xq)
        alpha = cholesky_solve(L, (self.Y - self.mean_const)[:, None])[:, 0]
        mean = self.mean_const + Ks.T @ alpha
        V = solve_triangular(L, Ks)
        cov = Kss - V.T @ V
        if observation_noise:
            cov = cov + jnp.exp(self.raw_noise) * jnp.eye(cov.shape[0])
        post = GaussianPosterior(mean=mean[:, None], cov=cov[None])
        return post.affine(self.Y_loc[None], self.Y_scale[None])

    def train_chol(self):
        return None


def make_sac_gp(
    train_X: Array,
    train_Y: Array,
    decomposition: Mapping[str, Sequence[int]],
    embedding_dim: int = 0,
) -> SACGP:
    """Build SAC (embedding_dim=0) or LCE-A (embedding_dim>0)."""
    if train_Y.ndim > 1:
        train_Y = train_Y[..., 0]
    blocks = tuple(tuple(v) for v in decomposition.values())
    C = len(blocks)
    d = train_X.shape[-1]
    loc = jnp.mean(train_Y)
    scale = jnp.std(train_Y) + 1e-8
    ls0 = priors_mod.dim_scaled_lognormal_lengthscale_prior(max(d, 1)).mode
    return SACGP(
        X=train_X,
        Y=(train_Y - loc) / scale,
        raw_lengthscale=jnp.full((d,), math.log(ls0)),
        raw_outputscales=jnp.zeros((C,)),
        raw_noise=jnp.asarray(math.log(0.01)),
        mean_const=jnp.asarray(0.0),
        Y_loc=loc,
        Y_scale=scale,
        embeddings=(
            0.1 * jnp.ones((C, embedding_dim)) if embedding_dim > 0 else
            jnp.zeros((C, 1))
        ),
        blocks=blocks,
        use_embedding=embedding_dim > 0,
    )


@partial(jax.jit, static_argnames=("maxiter",))
def fit_sac_gp(model: SACGP, maxiter: int = 60) -> SACGP:
    from jax.flatten_util import ravel_pytree

    from botorch_tpu.ops.lbfgs import lbfgsb

    hypers0 = (
        model.raw_lengthscale, model.raw_outputscales, model.raw_noise,
        model.mean_const, model.embeddings,
    )
    flat0, unravel = ravel_pytree(hypers0)

    def obj(v):
        ls, os_, rn, mc, emb = unravel(v)
        return -model.replace(
            raw_lengthscale=ls, raw_outputscales=os_, raw_noise=rn,
            mean_const=mc, embeddings=emb,
        ).mll()

    res = lbfgsb(obj, flat0, maxiter=maxiter)
    ls, os_, rn, mc, emb = unravel(res.x)
    return model.replace(
        raw_lengthscale=ls, raw_outputscales=os_, raw_noise=rn,
        mean_const=mc, embeddings=emb,
    )
