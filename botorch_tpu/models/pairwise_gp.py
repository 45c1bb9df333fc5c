r"""Pairwise-comparison preference GP with Laplace approximation.

Counterpart of `botorch/models/pairwise_gp.py:121` (`PairwiseGP`,
`PairwiseLaplaceMarginalLogLikelihood :1155`) and the probit comparison
likelihood (`models/likelihoods/pairwise.py:102`).

Model: latent utilities `f ~ GP(0, K)` over `n` items; each comparison
`(w_k, l_k)` is observed with probability
`P(w beats l | f) = Phi((f_w - f_l) / (sqrt(2) * sigma))`.
Inference is the Laplace approximation at the posterior mode: the
reference finds the mode with scipy `fsolve` (MINPACK, CPU); here it is a
fixed-iteration damped Newton solve in pure JAX (the log-likelihood is
concave, so convergence is fast and differentiable by unrolling), and the
Laplace evidence used for hyperparameter fitting is
`log p(D|f^) - 0.5 f^T K^-1 f^ - 0.5 logdet(I + K W)`.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from botorch_tpu.models import priors as priors_mod
from botorch_tpu.ops.chol import add_jitter, chol_logdet, cholesky_solve, psd_safe_cholesky, solve_triangular
from botorch_tpu.ops.kernels import kernel_fn
from botorch_tpu.posteriors.gaussian import GaussianPosterior
from botorch_tpu.utils.probability import log_ndtr, ndtr, phi

Array = jax.Array

_sqrt2 = math.sqrt(2.0)


class PairwiseGP(struct.PyTreeNode):
    """Preference GP state. `comparisons[k] = (winner_idx, loser_idx)`."""

    X: Array  # (n, d) item features
    comparisons: Array  # (c, 2) int32
    raw_lengthscale: Array  # (d,)
    raw_outputscale: Array  # ()
    f_map: Array  # (n,) Laplace mode (utilities, zero-mean scale)
    noise: float = struct.field(pytree_node=False, default=1.0)
    kernel: str = struct.field(pytree_node=False, default="rbf")
    likelihood: str = struct.field(pytree_node=False, default="probit")
    # "probit" (PairwiseProbitLikelihood) or "logit"
    # (PairwiseLogitLikelihood, reference `likelihoods/pairwise.py:172`)

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
    def outputscale(self) -> Array:
        return jnp.exp(self.raw_outputscale)

    def _K(self, a: Array, b: Array) -> Array:
        return self.outputscale * kernel_fn(self.kernel)(a, b, self.lengthscale)

    # -- probit comparison likelihood ----------------------------------- #
    def _loglik_terms(self, f: Array):
        w = self.comparisons[:, 0]
        l = self.comparisons[:, 1]
        z = (f[w] - f[l]) / (_sqrt2 * self.noise)
        if self.likelihood == "logit":
            ll = jnp.sum(jax.nn.log_sigmoid(z))
            sig = jax.nn.sigmoid(z)
            h = 1.0 - sig          # d ll/dz
            w2 = sig * (1.0 - sig)  # -d^2 ll/dz^2
            return ll, h, w2, w, l
        ll = jnp.sum(log_ndtr(z))
        # gradient pieces: d ll / dz = phi(z)/Phi(z)
        zc = jnp.clip(z, -6.0, 6.0)
        h = phi(zc) / jnp.clip(ndtr(zc), 1e-10)  # hazard
        # d^2 ll / dz^2 = -h (z + h)
        w2 = h * (zc + h)
        return ll, h, w2, w, l

    def _grad_hess(self, f: Array):
        _, h, w2, w, l = self._loglik_terms(f)
        c = 1.0 / (_sqrt2 * self.noise)
        g = jnp.zeros_like(f)
        g = g.at[w].add(h * c)
        g = g.at[l].add(-h * c)
        n = f.shape[0]
        W = jnp.zeros((n, n))
        d = w2 * c * c
        W = W.at[w, w].add(d)
        W = W.at[l, l].add(d)
        W = W.at[w, l].add(-d)
        W = W.at[l, w].add(-d)
        return g, W  # grad of loglik; W = -Hessian (PSD)

    # -- Laplace machinery ---------------------------------------------- #
    def _newton_mode(self, K: Array, iters: int = 25) -> Array:
        """Damped Newton for the posterior mode of `loglik - 0.5 f K^-1 f`."""
        L = psd_safe_cholesky(K)

        def body(f, _):
            g, W = self._grad_hess(f)
            Kinv_f = cholesky_solve(L, f[:, None])[:, 0]
            grad = g - Kinv_f
            H = W + cholesky_solve(L, jnp.eye(K.shape[0]))
            Lh = psd_safe_cholesky(H)
            step = cholesky_solve(Lh, grad[:, None])[:, 0]
            return f + 0.8 * step, None

        f, _ = jax.lax.scan(body, jnp.zeros(K.shape[0]), None, length=iters)
        return f

    def laplace_evidence(self) -> Array:
        """Approximate marginal log likelihood (hyperparameter objective;
        reference `PairwiseLaplaceMarginalLogLikelihood :1155`)."""
        K = add_jitter(self._K(self.X, self.X), 1e-5)
        f = self._newton_mode(K)
        ll, *_ = self._loglik_terms(f)
        _, W = self._grad_hess(f)
        L = psd_safe_cholesky(K)
        Kinv_f = cholesky_solve(L, f[:, None])[:, 0]
        B = jnp.eye(K.shape[0]) + K @ W
        sign, logdetB = jnp.linalg.slogdet(B)
        return ll - 0.5 * jnp.dot(f, Kinv_f) - 0.5 * logdetB

    def update_mode(self) -> "PairwiseGP":
        K = add_jitter(self._K(self.X, self.X), 1e-5)
        return self.replace(f_map=self._newton_mode(K))

    # -- posterior over utilities --------------------------------------- #
    def posterior(self, Xq: Array, observation_noise: bool = False, cache=None):
        K = add_jitter(self._K(self.X, self.X), 1e-5)
        Ks = self._K(self.X, Xq)
        Kss = self._K(Xq, Xq)
        _, W = self._grad_hess(self.f_map)
        L = psd_safe_cholesky(K)
        mean = Ks.T @ cholesky_solve(L, self.f_map[:, None])[:, 0]
        # cov = Kss - Ks^T (K + W^-1)^-1 Ks, via (K + W^-1)^-1 =
        #   W^(1/2) (I + W^(1/2) K W^(1/2))^-1 W^(1/2); use direct solve on
        #   the (regularized) sum for simplicity and stability here.
        M = add_jitter(K + jnp.linalg.pinv(W + 1e-6 * jnp.eye(K.shape[0])), 1e-5)
        Lm = psd_safe_cholesky(M)
        V = solve_triangular(Lm, Ks)
        cov = Kss - V.T @ V
        return GaussianPosterior(mean=mean[:, None], cov=cov[None])

    def train_chol(self):
        return None


def make_pairwise_gp(
    X: Array, comparisons: Array, kernel: str = "rbf",
    likelihood: str = "probit",
    consolidate_rtol: float = 0.0,
    consolidate_atol: float = 1e-4,
) -> PairwiseGP:
    # Consolidate (near-)duplicate datapoints so repeated comparisons of the
    # same design don't degenerate the Laplace Hessian (reference
    # `pairwise_gp.py:174-198` + `models/utils/assorted.py:334`). Skipped
    # for traced inputs (host-side preprocessing only).
    if consolidate_atol > 0 and not isinstance(X, jax.core.Tracer):
        from botorch_tpu.utils.transforms import consolidate_duplicates

        X, comparisons, _ = consolidate_duplicates(
            X, comparisons, rtol=consolidate_rtol, atol=consolidate_atol
        )
    d = X.shape[-1]
    ls0 = priors_mod.dim_scaled_lognormal_lengthscale_prior(d).mode
    model = PairwiseGP(
        X=X,
        comparisons=jnp.asarray(comparisons, jnp.int32),
        raw_lengthscale=jnp.full((d,), math.log(ls0)),
        raw_outputscale=jnp.asarray(0.0),
        f_map=jnp.zeros(X.shape[0]),
        kernel=kernel,
        likelihood=likelihood,
    )
    return model.update_mode()


@partial(jax.jit, static_argnames=("maxiter",))
def fit_pairwise_gp(model: PairwiseGP, maxiter: int = 40) -> PairwiseGP:
    """Fit kernel hyperparameters by maximizing the Laplace evidence."""
    from jax.flatten_util import ravel_pytree

    from botorch_tpu.ops.lbfgs import lbfgsb

    hypers0 = (model.raw_lengthscale, model.raw_outputscale)
    flat0, unravel = ravel_pytree(hypers0)

    def obj(v):
        ls, os_ = unravel(v)
        return -model.replace(
            raw_lengthscale=ls, raw_outputscale=os_
        ).laplace_evidence()

    res = lbfgsb(obj, flat0, maxiter=maxiter)
    ls, os_ = unravel(res.x)
    return model.replace(
        raw_lengthscale=ls, raw_outputscale=os_
    ).update_mode()


# --------------------------------------------------------------------------- #
class AnalyticExpectedUtilityOfBestOption(struct.PyTreeNode):
    """EUBO (reference `acquisition/preference.py:52`): for a pair
    `X: (2, d)`, the expected utility of the preferred option,
    `E[max(f1, f2)] = mu_max + sigma_d phi(delta/sigma_d) + delta_terms`
    in closed form for a bivariate Gaussian."""

    model: PairwiseGP

    def __call__(self, X: Array) -> Array:
        post = self.model.posterior(X)
        mu = post.mean[:, 0]
        cov = post.cov[0]
        var_d = cov[0, 0] + cov[1, 1] - 2 * cov[0, 1]
        sd = jnp.sqrt(jnp.clip(var_d, 1e-12))
        delta = (mu[0] - mu[1]) / sd
        # E[max(a,b)] = mu2 + (mu1-mu2) Phi(delta) + sd phi(delta)
        return mu[1] + (mu[0] - mu[1]) * ndtr(delta) + sd * phi(delta)


class qExpectedUtilityOfBestOption(struct.PyTreeNode):
    """qEUBO (reference `acquisition/preference.py:134`): MC estimate of
    `E[max_q utility]` under the preference posterior."""

    model: PairwiseGP
    num_samples: int = struct.field(pytree_node=False, default=128)
    seed: int = struct.field(pytree_node=False, default=0)

    def __call__(self, X: Array) -> Array:
        post = self.model.posterior(X)
        s = post.rsample(jax.random.PRNGKey(self.seed), (self.num_samples,))
        return jnp.mean(jnp.max(s[..., 0], axis=-1))


class PairwiseBayesianActiveLearningByDisagreement(struct.PyTreeNode):
    """Preference BALD (reference `acquisition/preference.py:205`): mutual
    information of a comparison outcome with the utility posterior, for a
    candidate pair `X (2, d)`."""

    model: PairwiseGP
    num_samples: int = struct.field(pytree_node=False, default=256)
    seed: int = struct.field(pytree_node=False, default=0)

    def __call__(self, X: Array) -> Array:
        post = self.model.posterior(X)
        s = post.rsample(jax.random.PRNGKey(self.seed), (self.num_samples,))
        z = (s[..., 0, 0] - s[..., 1, 0]) / (_sqrt2 * self.model.noise)
        p = ndtr(z)  # P(first wins | f) per sample
        p_bar = jnp.mean(p)

        def h(q):
            q = jnp.clip(q, 1e-6, 1 - 1e-6)
            return -(q * jnp.log(q) + (1 - q) * jnp.log(1 - q))

        return h(p_bar) - jnp.mean(h(p))
