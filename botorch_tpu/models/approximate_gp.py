r"""Sparse variational GP (SVGP) for large-n Bayesian optimization.

Counterpart of `botorch/models/approximate_gp.py` (`ApproximateGPyTorchModel
:75`, `SingleTaskVariationalGP :284`) and the inducing-point allocators
(`models/utils/inducing_point_allocators.py:231` GreedyVarianceReduction).

Design (whitened SVGP, [Hensman2015scalable]):
  * `q(u) = N(L_zz nu_m + mean, L_zz S L_zz^T)` via the whitened variable
    `nu ~ N(nu_m, S)`, `S = L_v L_v^T`, which makes the KL term
    `KL(q||p) = 0.5 (|nu_m|^2 + tr(S) - M - logdet S)` — no solves.
  * predictive: with `A = L_zz^-1 k_zx`:
      `mean = mu + A^T nu_m`, `cov = K_xx - A^T A + A^T S A`.
  * ELBO with minibatch scaling `n / |batch|`; fit with optax Adam (the
    reference's `fit_gpytorch_mll_torch` path) — every step is one jitted
    update, vmappable over restarts.
  * Inducing-point initialization by pivoted-Cholesky greedy variance
    reduction (reference `GreedyVarianceReduction`).

The posterior is a `GaussianPosterior`, so the whole acquisition stack
(analytic, qMC, hypervolume) works unchanged on SVGP models.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from botorch_tpu.models import priors as priors_mod
from botorch_tpu.ops.chol import add_jitter, psd_safe_cholesky, solve_triangular
from botorch_tpu.ops.kernels import kernel_fn
from botorch_tpu.posteriors.gaussian import GaussianPosterior

Array = jax.Array

_log_2pi = math.log(2.0 * math.pi)


def greedy_variance_reduction(
    X: Array,
    lengthscale: Array,
    num_inducing: int,
    kernel: str = "rbf",
    quality_scores: Optional[Array] = None,
) -> Array:
    """Pivoted-Cholesky selection of inducing points (reference
    `inducing_point_allocators.py:231` `GreedyVarianceReduction` /
    `_pivoted_cholesky_init :283`): greedily pick the point maximizing the
    residual conditional variance, optionally weighted by `quality_scores²`
    (the DPP diversity-quality decomposition of [moss2023ipa], reference
    `:341-345`). Returns selected rows of X."""
    k = kernel_fn(kernel)
    n = X.shape[0]
    K_diag = jnp.ones((n,))  # stationary kernels: k(x,x) = 1
    m = min(num_inducing, n)
    q2 = (
        jnp.ones((n,))
        if quality_scores is None
        else jnp.square(quality_scores)
    )

    def body(carry, _):
        resid, taken, L_rows, i = carry
        # mask already-selected pivots out of the argmax (reference
        # `_pivoted_cholesky_init` sets di2s[selected] = NEG_INF): float
        # error or score ties at 0 (EI underflow × saturated resid) could
        # otherwise re-select a row → duplicate inducing points and a
        # singular Kuu.
        j = jnp.argmax(jnp.where(taken, -jnp.inf, resid * q2))
        Kj = k(X, X[j][None, :], lengthscale)[:, 0]  # (n,)
        # subtract projections onto previously chosen pivots
        proj = jnp.einsum("kn,k->n", L_rows, L_rows[:, j])
        lj = (Kj - proj) / jnp.sqrt(jnp.maximum(resid[j], 1e-12))
        L_rows = L_rows.at[i].set(lj)
        resid = jnp.maximum(resid - lj**2, 0.0)
        taken = taken.at[j].set(True)
        return (resid, taken, L_rows, i + 1), j

    (_, _, _, _), idx = jax.lax.scan(
        body,
        (K_diag, jnp.zeros((n,), bool), jnp.zeros((m, n)), jnp.int32(0)),
        None,
        length=m,
    )
    return X[idx]


def expected_improvement_quality(
    model, X: Array, maximize: bool = True
) -> Array:
    """Per-point EI quality scores against a conservative posterior-mean
    baseline (reference `ExpectedImprovementQualityFunction`,
    `inducing_point_allocators.py:188-227`)."""
    from botorch_tpu.utils.probability import ndtr

    post = model.posterior(X)
    if post.mean.ndim != 2 or post.mean.shape[-1] != 1:
        # reference `ExpectedImprovementQualityFunction` raises
        # NotImplementedError for num_outputs != 1; a batched/ensemble
        # mean would otherwise broadcast into meaningless pivot scores.
        raise ValueError(
            "expected_improvement_quality requires a single-output, "
            f"unbatched model; got posterior mean shape {post.mean.shape}."
        )
    mean = post.mean[..., 0]
    sigma = jnp.sqrt(jnp.maximum(post.variance[..., 0], 1e-12))
    best_f = jnp.max(mean) if maximize else jnp.min(mean)
    u = (mean - best_f) / sigma if maximize else -(mean - best_f) / sigma
    phi = jnp.exp(-0.5 * u * u) / math.sqrt(2.0 * math.pi)
    return sigma * (phi + u * ndtr(u))


def greedy_improvement_reduction(
    model,
    X: Array,
    lengthscale: Array,
    num_inducing: int,
    kernel: str = "rbf",
    maximize: bool = True,
) -> Array:
    """Inducing points that are both diverse AND in promising regions per
    the previous BO step's `model` (reference `GreedyImprovementReduction`,
    `inducing_point_allocators.py:252-281`)."""
    q = expected_improvement_quality(model, X, maximize=maximize)
    return greedy_variance_reduction(
        X, lengthscale, num_inducing, kernel=kernel, quality_scores=q
    )


# Reference class names for migrating users.
GreedyVarianceReduction = greedy_variance_reduction
GreedyImprovementReduction = greedy_improvement_reduction
UnitQualityFunction = lambda X: jnp.ones((X.shape[0],))
ExpectedImprovementQualityFunction = expected_improvement_quality


class SVGP(struct.PyTreeNode):
    """Whitened sparse variational GP (single-output)."""

    X: Array  # (n, d) train inputs
    Y: Array  # (n,) standardized train targets
    Z: Array  # (M, d) inducing locations (learnable)
    nu_mean: Array  # (M,) whitened variational mean
    raw_L: Array  # (M, M) raw lower-tri variational root (softplus diag)
    mean_const: Array  # ()
    raw_lengthscale: Array  # (d,)
    raw_outputscale: Array  # ()
    raw_noise: Array  # ()
    Y_loc: Array  # ()
    Y_scale: Array  # ()
    kernel: str = struct.field(pytree_node=False, default="matern52")
    learn_inducing: bool = struct.field(pytree_node=False, default=True)

    # ------------------------------------------------------------------ #
    @property
    def num_outputs(self) -> int:
        return 1

    @property
    def num_inducing(self) -> int:
        return self.Z.shape[0]

    @property
    def lengthscale(self) -> Array:
        return jnp.exp(self.raw_lengthscale)

    @property
    def outputscale(self) -> Array:
        return jnp.exp(self.raw_outputscale)

    @property
    def noise(self) -> Array:
        return jnp.exp(self.raw_noise)

    @property
    def L_var(self) -> Array:
        """Lower-triangular variational root with positive diagonal."""
        L = jnp.tril(self.raw_L, -1)
        diag = jax.nn.softplus(jnp.diagonal(self.raw_L)) + 1e-6
        return L + jnp.diag(diag)

    def _k(self, a: Array, b: Array) -> Array:
        return self.outputscale * kernel_fn(self.kernel)(a, b, self.lengthscale)

    # ------------------------------------------------------------------ #
    def _predict(self, Xq: Array) -> tuple[Array, Array]:
        """Whitened predictive mean/cov over `Xq (q, d)` (standardized)."""
        Kzz = add_jitter(self._k(self.Z, self.Z), 1e-5)
        Lzz = jnp.linalg.cholesky(Kzz)
        Kzx = self._k(self.Z, Xq)  # (M, q)
        A = solve_triangular(Lzz, Kzx)  # (M, q) = L^-1 k_zx
        mean = self.mean_const + A.T @ self.nu_mean
        Kxx = self._k(Xq, Xq)
        SA = self.L_var.T @ A  # (M, q)
        cov = Kxx - A.T @ A + SA.T @ SA
        return mean, cov

    def posterior(
        self, Xq: Array, observation_noise: bool = False, cache=None
    ) -> GaussianPosterior:
        mean, cov = self._predict(Xq)
        if observation_noise:
            cov = cov + self.noise * jnp.eye(cov.shape[-1])
        post = GaussianPosterior(mean=mean[:, None], cov=cov[None])
        return post.affine(self.Y_loc[None], self.Y_scale[None])

    # ------------------------------------------------------------------ #
    def elbo(self, batch_idx: Optional[Array] = None) -> Array:
        """Variational ELBO (reference fit path: gpytorch
        `VariationalELBO`); minibatch-scaled when `batch_idx` given."""
        n = self.Y.shape[0]
        if batch_idx is None:
            Xb, Yb, scale = self.X, self.Y, 1.0
        else:
            Xb, Yb = self.X[batch_idx], self.Y[batch_idx]
            scale = n / batch_idx.shape[0]
        mean, cov = self._predict(Xb)
        var_f = jnp.clip(jnp.diagonal(cov), 1e-10)
        noise = self.noise
        # E_q[log N(y | f, noise)] per point
        exp_ll = -0.5 * (
            _log_2pi + jnp.log(noise)
            + (jnp.square(Yb - mean) + var_f) / noise
        )
        L = self.L_var
        kl = 0.5 * (
            jnp.sum(jnp.square(self.nu_mean))
            + jnp.sum(jnp.square(L))
            - self.num_inducing
            - 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
        )
        return scale * jnp.sum(exp_ll) - kl

    def log_prior(self) -> Array:
        d = self.X.shape[-1]
        lp = jnp.sum(
            priors_mod.dim_scaled_lognormal_lengthscale_prior(d).log_prob(
                self.lengthscale
            )
        )
        lp = lp + priors_mod.lognormal_noise_prior().log_prob(self.noise)
        lp = lp + priors_mod.Gamma(2.0, 0.15).log_prob(self.outputscale)
        return lp

    def train_chol(self):  # acqf-layer compatibility (cache is internal)
        return None

    @property
    def batch_shape(self):
        return ()


def make_svgp(
    train_X: Array,
    train_Y: Array,
    num_inducing: int = 128,
    kernel: str = "matern52",
    learn_inducing: bool = True,
    inducing_points: Optional[Array] = None,
) -> SVGP:
    """Construct an SVGP with pivoted-Cholesky inducing initialization and
    a Standardize outcome transform. Pass `inducing_points` to supply a
    custom allocation (e.g. `greedy_improvement_reduction` — the
    reference's `inducing_point_allocator=` argument,
    `approximate_gp.py:284`)."""
    if train_Y.ndim > 1:
        train_Y = train_Y[..., 0]
    n, d = train_X.shape
    loc = jnp.mean(train_Y)
    scale = jnp.std(train_Y) + 1e-8
    Y_std = (train_Y - loc) / scale
    ls0 = priors_mod.dim_scaled_lognormal_lengthscale_prior(d).mode
    if inducing_points is not None:
        Z = jnp.asarray(inducing_points, train_X.dtype)
    else:
        Z = greedy_variance_reduction(
            train_X, jnp.full((d,), ls0), num_inducing, kernel
        )
    M = Z.shape[0]
    return SVGP(
        X=train_X,
        Y=Y_std,
        Z=Z,
        nu_mean=jnp.zeros((M,)),
        raw_L=jnp.eye(M) * jnp.log(jnp.expm1(1.0)),  # softplus^-1(1)
        mean_const=jnp.asarray(0.0),
        raw_lengthscale=jnp.full((d,), math.log(ls0)),
        raw_outputscale=jnp.asarray(0.0),
        raw_noise=jnp.asarray(math.log(0.01)),
        Y_loc=loc,
        Y_scale=scale,
        kernel=kernel,
        learn_inducing=learn_inducing,
    )


@partial(jax.jit, static_argnames=("steps", "batch_size", "lr"))
def fit_svgp(
    model: SVGP,
    key: Array,
    steps: int = 1000,
    batch_size: int = 256,
    lr: float = 0.05,
) -> SVGP:
    """Fit by maximizing (ELBO + log prior) with Adam — the reference's
    stochastic fit path (`optim/core.py:143` torch_minimize), fully jitted
    as one `lax.scan` over steps."""
    n = model.Y.shape[0]
    use_minibatch = batch_size < n

    trainable = ("Z",) if model.learn_inducing else ()
    var_fields = (
        "nu_mean", "raw_L", "mean_const", "raw_lengthscale",
        "raw_outputscale", "raw_noise",
    ) + trainable

    params0 = {f: getattr(model, f) for f in var_fields}
    tx = optax.adam(lr)
    opt_state0 = tx.init(params0)

    def loss_fn(params, idx):
        m = model.replace(**params)
        return -(m.elbo(idx) + m.log_prior())

    def step(carry, k):
        params, opt_state = carry
        idx = (
            jax.random.randint(k, (batch_size,), 0, n) if use_minibatch else None
        )
        loss, grads = jax.value_and_grad(loss_fn)(params, idx)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    keys = jax.random.split(key, steps)
    (params, _), losses = jax.lax.scan(step, (params0, opt_state0), keys)
    return model.replace(**params)
