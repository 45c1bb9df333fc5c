r"""Exact Gaussian-process regression model (SingleTaskGP equivalent).

TPU-native re-design of `botorch/models/gp_regression.py:68-255` +
`botorch/models/gpytorch.py`: the model is an immutable pytree holding
train data, standardization constants, and log-space hyperparameters; every
operation (MLL, posterior, conditioning) is a pure jit/vmap-safe function.
There is no module mutation, no train/eval mode, and no lazy prediction
strategy — the train-cache (Cholesky factor + weight vector) is an explicit
pytree computed once and reused.

Defaults match the reference (BoTorch 0.11.3, [Hvarfner2024vanilla]):
ARD RBF kernel without outputscale, dim-scaled LogNormal lengthscale prior
with a 0.025 floor, LogNormal(-4, 1) noise prior with a 1e-4 floor
(`models/utils/gpytorch_modules.py:74-127`), constant mean, and a
`Standardize` outcome transform baked into the model
(`gp_regression.py:166-169`).

Multi-output (`m > 1`) follows the reference's batched-multi-output design
(`models/gpytorch.py:265-459`): hyperparameters carry a leading `(m,)`
batch dim, internals vmap over it, and the posterior treats outputs as
independent.

Ensemble/fully-Bayesian models reuse this module by adding extra leading
batch dims to `GPParams` (see `models/fully_bayesian.py` here).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from botorch_tpu.models import priors as priors_mod
from botorch_tpu.ops.chol import (
    DEFAULT_JITTER,
    add_jitter,
    chol_logdet,
    cholesky_solve,
    psd_safe_cholesky,
    solve_triangular,
)
from botorch_tpu.ops.kernels import kernel_fn
from botorch_tpu.ops.pallas_linalg import (
    _blocked_tril_inverse,
    mvn_quad_logdet,
)
from botorch_tpu.posteriors.gaussian import GaussianPosterior

Array = jax.Array

_log_2pi = math.log(2.0 * math.pi)

# Largest n for which `train_chol` materializes the explicit L^-1 (the
# MXU-matmul posterior fast path). The r4 blocked forward-substitution
# inverse (`ops.pallas_linalg._blocked_tril_inverse`) is memory-safe at
# any n — XLA's own trsm-against-identity OOMs above ~8k with per-panel
# HLO temps — so the cap is now just the n^2-buffer budget (1 GB per
# output at n = 16384 f32).
_EXPLICIT_LINV_MAX_N = 16384


class GPParams(struct.PyTreeNode):
    """Log-space GP hyperparameters. Leading dims = (output/ensemble) batch."""

    mean: Array  # (...,) constant mean (standardized units)
    raw_lengthscale: Array  # (..., d) log lengthscale
    raw_outputscale: Array  # (...,) log outputscale (used iff use_outputscale)
    raw_noise: Array  # (...,) log noise variance (used iff noise inferred)
    # (..., w, m) log kernel mixture weights for composite kernels (mixed
    # sum/product outputscales, OAK component coefficients); None for plain
    # kernels. The weight axis precedes the output axis so per-output
    # slicing `[..., out]` works uniformly across all fields.
    raw_kernel_weights: Optional[Array] = None

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
    def kernel_weights(self) -> Optional[Array]:
        if self.raw_kernel_weights is None:
            return None
        return jnp.exp(self.raw_kernel_weights)


class SingleTaskGP(struct.PyTreeNode):
    """Exact GP with Gaussian likelihood (inferred or fixed noise)."""

    X: Array  # (n, d) train inputs (expected in [0, 1]^d or similar scale)
    Y: Array  # (n, m) standardized train targets
    params: GPParams  # leading (m,) batch over outputs
    Y_loc: Array  # (m,) outcome standardization offset
    Y_scale: Array  # (m,) outcome standardization scale
    Yvar: Optional[Array] = None  # (n, m) fixed observation noise (std units)
    mask: Optional[Array] = None  # (n,) validity mask for padded train data
    kernel: str = struct.field(pytree_node=False, default="rbf")
    use_outputscale: bool = struct.field(pytree_node=False, default=False)
    # prior regime: "lognormal" (modern default, [Hvarfner2024vanilla]) or
    # "gamma" (the reference's legacy `get_matern_kernel_with_gamma_prior` /
    # `get_gaussian_likelihood_with_gamma_prior` regime)
    priors: str = struct.field(pytree_node=False, default="lognormal")
    # marks NUTS-fitted ensembles (reference `utils/transforms.py:196`
    # `is_fully_bayesian`); fantasy batches leave this False
    _is_fully_bayesian: bool = struct.field(pytree_node=False, default=False)
    # train cache carried by `condition_on_observations` (the O(k)
    # bordered `update_chol` path — reference semantics: gpytorch fantasy
    # models reuse low-rank root updates, `models/model.py:393-407`).
    # INVARIANT: valid only for the (X, Y, params) it was built with;
    # every `replace(params=...)` site must pass `_cache=None` (flax
    # overwrites user-defined `replace`, so this cannot be automated).
    _cache: Optional[tuple] = None

    # ------------------------------------------------------------------ #
    @property
    def num_outputs(self) -> int:
        return self.Y.shape[-1]

    @property
    def dim(self) -> int:
        return self.X.shape[-1]

    @property
    def num_train(self) -> int:
        return self.X.shape[-2]

    @property
    def infer_noise(self) -> bool:
        return self.Yvar is None

    @property
    def batch_shape(self) -> tuple[int, ...]:
        """Extra leading batch dims of the hyperparameters beyond the output
        dim (e.g. an MCMC ensemble axis)."""
        return self.params.mean.shape[:-1]

    @property
    def num_valid(self) -> Array:
        """Number of real (unmasked) observations."""
        if self.mask is None:
            return jnp.asarray(self.num_train, jnp.float32)
        return jnp.sum(self.mask.astype(jnp.float32))

    def _mask_K(self, K: Array) -> Array:
        """Decouple padded rows/cols: the padded block becomes the identity,
        so its Cholesky/logdet/solve contributions vanish exactly. This is
        what lets one compiled program serve a growing BO history."""
        if self.mask is None:
            return K
        m = self.mask.astype(K.dtype)
        pair = m[..., :, None] * m[..., None, :]
        eye = jnp.eye(K.shape[-1], dtype=K.dtype)
        return K * pair + (1.0 - pair) * eye

    def _mask_vec(self, v: Array) -> Array:
        if self.mask is None:
            return v
        return v * self.mask.astype(v.dtype)

    # ------------------------------------------------------------------ #
    def _noise_diag(self, params: GPParams, out: int) -> Array:
        """Per-output noise diagonal (..., n) in standardized units."""
        if self.Yvar is not None:
            return self.Yvar[..., out]
        shape = (*params.noise.shape, self.num_train)
        return jnp.broadcast_to(params.noise[..., None], shape)

    def _kernel(self, params: GPParams, x: Array, z: Array) -> Array:
        if params.raw_kernel_weights is not None:
            k = kernel_fn(self.kernel)(
                x, z, params.lengthscale, params.kernel_weights
            )
        else:
            k = kernel_fn(self.kernel)(x, z, params.lengthscale)
        if self.use_outputscale:
            k = params.outputscale[..., None, None] * k
        return k

    # ------------------------------------------------------------------ #
    def train_chol(
        self, params: Optional[GPParams] = None
    ) -> tuple[Array, Array, Array]:
        """Per-output Cholesky of `K + noise I`, weights `K^-1 (y - mu)`,
        and the explicit inverse factor `L^-1`.

        Returns `(L: (m, n, n), alpha: (m, n), Linv: (m, n, n))` — the
        explicit analogue of gpytorch's cached prediction strategy
        (`models/gpytorch.py:189`). `Linv` is computed ONCE here so that
        every downstream posterior evaluation (each L-BFGS iteration of
        acquisition optimization) replaces a sequential triangular solve
        with an MXU matmul — on TPU the solve's sequential column loop is
        latency-bound and ~100x slower than the equivalent matmul.

        For n > `_EXPLICIT_LINV_MAX_N` (an n^2-buffer budget, not a
        compiler limitation since the r4 blocked inverse) the explicit
        inverse is skipped and a legacy `(L, alpha)` cache is returned;
        `posterior` then solves per query.
        """
        if params is None and self._cache is not None:
            return self._cache
        params = self.params if params is None else params
        n = self.X.shape[-2]
        explicit_inv = n <= _EXPLICIT_LINV_MAX_N

        def one(out: int):
            p = jax.tree_util.tree_map(lambda a: a[..., out], params)
            # restore trailing dim removed from lengthscale indexing
            p = p.replace(raw_lengthscale=params.raw_lengthscale[..., out, :])
            K = self._kernel(p, self.X, self.X)
            nd = self._noise_diag(p, out)
            K = self._mask_K(K + nd[..., :, None] * jnp.eye(K.shape[-1], dtype=K.dtype))
            L = psd_safe_cholesky(K)
            resid = self._mask_vec(self.Y[..., out] - p.mean[..., None])
            if not explicit_inv:
                w = solve_triangular(L, resid[..., None])
                alpha = solve_triangular(L, w, trans=True)[..., 0]
                return L, alpha, None
            # blocked forward-substitution inverse: identical cost to
            # XLA's trsm at n <= 4096, and the only compilable option
            # beyond (XLA materializes per-panel temps - 15.7 GB at
            # n=10240); measured 50 ms at n = 10240 on v5e
            Linv = _blocked_tril_inverse(L)
            w = jnp.matmul(
                Linv, resid[..., None], precision=jax.lax.Precision.HIGHEST
            )
            alpha = jnp.matmul(
                jnp.swapaxes(Linv, -1, -2), w,
                precision=jax.lax.Precision.HIGHEST,
            )[..., 0]
            return L, alpha, Linv

        Ls, alphas, Linvs = [], [], []
        for out in range(self.num_outputs):
            L, a, Li = one(out)
            Ls.append(L)
            alphas.append(a)
            Linvs.append(Li)
        if not explicit_inv:
            return (jnp.stack(Ls, axis=-3), jnp.stack(alphas, axis=-2))
        return (
            jnp.stack(Ls, axis=-3),
            jnp.stack(alphas, axis=-2),
            jnp.stack(Linvs, axis=-3),
        )

    # ------------------------------------------------------------------ #
    def mll(self, params: Optional[GPParams] = None) -> Array:
        """Exact marginal log likelihood, summed over outputs.

        `-(1/2) [ (y-mu)^T K^-1 (y-mu) + logdet K + n log 2pi ]` per output
        (the quantity gpytorch's `ExactMarginalLogLikelihood` computes,
        un-normalized by n)."""
        params = self.params if params is None else params
        n = self.num_valid

        def one(out: int) -> Array:
            p = jax.tree_util.tree_map(lambda a: a[..., out], params)
            p = p.replace(raw_lengthscale=params.raw_lengthscale[..., out, :])
            K = self._kernel(p, self.X, self.X)
            nd = self._noise_diag(p, out)
            K = self._mask_K(K + nd[..., :, None] * jnp.eye(K.shape[-1], dtype=K.dtype))
            resid = self._mask_vec(self.Y[..., out] - p.mean[..., None])
            # fused Pallas factor+solve+logdet on TPU for small n; the
            # closed-form VJP keeps the L-BFGS gradient path factor-free
            quad, ld = mvn_quad_logdet(add_jitter(K, DEFAULT_JITTER), resid)
            return -0.5 * (quad + ld + n * _log_2pi)

        return sum(one(out) for out in range(self.num_outputs))

    def log_prior(self, params: Optional[GPParams] = None) -> Array:
        """Log prior density over hyperparameters (no Jacobian — see
        `models/priors.py` docstring)."""
        params = self.params if params is None else params
        ls_prior = priors_mod.lengthscale_prior(self.priors, self.dim)
        lp = jnp.sum(ls_prior.log_prob(params.lengthscale), axis=(-1, -2))
        if self.infer_noise:
            lp = lp + jnp.sum(
                priors_mod.noise_prior(self.priors).log_prob(params.noise), -1
            )
        if self.use_outputscale:
            lp = lp + jnp.sum(
                priors_mod.gamma_outputscale_prior().log_prob(params.outputscale), -1
            )
        if params.raw_kernel_weights is not None:
            # the reference's ScaleKernel outputscale prior, applied per
            # mixture component.
            lp = lp + jnp.sum(
                priors_mod.gamma_outputscale_prior().log_prob(params.kernel_weights),
                axis=(-1, -2),
            )
        return lp

    def map_objective(self, params: GPParams) -> Array:
        """Negative (MLL + log prior): the MAP fitting loss."""
        return -(self.mll(params) + self.log_prior(params))

    # ------------------------------------------------------------------ #
    def posterior(
        self,
        Xq: Array,
        observation_noise: bool = False,
        cache: Optional[tuple[Array, Array]] = None,
    ) -> GaussianPosterior:
        """Joint posterior over `Xq: (..., q, d)` in ORIGINAL outcome units.

        Mirrors `Model.posterior` (`botorch/models/model.py:81-116` /
        `gpytorch.py:405-462`): predictive MVN of the latent function, plus
        likelihood noise if `observation_noise`, un-standardized via the
        stored outcome transform.
        """
        cache = self.train_chol() if cache is None else cache
        if len(cache) == 3:
            L, alpha, Linv = cache
        else:  # (L, alpha) cache: large-n train_chol or legacy callers
            L, alpha = cache
            Linv = None

        def one(out: int):
            p = jax.tree_util.tree_map(lambda a: a[..., out], self.params)
            p = p.replace(raw_lengthscale=self.params.raw_lengthscale[..., out, :])
            Ks = self._kernel(p, self.X, Xq)  # (..., n, q)
            if self.mask is not None:
                Ks = Ks * self.mask.astype(Ks.dtype)[..., :, None]
            Kss = self._kernel(p, Xq, Xq)  # (..., q, q)
            hp = jax.lax.Precision.HIGHEST
            mean = p.mean[..., None, None] + jnp.matmul(
                jnp.swapaxes(Ks, -1, -2), alpha[..., out, :, None], precision=hp
            )
            # Accuracy note (PRECISION.md): the explicit-Linv matmul is
            # faster on the MXU but less backward-stable than a per-query
            # triangular solve for ill-conditioned factors. Within the
            # default noise-floor regime (cond(K) ≲ 1e5) the measured
            # posterior drift vs f64 is ≤ 2e-4; for near-interpolation
            # problems use `settings.enable_x64()` + f64 models.
            if Linv is not None:
                v = jnp.matmul(Linv[..., out, :, :], Ks, precision=hp)
            else:
                v = solve_triangular(L[..., out, :, :], Ks)  # (..., n, q)
            cov = Kss - jnp.matmul(jnp.swapaxes(v, -1, -2), v, precision=hp)
            if observation_noise:
                if self.Yvar is not None:
                    nz = jnp.mean(self.Yvar[..., out], axis=-1)
                else:
                    nz = p.noise
                cov = cov + nz[..., None, None] * jnp.eye(cov.shape[-1], dtype=cov.dtype)
            return mean[..., 0], cov

        means, covs = [], []
        for out in range(self.num_outputs):
            mu, cov = one(out)
            means.append(mu)
            covs.append(cov)
        mean = jnp.stack(means, axis=-1)  # (..., q, m)
        cov = jnp.stack(covs, axis=-3)  # (..., m, q, q)
        post = GaussianPosterior(mean=mean, cov=cov)
        return post.affine(self.Y_loc, self.Y_scale)

    # ------------------------------------------------------------------ #
    def condition_on_observations(
        self, X_new: Array, Y_new: Array, cache: Optional[tuple] = None
    ) -> "SingleTaskGP":
        """Append observations (raw units), keeping transforms and
        hyperparameters fixed (`models/model.py:149` semantics).

        When a train cache exists (passed explicitly, stored by a prior
        conditioning, or — for unmasked models — computed here on first
        use), the returned model carries an O(n^2 k) bordered-update
        cache (`ops/chol.update_chol` block extension) instead of paying
        a fresh O((n+k)^3) factorization at its first posterior call —
        the explicit analogue of gpytorch's fantasy low-rank root
        updates (reference `models/model.py:393-407`,
        `utils/low_rank.py`)."""
        Y_std = (Y_new - self.Y_loc) / self.Y_scale
        model = self.replace(
            X=jnp.concatenate([self.X, X_new], axis=-2),
            Y=jnp.concatenate([self.Y, Y_std], axis=-2),
            _cache=None,
        )
        if self.Yvar is not None:
            noise = jnp.broadcast_to(
                jnp.mean(self.Yvar, axis=-2, keepdims=True), Y_std.shape
            )
            model = model.replace(Yvar=jnp.concatenate([self.Yvar, noise], axis=-2))
        if self.mask is not None:
            # padded models grow through their mask, not concatenation —
            # the bordered update does not apply
            return model
        cache = self._cache if cache is None else cache
        if cache is None:
            cache = self.train_chol()
        new_cache = self._bordered_cache_update(cache, X_new, model)
        return model.replace(_cache=new_cache)

    def _bordered_cache_update(
        self, cache: tuple, X_new: Array, model: "SingleTaskGP"
    ) -> tuple:
        """Extend a `(L, alpha[, Linv])` train cache to the bordered
        train covariance of `model` (self + the `k` new rows) in
        O(n^2 k) per output. `model` must be `self` with `X_new` (and
        standardized targets) appended and no mask."""
        from botorch_tpu.ops.chol import update_chol

        hp = jax.lax.Precision.HIGHEST
        if len(cache) == 3:
            L_all, alpha_all, Linv_all = cache
        else:
            L_all, alpha_all = cache
            Linv_all = None
        k = X_new.shape[-2]
        n_tot = model.num_train
        keep_inv = Linv_all is not None and n_tot <= _EXPLICIT_LINV_MAX_N

        def one(out: int):
            p = jax.tree_util.tree_map(lambda a: a[..., out], self.params)
            p = p.replace(raw_lengthscale=self.params.raw_lengthscale[..., out, :])
            B = self._kernel(p, self.X, X_new)  # (..., n, k)
            C = self._kernel(p, X_new, X_new)  # (..., k, k)
            if model.Yvar is not None:
                nd_new = model.Yvar[..., self.num_train :, out]
            else:
                nd_new = jnp.broadcast_to(
                    p.noise[..., None], (*p.noise.shape, k)
                )
            C = C + nd_new[..., :, None] * jnp.eye(k, dtype=C.dtype)
            L = L_all[..., out, :, :]
            L_new = update_chol(L, B, C)
            resid = model.Y[..., out] - p.mean[..., None]
            if not keep_inv:
                w = solve_triangular(L_new, resid[..., None])
                alpha = solve_triangular(L_new, w, trans=True)[..., 0]
                return L_new, alpha, None
            Linv = Linv_all[..., out, :, :]
            # block inverse of [[L, 0], [L21, L22]]:
            # [[Linv, 0], [-L22^-1 L21 Linv, L22^-1]] — O(k n^2) matmuls
            L21 = L_new[..., self.num_train :, : self.num_train]
            L22 = L_new[..., self.num_train :, self.num_train :]
            L22inv = solve_triangular(
                L22, jnp.broadcast_to(jnp.eye(k, dtype=L22.dtype), L22.shape)
            )
            bl = -jnp.matmul(
                jnp.matmul(L22inv, L21, precision=hp), Linv, precision=hp
            )
            top = jnp.concatenate(
                [Linv, jnp.zeros((*Linv.shape[:-2], self.num_train, k),
                                 dtype=Linv.dtype)],
                axis=-1,
            )
            bot = jnp.concatenate([bl, L22inv], axis=-1)
            Linv_new = jnp.concatenate([top, bot], axis=-2)
            w = jnp.matmul(Linv_new, resid[..., None], precision=hp)
            alpha = jnp.matmul(
                jnp.swapaxes(Linv_new, -1, -2), w, precision=hp
            )[..., 0]
            return L_new, alpha, Linv_new

        Ls, alphas, Linvs = [], [], []
        for out in range(self.num_outputs):
            Lo, a, Li = one(out)
            Ls.append(Lo)
            alphas.append(a)
            Linvs.append(Li)
        if not keep_inv:
            return (jnp.stack(Ls, axis=-3), jnp.stack(alphas, axis=-2))
        return (
            jnp.stack(Ls, axis=-3),
            jnp.stack(alphas, axis=-2),
            jnp.stack(Linvs, axis=-3),
        )

    def train_targets_original(self) -> Array:
        """Train targets in original units, (n, m)."""
        return self.Y * self.Y_scale + self.Y_loc


# ---------------------------------------------------------------------- #
def _maybe_warn_input_scaling(train_X, mask) -> None:
    """Warn when inputs are far outside the unit cube (reference
    `validate_input_scaling`, `models/utils/assorted.py` /
    `settings.py:69-81`). Skipped for traced (in-jit) values."""
    import warnings

    import numpy as _np

    from botorch_tpu import settings as _settings
    from botorch_tpu.exceptions import InputDataWarning

    if not _settings.validate_input_scaling.on():
        return
    if isinstance(train_X, jax.core.Tracer):
        return
    X = _np.asarray(train_X)
    if mask is not None and not isinstance(mask, jax.core.Tracer):
        valid = _np.asarray(mask).astype(bool)
        if valid.any():
            X = X[valid]
    if X.size and ((X.min() < -0.1) or (X.max() > 1.1)):
        warnings.warn(
            "train_X is not contained in the unit cube; consider "
            "normalizing inputs (utils.transforms.normalize).",
            InputDataWarning,
            stacklevel=3,
        )


def default_init_params(
    d: int,
    m: int = 1,
    use_outputscale: bool = False,
    kernel: str = "rbf",
    priors: str = "lognormal",
) -> GPParams:
    """Initial hyperparameters at the prior modes (reference
    `gpytorch_modules.py:117-126` uses `initial_value=prior.mode`).
    Composite kernels additionally get mixture weights initialized at the
    values reproducing their unweighted form."""
    from botorch_tpu.ops.kernels import kernel_default_raw_weights

    ls_prior = priors_mod.lengthscale_prior(priors, d)
    noise_prior = priors_mod.noise_prior(priors)
    w0 = kernel_default_raw_weights(kernel, d)
    return GPParams(
        mean=jnp.zeros((m,)),
        raw_lengthscale=jnp.full((m, d), math.log(ls_prior.mode)),
        raw_outputscale=jnp.full(
            (m,),
            math.log(priors_mod.gamma_outputscale_prior().mode)
            if (use_outputscale and priors == "gamma")
            else 0.0,
        ),
        raw_noise=jnp.full((m,), math.log(noise_prior.mode)),
        raw_kernel_weights=(
            None if w0 is None else jnp.broadcast_to(w0[:, None], (w0.shape[0], m))
        ),
    )


def make_gp(
    train_X: Array,
    train_Y: Array,
    train_Yvar: Optional[Array] = None,
    kernel: str = "rbf",
    use_outputscale: bool = False,
    standardize: bool = True,
    params: Optional[GPParams] = None,
    mask: Optional[Array] = None,
    priors: str = "lognormal",
    dtype=None,
) -> SingleTaskGP:
    """Construct a `SingleTaskGP` with a baked-in Standardize outcome
    transform (`gp_regression.py:166-169`).

    Args:
        train_X: `(n, d)` inputs.
        train_Y: `(n, m)` (or `(n,)`) observations in original units.
        train_Yvar: optional `(n, m)` observation noise (original units^2).
        dtype: optional compute dtype for the whole model stack. The
            default is float32 (TPU-native); pass `jnp.float64` (after
            `botorch_tpu.settings.enable_x64()`) to run the
            kernel/Cholesky/MLL/posterior pipeline in double precision —
            the reference is f64-first (`models/gpytorch.py:128-133`
            warns on f32), and this is the opt-in parity mode for
            ill-conditioned problems (see PRECISION.md for the measured
            f32-vs-f64 drift study).
    """
    if dtype is not None:
        train_X = jnp.asarray(train_X, dtype)
        train_Y = jnp.asarray(train_Y, dtype)
        if train_Yvar is not None:
            train_Yvar = jnp.asarray(train_Yvar, dtype)
        if params is not None:
            params = jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, dtype), params
            )
    if train_Y.ndim == 1:
        train_Y = train_Y[:, None]
    n, m = train_Y.shape
    d = train_X.shape[-1]
    _maybe_warn_input_scaling(train_X, mask)
    if standardize and (mask is not None or n > 1):
        if mask is None:
            loc = jnp.mean(train_Y, axis=0)
            scale = jnp.std(train_Y, axis=0, ddof=1)
        else:
            w = mask.astype(train_Y.dtype)[:, None]
            nv = jnp.maximum(jnp.sum(w), 2.0)
            loc = jnp.sum(train_Y * w, axis=0) / nv
            var = jnp.sum(jnp.square(train_Y - loc) * w, axis=0) / (nv - 1.0)
            scale = jnp.sqrt(var)
        scale = jnp.where(scale < 1e-8, 1.0, scale)
    else:
        loc = jnp.zeros((m,))
        scale = jnp.ones((m,))
    Y_std = (train_Y - loc) / scale
    if train_Yvar is not None and train_Yvar.ndim == 1:
        train_Yvar = train_Yvar[:, None]
    Yvar_std = None if train_Yvar is None else train_Yvar / jnp.square(scale)
    if params is None:
        params = default_init_params(
            d, m, use_outputscale, kernel=kernel, priors=priors
        )
        if dtype is not None:
            params = jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, dtype), params
            )
    return SingleTaskGP(
        X=train_X,
        Y=Y_std,
        params=params,
        Y_loc=loc,
        Y_scale=scale,
        Yvar=Yvar_std,
        mask=mask,
        kernel=kernel,
        use_outputscale=use_outputscale,
        priors=priors,
    )
