r"""Pathwise (function-space) GP sampling via Matheron's rule.

Counterpart of `botorch/sampling/pathwise/` (`prior_samplers.py:35`
`draw_kernel_feature_paths`, `update_strategies.py:41` `gaussian_update`,
`posterior_samplers.py:50,147` `MatheronPath`/`draw_matheron_paths`,
`get_matheron_path_model :91`) and the legacy RFF sampler
(`utils/gp_sampling.py:125,416`).

A posterior sample path is
    `f(x) = phi(x)^T theta  +  k(x, X) K^-1 (y - phi(X)^T theta - eps)`
with random Fourier prior features `phi`, `theta ~ N(0, I)`, and noise
draws `eps ~ N(0, noise I)` — an O(1) differentiable function of `x` once
drawn, which is what makes large-candidate-set Thompson sampling (TuRBO)
cheap: evaluating `n_c` candidates is one `(n_c, L) @ (L,)` matmul plus
one `(n_c, n) @ (n,)` matmul on the MXU, not an `n_c x n_c` posterior.

Spectral weights: RBF -> `w ~ N(0, diag(1/ls^2))`; Matern-nu ->
`w = z * sqrt(2 nu / chi2_{2 nu}) / ls` (Student-t spectral measure).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from botorch_tpu.models.gp import SingleTaskGP
from botorch_tpu.ops.chol import cholesky_solve

Array = jax.Array

_MATERN_NU = {"matern12": 0.5, "matern32": 1.5, "matern52": 2.5}


def _spectral_weights(key: Array, kernel: str, lengthscale: Array, num_features: int):
    """Sample RFF frequencies `W (L, d)` and phases `b (L,)`."""
    d = lengthscale.shape[-1]
    k_w, k_b, k_u = jax.random.split(key, 3)
    z = jax.random.normal(k_w, (num_features, d))
    if kernel == "rbf":
        w = z / lengthscale
    elif kernel in _MATERN_NU:
        nu = _MATERN_NU[kernel]
        u = 2.0 * jax.random.gamma(k_u, nu, (num_features, 1))  # chi2_{2nu}
        w = z * jnp.sqrt(2.0 * nu / u) / lengthscale
    else:
        raise ValueError(f"no spectral density for kernel {kernel!r}")
    b = jax.random.uniform(k_b, (num_features,), maxval=2.0 * math.pi)
    return w, b


class MatheronPath(struct.PyTreeNode):
    """A batch of posterior sample paths; callable at arbitrary inputs.

    Fields are batched over `(num_paths, ...)`; `__call__(x: (..., d))`
    returns `(num_paths, ...)` path values in ORIGINAL outcome units
    (single-output models).
    """

    model: SingleTaskGP
    W: Array  # (L, d) shared frequencies
    b: Array  # (L,)
    theta: Array  # (num_paths, L) prior weights
    v: Array  # (num_paths, n) data-update weights K^-1 (y - prior - eps)
    feature_scale: Array  # () sqrt(2 * outputscale / L)

    def _features(self, x: Array) -> Array:
        return self.feature_scale * jnp.cos(x @ self.W.T + self.b)

    def prior(self, x: Array) -> Array:
        """Prior component in standardized units, `(num_paths, ...)`."""
        return self._features(x) @ self.theta.T

    def __call__(self, x: Array) -> Array:
        m = self.model
        phi = self._features(x)  # (..., L)
        prior = phi @ self.theta.T  # (..., P)
        p = jax.tree_util.tree_map(lambda a: a[..., 0], m.params)
        p = p.replace(raw_lengthscale=m.params.raw_lengthscale[..., 0, :])
        Kxn = m._kernel(p, jnp.atleast_2d(x), m.X)  # (..., n)
        if m.mask is not None:
            Kxn = Kxn * m.mask.astype(Kxn.dtype)
        update = Kxn @ self.v.T  # (..., P)
        f_std = p.mean + prior + update
        out = m.Y_loc[0] + m.Y_scale[0] * f_std
        return jnp.moveaxis(out, -1, 0)  # (P, ...)


class SVGPMatheronPath(struct.PyTreeNode):
    """Posterior sample paths of a sparse variational GP.

    Variational pathwise conditioning ([wilson2020efficiently];
    reference `pathwise/update_strategies.py:41-180` `gaussian_update`
    dispatch for `ApproximateGPyTorchModel`): the data-update anchors are
    the INDUCING locations and the update weights come from a sample of
    the variational distribution `q(u)` — no observation-noise draw
    (inducing values are noiseless).
    """

    model: "object"  # SVGP pytree (kept untyped to avoid a cyclic import)
    W: Array  # (L, d)
    b: Array  # (L,)
    theta: Array  # (P, L)
    v: Array  # (P, M) update weights Kzz^-1 (u - mean - prior(Z))
    feature_scale: Array  # ()

    def _features(self, x: Array) -> Array:
        return self.feature_scale * jnp.cos(x @ self.W.T + self.b)

    def prior(self, x: Array) -> Array:
        return self._features(x) @ self.theta.T

    def __call__(self, x: Array) -> Array:
        m = self.model
        phi = self._features(x)  # (..., L)
        prior = phi @ self.theta.T  # (..., P)
        Kxz = m._k(jnp.atleast_2d(x), m.Z)  # (..., M)
        update = Kxz @ self.v.T  # (..., P)
        f_std = m.mean_const + prior + update
        out = m.Y_loc + m.Y_scale * f_std
        return jnp.moveaxis(out, -1, 0)  # (P, ...)


def _draw_matheron_paths_svgp(model, key, num_paths, num_features):
    """Pathwise draws for the whitened SVGP (`models/approximate_gp.py`).

    Whitened variational sample: `u = mean_const + Lzz (nu_mean + L_var z)`
    with `z ~ N(0, I)`; update weights `v = Kzz^-1 (u - mean_const -
    prior(Z))` (reference `update_strategies.py:41` with zero noise
    covariance)."""
    from botorch_tpu.ops.chol import add_jitter as _aj

    k_sw, k_th, k_u = jax.random.split(key, 3)
    W, b = _spectral_weights(
        k_sw, model.kernel, model.lengthscale, num_features
    )
    scale = jnp.sqrt(2.0 * model.outputscale / num_features)
    theta = jax.random.normal(k_th, (num_paths, num_features))

    Z = model.Z
    phiZ = scale * jnp.cos(Z @ W.T + b)  # (M, L)
    priorZ = phiZ @ theta.T  # (M, P)
    # sample q(u) in the whitened parameterization
    z = jax.random.normal(k_u, (num_paths, model.num_inducing))
    nu_s = model.nu_mean[:, None] + model.L_var @ z.T  # (M, P)
    Kzz = _aj(model._k(Z, Z), 1e-5)
    Lzz = jnp.linalg.cholesky(Kzz)
    u_centered = Lzz @ nu_s  # (M, P), u = mean_const + u_centered
    v = cholesky_solve(Lzz, u_centered - priorZ)  # (M, P)
    return SVGPMatheronPath(
        model=model, W=W, b=b, theta=theta, v=v.T, feature_scale=scale
    )


class ModelListMatheronPath(struct.PyTreeNode):
    """Per-submodel Matheron paths of a `ModelList`, stacked on the
    output axis (reference `pathwise/prior_samplers.py:35` ModelList
    dispatch): `__call__(x) -> (P, ..., m)`."""

    paths: tuple

    def __call__(self, x: Array) -> Array:
        return jnp.stack([p(x) for p in self.paths], axis=-1)


def draw_matheron_paths(
    model,
    key: Array,
    num_paths: int,
    num_features: int = 1024,
):
    """Draw `num_paths` posterior sample paths (reference
    `pathwise/posterior_samplers.py:147`). Dispatches on the model type:
    exact `SingleTaskGP` (Matheron data update over train points), SVGP
    (variational pathwise conditioning over inducing points), and
    `ModelList` (per-submodel paths stacked on the output axis)."""
    from botorch_tpu.models.approximate_gp import SVGP
    from botorch_tpu.models.model_list import ModelList

    if isinstance(model, SVGP):
        return _draw_matheron_paths_svgp(model, key, num_paths, num_features)
    if isinstance(model, ModelList):
        keys = jax.random.split(key, len(model.models))
        return ModelListMatheronPath(paths=tuple(
            draw_matheron_paths(m, k, num_paths, num_features)
            for m, k in zip(model.models, keys)
        ))
    if model.num_outputs != 1:
        raise ValueError("pathwise sampling supports single-output models")
    p = jax.tree_util.tree_map(lambda a: a[..., 0], model.params)
    p = p.replace(raw_lengthscale=model.params.raw_lengthscale[..., 0, :])
    outputscale = p.outputscale if model.use_outputscale else jnp.asarray(1.0)

    k_sw, k_th, k_eps = jax.random.split(key, 3)
    W, b = _spectral_weights(k_sw, model.kernel, p.lengthscale, num_features)
    scale = jnp.sqrt(2.0 * outputscale / num_features)
    theta = jax.random.normal(k_th, (num_paths, num_features))

    # Matheron data update: v = K^-1 (y - mu - prior(X) - eps)
    phiX = scale * jnp.cos(model.X @ W.T + b)  # (n, L)
    priorX = phiX @ theta.T  # (n, P)
    if model.Yvar is not None:
        noise = model.Yvar[:, 0]
    else:
        noise = jnp.broadcast_to(p.noise, (model.num_train,))
    eps = jax.random.normal(k_eps, (num_paths, model.num_train)) * jnp.sqrt(noise)
    resid = (model.Y[:, 0] - p.mean)[:, None] - priorX - eps.T  # (n, P)
    if model.mask is not None:
        resid = resid * model.mask.astype(resid.dtype)[:, None]
    L = model.train_chol()[0]
    v = cholesky_solve(L[0], resid)  # (n, P)
    return MatheronPath(
        model=model, W=W, b=b, theta=theta, v=v.T, feature_scale=scale
    )


def get_matheron_path_model(model: SingleTaskGP, key: Array, num_features: int = 1024):
    """One frozen sample path usable as a deterministic model (reference
    `pathwise/posterior_samplers.py:91` `get_matheron_path_model`)."""
    path = draw_matheron_paths(model, key, num_paths=1, num_features=num_features)

    def fn(x: Array) -> Array:
        return path(x)[0]

    return fn


def get_gp_samples(
    model: SingleTaskGP, key: Array, num_outputs: int = 1, n_samples: int = 1,
    num_rff_features: int = 512,
):
    """Deprecated reference name (`utils/gp_sampling.py:416`
    `get_gp_samples`, superseded upstream by pathwise sampling —
    `CHANGELOG.md:24`): returns a callable evaluating `n_samples` frozen
    posterior sample paths, `(..., d) -> (n_samples, ..., 1)`."""
    if num_outputs != 1:
        raise ValueError("pathwise sampling supports single-output models")
    path = draw_matheron_paths(
        model, key, num_paths=n_samples, num_features=num_rff_features
    )

    def fn(x: Array) -> Array:
        return path(x)[..., None]

    return fn
