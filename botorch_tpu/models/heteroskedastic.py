r"""Heteroskedastic single-task GP.

Counterpart of `HeteroskedasticSingleTaskGP`
(`botorch/models/gp_regression.py:292`): a GP over f with a SECOND GP
modeling the (log) observation-noise surface, fit on the observed
per-point variances. The reference wires the noise GP into the likelihood
(`HeteroskedasticNoise`) and fits both jointly; here the two GPs are
separate pytrees fit in sequence (noise surface first, then the f-GP with
the observed variances as fixed noise), which keeps both fits as plain
batched-restart MAP problems on device.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from botorch_tpu.models.gp import SingleTaskGP, make_gp
from botorch_tpu.posteriors.gaussian import GaussianPosterior

Array = jax.Array


class HeteroskedasticSingleTaskGP(struct.PyTreeNode):
    """f-GP with fixed per-point noise + log-noise GP for prediction.

    `posterior(X, observation_noise=True)` adds the noise surface's
    prediction `exp(E[log sigma^2(X)])` to the predictive covariance
    diagonal — point-dependent noise, unlike `SingleTaskGP`'s constant
    inferred noise.
    """

    f_gp: SingleTaskGP
    noise_gp: SingleTaskGP

    @property
    def num_outputs(self) -> int:
        return self.f_gp.num_outputs

    @property
    def batch_shape(self) -> tuple[int, ...]:
        return self.f_gp.batch_shape

    def train_chol(self):
        return self.f_gp.train_chol()

    def posterior(
        self,
        Xq: Array,
        observation_noise: bool = False,
        cache=None,
    ) -> GaussianPosterior:
        post = self.f_gp.posterior(Xq, observation_noise=False, cache=cache)
        if not observation_noise:
            return post
        log_noise = self.noise_gp.posterior(Xq).mean  # (..., q, m)
        noise = jnp.exp(log_noise)
        q = post.mean.shape[-2]
        eye = jnp.eye(q, dtype=post.cov.dtype)
        cov = post.cov + jnp.swapaxes(noise, -1, -2)[..., :, None] * eye
        return GaussianPosterior(mean=post.mean, cov=cov)

    def condition_on_observations(
        self, X_new: Array, Y_new: Array, Yvar_new: Array
    ) -> "HeteroskedasticSingleTaskGP":
        f_gp = self.f_gp.condition_on_observations(X_new, Y_new)
        # fixed-noise conditioning keeps the observed variances exact
        Yvar_std = Yvar_new / jnp.square(self.f_gp.Y_scale)
        f_gp = f_gp.replace(
            Yvar=jnp.concatenate([self.f_gp.Yvar, Yvar_std], axis=-2)
        )
        noise_gp = self.noise_gp.condition_on_observations(
            X_new, jnp.log(jnp.maximum(Yvar_new, 1e-12))
        )
        return self.replace(f_gp=f_gp, noise_gp=noise_gp)


def make_heteroskedastic_gp(
    train_X: Array,
    train_Y: Array,
    train_Yvar: Array,
    kernel: str = "rbf",
) -> HeteroskedasticSingleTaskGP:
    """Build from `(n, d)` inputs, `(n, m)` observations, `(n, m)` observed
    per-point variances (original units; `gp_regression.py:292-388`)."""
    if train_Y.ndim == 1:
        train_Y = train_Y[:, None]
    if train_Yvar.ndim == 1:
        train_Yvar = train_Yvar[:, None]
    f_gp = make_gp(train_X, train_Y, train_Yvar=train_Yvar, kernel=kernel)
    # the reference's noise model uses a Log outcome transform: fit on
    # log-variances with its own (inferred-noise) GP
    noise_gp = make_gp(
        train_X, jnp.log(jnp.maximum(train_Yvar, 1e-12)), kernel=kernel
    )
    return HeteroskedasticSingleTaskGP(f_gp=f_gp, noise_gp=noise_gp)


def fit_heteroskedastic_gp(
    model: HeteroskedasticSingleTaskGP,
    key: Optional[Array] = None,
    num_restarts: int = 8,
    maxiter: int = 100,
) -> HeteroskedasticSingleTaskGP:
    """Fit noise surface then f-GP (both multi-restart MAP)."""
    from botorch_tpu.fit import fit_gp

    if key is None:
        key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    noise_gp = fit_gp(
        model.noise_gp, k1, num_restarts=num_restarts, maxiter=maxiter
    )
    f_gp = fit_gp(model.f_gp, k2, num_restarts=num_restarts, maxiter=maxiter)
    return model.replace(f_gp=f_gp, noise_gp=noise_gp)
