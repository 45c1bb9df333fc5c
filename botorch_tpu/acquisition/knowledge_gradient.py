r"""One-shot Knowledge Gradient (qKG) with fantasy models.

Counterpart of `botorch/acquisition/knowledge_gradient.py:55`
(`qKnowledgeGradient`) + the fantasize/conditioning path
(`models/model.py:328-407`, `models/gpytorch.py:206-260`).

One-shot parameterization: the optimized variable is
`X_full = [X_actual (q) | X_fantasies (num_fantasies)]` — a single
`(q + nf, d)` matrix. `forward`:
  1. draws `nf` (fixed, qMC) fantasy observations at `X_actual` from the
     posterior WITH observation noise,
  2. conditions the model on each fantasy (shared-X Cholesky: one
     factorization serves all fantasies since the design is common),
  3. scores fantasy `i` by the fantasy-model posterior mean at
     `X_fantasies[i]`, and averages.

Because conditioning here appends rows with SHARED inputs, the fantasy
batch reuses one Cholesky of the augmented kernel matrix — the low-rank
fantasy-update economics of gpytorch's `get_fantasy_model`, achieved
structurally instead of via cache surgery.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

from botorch_tpu.models.gp import SingleTaskGP
from botorch_tpu.ops.chol import (
    cholesky_solve,
    psd_safe_cholesky,
    solve_triangular,
    update_chol,
)
from botorch_tpu.sampling.sobol import draw_sobol_normal_samples

Array = jax.Array


class qKnowledgeGradient(struct.PyTreeNode):
    """One-shot qKG (maximize). Call with `X_full: (q + nf, d)`.

    `project` enables the multi-fidelity variant
    (`qMultiFidelityKnowledgeGradient`, reference
    `knowledge_gradient.py:308`): fantasy solution points are projected to
    the target fidelity before taking the value — compose with a
    cost-aware wrapper for the full MFKG."""

    model: SingleTaskGP
    cache: tuple  # (L, alpha, Linv) over train data
    base_samples: Array  # (nf, q) fantasy base draws
    current_value: Array = 0.0
    q: int = struct.field(pytree_node=False, default=1)
    num_fantasies: int = struct.field(pytree_node=False, default=64)
    project: object = struct.field(pytree_node=False, default=None)

    def get_augmented_q_batch_size(self) -> int:
        """`q + num_fantasies` (`knowledge_gradient.py:152-200`)."""
        return self.q + self.num_fantasies

    def extract_candidates(self, X_full: Array) -> Array:
        return X_full[..., : self.q, :]

    def __call__(self, X_full: Array) -> Array:
        m = self.model
        q, nf = self.q, self.num_fantasies
        X_actual = X_full[:q]
        X_fant = X_full[q:]  # (nf, d)
        if self.project is not None:
            X_fant = self.project(X_fant)

        # 1) fantasy observations at X_actual (joint, with obs noise)
        post = m.posterior(X_actual, observation_noise=True, cache=self.cache)
        Lq = post.scale_tril[0]  # (q, q) single-output
        mean_q = post.mean[:, 0]
        Yf = mean_q + (self.base_samples @ Lq.T)  # (nf, q) original units

        # 2) condition on fantasies: augmented design shared across nf.
        # The augmented factor is an O(n^2 q) BORDER UPDATE of the cached
        # train Cholesky (the reference's `get_fantasy_model` low-rank
        # update economics, `cached_cholesky.py:94-130`), not an
        # O((n+q)^3) refactorization.
        X_aug = jnp.concatenate([m.X, X_actual], axis=0)
        n_aug = X_aug.shape[0]
        Yf_std = (Yf - m.Y_loc[0]) / m.Y_scale[0]
        p = jax.tree_util.tree_map(lambda a: a[..., 0], m.params)
        p = p.replace(raw_lengthscale=m.params.raw_lengthscale[..., 0, :])
        noise_new = jnp.full(
            (q,), p.noise if m.Yvar is None else jnp.mean(m.Yvar[:, 0])
        )
        B = m._kernel(p, m.X, X_actual)  # (n, q)
        if m.mask is not None:
            mm_tr = m.mask.astype(B.dtype)
            B = B * mm_tr[:, None]
            resid_mask = jnp.concatenate(
                [mm_tr, jnp.ones((q,), B.dtype)]
            )
        else:
            resid_mask = jnp.ones((n_aug,), B.dtype)
        C = m._kernel(p, X_actual, X_actual) + jnp.diag(noise_new)
        L_aug = update_chol(self.cache[0][0], B, C)

        Y_std_tr = m.Y[:, 0] - p.mean
        resid = jnp.concatenate(
            [jnp.broadcast_to(Y_std_tr, (nf, m.num_train)), Yf_std - p.mean],
            axis=-1,
        ) * resid_mask  # (nf, n_aug)
        alpha = cholesky_solve(L_aug, resid.T).T  # (nf, n_aug)

        # 3) fantasy posterior mean at each fantasy's own solution point
        Ks = m._kernel(p, X_aug, X_fant) * resid_mask[:, None]  # (n_aug, nf)
        fant_means = p.mean + jnp.sum(alpha * Ks.T, axis=-1)  # (nf,)
        values = m.Y_loc[0] + m.Y_scale[0] * fant_means
        return jnp.mean(values) - self.current_value


def make_qkg(
    model: SingleTaskGP,
    q: int = 1,
    num_fantasies: int = 64,
    current_value: float | Array = 0.0,
    seed: int = 0,
    project=None,
) -> qKnowledgeGradient:
    """Build qKG (or qMultiFidelityKG when `project` maps candidates to the
    target fidelity, e.g. `lambda X: X.at[..., -1].set(1.0)`)."""
    if model.num_outputs != 1:
        raise ValueError("qKG supports single-output models")
    base = draw_sobol_normal_samples(q, num_fantasies, seed=seed)
    return qKnowledgeGradient(
        model=model,
        cache=model.train_chol(),
        base_samples=base,
        current_value=jnp.asarray(current_value, jnp.float32),
        q=q,
        num_fantasies=num_fantasies,
        project=project,
    )


# --------------------------------------------------------------------------- #
def fantasize(
    model: SingleTaskGP, X: Array, key: Array, num_fantasies: int
) -> SingleTaskGP:
    """Generic fantasize (reference `FantasizeMixin.fantasize`,
    `model.py:328-407`): sample noisy observations at `X` and condition,
    returning a fantasy-batched ensemble model (leading batch `nf`, same
    mechanics as the fully-Bayesian ensemble axis)."""
    post = model.posterior(X, observation_noise=True)
    Yf = post.rsample(key, (num_fantasies,))  # (nf, q, m)
    Y_std = (Yf - model.Y_loc) / model.Y_scale
    Y_new = jnp.concatenate(
        [jnp.broadcast_to(model.Y, (num_fantasies, *model.Y.shape)), Y_std],
        axis=-2,
    )  # (nf, n + q, m)
    params = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (num_fantasies, *a.shape)),
        model.params,
    )
    fant = model.replace(
        X=jnp.concatenate([model.X, X], axis=-2),
        Y=Y_new,
        params=params,
    )
    if model.Yvar is not None:
        noise = jnp.broadcast_to(
            jnp.mean(model.Yvar, axis=-2, keepdims=True), (X.shape[-2], model.num_outputs)
        )
        fant = fant.replace(Yvar=jnp.concatenate([model.Yvar, noise], axis=-2))
    if model.mask is not None:
        fant = fant.replace(
            mask=jnp.concatenate(
                [model.mask, jnp.ones((X.shape[-2],), model.mask.dtype)]
            )
        )
    return fant
