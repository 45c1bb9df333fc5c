r"""One-shot hypervolume knowledge gradient (qHVKG), any m.

Counterpart of
`botorch/acquisition/multi_objective/hypervolume_knowledge_gradient.py:51`
(`qHypervolumeKnowledgeGradient`): the expected increase in the
hypervolume of the POSTERIOR-MEAN front after observing the candidates.

One-shot parameterization: `X_full = [X_actual (q) | fantasy solution
sets (nf * q_inner)]`. Forward: draw `nf` fixed fantasy observations at
`X_actual` (per output, shared augmented Cholesky as in qKG), score
fantasy `i` by the 2-d hypervolume of the fantasy-model posterior means at
its own solution set, and average. The hypervolume is differentiable:
the sorted-staircase sum for m = 2
(`utils/multi_objective.hypervolume_2d`) and exact differentiable
Lacour-cell HV for m >= 3 (`box_decomposition_jax.hypervolume_cells`,
polynomial in the front size), so the whole
one-shot objective optimizes with the standard multi-start L-BFGS.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from botorch_tpu.models.gp import SingleTaskGP
from botorch_tpu.ops.chol import cholesky_solve, psd_safe_cholesky, update_chol
from botorch_tpu.sampling.sobol import draw_sobol_normal_samples
from botorch_tpu.utils.multi_objective import (
    hypervolume_2d,
    hypervolume_incl_excl,
)

Array = jax.Array


class qHypervolumeKnowledgeGradient(struct.PyTreeNode):
    """One-shot qHVKG for any number of outputs. Call with
    `(q + nf * q_inner, d)`."""

    model: SingleTaskGP  # m outputs
    cache: tuple
    base_samples: Array  # (nf, q, m) fantasy base draws (per output)
    ref_point: Array = None  # (m,)
    current_hv: Array = 0.0
    q: int = struct.field(pytree_node=False, default=1)
    num_fantasies: int = struct.field(pytree_node=False, default=8)
    q_inner: int = struct.field(pytree_node=False, default=8)
    project: object = struct.field(pytree_node=False, default=None)

    def get_augmented_q_batch_size(self) -> int:
        return self.q + self.num_fantasies * self.q_inner

    def extract_candidates(self, X_full: Array) -> Array:
        return X_full[..., : self.q, :]

    def __call__(self, X_full: Array) -> Array:
        m = self.model
        q, nf, qi = self.q, self.num_fantasies, self.q_inner
        X_actual = X_full[:q]
        X_sol = X_full[q:].reshape(nf, qi, -1)
        if self.project is not None:
            # MF variant: value fantasy solutions at the target fidelity
            # (reference `hypervolume_knowledge_gradient.py:293`)
            X_sol = self.project(X_sol)

        # fantasy observations at X_actual (all outputs, obs noise)
        post = m.posterior(X_actual, observation_noise=True, cache=self.cache)
        L = post.scale_tril  # (m, q, q)
        mean_q = post.mean  # (q, m)
        # Yf[i, :, o] = mean[:, o] + L_o @ eps[i, :, o]
        Yf = mean_q + jnp.einsum(
            "oqr,iro->iqo", L, self.base_samples
        )  # (nf, q, m)
        Yf_std = (Yf - m.Y_loc) / m.Y_scale

        # shared augmented Cholesky per output
        X_aug = jnp.concatenate([m.X, X_actual], axis=0)
        n_aug = X_aug.shape[0]

        def per_output(out):
            p = jax.tree_util.tree_map(lambda a: a[..., out], m.params)
            p = p.replace(raw_lengthscale=m.params.raw_lengthscale[..., out, :])
            # O(n^2 q) border update of the cached per-output train factor
            noise_new = jnp.full(
                (q,),
                p.noise if m.Yvar is None else jnp.mean(m.Yvar[:, out]),
            )
            B = m._kernel(p, m.X, X_actual)
            C = m._kernel(p, X_actual, X_actual) + jnp.diag(noise_new)
            L_aug = update_chol(self.cache[0][out], B, C)
            resid = jnp.concatenate(
                [jnp.broadcast_to(m.Y[:, out] - p.mean, (nf, m.num_train)),
                 Yf_std[..., out] - p.mean],
                axis=-1,
            )  # (nf, n_aug)
            alpha = cholesky_solve(L_aug, resid.T).T  # (nf, n_aug)
            # fantasy posterior means at each fantasy's solution set
            Ks = jax.vmap(lambda Xi: m._kernel(p, X_aug, Xi))(X_sol)
            mean = p.mean + jnp.einsum("ina,in->ia", Ks, alpha)  # (nf, qi)
            return m.Y_loc[out] + m.Y_scale[out] * mean

        n_out = m.num_outputs
        means = jnp.stack(
            [per_output(o) for o in range(n_out)], axis=-1
        )  # (nf, qi, n_out)
        if n_out == 2:
            hvs = hypervolume_2d(means, self.ref_point)  # (nf,)
        else:
            # polynomial differentiable HV via padded Lacour cells —
            # replaces the O(2^qi) inclusion-exclusion, so qi / |front|
            # up to ~hundreds is fine (round-2 weakness #5)
            from botorch_tpu.utils.box_decomposition_jax import (
                hypervolume_cells_batch,
            )

            hvs = hypervolume_cells_batch(means, self.ref_point)
        return jnp.mean(hvs) - self.current_hv


def make_qhvkg(
    model: SingleTaskGP,
    ref_point: Array,
    Y_baseline: Optional[Array] = None,
    q: int = 1,
    num_fantasies: int = 8,
    q_inner: int = 8,
    seed: int = 0,
    project=None,
) -> qHypervolumeKnowledgeGradient:
    import numpy as np

    from botorch_tpu.utils.multi_objective import (
        hypervolume,
        is_non_dominated,
    )

    ref_point = jnp.asarray(ref_point)
    current_hv = 0.0
    if Y_baseline is not None:
        front = np.asarray(Y_baseline)[
            np.asarray(is_non_dominated(jnp.asarray(Y_baseline)))
        ]
        front = front[(front > np.asarray(ref_point)).all(-1)]
        if len(front):
            current_hv = hypervolume(front, np.asarray(ref_point))
    m_out = model.num_outputs
    z = draw_sobol_normal_samples(q * m_out, num_fantasies, seed=seed)
    return qHypervolumeKnowledgeGradient(
        model=model,
        cache=model.train_chol(),
        base_samples=z.reshape(num_fantasies, q, m_out),
        ref_point=ref_point,
        current_hv=jnp.asarray(current_hv, jnp.float32),
        q=q,
        num_fantasies=num_fantasies,
        q_inner=q_inner,
        project=project,
    )


def make_qmfhvkg(
    model: SingleTaskGP,
    ref_point: Array,
    project,
    cost_fn=None,
    Y_baseline: Optional[Array] = None,
    q: int = 1,
    num_fantasies: int = 8,
    q_inner: int = 8,
    seed: int = 0,
):
    """`qMultiFidelityHypervolumeKnowledgeGradient` (reference
    `hypervolume_knowledge_gradient.py:293`): qHVKG whose fantasy solutions
    are projected to the target fidelity, optionally inverse-cost-weighted
    (compose `cost_fn` e.g. `wrappers.affine_fidelity_cost`)."""
    acqf = make_qhvkg(
        model, ref_point, Y_baseline=Y_baseline, q=q,
        num_fantasies=num_fantasies, q_inner=q_inner, seed=seed,
        project=project,
    )
    if cost_fn is None:
        return acqf
    from botorch_tpu.acquisition.wrappers import CostAwareAcquisitionFunction

    return CostAwareAcquisitionFunction(acqf=acqf, cost_fn=cost_fn)
