r"""One-shot multi-step lookahead (scenario tree).

Counterpart of `botorch/acquisition/multi_step_lookahead.py:49`
(`qMultiStepLookahead`, 665 LoC): a K-stage scenario tree where stage-k
candidates are optimized jointly with all fantasy branches (one-shot).

This implementation covers the common 2-step tree (the reference's default
configuration collapses to it as well): variables are
`X_full = [X_0 (q0) | X_1 branches (nf x q1)]`; the forward pass
fantasizes at `X_0` (fixed qMC base draws), then scores branch `i` with a
terminal value function (posterior mean or LogEI of the fantasy model) at
`X_1[i]`, averaging over branches. With `q1 = 1` and a posterior-mean
terminal value this reduces exactly to qKG — the tree generalizes it with
immediate-stage utilities and LogEI terminal values.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from botorch_tpu.models.gp import SingleTaskGP
from botorch_tpu.ops.chol import cholesky_solve, psd_safe_cholesky, update_chol
from botorch_tpu.sampling.sobol import draw_sobol_normal_samples
from botorch_tpu.utils.probability import log_ei_helper

Array = jax.Array


class qMultiStepLookahead(struct.PyTreeNode):
    """Two-stage one-shot lookahead. Call with `(q0 + nf * q1, d)`."""

    model: SingleTaskGP
    cache: tuple
    base_samples: Array  # (nf, q0)
    best_f: Array = 0.0
    q0: int = struct.field(pytree_node=False, default=1)
    q1: int = struct.field(pytree_node=False, default=1)
    num_fantasies: int = struct.field(pytree_node=False, default=16)
    terminal: str = struct.field(pytree_node=False, default="PosteriorMean")

    @property
    def q(self) -> int:
        """One-shot contract: the actual candidate count (for the KG-style
        IC generator `gen_one_shot_kg_initial_conditions`)."""
        return self.q0

    def get_augmented_q_batch_size(self) -> int:
        return self.q0 + self.num_fantasies * self.q1

    def extract_candidates(self, X_full: Array) -> Array:
        return X_full[..., : self.q0, :]

    def __call__(self, X_full: Array) -> Array:
        m = self.model
        q0, q1, nf = self.q0, self.q1, self.num_fantasies
        X0 = X_full[:q0]
        X1 = X_full[q0:].reshape(nf, q1, -1)

        # fantasy draws at X0 (original units)
        post = m.posterior(X0, observation_noise=True, cache=self.cache)
        Lq = post.scale_tril[0]
        Yf = post.mean[:, 0] + self.base_samples @ Lq.T  # (nf, q0)
        Yf_std = (Yf - m.Y_loc[0]) / m.Y_scale[0]

        # shared augmented Cholesky (fantasies share the design):
        # O(n^2 q0) border update of the cached train factor
        X_aug = jnp.concatenate([m.X, X0], axis=0)
        p = jax.tree_util.tree_map(lambda a: a[..., 0], m.params)
        p = p.replace(raw_lengthscale=m.params.raw_lengthscale[..., 0, :])
        noise0 = p.noise if m.Yvar is None else jnp.mean(m.Yvar[:, 0])
        B = m._kernel(p, m.X, X0)
        C = m._kernel(p, X0, X0) + noise0 * jnp.eye(q0)
        L_aug = update_chol(self.cache[0][0], B, C)
        resid = jnp.concatenate(
            [jnp.broadcast_to(m.Y[:, 0] - p.mean, (nf, m.num_train)),
             Yf_std - p.mean],
            axis=-1,
        )
        alpha = cholesky_solve(L_aug, resid.T).T  # (nf, n_aug)

        # terminal value at each branch's X1
        def branch_value(alpha_i, X1_i, best_i):
            Ks = m._kernel(p, X_aug, X1_i)  # (n_aug, q1)
            mean = p.mean + Ks.T @ alpha_i  # (q1,)
            mean_orig = m.Y_loc[0] + m.Y_scale[0] * mean
            if self.terminal == "PosteriorMean":
                return jnp.max(mean_orig)
            # LogEI terminal: marginal variance of the fantasy posterior
            v = jax.scipy.linalg.solve_triangular(L_aug, Ks, lower=True)
            var = jnp.clip(
                jnp.diagonal(m._kernel(p, X1_i, X1_i)) - jnp.sum(v * v, 0),
                1e-12,
            ) * jnp.square(m.Y_scale[0])
            sigma = jnp.sqrt(var)
            u = (mean_orig - best_i) / sigma
            return jnp.max(log_ei_helper(u) + jnp.log(sigma))

        best_per_branch = jnp.maximum(
            jnp.max(Yf, axis=-1), jnp.asarray(self.best_f)
        )
        vals = jax.vmap(branch_value)(alpha, X1, best_per_branch)
        return jnp.mean(vals)


def make_multistep(
    model: SingleTaskGP,
    q0: int = 1,
    q1: int = 1,
    num_fantasies: int = 16,
    best_f: float | Array = 0.0,
    terminal: str = "PosteriorMean",
    seed: int = 0,
) -> qMultiStepLookahead:
    base = draw_sobol_normal_samples(q0, num_fantasies, seed=seed)
    return qMultiStepLookahead(
        model=model,
        cache=model.train_chol(),
        base_samples=base,
        best_f=jnp.asarray(best_f, jnp.float32),
        q0=q0,
        q1=q1,
        num_fantasies=num_fantasies,
        terminal=terminal,
    )


class qThreeStepLookahead(struct.PyTreeNode):
    r"""Three-stage one-shot scenario tree (reference
    `multi_step_lookahead.py:49` with `batch_sizes=[q0, q1, q2]`,
    `num_fantasies=[nf1, nf2]`).

    Variables: `X_full = [X0 (q0) | X1 (nf1, q1) | X2 (nf1, nf2, q2)]`.
    Forward: fantasize at `X0` (nf1 branches, shared augmented
    Cholesky), then per branch fantasize at its `X1` (nf2 sub-branches,
    per-branch augmented Cholesky via `vmap`), and score each leaf with
    the terminal value at its `X2`. All base draws are fixed qMC — the
    whole tree is deterministic and differentiable for L-BFGS."""

    model: SingleTaskGP
    cache: tuple
    base1: Array  # (nf1, q0)
    base2: Array  # (nf1, nf2, q1)
    best_f: Array = 0.0
    q0: int = struct.field(pytree_node=False, default=1)
    q1: int = struct.field(pytree_node=False, default=1)
    q2: int = struct.field(pytree_node=False, default=1)
    nf1: int = struct.field(pytree_node=False, default=8)
    nf2: int = struct.field(pytree_node=False, default=4)
    terminal: str = struct.field(pytree_node=False, default="PosteriorMean")

    @property
    def q(self) -> int:
        return self.q0

    def get_augmented_q_batch_size(self) -> int:
        return self.q0 + self.nf1 * self.q1 + self.nf1 * self.nf2 * self.q2

    def extract_candidates(self, X_full: Array) -> Array:
        return X_full[..., : self.q0, :]

    def __call__(self, X_full: Array) -> Array:
        m = self.model
        q0, q1, q2 = self.q0, self.q1, self.q2
        nf1, nf2 = self.nf1, self.nf2
        d = X_full.shape[-1]
        X0 = X_full[:q0]
        o1 = q0 + nf1 * q1
        X1 = X_full[q0:o1].reshape(nf1, q1, d)
        X2 = X_full[o1:].reshape(nf1, nf2, q2, d)

        p = jax.tree_util.tree_map(lambda a: a[..., 0], m.params)
        p = p.replace(raw_lengthscale=m.params.raw_lengthscale[..., 0, :])
        noise0 = p.noise if m.Yvar is None else jnp.mean(m.Yvar[:, 0])

        # stage-1 fantasies at X0 (original units)
        post = m.posterior(X0, observation_noise=True, cache=self.cache)
        Lq = post.scale_tril[0]
        Yf1 = post.mean[:, 0] + self.base1 @ Lq.T  # (nf1, q0)
        Yf1_std = (Yf1 - m.Y_loc[0]) / m.Y_scale[0]

        X_aug1 = jnp.concatenate([m.X, X0], axis=0)
        n1 = X_aug1.shape[0]
        B1 = m._kernel(p, m.X, X0)
        C1 = m._kernel(p, X0, X0) + noise0 * jnp.eye(q0)
        L1 = update_chol(self.cache[0][0], B1, C1)  # O(n^2 q0) border update
        resid1 = jnp.concatenate(
            [jnp.broadcast_to(m.Y[:, 0] - p.mean, (nf1, m.num_train)),
             Yf1_std - p.mean],
            axis=-1,
        )  # (nf1, n1)
        alpha1 = cholesky_solve(L1, resid1.T).T  # (nf1, n1)

        def branch(alpha1_i, resid1_i, X1_i, X2_i, base2_i, best_i):
            # stage-1 fantasy posterior at X1_i (std units)
            Ks = m._kernel(p, X_aug1, X1_i)  # (n1, q1)
            mean1 = p.mean + Ks.T @ alpha1_i  # (q1,)
            V = jax.scipy.linalg.solve_triangular(L1, Ks, lower=True)
            cov1 = m._kernel(p, X1_i, X1_i) - V.T @ V
            cov1 = cov1 + noise0 * jnp.eye(q1)  # observation fantasies
            Lf = psd_safe_cholesky(cov1)
            Yf2_std = mean1 + base2_i @ Lf.T  # (nf2, q1)
            Yf2 = m.Y_loc[0] + m.Y_scale[0] * Yf2_std

            # per-branch second augmentation: border update of L1
            X_aug2 = jnp.concatenate([X_aug1, X1_i], axis=0)
            B2 = m._kernel(p, X_aug1, X1_i)
            C2 = m._kernel(p, X1_i, X1_i) + noise0 * jnp.eye(q1)
            L2 = update_chol(L1, B2, C2)
            resid2 = jnp.concatenate(
                [jnp.broadcast_to(resid1_i, (nf2, n1)), Yf2_std - p.mean],
                axis=-1,
            )  # (nf2, n2)
            alpha2 = cholesky_solve(L2, resid2.T).T  # (nf2, n2)
            best2 = jnp.maximum(jnp.max(Yf2, axis=-1), best_i)  # (nf2,)

            def leaf(alpha2_j, X2_j, best_j):
                Ks2 = m._kernel(p, X_aug2, X2_j)  # (n2, q2)
                mean2 = p.mean + Ks2.T @ alpha2_j
                mean_orig = m.Y_loc[0] + m.Y_scale[0] * mean2
                if self.terminal == "PosteriorMean":
                    return jnp.max(mean_orig)
                v = jax.scipy.linalg.solve_triangular(L2, Ks2, lower=True)
                var = jnp.clip(
                    jnp.diagonal(m._kernel(p, X2_j, X2_j))
                    - jnp.sum(v * v, 0),
                    1e-12,
                ) * jnp.square(m.Y_scale[0])
                sigma = jnp.sqrt(var)
                u = (mean_orig - best_j) / sigma
                return jnp.max(log_ei_helper(u) + jnp.log(sigma))

            return jnp.mean(jax.vmap(leaf)(alpha2, X2_i, best2))

        best1 = jnp.maximum(jnp.max(Yf1, axis=-1), jnp.asarray(self.best_f))
        vals = jax.vmap(branch)(alpha1, resid1, X1, X2, self.base2, best1)
        return jnp.mean(vals)


class qKStepLookahead(struct.PyTreeNode):
    r"""Arbitrary-depth one-shot scenario tree (reference
    `multi_step_lookahead.py:49` with general `batch_sizes=[q0..qK]`,
    `num_fantasies=[nf1..nfK]`).

    Variables are the flattened tree
    `X_full = [X0 (q0) | X1 (nf1, q1) | X2 (nf1, nf2, q2) | ...]`; the
    forward pass recurses through the stages (Python recursion at trace
    time — the tree is static), fantasizing each node's candidate block
    with fixed qMC base draws and `vmap`-ing over its branches, and scores
    every leaf with the terminal value (posterior mean or LogEI). All
    branch posteriors come from per-node augmented Choleskys, so the whole
    tree is one differentiable XLA program for the one-shot L-BFGS ascent.

    `qMultiStepLookahead`/`qThreeStepLookahead` are the hand-unrolled
    K=2/K=3 specializations (kept: they share stage-1 work explicitly).
    """

    model: SingleTaskGP
    cache: tuple
    bases: tuple  # bases[j]: (nf1, .., nf_{j+1}, q_j) stage-(j+1) draws
    best_f: Array = 0.0
    batch_sizes: tuple = struct.field(pytree_node=False, default=(1, 1))
    num_fantasies: tuple = struct.field(pytree_node=False, default=(8,))
    terminal: str = struct.field(pytree_node=False, default="PosteriorMean")

    @property
    def q(self) -> int:
        return self.batch_sizes[0]

    def get_augmented_q_batch_size(self) -> int:
        total, branches = 0, 1
        for k, q in enumerate(self.batch_sizes):
            total += branches * q
            if k < len(self.num_fantasies):
                branches *= self.num_fantasies[k]
        return total

    def extract_candidates(self, X_full: Array) -> Array:
        return X_full[..., : self.batch_sizes[0], :]

    def _split_stages(self, X_full: Array) -> list:
        d = X_full.shape[-1]
        stages, offset, branches = [], 0, ()
        for k, q in enumerate(self.batch_sizes):
            nb = math.prod(branches) if branches else 1
            block = X_full[offset : offset + nb * q]
            stages.append(block.reshape(*branches, q, d))
            offset += nb * q
            if k < len(self.num_fantasies):
                branches = branches + (self.num_fantasies[k],)
        return stages

    def __call__(self, X_full: Array) -> Array:
        m = self.model
        p = jax.tree_util.tree_map(lambda a: a[..., 0], m.params)
        p = p.replace(raw_lengthscale=m.params.raw_lengthscale[..., 0, :])
        noise0 = p.noise if m.Yvar is None else jnp.mean(m.Yvar[:, 0])
        stages = self._split_stages(X_full)
        resid0 = m.Y[:, 0] - p.mean
        # masked (padded) train rows: the cached factor has identity rows
        # there, so zero their residuals and cross-covariances
        mm0 = (
            m.mask.astype(X_full.dtype)
            if m.mask is not None
            else jnp.ones((m.num_train,), X_full.dtype)
        )
        resid0 = resid0 * mm0

        def recurse(j, X_aug, L, mm, resid, best, node_stages, node_bases):
            # `L` is the Cholesky of the observation covariance over
            # `X_aug`, grown per stage by O(|X_aug|^2 q) border updates of
            # the cached train factor — never refactorized.
            Xj = node_stages[0]  # (q_j, d)
            qj = Xj.shape[0]
            alpha = cholesky_solve(L, resid[:, None])[:, 0]
            Ks = m._kernel(p, X_aug, Xj) * mm[:, None]  # (n_aug, q_j)
            mean_j = p.mean + Ks.T @ alpha  # std units
            if len(node_stages) == 1:  # leaf: terminal value
                mean_orig = m.Y_loc[0] + m.Y_scale[0] * mean_j
                if self.terminal == "PosteriorMean":
                    return jnp.max(mean_orig)
                v = jax.scipy.linalg.solve_triangular(L, Ks, lower=True)
                var = jnp.clip(
                    jnp.diagonal(m._kernel(p, Xj, Xj)) - jnp.sum(v * v, 0),
                    1e-12,
                ) * jnp.square(m.Y_scale[0])
                sigma = jnp.sqrt(var)
                u = (mean_orig - best) / sigma
                return jnp.max(log_ei_helper(u) + jnp.log(sigma))

            # fantasize observations at Xj
            V = jax.scipy.linalg.solve_triangular(L, Ks, lower=True)
            cov = m._kernel(p, Xj, Xj) - V.T @ V + noise0 * jnp.eye(qj)
            Lf = psd_safe_cholesky(cov)
            base = node_bases[0]  # (nf, q_j)
            Yf_std = mean_j + base @ Lf.T  # (nf, q_j)
            Yf = m.Y_loc[0] + m.Y_scale[0] * Yf_std

            X_aug2 = jnp.concatenate([X_aug, Xj], axis=0)
            L2 = update_chol(L, Ks, m._kernel(p, Xj, Xj) + noise0 * jnp.eye(qj))
            mm2 = jnp.concatenate([mm, jnp.ones((qj,), mm.dtype)])

            def branch(Yf_std_i, Yf_i, sub_stages, sub_bases):
                resid2 = jnp.concatenate([resid, Yf_std_i - p.mean])
                best2 = jnp.maximum(jnp.max(Yf_i), best)
                return recurse(
                    j + 1, X_aug2, L2, mm2, resid2, best2, sub_stages, sub_bases
                )

            vals = jax.vmap(branch)(
                Yf_std, Yf, list(node_stages[1:]), list(node_bases[1:])
            )
            return jnp.mean(vals)

        return recurse(
            0, m.X, self.cache[0][0], mm0, resid0, jnp.asarray(self.best_f),
            stages, list(self.bases),
        )


def make_k_step(
    model: SingleTaskGP,
    batch_sizes: tuple = (1, 1, 1),
    num_fantasies: tuple = (8, 4),
    best_f: float | Array = 0.0,
    terminal: str = "PosteriorMean",
    seed: int = 0,
) -> qKStepLookahead:
    """General K-stage one-shot lookahead (K = len(batch_sizes) stages,
    len(num_fantasies) = K - 1 branching factors)."""
    assert len(num_fantasies) == len(batch_sizes) - 1
    bases, branches = [], ()
    for k, nf in enumerate(num_fantasies):
        branches = branches + (nf,)
        nb = math.prod(branches)
        z = draw_sobol_normal_samples(batch_sizes[k], nb, seed=seed + k)
        bases.append(z.reshape(*branches, batch_sizes[k]))
    return qKStepLookahead(
        model=model,
        cache=model.train_chol(),
        bases=tuple(bases),
        best_f=jnp.asarray(best_f, jnp.float32),
        batch_sizes=tuple(batch_sizes),
        num_fantasies=tuple(num_fantasies),
        terminal=terminal,
    )


def make_three_step(
    model: SingleTaskGP,
    q0: int = 1,
    q1: int = 1,
    q2: int = 1,
    num_fantasies: tuple = (8, 4),
    best_f: float | Array = 0.0,
    terminal: str = "PosteriorMean",
    seed: int = 0,
) -> qThreeStepLookahead:
    nf1, nf2 = num_fantasies
    z1 = draw_sobol_normal_samples(q0, nf1, seed=seed)
    z2 = draw_sobol_normal_samples(q1 * nf2, nf1, seed=seed + 1)
    return qThreeStepLookahead(
        model=model,
        cache=model.train_chol(),
        base1=z1,
        base2=z2.reshape(nf1, nf2, q1),
        best_f=jnp.asarray(best_f, jnp.float32),
        q0=q0, q1=q1, q2=q2, nf1=nf1, nf2=nf2,
        terminal=terminal,
    )
