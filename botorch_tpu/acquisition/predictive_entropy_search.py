r"""Predictive entropy search (PES) via expectation propagation.

Counterpart of `botorch/acquisition/predictive_entropy_search.py:28`
(`qPredictiveEntropySearch`, [HernandezLobato2014pes]; shared EP machinery
with the MO version, reference
`multi_objective/predictive_entropy_search.py` — 1182 LoC of EP).

Single-objective, q >= 1 implementation (reference
`qPredictiveEntropySearch.forward` handles q-batches the same way — joint
entropy over the q candidate observations):
  1. sample optimizer locations `x*_k` by maximizing pathwise posterior
     draws (the native analogue of the reference's sampling);
  2. for each `x*`, approximate the conditioned process
     `p(f | D, x* = argmax)` with EP over the linear "dominance" factors
     `f(x*) >= f(x_j)` at the training points: each factor is a 1-d
     truncated-Gaussian moment-matching site on the difference
     `d_j = f(x*) - f(x_j)` (fixed-iteration parallel EP, jit-safe);
  3. `PES(X) = H[y_X | D] - mean_k H[y_X | D, EP_k]` with Gaussian
     entropies `0.5 logdet(2 pi e (Sigma_q + sigma^2 I))`; the conditioned
     q x q covariance at `X` is the trailing block of the EP-updated joint
     over `(f(x*), f(X_train), f(X))`.

The EP sites live on difference projections, so the updated covariance is
a rank-limited correction shared across evaluation points — matching the
structure (not the code) of the reference implementation.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from botorch_tpu.models.gp import SingleTaskGP
from botorch_tpu.ops.chol import add_jitter, psd_safe_cholesky
from botorch_tpu.utils.probability import ndtr, phi

Array = jax.Array

_half_log_2pi_e = 0.5 * math.log(2.0 * math.pi * math.e)


def _ep_condition_on_argmax(
    mu: Array, K: Array, num_iters: int = 16, jitter: float = 1e-6
):
    """EP approximation of a Gaussian `(f_0, f_1..f_n) ~ N(mu, K)`
    conditioned on `f_0 >= f_j` for all j (index 0 is the optimizer).

    Parallel EP with sites on the differences `d_j = f_0 - f_j`:
    repeat: cavity moments for each site -> truncated-normal tilted
    moments -> site precision/mean updates -> joint refresh.
    Returns the approximated `(mu_new, K_new)`.
    """
    n1 = mu.shape[0]
    n_sites = n1 - 1
    # site parameters on d_j (natural: precision tau_j, mean-times-prec nu_j)
    tau = jnp.zeros((n_sites,))
    nu = jnp.zeros((n_sites,))

    # projection vectors a_j: d_j = a_j . f, a_j = e_0 - e_j
    A = jnp.concatenate(
        [jnp.ones((n_sites, 1)), -jnp.eye(n_sites)], axis=1
    )  # (n_sites, n1)

    def refresh(tau, nu):
        # K_new = (K^-1 + A^T diag(tau) A)^-1 computed stably via
        # the symmetric form K - K A^T (S + A K A^T)^-1 A K, S = diag(1/tau)
        AK = A @ K  # (s, n1)
        AKA = AK @ A.T  # (s, s)
        S_inv = jnp.diag(tau)
        M = jnp.eye(n_sites) + S_inv @ AKA
        # solve M X = S_inv (A K)  ->  X = M^-1 S_inv A K
        X = jnp.linalg.solve(M, S_inv @ AK)
        K_new = K - AK.T @ X
        mu_new = K_new @ (
            jnp.linalg.solve(add_jitter(K, jitter), mu) + A.T @ nu
        )
        return mu_new, K_new

    def body(carry, _):
        tau, nu = carry
        mu_c, K_c = refresh(tau, nu)
        # current marginal of each d_j
        m_d = A @ mu_c
        v_d = jnp.maximum(jnp.einsum("sn,nm,sm->s", A, K_c, A), 1e-10)
        # cavity: remove site j
        t_cav = jnp.clip(1.0 / v_d - tau, 1e-8)
        v_cav = 1.0 / t_cav
        m_cav = v_cav * (m_d / v_d - nu)
        # tilted moments under the step factor 1[d_j >= 0]
        s_cav = jnp.sqrt(v_cav)
        alpha = m_cav / s_cav
        Z = jnp.clip(ndtr(alpha), 1e-10)
        r = phi(alpha) / Z
        m_tilt = m_cav + s_cav * r
        v_tilt = v_cav * jnp.clip(1.0 - r * (r + alpha), 1e-6, 1.0)
        # site update (damped)
        tau_new = jnp.clip(1.0 / v_tilt - t_cav, 1e-8, 1e8)
        nu_new = m_tilt / v_tilt - m_cav * t_cav
        damp = 0.7
        tau = damp * tau_new + (1 - damp) * tau
        nu = damp * nu_new + (1 - damp) * nu
        return (tau, nu), None

    (tau, nu), _ = jax.lax.scan(body, (tau, nu), None, length=num_iters)
    return refresh(tau, nu), (tau, nu, A)


class qPredictiveEntropySearch(struct.PyTreeNode):
    """PES for a joint `(q, d)` candidate set. Built by `make_pes`."""

    model: SingleTaskGP
    cache: tuple
    X_opt: Array  # (K, d) sampled optimizer locations
    ep_tau: Array  # (K, n+1) EP site precisions (site 0 unused)
    ep_nu: Array  # (K, n+1)

    def __call__(self, X: Array) -> Array:
        m = self.model
        X = jnp.atleast_2d(X)  # (q, d)
        q = X.shape[0]
        Kopt = self.X_opt.shape[0]
        p = jax.tree_util.tree_map(lambda a: a[..., 0], m.params)
        p = p.replace(raw_lengthscale=m.params.raw_lengthscale[..., 0, :])
        noise = (
            jnp.mean(m.Yvar[:, 0]) if m.Yvar is not None else p.noise
        ) * jnp.square(m.Y_scale[0])

        def gaussian_entropy(cov_q: Array) -> Array:
            # joint observation entropy: 0.5 logdet(2 pi e (cov + s^2 I))
            Lc = psd_safe_cholesky(cov_q + noise * jnp.eye(q))
            return q * _half_log_2pi_e + jnp.sum(
                jnp.log(jnp.diagonal(Lc, axis1=-2, axis2=-1))
            )

        post = m.posterior(X, cache=self.cache)
        h0 = gaussian_entropy(post.cov[0])  # original units

        def per_optimum(k):
            x_star = self.X_opt[k]
            # joint over (f(x*), f(X_train), f(X)) latent values
            pts = jnp.concatenate([x_star[None, :], m.X, X], axis=0)
            joint = m.posterior(pts, cache=self.cache)
            K = joint.cov[0]  # original units (posterior de-standardizes)
            n1 = m.num_train + 1
            tau = self.ep_tau[k][: n1 - 1]
            nu = self.ep_nu[k][: n1 - 1]
            # apply stored EP sites over the (x*, train) block, refreshed
            # jointly with the evaluation points appended
            n_sites = n1 - 1
            A = jnp.zeros((n_sites, pts.shape[0]))
            A = A.at[:, 0].set(1.0)
            A = A.at[jnp.arange(n_sites), 1 + jnp.arange(n_sites)].set(-1.0)
            AK = A @ K
            M = jnp.eye(n_sites) + jnp.diag(tau) @ (AK @ A.T)
            Xs = jnp.linalg.solve(M, jnp.diag(tau) @ AK)
            K_new = K - AK.T @ Xs
            return gaussian_entropy(K_new[-q:, -q:])

        hks = jax.vmap(per_optimum)(jnp.arange(Kopt))
        return h0 - jnp.mean(hks)


def make_pes(
    model: SingleTaskGP,
    bounds: Array,
    key: Array,
    num_optima: int = 10,
    num_features: int = 512,
    raw_samples: int = 512,
    maxiter: int = 30,
    ep_iters: int = 16,
) -> qPredictiveEntropySearch:
    """Sample optimizer locations pathwise and precompute EP sites for the
    argmax conditioning at each."""
    from botorch_tpu.sampling.pathwise import draw_matheron_paths
    from botorch_tpu.utils.sampling import optimize_posterior_samples

    paths = draw_matheron_paths(model, key, num_optima, num_features)
    xs = []
    for k in range(num_optima):
        path_k = lambda x: paths(x)[k]
        xk, _ = optimize_posterior_samples(
            path_k, bounds, jax.random.fold_in(key, k),
            raw_samples=raw_samples, num_restarts=2, maxiter=maxiter,
        )
        xs.append(xk)
    X_opt = jnp.stack(xs)
    cache = model.train_chol()

    def ep_for(x_star):
        pts = jnp.concatenate([x_star[None, :], model.X], axis=0)
        joint = model.posterior(pts, cache=cache)
        mu = joint.mean[:, 0]
        K = add_jitter(joint.cov[0], 1e-6)
        (_, _), (tau, nu, _) = _ep_condition_on_argmax(
            mu, K, num_iters=ep_iters
        )
        return tau, nu

    taus, nus = jax.vmap(ep_for)(X_opt)
    return qPredictiveEntropySearch(
        model=model, cache=cache, X_opt=X_opt, ep_tau=taus, ep_nu=nus
    )
