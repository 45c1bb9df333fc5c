r"""Multi-objective joint / predictive entropy search (MO-JES, MO-PES).

Counterparts of the reference's
`botorch/acquisition/multi_objective/joint_entropy_search.py:256`
(`qLowerBoundMultiObjectiveJointEntropySearch`, [Tu2022jes]) and
`botorch/acquisition/multi_objective/predictive_entropy_search.py:40`
(`qMultiObjectivePredictiveEntropySearch`, 1182 LoC of EP machinery).

Both acquisitions measure the information a candidate observation carries
about the Pareto-optimal set/front. Pareto samples come from joint
pathwise (Matheron) posterior draws over a Sobol grid — the native
analogue of the reference's `sample_optimal_points` NSGA-II pipeline.

MO-JES (`make_mo_jes`): conditions the independent-output posterior on the
sampled front values `f(X*) = Y*` exactly (rank-P Gaussian conditioning per
output, precomputed from the joint train-cache posterior), then evaluates
the entropy of the conditioned marginal truncated to the dominated region
of the sampled front — a disjoint cell union (2-d staircase / [Lacour17]
general-m), the same closed form the reference's `_compute_entropy_noiseless`
estimator integrates cell-by-cell (`joint_entropy_search.py:459-523`).

MO-PES (`make_mo_pes`): expectation propagation over the non-dominance
factors  `Omega_ij = 1 - prod_m 1[f_m(x_j) >= f_m(x*_i)]`  ("no other point
dominates a Pareto point"), with diagonal Gaussian sites on the difference
vectors `u_ijm = f_m(x*_i) - f_m(x_j)`. Sites are fit by fixed-iteration
parallel EP (jit-safe; damped), stored, and re-applied jointly with the
evaluation point at acquisition time; the evaluation point gets its own
single-pass site update (the reference iterates the same factor set to
convergence with dynamic damping — fixed iterations are the TPU-native
equivalent). Tilted moments use autodiff of the exact log-partition
`log(1 - exp(sum_m log Phi(-alpha_m)))` instead of hand-derived updates
(`predictive_entropy_search.py:671-897` semantics).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import struct

from botorch_tpu.models.gp import SingleTaskGP
from botorch_tpu.ops.chol import (
    add_jitter,
    chol_logdet,
    cholesky_solve,
    psd_safe_cholesky,
)
from botorch_tpu.utils.probability import log_ndtr, ndtr, phi
from botorch_tpu.utils.safe_math import log1mexp

Array = jax.Array

_half_log_2pi_e = 0.5 * math.log(2.0 * math.pi * math.e)
_half_log_2pi = 0.5 * math.log(2.0 * math.pi)
_NEG = -1e8


# ====================================================================== #
# Shared: Pareto sampling from pathwise draws
# ====================================================================== #
def sample_pareto_points(
    model: SingleTaskGP,
    bounds: Array,
    key: Array,
    num_samples: int,
    num_points: int,
    grid_size: int = 512,
    num_features: int = 512,
):
    """Sample `num_samples` Pareto sets of exactly `num_points` points from
    joint pathwise draws over a Sobol grid (host-side, like the reference's
    `random_search_optimizer`, `multi_objective/utils.py`).

    Returns `(X_star (K, P, d), Y_star (K, P, m), mask (K, P))` — fronts
    with fewer than P non-dominated points are padded (mask 0).
    """
    import numpy as np

    from botorch_tpu.models.model_list import batched_to_model_list
    from botorch_tpu.sampling.pathwise import draw_matheron_paths
    from botorch_tpu.sampling.sobol import draw_sobol, sobol_table
    from botorch_tpu.utils.multi_objective import is_non_dominated

    m_out = model.num_outputs
    d = bounds.shape[-1]
    sv, shift = sobol_table(d, scramble=True, seed=int(key[-1]) & 0x7FFFFFFF)
    grid = bounds[0] + (bounds[1] - bounds[0]) * draw_sobol(sv, shift, grid_size)

    ml = batched_to_model_list(model)
    keys = jax.random.split(key, m_out)
    Ys = [
        np.asarray(
            draw_matheron_paths(ml.models[o], keys[o], num_samples, num_features)(grid)
        )
        for o in range(m_out)
    ]
    grid_np = np.asarray(grid)

    X_star = np.zeros((num_samples, num_points, d), np.float32)
    Y_star = np.zeros((num_samples, num_points, m_out), np.float32)
    mask = np.zeros((num_samples, num_points), np.float32)
    rng = np.random.default_rng(int(key[0]) & 0x7FFFFFFF)
    for s in range(num_samples):
        Y = np.stack([Ys[o][s] for o in range(m_out)], axis=-1)
        nd = np.asarray(is_non_dominated(jnp.asarray(Y)))
        idx = np.nonzero(nd)[0]
        if len(idx) > num_points:
            idx = rng.choice(idx, num_points, replace=False)
        k = len(idx)
        X_star[s, :k] = grid_np[idx]
        Y_star[s, :k] = Y[idx]
        mask[s, :k] = 1.0
        if k < num_points:  # pad with the first pareto point (masked out)
            X_star[s, k:] = grid_np[idx[0]]
            Y_star[s, k:] = Y[idx[0]]
    return jnp.asarray(X_star), jnp.asarray(Y_star), jnp.asarray(mask)


def _front_cells(Y_star, mask, m_out: int):
    """Dominated-region cells (lower, upper) for each sampled front, padded
    to a common cell count (host-side)."""
    import numpy as np

    from botorch_tpu.utils.multi_objective import dominated_hypercell_bounds_np

    K = Y_star.shape[0]
    Yn = np.asarray(Y_star)
    Mn = np.asarray(mask).astype(bool)
    los, ups = [], []
    for s in range(K):
        front = Yn[s][Mn[s]]
        if m_out == 2:
            order = np.argsort(front[:, 0])
            f1, f2 = front[order, 0], front[order, 1]
            lo = np.stack(
                [np.concatenate([[_NEG], f1[:-1]]), np.full(len(f1), _NEG)], -1
            )
            up = np.stack([f1, f2], -1)
        else:
            lo, up = dominated_hypercell_bounds_np(front, np.full(m_out, _NEG))
        los.append(np.asarray(lo, np.float32))
        ups.append(np.asarray(up, np.float32))
    C = max(len(lo) for lo in los)
    L = np.full((K, C, m_out), _NEG, np.float32)
    U = np.full((K, C, m_out), _NEG, np.float32)
    for s in range(K):
        L[s, : len(los[s])] = los[s]
        U[s, : len(ups[s])] = ups[s]
    return jnp.asarray(L), jnp.asarray(U)


def _output_noise(model: SingleTaskGP) -> Array:
    """Per-output observation noise in ORIGINAL units^2, (m,)."""
    if model.Yvar is not None:
        nz = jnp.mean(model.Yvar, axis=-2)
    else:
        nz = model.params.noise
    return nz * jnp.square(model.Y_scale)


def _entropy_cells_noisy(mu, sigma2, noise, lower, upper):
    """The reference's noiseless-observation conditional-entropy estimator
    (`_compute_entropy_noiseless`, `joint_entropy_search.py:459-523`):
    exact entropy of `N(mu, diag(sigma2))` truncated to the disjoint cell
    union, with the log-variance term widened by the observation noise.
    `mu, sigma2, noise: (m,)`, `lower/upper: (C, m)`."""
    sigma = jnp.sqrt(jnp.clip(sigma2, 1e-12))
    a = jnp.clip((lower - mu) / sigma, -12.0, 12.0)
    b = jnp.clip((upper - mu) / sigma, -12.0, 12.0)
    Wjm = jnp.clip(ndtr(b) - ndtr(a), 0.0)
    Vjm = b * phi(b) - a * phi(a)
    w = jnp.prod(Wjm, axis=-1)  # (C,)
    W = jnp.clip(jnp.sum(w), 1e-30, 1.0)
    tiny = 1e-10
    Wjm_safe = jnp.where(Wjm > tiny, Wjm, 1.0)
    ratio = jnp.sum(
        jnp.where(
            (w[:, None] > tiny) & (Wjm > tiny),
            0.5 * w[:, None] * (Vjm / Wjm_safe),
            0.0,
        )
    ) / W
    log_term = 0.5 * jnp.sum(jnp.log(sigma2 + noise)) + jnp.log(W)
    add_term = mu.shape[-1] * (_half_log_2pi + 0.5)
    return add_term + log_term + ratio


# ====================================================================== #
# MO-JES
# ====================================================================== #
def _joint_entropy_with_noise(cov: Array, noise: Array) -> Array:
    """Joint entropy of the q-point, independent-output Gaussian
    observation `y`: `cov (m, q, q)` latent covariance + per-output noise."""
    q = cov.shape[-1]

    def one(o):
        C = cov[o] + noise[o] * jnp.eye(q)
        L = psd_safe_cholesky(C)
        return q * _half_log_2pi_e + 0.5 * chol_logdet(L)

    return jnp.sum(jax.vmap(one)(jnp.arange(cov.shape[0])))


class qMultiObjectiveJointEntropySearch(struct.PyTreeNode):
    """MO-JES. Built by `make_mo_jes`. For `q > 1` candidates the
    conditional entropy uses the reference's only-diagonal ("LB2")
    estimator (`joint_entropy_search.py:526+`): per-candidate truncated
    marginal entropies summed over the q-batch, subtracted from the exact
    joint initial entropy."""

    model: SingleTaskGP
    cache: tuple
    X_star: Array  # (K, P, d)
    Y_star: Array  # (K, P, m)
    pmask: Array  # (K, P)
    cell_lower: Array  # (K, C, m)
    cell_upper: Array  # (K, C, m)

    def __call__(self, X: Array) -> Array:
        m = self.model
        noise = _output_noise(m)
        X = jnp.atleast_2d(X)  # (q, d)
        q = X.shape[0]
        post = m.posterior(X, cache=self.cache)
        h0 = _joint_entropy_with_noise(post.cov, noise)

        def per_front(xs, ys, pm, lo, up):
            P = xs.shape[0]
            pts = jnp.concatenate([xs, X], axis=0)
            joint = m.posterior(pts, cache=self.cache)
            mean = joint.mean  # (P+q, m)
            cov = joint.cov  # (m, P+q, P+q)

            def per_output(o):
                # condition on NOISY front observations: float32-robust
                # (noiseless conditioning on near-interpolated path values
                # is ill-posed at lengthscale extremes; the reference is
                # float64-first and conditions noiselessly)
                S = cov[o, :P, :P] + noise[o] * jnp.eye(P)
                # decouple padded pareto entries: identity rows/cols
                pair = pm[:, None] * pm[None, :]
                S = S * pair + (1.0 - pair) * jnp.eye(P)
                C = cov[o, :P, P:] * pm[:, None]  # (P, q)
                resid = (ys[:, o] - mean[:P, o]) * pm
                L = psd_safe_cholesky(S)
                W = cholesky_solve(L, C)  # (P, q)
                mu_c = mean[P:, o] + W.T @ resid  # (q,)
                v_c = jnp.diagonal(cov[o, P:, P:]) - jnp.sum(C * W, axis=0)
                return mu_c, jnp.clip(v_c, 1e-12)

            mus, vs = jax.vmap(per_output)(jnp.arange(m.num_outputs))
            # (m, q) -> per-candidate cell-truncated entropies, summed
            def per_candidate(j):
                return _entropy_cells_noisy(mus[:, j], vs[:, j], noise, lo, up)

            return jnp.sum(jax.vmap(per_candidate)(jnp.arange(q)))

        hks = jax.vmap(per_front)(
            self.X_star, self.Y_star, self.pmask, self.cell_lower, self.cell_upper
        )
        return h0 - jnp.mean(hks)


def make_mo_jes(
    model: SingleTaskGP,
    bounds: Array,
    key: Array,
    num_pareto_samples: int = 8,
    num_pareto_points: int = 10,
    grid_size: int = 512,
    num_features: int = 512,
) -> qMultiObjectiveJointEntropySearch:
    """Sample Pareto sets pathwise and build MO-JES."""
    X_star, Y_star, mask = sample_pareto_points(
        model, bounds, key, num_pareto_samples, num_pareto_points,
        grid_size, num_features,
    )
    lo, up = _front_cells(Y_star, mask, model.num_outputs)
    return qMultiObjectiveJointEntropySearch(
        model=model,
        cache=model.train_chol(),
        X_star=X_star,
        Y_star=Y_star,
        pmask=mask,
        cell_lower=lo,
        cell_upper=up,
    )


def compute_sample_box_decomposition(
    pareto_fronts: Array, maximize: bool = True
) -> Array:
    """Public counterpart of the reference
    `multi_objective/utils.py:164` `compute_sample_box_decomposition`:
    per-sample dominated-region hypercell bounds for
    `pareto_fronts (K, P, M)`, padded to a common box count `J`. Returns
    `(K, 2, J, M)` stacked `[lower, upper]` bounds (the reference's layout,
    without the constraint padding)."""
    K, P, M = pareto_fronts.shape
    sign = 1.0 if maximize else -1.0
    mask = jnp.ones((K, P))
    lo, up = _front_cells(sign * pareto_fronts, mask, M)
    return jnp.stack([sign * lo, sign * up], axis=1) if maximize else jnp.stack(
        [sign * up, sign * lo], axis=1
    )


# ====================================================================== #
# MESMO-LB: lower-bound multi-objective max-value entropy search
# ====================================================================== #
class qLowerBoundMultiObjectiveMaxValueEntropy(struct.PyTreeNode):
    """Lower-bound MO max-value entropy search (reference
    `multi_objective/max_value_entropy_search.py:189`
    `qLowerBoundMultiObjectiveMaxValueEntropySearch`): mutual information
    between the observation and the sampled Pareto FRONT (objective
    values only — no conditioning on the optimal inputs, unlike MO-JES).

    `H[y] - E_front H[y | f in dominated(front)]` with the truncated
    entropy evaluated cell-by-cell over the dominated-region box
    decomposition (the reference's "LB" estimator)."""

    model: SingleTaskGP
    cache: tuple
    cell_lower: Array  # (K, C, m)
    cell_upper: Array  # (K, C, m)

    def __call__(self, X: Array) -> Array:
        m = self.model
        noise = _output_noise(m)
        X = jnp.atleast_2d(X)
        q = X.shape[0]
        post = m.posterior(X, cache=self.cache)
        h0 = _joint_entropy_with_noise(post.cov, noise)
        mean = post.mean  # (q, m)
        var = jnp.clip(
            jnp.diagonal(post.cov, axis1=-2, axis2=-1).T, 1e-12
        )  # (q, m)

        def per_front(lo, up):
            def per_candidate(j):
                return _entropy_cells_noisy(mean[j], var[j], noise, lo, up)

            return jnp.sum(jax.vmap(per_candidate)(jnp.arange(q)))

        hks = jax.vmap(per_front)(self.cell_lower, self.cell_upper)
        return h0 - jnp.mean(hks)


def make_mesmo_lb(
    model: SingleTaskGP,
    bounds: Array,
    key: Array,
    num_pareto_samples: int = 8,
    num_pareto_points: int = 10,
    grid_size: int = 512,
    num_features: int = 512,
) -> qLowerBoundMultiObjectiveMaxValueEntropy:
    """Sample Pareto fronts pathwise and build the LB MO-MES acqf."""
    _, Y_star, mask = sample_pareto_points(
        model, bounds, key, num_pareto_samples, num_pareto_points,
        grid_size, num_features,
    )
    lo, up = _front_cells(Y_star, mask, model.num_outputs)
    return qLowerBoundMultiObjectiveMaxValueEntropy(
        model=model,
        cache=model.train_chol(),
        cell_lower=lo,
        cell_upper=up,
    )


# ====================================================================== #
# MO-PES
# ====================================================================== #
def _site_logZ(m_cav: Array, s_cav: Array) -> Array:
    """Log-partition of the non-dominance factor
    `1 - prod_m 1[u_m <= 0]` under an independent Gaussian cavity
    `u ~ N(m_cav, s_cav^2)` (point j dominates pareto point i iff every
    difference `u_m = f_m(i) - f_m(j) <= 0`)."""
    q = jnp.sum(log_ndtr(-m_cav / s_cav))
    return log1mexp(jnp.minimum(q, -1e-10))


def _tilted_updates(m_cav, v_cav):
    """Tilted mean/variance per dimension via autodiff of the exact
    log-partition (replaces the reference's hand-derived `_update_omega`,
    `predictive_entropy_search.py:671-839`)."""
    s_cav = jnp.sqrt(v_cav)
    g1 = jax.grad(_site_logZ)(m_cav, s_cav)
    h_diag = jnp.diagonal(jax.jacfwd(jax.grad(_site_logZ))(m_cav, s_cav))
    m_tilt = m_cav + v_cav * g1
    v_tilt = jnp.clip(v_cav + jnp.square(v_cav) * h_diag, 1e-8)
    return m_tilt, v_tilt


def _ep_refresh(K0: Array, mu0: Array, A: Array, tau: Array, nu: Array, jitter=1e-6):
    """Joint refresh for one objective: apply diagonal sites `(tau, nu)` on
    projections `A f` to the prior `N(mu0, K0)`; returns `(mu_new, K_new)`
    via the symmetric Woodbury form (as in the single-objective PES)."""
    AK = A @ K0
    M = jnp.eye(A.shape[0]) + tau[:, None] * (AK @ A.T)
    X = jnp.linalg.solve(M, tau[:, None] * AK)
    K_new = K0 - AK.T @ X
    mu_new = K_new @ (jnp.linalg.solve(add_jitter(K0, jitter), mu0) + A.T @ nu)
    return mu_new, K_new


class qMultiObjectivePredictiveEntropySearch(struct.PyTreeNode):
    """MO-PES. Built by `make_mo_pes`. For `q > 1` the candidate block's
    q x q conditioned covariance gets the exact joint update from all
    `P x q` single-pass test-point sites ("no candidate dominates any
    Pareto point"), and the conditional entropy is its joint log-det."""

    model: SingleTaskGP
    cache: tuple
    X_star: Array  # (K, P, d)
    pmask: Array  # (K, P)
    ep_tau: Array  # (K, n_sites, m)
    ep_nu: Array  # (K, n_sites, m)
    site_i: Array = struct.field(pytree_node=False, default=None)  # (n_sites,)
    site_j: Array = struct.field(pytree_node=False, default=None)  # (n_sites,)

    def __call__(self, X: Array) -> Array:
        m = self.model
        noise = _output_noise(m)
        X = jnp.atleast_2d(X)  # (q, d)
        q = X.shape[0]
        post = m.posterior(X, cache=self.cache)
        h0 = _joint_entropy_with_noise(post.cov, noise)
        P = self.X_star.shape[1]
        n = m.num_train
        n_pts = P + n + q  # [pareto | train | candidates]
        si = jnp.asarray(self.site_i)
        sj = jnp.asarray(self.site_j)
        n_sites = si.shape[0]
        A = jnp.zeros((n_sites, n_pts))
        A = A.at[jnp.arange(n_sites), si].set(1.0)
        A = A.at[jnp.arange(n_sites), sj].add(-1.0)
        # test-site projections: u_{ij} = f(x*_i) - f(x_j) for each
        # (pareto i, candidate j) pair
        ti = jnp.repeat(jnp.arange(P), q)
        tj = P + n + jnp.tile(jnp.arange(q), P)
        n_test = P * q
        At = jnp.zeros((n_test, n_pts))
        At = At.at[jnp.arange(n_test), ti].set(1.0)
        At = At.at[jnp.arange(n_test), tj].add(-1.0)

        def per_front(xs, pm, tau_k, nu_k):
            pts = jnp.concatenate([xs, m.X, X], axis=0)
            joint = m.posterior(pts, cache=self.cache)

            def per_output(o):
                mu0 = joint.mean[:, o]
                K0 = add_jitter(joint.cov[o], 1e-6)
                mu_c, K_c = _ep_refresh(K0, mu0, A, tau_k[:, o], nu_k[:, o])
                # cavity moments of the test differences under the
                # EP-conditioned joint
                m_u = (At @ mu_c) * pm[ti]
                v_u = jnp.clip(
                    jnp.einsum("sn,nm,sm->s", At, K_c, At), 1e-8
                )
                return m_u, v_u, mu_c, K_c

            m_us, v_us, mu_cs, K_cs = jax.vmap(per_output)(
                jnp.arange(m.num_outputs)
            )
            # moment-match each test factor (i, j) across objectives: the
            # candidate x_j must not dominate pareto point x*_i
            def per_site(s):
                m_cav = m_us[:, s]
                v_cav = v_us[:, s]
                m_tilt, v_tilt = _tilted_updates(m_cav, v_cav)
                t_new = jnp.clip(1.0 / v_tilt - 1.0 / v_cav, 0.0, 1e6)
                return t_new  # (m,)

            t_sites = jax.vmap(per_site)(jnp.arange(n_test))  # (n_test, m)
            t_sites = t_sites * pm[ti][:, None]

            # exact joint update of the candidate block per objective:
            # K_upd = K - K At^T (I + T At K At^T)^-1 T At K,  T = diag(t)
            def upd_o(o):
                K_c = K_cs[o]
                t = t_sites[:, o]
                AK = At @ K_c  # (n_test, n_pts)
                M = jnp.eye(n_test) + t[:, None] * (AK @ At.T)
                Z = jnp.linalg.solve(M, t[:, None] * AK)
                K_upd = K_c - AK.T @ Z
                Kxx = K_upd[P + n :, P + n :] + noise[o] * jnp.eye(q)
                L = psd_safe_cholesky(Kxx)
                return q * _half_log_2pi_e + 0.5 * chol_logdet(L)

            return jnp.sum(jax.vmap(upd_o)(jnp.arange(m.num_outputs)))

        hks = jax.vmap(per_front)(self.X_star, self.pmask, self.ep_tau, self.ep_nu)
        return h0 - jnp.mean(hks)


def make_mo_pes(
    model: SingleTaskGP,
    bounds: Array,
    key: Array,
    num_pareto_samples: int = 8,
    num_pareto_points: int = 8,
    grid_size: int = 512,
    num_features: int = 512,
    ep_iters: int = 16,
    damp: float = 0.7,
) -> qMultiObjectivePredictiveEntropySearch:
    """Sample Pareto sets pathwise and fit EP sites for the non-dominance
    conditioning over [pareto | train] points for each sample."""
    import numpy as np

    X_star, _, pmask = sample_pareto_points(
        model, bounds, key, num_pareto_samples, num_pareto_points,
        grid_size, num_features,
    )
    P = num_pareto_points
    n = model.num_train
    m_out = model.num_outputs

    # factor index set: (pareto i, other j) over [pareto | train], j != i
    si, sj = [], []
    for i in range(P):
        for j in range(P + n):
            if j != i:
                si.append(i)
                sj.append(j)
    site_i = np.asarray(si, np.int32)
    site_j = np.asarray(sj, np.int32)
    n_sites = len(site_i)

    cache = model.train_chol()

    def fit_ep(xs, pm):
        pts = jnp.concatenate([xs, model.X], axis=0)  # (P+n, d)
        joint = model.posterior(pts, cache=cache)
        n_pts = P + n
        A = jnp.zeros((n_sites, n_pts))
        A = A.at[jnp.arange(n_sites), site_i].set(1.0)
        A = A.at[jnp.arange(n_sites), site_j].add(-1.0)
        # mask: disable sites whose pareto point (or pareto j) is padding
        smask = pm[site_i] * jnp.where(site_j < P, pm[site_j], 1.0)

        def per_output(o):
            mu0 = joint.mean[:, o]
            K0 = add_jitter(joint.cov[o], 1e-6)
            return mu0, K0

        mu0s, K0s = jax.vmap(per_output)(jnp.arange(m_out))

        def body(carry, _):
            tau, nu = carry  # (n_sites, m)

            def refresh_o(o):
                mu_c, K_c = _ep_refresh(K0s[o], mu0s[o], A, tau[:, o], nu[:, o])
                m_d = A @ mu_c
                v_d = jnp.clip(
                    jnp.einsum("sn,nm,sm->s", A, K_c, A), 1e-10
                )
                return m_d, v_d

            m_ds, v_ds = jax.vmap(refresh_o)(jnp.arange(m_out))  # (m, n_sites)
            m_d = m_ds.T  # (n_sites, m)
            v_d = v_ds.T
            t_cav = jnp.clip(1.0 / v_d - tau, 1e-8)
            v_cav = 1.0 / t_cav
            m_cav = v_cav * (m_d / v_d - nu)
            m_tilt, v_tilt = jax.vmap(_tilted_updates)(m_cav, v_cav)
            tau_new = jnp.clip(1.0 / v_tilt - t_cav, 1e-8, 1e8)
            nu_new = m_tilt / v_tilt - m_cav * t_cav
            tau = (damp * tau_new + (1 - damp) * tau) * smask[:, None]
            nu = (damp * nu_new + (1 - damp) * nu) * smask[:, None]
            return (tau, nu), None

        init = (jnp.zeros((n_sites, m_out)), jnp.zeros((n_sites, m_out)))
        (tau, nu), _ = jax.lax.scan(body, init, None, length=ep_iters)
        return tau, nu

    taus, nus = jax.vmap(fit_ep)(X_star, pmask)
    return qMultiObjectivePredictiveEntropySearch(
        model=model,
        cache=cache,
        X_star=X_star,
        pmask=pmask,
        ep_tau=taus,
        ep_nu=nus,
        site_i=tuple(int(v) for v in site_i),
        site_j=tuple(int(v) for v in site_j),
    )
