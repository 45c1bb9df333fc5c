r"""Multi-model multi-acquisition portfolio BO (the MMMA research layer).

Counterpart of the fork's `MMMA/` scripts: `baseline.py` (plain loop),
`multi_model_single_acqu.py` (kernel selection by likelihood-weighted
Bayesian model averaging), `GP_Hedge.py` (Exp3-style acquisition bandit),
and `MMMA.py` (both combined: per-iteration kernel BMA x acquisition
hedge; weights `calculate_weights :56-72`, bandit update `:172-179` with
`eta = 0.1` softmax over accumulated gains, reward = posterior mean at the
chosen candidate `:197-199`).

TPU-native framing: the K kernels and A acquisition functions are all fit
and optimized per iteration anyway — here they run as parallel batches
(kernel fits share X/Y; per-acqf `optimize_acqf` restarts batch together),
rather than the fork's sequential Python loops.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from botorch_tpu.acquisition.analytic import make_acqf
from botorch_tpu.fit import fit_gp
from botorch_tpu.models.gp import SingleTaskGP, make_gp
from botorch_tpu.optim.optimize import optimize_acqf

Array = jax.Array

DEFAULT_KERNELS = ("rbf", "matern52", "matern32")
DEFAULT_ACQFS = ("LogEI", "LogPI", "UCB")


def bma_weights(mlls: Array, temperature: float = 1.0) -> Array:
    """Softmax-of-MLL Bayesian-model-averaging weights
    (`MMMA/MMMA.py:56-72`)."""
    z = (mlls - jnp.max(mlls)) / temperature
    w = jnp.exp(z)
    return w / jnp.sum(w)


class HedgeState(NamedTuple):
    gains: Array  # (A,) accumulated gains per acquisition


def hedge_probabilities(state: HedgeState, eta: float = 0.1) -> Array:
    """GP-Hedge selection probabilities (`MMMA/GP_Hedge.py` /
    `MMMA.py:172-179`)."""
    z = eta * (state.gains - jnp.max(state.gains))
    p = jnp.exp(z)
    return p / jnp.sum(p)


def hedge_update(
    state: HedgeState, rewards: Array
) -> HedgeState:
    """Accumulate per-acqf rewards (posterior mean at each acqf's
    candidate, `MMMA.py:197-199`)."""
    return HedgeState(gains=state.gains + rewards)


class ABEState(NamedTuple):
    """Gaussian belief over per-acquisition 'risk' (negative acquisition
    value), the ABEBO selector of `MMMA/test.py:35-117`."""

    risk_mean: Array  # (A,)
    risk_cov: Array  # (A, A)


def abe_init(num_acqfs: int) -> ABEState:
    """Standard-normal prior over acqf risks (`MMMA/test.py:43-44`)."""
    return ABEState(
        risk_mean=jnp.zeros(num_acqfs),
        risk_cov=jnp.eye(num_acqfs),
    )


def abe_update(
    state: ABEState,
    losses: Array,
    key: Array,
    num_samples: int = 10000,
) -> tuple[ABEState, Array]:
    """One Bayesian risk update + probability-of-best weights
    (`MMMA/test.py:89-110`): treat the observed per-acqf losses
    (= negative acquisition values) as a Gaussian observation of the risk
    vector with isotropic precision `1/var(losses)`, conjugate-update the
    belief, then estimate `w_a = P(a = argmin risk)` by MC over the
    posterior. TPU-native: the update is two (A, A) solves and the MC is
    one batched Cholesky sample + one-hot mean — no 10000-iteration host
    loop."""
    A = losses.shape[0]
    # Non-finite losses (an acqf whose every restart failed reports -inf
    # value -> +inf loss) would NaN-poison the conjugate update; clamp
    # them to the worst finite loss so the failed acqf is merely
    # least-preferred this round.
    finite = jnp.isfinite(losses)
    worst = jnp.max(jnp.where(finite, losses, -jnp.inf))
    worst = jnp.where(jnp.isfinite(worst), worst, 0.0)
    losses = jnp.where(finite, losses, worst)
    # ddof=1: the reference uses torch.var's unbiased estimator
    # (`MMMA/test.py:92`).
    prec = 1.0 / jnp.maximum(jnp.var(losses, ddof=1), 1e-12)
    prior_cov_inv = jnp.linalg.inv(state.risk_cov)
    post_cov = jnp.linalg.inv(prior_cov_inv + prec * jnp.eye(A))
    post_mean = post_cov @ (prior_cov_inv @ state.risk_mean + prec * losses)
    L = jnp.linalg.cholesky(
        post_cov + 1e-10 * jnp.eye(A)
    )
    z = jax.random.normal(key, (num_samples, A))
    samples = post_mean + z @ L.T
    best = jnp.argmin(samples, axis=-1)
    weights = jnp.mean(
        jax.nn.one_hot(best, A, dtype=post_mean.dtype), axis=0
    )
    return ABEState(risk_mean=post_mean, risk_cov=post_cov), weights


def abe_propose(
    state: ABEState,
    candidates: Array,
    acq_values: Array,
    key: Array,
    least_risk: bool = False,
    num_samples: int = 10000,
) -> tuple[ABEState, Array]:
    """ABEBO candidate selection (`MMMA/test.py:45-117`): update the risk
    belief with `losses = -acq_values`, then either return the
    probability-of-best weighted convex combination of the per-acqf
    candidates (`ensemble_decision :112-116`) or the current least-risk
    acqf's candidate (`:82-85`)."""
    state, weights = abe_update(state, -acq_values, key, num_samples)
    if least_risk:
        idx = jnp.argmin(state.risk_mean)
        cand = jnp.take(candidates, idx, axis=0)
    else:
        cand = jnp.tensordot(weights, candidates, axes=1)
    return state, cand


class MMMAResult(NamedTuple):
    X: Array
    Y: Array
    best_curve: Array
    chosen_acqf: Array  # (iters,) int indices
    kernel_weights: Array  # (iters, K)


def run_mmma(
    objective: Callable[[Array], Array],
    d: int,
    n_init: int,
    iterations: int,
    key: Array,
    kernels: Sequence[str] = DEFAULT_KERNELS,
    acqf_names: Sequence[str] = DEFAULT_ACQFS,
    eta: float = 0.1,
    num_restarts: int = 2,
    raw_samples: int = 20,
    fit_restarts: int = 2,
    fit_maxiter: int = 50,
    seed: int = 0,
    selection: str = "hedge",
) -> MMMAResult:
    """The combined MMMA loop (`MMMA/MMMA.py:80-200`): per iteration,
    (1) fit one GP per kernel, compute BMA weights from MLLs and pick the
    highest-evidence kernel; (2) optimize every acquisition in the
    portfolio; (3) select one candidate; (4) update the selector state.

    `selection` picks the acquisition-portfolio selector:
    `"hedge"` (Exp3 bandit, `MMMA.py:172-179`), `"random"` (uniform,
    `acq_weight='random'` in `MMMA/test.py:176`), `"abe"` (ABEBO
    probability-of-best ensemble blend, `MMMA/test.py:45-116`), or
    `"abe_least_risk"` (`use_least_risk=True`, `MMMA/test.py:82-85`).
    For the ABE modes `chosen_acqf` records the least-risk index.

    `objective: (q, d) -> (q,)`, maximization on the unit cube.
    """
    if selection not in ("hedge", "random", "abe", "abe_least_risk"):
        raise ValueError(f"unknown selection {selection!r}")
    from botorch_tpu.sampling.sobol import draw_sobol, sobol_table

    sv, shift = sobol_table(d, scramble=True, seed=seed)
    X = draw_sobol(sv, shift, n_init)
    Y = objective(X)
    hedge = HedgeState(gains=jnp.zeros(len(acqf_names)))
    abe = abe_init(len(acqf_names))
    ub = jnp.stack([jnp.zeros(d), jnp.ones(d)])

    best_curve, chosen, kw_hist = [], [], []
    for it in range(iterations):
        key, k_fit, k_acq, k_pick = jax.random.split(key, 4)
        # (1) kernel BMA
        models, mlls = [], []
        for ki, kern in enumerate(kernels):
            mdl = fit_gp(
                make_gp(X, Y[:, None], kernel=kern),
                jax.random.fold_in(k_fit, ki),
                num_restarts=fit_restarts,
                maxiter=fit_maxiter,
            )
            models.append(mdl)
            mlls.append(mdl.mll())
        w = bma_weights(jnp.stack(mlls))
        kw_hist.append(w)
        model = models[int(jnp.argmax(w))]

        # (2) per-acqf candidates
        cands, vals = [], []
        for ai, name in enumerate(acqf_names):
            kwargs = {"best_f": Y.max()} if name in ("EI", "LogEI", "PI", "LogPI") else {}
            acqf = make_acqf(name, model, **kwargs)
            cand, val = optimize_acqf(
                acqf, ub, q=1,
                num_restarts=num_restarts, raw_samples=raw_samples,
                key=jax.random.fold_in(k_acq, ai), seed=seed * 1000 + it,
            )
            cands.append(cand)
            vals.append(val)
        cands = jnp.stack(cands)  # (A, 1, d)

        # (3) candidate selection
        if selection == "hedge":
            p = hedge_probabilities(hedge, eta)
            a_idx = int(jax.random.choice(k_pick, len(acqf_names), p=p))
            x_new = cands[a_idx]
        elif selection == "random":
            a_idx = int(jax.random.choice(k_pick, len(acqf_names)))
            x_new = cands[a_idx]
        else:  # ABEBO ensemble / least-risk
            abe, x_new = abe_propose(
                abe, cands, jnp.stack(vals).reshape(-1), k_pick,
                least_risk=(selection == "abe_least_risk"),
            )
            a_idx = int(jnp.argmin(abe.risk_mean))
        chosen.append(a_idx)
        y_new = objective(x_new)
        X = jnp.concatenate([X, x_new])
        Y = jnp.concatenate([Y, y_new])

        # (4) hedge rewards = posterior mean at every acqf's candidate
        # (only the hedge selector reads this state — skip the extra
        # posterior solve otherwise)
        if selection == "hedge":
            post = model.posterior(cands[:, 0, :])
            rewards = post.mean[..., 0]
            if rewards.ndim > 1:
                rewards = rewards.mean(axis=tuple(range(rewards.ndim - 1)))
            hedge = hedge_update(hedge, rewards)
        best_curve.append(Y.max())

    return MMMAResult(
        X=X,
        Y=Y,
        best_curve=jnp.stack(best_curve),
        chosen_acqf=jnp.asarray(chosen),
        kernel_weights=jnp.stack(kw_hist),
    )


class MMMAMetrics(NamedTuple):
    gap: Array  # (iters,) in [0, 1]
    simple_regret: Array  # (iters,)
    cumulative_regret: Array  # (iters,) running sum of per-eval regret


def mmma_metrics(result: MMMAResult, true_max: float, n_init: int) -> MMMAMetrics:
    """The reference's MMMA tracking metrics (`MMMA/MMMA.py:77,190-195`):
    gap = (best_found - best_init) / (true_max - best_init), simple regret
    of the incumbent, and cumulative regret of the evaluated points."""
    true_max = jnp.asarray(true_max, jnp.float32)
    best_init = jnp.max(result.Y[:n_init])
    denom = jnp.maximum(true_max - best_init, 1e-12)
    gap = jnp.clip((result.best_curve - best_init) / denom, 0.0, 1.0)
    simple = true_max - result.best_curve
    cumulative = jnp.cumsum(true_max - result.Y[n_init:])
    return MMMAMetrics(
        gap=gap, simple_regret=simple, cumulative_regret=cumulative
    )
