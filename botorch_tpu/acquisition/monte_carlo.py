r"""Monte-Carlo (quasi-MC, SAA) acquisition functions.

Counterpart of `botorch/acquisition/monte_carlo.py` (template :144, qEI
:333, qNEI :417, qPI :648, qSimpleRegret :734, qUCB :801) and
`botorch/acquisition/logei.py` (qLogEI :138, qLogNEI :237).

The central design (as in the reference's
`SampleReducingMCAcquisitionFunction`) is
`forward = sample_reduction(q_reduction(constraint_weight(sample_forward(obj))))`
over reparameterized posterior samples. The SAA contract — base samples are
FIXED across optimizer iterations so the acquisition surface is
deterministic and differentiable — is satisfied structurally here: base
samples are drawn once (scrambled-Sobol qMC through the native engine) at
construction and stored in the acqf pytree (`sampling/base.py:33` +
`posteriors/gpytorch.py:85-126` semantics). Because each acqf instance
evaluates ONE `(q, d)` candidate set and is batched by `vmap`, the same
base samples are shared across all t-batches — exactly the reference's
collapsed-base-sample rule (`sampling/base.py` `_get_collapsed_shape`).

For qNEI/qLogNEI the joint posterior over `(X_baseline, X)` is evaluated
with a bordered-Cholesky update of the cached baseline root — the
`cache_root=True` path (`acquisition/cached_cholesky.py:94-130`) — so the
per-iteration cost is `O(nb^2 q)`, not `O((nb+q)^3)`; baseline samples are
a deterministic function of the fixed base samples, making the per-sample
incremental best consistent across calls.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

from botorch_tpu.models.gp import SingleTaskGP
from botorch_tpu.posteriors.gaussian import GaussianPosterior
from botorch_tpu.sampling.sobol import draw_sobol_normal_samples
from botorch_tpu.utils import safe_math as sm

Array = jax.Array

TAU_RELU = 1e-6
TAU_MAX = 1e-2
DEFAULT_MC_SAMPLES = 512  # reference `acquisition/acquisition.py:116`


def _reduce(val: Array, log: bool = False) -> Array:
    """Reduce ensemble (MCMC) batch dims: mean / logmeanexp (reference
    `utils/transforms.py:292-296`)."""
    if val.ndim == 0:
        return val
    axes = tuple(range(val.ndim))
    return sm.logmeanexp(val, axis=axes) if log else jnp.mean(val)


def identity_objective(samples: Array) -> Array:
    """Default MC objective: first output (`objective.py:288`)."""
    return samples[..., 0]


def linear_objective(weights: Array) -> Callable[[Array], Array]:
    """`LinearMCObjective` (`objective.py:301`)."""

    def obj(samples: Array) -> Array:
        return jnp.sum(samples * weights, axis=-1)

    return obj


def smoothed_feasibility_log_indicator(
    constraints, samples: Array, eta: float, fat: bool = True
) -> Array:
    """Sum of log smooth step functions of `-constraint/eta` (feasible iff
    `c(x) <= 0`); reference `utils/objective.py`
    `compute_smoothed_feasibility_indicator` with `log=True`."""
    step = sm.log_fatmoid if fat else sm.logexpit
    total = 0.0
    for c in constraints:
        total = total + step(-c(samples) / eta)
    return total


class MCAcquisitionFunction(struct.PyTreeNode):
    """Base: model + cached train root + fixed qMC base samples.

    `base_samples`: `(num_mc, q_total, m)` standard normals, where
    `q_total = q` (+ `n_baseline` for noisy variants).
    """

    model: SingleTaskGP
    cache: tuple  # (L, alpha, Linv) = model.train_chol()
    base_samples: Array
    objective: Callable = struct.field(pytree_node=False, default=identity_objective)
    constraints: tuple = struct.field(pytree_node=False, default=())
    eta: float = struct.field(pytree_node=False, default=1e-3)
    X_pending: Optional[Array] = None

    # -- pieces ---------------------------------------------------------- #
    def _with_pending(self, X: Array) -> Array:
        if self.X_pending is None:
            return X
        return jnp.concatenate([X, self.X_pending], axis=-2)

    def _samples_and_obj(self, X: Array) -> tuple[Array, Array]:
        """Posterior samples `(nmc, [S,] q, m)` and objective values
        `(nmc, [S,] q)` — `S` present for ensemble (fully-Bayesian) models,
        with base samples SHARED across ensemble members (the collapsed
        base-sample rule over the MCMC dim, reference
        `sampling/get_sampler.py` + `posteriors/fully_bayesian.py`)."""
        post = self.model.posterior(X, cache=self.cache)
        base = self.base_samples
        extra = len(post.batch_shape)
        if extra:
            nmc, q, m = base.shape
            base = base.reshape(nmc, *([1] * extra), q, m)
        samples = post.rsample_from_base_samples(base)
        if getattr(self.objective, "needs_X", False):
            # point-dependent objectives (PenalizedMCObjective semantics,
            # reference penalized.py:297) receive the candidate set too
            return samples, self.objective(samples, X)
        return samples, self.objective(samples)

    def _log_feas(self, samples: Array) -> Array:
        if not self.constraints:
            return jnp.zeros(samples.shape[:-1], samples.dtype)
        return smoothed_feasibility_log_indicator(
            self.constraints, samples, self.eta, fat=self._fat
        )

    _log: bool = struct.field(pytree_node=False, default=False)
    _fat: bool = struct.field(pytree_node=False, default=False)


# ------------------------------------------------------------------------- #
class qExpectedImprovement(MCAcquisitionFunction):
    """`qEI(X) = E[max_q relu(obj - best_f)]` (`monte_carlo.py:333`)."""

    best_f: Array = 0.0

    def __call__(self, X: Array) -> Array:
        X = self._with_pending(X)
        samples, obj = self._samples_and_obj(X)
        imp = jnp.maximum(obj - self.best_f, 0.0)
        if self.constraints:
            imp = imp * jnp.exp(
                smoothed_feasibility_log_indicator(
                    self.constraints, samples, self.eta, fat=False
                )
            )
        return _reduce(jnp.mean(jnp.max(imp, axis=-1), axis=0))


class qLogExpectedImprovement(MCAcquisitionFunction):
    """`qLogEI(X) = logmeanexp_s fatmax_q log_fatplus((obj - best_f)/tau)`
    ([Ament2023logei]; `logei.py:138`). Returns log-EI values."""

    best_f: Array = 0.0
    tau_relu: float = struct.field(pytree_node=False, default=TAU_RELU)
    tau_max: float = struct.field(pytree_node=False, default=TAU_MAX)
    _log: bool = struct.field(pytree_node=False, default=True)
    _fat: bool = struct.field(pytree_node=False, default=True)

    def __call__(self, X: Array) -> Array:
        X = self._with_pending(X)
        samples, obj = self._samples_and_obj(X)
        li = sm.log_fatplus(obj - self.best_f, tau=self.tau_relu)
        li = li + self._log_feas(samples)
        return _reduce(
            sm.logmeanexp(sm.fatmax(li, axis=-1, tau=self.tau_max), axis=0),
            log=True,
        )


class qProbabilityOfImprovement(MCAcquisitionFunction):
    """`qPI` with sigmoid-smoothed indicator (`monte_carlo.py:648`)."""

    best_f: Array = 0.0
    tau: float = struct.field(pytree_node=False, default=1e-3)

    def __call__(self, X: Array) -> Array:
        X = self._with_pending(X)
        samples, obj = self._samples_and_obj(X)
        val = jax.nn.sigmoid((obj - self.best_f) / self.tau)
        if self.constraints:
            val = val * jnp.exp(
                smoothed_feasibility_log_indicator(
                    self.constraints, samples, self.eta, fat=False
                )
            )
        return _reduce(jnp.mean(jnp.max(val, axis=-1), axis=0))


class qSimpleRegret(MCAcquisitionFunction):
    """`E[max_q obj]` (`monte_carlo.py:734`)."""

    def __call__(self, X: Array) -> Array:
        X = self._with_pending(X)
        _, obj = self._samples_and_obj(X)
        return _reduce(jnp.mean(jnp.max(obj, axis=-1), axis=0))


class qUpperConfidenceBound(MCAcquisitionFunction):
    """`E[max_q (mu + sqrt(beta pi / 2) |y - mu|)]` (`monte_carlo.py:801`)."""

    beta: float = struct.field(pytree_node=False, default=0.25)

    def __call__(self, X: Array) -> Array:
        X = self._with_pending(X)
        samples, obj = self._samples_and_obj(X)
        post = self.model.posterior(X, cache=self.cache)
        mean = self.objective(post.mean)  # (..., q), broadcasts vs samples
        beta_prime = math.sqrt(self.beta * math.pi / 2.0)
        ucb = mean + beta_prime * jnp.abs(obj - mean)
        return _reduce(jnp.mean(jnp.max(ucb, axis=-1), axis=0))


# ------------------------------------------------------------------------- #
class _NoisyMixin(MCAcquisitionFunction):
    """Joint (baseline, candidate) evaluation with per-sample incremental
    best over the baseline part.

    `baseline_mask` supports PADDED baselines (the compiled-BO-loop buffer
    design, `loop.py`): masked-out rows are excluded from the per-sample
    best and contribute nothing."""

    X_baseline: Array = None
    baseline_mask: Optional[Array] = None  # (nb,) bool

    def _joint_obj(self, X: Array):
        nb = self.X_baseline.shape[-2]
        X_full = jnp.concatenate([self.X_baseline, X], axis=-2)
        samples, obj = self._samples_and_obj(X_full)
        obj_base, obj_new = obj[..., :nb], obj[..., nb:]
        samples_new = samples[..., nb:, :]
        # Per-MC-sample incremental best over the baseline (feasible) points.
        if self.constraints:
            feas = smoothed_feasibility_log_indicator(
                self.constraints, samples[..., :nb, :], self.eta, fat=self._fat
            )
            # hard-gate infeasible baseline points to -inf before the max
            obj_base = jnp.where(feas > math.log(0.5), obj_base, -jnp.inf)
        if self.baseline_mask is not None:
            obj_base = jnp.where(self.baseline_mask, obj_base, -jnp.inf)
        best_f = jnp.max(obj_base, axis=-1, keepdims=True)
        best_f = jnp.where(jnp.isfinite(best_f), best_f, obj_base.min())
        return samples_new, obj_new, best_f


class qNoisyExpectedImprovement(_NoisyMixin):
    """`qNEI` (`monte_carlo.py:417`): improvement over the per-sample best
    of the noisy baseline."""

    def __call__(self, X: Array) -> Array:
        X = self._with_pending(X)
        samples_new, obj_new, best_f = self._joint_obj(X)
        imp = jnp.maximum(obj_new - best_f, 0.0)
        if self.constraints:
            imp = imp * jnp.exp(
                smoothed_feasibility_log_indicator(
                    self.constraints, samples_new, self.eta, fat=False
                )
            )
        return _reduce(jnp.mean(jnp.max(imp, axis=-1), axis=0))


class qLogNoisyExpectedImprovement(_NoisyMixin):
    """`qLogNEI` (`logei.py:237`)."""

    tau_relu: float = struct.field(pytree_node=False, default=TAU_RELU)
    tau_max: float = struct.field(pytree_node=False, default=TAU_MAX)
    _log: bool = struct.field(pytree_node=False, default=True)
    _fat: bool = struct.field(pytree_node=False, default=True)

    def __call__(self, X: Array) -> Array:
        X = self._with_pending(X)
        samples_new, obj_new, best_f = self._joint_obj(X)
        li = sm.log_fatplus(obj_new - best_f, tau=self.tau_relu)
        li = li + self._log_feas(samples_new)
        return _reduce(
            sm.logmeanexp(sm.fatmax(li, axis=-1, tau=self.tau_max), axis=0),
            log=True,
        )


# ------------------------------------------------------------------------- #
def _draw_base_samples(q_total: int, m: int, num_samples: int, seed) -> Array:
    z = draw_sobol_normal_samples(q_total * m, num_samples, seed=seed)
    return z.reshape(num_samples, q_total, m)


def draw_fresh_base_samples(
    q_total: int, m: int, num_samples: int, key: Array, seed: int = 0
) -> Array:
    """qMC N(0,1) base samples re-randomized by `key` (jit-safe).

    Owen-style digital-shift rerandomization: the Sobol direction table is
    built at trace time, and the digital shift is XORed with fresh random
    bits derived from `key`, so every BO iteration of a compiled loop gets
    an independent low-discrepancy draw (the reference rebuilds sampler
    base samples per acqf construction, `sampling/base.py`; a FIXED seed
    across iterations biases successive argmaxes toward the same SAA
    optimum). Within one acqf instance the draw stays fixed — the SAA
    determinism the optimizer needs."""
    from botorch_tpu.sampling.sobol import (
        bits_to_unit,
        draw_sobol_bits,
        sobol_table,
    )

    sv, shift = sobol_table(q_total * m, scramble=True, seed=seed)
    rnd = jax.random.bits(key, (q_total * m,), dtype=jnp.uint32)
    bits = draw_sobol_bits(sv, shift ^ rnd, num_samples)
    u = bits_to_unit(bits)
    z = jax.scipy.special.ndtri(u).astype(jnp.float32)
    return z.reshape(num_samples, q_total, m)


def make_mc_acqf(
    cls,
    model: SingleTaskGP,
    q: int,
    num_samples: int = DEFAULT_MC_SAMPLES,
    seed: int = 0,
    X_pending: Optional[Array] = None,
    prune_baseline: bool = False,
    **kwargs,
):
    """Construct an MC acqf with cached train root + qMC base samples.

    For noisy variants pass `X_baseline=` in kwargs; the base-sample block
    covers `n_baseline + q (+ n_pending)` points. `prune_baseline=True`
    drops baseline points with zero empirical probability of being the best
    before caching (reference `monte_carlo.py:417` / `logei.py:237`
    `prune_baseline`, via `acquisition/utils.py:245`).
    """
    if prune_baseline and kwargs.get("X_baseline") is not None:
        from botorch_tpu.acquisition.utils import prune_inferior_points

        kwargs["X_baseline"] = prune_inferior_points(
            model,
            kwargs["X_baseline"],
            objective=kwargs.get("objective"),
            constraints=kwargs.get("constraints"),
            seed=seed,
        )
    q_total = q
    if X_pending is not None:
        q_total += X_pending.shape[-2]
    if "X_baseline" in kwargs and kwargs["X_baseline"] is not None:
        q_total += kwargs["X_baseline"].shape[-2]
    base = _draw_base_samples(q_total, model.num_outputs, num_samples, seed)
    return cls(
        model=model,
        cache=model.train_chol(),
        base_samples=base,
        X_pending=X_pending,
        **kwargs,
    )
