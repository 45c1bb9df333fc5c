r"""Acquisition factory + input constructors.

Counterpart of `botorch/acquisition/factory.py:33`
(`get_acquisition_function`) and the input-constructor registry
(`input_constructors.py:106,235` — 25 registered constructors in the
reference). One entry point builds any supported acquisition from
`(model, train_X, train_Y, options)`, deriving the standard inputs
(`best_f` from observed data, baselines, reference points) the way the
reference's constructors do (`get_best_f_analytic/mc :1429,1454`).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

from botorch_tpu.acquisition import analytic as analytic_mod
from botorch_tpu.acquisition import monte_carlo as mc_mod
from botorch_tpu.acquisition import multi_objective as mo_mod
from botorch_tpu.acquisition.knowledge_gradient import make_qkg
from botorch_tpu.utils.multi_objective import infer_reference_point, is_non_dominated

Array = jnp.ndarray

_ANALYTIC = {
    "EI": analytic_mod.ExpectedImprovement,
    "LogEI": analytic_mod.LogExpectedImprovement,
    "PI": analytic_mod.ProbabilityOfImprovement,
    "LogPI": analytic_mod.LogProbabilityOfImprovement,
    "UCB": analytic_mod.UpperConfidenceBound,
    "PosteriorMean": analytic_mod.PosteriorMean,
    "PosteriorStandardDeviation": analytic_mod.PosteriorStandardDeviation,
}

_MC = {
    "qEI": mc_mod.qExpectedImprovement,
    "qLogEI": mc_mod.qLogExpectedImprovement,
    "qPI": mc_mod.qProbabilityOfImprovement,
    "qSR": mc_mod.qSimpleRegret,
    "qUCB": mc_mod.qUpperConfidenceBound,
}

_NOISY = {
    "qNEI": mc_mod.qNoisyExpectedImprovement,
    "qLogNEI": mc_mod.qLogNoisyExpectedImprovement,
}

_HV = {
    "qEHVI": mo_mod.qExpectedHypervolumeImprovement,
    "qLogEHVI": mo_mod.qLogExpectedHypervolumeImprovement,
}

_NHV = {
    "qNEHVI": mo_mod.qNoisyExpectedHypervolumeImprovement,
    "qLogNEHVI": mo_mod.qLogNoisyExpectedHypervolumeImprovement,
}


def get_acquisition_function(
    name: str,
    model,
    train_X: Optional[Array] = None,
    train_Y: Optional[Array] = None,
    q: int = 1,
    num_samples: int = mc_mod.DEFAULT_MC_SAMPLES,
    seed: int = 0,
    objective: Optional[Callable] = None,
    constraints: tuple = (),
    ref_point: Optional[Array] = None,
    best_f: Optional[Array] = None,
    beta: float = 0.25,
    num_fantasies: int = 64,
    X_pending: Optional[Array] = None,
):
    """Build an acquisition function by name with auto-derived inputs."""
    mc_kwargs = {}
    if objective is not None:
        mc_kwargs["objective"] = objective
    if constraints:
        mc_kwargs["constraints"] = constraints
    if name in _ANALYTIC:
        kwargs = {}
        if name in ("EI", "LogEI", "PI", "LogPI"):
            if best_f is None:
                if train_Y is None:
                    raise ValueError(f"{name} needs best_f or train_Y")
                best_f = jnp.max(train_Y)
            kwargs["best_f"] = best_f
        if name == "UCB":
            kwargs["beta"] = beta
        return analytic_mod.make_acqf(name, model, **kwargs)
    if name in _MC:
        kwargs = dict(mc_kwargs)
        if name in ("qEI", "qLogEI", "qPI"):
            if best_f is None:
                if train_Y is None:
                    raise ValueError(f"{name} needs best_f or train_Y")
                best_f = jnp.max(train_Y)
            kwargs["best_f"] = best_f
        if name == "qUCB":
            kwargs["beta"] = beta
        return mc_mod.make_mc_acqf(
            _MC[name], model, q=q, num_samples=num_samples, seed=seed,
            X_pending=X_pending, **kwargs,
        )
    if name in _NOISY:
        if train_X is None:
            raise ValueError(f"{name} needs train_X as the baseline")
        return mc_mod.make_mc_acqf(
            _NOISY[name], model, q=q, num_samples=num_samples, seed=seed,
            X_baseline=train_X, X_pending=X_pending, **mc_kwargs,
        )
    if name in _HV:
        if train_Y is None:
            raise ValueError(f"{name} needs train_Y")
        if ref_point is None:
            front = train_Y[is_non_dominated(train_Y)]
            ref_point = infer_reference_point(front)
        return mo_mod.make_qehvi(
            _HV[name], model, ref_point, q=q, Y_baseline=train_Y,
            num_samples=num_samples, seed=seed, **mc_kwargs,
        )
    if name in _NHV:
        if train_X is None:
            raise ValueError(f"{name} needs train_X")
        if ref_point is None:
            if train_Y is None:
                raise ValueError(f"{name} needs ref_point or train_Y")
            front = train_Y[is_non_dominated(train_Y)]
            ref_point = infer_reference_point(front)
        return mo_mod.make_qnehvi(
            _NHV[name], model, ref_point, q=q, X_baseline=train_X,
            num_samples=num_samples, seed=seed, **mc_kwargs,
        )
    if name == "qKG":
        cv = jnp.max(train_Y) if train_Y is not None else 0.0
        return make_qkg(model, q=q, num_fantasies=num_fantasies,
                        current_value=cv, seed=seed)
    raise ValueError(
        f"Unknown acquisition {name!r}; supported: "
        f"{sorted([*_ANALYTIC, *_MC, *_NOISY, *_HV, *_NHV, 'qKG'])}"
    )
