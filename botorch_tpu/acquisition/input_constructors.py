r"""Acquisition input-constructor registry.

Counterpart of `botorch/acquisition/input_constructors.py`
(`ACQF_INPUT_CONSTRUCTOR_REGISTRY :106`, decorator `acqf_input_constructor
:235`, `get_acqf_input_constructor`, 25 registered constructors). In the
reference a constructor maps `(model, training_data, **options)` to the
acqf class's kwargs; in this functional design each registered constructor
derives the standard inputs the same way (`get_best_f_analytic/mc
:1429,1454` semantics: incumbents from observed data, baselines from
train_X, reference points inferred from the Pareto front) and returns the
BUILT acqf — the `make_*` functions already are the kwargs assemblers.

Uniform contract: `constructor(model, train_X=None, train_Y=None,
bounds=None, key=None, q=1, seed=0, **options) -> acqf`.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

Array = jax.Array

ACQF_INPUT_CONSTRUCTOR_REGISTRY: dict[str, Callable] = {}


def acqf_input_constructor(*names: str):
    """Decorator registering a constructor under one or more acqf names
    (reference `input_constructors.py:235`)."""

    def decorator(fn):
        for name in names:
            if name in ACQF_INPUT_CONSTRUCTOR_REGISTRY:
                raise ValueError(f"constructor for {name!r} already registered")
            ACQF_INPUT_CONSTRUCTOR_REGISTRY[name] = fn
        return fn

    return decorator


def get_acqf_input_constructor(name: str) -> Callable:
    """Look up the registered constructor (reference
    `input_constructors.py:106-130`)."""
    try:
        return ACQF_INPUT_CONSTRUCTOR_REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"no input constructor registered for {name!r}; known: "
            f"{sorted(ACQF_INPUT_CONSTRUCTOR_REGISTRY)}"
        ) from None


def construct_acqf(name: str, model, **kwargs):
    """One-call build: `get_acqf_input_constructor(name)(model, **kwargs)`."""
    return get_acqf_input_constructor(name)(model, **kwargs)


def get_best_f_analytic(train_Y: Array, maximize: bool = True) -> Array:
    """Incumbent for analytic acqfs (reference `:1429`)."""
    return jnp.max(train_Y) if maximize else jnp.min(train_Y)


def get_best_f_mc(
    train_Y: Array, objective: Optional[Callable] = None
) -> Array:
    """Incumbent under the MC objective (reference `:1454`)."""
    if objective is None:
        return jnp.max(train_Y)
    obj = objective(train_Y[None])[0]
    return jnp.max(obj)


def _default_key(key, seed):
    return jax.random.PRNGKey(seed) if key is None else key


def _call_filtered(fn, *args, **options):
    """Call a `make_*` assembler with only the kwargs it declares.

    Reference semantics (`input_constructors.py:106-130`): constructors
    receive a SUPERSET of standard derived inputs (train data, bounds,
    sampler budgets, ...) and use what the acqf needs, ignoring the rest.
    """
    import inspect

    sig = inspect.signature(fn)
    if any(p.kind == p.VAR_KEYWORD for p in sig.parameters.values()):
        return fn(*args, **options)
    ok = {k: v for k, v in options.items() if k in sig.parameters}
    return fn(*args, **ok)


# ------------------------------------------------------------------------- #
# Registered constructors (delegating to the factory / make_* assemblers)
# ------------------------------------------------------------------------- #
@acqf_input_constructor(
    "EI", "LogEI", "PI", "LogPI", "UCB", "PosteriorMean",
    "PosteriorStandardDeviation", "qEI", "qLogEI", "qPI", "qSR", "qUCB",
    "qNEI", "qLogNEI", "qEHVI", "qLogEHVI", "qNEHVI", "qLogNEHVI", "qKG",
)
def _construct_factory(model, train_X=None, train_Y=None, **options):
    from botorch_tpu.acquisition.factory import get_acquisition_function

    name = options.pop("_name")
    options.pop("bounds", None)
    options.pop("key", None)
    return get_acquisition_function(
        name, model, train_X=train_X, train_Y=train_Y, **options
    )


@acqf_input_constructor("qMES", "GIBBON", "qLowerBoundMaxValueEntropy")
def _construct_mes(model, bounds=None, key=None, seed=0, **options):
    from botorch_tpu.acquisition.max_value_entropy_search import (
        make_mes,
        qLowerBoundMaxValueEntropy,
        qMaxValueEntropy,
    )

    name = options.pop("_name")
    cls = qMaxValueEntropy if name == "qMES" else qLowerBoundMaxValueEntropy
    options.pop("train_X", None), options.pop("train_Y", None)
    options.pop("q", None)
    return _call_filtered(make_mes, cls, model, bounds, _default_key(key, seed), **options)


@acqf_input_constructor("qMultiFidelityMaxValueEntropy",
                        "qMultiFidelityLowerBoundMaxValueEntropy")
def _construct_mf_mes(model, bounds=None, key=None, seed=0, project=None,
                      cost_fn=None, **options):
    from botorch_tpu.acquisition.max_value_entropy_search import (
        make_mf_mes,
        qLowerBoundMaxValueEntropy,
        qMaxValueEntropy,
    )

    name = options.pop("_name")
    cls = (
        qMaxValueEntropy
        if name == "qMultiFidelityMaxValueEntropy"
        else qLowerBoundMaxValueEntropy
    )
    options.pop("train_X", None), options.pop("train_Y", None)
    options.pop("q", None)
    return _call_filtered(
        make_mf_mes, cls, model, bounds, _default_key(key, seed),
        project=project, cost_fn=cost_fn, **options,
    )


@acqf_input_constructor("qJES", "qJointEntropySearch")
def _construct_jes(model, bounds=None, key=None, seed=0, **options):
    from botorch_tpu.acquisition.joint_entropy_search import make_jes

    options.pop("_name")
    options.pop("train_X", None), options.pop("train_Y", None)
    options.pop("q", None)
    return _call_filtered(make_jes, model, bounds, _default_key(key, seed), **options)


@acqf_input_constructor("qPES", "qPredictiveEntropySearch")
def _construct_pes(model, bounds=None, key=None, seed=0, **options):
    from botorch_tpu.acquisition.predictive_entropy_search import make_pes

    options.pop("_name")
    options.pop("train_X", None), options.pop("train_Y", None)
    options.pop("q", None)
    return _call_filtered(make_pes, model, bounds, _default_key(key, seed), **options)


@acqf_input_constructor("qMESMO")
def _construct_mesmo(model, bounds=None, key=None, seed=0, **options):
    from botorch_tpu.acquisition.max_value_entropy_search import make_mesmo

    options.pop("_name")
    options.pop("train_X", None), options.pop("train_Y", None)
    options.pop("q", None)
    return _call_filtered(make_mesmo, model, bounds, _default_key(key, seed),
                          seed=seed, **options)


@acqf_input_constructor("qPFES")
def _construct_pfes(model, bounds=None, key=None, seed=0, **options):
    from botorch_tpu.acquisition.pareto_frontier_entropy_search import (
        make_pfes,
    )

    options.pop("_name")
    options.pop("train_X", None), options.pop("train_Y", None)
    options.pop("q", None)
    return _call_filtered(make_pfes, model, bounds, _default_key(key, seed), **options)


@acqf_input_constructor("qLogNParEGO")
def _construct_parego(model, train_X=None, train_Y=None, key=None, seed=0,
                      q=1, **options):
    from botorch_tpu.acquisition.parego import make_qlognparego

    options.pop("_name")
    options.pop("bounds", None)
    return _call_filtered(
        make_qlognparego, model, train_X, train_Y, _default_key(key, seed),
        q=q, seed=seed, **options,
    )


@acqf_input_constructor("NEI", "LogNEI", "NoisyExpectedImprovement",
                        "LogNoisyExpectedImprovement")
def _construct_analytic_nei(
    model, train_X=None, key=None, seed=0, num_fantasies: int = 20,
    maximize: bool = True, **options,
):
    """Fantasy-averaged analytic (Log)NEI (reference
    `input_constructors.py` `construct_inputs_noisy_ei`)."""
    from botorch_tpu.acquisition.analytic import (
        LogNoisyExpectedImprovement,
        NoisyExpectedImprovement,
        make_noisy_ei,
    )

    name = options.pop("_name")
    cls = (
        NoisyExpectedImprovement
        if name in ("NEI", "NoisyExpectedImprovement")
        else LogNoisyExpectedImprovement
    )
    if train_X is None:
        # standard-derived-input rule: the observed designs default to
        # the model's train inputs (reference derives X_observed from
        # the model's train data too)
        train_X = model.X
    return make_noisy_ei(
        cls, model, train_X, _default_key(key, seed),
        num_fantasies=num_fantasies, maximize=maximize,
    )


@acqf_input_constructor("EHVI", "ExpectedHypervolumeImprovement")
def _construct_analytic_ehvi(model, train_Y=None, ref_point=None, **options):
    from botorch_tpu.acquisition.multi_objective import make_ehvi

    options.pop("_name")
    return make_ehvi(model, ref_point, train_Y)


@acqf_input_constructor("qMFKG", "qMultiFidelityKnowledgeGradient")
def _construct_qmfkg(
    model, train_Y=None, project=None, q: int = 1,
    num_fantasies: int = 64, current_value=None, seed: int = 0, **options,
):
    """One-shot multi-fidelity KG (reference `construct_inputs_qKG` MF
    variant): requires `project` mapping candidates to target fidelity."""
    from botorch_tpu.acquisition.knowledge_gradient import make_qkg

    options.pop("_name")
    if project is None:
        raise ValueError("qMFKG requires `project` (target-fidelity map)")
    if current_value is None:
        current_value = 0.0 if train_Y is None else float(jnp.max(train_Y))
    return make_qkg(
        model, q=q, num_fantasies=num_fantasies,
        current_value=current_value, seed=seed, project=project,
    )


@acqf_input_constructor("EUBO", "AnalyticExpectedUtilityOfBestOption",
                        "qEUBO", "qExpectedUtilityOfBestOption")
def _construct_eubo(model, **options):
    """Preference EUBO over a fitted PairwiseGP (reference
    `construct_inputs_analytic_eubo`)."""
    from botorch_tpu.models.pairwise_gp import (
        AnalyticExpectedUtilityOfBestOption,
        qExpectedUtilityOfBestOption,
    )

    name = options.pop("_name")
    if name in ("EUBO", "AnalyticExpectedUtilityOfBestOption"):
        return AnalyticExpectedUtilityOfBestOption(model=model)
    return _call_filtered(qExpectedUtilityOfBestOption, model=model, **options)


@acqf_input_constructor("qBALD", "qBayesianActiveLearningByDisagreement")
def _construct_qbald(model, **options):
    from botorch_tpu.acquisition.active_learning import (
        qBayesianActiveLearningByDisagreement,
    )

    options.pop("_name")
    return qBayesianActiveLearningByDisagreement(
        model=model, cache=model.train_chol()
    )


@acqf_input_constructor("qNIPV", "qNegIntegratedPosteriorVariance")
def _construct_qnipv(model, bounds=None, key=None, seed=0,
                     num_mc_points: int = 128, **options):
    from botorch_tpu.acquisition.active_learning import (
        qNegIntegratedPosteriorVariance,
    )
    from botorch_tpu.sampling.sobol import draw_sobol_samples

    options.pop("_name")
    mc_points = options.pop("mc_points", None)
    if mc_points is None:
        mc_points = draw_sobol_samples(bounds, num_mc_points, 1, seed=seed)[
            :, 0, :
        ]
    return qNegIntegratedPosteriorVariance(
        model=model, cache=model.train_chol(), mc_points=mc_points
    )


@acqf_input_constructor("qHVKG")
def _construct_qhvkg(model, train_Y=None, ref_point=None, **options):
    from botorch_tpu.acquisition.hypervolume_knowledge_gradient import (
        make_qhvkg,
    )
    from botorch_tpu.utils.multi_objective import (
        infer_reference_point,
        is_non_dominated,
    )

    options.pop("_name")
    for k in ("train_X", "bounds", "key"):
        options.pop(k, None)
    if ref_point is None:
        front = train_Y[is_non_dominated(train_Y)]
        ref_point = infer_reference_point(front)
    return _call_filtered(make_qhvkg, model, ref_point, Y_baseline=train_Y, **options)


@acqf_input_constructor("qMultiStepLookahead")
def _construct_multistep(model, train_Y=None, **options):
    from botorch_tpu.acquisition.multi_step_lookahead import make_multistep

    options.pop("_name")
    for k in ("train_X", "bounds", "key", "q"):
        options.pop(k, None)
    best_f = options.pop("best_f", None)
    if best_f is None:
        best_f = float(jnp.max(train_Y)) if train_Y is not None else 0.0
    if "batch_sizes" in options:  # arbitrary-depth tree
        from botorch_tpu.acquisition.multi_step_lookahead import make_k_step

        return _call_filtered(make_k_step, model, best_f=best_f, **options)
    return _call_filtered(make_multistep, model, best_f=best_f, **options)


@acqf_input_constructor("MOMF")
def _construct_momf(model, train_Y=None, ref_point=None, q=1, **options):
    from botorch_tpu.acquisition.multi_objective import make_momf
    from botorch_tpu.utils.multi_objective import (
        infer_reference_point,
        is_non_dominated,
    )

    options.pop("_name")
    for k in ("train_X", "bounds", "key"):
        options.pop(k, None)
    if ref_point is None:
        front = train_Y[is_non_dominated(train_Y)]
        ref_point = infer_reference_point(front)
    return _call_filtered(make_momf, model, ref_point, q=q, Y_baseline=train_Y, **options)


# make `_name` visible to delegating constructors
def _with_name(fn, name):
    def wrapped(model, **kwargs):
        kwargs["_name"] = name
        return fn(model, **kwargs)

    return wrapped


ACQF_INPUT_CONSTRUCTOR_REGISTRY = {
    name: _with_name(fn, name)
    for name, fn in ACQF_INPUT_CONSTRUCTOR_REGISTRY.items()
}


def optimize_objective(
    model,
    bounds,
    q: int,
    objective=None,
    mc_samples: int = 128,
    num_restarts: int = 4,
    raw_samples: int = 64,
    key=None,
    seed: int = 0,
    fixed_features: dict | None = None,
    maxiter: int = 50,
):
    """Optimize a (possibly MC) objective of the model's posterior over the
    box (reference `input_constructors.py:1529` `optimize_objective`):
    qSimpleRegret on the objective, maximized with `optimize_acqf`;
    used by KG-style constructors to find `current_value`."""
    import jax as _jax

    from botorch_tpu.acquisition.monte_carlo import make_mc_acqf, qSimpleRegret
    from botorch_tpu.acquisition.wrappers import FixedFeatureAcquisitionFunction
    from botorch_tpu.optim.optimize import optimize_acqf

    if key is None:
        key = _jax.random.PRNGKey(seed)
    kwargs = {} if objective is None else {"objective": objective}
    acqf = make_mc_acqf(
        qSimpleRegret, model, q=q, num_samples=mc_samples, **kwargs
    )
    if fixed_features:
        cols = sorted(fixed_features)
        vals = jnp.asarray([fixed_features[c] for c in cols])
        d = bounds.shape[-1]
        free = [i for i in range(d) if i not in fixed_features]
        acqf = FixedFeatureAcquisitionFunction(
            acqf=acqf, d=d, fixed_indices=tuple(cols), fixed_values=vals
        )
        bounds = bounds[:, jnp.asarray(free)]
        cand, val = optimize_acqf(
            acqf, bounds, q=q, num_restarts=num_restarts,
            raw_samples=raw_samples, key=key, seed=seed, maxiter=maxiter,
        )
        # return FULL-dimensional candidates (reference `construct_X_full`)
        return acqf._expand(cand), val
    return optimize_acqf(
        acqf, bounds, q=q, num_restarts=num_restarts,
        raw_samples=raw_samples, key=key, seed=seed, maxiter=maxiter,
    )
