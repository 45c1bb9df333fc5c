"""Input-constructor registry tests (reference
`acquisition/input_constructors.py`: registry, decorator, lookup, and
derived standard inputs)."""

import jax
import jax.numpy as jnp
import pytest

from botorch_tpu.acquisition.input_constructors import (
    ACQF_INPUT_CONSTRUCTOR_REGISTRY,
    acqf_input_constructor,
    construct_acqf,
    get_acqf_input_constructor,
    get_best_f_analytic,
    get_best_f_mc,
)
from botorch_tpu.fit import fit_gp
from botorch_tpu.models.gp import make_gp


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    X = jax.random.uniform(key, (12, 2))
    Y = -jnp.sum((X - 0.5) ** 2, -1)
    gp = fit_gp(make_gp(X, Y[:, None]), num_restarts=2, maxiter=30)
    ub = jnp.stack([jnp.zeros(2), jnp.ones(2)])
    return gp, X, Y, ub


def test_registry_covers_reference_names():
    required = {
        "EI", "LogEI", "PI", "UCB", "qEI", "qLogEI", "qNEI", "qLogNEI",
        "qEHVI", "qNEHVI", "qKG", "qMES", "GIBBON", "qJES", "qPES",
        "qNIPV", "qHVKG", "qLogNParEGO", "qMultiStepLookahead",
        "qMultiFidelityMaxValueEntropy",
    }
    assert required <= set(ACQF_INPUT_CONSTRUCTOR_REGISTRY)
    assert len(ACQF_INPUT_CONSTRUCTOR_REGISTRY) >= 25  # reference count


def test_lookup_and_errors():
    fn = get_acqf_input_constructor("qLogNEI")
    assert callable(fn)
    with pytest.raises(ValueError):
        get_acqf_input_constructor("not-an-acqf")
    with pytest.raises(ValueError):
        # double registration is rejected
        @acqf_input_constructor("qLogNEI")
        def dup(model, **kw):  # pragma: no cover
            return None


def test_constructors_derive_standard_inputs(setup):
    gp, X, Y, ub = setup
    Xq = jnp.array([[0.4, 0.6]])
    a = construct_acqf("LogEI", gp, train_Y=Y[:, None])
    assert jnp.isfinite(a(Xq))
    a = construct_acqf(
        "qLogNEI", gp, train_X=X, train_Y=Y[:, None], num_samples=32
    )
    assert jnp.isfinite(a(Xq))
    a = construct_acqf(
        "qMES", gp, bounds=ub, grid_size=32, num_max_values=4
    )
    assert jnp.isfinite(a(Xq))
    kg = construct_acqf("qKG", gp, train_Y=Y[:, None], num_fantasies=4)
    Xf = jnp.tile(Xq, (kg.get_augmented_q_batch_size(), 1))
    assert jnp.isfinite(kg(Xf))


def test_mo_constructor_infers_ref_point(setup):
    gp, X, Y, ub = setup
    Y2 = jnp.stack([Y, -Y + 0.3], -1)
    gp2 = fit_gp(make_gp(X, Y2), num_restarts=2, maxiter=20)
    a = construct_acqf(
        "qLogNEHVI", gp2, train_X=X, train_Y=Y2, num_samples=32
    )
    assert jnp.isfinite(a(jnp.array([[0.4, 0.6]])))


def test_best_f_helpers():
    Y = jnp.array([[1.0], [3.0], [2.0]])
    assert float(get_best_f_analytic(Y)) == 3.0
    assert float(get_best_f_analytic(Y, maximize=False)) == 1.0
    obj = lambda s: -s[..., 0]
    assert float(get_best_f_mc(Y, obj)) == -1.0


# every registered name, with the minimal standard inputs it derives from
_SO_NAMES = [
    "EI", "LogEI", "PI", "LogPI", "UCB", "PosteriorMean",
    "PosteriorStandardDeviation", "qEI", "qLogEI", "qNEI", "qLogNEI",
    "qPI", "qSR", "qUCB", "qKG", "qMES", "GIBBON",
    "qLowerBoundMaxValueEntropy", "qJES", "qNIPV", "qMultiStepLookahead",
]
_MO_NAMES = ["qEHVI", "qLogEHVI", "qNEHVI", "qLogNEHVI", "qLogNParEGO",
             "qMESMO", "qPFES", "qHVKG"]


@pytest.mark.parametrize("name", _SO_NAMES)
def test_every_single_objective_constructor_builds_and_evaluates(name, setup):
    """Registry-wide smoke (reference has 25+ registered constructors):
    each name builds from standard derived inputs and returns a finite
    value on a q-batch."""
    gp, X, Y, ub = setup
    kwargs = dict(train_X=X, train_Y=Y[:, None], bounds=ub,
                  num_samples=16, seed=0)
    if name in ("qMES", "GIBBON", "qLowerBoundMaxValueEntropy"):
        kwargs.update(grid_size=24, num_max_values=3)
    if name == "qJES":
        kwargs.update(num_optima=3, num_features=64, raw_samples=32,
                      maxiter=8)
    if name == "qKG":
        kwargs.update(num_fantasies=3)
    if name == "qMultiStepLookahead":
        kwargs.update(num_fantasies=3)
    if name == "qNIPV":
        kwargs.update(mc_points=jax.random.uniform(jax.random.PRNGKey(3),
                                                   (16, 2)))
    a = construct_acqf(name, gp, **kwargs)
    q = getattr(a, "get_augmented_q_batch_size", lambda: 1)()
    Xq = jnp.broadcast_to(jnp.array([[0.4, 0.6]]), (q, 2))
    v = a(Xq)
    assert jnp.isfinite(v), name


@pytest.mark.parametrize("name", _MO_NAMES)
def test_every_multi_objective_constructor_builds_and_evaluates(name, setup):
    gp, X, Y, ub = setup
    Y2 = jnp.stack([Y, -Y + 0.3], -1)
    gp2 = fit_gp(make_gp(X, Y2), num_restarts=2, maxiter=20)
    kwargs = dict(train_X=X, train_Y=Y2, bounds=ub, num_samples=16, seed=0)
    if name == "qMESMO":
        kwargs.update(num_fronts=3, grid_size=24)
    if name == "qPFES":
        kwargs.update(num_fronts=3)
    if name == "qHVKG":
        kwargs.update(num_fantasies=2)
    a = construct_acqf(name, gp2, **kwargs)
    q = getattr(a, "get_augmented_q_batch_size", lambda: 1)()
    Xq = jnp.broadcast_to(jnp.array([[0.4, 0.6]]), (q, 2))
    v = a(Xq)
    assert jnp.isfinite(v), name


def test_round3_constructor_additions(setup):
    """Names the reference registers that round 2 lacked: analytic
    (Log)NEI, analytic EHVI, qMFKG, EUBO/qEUBO, qBALD."""
    gp, X, Y, ub = setup
    Xq = jnp.array([[0.4, 0.6]])

    nei = construct_acqf(
        "LogNEI", gp, train_X=X, num_fantasies=4, key=jax.random.PRNGKey(0)
    )
    assert jnp.isfinite(nei(Xq))

    Y2 = jnp.stack([Y, -Y + 0.3], -1)
    gp2 = fit_gp(make_gp(X, Y2), num_restarts=2, maxiter=15)
    ehvi = construct_acqf(
        "EHVI", gp2, train_Y=Y2, ref_point=jnp.asarray([-2.0, -2.0])
    )
    assert jnp.isfinite(ehvi(Xq))

    proj = lambda x: x.at[..., -1].set(1.0)
    kg = construct_acqf(
        "qMFKG", gp, train_Y=Y[:, None], project=proj, num_fantasies=3
    )
    Xf = jnp.tile(Xq, (kg.get_augmented_q_batch_size(), 1))
    assert jnp.isfinite(kg(Xf))

    bald = construct_acqf("qBALD", gp)
    assert jnp.isfinite(bald(Xq))

    from botorch_tpu.models.pairwise_gp import (
        fit_pairwise_gp,
        make_pairwise_gp,
    )

    pm = fit_pairwise_gp(
        make_pairwise_gp(X, jnp.asarray([[0, 1], [2, 3]], jnp.int32)),
        maxiter=8,
    )
    eubo = construct_acqf("EUBO", pm)
    assert jnp.isfinite(eubo(X[:2]))
    qeubo = construct_acqf("qEUBO", pm, num_samples=32)
    assert jnp.isfinite(qeubo(X[:3]))
