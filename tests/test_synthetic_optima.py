"""Sweeping optima checks over the whole synthetic suite (reference
`SyntheticTestFunctionTestCaseMixin`, `utils/testing.py:104-225`:
`optimal_value` is attained at every registered optimizer and never
beaten by random probes)."""

import inspect

import jax.numpy as jnp
import numpy as np
import pytest

from botorch_tpu.test_functions import synthetic as syn

ALL_PROBLEMS = [
    cls
    for _, cls in inspect.getmembers(syn, inspect.isclass)
    if issubclass(cls, syn.SyntheticTestFunction)
    and cls is not syn.SyntheticTestFunction
]


def _instantiate(cls):
    try:
        return cls()
    except TypeError:
        return cls(dim=6)


@pytest.mark.parametrize("cls", ALL_PROBLEMS, ids=lambda c: c.__name__)
def test_optimal_value_attained_at_optimizers(cls):
    prob = _instantiate(cls)
    if prob.optimizers.size == 0:
        pytest.skip(f"{cls.__name__} registers no optimizers")
    vals = np.asarray(prob.evaluate_true(prob.optimizers))
    np.testing.assert_allclose(
        vals, prob._optimal_value, atol=2e-3, rtol=1e-4,
        err_msg=cls.__name__,
    )


@pytest.mark.parametrize("cls", ALL_PROBLEMS, ids=lambda c: c.__name__)
def test_random_points_never_beat_optimum(cls):
    prob = _instantiate(cls)
    rng = np.random.default_rng(0)
    lo, hi = np.asarray(prob.bounds[0]), np.asarray(prob.bounds[1])
    X = jnp.asarray(
        rng.uniform(size=(256, prob.dim)) * (hi - lo) + lo, jnp.float32
    )
    vals = np.asarray(prob.evaluate_true(X))
    assert vals.min() >= prob._optimal_value - 1e-3, cls.__name__


@pytest.mark.parametrize("cls", ALL_PROBLEMS, ids=lambda c: c.__name__)
def test_negate_and_noise(cls):
    import jax

    prob = _instantiate(cls)
    neg = _instantiate(cls)
    neg.negate = True
    X = jnp.asarray(
        np.random.default_rng(1).uniform(size=(4, prob.dim)), jnp.float32
    )
    lo, hi = prob.bounds[0], prob.bounds[1]
    X = X * (hi - lo) + lo
    np.testing.assert_allclose(
        np.asarray(prob(X)), -np.asarray(neg(X)), rtol=1e-6
    )
    assert neg.optimal_value == -prob.optimal_value
    noisy = _instantiate(cls)
    noisy.noise_std = 0.1
    a = noisy(X, key=jax.random.PRNGKey(0))
    b = noisy(X, key=jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(a), np.asarray(b))
