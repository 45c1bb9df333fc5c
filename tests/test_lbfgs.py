"""Tests for the batched bound-constrained L-BFGS solver (replaces the
reference's scipy L-BFGS-B call sites, `optim/core.py:55`, `generation/gen.py:46`)."""

import jax
import jax.numpy as jnp
import numpy as np

from botorch_tpu.ops.lbfgs import lbfgsb, multi_start_lbfgsb


def rosen(x):
    return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1 - x[:-1]) ** 2)


def test_quadratic_exact():
    A = jnp.asarray([[3.0, 1.0], [1.0, 2.0]])
    b = jnp.asarray([1.0, -1.0])
    f = lambda x: 0.5 * x @ A @ x - b @ x
    res = lbfgsb(f, jnp.zeros(2), maxiter=50)
    expect = np.linalg.solve(np.asarray(A), np.asarray(b))
    np.testing.assert_allclose(np.asarray(res.x), expect, atol=1e-5)
    assert bool(res.converged)


def test_rosenbrock_matches_scipy_iteration_count_ballpark():
    res = lbfgsb(rosen, jnp.asarray([-1.2, 1.0]), maxiter=200)
    np.testing.assert_allclose(np.asarray(res.x), [1.0, 1.0], atol=1e-3)
    assert int(res.n_iter) < 120


def test_active_bounds():
    f = lambda x: jnp.sum((x - 2.0) ** 2)
    res = lbfgsb(
        f, jnp.asarray([0.0, 0.0]),
        bounds=(jnp.asarray([-1.0, -1.0]), jnp.asarray([1.0, 3.0])),
        maxiter=50,
    )
    np.testing.assert_allclose(np.asarray(res.x), [1.0, 2.0], atol=1e-5)


def test_start_on_bound_moves_inward():
    f = lambda x: jnp.sum((x - 0.5) ** 2)
    res = lbfgsb(
        f, jnp.asarray([0.0]), bounds=(jnp.asarray([0.0]), jnp.asarray([1.0])),
        maxiter=50,
    )
    np.testing.assert_allclose(np.asarray(res.x), [0.5], atol=1e-5)


def test_multistart_all_converge_and_best_is_global():
    x0 = jnp.asarray(np.random.default_rng(0).uniform(-2, 2, (16, 2)), jnp.float32)
    res = multi_start_lbfgsb(rosen, x0, maxiter=300)
    assert float(res.fun.min()) < 1e-6
    assert int(res.converged.sum()) == 16


def test_inside_jit_and_grad_free():
    # solver must be jittable as part of a larger program
    @jax.jit
    def solve(shift):
        f = lambda x: jnp.sum((x - shift) ** 2)
        return lbfgsb(f, jnp.zeros(3), maxiter=30).x

    np.testing.assert_allclose(np.asarray(solve(jnp.asarray([1.0, 2.0, 3.0]))),
                               [1, 2, 3], atol=1e-5)
