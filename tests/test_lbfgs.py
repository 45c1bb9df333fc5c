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


def test_lbfgs_resumable_chunks_match_single_run():
    """lbfgs_init + chunked lbfgs_run must reach the same point as one
    uninterrupted lbfgsb call (resumability is what makes the wall-clock
    timeout loop exact, not approximate)."""
    from botorch_tpu.ops.lbfgs import lbfgs_init, lbfgs_run, lbfgsb

    def rosen(x):
        return jnp.sum(
            100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1.0 - x[:-1]) ** 2
        )

    x0 = jnp.asarray([-1.2, 1.0, -0.5, 0.8])
    full = lbfgsb(rosen, x0, maxiter=80)

    st = lbfgs_init(rosen, x0)
    for lim in (10, 25, 40, 80):
        st = lbfgs_run(rosen, st, iter_limit=lim)
    # Chunked and single-program runs are separate XLA compilations, so
    # float32 rounding near convergence may shift the stopping iteration;
    # the solution itself must agree.
    assert np.allclose(np.asarray(st.x), np.asarray(full.x), atol=1e-5)
    assert abs(float(st.f) - float(full.fun)) < 1e-8
    assert bool(st.converged) and bool(full.converged)


def test_multi_start_timeout_returns_best_so_far():
    """With an expired deadline the solver still returns valid improved
    iterates (best-so-far semantics of the reference's
    minimize_with_timeout)."""
    from botorch_tpu.ops.lbfgs import multi_start_lbfgsb

    def quad(x):
        return jnp.sum((x - 0.3) ** 2)

    x0 = jnp.stack([jnp.zeros(3), jnp.ones(3)])
    # timeout that expires immediately: exactly one chunk of 5 iters runs
    res = multi_start_lbfgsb(quad, x0, maxiter=100, timeout_sec=0.0,
                             timeout_chunk=5)
    assert np.all(np.asarray(res.n_iter) <= 5)
    assert np.all(np.asarray(res.fun) < np.asarray([quad(x) for x in x0]) + 1e-9)
    # generous timeout: converges fully
    res2 = multi_start_lbfgsb(quad, x0, maxiter=100, timeout_sec=60.0,
                              timeout_chunk=5)
    assert np.all(np.asarray(res2.converged))
    assert np.allclose(np.asarray(res2.x), 0.3, atol=1e-4)


def test_fit_gp_with_timeout():
    from botorch_tpu.fit import fit_gp_with_timeout
    from botorch_tpu.models.gp import make_gp

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(12, 2)), jnp.float32)
    Y = jnp.sin(3 * X[:, 0]) + X[:, 1]
    m0 = make_gp(X, Y[:, None])
    m = fit_gp_with_timeout(m0, jax.random.PRNGKey(0), num_restarts=4,
                            maxiter=60, timeout_sec=120.0)
    assert float(m.map_objective(m.params)) <= float(
        m0.map_objective(m0.params)
    )
