"""Constraint parity tests: equality constraints + guaranteed feasibility
(reference `optim/parameter_constraints.py:68,216` +
`generation/gen.py:278-291` SLSQP/fallback semantics).

The round-3 contract: every candidate returned by `optimize_acqf` under
linear constraints violates them by at most ~1e-6 (float32 roundoff), and
an equality-constrained problem reaches its analytic optimum.
"""

import jax
import jax.numpy as jnp
import numpy as np

from botorch_tpu.optim.constraints import (
    AffineSubspace,
    linear_violation,
    project_box_affine_halfspaces,
)
from botorch_tpu.optim.optimize import optimize_acqf


def test_affine_subspace_projection():
    aff = AffineSubspace.build([((0, 1, 2), (1.0, 1.0, 1.0), 1.0)], d=3)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(17, 3)), jnp.float32)
    p = aff.project(x)
    np.testing.assert_allclose(np.asarray(p).sum(-1), 1.0, atol=1e-6)
    # projection is idempotent and moves feasible points nowhere
    np.testing.assert_allclose(aff.project(p), p, atol=1e-6)
    # least-squares optimality: p - x orthogonal to the subspace
    z = np.asarray(aff.basis)
    np.testing.assert_allclose(
        np.asarray(p - x) @ z, 0.0, atol=1e-5
    )


def test_dykstra_projection_box_affine():
    aff = AffineSubspace.build([((0, 1), (1.0, 1.0), 1.5)], d=2)
    lo, hi = jnp.zeros(2), jnp.ones(2)
    x = jnp.asarray([[2.0, 2.0], [0.0, 0.0], [1.0, 0.2]], jnp.float32)
    p = project_box_affine_halfspaces(x, lo, hi, affine=aff, iters=80)
    pa = np.asarray(p)
    np.testing.assert_allclose(pa.sum(-1), 1.5, atol=1e-5)
    assert (pa >= -1e-6).all() and (pa <= 1 + 1e-6).all()
    # exact projection of (1.0, 0.2) onto {x+y=1.5} ∩ [0,1]²: the plain
    # affine projection (1.15, 0.35) leaves the box, so the KKT point is
    # (1.0, 0.5) (upper bound active, multiplier 0.3 >= 0).
    np.testing.assert_allclose(pa[2], [1.0, 0.5], atol=1e-4)


def test_equality_constrained_optimize_acqf():
    """max -|X - 0.9|^2 s.t. sum(x) = 1: analytic optimum (0.5, 0.5)."""
    acqf = lambda X: -jnp.sum((X - 0.9) ** 2)
    bounds = jnp.stack([jnp.zeros(2), jnp.ones(2)])
    eq = [((0, 1), (1.0, 1.0), 1.0)]
    cand, val = optimize_acqf(
        acqf, bounds, q=1, num_restarts=6, raw_samples=48,
        key=jax.random.PRNGKey(0), maxiter=60, equality_constraints=eq,
    )
    x = np.asarray(cand[0])
    assert abs(x.sum() - 1.0) <= 1e-6, x
    np.testing.assert_allclose(x, [0.5, 0.5], atol=1e-3)


def test_equality_plus_inequality_feasibility():
    """Mixed constraints: returned candidates satisfy all of them to
    float32 roundoff (violation <= 1e-6) for every q point."""
    acqf = lambda X: jnp.sum(X[..., 0] - 0.3 * X[..., 1] + 0.5 * X[..., 2])
    bounds = jnp.stack([jnp.zeros(3), jnp.ones(3)])
    eq = [((0, 1, 2), (1.0, 1.0, 1.0), 1.2)]
    ineq = [((0,), (-1.0,), -0.5)]  # -x0 >= -0.5  <=>  x0 <= 0.5
    cand, val = optimize_acqf(
        acqf, bounds, q=2, num_restarts=6, raw_samples=48,
        key=jax.random.PRNGKey(1), maxiter=80,
        equality_constraints=eq, inequality_constraints=ineq,
    )
    viol = float(linear_violation(cand[None], ineq, eq)[0])
    assert viol <= 1e-6, viol
    # optimum: x0 = 0.5 (capped), x1 = 0, x2 = 0.7 -> sum = 1.2.
    # Location tolerance is TPU-recalibrated: the on-chip f32 AL ascent
    # stalls within 5e-3 of the optimum ALONG the equality manifold
    # (measured r5: [0.49539, 0, 0.70461], objective suboptimality
    # 2.3e-3, constraint sum exact to 1e-4) while CPU lands at ~1e-6.
    # The contract this test pins is feasibility (above, 1e-6 on both
    # platforms); the location check guards gross misconvergence only.
    np.testing.assert_allclose(
        np.asarray(cand), [[0.5, 0.0, 0.7]] * 2, atol=8e-3
    )
    assert np.isfinite(float(val))


def test_inequality_constraint_tight_feasibility():
    """The AL path must not return the slightly-infeasible interior-
    penalty compromise: check the active constraint is satisfied, not
    approximately satisfied."""
    acqf = lambda X: jnp.sum(X)  # pushes against the constraint
    bounds = jnp.stack([jnp.zeros(2), jnp.ones(2)])
    ineq = [((0, 1), (-1.0, -1.0), -1.0)]  # x0 + x1 <= 1
    cand, _ = optimize_acqf(
        acqf, bounds, q=1, num_restarts=4, raw_samples=32,
        key=jax.random.PRNGKey(2), maxiter=60,
        inequality_constraints=ineq,
    )
    s = float(jnp.sum(cand))
    assert s <= 1.0 + 1e-6, s
    assert s >= 1.0 - 1e-3  # and it actually reaches the boundary


def test_infeasible_restarts_fall_back():
    """With an infeasible nonlinear constraint, the most-feasible
    candidate is still returned (no NaN/-inf crash) — reference
    fallback-to-starting-point semantics."""
    acqf = lambda X: -jnp.sum((X - 0.5) ** 2)
    g = lambda x: -1.0 - jnp.sum(x**2)  # never satisfiable
    bounds = jnp.stack([jnp.zeros(2), jnp.ones(2)])
    cand, val = optimize_acqf(
        acqf, bounds, q=1, num_restarts=4, raw_samples=16,
        key=jax.random.PRNGKey(3), maxiter=20,
        nonlinear_inequality_constraints=[g],
    )
    assert np.isfinite(np.asarray(cand)).all()
    assert np.isfinite(float(val))


def test_equality_polytope_sampling():
    from botorch_tpu.utils.sampling import get_polytope_samples

    key = jax.random.PRNGKey(4)
    bounds = jnp.stack([jnp.zeros(3), jnp.ones(3)])
    P = np.asarray(
        get_polytope_samples(
            key, 64, bounds,
            inequality_constraints=[((0,), (1.0,), 0.1)],  # x0 >= 0.1
            equality_constraints=[((0, 1, 2), (1.0, 1.0, 1.0), 1.5)],
        )
    )
    np.testing.assert_allclose(P.sum(-1), 1.5, atol=1e-5)
    assert (P[:, 0] >= 0.1 - 1e-5).all()
    assert (P >= -1e-5).all() and (P <= 1 + 1e-5).all()
    assert P.std(0).min() > 0.03  # spread, not stuck at one point


def test_interpoint_equality_constraint():
    """Inter-point equality (reference 2-d-indices form,
    `parameter_constraints.py:29-66`): candidate 0 and candidate 1 must
    share their first coordinate. Both candidates want (0.3, 0.7)."""
    acqf = lambda X: -jnp.sum((X - jnp.asarray([0.3, 0.7])) ** 2)
    bounds = jnp.stack([jnp.zeros(2), jnp.ones(2)])
    # x[0,0] - x[1,0] = 0
    eq = [(((0, 0), (1, 0)), (1.0, -1.0), 0.0)]
    cand, val = optimize_acqf(
        acqf, bounds, q=2, num_restarts=4, raw_samples=24,
        key=jax.random.PRNGKey(0), maxiter=60, equality_constraints=eq,
    )
    c = np.asarray(cand)
    assert abs(c[0, 0] - c[1, 0]) <= 1e-6, c
    np.testing.assert_allclose(c, [[0.3, 0.7]] * 2, atol=2e-3)
    viol = float(linear_violation(cand[None], None, eq)[0])
    assert viol <= 1e-6


def test_interpoint_inequality_budget():
    """Inter-point inequality: total budget over the q-batch,
    sum of all coordinates of both candidates <= 1.2 (expressed as
    -sum >= -1.2). The unconstrained optimum (all 0.9) is infeasible."""
    acqf = lambda X: jnp.sum(X)
    bounds = jnp.stack([jnp.zeros(2), jnp.ones(2)])
    idx = ((0, 0), (0, 1), (1, 0), (1, 1))
    ineq = [(idx, (-1.0, -1.0, -1.0, -1.0), -1.2)]
    cand, _ = optimize_acqf(
        acqf, bounds, q=2, num_restarts=4, raw_samples=24,
        key=jax.random.PRNGKey(1), maxiter=60,
        inequality_constraints=ineq,
    )
    s = float(jnp.sum(cand))
    assert s <= 1.2 + 1e-6, s
    assert s >= 1.2 - 5e-3  # reaches the budget boundary


def test_duplicate_indices_accumulate():
    """((0, 0), (1.0, 1.0), 1.0) means 2*x0 >= 1 (coefficients on
    repeated indices SUM — the r3 dense-row builder regression test)."""
    from botorch_tpu.optim.constraints import _dense_rows, _dense_rows_flat

    A, b = _dense_rows([((0, 0), (1.0, 1.0), 1.0)], d=2)
    np.testing.assert_allclose(A, [[2.0, 0.0]])
    Af, bf = _dense_rows_flat([((0, 0), (1.0, 1.0), 1.0)], q=2, d=2)
    np.testing.assert_allclose(Af, [[2.0, 0.0, 0.0, 0.0],
                                    [0.0, 0.0, 2.0, 0.0]])
    # inter-point with a repeated (q_i, d_i) pair
    Aj, bj = _dense_rows_flat(
        [((((0, 0)), ((0, 0))), (1.0, 2.0), 0.5)], q=1, d=2
    )
    np.testing.assert_allclose(Aj, [[3.0, 0.0]])
    # end-to-end: maximize x0 subject to 2*x0 >= 1 and x0 <= 0.4 is
    # infeasible; 2*x0 >= 1 alone binds at x0 = 0.5 when minimizing x0
    acqf = lambda X: -jnp.sum(X[..., 0])
    bounds = jnp.stack([jnp.zeros(2), jnp.ones(2)])
    cand, _ = optimize_acqf(
        acqf, bounds, q=1, num_restarts=4, raw_samples=16,
        key=jax.random.PRNGKey(5), maxiter=40,
        inequality_constraints=[((0, 0), (1.0, 1.0), 1.0)],
    )
    x0 = float(cand[0, 0])
    assert x0 >= 0.5 - 1e-6, x0  # NOT 1.0 (the old assignment bug's bound)
    assert x0 <= 0.5 + 1e-3


def test_redundant_consistent_equalities_accepted():
    """Intra-point equality expanded over q plus a consistent inter-point
    tie produces linearly dependent flattened rows — must be accepted
    (rank-reduced), while an inconsistent system raises."""
    acqf = lambda X: -jnp.sum((X - 0.7) ** 2)
    bounds = jnp.stack([jnp.zeros(2), jnp.ones(2)])
    eq = [
        ((0,), (1.0,), 0.5),  # x0 = 0.5 for BOTH candidates (expanded)
        (((0, 0), (1, 0)), (1.0, -1.0), 0.0),  # redundant tie
    ]
    cand, _ = optimize_acqf(
        acqf, bounds, q=2, num_restarts=3, raw_samples=12,
        key=jax.random.PRNGKey(6), maxiter=40, equality_constraints=eq,
    )
    c = np.asarray(cand)
    np.testing.assert_allclose(c[:, 0], 0.5, atol=1e-6)
    # inconsistent: x0 = 0.5 and x0 = 0.8
    from botorch_tpu.optim.constraints import AffineSubspace, _dense_rows_flat

    import pytest as _pytest
    with _pytest.raises(ValueError, match="inconsistent"):
        AffineSubspace.from_dense(
            *_dense_rows_flat(
                [((0,), (1.0,), 0.5), ((0,), (1.0,), 0.8)], q=1, d=2
            )
        )
