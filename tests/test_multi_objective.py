"""Multi-objective stack tests: Pareto, hypervolume (vs Monte Carlo and
closed forms), box decompositions (coverage/disjointness), qEHVI exactness
vs brute force (reference test models: `test/utils/multi_objective/`,
`test/acquisition/multi_objective/`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from botorch_tpu.acquisition.multi_objective import (
    _hvi_from_cells,
    _subset_masks,
    make_qehvi,
    make_qnehvi,
    qExpectedHypervolumeImprovement,
    qLogNoisyExpectedHypervolumeImprovement,
)
from botorch_tpu.fit import fit_gp
from botorch_tpu.models.gp import make_gp
from botorch_tpu.test_functions.multi_objective import (
    MO_PROBLEMS,
    BraninCurrin,
    DTLZ2,
    ZDT1,
)
from botorch_tpu.utils.multi_objective import (
    dominated_hypervolume_np,
    hypervolume,
    hypervolume_2d,
    infer_reference_point,
    is_non_dominated,
    nondominated_hypercell_bounds_2d,
    nondominated_hypercell_bounds_np,
)


def test_is_non_dominated():
    Y = jnp.asarray([[1.0, 3.0], [2.0, 2.0], [3.0, 1.0], [1.0, 1.0], [2.0, 2.0]])
    mask = np.asarray(is_non_dominated(Y))
    np.testing.assert_array_equal(mask, [True, True, True, False, False])


def test_hypervolume_2d_closed_form():
    Y = jnp.asarray([[1.0, 3.0], [2.0, 2.0], [3.0, 1.0]])
    assert abs(float(hypervolume_2d(Y, jnp.zeros(2))) - 6.0) < 1e-6


@pytest.mark.parametrize("m,n", [(2, 10), (3, 8), (4, 6)])
def test_hypervolume_vs_monte_carlo(m, n):
    rng = np.random.default_rng(m * 10 + n)
    P = rng.uniform(0.1, 1, (n, m))
    hv = hypervolume(P, np.zeros(m))
    pts = rng.uniform(0, 1, (200000, m))
    dom = ((pts[:, None, :] <= P[None]).all(-1)).any(1)
    assert abs(hv - dom.mean()) < 4.0 / np.sqrt(200000)


@pytest.mark.parametrize("m", [3, 4])
def test_decomposition_partitions_nondominated_space(m):
    rng = np.random.default_rng(m)
    P = rng.uniform(0.1, 1, (6, m))
    P = P[np.asarray(is_non_dominated(jnp.asarray(P)))]
    lo, up = nondominated_hypercell_bounds_np(P, np.zeros(m), clip_max=np.inf)
    pts = rng.uniform(0, 1, (20000, m))
    dominated = ((pts[:, None, :] <= P[None]).all(-1)).any(1)
    inside = ((pts[:, None, :] >= lo[None]) & (pts[:, None, :] < up[None])).all(-1)
    count = inside.sum(1)
    assert count[dominated].max(initial=0) == 0
    assert (count[~dominated] == 1).all()


@pytest.mark.parametrize("m,q", [(2, 1), (2, 2), (3, 2)])
def test_hvi_inclusion_exclusion_exact(m, q):
    rng = np.random.default_rng(q * 7 + m)
    P = rng.uniform(0.2, 0.9, (6, m))
    P = P[np.asarray(is_non_dominated(jnp.asarray(P)))]
    ref = np.zeros(m)
    hv0 = hypervolume(P, ref)
    if m == 2:
        lo, up = nondominated_hypercell_bounds_2d(
            jnp.asarray(P), jnp.zeros(2), clip_max=1e8
        )
    else:
        l, u = nondominated_hypercell_bounds_np(P, ref, clip_max=1e8)
        lo, up = jnp.asarray(l, jnp.float32), jnp.asarray(u, jnp.float32)
    masks, signs = _subset_masks(q)
    for _ in range(5):
        F = rng.uniform(0.0, 1.1, (q, m))
        hvi = float(
            _hvi_from_cells(jnp.asarray(F, jnp.float32), lo, up, masks, signs)
        )
        brute = hypervolume(np.concatenate([P, F], 0), ref) - hv0
        assert abs(hvi - brute) < 1e-5


def _np_hv2d(P, ref):
    P = P[(P > ref).all(-1)]
    if len(P) == 0:
        return 0.0
    # staircase sweep
    nd = []
    for p in P:
        if not any((q[0] >= p[0]) and (q[1] >= p[1]) and (q != p).any()
                   for q in P):
            nd.append(p)
    P = np.asarray(sorted(nd, key=lambda p: p[0]))
    hv, prev0 = 0.0, ref[0]
    for p in P:
        hv += (p[0] - prev0) * (p[1] - ref[1])
        prev0 = p[0]
    return hv


def test_qehvi_matches_brute_force_mc():
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(20, 2)), jnp.float32)
    # easy 2-objective surface in [0,1]^2
    Y = jnp.stack([jnp.sin(3 * X[:, 0]), jnp.cos(3 * X[:, 1])], axis=-1)
    ref = jnp.asarray([-1.5, -1.5])
    model = fit_gp(make_gp(X, Y), jax.random.PRNGKey(0), num_restarts=2,
                   maxiter=30)
    acqf = make_qehvi(
        qExpectedHypervolumeImprovement, model, ref, q=1, Y_baseline=Y,
        num_samples=2048,
    )
    Xq = jnp.asarray([[0.5, 0.5]], jnp.float32)
    v = float(acqf(Xq))
    front = np.asarray(Y)[np.asarray(is_non_dominated(Y))]
    front = front[(front > np.asarray(ref)).all(-1)]
    hv0 = hypervolume(front, np.asarray(ref))
    post = model.posterior(Xq)
    s = np.asarray(post.rsample(jax.random.PRNGKey(7), (300,)))
    brute = np.mean(
        [_np_hv2d(np.concatenate([front, s[i]], 0), np.asarray(ref)) - hv0
         for i in range(300)]
    )
    assert abs(v - brute) < 0.05 * max(abs(brute), 0.1)


def test_qnehvi_2d_runs_with_gradient():
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(10, 2)), jnp.float32)
    Y = jnp.stack([jnp.sin(3 * X[:, 0]), jnp.cos(3 * X[:, 1])], axis=-1)
    ref = jnp.asarray([-1.5, -1.5])
    model = fit_gp(make_gp(X, Y), jax.random.PRNGKey(0), num_restarts=2,
                   maxiter=20)
    acqf = make_qnehvi(
        qLogNoisyExpectedHypervolumeImprovement, model, ref, q=1,
        X_baseline=X, num_samples=32,
    )
    Xq = jnp.asarray([[0.4, 0.6]], jnp.float32)
    v = float(acqf(Xq))
    g = np.asarray(jax.grad(lambda x: acqf(x))(Xq))
    assert np.isfinite(v)
    assert np.isfinite(g).all()


def test_qnehvi_3d_cached_cells():
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(8, 2)), jnp.float32)
    Y = jnp.stack(
        [jnp.sin(3 * X[:, 0]), jnp.cos(3 * X[:, 1]), X[:, 0] * X[:, 1]],
        axis=-1,
    )
    ref = jnp.asarray([-1.5, -1.5, -0.5])
    model = fit_gp(make_gp(X, Y), jax.random.PRNGKey(0), num_restarts=2,
                   maxiter=20)
    acqf = make_qnehvi(
        qLogNoisyExpectedHypervolumeImprovement, model, ref, q=1,
        X_baseline=X, num_samples=32,
    )
    assert acqf.cell_lower is not None
    assert acqf.cell_lower.shape[0] == 32  # per-sample cells
    v = float(acqf(jnp.asarray([[0.4, 0.6]], jnp.float32)))
    assert np.isfinite(v)


def test_qnehvi_3d_constrained_via_factory():
    # regression (r3 advisor, medium): the m>2 factory branch used to
    # precompute cells unconditionally, which the constrained eval path
    # rejects — every outcome-constrained m>=3 qNEHVI built via
    # make_qnehvi then failed on evaluation
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(8, 2)), jnp.float32)
    Y = jnp.stack(
        [jnp.sin(3 * X[:, 0]), jnp.cos(3 * X[:, 1]), X[:, 0] * X[:, 1]],
        axis=-1,
    )
    ref = jnp.asarray([-1.5, -1.5, -0.5])
    model = fit_gp(make_gp(X, Y), jax.random.PRNGKey(0), num_restarts=2,
                   maxiter=20)
    acqf = make_qnehvi(
        qLogNoisyExpectedHypervolumeImprovement, model, ref, q=1,
        X_baseline=X, num_samples=16,
        constraints=[lambda s: s[..., 0] + 1.0],  # feasible iff f0 > -1
    )
    # constrained construction must NOT carry construction-time cells
    assert acqf.cell_lower is None
    Xq = jnp.asarray([[0.4, 0.6]], jnp.float32)
    v = float(acqf(Xq))
    g = np.asarray(jax.grad(lambda x: acqf(x))(Xq))
    assert np.isfinite(v)
    assert np.isfinite(g).all()


def test_mo_problem_shapes_and_ref():
    for name, cls in MO_PROBLEMS.items():
        kwargs = {}
        prob = cls(**kwargs)
        X = jnp.asarray(
            np.random.default_rng(0).uniform(size=(4, prob.dim)), jnp.float32
        )
        X = prob.bounds[0] + (prob.bounds[1] - prob.bounds[0]) * X
        Y = prob(X)
        assert Y.shape == (4, prob.num_objectives), name
        assert np.isfinite(np.asarray(Y)).all(), name
        assert prob.ref_point.shape == (prob.num_objectives,)


def test_zdt1_known_front():
    # ZDT1 optimal front: x1 free, rest 0 -> f1 = 1 - sqrt(f0)
    prob = ZDT1(dim=5)
    x = jnp.zeros((3, 5)).at[:, 0].set(jnp.asarray([0.0, 0.25, 1.0]))
    Y = np.asarray(prob(x))
    np.testing.assert_allclose(Y[:, 1], 1 - np.sqrt(Y[:, 0]), atol=1e-5)


def test_infer_reference_point():
    Y = jnp.asarray([[1.0, 3.0], [2.0, 2.0], [3.0, 1.0]])
    ref = np.asarray(infer_reference_point(Y))
    assert (ref < 1.0).all()  # below the nadir


def test_analytic_ehvi_matches_qmc():
    from botorch_tpu.acquisition.multi_objective import make_ehvi

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(20, 2)), jnp.float32)
    Y = jnp.stack([jnp.sin(3 * X[:, 0]), jnp.cos(3 * X[:, 1])], axis=-1)
    ref = jnp.asarray([-1.5, -1.5])
    model = fit_gp(make_gp(X, Y), jax.random.PRNGKey(0), num_restarts=2,
                   maxiter=25)
    ehvi = make_ehvi(model, ref, Y)
    qehvi = make_qehvi(
        qExpectedHypervolumeImprovement, model, ref, q=1, Y_baseline=Y,
        num_samples=4096,
    )
    for pt in [[0.5, 0.5], [0.3, 0.2]]:
        x = jnp.asarray([pt], jnp.float32)
        a, q = float(ehvi(x)), float(qehvi(x))
        assert abs(a - q) < 0.05 * max(a, 1e-4) + 1e-4


def test_mvar_and_mars():
    from botorch_tpu.acquisition.objective import mars_risk, mvar_risk

    s = jnp.asarray(
        np.random.default_rng(0).normal(size=(16, 8, 2)), jnp.float32
    )
    mv = mvar_risk(n_w=4, alpha=0.75)(s)
    assert mv.shape == (16, 2, 2)
    w = jnp.asarray([0.5, 0.5])
    yb = jnp.stack([-2 * jnp.ones(2), 2 * jnp.ones(2)])
    ms = mars_risk(n_w=4, weights=w, Y_bounds=yb, alpha=0.75)(s)
    assert ms.shape == (16, 2)
    assert np.isfinite(np.asarray(ms)).all()


def _brute_force_mvar(Y, alpha):
    """Reference-semantics MVaR of one block (numpy, full-grid CDF
    counting): non-dominated points of the sample grid with CDF >=
    ceil(alpha n_w) (`multi_output_risk_measures.py:298-387`)."""
    import itertools as it
    import math

    n_w, m = Y.shape
    alpha_count = math.ceil(alpha * n_w)
    grid = np.asarray(
        [list(p) for p in it.product(*[sorted(Y[:, j]) for j in range(m)])]
    )
    cdf = (Y[:, None, :] >= grid[None, :, :]).all(-1).sum(0)
    if (cdf == alpha_count).any():
        thr = alpha_count
    else:
        thr = cdf[cdf > alpha_count].min()
    pts = grid[cdf == thr]
    keep = []
    for i, p in enumerate(pts):
        dom = any(
            (q >= p).all() and (q > p).any() for j, q in enumerate(pts)
        )
        if not dom:
            keep.append(tuple(p))
    return sorted(set(keep))


def test_mvar_exact_matches_brute_force_on_correlated_samples():
    from botorch_tpu.acquisition.objective import mvar_exact_risk, mvar_risk

    rng = np.random.default_rng(3)
    n_w, m, alpha = 8, 2, 0.75
    # strongly correlated outputs — the regime where the coordinatewise
    # approximation is infeasible (dominates < alpha of the scenarios)
    z = rng.normal(size=(5, n_w, 1))
    Y = np.concatenate([z + 0.1 * rng.normal(size=(5, n_w, 1)),
                        -z + 0.1 * rng.normal(size=(5, n_w, 1))], axis=-1)
    s = jnp.asarray(Y.reshape(1, 5 * n_w, m), jnp.float32)
    out = np.asarray(mvar_exact_risk(n_w, alpha)(s))  # (1, 5*n_w, m)
    assert out.shape == (1, 5 * n_w, m)
    for b in range(5):
        expected = _brute_force_mvar(Y[b].astype(np.float32), alpha)
        got = sorted(
            set(map(tuple, out[0, b * n_w : (b + 1) * n_w]))
        )
        assert len(got) == len(expected), (b, got, expected)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(expected), rtol=1e-5, atol=1e-6
        )
        # every exact MVaR point dominates >= alpha of the scenarios ...
        Yb = Y[b].astype(np.float32)
        for p in got:
            frac = (Yb >= np.asarray(p, np.float32)).all(-1).mean()
            assert frac >= alpha - 1e-6
    # ... while the coordinatewise VaR vector here dominates far fewer
    cw = np.asarray(mvar_risk(n_w, alpha)(s))[0]
    feas = [
        (Y[b].astype(np.float32) >= cw[b]).all(-1).mean() for b in range(5)
    ]
    assert min(feas) < alpha  # documents why the exact version exists

    # expectation mode: mean of the (tight) set, one row per block
    exp_out = np.asarray(
        mvar_exact_risk(n_w, alpha, expectation=True)(s)
    )
    assert exp_out.shape == (1, 5, m)
    for b in range(5):
        expected = np.mean(
            np.asarray(_brute_force_mvar(Y[b].astype(np.float32), alpha)),
            axis=0,
        )
        np.testing.assert_allclose(exp_out[0, b], expected, rtol=1e-4,
                                   atol=1e-5)

    # gradients flow onto the samples (Daulton2022 approximate-gradient)
    g = jax.grad(lambda ss: jnp.sum(mvar_exact_risk(n_w, alpha)(ss)))(s)
    g = np.asarray(g)
    assert np.isfinite(g).all() and (np.abs(g) > 0).any()


def test_mvar_exact_m3_and_fallback_level():
    from botorch_tpu.acquisition.objective import mvar_exact_risk

    rng = np.random.default_rng(0)
    n_w, m = 6, 3
    Y = rng.normal(size=(2, n_w, m))
    s = jnp.asarray(Y.reshape(1, 2 * n_w, m), jnp.float32)
    # alpha such that ceil(alpha n_w) may have no exact-level point —
    # exercises the smallest-alpha'-above fallback
    for alpha in (0.5, 0.9, 1.0):
        out = np.asarray(mvar_exact_risk(n_w, alpha)(s))
        assert out.shape == (1, 2 * n_w, m)
        for b in range(2):
            expected = _brute_force_mvar(Y[b].astype(np.float32), alpha)
            got = sorted(set(map(tuple, out[0, b * n_w : (b + 1) * n_w])))
            assert len(got) == len(expected), (alpha, b)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(expected), rtol=1e-5, atol=1e-6
            )


def test_mvar_exact_grid_envelope_guard():
    """Past G = (n_w - ceil(alpha n_w) + 1)^m = 4096 grid points the G^2
    dominance masks would OOM the compile — the risk factory must fail
    loudly with guidance instead (r4 verdict weak #7)."""
    import pytest as _pytest

    from botorch_tpu.acquisition.objective import mvar_exact_risk

    # n_w=128, alpha=0.8, m=3 -> G = 27^3 = 19683 > 4096
    s = jnp.zeros((1, 128, 3), jnp.float32)
    with _pytest.raises(ValueError, match="envelope"):
        mvar_exact_risk(128, 0.8)(s)
    # just inside: n_w=24, alpha=0.75, m=3 -> G = 7^3 = 343 works
    s2 = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 24, 3)), jnp.float32
    )
    out = mvar_exact_risk(24, 0.75)(s2)
    assert np.isfinite(np.asarray(out)).all()


def test_pfes_truncated_entropy_matches_monte_carlo():
    # Entropy of a Gaussian truncated to the dominated staircase: the
    # closed form must match direct MC estimation of -E[log p_trunc].
    from botorch_tpu.acquisition.pareto_frontier_entropy_search import (
        _staircase_cells_2d,
        _truncated_union_entropy,
    )

    front = jnp.asarray([[1.0, 3.0], [2.0, 2.0], [3.0, 1.0]], jnp.float32)
    l1, u1, u2 = _staircase_cells_2d(front, 5)
    mu = jnp.asarray([1.5, 1.5])
    sigma = jnp.asarray([1.0, 1.2])
    H, logZ = _truncated_union_entropy(mu, sigma, l1, u1, u2)

    rng = np.random.default_rng(0)
    y = rng.normal(size=(400_000, 2)) * np.asarray(sigma) + np.asarray(mu)
    f = np.asarray(front)
    dominated = np.zeros(len(y), bool)
    for j in range(len(f)):
        dominated |= (y[:, 0] <= f[j, 0]) & (y[:, 1] <= f[j, 1])
    Z_mc = dominated.mean()
    assert abs(float(jnp.exp(logZ)) - Z_mc) < 3e-3
    yd = y[dominated]
    logp = (
        -0.5 * np.sum(((yd - np.asarray(mu)) / np.asarray(sigma)) ** 2, -1)
        - np.log(2 * np.pi * float(sigma[0]) * float(sigma[1]))
        - np.log(Z_mc)
    )
    H_mc = -logp.mean()
    assert abs(float(H) - H_mc) < 5e-3
    # gradients of the closed form are finite and nonzero
    g = jax.grad(
        lambda m: _truncated_union_entropy(m, sigma, l1, u1, u2)[0]
    )(mu)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).max()) > 1e-3


def test_pfes_values_and_gradients():
    from botorch_tpu.acquisition.pareto_frontier_entropy_search import make_pfes
    from botorch_tpu.optim.optimize import optimize_acqf

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(15, 2)), jnp.float32)
    Y = jnp.stack([jnp.sin(3 * X[:, 0]), jnp.cos(3 * X[:, 1])], axis=-1)
    model = fit_gp(make_gp(X, Y), jax.random.PRNGKey(0), num_restarts=2,
                   maxiter=25)
    ub = jnp.stack([jnp.zeros(2), jnp.ones(2)])
    pfes = make_pfes(model, ub, jax.random.PRNGKey(1), num_fronts=6,
                     grid_size=256)
    pts = jnp.asarray(rng.uniform(size=(8, 1, 2)), jnp.float32)
    vals = jax.vmap(pfes)(pts)
    grads = jax.vmap(jax.grad(lambda x: pfes(x)))(pts)
    assert np.isfinite(np.asarray(vals)).all()
    assert np.isfinite(np.asarray(grads)).all()
    # information gain is nonnegative and nonzero somewhere
    assert float(vals.min()) >= -1e-4
    assert float(vals.max()) > 0.05
    assert float(jnp.abs(grads).max()) > 0.1
    cand, val = optimize_acqf(
        pfes, ub, q=1, num_restarts=4, raw_samples=32,
        key=jax.random.PRNGKey(2), maxiter=30,
    )
    assert float(val) >= float(vals.max()) - 1e-4


def test_hypervolume_incl_excl_matches_exact():
    """Differentiable general-m HV equals the exact decomposition-based
    hypervolume, with finite-difference-correct gradients."""
    from botorch_tpu.utils.multi_objective import hypervolume_incl_excl

    rng = np.random.default_rng(0)
    for m, q in [(2, 5), (3, 6), (4, 4)]:
        Y = jnp.asarray(rng.uniform(0.2, 1.0, size=(q, m)), jnp.float32)
        hv = float(hypervolume_incl_excl(Y, jnp.zeros(m)))
        front = np.asarray(Y)[np.asarray(is_non_dominated(Y))]
        exact = hypervolume(front, np.zeros(m))
        assert abs(hv - exact) < 1e-5
    Y = jnp.asarray(rng.uniform(0.2, 1.0, size=(5, 3)), jnp.float32)
    g = jax.grad(lambda y: hypervolume_incl_excl(y, jnp.zeros(3)))(Y)
    t = 1e-3
    fd = (
        float(hypervolume_incl_excl(Y.at[2, 1].add(t), jnp.zeros(3)))
        - float(hypervolume_incl_excl(Y.at[2, 1].add(-t), jnp.zeros(3)))
    ) / (2 * t)
    assert abs(fd - float(g[2, 1])) < 1e-3


def test_qhvkg_three_objectives():
    """qHVKG for m = 3 via the inclusion-exclusion hypervolume: finite
    gradients and positive optimized expected HV gain."""
    from botorch_tpu.acquisition.hypervolume_knowledge_gradient import (
        make_qhvkg,
    )
    from botorch_tpu.optim.optimize import optimize_acqf

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(16, 2)), jnp.float32)
    Y = jnp.stack([
        jnp.sin(3 * X[:, 0]), jnp.cos(3 * X[:, 1]),
        jnp.sin(2 * (X[:, 0] + X[:, 1])),
    ], -1)
    model = fit_gp(make_gp(X, Y), jax.random.PRNGKey(0), num_restarts=2,
                   maxiter=25)
    ref = jnp.asarray([-1.2, -1.2, -1.2])
    hvkg = make_qhvkg(model, ref, Y_baseline=Y, q=1, num_fantasies=4,
                      q_inner=6)
    na = hvkg.get_augmented_q_batch_size()
    Xf = jnp.asarray(rng.uniform(size=(na, 2)), jnp.float32)
    g = jax.grad(lambda x: hvkg(x))(Xf)
    assert np.isfinite(np.asarray(g)).all()
    ub = jnp.stack([jnp.zeros(2), jnp.ones(2)])
    cand, val = optimize_acqf(hvkg, ub, q=na, num_restarts=4, raw_samples=24,
                              key=jax.random.PRNGKey(1), maxiter=30)
    assert float(val) > 0.0  # positive expected hypervolume gain
    assert hvkg.extract_candidates(cand).shape == (1, 2)


def test_pfes_three_objectives():
    """General-m PFES: the truncated-union entropy over [Lacour17]
    dominated cells matches Monte Carlo at m = 3, and the acquisition
    optimizes with finite gradients."""
    from botorch_tpu.acquisition.pareto_frontier_entropy_search import (
        _truncated_union_entropy_cells,
        make_pfes,
    )
    from botorch_tpu.optim.optimize import optimize_acqf
    from botorch_tpu.utils.multi_objective import (
        dominated_hypercell_bounds_np,
    )

    rng = np.random.default_rng(0)
    front = np.array([
        [1.0, 2.5, 2.0], [2.0, 1.5, 2.2], [2.6, 0.8, 1.0], [1.5, 2.0, 2.8],
    ])
    lo, up = dominated_hypercell_bounds_np(front, np.full(3, -1e8))
    mu = jnp.asarray([1.2, 1.4, 1.6])
    sigma = jnp.asarray([1.0, 1.2, 0.9])
    H, logZ = _truncated_union_entropy_cells(
        mu, sigma, jnp.asarray(lo, jnp.float32), jnp.asarray(up, jnp.float32)
    )
    y = rng.normal(size=(400000, 3)) * np.asarray(sigma) + np.asarray(mu)
    dom = np.zeros(len(y), bool)
    for f in front:
        dom |= (y <= f).all(-1)
    Z_mc = dom.mean()
    yd = y[dom]
    logp = (
        -0.5 * np.sum(((yd - np.asarray(mu)) / np.asarray(sigma)) ** 2, -1)
        - np.log((2 * np.pi) ** 1.5 * np.prod(np.asarray(sigma)))
        - np.log(Z_mc)
    )
    assert abs(float(H) - (-logp.mean())) < 1e-2
    assert abs(float(jnp.exp(logZ)) - Z_mc) < 3e-3

    X = jnp.asarray(rng.uniform(size=(15, 2)), jnp.float32)
    Y3 = jnp.stack([
        jnp.sin(3 * X[:, 0]), jnp.cos(3 * X[:, 1]),
        jnp.sin(2 * (X[:, 0] + X[:, 1])),
    ], -1)
    m3 = fit_gp(make_gp(X, Y3), jax.random.PRNGKey(0), num_restarts=2,
                maxiter=25)
    ub = jnp.stack([jnp.zeros(2), jnp.ones(2)])
    pf3 = make_pfes(m3, ub, jax.random.PRNGKey(1), num_fronts=6,
                    grid_size=256)
    pts = jnp.asarray(rng.uniform(size=(6, 1, 2)), jnp.float32)
    vals = jax.vmap(pf3)(pts)
    grads = jax.vmap(jax.grad(lambda x: pf3(x)))(pts)
    assert np.isfinite(np.asarray(vals)).all()
    assert float(vals.min()) >= -1e-4 and float(vals.max()) > 0.05
    assert np.isfinite(np.asarray(grads)).all()
    _, v3 = optimize_acqf(pf3, ub, q=1, num_restarts=4, raw_samples=32,
                          key=jax.random.PRNGKey(2), maxiter=30)
    assert float(v3) >= float(vals.max()) - 1e-4


def test_dominated_hypercell_bounds_any_m():
    """Dominated-region cells: disjoint, exhaustive (MC membership), and
    volumes summing to the exact dominated hypervolume."""
    from botorch_tpu.utils.multi_objective import (
        dominated_hypercell_bounds_np,
        dominated_hypervolume_np,
    )

    rng = np.random.default_rng(0)
    for m in [2, 3, 4]:
        Y = rng.uniform(0.2, 1.0, size=(12, m))
        front = Y[np.asarray(is_non_dominated(jnp.asarray(Y)))]
        ref = np.zeros(m)
        lo, up = dominated_hypercell_bounds_np(front, ref)
        vol = np.sum(np.prod(np.clip(up - lo, 0, None), axis=-1))
        assert abs(vol - dominated_hypervolume_np(front, ref)) < 1e-6
        pts = rng.uniform(0, 1, size=(8000, m))
        dominated = np.zeros(len(pts), bool)
        for f in front:
            dominated |= (pts <= f).all(-1)
        inside = (
            (pts[:, None, :] >= lo[None]) & (pts[:, None, :] <= up[None])
        ).all(-1)
        cnt = inside.sum(1)
        assert np.all(cnt[dominated] == 1)
        assert np.all(cnt[~dominated] == 0)


def _toy_mo_model(n=10, noise=1e-4, seed=0):
    key = jax.random.PRNGKey(seed)
    X = jax.random.uniform(key, (n, 2))
    Y = jnp.stack(
        [-jnp.sum((X - 0.25) ** 2, -1), -jnp.sum((X - 0.75) ** 2, -1)], -1
    )
    Yvar = None if noise is None else jnp.full(Y.shape, noise)
    return fit_gp(make_gp(X, Y, train_Yvar=Yvar), num_restarts=2, maxiter=60)


def test_mo_jes_matches_conditioned_model():
    """MO-JES's rank-P front conditioning must agree with an independent
    path: condition the (tiny-noise) model on the sampled front via
    `condition_on_observations`, then evaluate the same cell-truncated
    entropy on the conditioned posterior."""
    from botorch_tpu.acquisition.multi_objective_entropy_search import (
        _entropy_cells_noisy,
        _output_noise,
        make_mo_jes,
    )

    model = _toy_mo_model()
    bounds = jnp.stack([jnp.zeros(2), jnp.ones(2)])
    jes = make_mo_jes(
        model, bounds, jax.random.PRNGKey(5),
        num_pareto_samples=1, num_pareto_points=6,
        grid_size=128, num_features=128,
    )
    noise = _output_noise(model)
    nvalid = int(np.asarray(jes.pmask[0]).sum())
    Xs = jes.X_star[0, :nvalid]
    Ys = jes.Y_star[0, :nvalid]
    cond = model.condition_on_observations(Xs, Ys)
    for seed in range(4):
        x = jax.random.uniform(jax.random.PRNGKey(100 + seed), (1, 2))
        post0 = model.posterior(x)
        h0 = float(
            jnp.sum(
                0.5 * jnp.log(2 * jnp.pi * jnp.e * (post0.variance[0] + noise))
            )
        )
        post_c = cond.posterior(x)
        h_cond = float(
            _entropy_cells_noisy(
                post_c.mean[0], post_c.variance[0], noise,
                jes.cell_lower[0], jes.cell_upper[0],
            )
        )
        got = float(jes(x))
        assert abs(got - (h0 - h_cond)) < 0.03, (seed, got, h0 - h_cond)


def test_mo_pes_ep_matches_rejection_sampling():
    """MO-PES's EP-conditioned entropy vs rejection-sampling ground truth:
    sample the joint latent over [pareto | train | x], keep draws where no
    point dominates any pareto point, compare conditional entropies."""
    from botorch_tpu.acquisition.multi_objective_entropy_search import (
        _output_noise,
        make_mo_pes,
    )

    model = _toy_mo_model(n=6)
    bounds = jnp.stack([jnp.zeros(2), jnp.ones(2)])
    P = 3
    pes = make_mo_pes(
        model, bounds, jax.random.PRNGKey(7),
        num_pareto_samples=1, num_pareto_points=P,
        grid_size=128, num_features=128, ep_iters=16,
    )
    noise = np.asarray(_output_noise(model))
    rng = np.random.default_rng(0)
    for seed in range(3):
        x = jax.random.uniform(jax.random.PRNGKey(200 + seed), (1, 2))
        pts = jnp.concatenate([pes.X_star[0], model.X, x], axis=0)
        joint = model.posterior(pts)
        mean = np.asarray(joint.mean)  # (P+n+1, m)
        cov = np.asarray(joint.cov)  # (m, N, N)
        N = mean.shape[0]
        S = 200_000
        samples = np.stack(
            [
                rng.multivariate_normal(mean[:, o], cov[o] + 1e-9 * np.eye(N), S)
                for o in range(2)
            ],
            axis=-1,
        )  # (S, N, m)
        # acceptance: no other point dominates any pareto point
        acc = np.ones(S, bool)
        for i in range(P):
            diff = samples[:, i : i + 1, :] - samples  # (S, N, m)
            dominated_by = (diff <= 0).all(-1)  # j dominates i
            dominated_by[:, i] = False
            acc &= ~dominated_by.any(-1)
        assert acc.sum() > 500, f"rejection acceptance too low: {acc.sum()}"
        var_mc = samples[acc, -1, :].var(axis=0)  # (m,)
        h_mc = float(
            np.sum(0.5 * np.log(2 * np.pi * np.e * (var_mc + noise)))
        )
        post0 = model.posterior(x)
        h0 = float(
            np.sum(
                0.5 * np.log(
                    2 * np.pi * np.e * (np.asarray(post0.variance[0]) + noise)
                )
            )
        )
        h_ep = h0 - float(pes(x))
        assert abs(h_ep - h_mc) < 0.35, (seed, h_ep, h_mc)


def test_mo_jes_pes_optimize():
    """Both MO entropy acquisitions run through optimize_acqf."""
    from botorch_tpu.acquisition.multi_objective_entropy_search import (
        make_mo_jes,
        make_mo_pes,
    )
    from botorch_tpu.optim.optimize import optimize_acqf

    model = _toy_mo_model(n=8, noise=None)
    bounds = jnp.stack([jnp.zeros(2), jnp.ones(2)])
    for make in (make_mo_jes, make_mo_pes):
        acqf = make(
            model, bounds, jax.random.PRNGKey(11),
            num_pareto_samples=2, num_pareto_points=4,
            grid_size=64, num_features=64,
        )
        cand, val = optimize_acqf(
            acqf, bounds, q=1, num_restarts=2, raw_samples=16,
            key=jax.random.PRNGKey(12), maxiter=15,
        )
        assert cand.shape == (1, 2)
        assert np.isfinite(float(val))


def test_mo_jes_pes_qbatch():
    """q > 1 estimators: joint initial entropy minus per-candidate (JES,
    LB2/only-diagonal) or joint-logdet (PES) conditional entropies; the
    q=2 value of two identical candidates must be LESS than 2x the q=1
    value (information sub-additivity under duplication)."""
    from botorch_tpu.acquisition.multi_objective_entropy_search import (
        make_mo_jes,
        make_mo_pes,
    )

    model = _toy_mo_model(n=8)
    bounds = jnp.stack([jnp.zeros(2), jnp.ones(2)])
    for mk in (make_mo_jes, make_mo_pes):
        acqf = mk(
            model, bounds, jax.random.PRNGKey(3),
            num_pareto_samples=2, num_pareto_points=4,
            grid_size=64, num_features=64,
        )
        x = jax.random.uniform(jax.random.PRNGKey(4), (1, 2))
        v1 = float(acqf(x))
        vdup = float(acqf(jnp.concatenate([x, x], axis=0)))
        assert np.isfinite(vdup)
        assert vdup < 2.0 * v1 + 1e-4, (mk.__name__, v1, vdup)
        g = jax.grad(lambda z: acqf(z))(
            jax.random.uniform(jax.random.PRNGKey(5), (2, 2))
        )
        assert np.isfinite(np.asarray(g)).all()


def test_mesmo_lb_information_gain_properties():
    """MESMO-LB: MI is positive, decreases with distance from the data/
    front region, and handles q-batches."""
    from botorch_tpu.acquisition.multi_objective_entropy_search import (
        make_mesmo_lb,
    )

    model = _toy_mo_model()
    bounds = jnp.stack([jnp.zeros(2), jnp.ones(2)])
    acqf = make_mesmo_lb(
        model, bounds, jax.random.PRNGKey(2),
        num_pareto_samples=4, num_pareto_points=6, grid_size=128,
        num_features=128,
    )
    v_mid = float(acqf(jnp.asarray([[0.5, 0.5]])))
    assert np.isfinite(v_mid)
    # MI at an observed training point is smaller than at a far point
    # with high posterior uncertainty
    v_train = float(acqf(model.X[:1]))
    assert v_train <= v_mid + 1e-3
    # q-batch path
    vq = float(acqf(jnp.asarray([[0.5, 0.5], [0.9, 0.1]])))
    assert np.isfinite(vq)


def test_compute_sample_box_decomposition_layout():
    from botorch_tpu.acquisition.multi_objective_entropy_search import (
        compute_sample_box_decomposition,
    )
    from botorch_tpu.utils.multi_objective import hypervolume

    fronts = jnp.asarray(
        [[[1.0, 3.0], [2.0, 2.0], [3.0, 1.0]],
         [[0.5, 0.5], [0.4, 0.6], [0.6, 0.4]]]
    )  # (K=2, P=3, M=2)
    B = compute_sample_box_decomposition(fronts)
    assert B.shape[0] == 2 and B.shape[1] == 2 and B.shape[-1] == 2
    lo, up = B[:, 0], B[:, 1]
    assert bool(jnp.all(up >= lo))
    # cells tile the dominated region: total clipped volume above a ref
    # point equals the dominated hypervolume
    ref = jnp.asarray([0.0, 0.0])
    vol = jnp.prod(jnp.clip(up, 0.0) - jnp.clip(lo, 0.0), axis=-1).sum(-1)
    hv0 = hypervolume(fronts[0], ref)
    hv1 = hypervolume(fronts[1], ref)
    np.testing.assert_allclose(np.asarray(vol), [hv0, hv1], rtol=1e-5)
