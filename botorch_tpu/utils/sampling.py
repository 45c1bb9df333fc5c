r"""Sampling utilities: sphere/simplex draws, polytope hit-and-run,
batched multinomial, posterior-sample optimization.

Counterpart of `botorch/utils/sampling.py` (`sample_hypersphere :140`,
`sample_simplex :178`, `sample_polytope :219` hit-and-run,
`find_interior_point :376` Chebyshev-center LP, `HitAndRunPolytopeSampler
:581`, `get_polytope_samples :882`, `batched_multinomial :312`,
`optimize_posterior_samples :988`).

The hit-and-run walk is pure JAX (`lax.scan` over steps, vmappable over
chains); the interior-point LP runs host-side via scipy's HiGHS (non-hot
path, matching the reference's own CPU `linprog` usage).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def sample_hypersphere(key: Array, d: int, n: int = 1) -> Array:
    """Uniform points on the unit (d-1)-sphere."""
    z = jax.random.normal(key, (n, d))
    return z / jnp.linalg.norm(z, axis=-1, keepdims=True)


def sample_simplex(key: Array, d: int, n: int = 1) -> Array:
    """Uniform points on the probability simplex (sorted-uniform gaps)."""
    u = jax.random.uniform(key, (n, d - 1))
    u = jnp.sort(u, axis=-1)
    lo = jnp.concatenate([jnp.zeros((n, 1)), u], axis=-1)
    hi = jnp.concatenate([u, jnp.ones((n, 1))], axis=-1)
    return hi - lo


def batched_multinomial(key: Array, weights: Array, num_samples: int) -> Array:
    """Batched categorical sampling without replacement via Gumbel-top-k
    (`utils/sampling.py:312` semantics)."""
    logits = jnp.log(jnp.clip(weights, 1e-30))
    g = -jnp.log(-jnp.log(jax.random.uniform(key, logits.shape, minval=1e-20)))
    _, idx = jax.lax.top_k(logits + g, num_samples)
    return idx


def find_interior_point(
    A: np.ndarray, b: np.ndarray, bounds: Optional[np.ndarray] = None
) -> np.ndarray:
    """Chebyshev center of `{x : A x <= b}` via scipy linprog (host-side;
    reference `utils/sampling.py:376`)."""
    from scipy.optimize import linprog

    A = np.asarray(A, np.float64)
    b = np.asarray(b, np.float64)
    d = A.shape[-1]
    norms = np.linalg.norm(A, axis=-1, keepdims=True)
    # variables: (x, r); maximize r s.t. A x + |a_i| r <= b
    A_ub = np.concatenate([A, norms], axis=-1)
    c = np.zeros(d + 1)
    c[-1] = -1.0
    lp_bounds = [(None, None)] * d + [(0.0, None)]
    if bounds is not None:
        lp_bounds[:d] = [(float(bounds[0, i]), float(bounds[1, i])) for i in range(d)]
    res = linprog(c, A_ub=A_ub, b_ub=b, bounds=lp_bounds, method="highs")
    if not res.success or res.x[-1] <= 1e-12:
        raise ValueError("polytope appears empty or degenerate")
    return res.x[:d]


def sample_polytope(
    A: Array,
    b: Array,
    x0: Array,
    key: Array,
    n: int = 1,
    n_burnin: int = 200,
    thinning: int = 32,
) -> Array:
    """Hit-and-run sampling from `{x : A x <= b}` starting at the interior
    point `x0` (reference `utils/sampling.py:219`): pick a random
    direction, compute the feasible chord `[lo, hi]` from the constraint
    slacks, step uniformly along it. Pure `lax.scan`.
    """
    d = x0.shape[-1]
    total = n_burnin + n * thinning

    def step(x, k):
        k_dir, k_t = jax.random.split(k)
        u = jax.random.normal(k_dir, (d,))
        u = u / jnp.linalg.norm(u)
        au = A @ u
        slack = b - A @ x  # >= 0
        t = slack / jnp.where(jnp.abs(au) > 1e-12, au, 1e-12)
        t_pos = jnp.where(au > 1e-12, t, jnp.inf)
        t_neg = jnp.where(au < -1e-12, t, -jnp.inf)
        hi = jnp.min(t_pos)
        lo = jnp.max(t_neg)
        lam = jax.random.uniform(k_t, (), minval=0.0, maxval=1.0)
        lam = lo + lam * jnp.maximum(hi - lo, 0.0)
        x_new = x + lam * u
        # safety: reject if numerically infeasible
        ok = jnp.all(A @ x_new <= b + 1e-6)
        return jnp.where(ok, x_new, x), jnp.where(ok, x_new, x)

    keys = jax.random.split(key, total)
    _, xs = jax.lax.scan(step, x0, keys)
    return xs[n_burnin::thinning][:n]


def sample_polytope_delaunay(
    A: Array,
    b: Array,
    key: Array,
    n: int = 1,
    interior_point: Optional[np.ndarray] = None,
) -> Array:
    """Exact i.i.d. uniform samples from the bounded polytope
    `{x : A x <= b}` via Delaunay triangulation (reference
    `utils/sampling.py:707`, `DelaunayPolytopeSampler`).

    Setup (host-side scipy, one-off): enumerate vertices by halfspace
    intersection around an interior point, triangulate the hull, and
    compute simplex volumes. Sampling (device-side): volume-weighted
    simplex choice + uniform barycentric weights. Unlike hit-and-run
    this is exact and embarrassingly parallel, but vertex enumeration
    is exponential in the worst case — moderate dimensions only.
    """
    from scipy.spatial import Delaunay, HalfspaceIntersection

    A_np = np.asarray(A, np.float64)
    b_np = np.asarray(b, np.float64).reshape(-1)
    d = A_np.shape[-1]
    x0 = (
        np.asarray(interior_point, np.float64).reshape(-1)
        if interior_point is not None
        else find_interior_point(A_np, b_np)
    )
    if d == 1:
        # degenerate: a segment; qhull needs d >= 2
        t = b_np / A_np[:, 0]
        hi = np.min(t[A_np[:, 0] > 0])
        lo = np.max(t[A_np[:, 0] < 0])
        u = jax.random.uniform(key, (n, 1))
        return lo + (hi - lo) * u
    hs = HalfspaceIntersection(np.c_[A_np, -b_np], x0)
    verts = hs.intersections
    tri = Delaunay(verts)
    simplices = verts[tri.simplices]  # (S, d+1, d)
    edges = simplices[:, 1:, :] - simplices[:, :1, :]
    vols = np.abs(np.linalg.det(edges))  # proportional to volume
    k_s, k_w = jax.random.split(key)
    probs = jnp.asarray(vols / vols.sum(), jnp.float32)
    idx = jax.random.choice(k_s, probs.shape[0], (n,), p=probs)
    w = sample_simplex(k_w, d + 1, n)  # (n, d+1) barycentric
    chosen = jnp.asarray(simplices, jnp.float32)[idx]  # (n, d+1, d)
    return jnp.sum(w[..., None] * chosen, axis=1)


def get_polytope_samples(
    key: Array,
    n: int,
    bounds: Array,
    inequality_constraints: Optional[list] = None,
    equality_constraints: Optional[list] = None,
    n_burnin: int = 200,
) -> Array:
    """Draw `n` samples from a box intersected with linear inequality
    constraints `a . x >= rhs` tuples (reference's constraint convention,
    `utils/sampling.py:882`). Linear equality constraints `a . x = rhs`
    are handled by nullspace reduction (the reference's
    `HitAndRunPolytopeSampler` equality path): hit-and-run runs in the
    `d - k` dimensional affine coordinates and samples are mapped back.
    Falls back to plain Sobol when unconstrained."""
    from botorch_tpu.sampling.sobol import draw_sobol, sobol_table

    d = bounds.shape[-1]
    if not inequality_constraints and not equality_constraints:
        sv, shift = sobol_table(d, scramble=True, seed=int(key[-1]) & 0x7FFFFFFF)
        u = draw_sobol(sv, shift, n)
        return bounds[0] + (bounds[1] - bounds[0]) * u
    # assemble A x <= b: box + flipped >=-constraints
    A_rows, b_rows = [], []
    eye = np.eye(d)
    for i in range(d):
        A_rows.append(-eye[i]); b_rows.append(-float(bounds[0, i]))
        A_rows.append(eye[i]); b_rows.append(float(bounds[1, i]))
    for idx, coef, rhs in inequality_constraints or ():
        row = np.zeros(d)
        # accumulate: duplicate indices mean summed coefficients
        np.add.at(row, np.asarray(idx), -np.asarray(coef, np.float64))
        A_rows.append(row)
        b_rows.append(-float(rhs))
    A = np.stack(A_rows)
    b = np.asarray(b_rows)
    if equality_constraints:
        from botorch_tpu.optim.constraints import AffineSubspace

        aff = AffineSubspace.build(equality_constraints, d)
        N = np.asarray(aff.basis, np.float64)  # (d, d-k)
        x0e = np.asarray(aff.x0, np.float64)
        # substitute x = x0e + N z:  (A N) z <= b - A x0e
        A_z = A @ N
        b_z = b - A @ x0e
        z0 = find_interior_point(A_z, b_z)
        z = sample_polytope(
            jnp.asarray(A_z, jnp.float32), jnp.asarray(b_z, jnp.float32),
            jnp.asarray(z0, jnp.float32), key, n=n, n_burnin=n_burnin,
        )
        return jnp.asarray(x0e, jnp.float32) + z @ jnp.asarray(
            N.T, jnp.float32
        )
    x0 = find_interior_point(A, b)
    return sample_polytope(
        jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32),
        jnp.asarray(x0, jnp.float32), key, n=n, n_burnin=n_burnin,
    )


def optimize_posterior_samples(
    path_fn,
    bounds: Array,
    key: Array,
    raw_samples: int = 1024,
    num_restarts: int = 4,
    maxiter: int = 50,
):
    """Maximize a (pathwise) posterior sample function over a box
    (reference `utils/sampling.py:988`): Sobol screening + multi-start
    L-BFGS ascent on the path."""
    from botorch_tpu.ops.lbfgs import multi_start_lbfgsb
    from botorch_tpu.sampling.sobol import draw_sobol, sobol_table

    d = bounds.shape[-1]
    sv, shift = sobol_table(d, scramble=True, seed=int(key[-1]) & 0x7FFFFFFF)
    cand = bounds[0] + (bounds[1] - bounds[0]) * draw_sobol(sv, shift, raw_samples)
    vals = path_fn(cand)
    _, top = jax.lax.top_k(vals, num_restarts)
    x0 = cand[top]
    res = multi_start_lbfgsb(
        lambda x: -path_fn(x[None, :])[0], x0,
        bounds=(bounds[0], bounds[1]), maxiter=maxiter,
    )
    best = jnp.argmin(res.fun)
    return res.x[best], -res.fun[best]
