r"""Jit-compatible box decompositions for m >= 3 (padded [Lacour17]).

Counterpart of the reference's `FastNondominatedPartitioning` /
`DominatedPartitioning` (`utils/multi_objective/box_decompositions/
non_dominated.py:353`, `dominated.py:21`), whose Python-list incremental
construction cannot run under `jit`. Round 2 ran the Lacour algorithm
host-side (numpy + the C++ batch engine in `csrc/box_decomposition.cpp`),
which capped the fully-compiled MO loop at m = 2 (the staircase special
case). This module lifts that limit with a PADDED formulation:

  * the local-upper-bound set `U` and its defining points `Z` live in
    fixed-size buffers with a validity mask; each incremental update
    writes all `m` candidate children per dominated bound into a scratch
    buffer and compacts valid rows back into the carry with a stable
    argsort — every shape is static, so the whole construction is one
    `lax.scan` over the (padded) front;
  * buffer sizes use the tight m = 3 bound `|U(n)| = 2n + 1` (and the
    `O(n^floor(m/2))` growth beyond), overridable by callers;
  * cell bounds follow [Lacour17] Eq. 2 exactly as the host version
    (`utils/multi_objective.py:194`), padded cells collapse to zero
    volume (lower == upper).

Because every array op is differentiable (gather/scatter/min/max), the
dominated-region cells also give a DIFFERENTIABLE exact hypervolume in
O(n · |U| · m) — `hypervolume_cells` — replacing the O(2^|front|)
inclusion-exclusion (`utils/multi_objective.hypervolume_incl_excl`) that
qHVKG used for m >= 3.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_NEG_INF = -jnp.inf


def default_max_bounds(n: int, m: int) -> int:
    """Buffer size for the local-upper-bound set after `n` points.

    m = 2: `n + 1` exactly; m = 3: `2n + 1` exactly ([Lacour17] Sec. 3);
    beyond, the `O(n^floor(m/2))` worst case — capped, since fronts that
    large should use the host/C++ path anyway.
    """
    if m <= 2:
        return n + 1
    if m == 3:
        return 2 * n + 2
    return min((n + 1) ** (m // 2) + n + 1, 20000)


def _lub_scan(
    Y_min: Array, valid: Array, U0: Array, Z0: Array, v0: Array
):
    """Run [Lacour17] Alg. 1 over the points `Y_min (n, m)` (minimization
    coordinates; rows with `valid=False` are skipped) starting from the
    padded state `(U0 (N, m), Z0 (N, m, m), v0 (N,))`.

    Returns `(U, Z, u_valid, overflow)`.
    """
    N, m = U0.shape

    def step(carry, inp):
        U, Z, uv, ovf = carry
        z, ok = inp
        dom = uv & jnp.all(U > z, axis=-1)

        cand_U, cand_Z, cand_v = [], [], []
        for j in range(m):
            others = [i for i in range(m) if i != j]
            oth = jnp.asarray(others)
            zmax = jnp.max(Z[:, oth, j], axis=-1)  # (N,)
            add = dom & (z[j] >= zmax)
            Uj = U.at[:, j].set(z[j])
            # defining points: keep z' in Z_k (k != j) with z'_j <= z_j,
            # drop (to -inf) otherwise; coordinate j's defining point is z
            keep_row = Z[:, :, j] <= z[j]  # (N, m)
            Zj = jnp.where(keep_row[:, :, None], Z, _NEG_INF)
            Zj = Zj.at[:, j, :].set(jnp.broadcast_to(z, (N, m)))
            cand_U.append(Uj)
            cand_Z.append(Zj)
            cand_v.append(add)

        all_U = jnp.concatenate([U] + cand_U, axis=0)
        all_Z = jnp.concatenate([Z] + cand_Z, axis=0)
        all_v = jnp.concatenate([uv & ~dom] + cand_v, axis=0)
        n_valid = jnp.sum(all_v)
        order = jnp.argsort(~all_v, stable=True)[:N]
        new = (all_U[order], all_Z[order], all_v[order], ovf | (n_valid > N))
        # skip masked-out points entirely
        out = jax.tree_util.tree_map(
            lambda a, b: jnp.where(ok, a, b), new, (U, Z, uv, ovf)
        )
        return out, None

    (U, Z, uv, ovf), _ = jax.lax.scan(
        step, (U0, Z0, v0, jnp.bool_(False)), (Y_min, valid)
    )
    return U, Z, uv, ovf


def _init_state(ref_min: Array, N: int):
    m = ref_min.shape[-1]
    U0 = jnp.full((N, m), jnp.inf).at[0].set(ref_min)
    Z0 = jnp.full((N, m, m), _NEG_INF)
    Z0 = Z0.at[0].set(
        jnp.where(jnp.eye(m, dtype=bool), ref_min, _NEG_INF)
    )
    v0 = jnp.zeros((N,), bool).at[0].set(True)
    return U0, Z0, v0


def _front_mask(Y: Array, ref: Array, valid: Optional[Array]) -> Array:
    """Restrict to valid, strictly-better-than-ref, non-dominated rows
    (the reference filters to the Pareto front before decomposing)."""
    from botorch_tpu.utils.multi_objective import is_non_dominated

    ok = jnp.all(Y > ref, axis=-1)
    if valid is not None:
        ok = ok & valid
    # mask rows that are dominated by another valid row
    Ym = jnp.where(ok[:, None], Y, -jnp.inf)
    nd = is_non_dominated(Ym, deduplicate=True)
    return ok & nd


def _eq2_cells(U: Array, Z: Array, uv: Array, ref_min: Array):
    """[Lacour17] Eq. 2 cell bounds (minimization coords) of the state.
    Padded/empty cells are collapsed to `lower == upper == 0`."""
    N, m = U.shape
    lo = jnp.empty_like(U)
    up = jnp.empty_like(U)
    lo = lo.at[:, 0].set(Z[:, 0, 0])
    up = up.at[:, 0].set(jnp.broadcast_to(ref_min[0], (N,)))
    for j in range(1, m):
        lo = lo.at[:, j].set(jnp.max(Z[:, :j, j], axis=-1))
        up = up.at[:, j].set(U[:, j])
    nonempty = uv & ~jnp.any(up <= lo, axis=-1)
    lo = jnp.where(nonempty[:, None], lo, 0.0)
    up = jnp.where(nonempty[:, None], up, 0.0)
    return lo, up, nonempty


def dominated_hypercell_bounds(
    Y: Array,
    ref_point: Array,
    valid: Optional[Array] = None,
    max_cells: Optional[int] = None,
):
    """Disjoint boxes partitioning the DOMINATED region (MAXIMIZATION
    coords), jit-compatible padded counterpart of
    `dominated_hypercell_bounds_np` / reference `DominatedPartitioning`.

    Returns `(lower (C, m), upper (C, m))`; padded cells have
    `lower == upper` (zero volume).
    """
    n, m = Y.shape
    N = max_cells or default_max_bounds(n, m)
    ok = _front_mask(Y, ref_point, valid)
    ref_min = -jnp.asarray(ref_point, Y.dtype)
    U0, Z0, v0 = _init_state(ref_min, N)
    U, Z, uv, ovf = _lub_scan(-Y, ok, U0, Z0, v0)
    lo_min, up_min, nonempty = _eq2_cells(U, Z, uv, ref_min)
    # Buffer overflow (only reachable beyond the exact m <= 3 bounds /
    # the m >= 4 cap): poison the cells with NaN rather than silently
    # truncate — a wrong-but-plausible HV is worse than a loud one.
    poison = jnp.where(ovf, jnp.nan, 0.0)
    # max coords: [lower, upper] = [-up_min, -lo_min]
    return -up_min + poison, -lo_min + poison


def nondominated_hypercell_bounds(
    Y: Array,
    ref_point: Array,
    valid: Optional[Array] = None,
    max_cells: Optional[int] = None,
    clip_max: float = 1e10,
):
    """Boxes covering the NON-dominated region above `ref` (MAXIMIZATION
    coords) — the jit-compatible counterpart of
    `nondominated_hypercell_bounds_np` / reference
    `FastNondominatedPartitioning` (`non_dominated.py:353`), via the
    two-phase construction: local upper bounds of the minimization
    problem, then the dominated decomposition of `-U` w.r.t. `+inf`.

    Returns `(lower (C, m), upper (C, m))` with `+inf` clipped to
    `clip_max`; padded cells have `lower == upper`.
    """
    n, m = Y.shape
    N1 = default_max_bounds(n, m)
    ok = _front_mask(Y, ref_point, valid)
    ref_min = -jnp.asarray(ref_point, Y.dtype)
    U0, Z0, v0 = _init_state(ref_min, N1)
    U, Z, uv, ovf1 = _lub_scan(-Y, ok, U0, Z0, v0)

    # phase 2: dominated decomposition of -U with reference +inf
    N2 = max_cells or default_max_bounds(N1, m)
    big = jnp.full((m,), jnp.inf, Y.dtype)
    U20 = jnp.full((N2, m), jnp.inf).at[0].set(big)
    Z20 = jnp.full((N2, m, m), _NEG_INF)
    # defining points of the initial bound: the MAXIMIZATION ref point
    # (= -ref_min) off-diagonal, +inf on the diagonal (numpy host version
    # `nondominated_hypercell_bounds_np`, `utils/multi_objective.py:247`)
    Z20 = Z20.at[0].set(
        jnp.where(jnp.eye(m, dtype=bool), jnp.inf, -ref_min)
    )
    v20 = jnp.zeros((N2,), bool).at[0].set(True)
    # guard padded U rows (inf) — only feed valid bounds
    U2, Z2, uv2, ovf2 = _lub_scan(-U, uv, U20, Z20, v20)
    # the phase-2 "minimization" coordinates ARE the original
    # maximization coordinates (we negated U going in), so Eq. 2 bounds
    # come out directly — no negation (numpy host version returns them
    # as-is, `utils/multi_objective.py:250-258`)
    lo_min, up_min, nonempty = _eq2_cells(U2, Z2, uv2, big)
    lower = jnp.clip(lo_min, -clip_max, clip_max)
    upper = jnp.clip(up_min, -clip_max, clip_max)
    lower = jnp.where(nonempty[:, None], lower, 0.0)
    upper = jnp.where(nonempty[:, None], upper, 0.0)
    # loud failure on buffer overflow (see dominated_hypercell_bounds)
    poison = jnp.where(ovf1 | ovf2, jnp.nan, 0.0)
    return lower + poison, upper + poison


def hypervolume_cells(
    Y: Array,
    ref_point: Array,
    valid: Optional[Array] = None,
    max_cells: Optional[int] = None,
) -> Array:
    """Exact DIFFERENTIABLE dominated hypervolume of `Y (q, m)` above
    `ref_point (m,)` for any m, in O(q · |U| · m) — the polynomial
    replacement for `hypervolume_incl_excl`'s O(2^q) subset sum
    (reference computes HV from the same Lacour cells,
    `utils/multi_objective/hypervolume.py:152-446`).

    Gradients flow to `Y` through the cell corner coordinates (each cell
    bound is a gather/min/max of front coordinates), matching the
    subgradient structure of the true HV function.
    """
    lo, up = dominated_hypercell_bounds(
        Y, ref_point, valid=valid, max_cells=max_cells
    )
    return jnp.sum(jnp.prod(jnp.maximum(up - lo, 0.0), axis=-1))


def hypervolume_cells_batch(
    Y: Array, ref_point: Array, max_cells: Optional[int] = None
) -> Array:
    """`hypervolume_cells` vmapped over one leading batch dim."""
    return jax.vmap(
        lambda y: hypervolume_cells(y, ref_point, max_cells=max_cells)
    )(Y)
