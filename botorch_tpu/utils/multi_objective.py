r"""Multi-objective utilities: Pareto masks, hypervolume, box decompositions.

Counterpart of `botorch/utils/multi_objective/` (`pareto.py`,
`hypervolume.py:152`, `box_decompositions/` — Lacour17 hypercell bounds).
All quantities assume MAXIMIZATION (as the reference does).

TPU-first split:
  * `is_non_dominated` — O(n^2) masked comparison, pure JAX, batched.
  * 2-objective decompositions — pure JAX staircase construction with
    padded static shapes (vectorizable over MC samples — this is what
    makes device-side qNEHVI cell bounds possible, where the reference
    loops on CPU).
  * m >= 3 decompositions — host-side numpy implementation of the
    incremental local-upper-bound algorithm ([Lacour17] Alg. 1 / Eq. 2,
    reference `box_decompositions/utils.py:104-222`), run once per
    acquisition construction (not per evaluation), returning padded cell
    arrays that the jitted acquisition consumes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


# --------------------------------------------------------------------------- #
# Pareto
# --------------------------------------------------------------------------- #
def is_non_dominated(Y: Array, deduplicate: bool = True) -> Array:
    """Boolean mask of non-dominated (Pareto-optimal) points, maximization.

    `Y: (..., n, m)` -> `(..., n)` (reference `pareto.py:19-124`).
    """
    n = Y.shape[-2]
    if n == 0:
        return jnp.zeros(Y.shape[:-1], dtype=bool)
    Y1 = Y[..., :, None, :]
    Y2 = Y[..., None, :, :]
    dominates = jnp.all(Y2 >= Y1, axis=-1) & jnp.any(Y2 > Y1, axis=-1)
    dominated = jnp.any(dominates, axis=-1)
    if deduplicate:
        # among exact duplicates keep only the first occurrence
        dup = jnp.all(Y1 == Y2, axis=-1)
        earlier = jnp.tril(jnp.ones((n, n), dtype=bool), k=-1)
        dominated = dominated | jnp.any(dup & earlier, axis=-1)
    return ~dominated


def infer_reference_point(
    pareto_Y: Array,
    max_ref_point: Array | None = None,
    scale: float = 0.1,
    scale_max_ref_point: bool = False,
) -> Array:
    """Heuristic reference point from the Pareto front (reference
    `hypervolume.py:65-149`): nadir minus `scale` times the front range."""
    if pareto_Y.shape[-2] == 0:
        if max_ref_point is None:
            raise ValueError("empty front and no max_ref_point")
        return max_ref_point - scale * jnp.abs(max_ref_point)
    ideal = jnp.max(pareto_Y, axis=-2)
    nadir = jnp.min(pareto_Y, axis=-2)
    rng = jnp.where(ideal - nadir > 0, ideal - nadir, jnp.abs(ideal) + 1e-8)
    ref = nadir - scale * rng
    if max_ref_point is not None:
        better = max_ref_point < ref
        offset = scale * rng if scale_max_ref_point else 0.0
        ref = jnp.where(jnp.isfinite(max_ref_point) & better,
                        max_ref_point - offset, ref)
    return ref


# --------------------------------------------------------------------------- #
# 2-d staircase machinery (pure JAX, batched, padded static shapes)
# --------------------------------------------------------------------------- #
def _pareto_staircase_2d(Y: Array, ref: Array):
    """Sorted, padded 2-d Pareto staircase.

    Returns `(ys, valid)` where `ys: (..., n, 2)` is Y with dominated /
    below-ref points replaced by `ref` and sorted ascending in objective 0;
    padding entries equal `ref` and have zero measure in all formulas.
    """
    mask = is_non_dominated(Y) & jnp.all(Y > ref, axis=-1)
    ys = jnp.where(mask[..., None], Y, ref)
    order = jnp.argsort(ys[..., 0], axis=-1)
    ys = jnp.take_along_axis(ys, order[..., None], axis=-2)
    return ys


def hypervolume_2d(Y: Array, ref: Array) -> Array:
    """Exact 2-d hypervolume, batched (`... x n x 2` -> `...`)."""
    ys = _pareto_staircase_2d(Y, ref)
    # staircase sorted ascending in f0 => f1 strictly descending on the
    # true front; padding at ref contributes 0 width or 0 height.
    y0 = ys[..., 0]
    y1 = ys[..., 1]
    prev0 = jnp.concatenate(
        [jnp.broadcast_to(ref[..., :1], y0[..., :1].shape), y0[..., :-1]],
        axis=-1,
    )
    width = jnp.maximum(y0 - prev0, 0.0)
    height = jnp.maximum(y1 - ref[..., 1:2][..., 0], 0.0)
    return jnp.sum(width * height, axis=-1)


def nondominated_hypercell_bounds_2d(Y: Array, ref: Array, clip_max: float = 1e10):
    """Partition of the NON-dominated region above `ref` into `n + 1`
    axis-aligned cells (reference
    `box_decompositions/utils.py:224+` `compute_non_dominated_hypercell_bounds_2d`),
    batched over leading dims with static shapes.

    Returns `(lower, upper): (..., n+1, 2)` cell bounds; upper bounds are
    clipped at `clip_max` in place of +inf.
    """
    ys = _pareto_staircase_2d(Y, ref)
    n = ys.shape[-2]
    y0 = ys[..., 0]
    y1 = ys[..., 1]
    ref0 = jnp.broadcast_to(ref[..., 0], y0[..., 0].shape)
    ref1 = jnp.broadcast_to(ref[..., 1], y0[..., 0].shape)
    # Cells indexed k = 0..n: lower_0 = (ref0, y1_max-of-front? ...)
    # Walking the staircase left->right: cell k sits above point k's f1
    # level, horizontally from point k's f0 (or ref for k=0) to +inf in f0?
    # Standard construction: cell k: l = (y0_{k-1 or ref}, y1_k_next_level)
    # Use the classic form: with points sorted ascending in f0 (and f1
    # descending), the non-dominated region is
    #   U_k [ (y0_k, y1_{k+1}) , (inf, y1_k) )  for k = 0..n, with
    #   y0_0- = ref0 convention below.
    left = jnp.concatenate([ref0[..., None], y0], axis=-1)  # (..., n+1)
    # f1 ceiling of each cell: previous point's f1 (or +inf for k=0)
    top = jnp.concatenate(
        [jnp.full_like(ref1[..., None], clip_max), y1], axis=-1
    )
    bot = jnp.concatenate([y1, ref1[..., None]], axis=-1)  # next point's f1
    lower = jnp.stack([left, bot], axis=-1)  # (..., n+1, 2)
    upper = jnp.stack(
        [jnp.full_like(left, clip_max), top], axis=-1
    )
    # degenerate cells (top <= bot) have zero measure automatically via
    # clamping in the consumers, but clamp lower<=upper here for safety
    upper = jnp.maximum(upper, lower)
    return lower, upper


def dominated_hypercell_bounds_2d(Y: Array, ref: Array):
    """Cells covering the DOMINATED region (for hypervolume computations),
    batched; `(lower, upper): (..., n, 2)`."""
    ys = _pareto_staircase_2d(Y, ref)
    y0 = ys[..., 0]
    y1 = ys[..., 1]
    ref0 = jnp.broadcast_to(ref[..., 0], y0.shape)
    ref1 = jnp.broadcast_to(ref[..., 1], y0.shape)
    prev0 = jnp.concatenate([ref0[..., :1], y0[..., :-1]], axis=-1)
    lower = jnp.stack([prev0, ref1], axis=-1)
    upper = jnp.stack([y0, y1], axis=-1)
    upper = jnp.maximum(upper, lower)
    return lower, upper


# --------------------------------------------------------------------------- #
# General-m local upper bound decomposition (host-side numpy, [Lacour17])
# --------------------------------------------------------------------------- #
def _lub_update(U: np.ndarray, Z: np.ndarray, z: np.ndarray):
    """One incremental step of [Lacour17] Alg. 1 (minimization form):
    update local upper bounds `U (n, m)` with defining points `Z (n, m, m)`
    after adding the new point `z (m,)`."""
    m = U.shape[-1]
    dominated = (U > z).all(axis=-1)
    if not dominated.any():
        return U, Z
    A, A_Z = U[dominated], Z[dominated]
    new_U, new_Z = [U[~dominated]], [Z[~dominated]]
    for j in range(m):
        others = [i for i in range(m) if i != j]
        # z can replace coordinate j of u if z_j >= max_{k != j} Z[k]_j
        z_uj_max = A_Z[:, others, j].max(axis=-1)
        add = z[j] >= z_uj_max
        if add.any():
            u_j = A[add].copy()
            u_j[:, j] = z[j]
            P_uj = np.zeros((u_j.shape[0], m, m), dtype=U.dtype)
            Z_ku = A_Z[add][:, others]  # (k, m-1, m)
            sel = Z_ku[..., j] <= z[j]
            P_uj[:, others] = Z_ku[sel].reshape(u_j.shape[0], m - 1, m)
            P_uj[:, j] = z
            new_U.append(u_j)
            new_Z.append(P_uj)
    return np.concatenate(new_U, axis=0), np.concatenate(new_Z, axis=0)


def _lub_cell_bounds(U: np.ndarray, Z: np.ndarray, ref: np.ndarray):
    """[Lacour17] Eq. 2: cell bounds of the non-dominated (search) region
    from local upper bounds (minimization form)."""
    n, m = U.shape
    lower = np.empty((n, m), U.dtype)
    upper = np.empty((n, m), U.dtype)
    lower[:, 0] = Z[:, 0, 0]
    upper[:, 0] = ref[0]
    for j in range(1, m):
        lower[:, j] = Z[:, :j, j].max(axis=-1)
        upper[:, j] = U[:, j]
    keep = ~(upper <= lower).any(axis=-1)
    return lower[keep], upper[keep]


def local_upper_bounds_np(pareto_Y: np.ndarray, ref_point: np.ndarray):
    """Step 1 of the two-step scheme ([Yang2019]; reference
    `box_decomposition.py:326-358`): local upper bounds of the minimization
    problem over `-pareto_Y` with reference `-ref`. Returns `U (n', m)` in
    minimization coordinates (`-U` are local LOWER bounds for
    maximization)."""
    pareto_Y = np.asarray(pareto_Y, np.float64)
    ref_point = np.asarray(ref_point, np.float64)
    m = pareto_Y.shape[-1]
    U = (-ref_point)[None, :].copy()
    Z = np.full((1, m, m), -np.inf)
    for j in range(m):
        Z[0, j, j] = U[0, j]
    for z in -pareto_Y:
        U, Z = _lub_update(U, Z, z)
    return U


def nondominated_hypercell_bounds_np(
    pareto_Y: np.ndarray, ref_point: np.ndarray, clip_max: float = 1e10
):
    """Non-dominated-region decomposition for m >= 2 (host-side), following
    the reference's two-step construction
    (`non_dominated.py:397-431` `FastNondominatedPartitioning`):
    step 1 computes local upper bounds `U` of the minimization problem;
    step 2 treats `-U` as a Pareto front of a second minimization problem
    with reference `+inf` and reads the dominated cells off its local
    upper bounds — these ARE the non-dominated cells of the original
    maximization problem.

    Args (MAXIMIZATION convention): `pareto_Y (n, m)` front, `ref (m,)`.
    Returns `(lower, upper)` numpy arrays `(n_cells, m)` with +inf clipped
    to `clip_max`.
    """
    pareto_Y = np.asarray(pareto_Y, np.float64)
    ref_point = np.asarray(ref_point, np.float64)
    m = pareto_Y.shape[-1]
    U = local_upper_bounds_np(pareto_Y, ref_point)
    # Step 2: second minimization problem over -U with reference +inf.
    U2 = np.full((1, m), np.inf)
    Z2 = np.tile(ref_point[None, None, :], (1, m, 1))
    for j in range(m):
        Z2[0, j, j] = np.inf
    for z in -U:
        U2, Z2 = _lub_update(U2, Z2, z)
    lower, upper = _lub_cell_bounds(U2, Z2, np.full((m,), np.inf))
    lower = np.clip(lower, -clip_max, clip_max)
    upper = np.clip(upper, -clip_max, clip_max)
    return lower, upper


def dominated_hypervolume_np(pareto_Y: np.ndarray, ref_point: np.ndarray) -> float:
    """Exact hypervolume for any m (host-side), via the complement of the
    non-dominated decomposition inside the bounding box
    [ref, ideal_clip]. Used for m >= 3 (2-d path is `hypervolume_2d`)."""
    pareto_Y = np.asarray(pareto_Y, np.float64)
    ref = np.asarray(ref_point, np.float64)
    keep = (pareto_Y > ref).all(axis=-1)
    pareto_Y = pareto_Y[keep]
    if pareto_Y.shape[0] == 0:
        return 0.0
    m = pareto_Y.shape[-1]
    if m == 2:
        return float(
            hypervolume_2d(jnp.asarray(pareto_Y), jnp.asarray(ref))
        )
    zmax = pareto_Y.max(axis=0)
    box = float(np.prod(zmax - ref))
    lo, up = nondominated_hypercell_bounds_np(pareto_Y, ref, clip_max=np.inf)
    # intersect the (unbounded) non-dominated cells with [ref, zmax]
    lo_c = np.clip(lo, ref, zmax)
    up_c = np.clip(up, ref, zmax)
    nondom = float(np.prod(np.maximum(up_c - lo_c, 0.0), axis=-1).sum())
    return box - nondom


def hypervolume(pareto_Y, ref_point) -> float:
    """Exact hypervolume (maximization), dispatching 2-d JAX / m-d host
    (reference `Hypervolume.compute`, `hypervolume.py:152-366`). For
    m >= 3 the native C++ engine (csrc/box_decomposition.cpp) is used
    when available; the numpy Lacour-complement path is the fallback."""
    Y = np.asarray(pareto_Y)
    if Y.shape[-1] == 2:
        return float(hypervolume_2d(jnp.asarray(Y), jnp.asarray(ref_point)))
    from botorch_tpu.utils.native import hypervolume_batch_native

    out = hypervolume_batch_native(
        [np.asarray(Y, np.float64)], np.asarray(ref_point, np.float64)
    )
    if out is not None:
        return float(out[0])
    return dominated_hypervolume_np(Y, np.asarray(ref_point))


def hypervolume_incl_excl(Y: Array, ref_point: Array) -> Array:
    """Exact DIFFERENTIABLE dominated hypervolume of `Y (..., q, m)` wrt
    `ref_point (m,)` for any `m`, by inclusion-exclusion over the
    `2^q - 1` non-empty subsets:

        `HV = sum_S (-1)^{|S|+1} prod_j (min_{i in S} y_ij - ref_j)^+`

    Static shapes, gradients flow through min/clip — the general-m
    counterpart of the sorted-staircase `hypervolume_2d` (use that for
    m = 2; this is exponential in q, fine for q <= ~12). Reference
    computes the same quantity non-differentiably via box decompositions
    (`utils/multi_objective/hypervolume.py:152`)."""
    import itertools as _it

    q = Y.shape[-2]
    masks = []
    signs = []
    for r in range(1, q + 1):
        for comb in _it.combinations(range(q), r):
            row = np.zeros(q, bool)
            row[list(comb)] = True
            masks.append(row)
            signs.append((-1.0) ** (r + 1))
    masks = jnp.asarray(np.stack(masks))  # (S, q)
    signs = jnp.asarray(np.asarray(signs, np.float32))  # (S,)
    big = 1e10
    Ym = jnp.where(
        masks[:, :, None], Y[..., None, :, :], big
    )  # (..., S, q, m)
    mins = jnp.min(Ym, axis=-2)  # (..., S, m)
    vols = jnp.prod(jnp.clip(mins - ref_point, 0.0), axis=-1)  # (..., S)
    return jnp.sum(signs * vols, axis=-1)


def dominated_hypercell_bounds_np(pareto_Y: np.ndarray, ref_point: np.ndarray):
    """Disjoint boxes partitioning the DOMINATED region `{y : ref <= y,
    exists f in front with y <= f}` for any m (host-side) — the
    counterpart of the reference's `DominatedPartitioning`
    (`box_decompositions/dominated.py:21`): [Lacour17] Eq. 2 applied to
    the step-1 local-upper-bound state of the minimization problem over
    `-pareto_Y`, negated back to maximization coordinates.

    Args (MAXIMIZATION): `pareto_Y (n, m)`, `ref_point (m,)`.
    Returns `(lower, upper)` numpy `(n_cells, m)`.
    """
    pareto_Y = np.asarray(pareto_Y, np.float64)
    ref_min = -np.asarray(ref_point, np.float64)
    m = pareto_Y.shape[-1]
    U = ref_min[None, :].copy()
    Z = np.full((1, m, m), -np.inf)
    for j in range(m):
        Z[0, j, j] = U[0, j]
    for z in -pareto_Y:
        U, Z = _lub_update(U, Z, z)
    # Lacour Eq. 2 (minimization coordinates)
    n = U.shape[0]
    lo_min = np.empty((n, m))
    up_min = np.empty((n, m))
    lo_min[:, 0] = Z[:, 0, 0]
    up_min[:, 0] = ref_min[0]
    for j in range(1, m):
        lo_min[:, j] = Z[:, :j, j].max(axis=1)
        up_min[:, j] = U[:, j]
    keep = ~(up_min <= lo_min).any(axis=-1)
    lo_min, up_min = lo_min[keep], up_min[keep]
    return -up_min, -lo_min  # back to maximization coords


def get_default_partitioning_alpha(num_objectives: int) -> float:
    """Approximation level for box decompositions by objective count
    (reference `acquisition/multi_objective/utils.py:47-64`): exact
    (`alpha=0`) through 4 objectives, `10^(-8+m)` beyond (with the same
    "EHVI works best for < 7 objectives" warning)."""
    if num_objectives <= 4:
        return 0.0
    if num_objectives > 6:
        import warnings

        warnings.warn("EHVI works best for less than 7 objectives.")
    return 10 ** (-8 + num_objectives)


def approximate_pareto_Y(pareto_Y: np.ndarray, ref_point: np.ndarray,
                         alpha: float) -> np.ndarray:
    """Drop Pareto points whose exclusive-hypervolume contribution is below
    `alpha * HV(front)` (the reference's `NondominatedPartitioning`
    approximation knob, `box_decomposition.py` `_approx_pareto_Y`). Used to
    bound cell counts for many-objective EHVI."""
    if alpha <= 0 or len(pareto_Y) <= 1:
        return pareto_Y
    hv_full = dominated_hypervolume_np(pareto_Y, ref_point)
    if hv_full <= 0:
        return pareto_Y
    from botorch_tpu.utils.native import hypervolume_batch_native

    loo = [np.delete(pareto_Y, i, axis=0) for i in range(len(pareto_Y))]
    hv_loo = hypervolume_batch_native(loo, np.asarray(ref_point, np.float64))
    if hv_loo is None:
        hv_loo = np.array(
            [dominated_hypervolume_np(rest, ref_point) for rest in loo]
        )
    keep = (hv_full - hv_loo) > alpha * hv_full
    if not keep.any():  # always keep at least the largest contributor
        keep[np.argmax(pareto_Y.sum(-1))] = True
    return pareto_Y[keep]


class BoxDecompositionList:
    """A batch of box decompositions with ragged cell counts
    (reference `box_decompositions/box_decomposition_list.py`): stores one
    decomposition per front and exposes padded, stackable cell bounds —
    the static-shape form the TPU acqfs consume."""

    def __init__(self, fronts, ref_point, alpha: float = 0.0):
        self.ref_point = np.asarray(ref_point)
        self.fronts = []
        self.cells = []
        for Y in fronts:
            Y = np.asarray(Y)
            nd = np.asarray(is_non_dominated(jnp.asarray(Y)))
            front = Y[nd]
            front = front[(front > self.ref_point).all(-1)]
            front = approximate_pareto_Y(front, self.ref_point, alpha)
            self.fronts.append(front)
            lo, hi = nondominated_hypercell_bounds_np(front, self.ref_point)
            self.cells.append((lo, hi))

    def padded_cell_bounds(self, clip_max: float = 1e10):
        """(lo, hi): `(batch, max_cells, m)` arrays; padding cells are
        degenerate (lo == hi) and contribute zero volume."""
        max_c = max(c[0].shape[0] for c in self.cells)
        m = self.ref_point.shape[-1]
        los, his = [], []
        for lo, hi in self.cells:
            pad = max_c - lo.shape[0]
            lo = np.concatenate([lo, np.zeros((pad, m))], axis=0)
            hi = np.concatenate([hi, np.zeros((pad, m))], axis=0)
            los.append(lo)
            his.append(hi)
        lo = jnp.asarray(np.stack(los), jnp.float32)
        hi = jnp.minimum(jnp.asarray(np.stack(his), jnp.float32), clip_max)
        return lo, hi

    def compute_hypervolume(self) -> Array:
        from botorch_tpu.utils.native import hypervolume_batch_native

        out = hypervolume_batch_native(
            [np.asarray(f, np.float64) for f in self.fronts],
            np.asarray(self.ref_point, np.float64),
        )
        if out is not None:
            return jnp.asarray(out)
        return jnp.asarray(
            [dominated_hypervolume_np(f, self.ref_point) for f in self.fronts]
        )
